package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed BPE merge-rule training (Sennrich, Haddow & Birch, ACL
 * 2016) — the tokenizer-training primitive of an LLM data pipeline,
 * re-expressed for Spark's execution model.
 *
 * The scale insight is the classic one: BPE never needs the corpus
 * after the FIRST pass. One corpus-scale `groupBy(word)` builds the
 * word-frequency table (|vocab| rows — millions, not billions), and
 * every merge round thereafter is a pair-count aggregation plus a
 * map-only rewrite over that table. At 100 TB the corpus is touched
 * once; the R training rounds run on a table that fits in a handful of
 * partitions. The only driver-collected value per round is the argmax
 * pair — one row of index metadata (the watermark-head class).
 *
 * Round semantics (matching the reference algorithm exactly):
 *   - pair counts are ADJACENT-OCCURRENCE counts weighted by word
 *     frequency (overlapping occurrences each count: "aaa" contributes
 *     2 to (a,a));
 *   - the winning pair is (max count, then lexicographically smallest
 *     left, then right) — integer counts + binary string order, so the
 *     choice is deterministic cross-engine;
 *   - the merge applies left-to-right, non-overlapping ("aaaa" + (a,a)
 *     → [aa, aa]), which the fold below gets for free: a merged symbol
 *     `a+b` can never equal `a` (b is non-empty), so it can never seed
 *     a chained merge within the same round.
 *
 * Everything is Catalyst expressions (the apply-merge is an `aggregate`
 * fold over the symbol array — no UDF), and every gated value is an
 * integer or a string, so the DuckDB oracle replays all R rounds
 * bit-exactly (positional window form; see Queries.t66).
 */
object BpeTrain {

  /** One merge rule as learned data. */
  final case class Merge(round: Int, left: String, right: String, count: Long)

  /** Character explosion of `w` as an expression — `transform` over an
    * index sequence with a positional `substring`. */
  private def charsOf(w: Column): Column =
    transform(sequence(lit(0), length(w) - 1),
      i => substr(w, i + 1, lit(1)))

  /** Greedy left-to-right application of merge rule (a, b) to a symbol
    * array, as a pure expression fold. Non-overlapping by construction:
    * the merged symbol `a+b` differs from `a`, so it never re-merges
    * within the round. */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      lit(Array.empty[String]),
      (res, s) => when(
          size(res) > 0 && element_at(res, -1) === lit(a) && s === lit(b),
          concat(slice(res, lit(1), size(res) - 1), array(lit(a + b))))
        .otherwise(concat(res, array(s))))

  /** Adjacent pair counts over the word table, weighted by `cnt`. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(
        transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("l"),
            element_at(col("syms"), i + 2).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("cnt").as("n"))

  /**
   * Per-document encoding statistics under a trained merge table: the
   * corpus' exploded tokens join the final word table (`w` → encoded
   * symbol list) and aggregate back per document — token count, BPE
   * symbol count, character count. This is the "token counting under
   * the trained tokenizer" step of a data pipeline (sizing a training
   * mix, packing budgets) WITHOUT re-running the merge fold per
   * occurrence: each distinct word is encoded exactly once (in
   * [[train]]'s vocab-sized table) and every occurrence pays one
   * broadcast-hash probe.
   *
   * Scale shape: one corpus pass (explode + probe + per-doc hash-agg,
   * all map-side until the final doc-keyed aggregation); the word
   * table is vocab-sized (millions of rows at 100 TB, still broadcast
   * range — drop the hint and let AQE decide if a tokenizer's vocab
   * ever outgrows it).
   */
  def encodeStats(df: DataFrame, idCol: String, textCol: String,
      words: DataFrame): DataFrame =
    df.select(col(idCol).as("id"),
        explode(TextDedup.tokens(col(textCol))).as("w"))
      .join(broadcast(words.select(col("w"), size(col("syms")).as("ns"),
        length(col("w")).as("nc"))), Seq("w"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"), sum("ns").as("n_syms"),
        sum("nc").as("n_chars"))

  /**
   * Learn the first `rounds` merge rules. Returns (merges, final word
   * table). The word table is re-barriered each round (it is vocab-
   * sized); the per-round driver pull is the single argmax row.
   */
  def train(df: DataFrame, textCol: String, rounds: Int)
      : (Seq[Merge], DataFrame) = {
    var words = Staging.barrier(
      df.select(explode(TextDedup.tokens(col(textCol))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .select(col("w"), col("cnt"), charsOf(col("w")).as("syms")))
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var continue = true
    while (r <= rounds && continue) {
      val top = pairCounts(words)
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) { continue = false }
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(r, a, b, n)
        words = Staging.barrier(words.select(col("w"), col("cnt"),
          applyMerge(col("syms"), a, b).as("syms")))
        r += 1
      }
    }
    (merges.result(), words)
  }
}
