package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed WORDPIECE tokenizer training (Schuster & Nakajima, ICASSP
 * 2012 — the BERT tokenizer's trainer, as documented publicly in the
 * HuggingFace tokenizers library) — the third tokenizer-training family
 * next to BPE merges ([[BpeTrain]]) and the unigram LM ([[UnigramLm]]).
 *
 * WordPiece is BPE with a LIKELIHOOD merge objective: words segment
 * into an initial alphabet where every non-initial character carries
 * the `##` continuation prefix, and each round merges the adjacent
 * symbol pair maximizing `count(ab) / (count(a) · count(b))` — the
 * corpus-likelihood gain of fusing the pair under a unigram model —
 * instead of BPE's raw `count(ab)`. The merged symbol is
 * `a ++ stripContinuation(b)` (the `##` marks position, not content,
 * so it must not survive into the fused spelling's interior).
 *
 * The scale shape is [[BpeTrain]]'s exactly: ONE corpus pass builds the
 * word-frequency table; every round is an aggregation + map-only
 * rewrite over that vocab-sized table; under [[BpeTrain
 * .LocalWordBound]] the whole loop runs on the driver, and the
 * distributed fallback maintains BOTH count states (adjacent pairs AND
 * per-symbol totals — the score needs both) incrementally from the
 * touched-word delta, so a round never re-aggregates the full table.
 *
 * Deterministic cross-engine discipline (the t101 rules):
 *   - the score is INTEGER micro-log10: `r6(n) − r6(cl) − r6(cr)` with
 *     `r6(x) = round(log10(x)·1e6)` HALF_UP — log10 is the one libm
 *     call gated as cross-engine exact, and rounding each term
 *     SEPARATELY keeps the subtraction associativity-free;
 *   - the winner is (max score, then UTF-8-smallest left, then right);
 *   - merge application is the greedy left-to-right non-overlapping
 *     fold, which is safe for the same reason as BPE's: the fused
 *     symbol `a ++ strip(b)` differs from `a` (a continuation symbol
 *     always spells at least one character), so it never chains within
 *     its own round.
 *
 * Structural invariant (load-bearing for `strip`): in any word's
 * symbol list, every symbol at position ≥ 2 starts with `##` — true at
 * initialization by construction and preserved by merges (a fusion at
 * position 1 keeps position-1's plain spelling; a fusion at position
 * ≥ 2 keeps its left symbol's `##`). A pair's RIGHT symbol sits at
 * position ≥ 2, so `stripContinuation` always has a marker to strip.
 * The marker convention is BERT's, ambiguity included: a corpus word
 * literally containing `#` characters spells them into symbols
 * verbatim (the invariant is positional, not textual).
 */
object WordPiece {

  /** One learned merge rule: the pair, its adjacent-occurrence count,
    * and the integer micro-log10 likelihood score it won with. */
  final case class Merge(round: Int, left: String, right: String,
      pairCount: Long, scoreMicro: Long)

  /** `round(log10(cnt)·1e6)` HALF_UP — [[UnigramLm.microLog10]]'s
    * rounding on a bare positive count. */
  private[graft] def microLog10Count(cnt: Long): Long =
    BigDecimal(math.log10(cnt.toDouble) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact

  /** The likelihood-gain score of merging adjacent pair with count `n`
    * whose symbols have totals `cl`, `cr`. */
  private[graft] def scoreMicro(n: Long, cl: Long, cr: Long): Long =
    microLog10Count(n) - microLog10Count(cl) - microLog10Count(cr)

  private[graft] def stripContinuation(s: String): String =
    if (s.startsWith("##")) s.substring(2) else s

  /** WordPiece initial segmentation of `w` as an expression: plain
    * first character, `##`-prefixed continuations. Guarded for the
    * empty string ([[BpeTrain]]'s `charsOf` rationale). */
  private def initSymsOf(w: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    when(length(w) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), length(w) - 1),
        i => when(i === 0, substr(w, i + 1, lit(1)))
          .otherwise(concat(lit("##"), substr(w, i + 1, lit(1))))))

  /** Greedy left-to-right application of merge rule (a, b) — BPE's
    * fold with the fused spelling `a ++ stripContinuation(b)`. */
  def applyMerge(syms: org.apache.spark.sql.Column, a: String,
      b: String): org.apache.spark.sql.Column = {
    val fused = a + stripContinuation(b)
    aggregate(
      syms,
      lit(Array.empty[String]),
      (res, s) => when(
          size(res) > 0 && element_at(res, -1) === lit(a) && s === lit(b),
          concat(slice(res, lit(1), size(res) - 1), array(lit(fused))))
        .otherwise(concat(res, array(s))))
  }

  /** Per-symbol occurrence totals over the word table, weighted by
    * `cnt` — the denominators of the likelihood score. */
  def symCounts(words: DataFrame): DataFrame =
    words.select(col("cnt"), explode(col("syms")).as("s"))
      .groupBy("s").agg(sum("cnt").as("c"))

  private def applyMergeLocal(syms: Array[String], a: String, b: String)
      : Array[String] = {
    val fused = a + stripContinuation(b)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (out.nonEmpty && out.last == a && syms(i) == b)
        out(out.length - 1) = fused
      else out += syms(i)
      i += 1
    }
    out.toArray
  }

  /** All rounds on the collected word table ([[BpeTrain.trainLocal]]'s
    * shape with the likelihood argmax): pair counts + symbol counts →
    * max (score, UTF-8-smallest l, then r) → greedy rewrite. */
  private def trainLocal(collected: Array[(String, Long, Array[String])],
      rounds: Int): (Seq[Merge], Array[(String, Long, Array[String])]) = {
    var words = collected
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var continue = true
    while (r <= rounds && continue) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val syms = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (_, cnt, ss) =>
        var i = 0
        while (i < ss.length) {
          syms.update(ss(i), syms.getOrElse(ss(i), 0L) + cnt)
          if (i < ss.length - 1) {
            val k = (ss(i), ss(i + 1))
            pairs.update(k, pairs.getOrElse(k, 0L) + cnt)
          }
          i += 1
        }
      }
      if (pairs.isEmpty) { continue = false }
      else {
        var bl: String = null; var br: String = null
        var bn = 0L; var bs = 0L
        pairs.foreach { case ((l0, r0), n) =>
          val s = scoreMicro(n, syms(l0), syms(r0))
          if (bl == null || s > bs || (s == bs && (BpeTrain.utf8Less(l0, bl) ||
              (l0 == bl && BpeTrain.utf8Less(r0, br))))) {
            bl = l0; br = r0; bn = n; bs = s
          }
        }
        merges += Merge(r, bl, br, bn, bs)
        words = words.map { case (w, cnt, ss) =>
          (w, cnt, applyMergeLocal(ss, bl, br))
        }
        r += 1
      }
    }
    (merges.result(), words)
  }

  /**
   * Learn the first `rounds` WordPiece merges. Returns (merges, final
   * word table `(w, cnt, syms)`). The corpus is touched exactly once;
   * under `maxLocalWords` every round runs on the driver
   * ([[BpeTrain.LocalWordBound]]'s rationale — a production ~30k-merge
   * run must not pay one distributed barrier per round), over it the
   * incremental fallback runs. Both paths are merge-for-merge
   * identical (WordPieceSpec gates them against each other, score
   * ties included).
   */
  def train(df: DataFrame, textCol: String, rounds: Int,
      maxLocalWords: Long = BpeTrain.LocalWordBound)
      : (Seq[Merge], DataFrame) = {
    val base = Staging.barrier(
      df.select(explode(TextDedup.tokens(col(textCol))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .select(col("w"), col("cnt"), initSymsOf(col("w")).as("syms")))
    // the fast-path decision count doubles as the word table's
    // row-count tag ([[BpeTrain.tagRowCount]]) — downstream probe
    // routing then needs no job
    val nWords = base.count()
    if (nWords <= maxLocalWords) {
      val collected = base.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getSeq[String](2).toArray))
      val (merges, words) = trainLocal(collected, rounds)
      val spark = df.sparkSession
      import spark.implicits._
      val out = words.toSeq.map { case (w, c, s) => (w, c, s.toSeq) }
        .toDF("w", "cnt", "syms")
      (merges, BpeTrain.tagRowCount(out, nWords))
    } else {
      val (merges, words) = trainDistributed(base, rounds)
      (merges, BpeTrain.tagRowCount(words, nWords))
    }
  }

  /**
   * The over-bound fallback — [[BpeTrain.trainDistributed]]'s
   * incremental machinery with BOTH count states maintained by the
   * touched-word delta: merging (a, b) only changes words containing
   * that adjacent pair, so each round rewrites map-only, then the
   * touched words' old pairs/symbols (negated) and new pairs/symbols
   * aggregate into deltas that full-outer-join the two states. The
   * states are hash-partitioned by their keys from their groupBy
   * birth, so only the (touched-sized) delta side shuffles. Lineage
   * truncates via eager `localCheckpoint` per generation (the BPE
   * measurement: persist-only barriers re-analyze an unboundedly
   * growing plan). The per-round argmax joins the pair state with the
   * symbol state on each side and pulls ONE row, with the score
   * computed by the SAME Scala arithmetic as the local path (a typed
   * map — bit-identity by construction, not by parallel spelling).
   */
  private def trainDistributed(base: DataFrame, rounds: Int)
      : (Seq[Merge], DataFrame) = {
    val spark = base.sparkSession
    import spark.implicits._
    def ckpt(df: DataFrame): DataFrame =
      Staging.adopt(df.localCheckpoint(true))
    def retire(df: DataFrame): Unit = {
      df.unpersist(blocking = false)
      org.apache.spark.sql.graft.bridge.checkpointedRdd(df)
        .foreach(_.unpersist(blocking = false))
    }
    var words = base
    var wordsCk: DataFrame = null
    var pairs = ckpt(BpeTrain.pairCounts(base))
    var scnts = ckpt(symCounts(base))
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var continue = true
    while (r <= rounds && continue) {
      val top = pairs
        .join(scnts.select(col("s").as("l"), col("c").as("cl")), Seq("l"))
        .join(scnts.select(col("s").as("r"), col("c").as("cr")), Seq("r"))
        .select(col("l"), col("r"), col("n"), col("cl"), col("cr"))
        .as[(String, String, Long, Long, Long)]
        .map { case (l0, r0, n, cl, cr) =>
          (l0, r0, n, scoreMicro(n, cl, cr)) }
        .toDF("l", "r", "n", "score")
        .orderBy(col("score").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) { continue = false }
      else {
        val (a, b, n, s) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2), top(0).getLong(3))
        merges += Merge(r, a, b, n, s)
        val next = ckpt(words.select(col("w"), col("cnt"),
          col("syms"), applyMerge(col("syms"), a, b).as("merged")))
        if (wordsCk != null) retire(wordsCk)
        def touched = next.filter(size(col("merged")) < size(col("syms")))
        val pairDelta = BpeTrain.pairCounts(
            touched.select(col("w"), col("cnt"), col("syms")))
            .select(col("l"), col("r"), (-col("n")).as("n"))
          .unionByName(BpeTrain.pairCounts(touched.select(col("w"),
            col("cnt"), col("merged").as("syms"))))
          .groupBy("l", "r").agg(sum("n").as("dn"))
        val nextPairs = ckpt(
          pairs.join(pairDelta, Seq("l", "r"), "full_outer")
            .select(col("l"), col("r"),
              (coalesce(col("n"), lit(0L)) +
                coalesce(col("dn"), lit(0L))).as("n"))
            .filter(col("n") > 0))
        retire(pairs)
        pairs = nextPairs
        val symDelta = symCounts(
            touched.select(col("cnt"), col("syms")))
            .select(col("s"), (-col("c")).as("c"))
          .unionByName(symCounts(touched.select(col("cnt"),
            col("merged").as("syms"))))
          .groupBy("s").agg(sum("c").as("dc"))
        val nextScnts = ckpt(
          scnts.join(symDelta, Seq("s"), "full_outer")
            .select(col("s"),
              (coalesce(col("c"), lit(0L)) +
                coalesce(col("dc"), lit(0L))).as("c"))
            .filter(col("c") > 0))
        retire(scnts)
        scnts = nextScnts
        wordsCk = next
        words = next.select(col("w"), col("cnt"),
          col("merged").as("syms"))
        r += 1
      }
    }
    (merges.result(), words)
  }

  /** The encode-time vocabulary: the training alphabet (every initial
    * symbol — plain first characters and `##` continuations — of the
    * final word table's words) plus each merge's fused spelling.
    * Derived from vocab-sized inputs only (no corpus pass). */
  def vocab(words: DataFrame, merges: Seq[Merge]): Set[String] = {
    val alphabet = words
      .select(explode(initSymsOf(col("w"))).as("s"))
      .distinct().collect().map(_.getString(0)).toSet
    alphabet ++ merges.map(m => m.left + stripContinuation(m.right))
  }

  /** BERT's greedy longest-match-first WordPiece segmentation of one
    * word: at each position take the LONGEST vocabulary piece (raw at
    * the word start, `##`-prefixed past it); if no piece covers a
    * position the WHOLE word maps to a single unknown token. Returns
    * (piece count, isUnknown). Shared verbatim by every engine path
    * (the [[UnigramLm.viterbi]] one-implementation rule). */
  private[graft] def greedyCount(w: String,
      vocab: Set[String]): (Long, Boolean) = {
    var pos = 0
    var n = 0L
    while (pos < w.length) {
      var l = w.length - pos
      var hit = 0
      while (l >= 1 && hit == 0) {
        val probe =
          if (pos == 0) w.substring(0, l)
          else "##" + w.substring(pos, pos + l)
        if (vocab(probe)) hit = l else l -= 1
      }
      if (hit == 0) return (1L, true)
      n += 1
      pos += hit
    }
    (n, false)
  }

  /**
   * Per-document encoding statistics under a trained vocabulary —
   * [[BpeTrain.encodeStats]]'s WordPiece twin, covering UNSEEN words
   * (the greedy matcher needs only the vocab, not the trained word
   * table): every DISTINCT corpus word segments exactly once, every
   * occurrence pays one probe (broadcast under
   * [[BpeTrain.MaxBroadcastWords]], shuffle join over it). Unknown words count one
   * piece and flag `n_unk_words`. Output per document:
   * `(id, n_words, n_pieces, n_unk_words, n_chars)`.
   *
   * Pass `knownWords` when the corpus' distinct-word count is already
   * known — e.g. [[BpeTrain.taggedRowCount]] of the trained word
   * table when encoding the TRAINING corpus (same corpus, same
   * tokenization, so the counts are identical) — and the probe routes
   * with no extra job. Without it, routing runs one EAGER count() job
   * at DataFrame-construction time (the distinct-word table is
   * staged, so the count's work is reused by the join).
   */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
      vocabSet: Set[String],
      maxBroadcastWords: Long = BpeTrain.MaxBroadcastWords,
      knownWords: Option[Long] = None): DataFrame = {
    val enc = wordPieces(docs, textCol, vocabSet)
    BpeTrain.boundedProbeJoin(
        docs.select(col(idCol).as("id"),
          explode(TextDedup.tokens(col(textCol))).as("w")),
        enc, maxBroadcastWords, stage = true, knownWords)
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"),
        sum("n_pieces").as("n_pieces"),
        sum("unk").as("n_unk_words"),
        sum(length(col("w"))).as("n_chars"))
  }

  /** Per-DISTINCT-word greedy segmentation table `(w, n_pieces, unk)`
    * — the encode family's probe side, exposed for evaluation
    * ([[TokenizerEval.fertilityHistogram]]): every distinct corpus
    * word segments exactly once, UNK words count one piece and flag
    * `unk = 1`. One map-only pass over the distinct-word table with
    * the vocab broadcast. */
  def wordPieces(docs: DataFrame, textCol: String,
      vocabSet: Set[String]): DataFrame = {
    require(vocabSet.nonEmpty, "need a trained vocabulary")
    val spark = docs.sparkSession
    import spark.implicits._
    val b = spark.sparkContext.broadcast(vocabSet)
    docs.select(explode(TextDedup.tokens(col(textCol))).as("w"))
      .distinct().as[String]
      .map { w =>
        val (n, unk) = greedyCount(w, b.value)
        (w, n, if (unk) 1L else 0L)
      }
      .toDF("w", "n_pieces", "unk")
  }
}
