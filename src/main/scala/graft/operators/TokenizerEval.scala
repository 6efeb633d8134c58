package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * TOKENIZER QUALITY metrics — the evaluation side of the tokenizer
 * family. Training (BPE/byte-level/unigram/WordPiece), storage,
 * interchange and encoding exist; this measures how GOOD a trained
 * tokenizer is on a corpus, as the standard published tables report it:
 *
 *   - COMPRESSION RATE by corpus group (language, source): size per
 *     token (bytes or chars, whichever the encode family counts) and
 *     tokens per word — the table every tokenizer paper prints
 *     (e.g. the byte-level discussion in Radford et al. 2019 §2.2).
 *   - VOCABULARY COVERAGE: the OOV-fallback rate (WordPiece's UNK
 *     words per million — BERT-style greedy matching falls back to a
 *     whole-word UNK when no piece covers a position).
 *   - FERTILITY distribution: how many pieces words explode into,
 *     both over DISTINCT words and occurrence-weighted (the
 *     "fertility" of the multilingual-tokenizer literature).
 *
 * Every metric is an exact integer aggregation over the per-document
 * (or per-distinct-word) encode output the family already computes —
 * ratios are integer MICRO fixed-point (×1e6, floor division), the
 * t32/t92 cross-engine discipline, so the DuckDB oracles replay the
 * whole table bit-exactly (gated t117/t118/t119/t120).
 *
 * Scale shape: one doc-keyed equi-join (the per-doc stats frame back
 * to the corpus' group column — both sides doc-keyed, one shuffle
 * each, map-side-combined sums after) into a group-keyed hash-agg
 * whose result is group-cardinality (languages × sources — driver
 * metadata class). The fertility histogram reuses the encode family's
 * bounded probe join ([[BpeTrain.boundedProbeJoin]]'s discipline —
 * broadcast under the 4M-word bound, shuffle over it) and two
 * vocab-sized aggregations; no new exchange shapes anywhere.
 */
object TokenizerEval {

  /** The compression-rate table per corpus group: join a per-document
    * encode-stats frame (`(id, n_words, <tokensCol>, <sizeCol>)` — the
    * [[BpeTrain.encodeStats]] / byte-level / [[UnigramLm.encodeStats]]
    * shapes) back to the corpus' `groupCol` and aggregate. Output per
    * group: `(groupCol, n_docs, n_words, n_tokens, n_size,
    * size_per_token_micro, tokens_per_word_micro)` — micro = ×1e6,
    * floor division, exact integers end-to-end. `n_docs` counts
    * documents with at least one word (empty texts produce no encode
    * row, mirrored by the oracle's join). */
  def compressionByGroup(stats: DataFrame, docs: DataFrame,
      idCol: String, groupCol: String, tokensCol: String,
      sizeCol: String): DataFrame =
    stats.join(docs.select(col(idCol).as("id"), col(groupCol)),
        Seq("id"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum(tokensCol).as("n_tokens"),
        sum(sizeCol).as("n_size"))
      .select(col(groupCol), col("n_docs"), col("n_words"),
        col("n_tokens"), col("n_size"),
        expr("n_size * 1000000 div n_tokens").as("size_per_token_micro"),
        expr("n_tokens * 1000000 div n_words")
          .as("tokens_per_word_micro"))

  /** Vocabulary-coverage table per corpus group over a WordPiece-shaped
    * stats frame (`(id, n_words, n_pieces, n_unk_words, ...)`): the
    * OOV-fallback rate as UNK words per million, plus the fertility
    * ratio. Output: `(groupCol, n_docs, n_words, n_tokens,
    * n_unk_words, oov_per_million, tokens_per_word_micro)`. */
  def coverageByGroup(stats: DataFrame, docs: DataFrame,
      idCol: String, groupCol: String): DataFrame =
    stats.join(docs.select(col(idCol).as("id"), col(groupCol)),
        Seq("id"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum("n_pieces").as("n_tokens"),
        sum("n_unk_words").as("n_unk_words"))
      .select(col(groupCol), col("n_docs"), col("n_words"),
        col("n_tokens"), col("n_unk_words"),
        expr("n_unk_words * 1000000 div n_words").as("oov_per_million"),
        expr("n_tokens * 1000000 div n_words")
          .as("tokens_per_word_micro"))

  /** The FERTILITY distribution: for each pieces-per-word value, how
    * many DISTINCT words segment to that many pieces (with the UNK
    * count among them) and how many corpus OCCURRENCES they carry.
    * `wordPieces` is a per-distinct-word segmentation table
    * `(w, n_pieces, unk)` ([[WordPiece.wordPieces]]); occurrences pay
    * one bounded probe ([[BpeTrain.boundedProbeJoin]] — `knownWords`
    * skips the routing count when the distinct-word total is already
    * known, the r19 contract). The probe side is the BARRIERED table
    * ITSELF, not a projection of it: a projection reads storageLevel
    * NONE, so with `knownWords` unset the join path would persist a
    * SECOND copy and pay the routing count the r19 contract retired —
    * passing `wp` keeps the barrier visible (no re-persist; a needed
    * routing count reuses the cached rows) and the stray `unk` column
    * falls out at the occurrence aggregation. Output: `(n_pieces,
    * n_distinct_words, n_unk_words, n_occurrences)`. */
  def fertilityHistogram(docs: DataFrame, textCol: String,
      wordPieces: DataFrame,
      maxBroadcastWords: Long = BpeTrain.MaxBroadcastWords,
      knownWords: Option[Long] = None): DataFrame = {
    val wp = Staging.barrier(
      wordPieces.select(col("w"), col("n_pieces"), col("unk")))
    val distinctSide = wp.groupBy("n_pieces")
      .agg(count(lit(1)).as("n_distinct_words"),
        sum("unk").as("n_unk_words"))
    val occurrences = BpeTrain.boundedProbeJoin(
        docs.select(explode(TextDedup.tokens(col(textCol))).as("w")),
        wp, maxBroadcastWords, stage = false, knownWords)
      .groupBy("n_pieces")
      .agg(count(lit(1)).as("n_occurrences"))
    distinctSide.join(occurrences, Seq("n_pieces"))
      .select(col("n_pieces"), col("n_distinct_words"),
        col("n_unk_words"), col("n_occurrences"))
  }
}
