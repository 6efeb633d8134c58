package graft

import graft.operators.{TokenizerEval, WordPiece}

class TokenizerEvalSpec extends SparkSpec {

  import spark.implicits._

  // vocab {a, ##b, ab}: "ab" → [ab] (1 piece), "b" → UNK (no plain
  // "b" piece), "aab" → [a, ##a?] — no ##a, so UNK too? a covers pos 1,
  // pos 2 needs ##a… absent → UNK. Keep the fixture to words with
  // known walks: ab (1 piece), abab (ab + ##?… absent → UNK).
  private val vocab = Set("a", "##b", "ab")
  private val docs = Seq(
    (1L, "ab ab zq", "en", "s1"),
    (2L, "ab", "de", "s1")).toDF("doc_id", "text", "lang", "source")

  test("coverage/compression/fertility: hand-checked integer tables, UNK bucket populated, micro floor division") {
    val stats = WordPiece.encodeStats(docs, "doc_id", "text", vocab)
    // doc 1: ab→[ab]=1, ab→1, zq→UNK(1 piece, flagged); doc 2: ab→1
    val cov = TokenizerEval.coverageByGroup(stats, docs, "doc_id", "lang")
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(cov === Array(
      ("de", 1L, 1L, 1L, 0L, 0L, 1000000L),
      ("en", 1L, 3L, 3L, 1L, 333333L, 1000000L)))
    // compression over the same shape (tokens = n_pieces, size =
    // n_chars): en chars 2+2+2 = 6 → 6e6 div 3 = 2000000 micro
    val comp = TokenizerEval.compressionByGroup(stats, docs, "doc_id",
        "lang", "n_pieces", "n_chars")
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(comp === Array(
      ("de", 1L, 1L, 1L, 2L, 2000000L, 1000000L),
      ("en", 1L, 3L, 3L, 6L, 2000000L, 1000000L)))
    // fertility: distinct words ab (1 piece) and zq (UNK, 1 piece) —
    // one bucket, 2 distinct, 1 UNK, 4 occurrences
    val fert = TokenizerEval.fertilityHistogram(docs, "text",
        WordPiece.wordPieces(docs, "text", vocab))
      .orderBy("n_pieces").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(fert === Array((1L, 2L, 1L, 4L)))
    // occurrence mass conservation: buckets partition the corpus' words
    assert(fert.map(_._4).sum ===
      stats.agg(org.apache.spark.sql.functions.sum("n_words"))
        .head().getLong(0))
  }
}
