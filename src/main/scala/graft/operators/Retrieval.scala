package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: independent ranked lists fused by reciprocal rank
  * fusion (Cormack, Clarke & Buettcher, SIGIR 2009 — "Reciprocal rank
  * fusion outperforms Condorcet and individual rank learning methods").
  * RRF is THE standard way production search stacks combine a keyword
  * (BM25) retriever with a vector retriever: rank-only fusion needs no
  * score calibration between incommensurable scorers.
  *
  * Scale shape: fusion operates on already-cut top-N lists — list-sized
  * joins, never corpus-sized. The corpus-scale work lives inside the
  * retrievers that PRODUCE the lists ([[graft.operators.TextAnalysis.bm25TopK]]:
  * zero corpus shuffles; [[VectorOps.bruteForceTopK]]/[[VectorOps.ivfSq8TopK]]:
  * broadcast query side), so fusing adds no new shuffle of corpus data.
  */
object Retrieval {

  /** Fuse ranked lists — each `(id, rank)`, rank 1-based, top-N-bounded —
    * into the top `k` ids by RRF score `Σ_lists 1/(kRrf + rank)`, an id
    * absent from a list contributing 0. The score is emitted in integer
    * NANO-units (`round(1e9·Σ)` as BIGINT) so the differential gate
    * compares longs, not float strings — the t32/t42 fixed-point rule;
    * the underlying sum is the same IEEE expression tree in both
    * engines (list order fixed, one terminal round).
    *
    * Ties are impossible to cut ambiguously: (score desc, id asc) is a
    * total order. The final rank window runs over the k-limited frame
    * (single partition of ≤ Σ|lists| rows — the k3 top-k shape, never a
    * corpus-wide window). */
  def rrfFuse(lists: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val renamed = lists.zipWithIndex.map { case (l, i) =>
      l.select(col("id"), col("rank").cast("double").as(s"rk_$i"))
    }
    val joined = renamed.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val score = lists.indices
      .map(i => coalesce(lit(1.0) / (lit(kRrf.toDouble) + col(s"rk_$i")),
        lit(0.0)))
      .reduce(_ + _)
    val fused = joined
      .select(col("id"), round(lit(1e9) * score).cast("long").as("rrf_nano"))
      .orderBy(col("rrf_nano").desc, col("id").asc)
      .limit(k)
    val w = Window.orderBy(col("rrf_nano").desc, col("id").asc)
    fused.withColumn("rank", row_number().over(w))
  }

  /** Hybrid top-k over a corpus with BOTH a text and an embedding
    * representation (joined on id): a BM25 keyword list for `terms` and
    * an exact-cosine list for the probe document `queryVecId`'s
    * embedding, RRF-fused. The probe document is excluded from both
    * sides (query-by-example semantics), so the BM25 statistics are
    * over corpus-minus-probe — deterministic and mirrored verbatim by
    * the differential oracle. `n` is the per-retriever list depth; the
    * fused cut is `k`. */
  def hybridTopK(docs: DataFrame, embeddings: DataFrame,
      docIdCol: String, textCol: String, vecIdCol: String, vecCol: String,
      terms: Seq[String], queryVecId: Long, n: Int, k: Int,
      kRrf: Int = 60): DataFrame = {
    val kwRanked = TextAnalysis
      .bm25TopK(docs.filter(col(docIdCol) =!= queryVecId),
        docIdCol, textCol, terms, n)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_micro").desc, col("id").asc)))
      .select("id", "rank")
    val vecRanked = VectorOps
      .bruteForceTopK(embeddings,
        embeddings.filter(col(vecIdCol) === queryVecId),
        vecIdCol, vecCol, n)
      .select(col("neighbor_id").as("id"), col("rank"))
    rrfFuse(Seq(kwRanked, vecRanked), k, kRrf)
  }
}
