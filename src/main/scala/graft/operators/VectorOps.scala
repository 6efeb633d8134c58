package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Embedding similarity operators (builder-prompt extension surface).
 *
 * The dot product folds LEFT-TO-RIGHT in index order over doubles
 * (`aggregate` ∘ `zip_with`), which is bit-identical to DuckDB's
 * `list_dot_product` over DOUBLE[] — verified empirically — so the
 * differential oracle compares exactly, no tolerance needed.
 *
 * Scale notes (100 TB):
 *   - Brute-force top-k is a broadcast NESTED-loop only when the query
 *     set is small (broadcast the queries, stream the corpus — one pass,
 *     no shuffle of the big side; the per-partition top-k is folded by
 *     TakeOrdered). It is the CORRECTNESS baseline.
 *   - The scale path is sign-LSH bucketing: an 8-bit signature from the
 *     sign pattern of fixed dimensions buckets the corpus; candidate
 *     generation is a bucket equi-join. Recall tuning = more/rotated
 *     signatures (multi-probe), still shuffle-light.
 */
object VectorOps {

  /** float[] → double[] (exact widening; keeps FP folds deterministic). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product over two double arrays — the native fused-loop
    * expression ([[graft.functions.DotProduct]]); bit-identical to the
    * composed fold it replaced (kept below for the equivalence test). */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct(a, b)

  /** The composed-built-ins formulation (`aggregate ∘ zip_with`):
    * allocates an intermediate product array per row — retained as the
    * semantic baseline the native expression is property-tested against. */
  def dotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Corpus with precomputed double vector + norm. */
  def prepared(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))

  /** All pairs (id_a < id_b) with cosine ≥ threshold — near-duplicate
    * detection by embedding. Quadratic: route through [[signBuckets]]
    * candidates at scale; exact form kept as the oracle baseline. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val p = prepared(df, idCol, vecCol)
    val a = p.as("a"); val b = p.as("b")
    a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (excluding itself). Queries side is broadcast. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = prepared(corpus, idCol, vecCol)
    val q = prepared(queries, idCol, vecCol)
      .withColumnRenamed("id", "query_id")
      .withColumnRenamed("v", "qv").withColumnRenamed("nrm", "qnrm")
    val scored = c.join(broadcast(q), col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("qv"), col("v"), col("qnrm"), col("nrm")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Sign-LSH signature: bit i = sign of dimension i (first `bits` dims).
    * Deterministic and oracle-portable (no random hyperplanes). */
  def signBucket(v: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      when(element_at(v, i + 1) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Bucketed ANN: candidates share the sign bucket; exact cosine + top-k
    * within bucket. Trades recall for a shuffle-light equi-join. */
  def bucketedTopK(df: DataFrame, idCol: String, vecCol: String,
      k: Int, bits: Int = 8): DataFrame = {
    val p = prepared(df, idCol, vecCol).withColumn("bkt", signBucket(col("v"), bits))
    val a = p.as("a"); val b = p.as("b")
    val scored = a.join(b, col("a.bkt") === col("b.bkt") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("query_id"), col("b.id").as("neighbor_id"),
        cosine(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
