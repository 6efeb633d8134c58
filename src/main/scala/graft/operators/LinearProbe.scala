package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic distributed linear-probe training over an embedding
 * column — the "train a quality/domain probe on labeled vectors" step
 * of a curation pipeline (the linear-probe evaluation protocol of
 * representation learning, e.g. Alain & Bengio 2017), built so the
 * TRAINED WEIGHTS are bit-reproducible on any cluster and replayable
 * by the DuckDB oracle.
 *
 * Model: least-squares linear probe `ŷ = w·x`, full-batch gradient
 * descent, `w₀ = 0`. The crux is the repo's t32 discipline applied to
 * TRAINING: the per-row, per-dimension gradient contribution
 * `(w·x − y)·x_d` is computed in a FIXED IEEE operation order and
 * rounded to integer micro-units BEFORE the cross-row sum, so the
 * aggregate is exact integer arithmetic — order-independent under
 * Spark's partition-parallel reduction and bit-identical in any other
 * engine. A float gradient sum would drift with aggregation order and
 * make training non-reproducible run-to-run; here every iteration's
 * weight vector is a pure function of the dataset.
 *
 * Per iteration: ONE corpus pass — `w·x` via the codegen'd
 * [[graft.functions.DotProduct]] (left-to-right fold ≡ DuckDB
 * `list_dot_product`), the D gradient components posexploded and
 * hash-aggregated (map-side combine: the shuffle carries D rows per
 * partition — metadata, not data), D summed longs collected to the
 * driver, and the weight update `w_d ← w_d − lr·(G_d/1e6)/N` replayed
 * in fixed double order. The weight vector itself is index metadata
 * (the watermark-head class); the corpus never moves.
 */
object LinearProbe {

  /** One training run; returns (weights after each iteration, N).
    * `yExpr` is the 0/1 (or real-valued) regression target. */
  def train(df: DataFrame, vecCol: String, yExpr: org.apache.spark.sql.Column,
      iters: Int, lr: Double): (Seq[Array[Double]], Long) = {
    val v = Staging.barrier(df.select(
      col(vecCol).cast("array<double>").as("e"), yExpr.cast("double").as("y")))
    val n = v.count()
    require(n > 0, "LinearProbe.train needs a non-empty labeled table")
    val first = v.select(size(col("e"))).head.getInt(0)
    var w = Array.fill(first)(0.0)
    val trail = Seq.newBuilder[Array[Double]]
    (1 to iters).foreach { _ =>
      val wl = typedLit(w.toSeq)
      // let-bind the dot: the gradient lambda references it per element,
      // and lambda bodies get no subexpression elimination
      val grads = v.select(posexplode(ExprUtil.bound(
        graft.functions.DotProduct(col("e"), wl)) { dt =>
          transform(col("e"), x =>
            round((dt - col("y")) * x * lit(1e6)).cast("long"))
        }).as(Seq("d", "g")))
        .groupBy("d").agg(sum("g").as("g"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      w = w.indices.map { d =>
        w(d) - lr * ((grads.getOrElse(d, 0L).toDouble / 1e6) / n.toDouble)
      }.toArray
      trail += w
    }
    (trail.result(), n)
  }

  /**
   * Probe-based corpus selection — the actual curation use of a
   * trained probe: train on the labeled table, then score EVERY vector
   * map-side (`round(w·x·1e6)` — the trained weights ride along as a
   * literal, no join) and keep the global top-k by
   * (score desc, id asc). The cut is `orderBy.limit` =
   * TakeOrderedAndProject: per-partition top-k heaps, k rows to the
   * driver — never a global sort, so the selection pass is one
   * map-only scan at any corpus size.
   */
  def selectTop(df: DataFrame, idCol: String, vecCol: String,
      yExpr: org.apache.spark.sql.Column, iters: Int, lr: Double,
      k: Int): DataFrame = {
    val (trail, _) = train(df, vecCol, yExpr, iters, lr)
    val wl = typedLit(trail.last.toSeq)
    df.select(col(idCol), yExpr.cast("int").as("y"),
        round(graft.functions.DotProduct(
          col(vecCol).cast("array<double>"), wl) * lit(1e6))
          .cast("long").as("score_micro"))
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(k)
  }

  /** Gated rendering: final weights as (dim 1-based, w_micro). The
    * micro rounding goes through Spark's `round` expression — NOT
    * Scala's `math.round`, whose half-up tie rule differs from SQL's
    * half-away-from-zero on negative midpoints. */
  def trainedWeights(spark: SparkSession, df: DataFrame, vecCol: String,
      yExpr: org.apache.spark.sql.Column, iters: Int, lr: Double): DataFrame = {
    import spark.implicits._
    val (trail, _) = train(df, vecCol, yExpr, iters, lr)
    trail.last.zipWithIndex
      .map { case (wd, i) => (i + 1, wd) }
      .toSeq.toDF("dim", "w")
      .select(col("dim"), round(col("w") * lit(1e6)).cast("long").as("w_micro"))
  }
}
