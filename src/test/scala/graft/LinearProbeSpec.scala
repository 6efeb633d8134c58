package graft

import org.apache.spark.sql.functions._

import graft.operators.LinearProbe

class LinearProbeSpec extends SparkSpec {

  import spark.implicits._

  test("one GD iteration matches hand arithmetic") {
    val df = Seq((Seq(1.0, 0.0), 1), (Seq(0.0, 1.0), 0)).toDF("v", "lbl")
    val (trail, n) = LinearProbe.train(df, "v", col("lbl"), iters = 1, lr = 0.1)
    assert(n === 2L)
    // w0 = 0 → dot = 0; row 1 gradient (0−1)·x = (−1e6, 0) micro; row 2 zero
    // w1 = 0 − 0.1·((−1e6/1e6)/2) = (+0.05, 0)
    assert(trail.last.toSeq === Seq(0.05, 0.0))
  }

  test("weights are bit-identical under repartitioning (integer gradient sums)") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val (a, _) = LinearProbe.train(emb, "embedding", col("label") % 2,
      iters = 3, lr = 0.1)
    val (b, _) = LinearProbe.train(emb.repartition(7), "embedding",
      col("label") % 2, iters = 3, lr = 0.1)
    assert(a.last.toSeq === b.last.toSeq)
    // and training moved the weights
    assert(a.last.exists(_ != 0.0))
  }

  test("probe separates a linearly separable target") {
    // y = 1 exactly when dim-0 is positive
    val rows = (0 until 40).map { i =>
      val x0 = if (i % 2 == 0) 1.0 else -1.0
      (Seq(x0, 0.25), if (x0 > 0) 1 else 0)
    }
    val df = rows.toDF("v", "lbl")
    val (trail, _) = LinearProbe.train(df, "v", col("lbl"), iters = 10, lr = 0.5)
    val w = trail.last
    // the separating direction is learned: ŷ(class 1) − ŷ(class 0) = 2·w₀ > 0
    // (dim 1 is a constant 0.25 — it converges toward the intercept role,
    // absorbing the 0.5 target mean, so no claim on relative magnitude)
    assert(w(0) > 0.0)
    val predDiff = (w(0) * 1.0 + w(1) * 0.25) - (w(0) * -1.0 + w(1) * 0.25)
    assert(predDiff > 0.5)
  }

  test("selectTop skews the selection toward the positive class") {
    val emb = spark.read.parquet(sf("sf0.01") + "/embeddings.parquet")
    val sel = LinearProbe.selectTop(emb, "vec_id", "embedding",
      col("label") % 2, iters = 3, lr = 0.1, k = 50).cache()
    try {
      val rows = sel.collect()
      assert(rows.length === 50)
      val frac = rows.map(_.getInt(1)).sum / 50.0
      val base = emb.agg(avg(col("label") % 2)).head.getDouble(0)
      assert(frac > base, s"selected class-1 fraction $frac <= base rate $base")
      // the cut is the global top-k: every selected score >= every excluded
      val minSel = rows.map(_.getLong(2)).min
      val above = emb.select(col("vec_id")).count() - 50
      val excludedMax = LinearProbe.selectTop(emb, "vec_id", "embedding",
        col("label") % 2, iters = 3, lr = 0.1, k = emb.count().toInt)
        .collect().drop(50).map(_.getLong(2)).max
      assert(excludedMax <= minSel)
    } finally sel.unpersist()
  }

  test("plan gate: the scoring pass is map-only with a per-partition top-k cut") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val plan = LinearProbe.selectTop(emb, "vec_id", "embedding",
        col("label") % 2, iters = 1, lr = 0.1, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must be per-partition heaps, not a sort:\n$plan")
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"scoring with literal weights must not shuffle or join:\n$plan")
  }
}
