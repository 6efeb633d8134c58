package graft

import org.apache.spark.sql.{DataFrame, Row}

import graft.operators.Quality

class QualitySpec extends SparkSpec {

  import spark.implicits._

  private def fixture: DataFrame = Seq[(java.lang.Long, String, java.lang.Double)](
    (1L, "O", 10.0), (1L, "O", 11.0),          // duplicate key
    (2L, "F", -5.0),                            // negative value
    (3L, "X", 20.0),                            // out-of-domain status
    (null, "O", 30.0), (4L, null, 40.0))        // null key / null status
    .toDF("k", "status", "v")

  test("constraint checks count planted violations exactly") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Quality.uniqueKey(fixture, Seq("k"), "uniq")
      .unionByName(Quality.notNull(fixture, "k", "nn"))
      .unionByName(Quality.inSet(fixture, "status", Seq("O", "F"), "dom"))
      .unionByName(Quality.atLeast(fixture, "v", 0.0, "pos"))
      .unionByName(Quality.foreignKey(fixture, "k", parent, "pk", "fk"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map(
      "uniq" -> 1L,  // two rows share k=1 (the null key is one "key" value)
      "nn" -> 1L,    // one null key
      "dom" -> 1L,   // 'X' (null status doesn't violate the domain)
      "pos" -> 1L,   // -5.0
      "fk" -> 1L))   // k=4 has no parent; null keys are skipped
  }

  test("profile reports rows/nulls/cardinality/min-max; non-numerics get null bounds") {
    val rows = Quality.profile(fixture, Seq("k", "status", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5))))).toMap
    assert(rows("k") === ((6L, 1L, 4L, Some(1.0), Some(4.0))))
    assert(rows("status") === ((6L, 1L, 3L, None, None)))
    assert(rows("v") === ((6L, 0L, 6L, Some(-5.0), Some(40.0))))
  }

  test("histogram: counts cover all rows, edges tile [min,max], max lands in last bin") {
    val vals = Seq(0.0, 1.0, 2.5, 5.0, 9.9, 10.0).map(Tuple1(_)).toDF("x")
    val out = Quality.histogram(vals, "x", bins = 5)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.map(_._4).sum === 6L)
    assert(out.head._2 === 0.0 && out.last._3 === 10.0)
    // 10.0 (the max) is clamped into bin 4, not a phantom bin 5
    assert(out.last._1 === 4 && out.last._4 === 2L) // 9.9 and 10.0
    // degenerate column: single bucket 0 with all rows
    val flat = Quality.histogram(Seq(7.0, 7.0, 7.0).map(Tuple1(_)).toDF("x"), "x", 4)
      .collect().map(r => (r.getInt(0), r.getLong(3)))
    assert(flat.toSeq === Seq((0, 3L)))
  }

  test("topValues: frequency order with value tie-break, nulls excluded") {
    val df = Seq("b", "b", "a", "a", "c", null).map(Tuple1(_)).toDF("s")
    val out = Quality.topValues(df, "s", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // a and b tie at 2; 'a' wins rank 1 by value; c (1) is cut by k=2
    assert(out.toSeq === Seq(("a", 2L, 1), ("b", 2L, 2)))
  }

  test("approx profile cardinalities stay within HLL error of exact") {
    val ord = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus")
    def card(exact: Boolean): Map[String, Long] =
      Quality.profile(ord, cols, exact = exact)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val (ex, ap) = (card(true), card(false))
    cols.foreach { c =>
      // bound at 3× the requested rsd (0.02): ~3σ of the HLL estimator
      val rel = math.abs(ap(c) - ex(c)).toDouble / math.max(ex(c), 1L)
      assert(rel <= 0.06, s"$c: exact=${ex(c)} approx=${ap(c)} rel=$rel")
    }
  }

  test("Misra-Gries sketch honors the mergeable-summaries guarantees") {
    import spark.implicits._
    // skewed synthetic column: hot values dominate a long uniform tail
    val rows = (Seq.fill(4000)("hot_a") ++ Seq.fill(2500)("hot_b") ++
      Seq.fill(1200)("hot_c") ++ (0 until 2300).map(i => s"tail_${i % 700}"))
    val nCounters = 16
    val n = rows.size.toLong
    val slack = n / (nCounters + 1)
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // exercise partial aggregation + merge across many partitions, and
    // independence from partitioning (guarantees, not counter values)
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("v").repartition(parts)
      val got = graft.operators.Quality.topValuesApprox(df, "v", k = nCounters,
          numCounters = nCounters)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // 1. every item with true freq > N/(k+1) survives
      truth.filter(_._2 > slack).keys.foreach { v =>
        assert(got.contains(v), s"parts=$parts: heavy item $v missing")
      }
      // 2. counts are lower bounds, short by at most N/(k+1)
      got.foreach { case (v, lb) =>
        val t = truth(v)
        assert(lb <= t, s"parts=$parts: $v lb=$lb exceeds true $t")
        assert(lb >= t - slack, s"parts=$parts: $v lb=$lb below ${t - slack}")
      }
      // 3. the three hot values lead the report in frequency order
      val top3 = graft.operators.Quality.topValuesApprox(df, "v", k = 3,
          numCounters = nCounters)
        .orderBy("rank").collect().map(_.getString(0)).toSeq
      assert(top3 === Seq("hot_a", "hot_b", "hot_c"))
    }
  }

  test("HLL sketch: corrected estimate lands in the accuracy band") {
    // p11 oracle-gates the raw integer estimate; THIS row gates the
    // production `est` (JVM ln, small-range correction). p=11 → m=2048,
    // rsd = 1.04/sqrt(m) ≈ 2.3%; assert a 3σ ≈ 7% band vs exact.
    val ord = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
      .withColumn("g", org.apache.spark.sql.functions.lit("all"))
    val exact = ord.select("o_custkey").distinct().count()
    val est = Quality.distinctSketchByKey(ord, "g", "o_custkey", p = 11)
      .collect()(0).getAs[Long]("est")
    val rel = math.abs(est - exact).toDouble / exact
    assert(rel <= 0.07, s"exact=$exact est=$est rel=$rel")
  }

  test("HLL sketch: small-range linear-counting regime is near-exact") {
    import spark.implicits._
    // 5 distinct values in m=1024 registers: raw < 2.5m and zeros > 0,
    // so est takes the linear-counting branch — near-exact at tiny V
    val df = (0 until 200).map(i => s"v_${i % 5}").toDF("s")
      .withColumn("g", org.apache.spark.sql.functions.lit("all"))
    val est = Quality.distinctSketchByKey(df, "g", "s", p = 10)
      .collect()(0).getAs[Long]("est")
    assert(math.abs(est - 5L) <= 1L, s"linear-counting est=$est for 5 distinct")
  }

  test("HLL sketch: full state is invariant to partitioning and merge order") {
    import spark.implicits._
    // registers are element-wise max — commutative, associative AND
    // idempotent — so every output column (including the float-corrected
    // est) must be IDENTICAL across partitionings, like p7/p9's rows
    val rows = (0 until 5000).map(i => (s"t_${i % 3}", s"u_${i % 797}"))
    def state(parts: Int): Seq[Row] = {
      val df = rows.toDF("grp", "v").repartition(parts)
      Quality.distinctSketchByKey(df, "grp", "v", p = 5)
        .orderBy("grp").collect().toSeq
    }
    val base = state(1)
    for (parts <- Seq(7, 32)) assert(state(parts) === base, s"parts=$parts")
  }

  test("grouped Misra-Gries honors the mergeable-summaries guarantees per key") {
    import spark.implicits._
    // two groups with DIFFERENT hot sets and different N: the guarantees
    // must hold per group with that group's own N, across partitionings
    val g1 = (Seq.fill(3000)("g1_hot") ++ Seq.fill(900)("g1_warm") ++
      (0 until 1100).map(i => s"g1_tail_${i % 400}")).map(("k1", _))
    val g2 = (Seq.fill(500)("g2_hot") ++
      (0 until 300).map(i => s"g2_tail_${i % 150}")).map(("k2", _))
    val nCounters = 16
    val truth = (g1 ++ g2).groupBy(identity).view.mapValues(_.size.toLong)
      .toMap // keyed by (group, value)
    val nPer = Map("k1" -> g1.size.toLong, "k2" -> g2.size.toLong)
    for (parts <- Seq(1, 7, 32)) {
      val df = (g1 ++ g2).toDF("grp", "v").repartition(parts)
      val got = graft.operators.Quality.topValuesApproxByKey(df, "grp", "v",
          k = nCounters, numCounters = nCounters)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      nPer.foreach { case (grp, n) =>
        val slack = n / (nCounters + 1)
        // 1. per-group survival of items above that group's threshold
        truth.filter { case ((g, _), c) => g == grp && c > slack }.keys
          .foreach { key =>
            assert(got.contains(key), s"parts=$parts: heavy $key missing")
          }
        // 2. per-group lower bounds within that group's slack
        got.filter(_._1._1 == grp).foreach { case (key, lb) =>
          val t = truth(key)
          assert(lb <= t, s"parts=$parts: $key lb=$lb exceeds true $t")
          assert(lb >= t - slack, s"parts=$parts: $key lb=$lb below ${t - slack}")
        }
      }
      // 3. each group's hot value leads its own ranking — group isolation
      val lead = graft.operators.Quality.topValuesApproxByKey(df, "grp", "v",
          k = 1, numCounters = nCounters)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(lead === Map("k1" -> "g1_hot", "k2" -> "g2_hot"))
    }
  }
}
