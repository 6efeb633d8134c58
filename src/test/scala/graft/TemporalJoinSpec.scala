package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoin

/** [[TemporalJoin]] laws on randomized data: the shuffle-lean
  * compositions must equal their naive (explode-then-prune) forms. */
class TemporalJoinSpec extends SparkSpec {

  // Deterministic pseudo-random fixtures: keys collide heavily, ts
  // collide sometimes (exercises the tie-break), payload fields include
  // nulls (exercises the struct-atomicity of the match).
  private lazy val left: DataFrame = spark.range(0, 2000).select(
    col("id").as("l_id"),
    pmod(hash(col("id") * 7), lit(23)).cast("long").as("k"),
    pmod(hash(col("id") + 1), lit(500)).cast("long").as("t"),
    (col("id") % 13).as("l_val"))

  private lazy val right: DataFrame = spark.range(0, 1500).select(
    col("id").as("r_id"),
    pmod(hash(col("id") * 11), lit(23)).cast("long").as("k"),
    pmod(hash(col("id") + 2), lit(500)).cast("long").as("t"),
    when(col("id") % 5 === 0, lit(null).cast("long"))
      .otherwise(col("id") * 2).as("r_val"))

  test("asOf equals the naive argmax join (ties + nulls included)") {
    val l = left
    val r = right.select(col("k"), col("t"),
      col("r_id").as("m_id"), col("t").as("m_t"), col("r_val").as("m_val"))
    val got = TemporalJoin.asOf(l, r, "k", "k", "t", "t",
      rightPayload = Seq("m_id", "m_t", "m_val"), tieBreak = Seq("m_id"))

    // Naive: range join then keep the (max t, max m_id) row per left row.
    val w = Window.partitionBy("l_id")
      .orderBy(col("m_t").desc_nulls_last, col("m_id").desc_nulls_last)
    val naive = l.join(r,
        l("k") === r("k") && r("t") <= l("t"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(l("l_id"), l("k"), l("t"), col("l_val"),
        col("m_id"), col("m_t"), col("m_val"))

    assert(got.count() === l.count()) // left-outer: one row per left row
    assert(got.except(naive).count() === 0L)
    assert(naive.except(got).count() === 0L)
  }

  test("asOf at-or-before is inclusive and prefers the max tie-break") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L)).toDF("l_id", "k", "t")
    val r = Seq(
      (7L, 10L, 100L, "same-ts-low"),
      (9L, 10L, 100L, "same-ts-high"),
      (8L, 10L, 101L, "after")).toDF("m_id", "k", "t", "tag")
      .select(col("k"), col("t"), col("m_id"), col("tag").as("m_tag"))
    val got = TemporalJoin.asOf(l, r, "k", "k", "t", "t",
      rightPayload = Seq("m_id", "m_tag"), tieBreak = Seq("m_id"))
      .select("m_id", "m_tag").as[(Long, String)].collect()
    assert(got.toSeq === Seq((9L, "same-ts-high")))
  }

  test("asOf with no preceding right row yields nulls, not dropped rows") {
    import spark.implicits._
    val l = Seq((1L, 10L, 5L), (2L, 99L, 5L)).toDF("l_id", "k", "t")
    val r = Seq((7L, 10L, 6L)).toDF("m_id", "k", "t")
      .select(col("k"), col("t"), col("m_id"))
    val got = TemporalJoin.asOf(l, r, "k", "k", "t", "t",
      rightPayload = Seq("m_id"), tieBreak = Seq("m_id"))
    assert(got.count() === 2L)
    assert(got.filter(col("m_id").isNull).count() === 2L)
  }

  test("asOfTolerance: boundary-inclusive staleness cutoff nulls the payload but keeps the row") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq(
      (1L, 10L, t("2024-01-01 10:30:00")), // match at 10:00 → exactly 30 min: FRESH
      (2L, 10L, t("2024-01-01 10:31:00")), // 31 min: stale → NULL payload, row kept
      (3L, 10L, t("2024-01-01 10:05:00")), // 5 min: fresh
      (4L, 99L, t("2024-01-01 10:30:00"))  // no right row at all
    ).toDF("l_id", "k", "ts")
    val r = Seq((7L, 10L, t("2024-01-01 10:00:00"), 42L))
      .toDF("m_id", "k", "ts", "m_val")
      .select(col("k"), col("ts"), col("m_id"), col("m_val"))
    val got = TemporalJoin.asOfTolerance(l, r, "k", "k", "ts", "ts",
        rightPayload = Seq("m_id", "m_val"), tieBreak = Seq("m_id"),
        toleranceMicros = 30L * 60 * 1000000)
      .orderBy("l_id")
      .collect().map(x => (x.getLong(0),
        Option(x.get(3)).map(_.asInstanceOf[Long]),
        Option(x.get(4)).map(_.asInstanceOf[Long])))
    assert(got === Array(
      (1L, Some(7L), Some(42L)),
      (2L, None, None),
      (3L, Some(7L), Some(42L)),
      (4L, None, None)))
    // staleness must null the WHOLE payload atomically, never a slice
    val mixed = TemporalJoin.asOfTolerance(l, r, "k", "k", "ts", "ts",
      rightPayload = Seq("m_id", "m_val"), tieBreak = Seq("m_id"),
      toleranceMicros = 30L * 60 * 1000000)
    assert(mixed.filter(col("m_id").isNull =!= col("m_val").isNull)
      .count() === 0L)
  }

  test("asOfTolerance numeric ts: raw epoch-micros units, no seconds-misread; mixed sides rejected") {
    import spark.implicits._
    // epoch-micros longs — the cast path would read these as SECONDS
    // and inflate the staleness difference by 1e6 (the round-14
    // advisor finding); the raw path must match the timestamp twin
    val base = 1700000000000000L
    val l = Seq(
      (1L, 10L, base + 30L * 60 * 1000000), // exactly 30 min: FRESH
      (2L, 10L, base + 31L * 60 * 1000000), // 31 min: stale
      (3L, 10L, base + 5L * 60 * 1000000)   // fresh
    ).toDF("l_id", "k", "us")
    val r = Seq((7L, 10L, base, 42L)).toDF("m_id", "k", "us", "m_val")
      .select(col("k"), col("us"), col("m_id"), col("m_val"))
    val got = TemporalJoin.asOfTolerance(l, r, "k", "k", "us", "us",
        rightPayload = Seq("m_id", "m_val"), tieBreak = Seq("m_id"),
        toleranceMicros = 30L * 60 * 1000000)
      .orderBy("l_id")
      .collect().map(x => (x.getLong(0),
        Option(x.get(3)).map(_.asInstanceOf[Long])))
    assert(got === Array((1L, Some(7L)), (2L, None), (3L, Some(7L))))
    // a numeric left against a datetime right is incompatible clocks
    val rTs = Seq((7L, 10L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 42L))
      .toDF("m_id", "k", "ts", "m_val")
      .select(col("k"), col("ts"), col("m_id"), col("m_val"))
    val e = intercept[IllegalArgumentException](
      TemporalJoin.asOfTolerance(l, rTs, "k", "k", "us", "ts",
        rightPayload = Seq("m_id", "m_val"), tieBreak = Seq("m_id"),
        toleranceMicros = 1L))
    assert(e.getMessage.contains("numeric"))
  }

  test("rangeJoin equals the naive theta-join and emits no duplicates") {
    val ranges = spark.range(0, 300).select(
      col("id").as("range_id"),
      pmod(hash(col("id") * 3), lit(1000)).cast("long").as("s"))
      .withColumn("e", col("s") + pmod(hash(col("range_id") + 5), lit(40)))
    val points = spark.range(0, 5000).select(
      col("id").as("p_id"),
      pmod(hash(col("id") * 13), lit(1040)).cast("long").as("p"))

    val bucket = (c: org.apache.spark.sql.Column) => floor(c / 16)
    val got = TemporalJoin.rangeJoin(ranges, "s", "e", points, "p", bucket)
      .select("range_id", "p_id")
    val naive = ranges.join(points,
        points("p") >= ranges("s") && points("p") < ranges("e"))
      .select("range_id", "p_id")

    assert(got.count() === naive.count()) // count equality ⇒ no dup pairs
    assert(got.except(naive).count() === 0L)
    assert(naive.except(got).count() === 0L)
  }

  test("intervalJoin equals the naive overlap theta-join and emits no duplicates") {
    // randomized intervals spanning multiple buckets, boundary-touching
    // pairs included (end exclusive: touching must NOT match)
    val a = spark.range(0, 400).select(
      col("id").as("a_id"),
      pmod(hash(col("id") * 7), lit(1000)).cast("long").as("a_s"))
      .withColumn("a_e", col("a_s") + 1 + pmod(hash(col("a_id") + 11), lit(60)))
    val b = spark.range(0, 400).select(
      col("id").as("b_id"),
      pmod(hash(col("id") * 29), lit(1000)).cast("long").as("b_s"))
      .withColumn("b_e", col("b_s") + 1 + pmod(hash(col("b_id") + 3), lit(30)))

    val bucket = (c: org.apache.spark.sql.Column) => floor(c / 16)
    val got = TemporalJoin.intervalJoin(a, "a_s", "a_e", b, "b_s", "b_e", bucket)
      .select("a_id", "b_id")
    val naive = a.join(b, a("a_s") < b("b_e") && b("b_s") < a("a_e"))
      .select("a_id", "b_id")

    assert(got.count() === naive.count()) // count equality ⇒ claim dedup exact
    assert(got.except(naive).count() === 0L)
    assert(naive.except(got).count() === 0L)
    assert(got.count() > 0)
  }

  test("intervalJoinAuto refines granularity under density and matches the naive join") {
    // DENSE synthetic: 2000 short intervals per side crammed into
    // [0, 1000) — at the coarse initial granularity (one 1024-wide
    // bucket) the per-bucket cost is ~2000², far over the test bound
    val a = spark.range(0, 2000).select(
      col("id").as("a_id"),
      pmod(hash(col("id") * 7), lit(1000)).cast("long").as("a_s"))
      .withColumn("a_e", col("a_s") + 1 + pmod(hash(col("a_id") + 11), lit(8)))
    val b = spark.range(0, 2000).select(
      col("id").as("b_id"),
      pmod(hash(col("id") * 29), lit(1000)).cast("long").as("b_s"))
      .withColumn("b_e", col("b_s") + 1 + pmod(hash(col("b_id") + 3), lit(8)))

    val g = TemporalJoin.autoGranularity(a, "a_s", "a_e", b, "b_s", "b_e",
      initialGranularity = 1024, maxBucketCost = 10000)
    assert(g < 1024, s"dense data must refine the granularity, got $g")
    // never refined below the mean-span floor: under the spans, finer
    // buckets only inflate the explode replication factor
    assert(g >= 5, s"granularity $g fell below the span floor")
    // the REAL per-bucket start-count product at the chosen g fits the
    // uniform-scaling estimate's target within its 2x modeling slack
    val cntA = a.groupBy(floor(col("a_s") / g).as("bk")).count()
      .withColumnRenamed("count", "na")
    val cntB = b.groupBy(floor(col("b_s") / g).as("bk")).count()
      .withColumnRenamed("count", "nb")
    val peak = cntA.join(cntB, "bk")
      .agg(max(col("na") * col("nb"))).head.getLong(0)
    assert(peak <= 2L * 10000, s"per-bucket cost $peak still unbounded at g=$g")

    // granularity choice moves PLAN COST only: values match the naive
    // theta-join exactly, no duplicates (the claim predicate is
    // exactly-once at any g)
    val got = TemporalJoin.intervalJoinAuto(a, "a_s", "a_e", b, "b_s", "b_e",
      initialGranularity = 1024, maxBucketCost = 10000)
      .select("a_id", "b_id")
    val naive = a.join(b, a("a_s") < b("b_e") && b("b_s") < a("a_e"))
      .select("a_id", "b_id")
    assert(got.count() === naive.count())
    assert(got.except(naive).count() === 0L)
    assert(naive.except(got).count() === 0L)
    assert(got.count() > 0)

    // sparse twin: same shape, population under the bound at the
    // initial granularity → g stays put (no needless refinement)
    val sparse = TemporalJoin.autoGranularity(
      a.limit(50), "a_s", "a_e", b.limit(50), "b_s", "b_e",
      initialGranularity = 1024, maxBucketCost = 10000)
    assert(sparse === 1024L)
  }

  test("autoGranularity re-probe catches start-time skew the uniform estimate misses") {
    // ALL starts crammed into [0, 8): halving the granularity does NOT
    // thin the peak bucket (every interval stays in bucket 0 until g
    // drops under 8). The uniform-scaling estimate alone (peak/4 per
    // halving) would claim the bound met after 3 halvings while the
    // real peak is unchanged; the re-probe keeps refining to the span
    // floor instead.
    val a = spark.range(0, 500).select(
      col("id").as("a_id"),
      pmod(hash(col("id") * 7), lit(8)).cast("long").as("a_s"))
      .withColumn("a_e", col("a_s") + 2)
    val b = spark.range(0, 500).select(
      col("id").as("b_id"),
      pmod(hash(col("id") * 29), lit(8)).cast("long").as("b_s"))
      .withColumn("b_e", col("b_s") + 2)
    val g = TemporalJoin.autoGranularity(a, "a_s", "a_e", b, "b_s", "b_e",
      initialGranularity = 1024, maxBucketCost = 10000)
    // span floor = 2; estimate-only would have stopped at 1024/8 = 128
    // (500² / 4³ ≈ 3.9k ≤ 10k) with the real bucket-0 product still
    // ~validating nothing — the re-probe drives g to the floor, the
    // best any granularity can do on this distribution
    assert(g === 2L, s"expected span-floor refinement under skew, got $g")
    // and the join is still exact at the skew-forced granularity
    val got = TemporalJoin.intervalJoinAuto(a, "a_s", "a_e", b, "b_s", "b_e",
      initialGranularity = 1024, maxBucketCost = 10000)
      .select("a_id", "b_id")
    val naive = a.join(b, a("a_s") < b("b_e") && b("b_s") < a("a_e"))
      .select("a_id", "b_id")
    assert(got.count() === naive.count())
    assert(got.except(naive).count() === 0L)
    assert(naive.except(got).count() === 0L)
  }

  test("notFollowedBy: strict start, inclusive end, cross-bucket follow, key isolation") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val views = Seq(
      (1L, 10L, t("2024-01-01 10:00:00")), // purchase at SAME instant: not followed
      (1L, 11L, t("2024-01-01 11:00:00")), // purchase exactly +1h: inclusive end
      (2L, 20L, t("2024-01-01 10:50:00")), // purchase 10:55 in the NEXT hour-bucket? no — same... cross-bucket at 11:05
      (3L, 30L, t("2024-01-01 10:00:00")), // other user's purchase must not count
      (4L, 40L, t("2024-01-01 10:00:00"))  // no purchases at all
    ).toDF("user_id", "event_id", "ts")
    val purchases = Seq(
      (1L, t("2024-01-01 10:00:00")), // == view 10's instant: strict start excludes
      (1L, t("2024-01-01 12:00:00")), // == view 11 + 1h exactly: inclusive end
      (2L, t("2024-01-01 11:05:00")), // 15 min after view 20, next bucket
      (9L, t("2024-01-01 10:30:00"))  // wrong user for view 30
    ).toDF("user_id", "ts")
    val r = TemporalJoin.notFollowedBy(views, purchases, "user_id",
        "event_id", "ts", "ts", windowMicros = 3600000000L)
      .orderBy("lid").collect()
      .map(x => (x.getLong(1), x.getBoolean(3)))
    assert(r === Array((10L, false), (11L, true), (20L, true),
      (30L, false), (40L, false)))
    // followLag: the EARLIEST qualifying lag; unfollowed views drop out
    val lags = TemporalJoin.followLag(views, purchases, "user_id",
        "event_id", "ts", "ts", windowMicros = 3600000000L)
      .orderBy("lid").collect()
      .map(x => (x.getLong(1), x.getLong(3)))
    assert(lags === Array((11L, 3600000000L), (20L, 900000000L)))
  }

  test("notFollowedBy: pre-1970 timestamps bucket on floor division, no dropped matches") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val W = 3600000000L // 1 hour
    // all event times negative epoch-micros; each view's follower sits at
    // a different alignment vs the bucket grid (same bucket, next bucket,
    // exactly on a boundary, exactly at the window end)
    val views = Seq(
      (1L, 10L, t("1969-12-31 22:30:00")), // follower in the next floor bucket
      (1L, 11L, t("1969-12-31 20:00:00")), // ON a boundary; follower mid-bucket
      (2L, 20L, t("1969-12-30 12:30:00")), // follower exactly at ts+W
      (2L, 21L, t("1969-12-30 18:10:00")), // follower 1us past the window: miss
      (3L, 30L, t("1969-12-31 23:30:00"))  // window crosses the 1970 epoch
    ).toDF("user_id", "event_id", "ts")
    val purchases = Seq(
      (1L, t("1969-12-31 23:15:00")),
      (1L, t("1969-12-31 20:20:00")),
      (2L, t("1969-12-30 13:30:00")),
      (2L, new java.sql.Timestamp(t("1969-12-30 19:10:00").getTime + 1L)),
      (3L, t("1970-01-01 00:15:00"))
    ).toDF("user_id", "ts")
    val r = TemporalJoin.notFollowedBy(views, purchases, "user_id",
        "event_id", "ts", "ts", windowMicros = W)
      .orderBy("lid").collect()
      .map(x => (x.getLong(1), x.getBoolean(3)))
    assert(r === Array((10L, true), (11L, true), (20L, true),
      (21L, false), (30L, true)))
    val lags = TemporalJoin.followLag(views, purchases, "user_id",
        "event_id", "ts", "ts", windowMicros = W)
      .orderBy("lid").collect()
      .map(x => (x.getLong(1), x.getLong(3)))
    assert(lags === Array((10L, 2700000000L), (11L, 1200000000L),
      (20L, 3600000000L), (30L, 2700000000L)))
  }
}
