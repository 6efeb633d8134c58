package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Crossover measurement for the single-fold vs segment-monoid CEP
 * twins (round-15, the round-14 verdict's "measure it" item): sweeps a
 * power key's event count and times each pair — match enumeration
 * (w26/w27), followedByAny counting (w28/w29), the contiguity NFA
 * (w20/w21 machinery) — recording where the bucketed twin starts
 * winning and where the single fold stops being POSSIBLE at all (the
 * ~2 GB UnsafeRow limit on one key's collected event array, surfaced
 * as `single-exceeded-2GB-row-limit`). Prints one JSON line per size.
 *
 * Usage: runMain graft.CrossoverAudit [sizesCsv] [bucketSeconds]
 */
object CrossoverAudit {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("10000000,20000000,30000000,40000000")
      .split(",").map(_.trim.toLong).toSeq
    val bucketSeconds = args.lift(1).map(_.toLong).getOrElse(3600L)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-crossover-audit")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val types = Seq("view", "click", "purchase", "error")
    val stages = Seq("view", "click", "purchase")
    def rowLimitHit(e: Throwable): Boolean = AuditUtil.rowLimitHit(e)
    def timeTry[A](f: => Array[A]): (Option[Array[A]], Double) = {
      val t0 = System.nanoTime
      try { val r = f; (Some(r), (System.nanoTime - t0) / 1e9) }
      catch { case e: Throwable if rowLimitHit(e) =>
        (None, (System.nanoTime - t0) / 1e9) }
    }
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime; val r = f; (r, (System.nanoTime - t0) / 1e9)
    }
    def cmp(a: Option[Array[org.apache.spark.sql.Row]],
        b: Array[org.apache.spark.sql.Row]): (Boolean, String) = a match {
      case Some(rows) => (rows.map(_.toString).sorted
        .sameElements(b.map(_.toString).sorted), "ok")
      case None => (false, "single-exceeded-2GB-row-limit")
    }
    // scalastyle:off println
    sizes.foreach { powerN =>
      // power key: 1/16 view, 1/16 click, 1/16 purchase, 13/16 error —
      // the dilution keeps funnelAnyCount's ANSWER inside Long (the
      // count is ~(N/16)³/6; a mod-4 mix overflows its own result past
      // ~12M events on one key — that boundary is the operator's
      // documented contract, not a plan property, so the sweep stays
      // below it while the FOLD volume still scales with N)
      val tpPower = when(pmod(col("id"), lit(16)) === 0, "view")
        .when(pmod(col("id"), lit(16)) === 1, "click")
        .when(pmod(col("id"), lit(16)) === 2, "purchase")
        .otherwise("error").as("event_type")
      val tp = element_at(array(types.map(lit): _*),
        (pmod(col("id"), lit(4)) + 1).cast("int")).as("event_type")
      val power = spark.range(powerN).select(lit(0L).as("user_id"),
        col("id").as("event_id"),
        timestamp_micros(lit(1700000000000000L) +
          col("id") * lit(2592000000000L / powerN)).as("ts"), tpPower)
      val bg = spark.range(50000).select(
        (col("id") % 1000 + 1).as("user_id"),
        (col("id") + powerN + 1).as("event_id"),
        timestamp_micros(lit(1700000000000000L) +
          col("id") * lit(51840000L)).as("ts"), tp)
      val ev = power.unionByName(bg).cache()
      ev.count()
      val (aSingle, tASingle) = timeTry(operators.Funnel.funnelAnyCount(ev,
        "user_id", "event_type", "ts", "event_id", stages).collect())
      val (aBucketed, tABucketed) = time(operators.Funnel
        .funnelAnyCountBucketed(ev, "user_id", "event_type", "ts",
          "event_id", stages, bucketSeconds).collect())
      val (aEqual, aStatus) = cmp(aSingle, aBucketed)
      val (mSingle, tMSingle) = timeTry(operators.Funnel.funnelMulti(ev,
        "user_id", "event_type", "ts", "event_id", stages,
        maxMatches = 12).collect())
      val (mBucketed, tMBucketed) = time(operators.Funnel
        .funnelMultiBucketed(ev, "user_id", "event_type", "ts", "event_id",
          stages, maxMatches = 12, bucketSeconds).collect())
      val (mEqual, mStatus) = cmp(mSingle, mBucketed)
      val pStages = Seq(
        operators.Funnel.PatternStage("view", notNextAfter = Some("error")),
        operators.Funnel.PatternStage("click", optional = true),
        operators.Funnel.PatternStage("purchase", strict = true))
      val (pSingle, tPSingle) = timeTry(operators.Funnel.funnelPattern(ev,
        "user_id", "event_type", "ts", "event_id", pStages).collect())
      val (pBucketed, tPBucketed) = time(operators.Funnel
        .funnelPatternBucketed(ev, "user_id", "event_type", "ts",
          "event_id", pStages, bucketSeconds).collect())
      val (pEqual, pStatus) = cmp(pSingle, pBucketed)
      println(s"""{"metric":"cep_crossover","power_events":$powerN,""" +
        s""""bucket_seconds":$bucketSeconds,""" +
        s""""any_single_sec":$tASingle,"any_bucketed_sec":$tABucketed,""" +
        s""""any_equal":$aEqual,"any_single_status":"$aStatus",""" +
        s""""multi_single_sec":$tMSingle,"multi_bucketed_sec":$tMBucketed,""" +
        s""""multi_equal":$mEqual,"multi_single_status":"$mStatus",""" +
        s""""pattern_single_sec":$tPSingle,""" +
        s""""pattern_bucketed_sec":$tPBucketed,""" +
        s""""pattern_equal":$pEqual,"pattern_single_status":"$pStatus"}""")
      ev.unpersist(blocking = true)
    }
    // scalastyle:on println
    spark.stop()
  }
}
