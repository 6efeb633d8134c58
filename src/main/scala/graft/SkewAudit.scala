package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Skew audit for the CEP funnel pair: synthesizes one power user with
 * `N` events (the pathological key the w6 scaladoc warns about) plus a
 * flat background population, then times [[operators.Funnel.funnel]]
 * (single per-user fold) against [[operators.Funnel.funnelBucketed]]
 * (segment monoid) and asserts value equality. Prints ONE JSON line.
 *
 * Usage: runMain graft.SkewAudit [powerEvents] [bucketSeconds]
 */
object SkewAudit {
  def main(args: Array[String]): Unit = {
    val powerN = args.headOption.map(_.toLong).getOrElse(2000000L)
    val bucketSeconds = args.lift(1).map(_.toLong).getOrElse(3600L)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-skew-audit")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val types = Seq("view", "click", "purchase", "error")
    val tp = element_at(array(types.map(lit): _*),
      (pmod(col("id"), lit(4)) + 1).cast("int")).as("event_type")
    // power user: powerN events over ~30 days; background: 1000 users × 50
    val power = spark.range(powerN).select(lit(0L).as("user_id"),
      col("id").as("event_id"),
      timestamp_micros(lit(1700000000000000L) +
        col("id") * lit(2592000000000L / powerN)).as("ts"), tp)
    val bg = spark.range(50000).select((col("id") % 1000 + 1).as("user_id"),
      (col("id") + powerN + 1).as("event_id"),
      timestamp_micros(lit(1700000000000000L) + col("id") * lit(51840000L)).as("ts"), tp)
    val ev = power.unionByName(bg).cache()
    ev.count()
    val stages = Seq("view", "click", "purchase")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime; val r = f; (r, (System.nanoTime - t0) / 1e9)
    }
    // a single per-user collect_list fold physically CANNOT process a
    // key whose event structs exceed the 2 GB UnsafeRow limit (~30M
    // events) — record that as the failure it is instead of crashing
    // the audit; the bucketed twin has no such key-sized row
    def rowLimitHit(e: Throwable): Boolean = AuditUtil.rowLimitHit(e)
    def timeTry[A](f: => Array[A]): (Option[Array[A]], Double) = {
      val t0 = System.nanoTime
      try { val r = f; (Some(r), (System.nanoTime - t0) / 1e9) }
      catch { case e: Throwable if rowLimitHit(e) =>
        (None, (System.nanoTime - t0) / 1e9)
      }
    }
    // constant-type JSON pair (round-13 advisor): `equal` is ALWAYS a
    // boolean and the overflow case is a separate status field — a
    // mixed bool/string field forces downstream tooling to special-case
    def cmp(a: Option[Array[org.apache.spark.sql.Row]],
        b: Array[org.apache.spark.sql.Row]): (Boolean, String) = a match {
      case Some(rows) => (rows.map(_.toString).sorted
        .sameElements(b.map(_.toString).sorted), "ok")
      case None => (false, "single-exceeded-2GB-row-limit")
    }
    val (single, tSingle) = timeTry(operators.Funnel.funnel(ev, "user_id",
      "event_type", "ts", "event_id", stages).collect())
    val (bucketed, tBucketed) = time(operators.Funnel.funnelBucketed(ev,
      "user_id", "event_type", "ts", "event_id", stages,
      bucketSeconds).collect())
    val (equal, singleStatus) = cmp(single, bucketed)
    // the WINDOWED pair on the same skewed log (within = 2 bucket widths
    // so chains and expiries cross segment boundaries)
    val winMicros = 2L * bucketSeconds * 1000000L
    val (wSingle, tWSingle) = timeTry(operators.Funnel.funnelWithin(ev,
      "user_id", "event_type", "ts", "event_id", stages,
      winMicros).collect())
    val (wBucketed, tWBucketed) = time(operators.Funnel.funnelWithinBucketed(
      ev, "user_id", "event_type", "ts", "event_id", stages, winMicros,
      bucketSeconds).collect())
    val (wEqual, wSingleStatus) = cmp(wSingle, wBucketed)
    // the LOOPING-QUANTIFIER pair (round 13): greedy repetition makes
    // the per-event fold effect heavier still, so the power key's
    // serialization hurts more — the segment monoid's win case
    val loopStages = Seq(("view", 1), ("click", 2), ("purchase", 1))
    val (lSingle, tLSingle) = timeTry(operators.Funnel.funnelLoop(ev,
      "user_id", "event_type", "ts", "event_id", loopStages).collect())
    val (lBucketed, tLBucketed) = time(operators.Funnel.funnelLoopBucketed(
      ev, "user_id", "event_type", "ts", "event_id", loopStages,
      bucketSeconds).collect())
    val (lEqual, lSingleStatus) = cmp(lSingle, lBucketed)
    // the CONTIGUITY-NFA pair (round 14): the l/o fold is the heaviest
    // per-event effect in the family (2k+1 unit-entry folds on the
    // bucketed side), and segment-boundary adjacency is the new
    // correctness risk the power key stresses
    val pStages = Seq(
      operators.Funnel.PatternStage("view", notNextAfter = Some("error")),
      operators.Funnel.PatternStage("click", optional = true),
      operators.Funnel.PatternStage("purchase", strict = true))
    val (pSingle, tPSingle) = timeTry(operators.Funnel.funnelPattern(ev,
      "user_id", "event_type", "ts", "event_id", pStages).collect())
    val (pBucketed, tPBucketed) = time(operators.Funnel.funnelPatternBucketed(
      ev, "user_id", "event_type", "ts", "event_id", pStages,
      bucketSeconds).collect())
    val (pEqual, pSingleStatus) = cmp(pSingle, pBucketed)
    // the MATCH-ENUMERATION pair (round 14): the witness-stream monoid
    // is counter-addition + concat-truncate — the cheapest summary in
    // the family, so the bucketed split should win biggest here
    val (mSingle, tMSingle) = timeTry(operators.Funnel.funnelMulti(ev,
      "user_id", "event_type", "ts", "event_id", stages,
      maxMatches = 12).collect())
    val (mBucketed, tMBucketed) = time(operators.Funnel.funnelMultiBucketed(
      ev, "user_id", "event_type", "ts", "event_id", stages,
      maxMatches = 12, bucketSeconds).collect())
    val (mEqual, mSingleStatus) = cmp(mSingle, mBucketed)
    // scalastyle:off println
    println(s"""{"metric":"skew_funnel","power_events":$powerN,""" +
      s""""bucket_seconds":$bucketSeconds,"single_sec":$tSingle,""" +
      s""""bucketed_sec":$tBucketed,"rows":${bucketed.length},"equal":$equal,""" +
      s""""single_status":"$singleStatus",""" +
      s""""within_single_sec":$tWSingle,"within_bucketed_sec":$tWBucketed,""" +
      s""""within_equal":$wEqual,"within_single_status":"$wSingleStatus",""" +
      s""""loop_single_sec":$tLSingle,"loop_bucketed_sec":$tLBucketed,""" +
      s""""loop_equal":$lEqual,"loop_single_status":"$lSingleStatus",""" +
      s""""pattern_single_sec":$tPSingle,"pattern_bucketed_sec":$tPBucketed,""" +
      s""""pattern_equal":$pEqual,"pattern_single_status":"$pSingleStatus",""" +
      s""""multi_single_sec":$tMSingle,"multi_bucketed_sec":$tMBucketed,""" +
      s""""multi_equal":$mEqual,"multi_single_status":"$mSingleStatus"}""")
    // scalastyle:on println
    spark.stop()
  }
}
