package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Skew audit for the round-15 CEP pairs: after-match skip
 * ([[operators.Funnel.funnelSkip]] / `funnelSkipBucketed`, SkipToLast
 * on the quantified pattern), loop-internal contiguity
 * ([[operators.Funnel.funnelLoopConsecutive]] / bucketed) and the
 * contiguity × within product ([[operators.Funnel.funnelPatternWithin]]
 * / bucketed) — one power key with `N` events plus a flat background,
 * single vs segment split timed, values asserted equal. The power
 * key's purchases are RARE (1/4999) so pending-branch buckets stay
 * ~100 deep and the skip pair's match count stays answer-sized
 * (enumeration on a key with millions of matches is answer-size-bound
 * by definition — the w30 rationale; and the single fold's per-event
 * bucket copy makes EXTREME pending depth — purchases rarer than
 * ~1/10k — infeasible for it long before the 2 GB wall, which is
 * itself a recorded scale boundary); the fold still walks every
 * event. Prints ONE JSON line.
 *
 * Usage: runMain graft.SkewAuditR15 [powerEvents] [bucketSeconds]
 */
object SkewAuditR15 {
  def main(args: Array[String]): Unit = {
    val powerN = args.headOption.map(_.toLong).getOrElse(20000000L)
    val bucketSeconds = args.lift(1).map(_.toLong).getOrElse(3600L)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-skew-audit-r15")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // power key: view at 16k, clicks ADJACENT at 16k+1/16k+2 (runs for
    // the consecutive pair), rare purchase, error elsewhere
    val m16 = pmod(col("id"), lit(16))
    val tpPower = when(m16 === 0, "view")
      .when(m16 === 1 || m16 === 2, "click")
      .when(pmod(col("id"), lit(4999)) === 3, "purchase")
      .otherwise("error").as("event_type")
    val power = spark.range(powerN).select(lit(0L).as("user_id"),
      col("id").as("event_id"),
      timestamp_micros(lit(1700000000000000L) +
        col("id") * lit(2592000000000L / powerN)).as("ts"), tpPower)
    val types = Seq("view", "click", "purchase", "error")
    val tpBg = element_at(array(types.map(lit): _*),
      (pmod(col("id"), lit(4)) + 1).cast("int")).as("event_type")
    val bg = spark.range(50000).select((col("id") % 1000 + 1).as("user_id"),
      (col("id") + powerN + 1).as("event_id"),
      timestamp_micros(lit(1700000000000000L) +
        col("id") * lit(51840000L)).as("ts"), tpBg)
    val ev = power.unionByName(bg).cache()
    ev.count()
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime; val r = f; (r, (System.nanoTime - t0) / 1e9)
    }
    def rowLimitHit(e: Throwable): Boolean = AuditUtil.rowLimitHit(e)
    def timeTry[A](f: => Array[A]): (Option[Array[A]], Double) = {
      val t0 = System.nanoTime
      try { val r = f; (Some(r), (System.nanoTime - t0) / 1e9) }
      catch { case e: Throwable if rowLimitHit(e) =>
        (None, (System.nanoTime - t0) / 1e9) }
    }
    def cmp(a: Option[Array[org.apache.spark.sql.Row]],
        b: Array[org.apache.spark.sql.Row]): (Boolean, String) = a match {
      case Some(rows) => (rows.map(_.toString).sorted
        .sameElements(b.map(_.toString).sorted), "ok")
      case None => (false, "single-exceeded-2GB-row-limit")
    }
    val qStages = Seq("view" -> 1, "click" -> 2, "purchase" -> 1)
    val (sSingle, tSSingle) = timeTry(operators.Funnel.funnelSkip(ev,
      "user_id", "event_type", "ts", "event_id", qStages,
      operators.Funnel.SkipToLast(2), maxMatches = 12).collect())
    val (sBucketed, tSBucketed) = time(operators.Funnel.funnelSkipBucketed(
      ev, "user_id", "event_type", "ts", "event_id", qStages,
      operators.Funnel.SkipToLast(2), maxMatches = 12,
      bucketSeconds).collect())
    val (sEqual, sStatus) = cmp(sSingle, sBucketed)
    val cStages = Seq("click" -> 2, "view" -> 1)
    val (cSingle, tCSingle) = timeTry(operators.Funnel
      .funnelLoopConsecutive(ev, "user_id", "event_type", "ts",
        "event_id", cStages).collect())
    val (cBucketed, tCBucketed) = time(operators.Funnel
      .funnelLoopConsecutiveBucketed(ev, "user_id", "event_type", "ts",
        "event_id", cStages, bucketSeconds).collect())
    val (cEqual, cStatus) = cmp(cSingle, cBucketed)
    val pStages = Seq(
      operators.Funnel.PatternStage("view", notNextAfter = Some("error")),
      operators.Funnel.PatternStage("click", optional = true),
      operators.Funnel.PatternStage("purchase", strict = true))
    val winMicros = 2L * bucketSeconds * 1000000L
    val (wSingle, tWSingle) = timeTry(operators.Funnel.funnelPatternWithin(
      ev, "user_id", "event_type", "ts", "event_id", pStages,
      winMicros).collect())
    val (wBucketed, tWBucketed) = time(operators.Funnel
      .funnelPatternWithinBucketed(ev, "user_id", "event_type", "ts",
        "event_id", pStages, winMicros, bucketSeconds).collect())
    val (wEqual, wStatus) = cmp(wSingle, wBucketed)
    // scalastyle:off println
    println(s"""{"metric":"skew_r15","power_events":$powerN,""" +
      s""""bucket_seconds":$bucketSeconds,""" +
      s""""skip_single_sec":$tSSingle,"skip_bucketed_sec":$tSBucketed,""" +
      s""""skip_equal":$sEqual,"skip_single_status":"$sStatus",""" +
      s""""skip_rows":${sBucketed.length},""" +
      s""""consec_single_sec":$tCSingle,"consec_bucketed_sec":$tCBucketed,""" +
      s""""consec_equal":$cEqual,"consec_single_status":"$cStatus",""" +
      s""""within_single_sec":$tWSingle,"within_bucketed_sec":$tWBucketed,""" +
      s""""within_equal":$wEqual,"within_single_status":"$wStatus"}""")
    // scalastyle:on println
    spark.stop()
  }
}
