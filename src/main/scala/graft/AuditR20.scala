package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Funnel

/**
 * Round-20 design-for-scale audits (closing round):
 *
 * 1. `plans` — physical shapes of the round's one new surface (the
 *    AUDIT_r17–r19 recipe: executed-plan exchange counts after a real
 *    run, AQE final plan):
 *      - w75 range-quantified group enumeration: funnelMulti's witness
 *        fold over the ceiling expansion — must keep the enumeration
 *        family's ONE user-keyed exchange (the range reading is pure
 *        output projection over the same fold);
 *      - w75b + absence: the enumeration's exchange plus the
 *        answer-sized LEFT ANTI equi-join against the blocker events
 *        (the time range as post-condition — never a theta-join) and
 *        the recount window over the answer.
 *
 * 2. `newops` — the new machine at 10×/100× events (sub-linear-per-100×
 *    growth is the 100 TB signature). Expected to track w73's curve
 *    (4.7× at 100×, `AUDIT_r19_newops.json`): w75b is the same witness
 *    fold (6 expanded hops instead of 3 stages) + the same anti-join.
 */
object AuditR20 {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("plans")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-audit-r20")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def enabled(name: String) = which == "all" || which.contains(name)
    // scalastyle:off println

    if (enabled("plans")) {
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
        "/root/testdata/sf0.1")
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      def shuffles(p: String) =
        p.split("== Initial Plan ==").head.linesIterator
          .count(_.contains("Exchange hashpartitioning"))
      def planOf(df: org.apache.spark.sql.DataFrame): String = {
        df.collect(); df.queryExecution.executedPlan.toString
      }
      val w75 = planOf(Funnel.funnelGroupMatchesRange(ev, "user_id",
        "event_type", "ts", "event_id", Seq("view", "click"),
        minTimes = 2, maxTimes = 3, maxMatches = 12))
      val w75b = planOf(Funnel.funnelGroupMatchesRangeAbsence(ev,
        "user_id", "event_type", "ts", "event_id", Seq("view", "click"),
        minTimes = 2, maxTimes = 3, maxMatches = 12,
        windowMicros = 432000L * 1000000L, absentType = "error"))
      println(s"""{"metric":"r20_plan_shapes",""" +
        s""""w75_group_range":{"hash_exchanges":${shuffles(w75)},""" +
        s""""single_user_shuffle":${shuffles(w75) == 1}},""" +
        s""""w75b_range_absence":{"hash_exchanges":${shuffles(w75b)},""" +
        s""""no_theta_join":${!w75b.contains("CartesianProduct") &&
          !w75b.contains("BroadcastNestedLoop")}}}""")
    }

    if (enabled("newops")) {
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
        "/root/testdata/sf0.1")
      val scaleDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
        "target/scale_audit")
      def time[A](f: => A): Double = {
        val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
      }
      def minOf(reps: Int)(f: => Unit): Double =
        (1 to reps).map(_ => time(f)).min
      val rows = Seq("sf0.1" -> s"$sfDir/events.parquet",
        "sf10x" -> s"$scaleDir/sf10x/events.parquet",
        "sf100x" -> s"$scaleDir/sf100x/events.parquet").map {
        case (tag, path) =>
          val ev = spark.read.parquet(path)
          val n = ev.count()
          val w75Sec = minOf(2) {
            val r = Funnel.funnelGroupMatchesRange(ev, "user_id",
                "event_type", "ts", "event_id", Seq("view", "click"),
                minTimes = 2, maxTimes = 3, maxMatches = 12)
              .count()
            require(r >= 0L)
          }
          val w75bSec = minOf(2) {
            val r = Funnel.funnelGroupMatchesRangeAbsence(ev, "user_id",
                "event_type", "ts", "event_id", Seq("view", "click"),
                minTimes = 2, maxTimes = 3, maxMatches = 12,
                windowMicros = 432000L * 1000000L, absentType = "error")
              .count()
            require(r >= 0L)
          }
          s""""$tag":{"events":$n,"group_range_sec":$w75Sec,""" +
            s""""range_absence_sec":$w75bSec}"""
      }
      println(s"""{"metric":"r20_newops_scale",${rows.mkString(",")}}""")
    }
  }
}
