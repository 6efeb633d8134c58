package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Funnel

/**
 * Round-16 new-ops audit, two claims the round's code makes:
 *
 * 1. ITERATIVE-condition funnel wall escape — iterative conditions
 *    break the segment monoid (no O(k) summary exists), so the
 *    skew-safe twin is the SORT-BASED fold. The single collect_list
 *    fold hits the ~2 GB UnsafeRow wall on a big-enough key exactly
 *    like the rest of the family (AUDIT_r15_cep_crossover's 48M
 *    boundary); the sorted fold carries O(k) state over a
 *    spill-backed sort and must COMPLETE there. Measured at a
 *    both-alive size for cost + bit-equality, then at the wall.
 *
 * 2. ROUTER PICKS EACH SIDE — the round's w45–w48 auto-routers
 *    (skip / consecutive / pattern / within) must choose the single
 *    fold below [[Funnel.AutoBucketKeyEvents]] and the bucketed twin
 *    above it ON THE DEFAULT THRESHOLD. Routing happens at plan-build
 *    time (the probe is the only job), so the above-threshold rows
 *    record the CHOSEN PLAN SHAPE (the bucketed plans group by the
 *    `bkt` column) without paying the 20M-key execution already
 *    measured in AUDIT_r15_skew_newops; the below-threshold rows
 *    execute and compare values against the explicit single fold.
 *
 * Prints one JSON line per claim. Usage: runMain graft.AuditR16
 */
object AuditR16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-audit-r16")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime; val r = f; (r, (System.nanoTime - t0) / 1e9)
    }
    def timeTry[A](f: => Array[A]): (Option[Array[A]], Double) = {
      val t0 = System.nanoTime
      try { val r = f; (Some(r), (System.nanoTime - t0) / 1e9) }
      catch { case e: Throwable if AuditUtil.rowLimitHit(e) =>
        (None, (System.nanoTime - t0) / 1e9) }
    }
    val types = Seq("view", "click", "purchase", "error")
    def corpus(powerN: Long): org.apache.spark.sql.DataFrame = {
      val tp = element_at(array(types.map(lit): _*),
        (pmod(col("id"), lit(4)) + 1).cast("int")).as("event_type")
      val power = spark.range(powerN).select(lit(0L).as("user_id"),
        col("id").as("event_id"),
        timestamp_micros(lit(1700000000000000L) +
          col("id") * lit(2592000000000L / powerN)).as("ts"), tp,
        pmod(col("id") * 37L, lit(100000L)).as("v"))
      val bg = spark.range(50000).select(
        (col("id") % 1000 + 1).as("user_id"),
        (col("id") + powerN + 1).as("event_id"),
        timestamp_micros(lit(1700000000000000L) +
          col("id") * lit(51840000L)).as("ts"), tp,
        pmod(col("id") * 37L, lit(100000L)).as("v"))
      power.unionByName(bg)
    }
    val iterStages = Seq(Funnel.IterStage("view"),
      Funnel.IterStage("click", Some(Funnel.RelGt(11, 10))),
      Funnel.IterStage("purchase", Some(Funnel.RelGt(6, 5))))
    val claims = args.headOption.getOrElse("wall,router").split(",").toSet
    // scalastyle:off println
    // ---- claim 1: the wall escape ----
    if (claims("wall")) Seq(10000000L, 48000000L).foreach { n =>
      val ev = corpus(n).cache(); ev.count()
      val (single, tS) = timeTry(Funnel.funnelIterative(ev, "user_id",
        "event_type", "ts", "event_id", "v", iterStages,
        Funnel.AnchorFirst).collect())
      val (sorted, tSo) = time(Funnel.funnelIterativeSorted(ev, "user_id",
        "event_type", "ts", "event_id", "v", iterStages,
        Funnel.AnchorFirst, numPartitions = 8).collect())
      val (equal, status) = single match {
        case Some(rows) => (rows.map(_.toString).sorted
          .sameElements(sorted.map(_.toString).sorted), "ok")
        case None => (false, "single-exceeded-2GB-row-limit")
      }
      println(s"""{"metric":"r16_iterative_wall","power_events":$n,""" +
        s""""single_sec":$tS,"single_status":"$status",""" +
        s""""sorted_sec":$tSo,"equal":$equal}""")
      ev.unpersist(blocking = true)
    }
    // ---- claim 2: routers pick each side on the DEFAULT threshold ----
    if (claims("router")) {
    val skipStages = Seq("view" -> 1, "click" -> 2, "purchase" -> 1)
    val consecStages = Seq("view" -> 2, "click" -> 2)
    val pat = Seq(Funnel.PatternStage("view", notNextAfter = Some("error")),
      Funnel.PatternStage("click", optional = true),
      Funnel.PatternStage("purchase", strict = true))
    val win = 7200L * 1000000L
    def routers(ev: org.apache.spark.sql.DataFrame) = Seq(
      "skip" -> Funnel.funnelSkipAuto(ev, "user_id", "event_type", "ts",
        "event_id", skipStages, Funnel.SkipToLast(2), 8),
      "consecutive" -> Funnel.funnelLoopConsecutiveAuto(ev, "user_id",
        "event_type", "ts", "event_id", consecStages),
      "pattern" -> Funnel.funnelPatternAuto(ev, "user_id", "event_type",
        "ts", "event_id", pat),
      "within" -> Funnel.funnelPatternWithinAuto(ev, "user_id",
        "event_type", "ts", "event_id", pat, win))
    // structural route detection: the bucketed twins GROUP BY a `bkt`
    // ATTRIBUTE (a struct FIELD merely named bkt — the skip fold's
    // state — is not a grouping attribute); shared with the other
    // router audits via AuditUtil
    def picked(df: org.apache.spark.sql.DataFrame): String =
      if (AuditUtil.groupsByAttr(df, "bkt")) "bucketed" else "single"
    // below threshold: 1M-event peak — execute and value-compare
    val small = corpus(1000000L).cache(); small.count()
    val belowOk = routers(small).map { case (name, auto) =>
      val route = picked(auto)
      val autoRows = auto.collect().map(_.toString).sorted
      val explicitRows = (name match {
        case "skip" => Funnel.funnelSkip(small, "user_id", "event_type",
          "ts", "event_id", skipStages, Funnel.SkipToLast(2), 8)
        case "consecutive" => Funnel.funnelLoopConsecutive(small,
          "user_id", "event_type", "ts", "event_id", consecStages)
        case "pattern" => Funnel.funnelPattern(small, "user_id",
          "event_type", "ts", "event_id", pat)
        case _ => Funnel.funnelPatternWithin(small, "user_id",
          "event_type", "ts", "event_id", pat, win)
      }).collect().map(_.toString).sorted
      s""""$name":{"picked":"$route","values_equal":${
        autoRows.sameElements(explicitRows)}}"""
    }
    println(s"""{"metric":"r16_router_below_threshold","peak":1000000,""" +
      s""""default_threshold":${Funnel.AutoBucketKeyEvents},""" +
      belowOk.mkString(",") + "}")
    small.unpersist(blocking = true)
    // above threshold: 17M-event peak — record the chosen plan shape
    // (execution at this scale is AUDIT_r15_skew_newops' measured rows)
    val big = corpus(17000000L).cache(); big.count()
    val aboveRows = routers(big).map { case (name, auto) =>
      s""""$name":"${picked(auto)}""""
    }
    println(s"""{"metric":"r16_router_above_threshold","peak":17000000,""" +
      s""""picked":{${aboveRows.mkString(",")}}}""")
    big.unpersist(blocking = true)
    }
    // scalastyle:on println
    spark.stop()
  }
}
