package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Funnel, TextDedup}

/**
 * Round-19 design-for-scale audits:
 *
 * 1. `plans` — physical shapes of the round's new surfaces (the
 *    AUDIT_r17/r18 recipe: executed-plan exchange counts after a real
 *    run, AQE final plan):
 *      - w72 guarded bounded range (single): the capped guarded
 *        dominance fold must keep the family's ONE user-keyed
 *        exchange — the cap is a completion-step saturation and the
 *        kill a −inf coefficient, neither adds an exchange;
 *      - w72b (bucketed): the tropical split's two user-keyed
 *        exchanges, unchanged by the OUTPUT cap;
 *      - t117 compression table: doc-keyed join of encode stats back
 *        to the corpus + one group-cardinality agg — no exchange
 *        beyond the encode family's own;
 *      - t121 soft-dedup sample: corpus LEFT-join against the (small)
 *        cluster table + map-only predicate — the cluster side should
 *        broadcast.
 *
 * 2. `newops` — the round's new machines at 10×/100× events (the
 *    AUDIT_r17/r18 recipe: sub-linear-per-100× growth is the 100 TB
 *    signature). Measured 6.3× (guarded range) and 4.7× (absence) at
 *    100×, tracking the dominance-fold family's curves (greedy 7.9×
 *    r17; reluctant 5.3× and seam-guarded 11.2× r18,
 *    `AUDIT_r18_newops.json`) — consistent with w72 being w71's
 *    guarded fold + w68's cap and w73 the w26 witness fold + one
 *    answer-sized anti-join.
 */
object AuditR19 {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("plans")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-audit-r19")
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
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      def shuffles(p: String) =
        p.split("== Initial Plan ==").head.linesIterator
          .count(_.contains("Exchange hashpartitioning"))
      def planOf(df: org.apache.spark.sql.DataFrame): String = {
        df.collect(); df.queryExecution.executedPlan.toString
      }
      val guardedGroup = Seq(Funnel.PatternStage("view"),
        Funnel.PatternStage("click", notNextAfter = Some("error")))
      val w72 = planOf(Funnel.funnelGroupTimesRange(ev, "user_id",
        "event_type", "ts", "event_id", guardedGroup,
        minTimes = 2, maxTimes = 3))
      val w72b = planOf(Funnel.funnelGroupTimesRangeGuarded(ev,
        "user_id", "event_type", "ts", "event_id", guardedGroup,
        minTimes = 2, maxTimes = 3, bucketSeconds = Some(3600L)))
      val t117 = graft.operators.Staging.scoped {
        val (_, words) = graft.operators.BpeTrain.train(docs, "text",
          rounds = 8)
        planOf(graft.operators.TokenizerEval.compressionByGroup(
          graft.operators.BpeTrain.encodeStats(docs, "doc_id", "text",
            words),
          docs, "doc_id", "lang", "n_syms", "n_chars"))
      }
      val w73 = planOf(Funnel.funnelMatchesAbsence(ev, "user_id",
        "event_type", "ts", "event_id",
        Seq("view", "click", "purchase"), maxMatches = 12,
        windowMicros = 432000L * 1000000L, absentType = "error"))
      val t121 = graft.operators.Staging.scoped {
        val pairs = TextDedup.minhashLshPairs(docs, "doc_id", "text",
            n = 3, k = 16, bandSize = 4, numBands = 4, threshold = 0.5)
          .select("id_a", "id_b")
        val clusters = graft.operators.Staging.barrier(
          TextDedup.connectedComponents(pairs))
        clusters.count()
        planOf(TextDedup.softDedupSample(docs, "doc_id", clusters))
      }
      println(s"""{"metric":"r19_plan_shapes",""" +
        s""""w72_guarded_range":{"hash_exchanges":${shuffles(w72)},""" +
        s""""single_user_shuffle":${shuffles(w72) == 1}},""" +
        s""""w72b_bucketed":{"hash_exchanges":${shuffles(w72b)}},""" +
        s""""t117_compression":{"hash_exchanges":${shuffles(t117)},""" +
        s""""group_agg_rows":"lang-cardinality"},""" +
        s""""w73_absence":{"hash_exchanges":${shuffles(w73)},""" +
        s""""no_theta_join":${!w73.contains("CartesianProduct") &&
          !w73.contains("BroadcastNestedLoop")}},""" +
        s""""t121_soft_sample":{"hash_exchanges":${shuffles(t121)},""" +
        s""""cluster_side_broadcast":${
          t121.contains("BroadcastHashJoin")}}}""")
    }

    // ---- claim 2: the round's new machines at 10×/100× events (the
    // AUDIT_r17/r18 recipe: sub-linear-per-100× growth is the 100 TB
    // signature; w72 is the w71 guarded fold + the w68 cap, w73 is the
    // w26 witness fold + one answer-sized anti-join) ----
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
      val guardedGroup = Seq(Funnel.PatternStage("view"),
        Funnel.PatternStage("click", notNextAfter = Some("error")))
      val rows = Seq("sf0.1" -> s"$sfDir/events.parquet",
        "sf10x" -> s"$scaleDir/sf10x/events.parquet",
        "sf100x" -> s"$scaleDir/sf100x/events.parquet").map {
        case (tag, path) =>
          val ev = spark.read.parquet(path)
          val n = ev.count()
          val w72Sec = minOf(2) {
            val r = Funnel.funnelGroupTimesRange(ev, "user_id",
                "event_type", "ts", "event_id", guardedGroup,
                minTimes = 2, maxTimes = 3)
              .agg(sum(col("reps_completed").cast("long"))).head.getLong(0)
            require(r >= 0L)
          }
          val w73Sec = minOf(2) {
            val r = Funnel.funnelMatchesAbsence(ev, "user_id",
                "event_type", "ts", "event_id",
                Seq("view", "click", "purchase"), maxMatches = 12,
                windowMicros = 432000L * 1000000L, absentType = "error")
              .count()
            require(r >= 0L)
          }
          s""""$tag":{"events":$n,"guarded_range_sec":$w72Sec,""" +
            s""""absence_sec":$w73Sec}"""
      }
      println(s"""{"metric":"r19_newops_scale",${rows.mkString(",")}}""")
    }
  }
}
