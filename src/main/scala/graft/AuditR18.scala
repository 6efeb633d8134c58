package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{BpeTrain, Funnel, WordPiece}

/**
 * Round-18 design-for-scale audits (the verdict's measurement tasks):
 *
 * 1. `bcast` — the tokenizer encode family's DISTINCT-WORD broadcast
 *    bound (round-17 What's wrong #4): on a synthetic wide-vocabulary
 *    corpus whose distinct-word table exceeds
 *    [[BpeTrain.MaxBroadcastWords]], the probe join must engage the
 *    shuffle fallback AT THE DEFAULT BOUND (not just when forced) and
 *    stay value-identical to the broadcast arm; on an under-bound
 *    corpus the broadcast hint must remain. Route detection is the
 *    logical-layer hint (`strategy=broadcast` in the optimized plan) —
 *    AQE may legitimately re-broadcast a small shuffle join at
 *    runtime, which is exactly the desired graceful degrade.
 *
 * 2. `wall` — the GROUP-LOOP 2 GB wall (round-17 What's wrong #3):
 *    `funnelGroupLoopAuto`'s 16M default threshold was inherited from
 *    the flat family, never evidenced — and the bucketed twin LOSES
 *    1.4–2.8× at the audited 10M skew point, so a too-low threshold
 *    taxes real workloads. Recipe: grow one power key until the
 *    single dominance fold dies by the BufferHolder row limit
 *    ([[AuditUtil.rowLimitHit]]), record the bucketed twin completing
 *    at the death size, and time both sides at the largest surviving
 *    size — the router threshold is then pinned from the measured
 *    wall, not inherited.
 */
object AuditR18 {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("bcast,wall")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-audit-r18")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime; val r = f; (r, (System.nanoTime - t0) / 1e9)
    }
    def enabled(name: String) = which == "all" || which.contains(name)
    // scalastyle:off println

    // ---- claim 1: the distinct-word broadcast bound ----
    if (enabled("bcast")) {
      // nWords distinct words, 8 per doc: the distinct-word table is
      // nWords rows, every word unique (maximally wide vocabulary)
      def corpus(nWords: Long) = spark.range(nWords / 8)
        .select(col("id").as("doc_id"),
          array_join(transform(sequence(lit(0L), lit(7L)),
            j => concat(lit("w"), conv(col("id") * 8L + j, 10, 36))),
            " ").as("text"))
      // chars-only WordPiece vocab: enough alphabet for base-36 words
      val vocab = ("abcdefghijklmnopqrstuvwxyz0123456789w".map(_.toString) ++
        "abcdefghijklmnopqrstuvwxyz0123456789".map(c => "##" + c)).toSet
      def hintBroadcast(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.optimizedPlan.toString.contains("strategy=broadcast")
      def checksum(df: org.apache.spark.sql.DataFrame): Long =
        df.agg(sum(hash(col("id"), col("n_words"), col("n_pieces"),
          col("n_unk_words"), col("n_chars")).cast("long"))).head().getLong(0)
      val results = Seq(300000L, BpeTrain.MaxBroadcastWords + 500000L)
        .map { n =>
          graft.operators.Staging.scoped {
            val docs = corpus(n).cache(); docs.count()
            val dflt = WordPiece.encodeStats(docs, "doc_id", "text", vocab)
            val route = if (hintBroadcast(dflt)) "broadcast" else "shuffle"
            val (cs, tDflt) = time(checksum(dflt))
            // the opposite arm, forced, for value equality
            val forcedBound = if (route == "broadcast") 0L else n + 1L
            val (cs2, tOther) = time(checksum(WordPiece.encodeStats(
              docs, "doc_id", "text", vocab, forcedBound)))
            docs.unpersist(blocking = true)
            s""""words_$n":{"route_at_default":"$route",""" +
              s""""default_sec":${f"$tDflt%.3f"},""" +
              s""""forced_other_sec":${f"$tOther%.3f"},""" +
              s""""values_equal":${cs == cs2}}"""
          }
        }
      println(s"""{"metric":"r18_broadcast_bound","bound":${
        BpeTrain.MaxBroadcastWords},${results.mkString(",")}}""")
    }

    // ---- claim 4: new-machine scale — reluctant + seam-guarded
    // group loops at 10× and 100× events (the AUDIT_r17_group recipe:
    // sub-linear-in-cost growth per 100× is the 100 TB signature;
    // both machines are the w62 dominance fold plus a constant-work
    // completion-step tweak, so their curves must track the greedy
    // machine's 7.9× at 100×) ----
    if (enabled("newops")) {
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
        "/root/testdata/sf0.1")
      val scaleDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
        "target/scale_audit")
      def minOf(reps: Int)(f: => Unit): Double =
        (1 to reps).map { _ => time(f)._2 }.min
      val relGroup = Seq(Funnel.PatternStage("view"),
        Funnel.PatternStage("click"))
      val guardGroup = Seq(Funnel.PatternStage("view"),
        Funnel.PatternStage("click", notNextAfter = Some("error")))
      val rows = Seq("sf0.1" -> s"$sfDir/events.parquet",
        "sf10x" -> s"$scaleDir/sf10x/events.parquet",
        "sf100x" -> s"$scaleDir/sf100x/events.parquet").map {
        case (tag, path) =>
          val ev = spark.read.parquet(path)
          val n = ev.count()
          val relSec = minOf(2) {
            val r = Funnel.funnelGroupLoopMode(ev, "user_id",
                "event_type", "ts", "event_id", relGroup,
                Funnel.Reluctant, minTimes = 2)
              .agg(sum("reps")).head.getLong(0)
            require(r >= 0L)
          }
          val guardSec = minOf(2) {
            val r = Funnel.funnelGroupLoop(ev, "user_id", "event_type",
                "ts", "event_id", guardGroup)
              .agg(sum("reps")).head.getLong(0)
            require(r >= 0L)
          }
          s""""$tag":{"events":$n,"reluctant_sec":$relSec,""" +
            s""""seam_guard_sec":$guardSec}"""
      }
      println(s"""{"metric":"r18_newops_scale",${rows.mkString(",")}}""")
    }

    // ---- claim 3: plan shapes of the round's new operators ----
    // The scale contracts, read off the executed plans at sf0.1:
    //   - the reluctant group loop and the seam-guarded loop keep the
    //     single user-keyed exchange (the mode/guard live inside the
    //     fold, adding no shuffle);
    //   - the span-bounded match enumeration reuses the enumeration's
    //     user hash partitioning for its recount window (no extra
    //     exchange beyond funnelMulti's);
    //   - the interchange round-trip encodes with the same
    //     two-aggregation + bounded-broadcast-probe shape as the
    //     direct encode.
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
      val rel = planOf(Funnel.funnelGroupLoopMode(ev, "user_id",
        "event_type", "ts", "event_id",
        Seq(Funnel.PatternStage("view"), Funnel.PatternStage("click")),
        Funnel.Reluctant, minTimes = 2))
      val guard = planOf(Funnel.funnelGroupLoop(ev, "user_id",
        "event_type", "ts", "event_id",
        Seq(Funnel.PatternStage("view"),
          Funnel.PatternStage("click", notNextAfter = Some("error")))))
      val within = planOf(Funnel.funnelGroupMatchesWithin(ev, "user_id",
        "event_type", "ts", "event_id", Seq("view", "click"),
        times = 2, maxMatches = 12, windowMicros = 432000L * 1000000L))
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val vocab = graft.operators.UnigramLm.train(docs, "text")
      val dir18 = java.nio.file.Files
        .createTempDirectory("graft-audit-interchange").toString
      graft.operators.TokenizerInterchange.exportUnigramTsv(
        s"$dir18/unigram.tsv", vocab)
      val enc = graft.operators.Staging.scoped(planOf(
        graft.operators.UnigramLm.encodeStats(docs, "doc_id", "text",
          graft.operators.TokenizerInterchange.importUnigramTsv(
            s"$dir18/unigram.tsv"))))
      println(s"""{"metric":"r18_plan_shapes",""" +
        s""""w68_reluctant":{"hash_exchanges":${shuffles(rel)},""" +
        s""""single_user_shuffle":${shuffles(rel) == 1}},""" +
        s""""w71_seam_guard":{"hash_exchanges":${shuffles(guard)},""" +
        s""""single_user_shuffle":${shuffles(guard) == 1}},""" +
        s""""w70_matches_within":{"hash_exchanges":${shuffles(within)}},""" +
        s""""t114_interchange_encode":{"hash_exchanges":${shuffles(enc)},""" +
        s""""broadcast_probe":${enc.contains("BroadcastHashJoin")}}}""")
    }

    // ---- claim 2: the group-loop 2 GB wall ----
    if (enabled("wall")) {
      val types = Seq("view", "click", "purchase", "error")
      def corpus(powerN: Long) = {
        val tp = element_at(array(types.map(lit): _*),
          (pmod(col("id"), lit(4)) + 1).cast("int")).as("event_type")
        val power = spark.range(powerN).select(lit(0L).as("user_id"),
          col("id").as("event_id"),
          timestamp_micros(lit(1700000000000000L) +
            col("id") * lit(2592000000000L / powerN)).as("ts"), tp)
        val bg = spark.range(50000).select(
          (col("id") % 1000 + 1).as("user_id"),
          (col("id") + powerN + 1).as("event_id"),
          timestamp_micros(lit(1700000000000000L) +
            col("id") * lit(51840000L)).as("ts"), tp)
        power.unionByName(bg)
      }
      val group = Seq(Funnel.PatternStage("view"),
        Funnel.PatternStage("click"))
      def timeTry(f: => Array[org.apache.spark.sql.Row])
          : (Option[Array[org.apache.spark.sql.Row]], Double, String) = {
        val t0 = System.nanoTime
        try { val r = f; (Some(r), (System.nanoTime - t0) / 1e9, "ok") }
        catch {
          case e: Throwable if AuditUtil.rowLimitHit(e) =>
            (None, (System.nanoTime - t0) / 1e9,
              "single-exceeded-2GB-row-limit")
        }
      }
      val sizes = Seq(16000000L, 32000000L, 48000000L, 64000000L)
      var dead = false
      val rows = sizes.flatMap { n =>
        if (dead) Nil else {
          val ev = corpus(n).cache(); ev.count()
          val (single, tS, status) = timeTry(
            Funnel.funnelGroupLoop(ev, "user_id", "event_type", "ts",
              "event_id", group).collect())
          val (bucketed, tB) = time(
            Funnel.funnelGroupLoopBucketed(ev, "user_id", "event_type",
              "ts", "event_id", group, 3600L).collect())
          val equal = single.exists(s => s.map(_.toString).sorted
            .sameElements(bucketed.map(_.toString).sorted))
          val powerReps = bucketed.find(_.getLong(0) == 0L)
            .map(_.getLong(1)).getOrElse(-1L)
          ev.unpersist(blocking = true)
          if (status != "ok") dead = true
          Some(s""""n_$n":{"single_sec":${f"$tS%.1f"},""" +
            s""""single_status":"$status","bucketed_sec":${f"$tB%.1f"},""" +
            s""""equal":$equal,"power_reps":$powerReps}""")
        }
      }
      println(s"""{"metric":"r18_grouploop_wall",""" +
        s""""router_default":${Funnel.GroupLoopAutoKeyEvents},""" +
        rows.mkString(",") + "}")
    }
    // scalastyle:on println
    spark.stop()
  }
}
