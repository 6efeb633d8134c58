package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{DictionaryMatch, Funnel, Layout, UnigramLm, WordPiece}

/**
 * Round-17 audit — one JSON line per claim the round's code makes:
 *
 * 1. UNIGRAM-LM 100× — [[UnigramLm.train]] + [[UnigramLm.encodeStats]]
 *    on the Zipf-preserving LM corpora (tools/make_lm_scale_data.py,
 *    the r16 corpus): cost must grow sublinearly — the corpus pass
 *    dominates, the word/seed/vocab tables grow only via the salted
 *    tail.
 *
 * 2. GROUP-PATTERN 100× — [[Funnel.funnelGroupTimes]] (w59's
 *    configuration) over the 10×/100× events corpora: one user-keyed
 *    shuffle + a 2n·k-boolean NFA fold, same scale shape as the flat
 *    pattern family.
 *
 * 3. HILBERT WRITE, STAGED — the round stages the write key once
 *    ([[Layout.stagedClusteredWrite]]); re-measure write_sec vs
 *    Morton at the r16 configuration (sf0.1 lineitem, 21 bits, 64
 *    files) and re-check one pruning box to show the layout itself is
 *    unchanged. r16 baseline: hilbert 5.6 s vs morton 2.0 s.
 *
 * 4. HILBERT 4-D PRUNING — [[Layout.hilbertOrderWriteN]] vs
 *    [[Layout.zOrderWriteN]] on a uniform 4-key table, aggregate
 *    files-read over varied box shapes (per-box adjacency is an
 *    advantage, not a theorem — the spec pins the aggregate, this
 *    records the per-box numbers).
 *
 * 5. ROUTER × CONSUME MODE — a Reluctant [[Funnel
 *    .funnelLoopConsecutiveAuto]] call above threshold must route to
 *    the reluctant BUCKETED twin: structural route detection
 *    ([[AuditUtil.groupsByAttr]]) + value equality vs the explicit
 *    mode call on a 1M-event corpus.
 *
 * 6. PLAN SHAPES — hash-exchange counts + broadcast probes of the
 *    round's headline operators.
 *
 * 7. WORDPIECE 100× — [[WordPiece.train]] + encode on the LM corpora
 *    (the BPE/unigram claim: corpus-pass dominated, vocab-sized
 *    rounds).
 *
 * 8. GROUP-LOOP 100× — [[Funnel.funnelGroupLoop]] over the events
 *    corpora + the one-user-shuffle plan check.
 *
 * 9. GROUP-LOOP SKEW — single dominance fold vs the tropical segment
 *    split at a 10M-event power key, bit-equality + cost, both seam
 *    modes.
 *
 * 10. DICTIONARY TAGGING — [[DictionaryMatch.tag]] K-independence
 *     (8 vs 800 keywords at fixed corpus) + the corpus scale curve.
 *
 * Usage: runMain graft.AuditR17 [sfDir] [scaleAuditDir]
 */
object AuditR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scaleDir = args.lift(1).getOrElse("target/scale_audit")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-audit-r17")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime; val r = f; (r, (System.nanoTime - t0) / 1e9)
    }
    def minOf(reps: Int)(f: => Unit): Double =
      (1 to reps).map(_ => time(f)._2).min

    val which = sys.env.getOrElse("SPARK_GRAFT_AUDIT_ONLY", "all")
    def enabled(name: String) = which == "all" || which.contains(name)

    // ---------------- 1. unigram-LM 100× ----------------
    if (enabled("unigram")) {
      val rows = Seq("sf0.1" -> s"$sfDir/documents.parquet",
        "lm10x" -> s"$scaleDir/lm10x/documents.parquet",
        "lm100x" -> s"$scaleDir/lm100x/documents.parquet").map {
        case (tag, path) =>
          val docs = spark.read.parquet(path)
          val nDocs = docs.count()
          val sec = minOf(2) {
            val vocab = UnigramLm.train(docs, "text")
            val st = UnigramLm.encodeStats(docs, "doc_id", "text", vocab)
              .agg(sum("n_pieces")).head.getLong(0)
            require(st > 0L)
          }
          val vocabSize = UnigramLm.train(docs, "text").size
          s""""$tag":{"docs":$nDocs,"train_encode_sec":$sec,"vocab":$vocabSize}"""
      }
      println(s"""{"metric":"r17_unigram_scale",${rows.mkString(",")}}""")
    }

    // ---------------- 2. group-pattern 100× ----------------
    if (enabled("group")) {
      val group = Seq(Funnel.PatternStage("view"),
        Funnel.PatternStage("click", strict = true))
      val rows = Seq("sf0.1" -> s"$sfDir/events.parquet",
        "sf10x" -> s"$scaleDir/sf10x/events.parquet",
        "sf100x" -> s"$scaleDir/sf100x/events.parquet").map {
        case (tag, path) =>
          val ev = spark.read.parquet(path)
          val n = ev.count()
          val sec = minOf(2) {
            val r = Funnel.funnelGroupTimes(ev, "user_id", "event_type",
                "ts", "event_id", group, times = 2)
              .agg(sum("reps_completed")).head.getLong(0)
            require(r >= 0L)
          }
          s""""$tag":{"events":$n,"sec":$sec}"""
      }
      println(s"""{"metric":"r17_group_pattern_scale",${rows.mkString(",")}}""")
    }

    // ---------------- 3. hilbert write, staged ----------------
    if (enabled("write")) {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_quantity")
      val bits = 21
      val nf = 64
      val outDir =
        java.nio.file.Files.createTempDirectory("layout_r17").toString
      val tH = minOf(2)(Layout.hilbertOrderWrite(li, "l_orderkey",
        "l_partkey", bits, s"$outDir/h", nf))
      val tZ = minOf(2)(Layout.zOrderWrite(li, "l_orderkey", "l_partkey",
        bits, s"$outDir/z", nf))
      // pruning unchanged by the staging: the r16 square box
      val (hT, hR) = Layout.boxScanFiles(spark, s"$outDir/h",
        "l_orderkey", 100000L, 200000L, "l_partkey", 5000L, 15000L)
      val (_, zR) = Layout.boxScanFiles(spark, s"$outDir/z",
        "l_orderkey", 100000L, 200000L, "l_partkey", 5000L, 15000L)
      println(s"""{"metric":"r17_hilbert_write_staged","files":$nf,""" +
        s""""write_sec":{"hilbert_staged":$tH,"zorder":$tZ},""" +
        s""""ratio":${tH / tZ},"r16_baseline":{"hilbert":5.6,"zorder":2.0},""" +
        s""""square_box_files_read":{"hilbert":$hR,"zorder":$zR,"total":$hT}}""")
    }

    // ---------------- 4. hilbert 4-d pruning ----------------
    if (enabled("4d")) {
      val rnd = new scala.util.Random(1717L)
      val rows4 = (0 until 2000000).map(_ => (rnd.nextInt(128).toLong,
        rnd.nextInt(128).toLong, rnd.nextInt(128).toLong,
        rnd.nextInt(128).toLong))
      val df = rows4.toDF("k1", "k2", "k3", "k4")
      val outDir =
        java.nio.file.Files.createTempDirectory("layout4d_r17").toString
      Layout.hilbertOrderWriteN(df, Seq("k1", "k2", "k3", "k4"), 7,
        s"$outDir/h4", 64)
      Layout.zOrderWriteN(df, Seq("k1", "k2", "k3", "k4"), 7,
        s"$outDir/z4", 64)
      val boxes = Seq(
        ("square", Seq(("k1", 20L, 50L), ("k2", 20L, 50L),
          ("k3", 20L, 50L), ("k4", 20L, 50L))),
        ("narrow_k2", Seq(("k1", 0L, 127L), ("k2", 10L, 14L),
          ("k3", 0L, 127L), ("k4", 0L, 127L))),
        ("stripe", Seq(("k1", 0L, 15L), ("k2", 0L, 127L),
          ("k3", 0L, 127L), ("k4", 64L, 80L))),
        ("corner", Seq(("k1", 0L, 31L), ("k2", 0L, 31L),
          ("k3", 0L, 31L), ("k4", 0L, 31L))),
        ("plane", Seq(("k1", 60L, 68L), ("k2", 60L, 68L),
          ("k3", 0L, 127L), ("k4", 0L, 127L))))
      val rows = boxes.map { case (tag, box) =>
        val (hT, hR) = Layout.boxScanFilesN(spark, s"$outDir/h4", box)
        val (_, zR) = Layout.boxScanFilesN(spark, s"$outDir/z4", box)
        def cnt(p: String) = spark.read.parquet(p)
          .filter(box.map { case (c, lo, hi) => col(c).between(lo, hi) }
            .reduce(_ && _)).count()
        val same = cnt(s"$outDir/h4") == cnt(s"$outDir/z4")
        s""""$tag":{"hilbert4":$hR,"morton4":$zR,"total":$hT,"rows_equal":$same}"""
      }
      println(s"""{"metric":"r17_hilbert4d_pruning",${rows.mkString(",")}}""")
    }

    // ---------------- 5. router × consume mode ----------------
    if (enabled("router")) {
      val types = Seq("view", "click", "purchase", "error")
      val corpus = spark.range(1000000L).select(
        (col("id") % 64L).as("user_id"),
        col("id").as("event_id"),
        timestamp_seconds(lit(1700000000L) + col("id") % 86400L).as("ts"),
        element_at(typedLit(types), (col("id") % 4L).cast("int") + 1)
          .as("event_type")).cache()
      corpus.count()
      val stages = Seq("view" -> 2, "click" -> 2)
      val auto = Funnel.funnelLoopConsecutiveAuto(corpus, "user_id",
        "event_type", "ts", "event_id", stages, bucketSeconds = 3600L,
        maxKeyEvents = 10000L, mode = Funnel.Reluctant)
      val picked =
        if (AuditUtil.groupsByAttr(auto)) "bucketed" else "single"
      val autoRows = auto.collect().map(_.toString).sorted.toSeq
      val explicitRows = Funnel.funnelLoopConsecutiveMode(corpus,
          "user_id", "event_type", "ts", "event_id", stages,
          Funnel.Reluctant, Some(3600L))
        .collect().map(_.toString).sorted.toSeq
      val greedyRows = Funnel.funnelLoopConsecutiveBucketed(corpus,
          "user_id", "event_type", "ts", "event_id", stages, 3600L)
        .collect().map(_.toString).sorted.toSeq
      println(s"""{"metric":"r17_router_consume_mode","picked":"$picked",""" +
        s""""values_equal_reluctant_bucketed":${autoRows == explicitRows},""" +
        s""""differs_from_greedy":${autoRows != greedyRows}}""")
      corpus.unpersist()
    }

    // ---------------- 6. plan shapes of the round's operators ----------------
    if (enabled("plans")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val vocab = UnigramLm.train(docs, "text")
      val enc = UnigramLm.encodeStats(docs, "doc_id", "text", vocab)
      enc.collect()
      val encPlan = enc.queryExecution.executedPlan.toString
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      val g = Funnel.funnelGroupTimes(ev, "user_id", "event_type", "ts",
        "event_id", Seq(Funnel.PatternStage("view"),
          Funnel.PatternStage("click", strict = true)), 2)
      g.collect()
      val gPlan = g.queryExecution.executedPlan.toString
      // AdaptiveSparkPlanExec.toString prints BOTH the final and the
      // initial plan — count only the final section or every shuffle
      // doubles
      def shuffles(p: String) =
        p.split("== Initial Plan ==").head.linesIterator
          .count(_.contains("Exchange hashpartitioning"))
      println(s"""{"metric":"r17_plan_shapes",""" +
        s""""t102_encode":{"hash_exchanges":${shuffles(encPlan)},""" +
        s""""broadcast_probe":${encPlan.contains("BroadcastHashJoin")}},""" +
        s""""w59_group":{"hash_exchanges":${shuffles(gPlan)},""" +
        s""""single_user_shuffle":${shuffles(gPlan) == 1}}}""")
      if (sys.env.contains("SPARK_GRAFT_AUDIT_DUMP_PLANS")) {
        System.err.println("==== t102 ====\n" + encPlan)
        System.err.println("==== w59 ====\n" + gPlan)
      }
    }

    // ---------------- 7. WordPiece 100× ----------------
    // Same scale claim as BPE/unigram: one corpus pass builds the word
    // table; all 48 rounds run on vocab-sized state (driver-local
    // here); encode is one more corpus pass against a broadcast vocab.
    // On the Zipf-preserving LM corpora the word table grows only via
    // the salted tail, so cost must track the corpus passes.
    if (enabled("wordpiece")) {
      val rows = Seq("sf0.1" -> s"$sfDir/documents.parquet",
        "lm10x" -> s"$scaleDir/lm10x/documents.parquet",
        "lm100x" -> s"$scaleDir/lm100x/documents.parquet").map {
        case (tag, path) =>
          val docs = spark.read.parquet(path)
          val nDocs = docs.count()
          var vocabSize = 0
          val sec = minOf(2) {
            val (merges, words) = WordPiece.train(docs, "text", rounds = 48)
            val vocab = WordPiece.vocab(words, merges)
            vocabSize = vocab.size
            val st = WordPiece.encodeStats(docs, "doc_id", "text", vocab)
              .agg(sum("n_pieces")).head.getLong(0)
            require(st > 0L)
          }
          s""""$tag":{"docs":$nDocs,"train_encode_sec":$sec,"vocab":$vocabSize}"""
      }
      println(s"""{"metric":"r17_wordpiece_scale",${rows.mkString(",")}}""")
    }

    // ---------------- 8. group-loop 100× + plan shape ----------------
    if (enabled("grouploop")) {
      val group = Seq(Funnel.PatternStage("view"),
        Funnel.PatternStage("click"))
      val rows = Seq("sf0.1" -> s"$sfDir/events.parquet",
        "sf10x" -> s"$scaleDir/sf10x/events.parquet",
        "sf100x" -> s"$scaleDir/sf100x/events.parquet").map {
        case (tag, path) =>
          val ev = spark.read.parquet(path)
          val n = ev.count()
          val sec = minOf(2) {
            val r = Funnel.funnelGroupLoop(ev, "user_id", "event_type",
                "ts", "event_id", group)
              .agg(sum("reps")).head.getLong(0)
            require(r >= 0L)
          }
          s""""$tag":{"events":$n,"sec":$sec}"""
      }
      val g = Funnel.funnelGroupLoop(
        spark.read.parquet(s"$sfDir/events.parquet"), "user_id",
        "event_type", "ts", "event_id", group)
      g.collect()
      def shuffles2(p: String) =
        p.split("== Initial Plan ==").head.linesIterator
          .count(_.contains("Exchange hashpartitioning"))
      val nsh = shuffles2(g.queryExecution.executedPlan.toString)
      println(s"""{"metric":"r17_grouploop_scale",${rows.mkString(",")},""" +
        s""""plan":{"hash_exchanges":$nsh,"single_user_shuffle":${nsh == 1}}}""")
    }

    // ---------------- 9. group-loop skew: tropical twin at a power key ----------------
    // The single dominance fold collects the key's events into one
    // array (the measured ~2 GB wall class, AUDIT_r15_cep_crossover);
    // the tropical segment split bounds per-group memory by the bucket
    // width. Bit-equality + cost at a 10M-event power key, both seam
    // modes.
    if (enabled("groupskew")) {
      val types = Seq("view", "click", "error")
      val n = sys.env.getOrElse("SPARK_GRAFT_AUDIT_SKEW_N", "10000000").toLong
      val corpus = spark.range(n).select(
        lit(7L).as("user_id"), // ONE power key
        col("id").as("event_id"),
        timestamp_seconds(lit(1700000000L) + col("id")).as("ts"),
        element_at(typedLit(types), (col("id") % 3L).cast("int") + 1)
          .as("event_type")).localCheckpoint(true)
      val group = Seq(Funnel.PatternStage("view"),
        Funnel.PatternStage("click", strict = true))
      val out = Seq(false, true).map { consec =>
        val (sv, st) = time(Funnel.funnelGroupLoop(corpus, "user_id",
            "event_type", "ts", "event_id", group, consec)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted)
        val (bv, bt) = time(Funnel.funnelGroupLoopBucketed(corpus,
            "user_id", "event_type", "ts", "event_id", group,
            bucketSeconds = 3600L, consec)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted)
        s""""consec_$consec":{"single_sec":$st,"bucketed_sec":$bt,""" +
          s""""values_equal":${sv == bv},"reps":${sv.head._2}}"""
      }
      println(s"""{"metric":"r17_grouploop_skew","events":$n,""" +
        out.mkString(",") + "}")
    }

    // ---------------- 10. dictionary tagging: K-independence ----------------
    // The Aho–Corasick claim is that tag cost is O(|text|), independent
    // of dictionary size: sweep K at fixed corpus (8 real keywords vs
    // the same plus 792 synthetic absent ones) and scale the corpus at
    // fixed K.
    if (enabled("dict")) {
      val real = Seq("scan", "can", "join", "batch batch", "merge",
        "zebra", "slow", "row")
      val big = real ++ (1 to 792).map(i => s"kw$i absent $i")
      def cost(path: String, kws: Seq[String]): Double = minOf(2) {
        val r = DictionaryMatch.tag(spark.read.parquet(path), "doc_id",
            "text", kws)
          .agg(sum("n_hits")).head.getLong(0)
        require(r > 0L)
      }
      val base = s"$sfDir/documents.parquet"
      val k8 = cost(base, real)
      val k800 = cost(base, big)
      val rows = Seq("lm10x" -> s"$scaleDir/lm10x/documents.parquet",
        "lm100x" -> s"$scaleDir/lm100x/documents.parquet").map {
        case (tag, path) => s""""$tag":${cost(path, real)}"""
      }
      println(s"""{"metric":"r17_dict_tag","sf0.1_k8":$k8,""" +
        s""""sf0.1_k800":$k800,"k_ratio":${k800 / k8},""" +
        rows.mkString(",") + "}")
    }

    spark.stop()
  }
}
