package graft

import java.lang.management.ManagementFactory

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs the headline queries (Queries.Q.bench = true) on
 * `SPARK_GRAFT_SF_DIR` and prints a `[bench-details]`-prefixed
 * diagnostics line followed by ONE compact JSON metric line (the final
 * line of output — sized to survive a recorder that keeps only the last
 * ~2 KB of stdout).
 *
 * Honesty notes:
 *   - the action is a noop-format write, which materializes EVERY output
 *     column — `.count()` would let Catalyst prune the md5/enrichment
 *     work out of the plan entirely;
 *   - a small warmup action first, so session/codegen startup isn't
 *     charged to the first query;
 *   - queries run exactly as declared in SparkEntry (including their
 *     result ordering) — the benchmark measures the declared semantics,
 *     not a stripped variant.
 *
 * Noise robustness: a single-shot timing races whatever else the host is
 * doing — round 4's official artifact recorded 67.7 s for a run a quiet
 * host reproduces at 37.3 s, selectively inflating two queries whose code
 * had not changed. Each query therefore runs `SPARK_GRAFT_BENCH_REPS`
 * times (default 3) and reports the MINIMUM — the best observed time is
 * the one bounded below by the actual work, so host contention can only
 * push it UP, never fake an improvement.
 *
 * Self-arbitration (rounds 8/9 lesson — two artifacts in a row taken at
 * load 6–8 needed a side-channel reconciliation to interpret): the JSON
 * now carries enough evidence to adjudicate itself, per query:
 *
 *   - `times`: EVERY rep's seconds (not just the min) — a 18.1/5.0/4.8
 *     sequence reads as "first rep hit contention", three tight high
 *     reps read as "the code is that slow";
 *   - `rep_loads`: the 1-minute load average sampled right after each
 *     rep — the context each number was taken under;
 *   - AUTO-EXTENSION: a query whose relative spread ((max-min)/min)
 *     exceeds `SPARK_GRAFT_BENCH_SPREAD` (default 0.25) WHILE the host
 *     is loaded (latest rep's load > `SPARK_GRAFT_BENCH_HIGH_LOAD`,
 *     default 2.0) gets extra reps, up to `SPARK_GRAFT_BENCH_MAX_REPS`
 *     (default 9) — buying more chances to catch a quiet window. High
 *     spread at LOW load is left alone: that is code-real variance the
 *     artifact should show, not average away. Queries whose best rep is
 *     already under `SPARK_GRAFT_BENCH_EXTEND_FLOOR` seconds (default
 *     0.5) never extend — sub-second spread is first-rep JIT noise
 *     (the recorded c1/j3 pattern), and spending the run's wall-clock
 *     there would starve the heavy queries the bands actually track.
 *
 * The min stays the headline (work-bounded-below); `reps_run` records
 * how many reps each query actually took, so an extended query is
 * visibly flagged as "measured under contention, best-of-N".
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // split small multi-row-group files across tasks: the default
      // 128 MB per partition makes every sub-128MB scan a SINGLE task,
      // silently serializing map-dominated measurements (the official
      // driver corpus is one row group per file, so this only affects
      // multi-group inputs like the scale-audit corpora). Env-tunable
      // for A/B-ing split-size effects on small scan-bound queries
      // (the round-11→12 c1 "regression" was exactly this knob).
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "2m"))
      .config("spark.sql.files.openCostInBytes", "512k")
      // AQE coalescing floor (r21): with the 1 MB default, EVERY
      // post-shuffle stage of a CPU-dense small-shuffle query collapses
      // to one task — the funnel folds' whole per-user NFA ran on one
      // core of 32 (ProfileQuery: w33's two fold stages 0.7 s each, 1
      // task, 1.8 MB shuffle). 64 KB keeps parallelismFirst's
      // cores-wide coalescing for sub-MB-but-expensive shuffles while
      // still collapsing KB-sized type tables; at production shuffle
      // sizes partitions dwarf either floor, so this is local-scale
      // CPU-parallelism recovery, not a cluster tuning. Env-tunable
      // for A/B (set 1m to reproduce the Spark default).
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def loadAvg: Double = ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadAvg

    // warmup: JVM/codegen/file-listing, charged to nobody
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    // dev subset filter: SPARK_GRAFT_BENCH_ONLY=t2_...,t3_... runs only the
    // named headline queries (before/after timing of one family without the
    // full sweep). Guard rails so a subset run can never masquerade as an
    // official artifact: unknown names are FATAL (a typo must not silently
    // shrink the set), and the emitted JSON carries a "subset" marker
    // whenever the filter is active.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val allHeadline = Queries.all.filter(_._2.bench).toSeq.sortBy(_._1)
    only.foreach { names =>
      // subset runs may name ANY registered query (scaling audits time
      // non-headline operators too); the "subset" marker below already
      // keeps such a run from masquerading as an official artifact
      val unknown = names -- Queries.all.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names unknown queries: " +
          s"${unknown.toSeq.sorted.mkString(", ")}")
    }
    val headline = only match {
      case Some(names) =>
        Queries.all.toSeq.sortBy(_._1).filter { case (n, _) => names.contains(n) }
      case None => allHeadline
    }
    val spreadBound = sys.env.getOrElse("SPARK_GRAFT_BENCH_SPREAD", "0.25").toDouble
    val highLoad = sys.env.getOrElse("SPARK_GRAFT_BENCH_HIGH_LOAD", "2.0").toDouble
    val maxReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_REPS", "9").toInt.max(reps)
    val extendFloor = sys.env.getOrElse("SPARK_GRAFT_BENCH_EXTEND_FLOOR", "0.5").toDouble
    var failed = List.empty[String]
    val results = headline.map { case (name, q) =>
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      val repLoads = scala.collection.mutable.ArrayBuffer.empty[Double]
      var broken = false
      def runOnce(): Unit = {
        val t0 = System.nanoTime()
        // scoped frame per run: barrier release is CHARGED to the query
        // (unpersist is part of its real cost; non-blocking bookkeeping)
        // and isolated from every other query's barriers
        graft.operators.Staging.scoped {
          try q.runForBench(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            failed ::= name
            broken = true
          }
        }
        if (!broken) {
          times += (System.nanoTime() - t0) / 1e9
          repLoads += loadAvg
        }
      }
      def spread: Double =
        if (times.size < 2) 0.0 else (times.max - times.min) / times.min
      // a STILL-IMPROVING tail: the global minimum was set within the
      // last 3 reps AND was a real improvement (>2%) over the best
      // before it — the JVM is still warming. JIT descent is NOT
      // monotone (t33's settles 5.9 → 6.2 → 6.8 → 4.7 → … → 4.5, round
      // 13), so requiring the LATEST rep to be the best stops mid-
      // descent; a min that has stood for 3 straight reps has converged.
      def improving: Boolean = times.size >= 2 && {
        val minIdx = times.indexOf(times.min)
        minIdx >= times.size - 3 && {
          val before = times.take(minIdx)
          before.nonEmpty && (before.min - times.min) / times.min > 0.02
        }
      }
      while (!broken && times.size < reps) runOnce()
      // auto-extension, two triggers:
      //   1. noisy spread under a loaded host buys extra reps (a
      //      quiet-host spread is code-real and stands as measured);
      //   2. a still-improving tail extends REGARDLESS of load —
      //      otherwise min-of-reps depends on the rep count, not the
      //      code: the round-10→11 c1 "regression" was r10's loaded
      //      host extending to 9 reps (deep JIT warm, 0.56) while
      //      r11's quiet host stopped at 3 (0.75), rep-for-rep equal.
      // A sub-floor minimum never extends (JIT noise, wall-clock guard).
      while (!broken && times.size < maxReps && times.min > extendFloor &&
        ((spread > spreadBound && repLoads.last > highLoad) || improving))
        runOnce()
      name -> ((times.toSeq, repLoads.toSeq))
    }
    def jmap(pairs: Seq[(String, Double)]): String =
      pairs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    def jmapArr(pairs: Seq[(String, Seq[Double])]): String =
      pairs.map { case (k, vs) =>
        "\"" + k + "\":" + vs.map(v => f"$v%.3f").mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    val mins = results.map { case (k, (ts, _)) => k -> (if (ts.isEmpty) 0.0 else ts.min) }
    val spreads = results.collect { case (k, (ts, _)) if ts.size >= 2 =>
      k -> (ts.max - ts.min) / ts.min }
    val qs = jmap(mins)
    val spreadJson = jmap(spreads)
    val timesJson = jmapArr(results.map { case (k, (ts, _)) => k -> ts })
    val repLoadsJson = jmapArr(results.map { case (k, (_, ls)) => k -> ls })
    val repsRun = results.map { case (k, (ts, _)) => s""""$k":${ts.size}""" }
      .mkString("{", ",", "}")
    val failedJson = failed.reverse.distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = mins.map(_._2).sum
    val loadEnd = loadAvg
    // A failed query must be VISIBLE (in the JSON) and FATAL (non-zero
    // exit) — otherwise a broken headline silently shrinks the total.
    val subsetMarker =
      if (only.isDefined) s""","subset":${headline.length}""" else ""
    // Two-line output (round-14 fix): the harness that records this run
    // keeps only the LAST ~2000 characters of stdout and parses the
    // metric line out of that window — a single line carrying the full
    // per-rep diagnostics (~6 KB at 50 queries × 9 reps) gets cut
    // mid-line and parses as nothing (BENCH_r10–r13 all record
    // "parsed": null). So: full self-arbitration evidence first, on a
    // prefixed line that cannot be mistaken for the metric line (and
    // mostly scrolls out of the window), then ONE compact final line —
    // metric/value/queries-min/failed/sf — sized to fit the window with
    // room for the launcher's trailing status line.
    println(f"""[bench-details] {"times":$timesJson,"rep_loads":$repLoadsJson,"spread":$spreadJson,"reps_run":$repsRun,"reps":$reps,"load":{"start":$loadStart%.2f,"end":$loadEnd%.2f}}""")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson$subsetMarker,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
