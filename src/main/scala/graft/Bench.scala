package graft

import java.lang.management.ManagementFactory

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs the headline queries (Queries.Q.bench = true) on
 * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
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
 * push it UP, never fake an improvement. The JSON carries the evidence to
 * self-diagnose a noisy run: the 1-minute system load average at start
 * and end, and each query's relative spread ((max-min)/min over its
 * reps) — a large spread under high load means "noise", the same spread
 * at load ~0 means "look at the code".
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
      val unknown = names -- allHeadline.map(_._1).toSet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names unknown bench queries: " +
          s"${unknown.toSeq.sorted.mkString(", ")}")
    }
    val headline = allHeadline
      .filter { case (name, _) => only.forall(_.contains(name)) }
    var failed = List.empty[String]
    val results = headline.map { case (name, q) =>
      val times = (1 to reps).iterator.map { _ =>
        val t0 = System.nanoTime()
        // scoped frame per run: barrier release is CHARGED to the query
        // (unpersist is part of its real cost; non-blocking bookkeeping)
        // and isolated from every other query's barriers
        var ok = true
        graft.operators.Staging.scoped {
          try q.runForBench(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            failed ::= name
            ok = false
          }
        }
        (ok, (System.nanoTime() - t0) / 1e9)
      }.takeWhile(_._1).map(_._2).toSeq // a failed rep stops the query's loop
      name -> times
    }
    def jmap(pairs: Seq[(String, Double)]): String =
      pairs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val mins = results.map { case (k, ts) => k -> (if (ts.isEmpty) 0.0 else ts.min) }
    val spreads = results.collect { case (k, ts) if ts.nonEmpty =>
      k -> (ts.max - ts.min) / ts.min }
    val qs = jmap(mins)
    val spreadJson = jmap(spreads)
    val failedJson = failed.reverse.distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = mins.map(_._2).sum
    val loadEnd = loadAvg
    // A failed query must be VISIBLE (in the JSON) and FATAL (non-zero
    // exit) — otherwise a broken headline silently shrinks the total.
    val subsetMarker =
      if (only.isDefined) s""","subset":${headline.length}""" else ""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"spread":$spreadJson,"reps":$reps,"load":{"start":$loadStart%.2f,"end":$loadEnd%.2f},"failed":$failedJson$subsetMarker,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
