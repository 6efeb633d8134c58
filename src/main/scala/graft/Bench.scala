package graft

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
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: JVM/codegen/file-listing, charged to nobody
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    val headline = Queries.all.filter(_._2.bench).toSeq.sortBy(_._1)
    var failed = List.empty[String]
    val results = headline.map { case (name, q) =>
      val t0 = System.nanoTime()
      // scoped frame per query: barrier release is CHARGED to the query
      // (unpersist is part of its real cost; non-blocking bookkeeping)
      // and isolated from every other query's barriers
      graft.operators.Staging.scoped {
        try q.runForBench(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed ::= name
        }
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failedJson = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // A failed query must be VISIBLE (in the JSON) and FATAL (non-zero
    // exit) — otherwise a broken headline silently shrinks the total.
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
