package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Writes each named query's `.explain("formatted")` to
  * `<outDir>/<query>_<suffix>.txt` — the r21 plan-evidence dump
  * (the `_before` / `_after` files under plans/r21 are this main run
  * at the pre- and post-optimization HEADs). Uses the Bench confs so
  * the plan shapes match what the bench actually executes.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <query ...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(dir, outDir, suffix) = args.take(3)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "2m"))
      .config("spark.sql.files.openCostInBytes", "512k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      graft.operators.Staging.scoped {
        val plan =
          try Queries.all(n).runForBench(spark, dir)
            .queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          catch { case e: Throwable => s"PLAN FAILED: ${e.getMessage}" }
        Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
      }
    }
    spark.stop()
  }
}
