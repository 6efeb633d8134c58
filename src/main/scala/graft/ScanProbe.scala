package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scan-parallelism probe: times a map-heavy column (langId) over the
  * documents table as-scanned (single task on a one-row-group file)
  * vs explicitly repartitioned — quantifies what a fan-out after a
  * narrow scan buys on the OFFICIAL corpus. Prints one JSON line.
  *
  * Usage: runMain graft.ScanProbe [sfDir] */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scan-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(f: => Long): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    def langCount(df: org.apache.spark.sql.DataFrame): Long =
      df.select(operators.TextAnalysis.langId(col("text")).as("l"))
        .groupBy("l").count().count()
    // warm-up, then min of 3 each
    langCount(docs)
    val narrow = (1 to 3).map(_ => time(langCount(docs))).min
    val wide = (1 to 3).map(_ =>
      time(langCount(docs.repartition(cpus.toInt)))).min
    val parts = docs.rdd.getNumPartitions
    // scalastyle:off println
    println(s"""{"metric":"scan_probe","scan_partitions":$parts,""" +
      s""""narrow_sec":$narrow,"wide_sec":$wide,"sf":"$dir"}""")
    // scalastyle:on println
    spark.stop()
  }
}
