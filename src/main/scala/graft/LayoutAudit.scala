package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Layout

/**
 * Layout audit: writes the lineitem table twice — linearly clustered on
 * `l_orderkey` vs Z-ORDER-clustered on (l_orderkey, l_partkey) — then
 * measures, for a set of 2-dim box predicates, how many FILES each
 * layout's footer stats can prune (the mechanism parquet/Iceberg
 * pruning actually uses). Prints ONE JSON line.
 *
 * Usage: runMain graft.LayoutAudit [sfDir] [numFiles]
 */
object LayoutAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numFiles = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-layout-audit")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val bounds = li.agg(max("l_orderkey"), max("l_partkey")).collect().head
    val (maxA, maxB) = (bounds.getLong(0), bounds.getLong(1))
    val out = java.nio.file.Files.createTempDirectory("layout-audit").toString
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime; val r = f; (r, (System.nanoTime - t0) / 1e9)
    }
    val (_, tZ) = time(Layout.zOrderWrite(li, "l_orderkey", "l_partkey",
      bits = 21, s"$out/z", numFiles))
    val (_, tL) = time(Layout.linearWrite(li, "l_orderkey", s"$out/lin",
      numFiles))
    // three box shapes: the second-dimension stress (full A, 10% B),
    // a square 10%x10% box, and a first-dimension stripe (10% A,
    // full B — where LINEAR should win or tie: z pays interleave
    // dilution on its strongest axis; honesty case)
    val boxes = Seq(
      ("full_a_narrow_b", 0L, maxA, (maxB * 45) / 100, (maxB * 55) / 100),
      ("square_10pct", (maxA * 45) / 100, (maxA * 55) / 100,
        (maxB * 45) / 100, (maxB * 55) / 100),
      ("narrow_a_full_b", (maxA * 45) / 100, (maxA * 55) / 100, 0L, maxB))
    val results = boxes.map { case (name, loA, hiA, loB, hiB) =>
      val (zt, zr) = Layout.boxScanFiles(spark, s"$out/z",
        "l_orderkey", loA, hiA, "l_partkey", loB, hiB)
      val (lt, lr) = Layout.boxScanFiles(spark, s"$out/lin",
        "l_orderkey", loA, hiA, "l_partkey", loB, hiB)
      // row-correctness: both layouts return identical box contents
      def n(p: String) = spark.read.parquet(p)
        .filter(col("l_orderkey").between(loA, hiA) &&
          col("l_partkey").between(loB, hiB)).count()
      val (nz, nl) = (n(s"$out/z"), n(s"$out/lin"))
      require(nz == nl, s"$name: row mismatch $nz vs $nl")
      s""""$name":{"z_files_read":$zr,"z_files_total":$zt,""" +
        s""""linear_files_read":$lr,"linear_files_total":$lt,"rows":$nz}"""
    }
    // scalastyle:off println
    println(s"""{"metric":"zorder_pruning","num_files":$numFiles,""" +
      s""""rows":${li.count()},"write_z_sec":$tZ,"write_linear_sec":$tL,""" +
      results.mkString(",") + "}")
    // scalastyle:on println
    spark.stop()
  }
}
