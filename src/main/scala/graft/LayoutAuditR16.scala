package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Layout

/**
 * Round-16 layout audit: HILBERT vs MORTON vs LINEAR file pruning on
 * identical 2-dim boxes (the round-15 verdict's "pruning audit row vs
 * Morton on the same boxes"). Writes the three layouts of sf0.1's
 * lineitem at the same bit budget and file count, then measures, per
 * box, how many files a parquet-stats reader must open under each.
 * Also times the key expressions themselves (the hilbert key is a
 * 2·bits-level rotation fold vs morton's flat bit tree — the audit
 * records what that costs at scan time). Prints one JSON line per box
 * plus one `keys` line.
 *
 * Usage: runMain graft.LayoutAuditR16 [sfDir] [outDirForLayouts]
 */
object LayoutAuditR16 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("layout_r16").toString)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-layout-audit-r16")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val bits = 21
    val n = 64
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime; val r = f; (r, (System.nanoTime - t0) / 1e9)
    }
    val (_, tH) = time(Layout.hilbertOrderWrite(li, "l_orderkey",
      "l_partkey", bits, s"$outDir/h", n, audit = true))
    val (_, tZ) = time(Layout.zOrderWrite(li, "l_orderkey", "l_partkey",
      bits, s"$outDir/z", n, audit = true))
    val (_, tL) = time(Layout.linearWrite(li, "l_orderkey",
      s"$outDir/lin", n))
    // key-expression cost alone: full-column aggregation of each key —
    // the native loop expression vs the staged stock-operator walk vs
    // morton's flat bit tree
    val (hAgg, tHK) = time(li.select(sum(Layout.hilbertValue(
      pmod(col("l_orderkey"), lit(1L << bits)),
      pmod(col("l_partkey"), lit(1L << bits)), bits))).head().getLong(0))
    val (hAggS, tHKS) = time(Layout.hilbertKeyed(li,
      pmod(col("l_orderkey"), lit(1L << bits)),
      pmod(col("l_partkey"), lit(1L << bits)), bits, "__h")
      .select(sum(col("__h"))).head().getLong(0))
    val (zAgg, tZK) = time(li.select(sum(Layout.zValue(
      pmod(col("l_orderkey"), lit(1L << bits)),
      pmod(col("l_partkey"), lit(1L << bits)), bits))).head().getLong(0))
    require(hAgg == hAggS, "native and staged hilbert keys must agree")
    // scalastyle:off println
    println(s"""{"audit":"layout_r16_keys","bits":$bits,"files":$n,""" +
      s""""write_sec":{"hilbert":$tH,"zorder":$tZ,"linear":$tL},""" +
      s""""key_scan_sec":{"hilbert_native":$tHK,"hilbert_staged":$tHKS,""" +
      s""""zorder":$tZK},""" +
      s""""key_checksums":{"hilbert":$hAgg,"zorder":$zAgg}}""")
    // boxes: the r14 set — narrow second-dim stripes linear cannot
    // prune, square boxes, and a first-dim stripe (linear's best case,
    // where the space-filling layouts honestly dilute)
    val boxes = Seq(
      ("narrow_b", 0L, 600000L, 40L, 60L),
      ("square", 100000L, 160000L, 4000L, 7000L),
      ("narrow_a", 0L, 1500L, 0L, 2000000L),
      ("tiny_both", 5000L, 9000L, 100L, 400L))
    // 3-key layouts: hilbert3 (Skilling) vs 3-key Morton vs linear on
    // 3-dim boxes — the t96/t99 configuration at sf0.1
    val li3 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val keys3 = Seq("l_orderkey", "l_partkey", "l_suppkey")
    Layout.hilbertOrderWrite3(li3, keys3, 16, s"$outDir/h3", n)
    Layout.zOrderWriteN(li3, keys3, 16, s"$outDir/z3", n)
    Layout.linearWrite(li3, "l_orderkey", s"$outDir/lin3", n)
    val boxes3 = Seq(
      ("stripe_bc", Seq(("l_orderkey", 0L, 600000L),
        ("l_partkey", 100L, 2000L), ("l_suppkey", 10L, 200L))),
      ("cube", Seq(("l_orderkey", 100000L, 200000L),
        ("l_partkey", 2000L, 8000L), ("l_suppkey", 100L, 400L))))
    boxes3.foreach { case (name, box) =>
      val (ht, hr) = Layout.boxScanFilesN(spark, s"$outDir/h3", box)
      val (_, zr) = Layout.boxScanFilesN(spark, s"$outDir/z3", box)
      val (_, lr) = Layout.boxScanFilesN(spark, s"$outDir/lin3", box)
      def cnt(p: String) = spark.read.parquet(p)
        .filter(box.map { case (c, lo, hi) => col(c).between(lo, hi) }
          .reduce(_ && _)).count()
      val (ch, cz) = (cnt(s"$outDir/h3"), cnt(s"$outDir/z3"))
      println(s"""{"audit":"layout_r16_box3d","box":"$name",""" +
        s""""files_total":$ht,"files_read":{"hilbert3":$hr,""" +
        s""""zorder3":$zr,"linear":$lr},"rows":$ch,""" +
        s""""rows_equal":${ch == cz}}""")
    }
    boxes.foreach { case (name, loA, hiA, loB, hiB) =>
      def read(p: String) = Layout.boxScanFiles(spark, p,
        "l_orderkey", loA, hiA, "l_partkey", loB, hiB)
      val (ht, hr) = read(s"$outDir/h")
      val (_, zr) = read(s"$outDir/z")
      val (_, lr) = read(s"$outDir/lin")
      // content identity per box across layouts
      def cnt(p: String) = spark.read.parquet(p)
        .filter(col("l_orderkey").between(loA, hiA) &&
          col("l_partkey").between(loB, hiB)).count()
      val (ch, cz, cl) = (cnt(s"$outDir/h"), cnt(s"$outDir/z"),
        cnt(s"$outDir/lin"))
      println(s"""{"audit":"layout_r16_box","box":"$name",""" +
        s""""files_total":$ht,"files_read":{"hilbert":$hr,"zorder":$zr,""" +
        s""""linear":$lr},"rows":$ch,"rows_equal":${ch == cz && ch == cl}}""")
    }
    spark.stop()
  }
}
