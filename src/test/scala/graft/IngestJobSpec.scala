package graft

import java.nio.file.Files

import graft.IngestJob._
import graft.operators._

/** End-to-end minimum slice (SURVEY §7): snapshot-ingest with enrichment +
  * self-verification — count equality and zero dual-hash mismatches. */
class IngestJobSpec extends SparkSpec {

  private def cfg(tables: String, replace: Boolean = true) = IngestConfig(
    sourceDir = sf(),
    warehouseDir = Files.createTempDirectory("graft-wh").toString,
    tables = TableMapping.parse(tables),
    replace = replace)

  test("lineitem ingest: count + dual-hash consistency check passes") {
    val results = IngestJob.run(spark, cfg("lineitem"))
    assert(results.size === 1)
    val r = results.head
    assert(r.error.isEmpty, r.error)
    assert(!r.skipped)
    assert(r.report.get.ok, r.report)
    assert(r.report.get.sourceCount === 6000L)
  }

  test("multi-table batch with graceful skip of missing table") {
    val results = IngestJob.run(spark, cfg("region,nation,does_not_exist"))
    assert(results.map(_.skipped) === Seq(false, false, true))
    assert(results.take(2).forall(_.report.exists(_.ok)))
  }

  test("source:sink mapping renames the sink table") {
    val c = cfg("region:region_renamed")
    IngestJob.run(spark, c)
    val sink = Ddl.readTable(spark, s"${c.warehouseDir}/region_renamed")
    assert(sink.count() === 5)
    // 2 source cols + 11 tech cols
    assert(sink.columns.length === 2 + Enrich.TechColsCount)
  }

  test("resume offset appends the suffix to an existing prefix; full-count verify") {
    import org.apache.spark.sql.SaveMode
    // Simulate a run that died after 20 rows: write the enriched prefix
    // under the same total order the resume path uses.
    val c = cfg("nation", replace = true).copy(offsetRows = Map("nation" -> 20L))
    val src = spark.read.parquet(sf() + "/nation.parquet")
    val metas = ColumnMeta.fromSchema(src.schema)
    val wm = SnapshotScan.freezeWatermark(src, "n_nationkey")
    val prefix = SnapshotScan.resumableScan(src, "n_nationkey", wm).limit(20)
    Ddl.writePartitioned(Enrich.enrich(prefix, metas, c.lineage),
      s"${c.warehouseDir}/nation", SaveMode.Append)

    // Resume: must APPEND (even with replace=true) and verify the FULL
    // frozen source count against the full sink.
    val r = IngestJob.run(spark, c).head
    assert(r.error.isEmpty, r.error)
    assert(r.report.get.ok, r.report)
    assert(r.report.get.sourceCount === 25L)
    assert(r.report.get.sinkCount === 25L) // prefix(20) + suffix(5)
  }

  test("resume order is TOTAL with duplicate order keys (tie-breaker columns)") {
    import spark.implicits._
    val df = Seq((1, "b"), (1, "a"), (2, "c"), (2, "a"), (3, "z")).toDF("k", "v")
    val wm = SnapshotScan.freezeWatermark(df, "k")
    val full = SnapshotScan.resumableScan(df, "k", wm, 0, Seq("v")).collect().toSeq
    // duplicate k values: tie-breaker v pins the order; the reference
    // leaves this nondeterministic (FB:1084)
    assert(full.map(r => (r.getInt(0), r.getString(1))) ===
      Seq((1, "a"), (1, "b"), (2, "a"), (2, "c"), (3, "z")))
    val resumed = SnapshotScan.resumableScan(df, "k", wm, 2, Seq("v")).collect().toSeq
    assert(resumed === full.drop(2))
  }

  test("empty source → NULL watermark → empty-set predicate (FB:645–657)") {
    import spark.implicits._
    val empty = spark.createDataFrame(Seq.empty[(Int, String)]).toDF("k", "v")
    val wm = SnapshotScan.freezeWatermark(empty, "k")
    assert(wm.isEmpty)
    val li = spark.read.parquet(sf() + "/lineitem.parquet")
    assert(SnapshotScan.bounded(li, "l_orderkey", wm).count() === 0L)
  }

  test("isolated verify read (vectorization off, parallelism 1) matches plain metrics; conf restored") {
    val c = cfg("region")
    IngestJob.run(spark, c)
    val path = s"${c.warehouseDir}/region"
    val key = "spark.sql.parquet.enableVectorizedReader"
    val before = spark.conf.getOption(key)
    val iso = ConsistencyCheck.isolatedSinkMetrics(spark, path)
    val plain = ConsistencyCheck.sinkMetrics(Ddl.readTable(spark, path))
    assert(iso === plain)
    assert(iso.rowCount === 5L)
    assert(spark.conf.getOption(key) === before)
  }

  test("FB naming mode: uppercase source, lowercase $-sanitized sink (FB:427–466)") {
    assert(TableMapping.parseFb("MIS$DOC, ref$pat:Patients ,Orders") === Seq(
      TableMapping("MIS$DOC", "mis_doc"),   // auto sink: lower + $→_
      TableMapping("REF$PAT", "patients"),  // explicit sink: lower, NOT sanitized
      TableMapping("ORDERS", "orders")))
    // mode dispatch: "fb" routes to parseFb, default preserves case
    assert(TableMapping.parse("A$x:B", "fb") === Seq(TableMapping("A$X", "b")))
    assert(TableMapping.parse("A$x:B", "mis") === Seq(TableMapping("A$x", "B")))
  }

  test("consistency failure throws when failOnError, reports when not (FB:112–114)") {
    val bad = ConsistencyCheck.SnapshotMetrics(rowCount = 9L, hashMismatchCount = 1L)
    intercept[ConsistencyCheck.ConsistencyCheckException] {
      ConsistencyCheck.check("t", srcCount = 10L, bad, failOnError = true)
    }
    val rep = ConsistencyCheck.check("t", srcCount = 10L, bad, failOnError = false)
    assert(!rep.ok && rep.sinkCount === 9L && rep.hashMismatches === 1L)
  }

  test("tech-column name collision gets __ prefix (FB:862–879)") {
    val resolved = Enrich.resolveTechColumnNames(Seq("id", "OP", "row_hash"))
    assert(resolved.contains("__op"))
    assert(resolved.contains("__row_hash"))
    assert(resolved.contains("load_dttm"))
  }
}
