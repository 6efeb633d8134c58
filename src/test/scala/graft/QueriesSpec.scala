package graft

/** Sanity coverage for the named query surface at sf0.001: every query
  * runs and yields the expected shape. Oracle-value parity is the driver's
  * t2 harness (tools/check_oracle.py locally). */
class QueriesSpec extends SparkSpec {

  test("every declared query runs non-empty at sf0.001") {
    Queries.all.foreach { case (name, q) =>
      val df = q.run(spark, sf())
      assert(df.count() > 0, s"query $name returned 0 rows")
    }
  }

  test("oracleSql declared for every query") {
    val missing = Queries.all.collect {
      case (n, q) if q.oracle.isEmpty => n
    }.toSet
    assert(missing === Set.empty)
  }

  test("o3 golden DDL contains the reference's physical-layout choices") {
    val ddl = Queries.o3_create_table_ddl.run(spark, sf()).head.getString(0)
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS `lineitem_sink`"))
    assert(ddl.contains("`row_hash` STRING"))
    assert(ddl.contains("`row_hash_iceberg` STRING"))
    assert(ddl.contains("PARTITIONED BY (`load_month`)"))
    assert(ddl.contains("'parquet.compression' = 'zstd'"))
    assert(ddl.contains(s"'write.target-file-size-bytes' = '${536870912L}'"))
    // all 11 source + 11 tech columns present
    Seq("l_orderkey", "l_shipdate", "load_dttm", "op", "src_system_code")
      .foreach(c => assert(ddl.contains(s"`$c`"), s"missing $c in DDL"))
  }

  test("s1 offset-resume: offset N drops exactly the first N ordered rows") {
    val df0 = Queries.s1_resumable_scan.run(spark, sf())
    // full (offset 1000 already applied); re-run manual scan at offset 0
    val li = spark.read.parquet(sf() + "/lineitem.parquet")
    val wm = operators.SnapshotScan.freezeWatermark(li, "l_orderkey")
      .map(m => math.floor(m.asInstanceOf[Long] * 0.8).toLong)
    val full = operators.SnapshotScan.resumableScan(
      li.select("l_orderkey", "l_linenumber", "l_quantity"),
      "l_orderkey", wm, 0, Seq("l_linenumber"))
    assert(df0.count() === full.count() - 1000)
  }
}
