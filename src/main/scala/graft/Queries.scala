package graft

import java.sql.Types

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.CanonicalHash
import graft.operators._

/**
 * The engine's named query surface (SURVEY §2 inventory → one runnable
 * query per operator row family), each with a DuckDB-dialect differential
 * oracle. Query functions take `(spark, sfDir)` and read the driver's
 * parquet corpus; oracle SQL reads the same tables by bare name.
 *
 * Every multi-row result carries an explicit total ORDER BY on both sides
 * so the comparison is insensitive to the driver's row-ordering policy.
 */
object Queries {

  final case class Q(
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      bench: Boolean = false)

  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark rejects by
    // default; read it as raw nanos (LongType) and convert explicitly
    // where event time is needed (see eventsWithTs).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events with `ts` converted from raw nanos to a naive timestamp
    * (microsecond truncation — same as DuckDB's TIMESTAMP_NS→TIMESTAMP
    * cast). */
  private def eventsWithTs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events").withColumn("ts",
      timestamp_micros(floor(col("ts") / 1000L).cast(LongType)).cast(TimestampNTZType))

  // Static schema mirrors of the driver corpus (FIXTURES.md §2) — used to
  // generate oracle SQL at class-init time, where no SparkSession exists.
  // Runtime query functions derive metadata from the actual files.
  private def metasOf(fields: (String, DataType)*): Seq[ColumnMeta] =
    fields.map { case (n, dt) => ColumnMeta.fromField(StructField(n, dt)) }

  val LineitemMetas: Seq[ColumnMeta] = metasOf(
    "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
    "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
    "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
    "l_tax" -> DoubleType, "l_returnflag" -> StringType,
    "l_linestatus" -> StringType, "l_shipdate" -> TimestampNTZType)

  val OrdersMetas: Seq[ColumnMeta] = metasOf(
    "o_orderkey" -> LongType, "o_custkey" -> LongType,
    "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
    "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType)

  // ---------------------------------------------------------------------
  // S1/S2/K1/K2/F2: resumable ordered watermark-bounded scan
  // ---------------------------------------------------------------------

  private val scanWmSql =
    "(SELECT CAST(FLOOR(MAX(l_orderkey) * 0.8) AS BIGINT) FROM lineitem)"

  val s1_resumable_scan: Q = Q(
    run = (spark, dir) => {
      val li = t(spark, dir, "lineitem")
      val wm = SnapshotScan.freezeWatermark(li, "l_orderkey")
        .map(m => math.floor(m.asInstanceOf[Long] * 0.8).toLong)
      SnapshotScan.resumableScan(
        li.select("l_orderkey", "l_linenumber", "l_quantity"),
        "l_orderkey", wm, offsetRows = 1000, tieBreakers = Seq("l_linenumber"))
    },
    oracle = Some(
      s"""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         |WHERE l_orderkey <= $scanWmSql
         |ORDER BY l_orderkey, l_linenumber OFFSET 1000""".stripMargin))

  // S3/K4: access probe (`SELECT FIRST 1`)
  val s3_access_probe: Q = Q(
    run = (spark, dir) => t(spark, dir, "lineitem").limit(1).select(lit(1).as("ok")),
    oracle = Some("SELECT 1 AS ok FROM lineitem LIMIT 1"))

  // S4/D: dynamic schema inference through the type-mapping system
  val s4_schema_inference: Q = Q(
    run = (spark, dir) => {
      import spark.implicits._
      ColumnMeta.fromSchema(t(spark, dir, "lineitem").schema)
        .map(m => (m.name, TypeMapping.ddlType(m.dataType)))
        .toDF("column_name", "ddl_type").orderBy("column_name")
    },
    oracle = Some(
      """SELECT * FROM (VALUES
        |  ('l_orderkey','BIGINT'), ('l_partkey','BIGINT'), ('l_suppkey','BIGINT'),
        |  ('l_linenumber','INT'), ('l_quantity','DOUBLE'), ('l_extendedprice','DOUBLE'),
        |  ('l_discount','DOUBLE'), ('l_tax','DOUBLE'), ('l_returnflag','STRING'),
        |  ('l_linestatus','STRING'), ('l_shipdate','TIMESTAMP')
        |) AS t(column_name, ddl_type) ORDER BY column_name""".stripMargin))

  // S5: order-key resolution chain (PK convention → first column)
  val s5_order_key_detection: Q = Q(
    run = (spark, dir) => {
      import spark.implicits._
      val tables = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
      tables.map { name =>
        val cols = t(spark, dir, name).columns.toSeq
        val m = IngestJob.TableMapping(name, name)
        (name, IngestJob.resolveOrderBy(m, cols, Map.empty))
      }.toDF("table_name", "order_key").orderBy("table_name")
    },
    oracle = Some(
      """SELECT * FROM (VALUES
        |  ('region','r_regionkey'), ('nation','n_nationkey'), ('customer','c_custkey'),
        |  ('supplier','s_suppkey'), ('part','p_partkey'), ('orders','o_orderkey'),
        |  ('lineitem','l_orderkey'), ('events','event_id'), ('documents','doc_id'),
        |  ('embeddings','vec_id')
        |) AS t(table_name, order_key) ORDER BY table_name""".stripMargin))

  // ---------------------------------------------------------------------
  // F1 + F5–F13: full lineage enrichment with dual canonical hashes
  // ---------------------------------------------------------------------

  val f1_enrich_lineitem: Q = Q(
    run = (spark, dir) => {
      val li = t(spark, dir, "lineitem")
      Enrich.enrich(li, ColumnMeta.fromSchema(li.schema))
        .orderBy("l_orderkey", "l_linenumber")
    },
    oracle = {
      val h = OracleSql.rowHash(LineitemMetas)
      Some(
        s"""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
           |  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate,
           |  TIMESTAMP '2026-01-01 00:00:00' AS load_dttm,
           |  CAST(NULL AS TIMESTAMP) AS load_dttm_tz,
           |  CAST(NULL AS BIGINT) AS load_id,
           |  'INITIAL' AS op,
           |  CAST(NULL AS BIGINT) AS ts_ms,
           |  CAST(NULL AS BIGINT) AS source_ts_ms,
           |  'mis' AS src_system_code,
           |  CAST(NULL AS TIMESTAMP) AS extract_dttm,
           |  CAST(NULL AS TIMESTAMP) AS src_chng_dttm,
           |  $h AS row_hash,
           |  $h AS row_hash_iceberg
           |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)
    },
    bench = true)

  // ---------------------------------------------------------------------
  // F7–F13: canonical token edge cases over a constructed literal table
  // ---------------------------------------------------------------------

  /** Shared VALUES body; `tsLit` differs per dialect (TIMESTAMP_NTZ vs
    * TIMESTAMP literal prefix). */
  private def tokenValues(tsLit: String): String =
    s"""(1, CAST(1.0000005 AS DOUBLE), '12:34:56', 'ab', repeat('x', 1500),
       |    $tsLit '2024-02-29 23:59:59.123456', 'abc', CAST(12.345 AS DECIMAL(12,3))),
       |(2, CAST('NaN' AS DOUBLE), '07:01:02.12', 'exactly8', NULL,
       |    $tsLit '1999-12-31 23:59:59', '', CAST(-0.001 AS DECIMAL(12,3))),
       |(3, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
       |(4, CAST(-0.05 AS DOUBLE), '23:59:59.9999', 'longerthan8', 'short',
       |    $tsLit '2000-06-15 12:00:00.5', 'é', CAST(999.999 AS DECIMAL(12,3)))""".stripMargin

  private val tokenMetas: Seq[ColumnMeta] = Seq(
    ColumnMeta("d", Types.DOUBLE, "DOUBLE", 15, 0, nullable = true),
    ColumnMeta("tm", Types.TIME, "TIME", 0, 0, nullable = true),
    ColumnMeta("ch", Types.CHAR, "CHAR", 8, 0, nullable = true),
    ColumnMeta("s", Types.VARCHAR, "VARCHAR", 0, 0, nullable = true),
    ColumnMeta("ts", Types.TIMESTAMP, "TIMESTAMP", 6, 0, nullable = true),
    ColumnMeta("bin", Types.BINARY, "BINARY", 0, 0, nullable = true),
    ColumnMeta("dec", Types.DECIMAL, "DECIMAL", 12, 3, nullable = true))

  val f_canonical_tokens: Q = Q(
    run = (spark, _) => {
      val df = spark.sql(
        s"SELECT * FROM VALUES ${tokenValues("TIMESTAMP_NTZ")} " +
        "AS t(id, d, tm, ch, s, ts, bin, dec)")
      val refs: Map[String, Column] = Map("bin" -> encode(col("bin"), "UTF-8"))
      val toks = tokenMetas.map(m =>
        CanonicalHash.tokenExpr(refs.getOrElse(m.name, col(m.name)), m)
          .as(s"tok_${m.name}"))
      df.select(col("id") +: toks: _*)
        .withColumn("row_md5", md5(concat_ws(CanonicalHash.Separator,
          tokenMetas.map(m => col(s"tok_${m.name}")): _*)))
        .orderBy("id")
    },
    oracle = {
      val refs = Map("bin" -> "encode(bin)")
      val toks = tokenMetas.map(m =>
        s"${OracleSql.token(m, refs.getOrElse(m.name, m.name))} AS tok_${m.name}")
      Some(
        s"""SELECT id, ${toks.mkString(",\n  ")},
           |  md5(concat_ws('|', ${tokenMetas.map(m => OracleSql.token(m, refs.getOrElse(m.name, m.name))).mkString(", ")})) AS row_md5
           |FROM (VALUES ${tokenValues("TIMESTAMP")}) AS t(id, d, tm, ch, s, ts, bin, dec)
           |ORDER BY id""".stripMargin)
    })

  // ---------------------------------------------------------------------
  // A1–A3: the aggregation family
  // ---------------------------------------------------------------------

  val a1_count_bounded: Q = Q(
    run = (spark, dir) => {
      val li = t(spark, dir, "lineitem")
      val wm = SnapshotScan.freezeWatermark(li, "l_orderkey")
        .map(m => math.floor(m.asInstanceOf[Long] * 0.8).toLong)
      SnapshotScan.bounded(li, "l_orderkey", wm).agg(count(lit(1)).as("cnt"))
    },
    oracle = Some(s"SELECT COUNT(*) AS cnt FROM lineitem WHERE l_orderkey <= $scanWmSql"))

  val a3_max_watermark: Q = Q(
    run = (spark, dir) =>
      t(spark, dir, "lineitem").agg(max(col("l_orderkey")).as("wm")),
    oracle = Some("SELECT MAX(l_orderkey) AS wm FROM lineitem"))

  // Perturbed-copy machinery for the verification family: simulate sink
  // corruption by bumping o_totalprice on keys divisible by 97 (and, for
  // the drill-down, o_orderpriority on keys divisible by 101).
  private def ordersHashCols(perturbPrice: Boolean, perturbPriority: Boolean)
      : Seq[ColumnMeta] => Seq[Column] = metas => metas.map { m =>
    if (perturbPrice && m.name == "o_totalprice")
      when(col("o_orderkey") % 97 === 0, col(m.name) + 1).otherwise(col(m.name))
    else if (perturbPriority && m.name == "o_orderpriority")
      when(col("o_orderkey") % 101 === 0, lit("ZZZ")).otherwise(col(m.name))
    else col(m.name)
  }

  private def ordersOracleRefs(perturbPrice: Boolean, perturbPriority: Boolean): Seq[String] =
    OrdersMetas.map { m =>
      if (perturbPrice && m.name == "o_totalprice")
        "(CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1 ELSE o_totalprice END)"
      else if (perturbPriority && m.name == "o_orderpriority")
        "(CASE WHEN o_orderkey % 101 = 0 THEN 'ZZZ' ELSE o_orderpriority END)"
      else m.name
    }

  /** A2: single-pass count + dual-hash mismatch count (FB:1382–1408). */
  val a2_consistency_metrics: Q = Q(
    run = (spark, dir) => {
      val o = t(spark, dir, "orders")
      val metas = ColumnMeta.fromSchema(o.schema)
      val h1 = CanonicalHash.rowHashExpr(metas)
      val h2 = CanonicalHash.rowHashExpr(ordersHashCols(perturbPrice = true,
        perturbPriority = false)(metas), metas)
      o.agg(
        count(lit(1)).as("cnt"),
        coalesce(sum(when(lower(h1) === lower(h2), 0L).otherwise(1L)), lit(0L))
          .as("hash_mismatches"))
    },
    oracle = {
      val h1 = OracleSql.rowHash(OrdersMetas)
      val h2 = OracleSql.rowHash(OrdersMetas, ordersOracleRefs(perturbPrice = true,
        perturbPriority = false))
      Some(
        s"""SELECT COUNT(*) AS cnt,
           |  CAST(COALESCE(SUM(CASE WHEN LOWER($h1) = LOWER($h2) THEN 0 ELSE 1 END), 0) AS BIGINT) AS hash_mismatches
           |FROM orders""".stripMargin)
    })

  /** K3/O8: top-10 mismatch sample ordered by key (FB:1410–1458). */
  val k3_mismatch_topk: Q = Q(
    run = (spark, dir) => {
      val o = t(spark, dir, "orders")
      val metas = ColumnMeta.fromSchema(o.schema)
      val withHashes = o.select(
        col("o_orderkey"),
        CanonicalHash.rowHashExpr(metas).as("row_hash"),
        CanonicalHash.rowHashExpr(ordersHashCols(perturbPrice = true,
          perturbPriority = false)(metas), metas).as("row_hash_iceberg"))
      ConsistencyCheck.mismatchSamples(withHashes, "o_orderkey", n = 10)
    },
    oracle = {
      val h1 = OracleSql.rowHash(OrdersMetas)
      val h2 = OracleSql.rowHash(OrdersMetas, ordersOracleRefs(perturbPrice = true,
        perturbPriority = false))
      Some(
        s"""SELECT o_orderkey, $h1 AS row_hash, $h2 AS row_hash_iceberg
           |FROM orders WHERE LOWER($h1) <> LOWER($h2)
           |ORDER BY o_orderkey LIMIT 10""".stripMargin)
    })

  /** K4: deterministic first-row lookup. */
  val k4_first_row: Q = Q(
    run = (spark, dir) => t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus")
      .orderBy("o_orderkey").limit(1),
    oracle = Some(
      "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders ORDER BY o_orderkey LIMIT 1"))

  /** O9: first-differing-column drill-down over canonical tokens
    * (FB:1460–1565) against a doubly-perturbed copy. */
  val o9_first_column_diff: Q = Q(
    run = (spark, dir) => {
      val o = t(spark, dir, "orders")
      val metas = ColumnMeta.fromSchema(o.schema)
      val dst = o
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 97 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderpriority",
          when(col("o_orderkey") % 101 === 0, lit("ZZZ"))
            .otherwise(col("o_orderpriority")))
      ConsistencyCheck.firstColumnTokenMismatch(o, dst, "o_orderkey", metas, n = 5)
    },
    oracle = {
      val priceMeta = OrdersMetas.find(_.name == "o_totalprice").get
      val srcTok = OracleSql.token(priceMeta)
      val dstTok = OracleSql.token(priceMeta, "(o_totalprice + 1)")
      Some(
        s"""SELECT o_orderkey,
           |  CASE WHEN o_orderkey % 97 = 0 THEN 'o_totalprice' ELSE 'o_orderpriority' END AS column_name,
           |  CASE WHEN o_orderkey % 97 = 0 THEN $srcTok ELSE o_orderpriority END AS src_token,
           |  CASE WHEN o_orderkey % 97 = 0 THEN $dstTok ELSE 'ZZZ' END AS dst_token
           |FROM orders
           |WHERE o_orderkey % 97 = 0 OR o_orderkey % 101 = 0
           |ORDER BY o_orderkey LIMIT 5""".stripMargin)
    })

  /** Join/set-op family (SURVEY §2 "Joins"): which rows differ — keyed
    * hash EXCEPT between source and a perturbed sink. */
  val j1_hash_diff: Q = Q(
    run = (spark, dir) => {
      val li = t(spark, dir, "lineitem")
      val metas = ColumnMeta.fromSchema(li.schema)
      val h = CanonicalHash.rowHashExpr(metas)
      val perturbed = metas.map { m =>
        if (m.name == "l_quantity")
          when(col("l_orderkey") % 500 === 0, col(m.name) + 1).otherwise(col(m.name))
        else col(m.name)
      }
      val hp = CanonicalHash.rowHashExpr(perturbed, metas)
      val src = li.select(col("l_orderkey"), col("l_linenumber"), h.as("row_hash"))
      val dst = li.select(col("l_orderkey"), col("l_linenumber"), hp.as("row_hash"))
      src.except(dst).orderBy("l_orderkey", "l_linenumber")
    },
    oracle = {
      val h = OracleSql.rowHash(LineitemMetas)
      val refs = LineitemMetas.map { m =>
        if (m.name == "l_quantity")
          "(CASE WHEN l_orderkey % 500 = 0 THEN l_quantity + 1 ELSE l_quantity END)"
        else m.name
      }
      val hp = OracleSql.rowHash(LineitemMetas, refs)
      Some(
        s"""SELECT * FROM (
           |  SELECT l_orderkey, l_linenumber, $h AS row_hash FROM lineitem
           |  EXCEPT
           |  SELECT l_orderkey, l_linenumber, $hp AS row_hash FROM lineitem
           |) ORDER BY l_orderkey, l_linenumber""".stripMargin)
    })

  /** O3: generated CREATE TABLE DDL for the enriched lineitem schema. */
  val o3_create_table_ddl: Q = Q(
    run = (spark, dir) => {
      import spark.implicits._
      val li = t(spark, dir, "lineitem")
      val enriched = Enrich.enrich(li, ColumnMeta.fromSchema(li.schema))
      Seq(Ddl.buildCreateTableSql("lineitem_sink", enriched.schema))
        .toDF("create_table_sql")
    },
    oracle = None) // golden string checked in ScalaTest; not SQL-expressible

  /** The reference-surface inventory. */
  def referenceQueries: Map[String, Q] = Map(
    "s1_resumable_scan" -> s1_resumable_scan,
    "s3_access_probe" -> s3_access_probe,
    "s4_schema_inference" -> s4_schema_inference,
    "s5_order_key_detection" -> s5_order_key_detection,
    "f1_enrich_lineitem" -> f1_enrich_lineitem,
    "f_canonical_tokens" -> f_canonical_tokens,
    "a1_count_bounded" -> a1_count_bounded,
    "a2_consistency_metrics" -> a2_consistency_metrics,
    "a3_max_watermark" -> a3_max_watermark,
    "k3_mismatch_topk" -> k3_mismatch_topk,
    "k4_first_row" -> k4_first_row,
    "o9_first_column_diff" -> o9_first_column_diff,
    "j1_hash_diff" -> j1_hash_diff,
    "o3_create_table_ddl" -> o3_create_table_ddl)

  def all: Map[String, Q] = referenceQueries
}
