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
      bench: Boolean = false,
      // bench-time variant WITHOUT comparison-only plumbing (e.g. the
      // final ORDER BY added purely for oracle row-stability); defaults
      // to `run`. Operator semantics must be identical.
      benchRun: Option[(SparkSession, String) => DataFrame] = None) {
    def runForBench: (SparkSession, String) => DataFrame = benchRun.getOrElse(run)
  }

  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // older driver corpora carry events.ts as TIMESTAMP(NANOS), which
    // Spark rejects by default; read those as raw nanos (LongType) and
    // convert explicitly where event time is needed (see eventsWithTs).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // AQE coalescing floor 256 KB (r22, guide §2.2 fewer-larger-
    // partitions): with `parallelismFirst` (Spark default true) the
    // post-shuffle task count is ~bytes/max(bytes/cores, FLOOR), so the
    // floor is what keeps KB-scale-but-CPU-cheap shuffles from
    // splintering into one near-empty task per core — r21 shipped 64 KB
    // (vs Spark's 1 MB) to un-serialize the CPU-DENSE funnel folds, and
    // the r21 verdict measured the tail of cheap small shuffles paying
    // for it at 32 cores (~70/79 queries faster at 8 cores than 32).
    // 256 KB is the measured middle: funnel folds keep multi-task
    // parallelism (an MB-scale fold = 4-8 tasks — the r21 pathology was
    // ONE task under the 1 MB floor), while type-table aggregates
    // collapse to data-sized task counts that no longer scale with the
    // session's core count (paired 12-query A/B at 32 cores: −1.5 s vs
    // the 64 KB floor — t92/t93 −0.5 each, t67/t69 −0.35, funnels
    // equal). Set per-query from the shared read helper so every query
    // runs under the same value wherever it executes; the bench env
    // knob still wins when set (A/B path). Scale note: production
    // shuffle sizes dwarf any of these floors — this is small-shuffle
    // parallelism policy, not cluster tuning.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "256k"))
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** [[t]] + [[ScanFanout]]: used by the queries whose first stage runs
    * an expensive per-row kernel (canonical-hash MD5s, tokenization,
    * shingling, vector distances) BEFORE any exchange — the driver
    * corpus is one row group per file, so without the fan-out that
    * kernel runs on a single task (guide §2.5; measured r21: f1 0.56×,
    * t2 0.60×, t93 0.66×, t92 0.70×, t33 0.74×, t43 0.75× of their
    * pre-fanout times). Queries whose pre-exchange work is trivial
    * (layout keys, funnels, plain joins) keep the bare [[t]] — for them
    * the extra exchange is pure overhead (measured: t94 4.3×, w6 1.9×,
    * q5 1.4× SLOWER under a blanket fan-out). */
  private def tf(spark: SparkSession, dir: String, name: String): DataFrame =
    // hash-partition by the table's natural id (unique → uniform spread,
    // no round-robin pre-sort, retry-deterministic by value); tables
    // without one fall back to round-robin
    ScanFanout(t(spark, dir, name), name match {
      case "lineitem" => Some("l_orderkey")
      case "orders" => Some("o_orderkey")
      case "documents" => Some("doc_id")
      case "embeddings" => Some("vec_id")
      case "events" => Some("event_id")
      case "part" => Some("p_partkey")
      case _ => None
    })

  /** Per-QUERY retreat of the small-shuffle AQE floor [[t]] sets: a
    * few pipelines are CPU-DENSE at sub-256KB shuffle sizes (span/gram
    * kernels, composite prep chains), where byte-sized coalescing
    * under-parallelizes stages whose per-row cost AQE cannot see —
    * the same reason the 64 KB floor existed in r21. Applied AFTER the
    * frame is built (every [[t]] call during construction re-sets the
    * 256 KB default; AQE reads the conf at action time, so the value
    * in force when the query EXECUTES is this one, and the next
    * query's first read restores the default). The env knob still
    * wins everywhere (A/B path). Sweep-grade evidence: p1 0.99 s at
    * 64 KB vs 1.44 s at 256 KB; t51 1.94 vs 2.29 (full idle-start
    * sweeps, identical code). */
  private def smallShuffleFloor[T](spark: SparkSession, v: String)(df: T): T = {
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", v))
    df
  }

  /** events with `ts` normalized to a naive microsecond timestamp,
    * whatever flavor the corpus file carries: raw nanos-as-long (legacy
    * TIMESTAMP_NS corpora — integer DIV truncation, same as DuckDB's
    * TIMESTAMP_NS→TIMESTAMP cast; `/` would detour through DOUBLE and
    * ~1.7e18 ns exceeds 2^53), native TIMESTAMP_NTZ (µs corpora), or a
    * zoned TIMESTAMP (cast preserves the UTC-pinned wall clock). */
  private def eventsWithTs(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    ev.schema("ts").dataType match {
      case LongType => ev.withColumn("ts",
        timestamp_micros(expr("ts DIV 1000")).cast(TimestampNTZType))
      case TimestampNTZType => ev
      case _ => ev.withColumn("ts", col("ts").cast(TimestampNTZType))
    }
  }

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

  /** JSONL corpus round-trip ([[graft.sources.JsonlCorpus]]): documents
    * → one-object-per-line JSONL shards → schema-pinned FAILFAST
    * read-back, gated hash-equal to the ORIGINAL table — the corpus
    * interchange fidelity check (embedded newlines stay escaped,
    * unicode survives the escape cycle, numeric widths hold). The
    * oracle never sees the JSONL: equality against the source table IS
    * the round-trip law. */
  val s6_jsonl_roundtrip: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      val path = "spark-warehouse/graft_jsonl_docs"
      graft.sources.JsonlCorpus.writeJsonl(docs, cols, path)
      graft.sources.JsonlCorpus
        .readJsonl(spark, path, docs.select(cols.map(col): _*).schema)
        .orderBy("doc_id")
    },
    oracle = Some(
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin))

  /** CSV corpus interchange round-trip ([[graft.sources.JsonlCorpus
    * .writeCsv]]/[[graft.sources.JsonlCorpus.readCsv]]) — the other
    * wire format corpora arrive in, with RFC 4180 quoting pinned
    * (doubled double-quote escaping, header, explicit schema,
    * FAILFAST). Hash-equality against the source table proves field
    * values survive the quote/escape cycle; the null-vs-empty-string
    * CSV seam is spec-pinned on a crafted frame (this corpus has
    * neither). */
  val s7_csv_roundtrip: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      val path = "spark-warehouse/graft_csv_docs"
      graft.sources.JsonlCorpus.writeCsv(docs, cols, path)
      graft.sources.JsonlCorpus
        .readCsv(spark, path, docs.select(cols.map(col): _*).schema)
        .orderBy("doc_id")
    },
    oracle = s6_jsonl_roundtrip.oracle)

  // ---------------------------------------------------------------------
  // F1 + F5–F13: full lineage enrichment with dual canonical hashes
  // ---------------------------------------------------------------------

  val f1_enrich_lineitem: Q = Q(
    run = (spark, dir) => {
      val li = tf(spark, dir, "lineitem")
      Enrich.enrich(li, ColumnMeta.fromSchema(li.schema))
        .orderBy("l_orderkey", "l_linenumber")
    },
    benchRun = Some((spark, dir) => {
      // production ingest writes unordered (the ORDER BY above exists
      // only for oracle row-stability) — bench the operator, not the sort
      val li = tf(spark, dir, "lineitem")
      Enrich.enrich(li, ColumnMeta.fromSchema(li.schema))
    }),
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

  /** O3: generated CREATE TABLE DDL for the enriched lineitem schema.
    * Oracle: the DDL built from the STATIC schema mirror — checks that
    * runtime schema inference + enrichment produce exactly the declared
    * layout. */
  val o3_create_table_ddl: Q = Q(
    run = (spark, dir) => {
      import spark.implicits._
      val li = t(spark, dir, "lineitem")
      val enriched = Enrich.enrich(li, ColumnMeta.fromSchema(li.schema))
      Seq(Ddl.buildCreateTableSql("lineitem_sink", enriched.schema))
        .toDF("create_table_sql")
    },
    oracle = {
      val srcFields = LineitemMetas.map(m => StructField(m.name,
        if (m.name == "l_shipdate") TimestampNTZType else m.dataType))
      val techFields = Enrich.TechColsLower.lazyZip(Enrich.techColumnTypes)
        .lazyZip(Enrich.techColumnNullable)
        .map { case (n, dt, nn) => StructField(n, dt, nullable = nn) }
      val expected = Ddl.buildCreateTableSql("lineitem_sink",
        StructType(srcFields ++ techFields))
      Some(s"SELECT '${expected.replace("'", "''")}' AS create_table_sql")
    })

  /** O2 FB-variant: identifier normalization through the real parser —
    * uppercase Firebird source, lowercase `$`-sanitized Iceberg sink
    * (FB:427–429, FB:438–466). Explicit `src:dst` sinks lowercase WITHOUT
    * sanitization, mirroring the reference exactly. */
  val o10_fb_table_mapping: Q = Q(
    run = (spark, dir) => {
      import spark.implicits._
      IngestJob.TableMapping
        .parseFb("MIS$DOC, ref$pat:Patients ,Orders,SYS$AUDIT:audit$log")
        .map(m => (m.source, m.sink)).toDF("source_name", "sink_name")
        .orderBy("source_name")
    },
    oracle = Some(
      """SELECT * FROM (VALUES
        |  ('MIS$DOC','mis_doc'), ('ORDERS','orders'),
        |  ('REF$PAT','patients'), ('SYS$AUDIT','audit$log')
        |) AS t(source_name, sink_name) ORDER BY source_name""".stripMargin))

  // ---------------------------------------------------------------------
  // C1: CDC merge (apply an I/U/D change log to a snapshot)
  // ---------------------------------------------------------------------

  /** [[Cdc.applyChanges]] over a change batch derived deterministically
    * from `orders`: keys ≡0 (mod 7) are missing from the base and arrive
    * as inserts (seq 1), keys ≡0 (mod 5) get a full-row update image
    * (status 'R', price doubled — exact in binary FP, seq 2), keys ≡0
    * (mod 11) are deleted (seq 3). The congruence overlaps exercise
    * latest-wins: a key ≡0 (mod 35) is inserted then updated (update
    * survives), ≡0 (mod 55/77) is deleted whatever else happened. */
  /** SCD type-2 history ([[Cdc.scd2]]): the full change log (base as
    * I@0, the c1 updates@2 and deletes@3) materialized as version
    * intervals — one `lead(seq)` window per key, D closing the last
    * version without contributing a row. The temporal-table answer to
    * "what did this order look like at seq s". */
  val c3_scd2_history: Q = Q(
    run = (spark, dir) => {
      val ord = t(spark, dir, "orders")
      val baseI = ord.withColumn("op", lit("I")).withColumn("seq", lit(0L))
      val updates = ord.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_orderstatus", lit("R"))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("op", lit("U")).withColumn("seq", lit(2L))
      val deletes = ord.filter(col("o_orderkey") % 11 === 0)
        .withColumn("op", lit("D")).withColumn("seq", lit(3L))
      Cdc.scd2(baseI.unionByName(updates).unionByName(deletes),
          Seq("o_orderkey"), "op", "seq")
        .orderBy("o_orderkey", "valid_from")
    },
    oracle = Some(
      """WITH log AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, o_orderpriority, 'I' AS op, 0 AS seq FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, 'R', o_totalprice * 2,
        |    o_orderdate, o_orderpriority, 'U', 2
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, o_orderpriority, 'D', 3
        |  FROM orders WHERE o_orderkey % 11 = 0),
        |v AS (SELECT *, lead(seq) OVER (PARTITION BY o_orderkey ORDER BY seq) AS vt
        |  FROM log)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority, CAST(seq AS BIGINT) AS valid_from,
        |  CAST(vt AS BIGINT) AS valid_to, vt IS NULL AS is_current
        |FROM v WHERE op <> 'D' ORDER BY o_orderkey, valid_from""".stripMargin))

  /** AS-OF read over the SCD2 history — the consumer side of c3: the
    * table at seq 2 is the versions with `valid_from ≤ 2 <
    * coalesce(valid_to, ∞)` — one filter over the history, no log
    * replay. (At seq 2 the updates are visible and the seq-3 deletes
    * are not.) */
  val c4_scd2_asof: Q = Q(
    run = (spark, dir) => {
      val ord = t(spark, dir, "orders")
      val baseI = ord.withColumn("op", lit("I")).withColumn("seq", lit(0L))
      val updates = ord.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_orderstatus", lit("R"))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("op", lit("U")).withColumn("seq", lit(2L))
      val deletes = ord.filter(col("o_orderkey") % 11 === 0)
        .withColumn("op", lit("D")).withColumn("seq", lit(3L))
      Cdc.scd2(baseI.unionByName(updates).unionByName(deletes),
          Seq("o_orderkey"), "op", "seq")
        .filter(col("valid_from") <= 2 &&
          (col("valid_to").isNull || col("valid_to") > 2))
        .drop("valid_from", "valid_to", "is_current")
        .orderBy("o_orderkey")
    },
    oracle = Some(
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 5 = 0 THEN 'R' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** INCREMENTAL SCD2 maintenance ([[Cdc.scd2Step]]): the c3 history
    * built in three seq-guarded steps (base inserts, then updates,
    * then deletes — the micro-batch shape of the streaming
    * materializer) must equal the one-shot [[Cdc.scd2]] fold, so the
    * gate is c3's oracle VERBATIM. Each step re-folds only the
    * touched keys' history; untouched keys pass through one
    * anti-join. */
  val c5_scd2_incremental: Q = Q(
    run = (spark, dir) => {
      val ord = t(spark, dir, "orders")
      val baseI = ord.withColumn("op", lit("I")).withColumn("seq", lit(0L))
      val updates = ord.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_orderstatus", lit("R"))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("op", lit("U")).withColumn("seq", lit(2L))
      val deletes = ord.filter(col("o_orderkey") % 11 === 0)
        .withColumn("op", lit("D")).withColumn("seq", lit(3L))
      val h1 = Staging.barrier(Cdc.scd2(baseI, Seq("o_orderkey"), "op", "seq"))
      val h2 = Staging.barrier(
        Cdc.scd2Step(h1, updates, Seq("o_orderkey"), "op", "seq"))
      Cdc.scd2Step(h2, deletes, Seq("o_orderkey"), "op", "seq")
        .orderBy("o_orderkey", "valid_from")
    },
    oracle = c3_scd2_history.oracle)

  val c1_cdc_merge: Q = Q(
    run = (spark, dir) => {
      val ord = t(spark, dir, "orders")
      val base = ord.filter(col("o_orderkey") % 7 =!= 0)
      val inserts = ord.filter(col("o_orderkey") % 7 === 0)
        .withColumn("op", lit("I")).withColumn("seq", lit(1L))
      val updates = ord.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_orderstatus", lit("R"))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("op", lit("U")).withColumn("seq", lit(2L))
      val deletes = ord.filter(col("o_orderkey") % 11 === 0)
        .withColumn("op", lit("D")).withColumn("seq", lit(3L))
      Cdc.applyChanges(base, inserts.unionByName(updates).unionByName(deletes),
          Seq("o_orderkey"), "op", "seq")
        .orderBy("o_orderkey")
    },
    oracle = Some(
      """WITH base AS (SELECT * FROM orders WHERE o_orderkey % 7 <> 0),
        |changes AS (
        |  SELECT *, 'I' AS op, 1 AS seq FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, 'R' AS o_orderstatus,
        |    o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority,
        |    'U', 2
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT *, 'D', 3 FROM orders WHERE o_orderkey % 11 = 0),
        |latest AS (
        |  SELECT * FROM changes
        |  QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) = 1)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM latest WHERE op <> 'D'
        |ORDER BY o_orderkey""".stripMargin),
    bench = true)

  /** [[Cdc.captureChanges]] between two orders-derived snapshots: keys
    * ≡0 (mod 7) exist only in the NEW snapshot (→ I), ≡0 (mod 11) only
    * in the OLD (→ D), ≡0 (mod 5) present in both with a changed image
    * (→ U); everything else emits nothing. The c1 derivation run in
    * reverse — capture is the inverse of apply (round-trip law in
    * CdcSpec). */
  val c2_snapshot_diff: Q = Q(
    run = (spark, dir) => {
      val ord = t(spark, dir, "orders")
      val oldSnap = ord.filter(col("o_orderkey") % 7 =!= 0)
      val newSnap = ord.filter(col("o_orderkey") % 11 =!= 0)
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 5 === 0, lit("R")).otherwise(col("o_orderstatus")))
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") * 2)
            .otherwise(col("o_totalprice")))
      Cdc.captureChanges(oldSnap, newSnap, Seq("o_orderkey"), "op")
        .orderBy("o_orderkey")
    },
    oracle = Some(
      """WITH o AS (SELECT * FROM orders WHERE o_orderkey % 7 <> 0),
        |n AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN 'R' ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 11 <> 0),
        |d AS (
        |SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |  CASE WHEN n.o_orderkey IS NULL THEN o.o_custkey ELSE n.o_custkey END AS o_custkey,
        |  CASE WHEN n.o_orderkey IS NULL THEN o.o_orderstatus ELSE n.o_orderstatus END AS o_orderstatus,
        |  CASE WHEN n.o_orderkey IS NULL THEN o.o_totalprice ELSE n.o_totalprice END AS o_totalprice,
        |  CASE WHEN n.o_orderkey IS NULL THEN o.o_orderdate ELSE n.o_orderdate END AS o_orderdate,
        |  CASE WHEN n.o_orderkey IS NULL THEN o.o_orderpriority ELSE n.o_orderpriority END AS o_orderpriority,
        |  CASE WHEN n.o_orderkey IS NULL THEN 'D'
        |       WHEN o.o_orderkey IS NULL THEN 'I'
        |       WHEN (o.o_custkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate, o.o_orderpriority)
        |         IS DISTINCT FROM (n.o_custkey, n.o_orderstatus, n.o_totalprice, n.o_orderdate, n.o_orderpriority)
        |       THEN 'U' END AS op
        |FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
        |SELECT * FROM d WHERE op IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin))

  // ---------------------------------------------------------------------
  // P3/P4: dataset profiling + constraint validation (Quality)
  // ---------------------------------------------------------------------

  /** One-pass per-column profile of `orders` — [[Quality.profile]] in
    * its EXACT form (the gate); the HLL `exact = false` twin is the
    * 100 TB default, error-bounded in QualitySpec. */
  val p3_profile: Q = Q(
    run = (spark, dir) =>
      Quality.profile(t(spark, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))
        .orderBy("col_name"),
    oracle = Some(
      """SELECT * FROM (
        |  SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
        |    COUNT(*) - COUNT(o_orderkey) AS n_nulls,
        |    COUNT(DISTINCT o_orderkey) AS n_distinct,
        |    CAST(MIN(o_orderkey) AS DOUBLE) AS min_value,
        |    CAST(MAX(o_orderkey) AS DOUBLE) AS max_value FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
        |    COUNT(DISTINCT o_custkey),
        |    CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
        |    COUNT(DISTINCT o_orderstatus), NULL, NULL FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
        |    COUNT(DISTINCT o_totalprice),
        |    CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE)
        |  FROM orders)
        |ORDER BY col_name""".stripMargin))

  /** Constraint suite over the corpus — true invariants (pk/fk/not-null,
    * expected 0) plus two intentionally-strict expectations that COUNT
    * real violations (status domain without 'P'; price floor), proving
    * the counting path, not just the zero path. */
  val p4_quality_checks: Q = Q(
    run = (spark, dir) => {
      val ord = t(spark, dir, "orders")
      Quality.uniqueKey(ord, Seq("o_orderkey"), "pk_orders_unique")
        .unionByName(Quality.notNull(ord, "o_orderkey", "notnull_o_orderkey"))
        .unionByName(Quality.foreignKey(ord, "o_custkey",
          t(spark, dir, "customer"), "c_custkey", "fk_orders_customer"))
        .unionByName(Quality.foreignKey(t(spark, dir, "lineitem"), "l_orderkey",
          ord, "o_orderkey", "fk_lineitem_orders"))
        .unionByName(Quality.inSet(ord, "o_orderstatus", Seq("O", "F"),
          "domain_status_no_partial"))
        .unionByName(Quality.atLeast(ord, "o_totalprice", 1000.0,
          "floor_totalprice_1000"))
        .orderBy("check_name")
    },
    oracle = Some(
      """SELECT * FROM (
        |  SELECT 'pk_orders_unique' AS check_name,
        |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS violations FROM orders
        |  UNION ALL
        |  SELECT 'notnull_o_orderkey', COUNT(*) - COUNT(o_orderkey) FROM orders
        |  UNION ALL
        |  SELECT 'fk_orders_customer', COUNT(*) FROM orders
        |  WHERE o_custkey IS NOT NULL
        |    AND o_custkey NOT IN (SELECT c_custkey FROM customer)
        |  UNION ALL
        |  SELECT 'fk_lineitem_orders', COUNT(*) FROM lineitem
        |  WHERE l_orderkey IS NOT NULL
        |    AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |  UNION ALL
        |  SELECT 'domain_status_no_partial',
        |    CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
        |      AND o_orderstatus NOT IN ('O', 'F') THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'floor_totalprice_1000',
        |    CAST(SUM(CASE WHEN o_totalprice < 1000.0 THEN 1 ELSE 0 END) AS BIGINT) FROM orders)
        |ORDER BY check_name""".stripMargin))

  /** Equal-width price histogram — [[Quality.histogram]] (the profile's
    * distribution view; both engines bin with identical IEEE steps). */
  val p5_histogram: Q = Q(
    run = (spark, dir) =>
      Quality.histogram(t(spark, dir, "orders"), "o_totalprice", bins = 10)
        .orderBy("bin"),
    oracle = Some(
      """WITH s AS (
        |  SELECT CAST(MIN(o_totalprice) AS DOUBLE) AS mn,
        |    CAST(MAX(o_totalprice) AS DOUBLE) AS mx FROM orders),
        |b AS (
        |  SELECT CASE WHEN (mx - mn) / 10 = 0 THEN 0
        |    ELSE LEAST(9, CAST(FLOOR((o_totalprice - mn) / ((mx - mn) / 10)) AS INT)) END AS bin,
        |    mn, (mx - mn) / 10 AS w
        |  FROM orders, s WHERE o_totalprice IS NOT NULL)
        |SELECT bin, mn + bin * w AS lo, mn + (bin + 1) * w AS hi,
        |  COUNT(*) AS cnt
        |FROM b GROUP BY bin, mn, w ORDER BY bin""".stripMargin))

  /** Top-k frequent values — [[Quality.topValues]] over order
    * priorities (rank window over the aggregated value table only). */
  val p6_heavy_hitters: Q = Q(
    run = (spark, dir) =>
      Quality.topValues(t(spark, dir, "orders"), "o_orderpriority", k = 3)
        .orderBy("rank"),
    oracle = Some(
      """WITH c AS (
        |  SELECT o_orderpriority AS value, COUNT(*) AS cnt
        |  FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1)
        |SELECT value, cnt, CAST(rank AS INT) AS rank FROM (
        |  SELECT value, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, value) AS rank
        |  FROM c)
        |WHERE rank <= 3 ORDER BY rank""".stripMargin))

  /** The Misra–Gries sketch run UNDER capacity: with `numCounters` ≥ the
    * column's distinct-value count the decrement/reduction steps never
    * fire, so the sketch degenerates to exact counting — deterministic
    * and therefore gateable against the SAME oracle as the exact p6.
    * This differentially proves the aggregate's exactness-when-under-
    * capacity property; the over-capacity guarantees (survival, lower
    * bounds) are the QualitySpec + ci.sh mandatory guard. */
  val p7_heavy_hitters_sketch: Q = Q(
    run = (spark, dir) =>
      Quality.topValuesApprox(t(spark, dir, "orders"), "o_orderpriority",
          k = 3, numCounters = 8)
        .withColumnRenamed("count_lb", "cnt")
        .orderBy("rank"),
    oracle = Some(
      """WITH c AS (
        |  SELECT o_orderpriority AS value, COUNT(*) AS cnt
        |  FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1)
        |SELECT value, cnt, CAST(rank AS INT) AS rank FROM (
        |  SELECT value, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, value) AS rank
        |  FROM c)
        |WHERE rank <= 3 ORDER BY rank""".stripMargin))

  /** GROUPED Misra–Gries under capacity: one sketch per source, top
    * languages per source ([[Quality.topValuesApproxByKey]]) — the
    * per-key heavy-hitter shape real profiling asks for. `numCounters`
    * ≥ the per-source language cardinality, so every group's sketch
    * degenerates to exact counting and the query gates against the
    * exact per-key GROUP BY oracle (p7's under-capacity rationale,
    * per group); over-capacity grouped guarantees are QualitySpec's
    * grouped mergeable-summaries test. */
  val p8_heavy_hitters_grouped: Q = Q(
    run = (spark, dir) =>
      Quality.topValuesApproxByKey(t(spark, dir, "documents"),
          key = "source", c = "lang", k = 2, numCounters = 8)
        .withColumnRenamed("count_lb", "cnt")
        .orderBy("source", "rank"),
    oracle = Some(
      """WITH c AS (
        |  SELECT source, lang AS value, COUNT(*) AS cnt
        |  FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2)
        |SELECT source, value, cnt, CAST(rank AS INT) AS rank FROM (
        |  SELECT source, value, cnt,
        |    row_number() OVER (PARTITION BY source ORDER BY cnt DESC, value) AS rank
        |  FROM c)
        |WHERE rank <= 2 ORDER BY source, rank""".stripMargin))

  private val P10Depth = 4
  private val P10Width = 32
  private val P10Probes =
    Seq("click", "error", "purchase", "refund", "signup", "view")

  /** Count-Min watchlist frequency estimates over event types
    * ([[Quality.frequencyEstimates]]), including an ABSENT key
    * ("refund") whose estimate is pure collision mass. Count-Min
    * counters are order-independent sums, so unlike the MG/quantile
    * gates this needs no under-capacity degeneration: the oracle
    * replays the whole sketch — the engine-portable md5 row hashes,
    * the depth×width counters, the min-over-rows estimate — and the
    * gate is hash-exact at the gated width=32 WITH collisions. The
    * ≥-true-count and merge-order-independence guarantees are
    * CountMinSpec's. */
  val p10_count_min: Q = Q(
    run = (spark, dir) =>
      Quality.frequencyEstimates(t(spark, dir, "events"), "event_type",
          P10Depth, P10Width, P10Probes)
        .orderBy("value"),
    oracle = Some(
      s"""WITH vals AS (
         |  SELECT event_type AS v FROM events WHERE event_type IS NOT NULL),
         |hrows AS (SELECT i FROM range($P10Depth) t(i)),
         |counters AS (
         |  SELECT i,
         |    CAST('0x' || substr(md5(CONCAT(i, ':', v)), 1, 12) AS BIGINT)
         |      % $P10Width AS b,
         |    COUNT(*) AS c
         |  FROM vals CROSS JOIN hrows GROUP BY 1, 2),
         |probes AS (SELECT unnest(
         |  [${P10Probes.map(p => s"'$p'").mkString(", ")}]) AS p),
         |pb AS (SELECT p, i,
         |    CAST('0x' || substr(md5(CONCAT(i, ':', p)), 1, 12) AS BIGINT)
         |      % $P10Width AS b
         |  FROM probes CROSS JOIN hrows)
         |SELECT p AS value, MIN(COALESCE(c, 0)) AS est
         |FROM pb LEFT JOIN counters USING (i, b)
         |GROUP BY p ORDER BY value""".stripMargin))

  private val P9Probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)

  /** Per-source document-length quantiles via the mergeable quantile
    * sketch ([[Quality.quantilesApproxByKey]]), run UNDER capacity so
    * compaction never fires and the sketch provably degenerates to the
    * exact rank-`ceil(q·n)` percentile — deterministic and therefore
    * oracle-gateable (the p7/p8 under-capacity rationale). The rank
    * rule is pinned EXPLICITLY in both engines (smallest value whose
    * rank reaches `ceil(q·n)` in IEEE-double q·n) rather than
    * delegated to an engine percentile flavor; over-capacity rank-error
    * and weight-invariant guarantees are QuantileSketchSpec's. */
  val p9_quantile_sketch: Q = Q(
    run = (spark, dir) =>
      Quality.quantilesApproxByKey(t(spark, dir, "documents"),
          key = "source", c = "n_chars", P9Probs, capacity = 8192)
        .orderBy("source", "p"),
    oracle = Some {
      val perQ = P9Probs.map { q =>
        s"""SELECT source, CAST($q AS DOUBLE) AS p,
           |  MIN(v) FILTER (WHERE rn >= GREATEST(1,
           |    CAST(CEIL(CAST($q AS DOUBLE) * n) AS BIGINT))) AS value
           |FROM r GROUP BY source""".stripMargin
      }
      s"""WITH r AS (
         |  SELECT source, CAST(n_chars AS DOUBLE) AS v,
         |    row_number() OVER (PARTITION BY source ORDER BY CAST(n_chars AS DOUBLE)) AS rn,
         |    COUNT(*) OVER (PARTITION BY source) AS n
         |  FROM documents WHERE n_chars IS NOT NULL)
         |${perQ.mkString("\nUNION ALL\n")}
         |ORDER BY source, p""".stripMargin
    })

  private val P11P = 5                      // m=32: full register replay in SQL
  private val P11M = 1 << P11P
  private val P11Mask = (1L << (64 - P11P)) - 1 // low 64-p bits of the md5 hash
  private val P11RhoZero = 64 - P11P + 1    // rank when the suffix is all zeros
  private val P11AlphaNum = 697L            // α_32 as the HLL paper's exact
  private val P11AlphaDen = 1000L           //   rational (Flajolet 2007, Fig. 3)

  /** HyperLogLog distinct users per event type
    * ([[Quality.distinctSketchByKey]]) — the sketch twin of the exact
    * `w3`. STRONGEST gate of the sketch family: registers are
    * element-wise max (commutative, associative, idempotent), so the
    * state is a deterministic function of the input SET, and the oracle
    * replays the ENTIRE sketch in SQL — the md5-prefix 64-bit hash
    * (CountMin's idiom, widened to 16 hex chars → UBIGINT), per-register
    * max rank via `bin()` bit-length, the HUGEINT harmonic sum
    * `Σ 2^{64-M_j}`, and the raw estimate in exact integer micro-units
    * (`α_m` as the paper's rational — no float touches the gated
    * columns). The small-range-corrected `est` uses JVM `ln` (not
    * bit-portable) and is dropped here; QualitySpec gates it on
    * accuracy bands + partitioning invariance.
    *
    * `harmonic` (~1.2e20 at m=32) exceeds float64's 2^53 exact range,
    * so any comparison layer that narrows to double would see two
    * different lossy renderings. The gated projection therefore casts
    * it to an exact-digits STRING on BOTH sides — harness-proof
    * regardless of how the comparison layer materializes decimals. */
  val p11_hll_distinct: Q = Q(
    run = (spark, dir) =>
      Quality.distinctSketchByKey(t(spark, dir, "events"),
          key = "event_type", c = "user_id", p = P11P)
        .drop("est")
        .withColumn("harmonic", col("harmonic").cast("string"))
        .orderBy("event_type"),
    oracle = Some(
      s"""WITH vals AS (
         |  SELECT event_type, CAST(user_id AS VARCHAR) AS v
         |  FROM events WHERE user_id IS NOT NULL),
         |hs AS (
         |  SELECT event_type,
         |    CAST('0x' || substr(md5(v), 1, 16) AS UBIGINT) AS h
         |  FROM vals),
         |regs AS (
         |  SELECT event_type, CAST(h >> ${64 - P11P} AS INTEGER) AS idx,
         |    MAX(CASE WHEN (h & CAST('$P11Mask' AS UBIGINT)) = 0
         |      THEN $P11RhoZero
         |      ELSE $P11RhoZero - length(bin(h & CAST('$P11Mask' AS UBIGINT)))
         |      END) AS rho
         |  FROM hs GROUP BY 1, 2),
         |grid AS (
         |  SELECT g.event_type, t.i AS idx
         |  FROM (SELECT DISTINCT event_type FROM vals) g
         |  CROSS JOIN range($P11M) t(i)),
         |full_regs AS (
         |  SELECT grid.event_type, COALESCE(regs.rho, 0) AS rho
         |  FROM grid LEFT JOIN regs ON regs.event_type = grid.event_type
         |    AND regs.idx = grid.idx),
         |agg AS (
         |  SELECT event_type,
         |    CAST(SUM(CASE WHEN rho > 0 THEN 1 ELSE 0 END) AS INTEGER) AS nonzero,
         |    SUM(CAST(power(2.0, 64 - rho) AS HUGEINT)) AS harmonic
         |  FROM full_regs GROUP BY event_type)
         |SELECT event_type, CAST($P11M AS INTEGER) AS m, nonzero,
         |  CAST(CAST(harmonic AS DECIMAL(38,0)) AS VARCHAR) AS harmonic,
         |  CAST((CAST($P11AlphaNum AS HUGEINT) * $P11M * $P11M
         |      * CAST('18446744073709551616' AS HUGEINT) * 1000000)
         |    // (CAST($P11AlphaDen AS HUGEINT) * harmonic) AS BIGINT) AS est_raw_e6
         |FROM agg ORDER BY event_type""".stripMargin))

  // ---------------------------------------------------------------------
  // p12/p13: KMV bottom-k distinct sketch + cross-corpus overlap
  // ---------------------------------------------------------------------

  private val KmvK = 256
  private val LmVocab = 4096  // defined here: referenced by t65's oracle at init
  /** `(k-1)·2^64·10^6` — the integer numerator of the KMV estimate. */
  private val KmvEstNumerator: String =
    (BigInt(KmvK - 1) * (BigInt(1) << 64) * 1000000).toString

  /** Shared DuckDB CTEs for the KMV oracles: per-group distinct shingle
    * hashes (`hx(g, h)`) → ranked bottom-k sketch (`sk(g, h, rn)`). The
    * group expression is a parameter so p12 (per source) and p13 (A/B
    * corpus halves) replay the same pipeline. */
  private def duckKmvSketch(groupExpr: String): String =
    s"""toks AS (
       |  SELECT $groupExpr AS g,
       |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |shx AS (
       |  SELECT g, unnest(CASE WHEN len(t) >= 3
       |    THEN list_distinct([array_to_string(list_slice(t, i+1, i+3), ' ') for i in range(len(t)-2)])
       |    ELSE [] END) AS shingle
       |  FROM toks),
       |hx AS (SELECT DISTINCT g, substr(md5(shingle), 1, 16) AS h FROM shx),
       |rk AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM hx),
       |sk AS (SELECT g, h, rn FROM rk WHERE rn <= $KmvK)""".stripMargin

  /** DuckDB spelling of the integer KMV estimate (micro-units). */
  private def duckKmvEst(nCol: String, kthCol: String): String =
    s"""CAST(CASE WHEN $nCol < $KmvK THEN $nCol * 1000000
       |  ELSE CAST('$KmvEstNumerator' AS HUGEINT)
       |    // CAST(CAST('0x' || $kthCol AS UBIGINT) AS HUGEINT) END AS BIGINT)""".stripMargin

  /** The staged per-group shingle stream both KMV queries sketch: ONE
    * pass over the corpus (p1's shared-frame rationale), group key
    * chosen by the caller. */
  private def kmvShingles(spark: SparkSession, dir: String,
      group: Column): DataFrame = {
    val docs = t(spark, dir, "documents")
    val toks = Staging.barrier(docs.select(group.as("g"),
      TextDedup.tokens(col("text")).as("t")))
    toks.filter(size(col("t")) >= 3)
      .select(col("g"), explode(TextDedup.shingles(col("t"), 3)).as("shingle"))
  }

  /** KMV (bottom-k) distinct sketch per source ([[CorpusStats
    * .kmvSketch]]): the fifth sketch-family member (MG p7/p8, quantiles
    * p9, Count-Min p10, HLL p11) — unlike HLL it supports sketch-level
    * SET operations (p13's union/overlap), the property the
    * cross-corpus probes need. Strong gate: the sketch IS its k order
    * statistics, so the gated row pins every retained hash via
    * `kth_hash` plus the integer estimate — deterministic at any
    * partitioning, any merge order. */
  val p12_kmv_distinct: Q = Q(
    run = (spark, dir) => {
      val sh = kmvShingles(spark, dir, col("source"))
      CorpusStats.kmvDistinct(
          CorpusStats.kmvSketch(sh, "g", "shingle", KmvK), KmvK)
        .withColumnRenamed("g", "source")
        .orderBy("source")
    },
    oracle = Some(
      s"""WITH ${duckKmvSketch("source")},
         |agg AS (SELECT g, CAST(count(*) AS BIGINT) AS n_keys, max(h) AS kth_hash
         |  FROM sk GROUP BY g)
         |SELECT g AS source, n_keys, kth_hash,
         |  ${duckKmvEst("n_keys", "kth_hash")} AS est_e6
         |FROM agg ORDER BY source""".stripMargin))

  /** The AGGREGATE form of p12 ([[graft.functions.KmvAgg]]): one
    * map-side-combinable TypedImperativeAggregate per source — a fixed
    * ≤k·8-byte buffer, no window sort, the streaming-capable shape.
    * Value-identical to the window pipeline by construction (same md5
    * prefix hash, same bottom-k set semantics), so it gates against
    * p12's oracle VERBATIM — the strongest possible twin check. */
  val p12a_kmv_distinct_agg: Q = Q(
    run = (spark, dir) => {
      val sh = kmvShingles(spark, dir, col("source"))
      sh.groupBy(col("g").as("source"))
        .agg(graft.functions.KmvAgg(col("shingle"), KmvK).as("kmv"))
        .select(col("source"), col("kmv.n_keys").as("n_keys"),
          col("kmv.kth_hash").as("kth_hash"), col("kmv.est_e6").as("est_e6"))
        .orderBy("source")
    },
    oracle = p12_kmv_distinct.oracle)

  /** Cross-corpus overlap from two KMV sketches ([[CorpusStats
    * .kmvOverlap]]): Jaccard + union-cardinality estimates between the
    * even- and odd-numbered source halves of the corpus WITHOUT any
    * corpus-scale join — the "is this shard worth deduping against the
    * landed data?" probe and the corpus-level contamination estimate.
    * At 100 TB each shard sketches locally (one pass, k rows out); the
    * overlap math here runs on 2k rows of metadata. */
  val p13_kmv_overlap: Q = Q(
    run = (spark, dir) => {
      val even = substring(col("source"), 4, 10).cast(IntegerType) % 2 === 0
      val sh = kmvShingles(spark, dir, when(even, "A").otherwise("B"))
      val sk = Staging.barrier(
        CorpusStats.kmvSketch(sh, "g", "shingle", KmvK))
      CorpusStats.kmvOverlap(sk.filter(col("g") === "A"),
        sk.filter(col("g") === "B"), KmvK)
    },
    oracle = Some(
      s"""WITH ${duckKmvSketch(
             "CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 'A' ELSE 'B' END")},
         |fl AS (SELECT h, max(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS in_a,
         |    max(CASE WHEN g = 'B' THEN 1 ELSE 0 END) AS in_b
         |  FROM sk GROUP BY h),
         |tk AS (SELECT h, in_a, in_b, row_number() OVER (ORDER BY h) AS rn FROM fl),
         |topk AS (SELECT h, in_a, in_b FROM tk WHERE rn <= $KmvK),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS k_used,
         |    CAST(sum(in_a * in_b) AS BIGINT) AS inter_k, max(h) AS kth_hash
         |  FROM topk)
         |SELECT k_used, inter_k,
         |  CAST(inter_k * 1000000 // k_used AS BIGINT) AS jaccard_e6,
         |  ${duckKmvEst("k_used", "kth_hash")} AS union_est_e6
         |FROM agg""".stripMargin))

  // ---------------------------------------------------------------------
  // t64/t65: weighted Bernoulli sampling + CCNet perplexity buckets
  // ---------------------------------------------------------------------

  private val SampleCap = 400L     // weight clamp (n_chars spans ~50..550)
  private val SampleRateNum = 3L   // inclusion rate 3/10 at full weight
  private val SampleRateDen = 10L

  /** Integer-exact weighted Bernoulli (Poisson) sampling
    * ([[CorpusStats.weightedSample]]): inclusion probability
    * `(3/10)·min(n_chars,400)/400` decided purely in DECIMAL(38,0) /
    * HUGEINT arithmetic off the portable md5-hash — seedless,
    * retry-stable, and hash-exact across engines. Map-only: the 100 TB
    * plan is a filter inside the scan, zero shuffles. */
  val t64_weighted_sample: Q = Q(
    run = (spark, dir) =>
      CorpusStats.weightedSample(
          t(spark, dir, "documents").select("doc_id", "n_chars"),
          "doc_id", "n_chars", SampleCap, SampleRateNum, SampleRateDen)
        .select("doc_id", "w")
        .orderBy("doc_id"),
    oracle = Some(
      s"""SELECT doc_id,
         |  CAST(LEAST(GREATEST(n_chars, 0), $SampleCap) AS BIGINT) AS w
         |FROM documents
         |WHERE CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16) AS UBIGINT) AS HUGEINT)
         |    * ${SampleRateDen * SampleCap}
         |  < CAST('18446744073709551616' AS HUGEINT) * $SampleRateNum
         |    * LEAST(GREATEST(n_chars, 0), $SampleCap)
         |ORDER BY doc_id""".stripMargin),
    bench = true)

  /** CCNet head/middle/tail perplexity bucketing ([[CorpusStats
    * .perplexityBuckets]]): per-language rank over t32's integer
    * micro-logprob scores; cutoffs `3n div 10` / `7n div 10` keep the
    * whole decision in BIGINT arithmetic (no percentile floats cross
    * the engine boundary). */
  val t65_perplexity_buckets: Q = Q(
    run = (spark, dir) =>
      CorpusStats.perplexityBuckets(tf(spark, dir, "documents"),
          "doc_id", "text", vocab = LmVocab)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
    oracle = {
      val langs = TextAnalysis.LangMarkers
      val scoreCols = langs.map { case (l, ms) => s"${duckMarkerScore(ms)} AS s_$l" }
      val m = s"greatest(${langs.map("s_" + _._1).mkString(", ")})"
      val pick = langs.map { case (l, _) =>
        s"WHEN s_$l = $m AND s_$l > 0 THEN '$l'" }.mkString(" ")
      Some(
        s"""WITH toks0 AS (
           |  SELECT doc_id, text,
           |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
           |  FROM documents),
           |sc AS (SELECT doc_id, text, t, ${scoreCols.mkString(",\n  ")} FROM toks0),
           |lang AS (SELECT doc_id,
           |  CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
           |       $pick ELSE 'und' END AS lang
           |FROM sc),
           |tw AS (SELECT doc_id, unnest(t) AS w FROM toks0),
           |counts AS (SELECT w, count(*) AS cnt FROM tw GROUP BY w),
           |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts),
           |lm AS (SELECT w, CAST(round(log10(cnt * 1.0 / (SELECT total FROM tot)) * 1000000) AS BIGINT) AS lp
           |  FROM counts ORDER BY cnt DESC, w LIMIT $LmVocab),
           |oov AS (SELECT CAST(round(log10(0.5 / total) * 1000000) AS BIGINT) AS lp FROM tot),
           |scored AS (SELECT tw.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           |    CAST(SUM(COALESCE(lm.lp, (SELECT lp FROM oov))) AS BIGINT) AS sum_lp_micro
           |  FROM tw LEFT JOIN lm ON lm.w = tw.w GROUP BY tw.doc_id),
           |keyed AS (SELECT s.doc_id, lang.lang, s.n_tokens,
           |    (s.sum_lp_micro + 10000000 * s.n_tokens) * 1000000 // s.n_tokens AS lp_key
           |  FROM scored s JOIN lang ON lang.doc_id = s.doc_id
           |  WHERE s.n_tokens > 0),
           |ranked AS (SELECT *,
           |    row_number() OVER (PARTITION BY lang ORDER BY lp_key, doc_id) AS rn,
           |    count(*) OVER (PARTITION BY lang) AS n
           |  FROM keyed)
           |SELECT doc_id, lang, n_tokens, CAST(lp_key AS BIGINT) AS lp_key,
           |  CASE WHEN rn <= 3 * n // 10 THEN 'tail'
           |       WHEN rn > 7 * n // 10 THEN 'head'
           |       ELSE 'middle' END AS bucket
           |FROM ranked ORDER BY doc_id""".stripMargin)
    },
    bench = true)

  // ---------------------------------------------------------------------
  // t66: distributed BPE merge-rule training
  // ---------------------------------------------------------------------

  private val BpeRounds = 64

  /** One unrolled training round of the BPE oracle. Every CTE is
    * `MATERIALIZED`: DuckDB inlines multiply-referenced CTEs by
    * default, and 8 chained rounds of inlining is exponential — the
    * un-materialized spelling ran >3 min at sf0.01, materialized 0.6 s. */
  private def duckBpeRound(k: Int): String =
    s"""p$k AS MATERIALIZED (
       |  SELECT u.l AS l, u.r AS r, CAST(sum(cnt) AS BIGINT) AS n
       |  FROM (SELECT cnt, unnest([{'l': syms[i+1], 'r': syms[i+2]} for i in range(len(syms)-1)]) AS u
       |        FROM w$k) GROUP BY 1, 2),
       |m$k AS MATERIALIZED (SELECT l, r, n FROM p$k ORDER BY n DESC, l, r LIMIT 1),
       |e$k AS MATERIALIZED (
       |  SELECT w, cnt, u.pos AS pos, u.sym AS sym
       |  FROM (SELECT w, cnt, unnest([{'pos': i, 'sym': syms[i+1]} for i in range(len(syms))]) AS u
       |        FROM w$k)),
       |c$k AS MATERIALIZED (SELECT w, cnt, pos, sym,
       |    CASE WHEN sym = (SELECT l FROM m$k)
       |      AND lead(sym) OVER (PARTITION BY w ORDER BY pos) = (SELECT r FROM m$k)
       |    THEN 1 ELSE 0 END AS cand
       |  FROM e$k),
       |i$k AS MATERIALIZED (SELECT *, CASE WHEN cand = 1
       |    THEN pos - row_number() OVER (PARTITION BY w, cand ORDER BY pos) END AS isl
       |  FROM c$k),
       |a$k AS MATERIALIZED (SELECT *, CASE WHEN cand = 1
       |    AND (pos - min(pos) OVER (PARTITION BY w, isl)) % 2 = 0 THEN 1 ELSE 0 END AS app
       |  FROM i$k),
       |f$k AS MATERIALIZED (SELECT *, COALESCE(lag(app) OVER (PARTITION BY w ORDER BY pos), 0) AS prev_app,
       |    lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
       |  FROM a$k),
       |w${k + 1} AS MATERIALIZED (SELECT w, cnt,
       |    list(CASE WHEN app = 1 THEN sym || nxt ELSE sym END ORDER BY pos) AS syms
       |  FROM f$k WHERE prev_app = 0 GROUP BY w, cnt)""".stripMargin

  /** The full unrolled BPE training chain: word-frequency base table
    * (optionally over a train-subset predicate) plus all [[BpeRounds]]
    * rounds. Ends with per-round winner CTEs `m1..m$BpeRounds` and the
    * final word table `w${BpeRounds+1}` — shared by t66 (gates the
    * merges), t67 (gates the encode), and t78 (whose apply chain
    * replays the winners over a different corpus). */
  private def duckBpeChainFor(trainPredSql: Option[String]): String = {
    val where = trainPredSql.map(p => s" WHERE $p").getOrElse("")
    val base =
      s"""w1 AS MATERIALIZED (
         |  SELECT w, CAST(count(*) AS BIGINT) AS cnt,
         |    [substr(w, i+1, 1) for i in range(length(w))] AS syms
         |  FROM (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         |        FROM documents$where)
         |  GROUP BY w)""".stripMargin
    val blocks = (1 to BpeRounds).map(duckBpeRound).mkString(",\n")
    s"$base,\n$blocks"
  }

  private lazy val duckBpeChain: String = duckBpeChainFor(None)

  /** The BYTE-LEVEL BPE training chain over the t116 planted-unicode
    * corpus: `d2` plants a per-id non-ASCII token (multi-byte UTF-8 —
    * the case the byte alphabet exists for), `w1` spells each word's
    * UTF-8 BYTES via the GPT-2 `bytes_to_unicode` table embedded as a
    * 256-element list literal (generated from the SAME
    * [[BpeTrain.ByteChars]] the Spark side uses — one table, two
    * engines), and the round blocks are [[duckBpeRound]] verbatim
    * (the merge machinery never reads what the alphabet means). */
  /** The PLANTED-UNICODE corpus `d2`: every document gets a per-id
    * non-ASCII token appended (é/ü/日/α repeated 1–3×) — multi-byte
    * UTF-8 for the byte-level family (t116/t120), and characters
    * PROVABLY absent from the all-ASCII training corpus for the
    * OOV-coverage gates (t118/t119, where the UNK branch must bite).
    * [[plantedDocs]] is the Spark spelling of the same corpus. */
  private val duckPlantedD2 =
    """d2 AS (SELECT doc_id,
      |    text || ' ' || repeat(['é','ü','日','α'][CAST(doc_id % 4 AS INT) + 1],
      |      CAST(doc_id % 3 + 1 AS INT)) AS text
      |  FROM documents)""".stripMargin

  /** [[duckPlantedD2]]'s Spark twin (the t116 planting expression). */
  private def plantedDocs(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"),
      concat(col("text"), lit(" "),
        repeat(element_at(typedLit(Seq("é", "ü", "日", "α")),
          (pmod(col("doc_id"), lit(4)) + 1).cast("int")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int"))).as("text"))

  private def duckBpeByteChain(rounds: Int): String = {
    val bmap = BpeTrain.ByteChars
      .map(c => "'" + c.replace("'", "''") + "'")
      .mkString("[", ", ", "]")
    val base =
      s"""$duckPlantedD2,
         |w1 AS MATERIALIZED (
         |  SELECT w, CAST(count(*) AS BIGINT) AS cnt,
         |    [$bmap[CAST('0x' || substr(hex(encode(w)), 2*i+1, 2) AS INT) + 1]
         |     for i in range(octet_length(encode(w)))] AS syms
         |  FROM (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         |        FROM d2)
         |  GROUP BY w)""".stripMargin
    val blocks = (1 to rounds).map(duckBpeRound).mkString(",\n")
    s"$base,\n$blocks"
  }

  /** One APPLY-ONLY round over the inference chain `v$k`: the same
    * island-parity merge machinery as [[duckBpeRound]], but the rule
    * comes from the TRAINING chain's winner `m$k` instead of a fresh
    * argmax, and the chain is keyed by distinct word only (no counts).
    * An empty `m$k` (training stopped early) makes the round a no-op —
    * matching the Spark fold over the actual merge list. */
  private def duckApplyRound(k: Int): String =
    s"""ve$k AS MATERIALIZED (
       |  SELECT w, u.pos AS pos, u.sym AS sym
       |  FROM (SELECT w, unnest([{'pos': i, 'sym': syms[i+1]} for i in range(len(syms))]) AS u
       |        FROM v$k)),
       |vc$k AS MATERIALIZED (SELECT w, pos, sym,
       |    CASE WHEN sym = (SELECT l FROM m$k)
       |      AND lead(sym) OVER (PARTITION BY w ORDER BY pos) = (SELECT r FROM m$k)
       |    THEN 1 ELSE 0 END AS cand
       |  FROM ve$k),
       |vi$k AS MATERIALIZED (SELECT *, CASE WHEN cand = 1
       |    THEN pos - row_number() OVER (PARTITION BY w, cand ORDER BY pos) END AS isl
       |  FROM vc$k),
       |va$k AS MATERIALIZED (SELECT *, CASE WHEN cand = 1
       |    AND (pos - min(pos) OVER (PARTITION BY w, isl)) % 2 = 0 THEN 1 ELSE 0 END AS app
       |  FROM vi$k),
       |vf$k AS MATERIALIZED (SELECT *, COALESCE(lag(app) OVER (PARTITION BY w ORDER BY pos), 0) AS prev_app,
       |    lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
       |  FROM va$k),
       |v${k + 1} AS MATERIALIZED (SELECT w,
       |    list(CASE WHEN app = 1 THEN sym || nxt ELSE sym END ORDER BY pos) AS syms
       |  FROM vf$k WHERE prev_app = 0 GROUP BY w)""".stripMargin

  /** BPE merge-rule training ([[BpeTrain.train]]): the corpus is
    * touched ONCE (the word-frequency groupBy); all 64 gated rounds
    * run on the vocab-sized symbol table — on the DRIVER when the
    * table fits [[BpeTrain.LocalWordBound]] (the production path: a
    * real tokenizer's ~30k merges must not cost one distributed
    * barrier each), distributed otherwise, the two paths spec-proven
    * merge-identical. The oracle replays all rounds unrolled; the
    * greedy non-overlapping semantics ("aaaa" + (a,a) → [aa, aa]) are
    * mirrored by the oracle's island-parity windows, and the winner
    * rule (max count, lexicographically smallest pair) is
    * integer/binary-string deterministic cross-engine. */
  val t66_bpe_merges: Q = Q(
    run = (spark, dir) => {
      import spark.implicits._
      val (merges, _) = BpeTrain.train(t(spark, dir, "documents"), "text",
        rounds = BpeRounds)
      merges.map(m => (m.round, m.left, m.right, m.count))
        .toDF("round", "left_sym", "right_sym", "pair_count")
        .orderBy("round")
    },
    oracle = Some {
      val union = (1 to BpeRounds).map(k =>
        s"SELECT $k AS round, l AS left_sym, r AS right_sym, n AS pair_count FROM m$k")
        .mkString(" UNION ALL ")
      s"""WITH $duckBpeChain,
         |merges AS ($union)
         |SELECT round, left_sym, right_sym, pair_count FROM merges ORDER BY round""".stripMargin
    })

  /** Per-document token statistics under the t66-trained tokenizer
    * ([[BpeTrain.encodeStats]]): word count, encoded BPE symbol count,
    * character count. The corpus is touched twice in total — once for
    * training's word-frequency table, once for the encode pass (explode
    * + broadcast vocab probe + doc-keyed hash-agg); every distinct word
    * is encoded exactly once. The oracle replays the full 8-round
    * training chain and joins the final word table back to the corpus —
    * all-integer gate, hash-exact. */
  val t67_bpe_encode: Q = Q(
    run = (spark, dir) => {
      val docs = tf(spark, dir, "documents")
      val (_, words) = BpeTrain.train(docs, "text", rounds = BpeRounds)
      BpeTrain.encodeStats(docs, "doc_id", "text", words)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    oracle = Some(
      s"""WITH $duckBpeChain,
         |dw AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         |       FROM documents)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(len(syms)) AS BIGINT) AS n_syms,
         |  CAST(sum(length(w)) AS BIGINT) AS n_chars
         |FROM dw JOIN w${BpeRounds + 1} USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    bench = true)

  /** Rank-order BPE encoding of UNSEEN words
    * ([[BpeTrain.encodeStatsWithMerges]]) — the tokenizer's INFERENCE
    * path, which t67's trained-table probe cannot cover: the merges
    * train on two thirds of the corpus, the FULL corpus encodes by
    * replaying the learned rules in rank order (chars, then each
    * rule's greedy pass — Sennrich's `apply_bpe`, and exactly the
    * transformation training applies round by round, so in-vocab
    * words reproduce the trained syms bit-for-bit while the held-out
    * third exercises truly unseen words). The oracle replays the
    * 64-round training chain on the train subset, then 64 APPLY-ONLY
    * rounds (same island-parity machinery, rule from the training
    * winner) over the full corpus's distinct words. */
  val t78_bpe_encode_unseen: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val (merges, _) = BpeTrain.train(docs.filter(col("doc_id") % 3 =!= 0),
        "text", rounds = BpeRounds)
      BpeTrain.encodeStatsWithMerges(docs, "doc_id", "text", merges)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    oracle = Some(
      s"""WITH ${duckBpeChainFor(Some("doc_id % 3 <> 0"))},
         |v1 AS MATERIALIZED (
         |  SELECT w, [substr(w, i+1, 1) for i in range(length(w))] AS syms
         |  FROM (SELECT DISTINCT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         |        FROM documents)),
         |${(1 to BpeRounds).map(duckApplyRound).mkString(",\n")},
         |dw AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         |       FROM documents)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(len(syms)) AS BIGINT) AS n_syms,
         |  CAST(sum(length(w)) AS BIGINT) AS n_chars
         |FROM dw JOIN v${BpeRounds + 1} USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------------
  // t104–t106: WordPiece tokenizer training + greedy encode
  // ---------------------------------------------------------------------

  private val WpRounds = 48
  /** Unroll bound of the greedy-encode walk — each step consumes ≥ 1
    * character, so 16 covers every corpus word (max observed 8; same
    * bound as the unigram family's `maxWordLen`). */
  private val WpWalk = 16

  /** `round(log10(x)·1e6)` as BIGINT — the DuckDB spelling of
    * [[graft.operators.WordPiece.microLog10Count]]. */
  private def duckR6(x: String): String =
    s"CAST(round(log10(CAST($x AS DOUBLE)) * 1000000) AS BIGINT)"

  /** One unrolled WordPiece training round: symbol totals + pair
    * counts → the likelihood argmax (`r6(n) − r6(cl) − r6(cr)`, max
    * score then binary-smallest pair) → [[duckBpeRound]]'s
    * island-parity greedy merge with the fused spelling
    * `l || stripContinuation(r)`. Every CTE `MATERIALIZED` (the
    * duckBpeRound inlining measurement). */
  private def duckWpRound(k: Int): String =
    s"""yq$k AS MATERIALIZED (
       |  SELECT u AS s, CAST(sum(cnt) AS BIGINT) AS c
       |  FROM (SELECT cnt, unnest(syms) AS u FROM wp$k) GROUP BY 1),
       |pq$k AS MATERIALIZED (
       |  SELECT u.l AS l, u.r AS r, CAST(sum(cnt) AS BIGINT) AS n
       |  FROM (SELECT cnt, unnest([{'l': syms[i+1], 'r': syms[i+2]} for i in range(len(syms)-1)]) AS u
       |        FROM wp$k) GROUP BY 1, 2),
       |sq$k AS MATERIALIZED (
       |  SELECT p.l, p.r, p.n,
       |    ${duckR6("p.n")} - ${duckR6("yl.c")} - ${duckR6("yr.c")} AS score
       |  FROM pq$k p JOIN yq$k yl ON yl.s = p.l JOIN yq$k yr ON yr.s = p.r),
       |mq$k AS MATERIALIZED (SELECT l, r, n, score FROM sq$k ORDER BY score DESC, l, r LIMIT 1),
       |eq$k AS MATERIALIZED (
       |  SELECT w, cnt, u.pos AS pos, u.sym AS sym
       |  FROM (SELECT w, cnt, unnest([{'pos': i, 'sym': syms[i+1]} for i in range(len(syms))]) AS u
       |        FROM wp$k)),
       |cq$k AS MATERIALIZED (SELECT w, cnt, pos, sym,
       |    CASE WHEN sym = (SELECT l FROM mq$k)
       |      AND lead(sym) OVER (PARTITION BY w ORDER BY pos) = (SELECT r FROM mq$k)
       |    THEN 1 ELSE 0 END AS cand
       |  FROM eq$k),
       |iq$k AS MATERIALIZED (SELECT *, CASE WHEN cand = 1
       |    THEN pos - row_number() OVER (PARTITION BY w, cand ORDER BY pos) END AS isl
       |  FROM cq$k),
       |aq$k AS MATERIALIZED (SELECT *, CASE WHEN cand = 1
       |    AND (pos - min(pos) OVER (PARTITION BY w, isl)) % 2 = 0 THEN 1 ELSE 0 END AS app
       |  FROM iq$k),
       |fq$k AS MATERIALIZED (SELECT *, COALESCE(lag(app) OVER (PARTITION BY w ORDER BY pos), 0) AS prev_app,
       |    lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
       |  FROM aq$k),
       |wp${k + 1} AS MATERIALIZED (SELECT w, cnt,
       |    list(CASE WHEN app = 1
       |      THEN sym || (CASE WHEN nxt LIKE '##%' THEN substr(nxt, 3) ELSE nxt END)
       |      ELSE sym END ORDER BY pos) AS syms
       |  FROM fq$k WHERE prev_app = 0 GROUP BY w, cnt)""".stripMargin

  /** The full unrolled WordPiece chain: initial `##`-segmented word
    * table (optionally over a train-subset predicate) + all rounds.
    * Ends with winners `mq1..mq$WpRounds` and word table
    * `wp${WpRounds+1}`. */
  private def duckWpChainFor(trainPredSql: Option[String]): String = {
    val where = trainPredSql.map(p => s" WHERE $p").getOrElse("")
    val base =
      s"""wp1 AS MATERIALIZED (
         |  SELECT w, CAST(count(*) AS BIGINT) AS cnt,
         |    [CASE WHEN i = 0 THEN substr(w, 1, 1) ELSE '##' || substr(w, i+1, 1) END
         |     for i in range(length(w))] AS syms
         |  FROM (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         |        FROM documents$where)
         |  GROUP BY w)""".stripMargin
    val blocks = (1 to WpRounds).map(duckWpRound).mkString(",\n")
    s"$base,\n$blocks"
  }

  private lazy val duckWpChain: String = duckWpChainFor(None)

  /** Encode-side CTEs: the vocabulary (training alphabet + fused merge
    * spellings) and the greedy longest-match-first walk, unrolled
    * [[WpWalk]] steps over the FULL corpus's distinct words. Each step
    * joins live word-states against the vocab on the positional probe
    * (raw prefix at the word start, `##`-prefixed past it) and
    * advances by the LONGEST consumed length; a live state with no
    * match flips to UNK (the whole word becomes one unknown token —
    * BERT semantics). Ends with `wenc(w, n_pieces, unki)`.
    * `docsRel` is the ENCODE corpus relation (default the training
    * corpus; t118/t119 encode the planted-unicode `d2`, whose é/ü/…
    * characters are absent from the all-ASCII training alphabet — the
    * UNK branch genuinely bites). */
  private def duckWpEncode: String = duckWpEncodeFor("documents")

  private def duckWpEncodeFor(docsRel: String): String = {
    val fusedUnion = (1 to WpRounds).map(k =>
      s"SELECT l || (CASE WHEN r LIKE '##%' THEN substr(r, 3) ELSE r END) AS piece FROM mq$k")
      .mkString(" UNION ALL ")
    val steps = (0 until WpWalk).map { t =>
      s"""hq$t AS MATERIALIZED (
         |  SELECT s.w, max(length(v.piece) - (CASE WHEN s.pos > 1 THEN 2 ELSE 0 END)) AS bl
         |  FROM gq$t s JOIN voc v
         |    ON v.piece = (CASE WHEN s.pos > 1
         |        THEN '##' || substr(s.w, s.pos, greatest(length(v.piece) - 2, 0))
         |        ELSE substr(s.w, s.pos, length(v.piece)) END)
         |  WHERE NOT s.unk AND s.pos <= length(s.w)
         |  GROUP BY s.w),
         |gq${t + 1} AS MATERIALIZED (
         |  SELECT s.w,
         |    CASE WHEN s.unk OR s.pos > length(s.w) OR h.bl IS NULL THEN s.pos
         |         ELSE s.pos + h.bl END AS pos,
         |    CASE WHEN s.unk OR s.pos > length(s.w) OR h.bl IS NULL THEN s.np
         |         ELSE s.np + 1 END AS np,
         |    (s.unk OR (s.pos <= length(s.w) AND h.bl IS NULL)) AS unk
         |  FROM gq$t s LEFT JOIN hq$t h USING (w))""".stripMargin
    }.mkString(",\n")
    s"""alpha AS MATERIALIZED (SELECT DISTINCT unnest(syms) AS piece FROM wp1),
       |voc AS MATERIALIZED (SELECT DISTINCT piece FROM (
       |  SELECT piece FROM alpha UNION ALL $fusedUnion)),
       |wd AS MATERIALIZED (
       |  SELECT DISTINCT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
       |  FROM $docsRel),
       |gq0 AS MATERIALIZED (SELECT w, 1 AS pos, CAST(0 AS BIGINT) AS np, false AS unk FROM wd),
       |$steps,
       |wenc AS MATERIALIZED (SELECT w,
       |  CASE WHEN unk THEN CAST(1 AS BIGINT) ELSE np END AS n_pieces,
       |  CASE WHEN unk THEN 1 ELSE 0 END AS unki FROM gq$WpWalk)""".stripMargin
  }

  private val duckWpDocStats =
    """dw AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS w
      |       FROM documents)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |  CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
      |  CAST(sum(unki) AS BIGINT) AS n_unk_words,
      |  CAST(sum(length(w)) AS BIGINT) AS n_chars
      |FROM dw JOIN wenc USING (w)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** WordPiece merge-rule training ([[WordPiece.train]]) — the third
    * tokenizer-training family (BPE t66, unigram t101): BPE's round
    * mechanics under the LIKELIHOOD objective
    * `count(ab)/(count(a)·count(b))`, scored as integer micro-log10
    * (`r6(n) − r6(cl) − r6(cr)`, each term rounded separately — the
    * t101 discipline) with `##` continuation segmentation and fused
    * spellings. One corpus pass; all rounds on the driver under
    * [[BpeTrain.LocalWordBound]], incremental two-state fallback over
    * it (WordPieceSpec proves the paths merge-identical). The oracle
    * unrolls every round: symbol totals + pair counts + the score
    * argmax + the island-parity merge. */
  val t104_wordpiece_merges: Q = Q(
    run = (spark, dir) => {
      import spark.implicits._
      val (merges, _) = WordPiece.train(t(spark, dir, "documents"), "text",
        rounds = WpRounds)
      merges.map(m => (m.round, m.left, m.right, m.pairCount, m.scoreMicro))
        .toDF("round", "left_sym", "right_sym", "pair_count", "score_micro")
        .orderBy("round")
    },
    oracle = Some {
      val union = (1 to WpRounds).map(k =>
        s"SELECT $k AS round, l AS left_sym, r AS right_sym, n AS pair_count, score AS score_micro FROM mq$k")
        .mkString(" UNION ALL ")
      s"""WITH $duckWpChain,
         |merges AS ($union)
         |SELECT round, left_sym, right_sym, pair_count, score_micro
         |FROM merges ORDER BY round""".stripMargin
    })

  /** Per-document statistics under the t104-trained vocabulary via
    * BERT's GREEDY LONGEST-MATCH-FIRST segmentation
    * ([[WordPiece.encodeStats]]) — the WordPiece inference path, which
    * needs only the vocab (alphabet + fused spellings), not the
    * trained word table: every distinct word segments once, every
    * occurrence pays one broadcast probe. The oracle replays training,
    * builds the same vocab, and walks the greedy matcher [[WpWalk]]
    * unrolled steps. All-integer gate, hash-exact. */
  val t105_wordpiece_encode: Q = Q(
    run = (spark, dir) => {
      val docs = tf(spark, dir, "documents")
      val (merges, words) = WordPiece.train(docs, "text", rounds = WpRounds)
      // encoding the TRAINING corpus: the trained word table's
      // row-count tag IS the probe side's count — no routing job (r19)
      WordPiece.encodeStats(docs, "doc_id", "text",
          WordPiece.vocab(words, merges),
          knownWords = BpeTrain.taggedRowCount(words))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    oracle = Some(
      s"""WITH $duckWpChain,
         |$duckWpEncode,
         |$duckWpDocStats""".stripMargin),
    bench = true)

  /** [[t105_wordpiece_encode]] with the merges trained on TWO THIRDS
    * of the corpus and the FULL corpus encoded — the held-out third
    * exercises genuinely unseen words through the greedy matcher
    * (t78's design for BPE). A character absent from the training
    * alphabet would take the whole-word UNK branch (spec-pinned on a
    * crafted corpus; this synthetic vocabulary covers all letters). */
  val t106_wordpiece_encode_unseen: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val (merges, words) = WordPiece.train(
        docs.filter(col("doc_id") % 3 =!= 0), "text", rounds = WpRounds)
      WordPiece.encodeStats(docs, "doc_id", "text",
          WordPiece.vocab(words, merges))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    oracle = Some(
      s"""WITH ${duckWpChainFor(Some("doc_id % 3 <> 0"))},
         |$duckWpEncode,
         |$duckWpDocStats""".stripMargin))

  // ---------------------------------------------------------------------
  // t107–t110: persisted tokenizer-model lifecycle (TokenizerStore)
  // ---------------------------------------------------------------------

  /** Tokenizer AS-OF ([[TokenizerStore]]) — the trained-artifact
    * lifecycle the index families gate (t73/t74/t77/t87), closed for
    * the tokenizer trainers: version 1 trains on two thirds of the
    * corpus, version 2 retrains on all of it, and the encode job
    * loads AS-OF version 1 — the retrain must be invisible. Gated on
    * t106's oracle verbatim (the subset-trained encode); a load that
    * leaked version 2 would reproduce t105 instead and hash-mismatch. */
  val t107_wordpiece_store_asof: Q = Q(
    run = (spark, dir) => {
      val table = "graft_wp_store_asof"
      CommitLog.clear(spark, table)
      val docs = t(spark, dir, "documents")
      val (m1, w1) = WordPiece.train(
        docs.filter(col("doc_id") % 3 =!= 0), "text", rounds = WpRounds)
      TokenizerStore.saveWordPiece(spark, table, 1L, m1,
        WordPiece.vocab(w1, m1))
      val (m2, w2) = WordPiece.train(docs, "text", rounds = WpRounds)
      TokenizerStore.saveWordPiece(spark, table, 2L, m2,
        WordPiece.vocab(w2, m2))
      WordPiece.encodeStats(docs, "doc_id", "text",
          TokenizerStore.loadWordPieceVocab(spark, table, asOf = Some(1L)))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    oracle = t106_wordpiece_encode_unseen.oracle)

  /** [[t107_wordpiece_store_asof]]'s LATEST leg: the same two-version
    * store, loaded without a pin — the encode must see version 2 (the
    * full-corpus model), t105's oracle verbatim. The (t107, t108)
    * pair pins version resolution from both sides. */
  val t108_wordpiece_store_latest: Q = Q(
    run = (spark, dir) => {
      val table = "graft_wp_store_latest"
      CommitLog.clear(spark, table)
      val docs = t(spark, dir, "documents")
      val (m1, w1) = WordPiece.train(
        docs.filter(col("doc_id") % 3 =!= 0), "text", rounds = WpRounds)
      TokenizerStore.saveWordPiece(spark, table, 1L, m1,
        WordPiece.vocab(w1, m1))
      val (m2, w2) = WordPiece.train(docs, "text", rounds = WpRounds)
      TokenizerStore.saveWordPiece(spark, table, 2L, m2,
        WordPiece.vocab(w2, m2))
      WordPiece.encodeStats(docs, "doc_id", "text",
          TokenizerStore.loadWordPieceVocab(spark, table))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    oracle = t105_wordpiece_encode.oracle)

  /** BPE model ROUND-TRIP through the store: t78's subset-trained
    * merges persist as one committed version, the encode job loads
    * them back and replays rank order over the full corpus — t78's
    * oracle verbatim. Rank order is load-bearing (rule k's symbols
    * only exist after rules < k), so the store must return merges in
    * training order. */
  val t109_bpe_store_roundtrip: Q = Q(
    run = (spark, dir) => {
      val table = "graft_bpe_store"
      CommitLog.clear(spark, table)
      val docs = t(spark, dir, "documents")
      val (merges, _) = BpeTrain.train(docs.filter(col("doc_id") % 3 =!= 0),
        "text", rounds = BpeRounds)
      TokenizerStore.saveBpe(spark, table, 1L, merges)
      BpeTrain.encodeStatsWithMerges(docs, "doc_id", "text",
          TokenizerStore.loadBpe(spark, table))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    oracle = t78_bpe_encode_unseen.oracle)

  /** Unigram-LM model ROUND-TRIP through the store: the t101-trained
    * piece table (usage + micro-log10 scores) persists, loads, and
    * encodes — t102's oracle verbatim. Scores survive bit-exactly or
    * the Viterbi walk diverges and the hash catches it. */
  lazy val t110_unigram_store_roundtrip: Q = Q(
    run = (spark, dir) => {
      val table = "graft_unigram_store"
      CommitLog.clear(spark, table)
      val docs = t(spark, dir, "documents")
      TokenizerStore.saveUnigram(spark, table, 1L,
        graft.operators.UnigramLm.train(docs, "text"))
      graft.operators.UnigramLm.encodeStats(docs, "doc_id", "text",
          TokenizerStore.loadUnigram(spark, table))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    oracle = t102_unigram_encode.oracle)

  /** BPE model round-trip through the PUBLIC interchange format
    * (`merges.txt` + companion `vocab.json`,
    * [[graft.operators.TokenizerInterchange]], round 18): train,
    * export to the Sennrich/HF text shape, IMPORT the file back, and
    * encode under the imported rules — t78's oracle verbatim, so the
    * whole out-of-engine round trip is hash-gated (rank order is the
    * only state the format carries, and rank-order replay is
    * count-free by construction). */
  val t113_bpe_interchange: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val (merges, _) = BpeTrain.train(docs.filter(col("doc_id") % 3 =!= 0),
        "text", rounds = BpeRounds)
      val out = java.nio.file.Files
        .createTempDirectory("graft-interchange-bpe").toString
      graft.operators.TokenizerInterchange.exportBpeMerges(
        s"$out/merges.txt", merges)
      graft.operators.TokenizerInterchange.exportVocabJson(
        s"$out/vocab.json",
        (merges.flatMap(m => Seq(m.left, m.right)) ++
          merges.map(m => m.left + m.right)).distinct)
      BpeTrain.encodeStatsWithMerges(docs, "doc_id", "text",
          graft.operators.TokenizerInterchange.importBpeMerges(
            s"$out/merges.txt"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    oracle = t78_bpe_encode_unseen.oracle)

  /** Unigram-LM round-trip through the SentencePiece-style
    * piece/score TSV: integer micro-log10 scores carry verbatim
    * (exact round-trip, no float parsing), encode under the imported
    * table — t102's oracle verbatim. */
  lazy val t114_unigram_interchange: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val out = java.nio.file.Files
        .createTempDirectory("graft-interchange-uni").toString
      graft.operators.TokenizerInterchange.exportUnigramTsv(
        s"$out/unigram.tsv",
        graft.operators.UnigramLm.train(docs, "text"))
      graft.operators.UnigramLm.encodeStats(docs, "doc_id", "text",
          graft.operators.TokenizerInterchange.importUnigramTsv(
            s"$out/unigram.tsv"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    oracle = t102_unigram_encode.oracle)

  /** WordPiece round-trip through BERT's `vocab.txt` (one piece per
    * line, `##` continuations): the greedy matcher needs only the
    * piece set, so the text file IS the whole model — t105's oracle
    * verbatim. */
  val t115_wordpiece_interchange: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val (merges, words) = WordPiece.train(docs, "text", rounds = WpRounds)
      val out = java.nio.file.Files
        .createTempDirectory("graft-interchange-wp").toString
      graft.operators.TokenizerInterchange.exportWordPieceVocab(
        s"$out/vocab.txt", WordPiece.vocab(words, merges))
      WordPiece.encodeStats(docs, "doc_id", "text",
          graft.operators.TokenizerInterchange.importWordPieceVocab(
            s"$out/vocab.txt"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    oracle = t105_wordpiece_encode.oracle)

  /** BYTE-LEVEL BPE ([[BpeTrain.trainByteLevel]], round 18 — the
    * GPT-2/tiktoken alphabet): words segment into their UTF-8 BYTES,
    * each spelled via the public `bytes_to_unicode` table, so the
    * tokenizer is lossless on arbitrary Unicode (a multi-byte code
    * point starts as several symbols and the merges learn to
    * reassemble it). The corpus plants a per-id non-ASCII token
    * (é/ü/日/α repeated — 2–3 UTF-8 bytes each) so the byte alphabet
    * genuinely bites; the oracle rebuilds the SAME 256-entry table
    * from [[BpeTrain.ByteChars]], replays all training rounds
    * unrolled, and joins the encode against the trained table (the
    * in-vocab replay-equality law, as t67). Output per doc:
    * `(n_words, n_syms, n_bytes)`. */
  val t116_bytelevel_bpe: Q = Q(
    run = (spark, dir) => {
      val docs = plantedDocs(t(spark, dir, "documents"))
      val (merges, _) = BpeTrain.trainByteLevel(docs, "text",
        rounds = BpeRounds)
      BpeTrain.encodeStatsByteLevelWithMerges(docs, "doc_id", "text",
          merges)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    oracle = Some(
      s"""WITH ${duckBpeByteChain(BpeRounds)},
         |dw AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         |       FROM d2)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(len(syms)) AS BIGINT) AS n_syms,
         |  CAST(sum(octet_length(encode(w))) AS BIGINT) AS n_bytes
         |FROM dw JOIN w${BpeRounds + 1} USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------------
  // t117–t120: tokenizer QUALITY metrics (TokenizerEval) — the
  // compression-rate / coverage / fertility tables over the trained
  // families (round 19)
  // ---------------------------------------------------------------------

  /** The COMPRESSION-RATE table by language for the t66-trained BPE
    * ([[graft.operators.TokenizerEval.compressionByGroup]]): per lang,
    * document/word/token/char totals plus chars-per-token and
    * tokens-per-word as integer micro ratios — the table every
    * tokenizer paper reports, exact-integer end to end. One doc-keyed
    * join (encode stats back to the corpus' lang) into a
    * lang-cardinality hash-agg. */
  val t117_bpe_compression_by_lang: Q = Q(
    run = (spark, dir) => {
      val docs = tf(spark, dir, "documents")
      val (_, words) = BpeTrain.train(docs, "text", rounds = BpeRounds)
      graft.operators.TokenizerEval.compressionByGroup(
          BpeTrain.encodeStats(docs, "doc_id", "text", words),
          docs, "doc_id", "lang", "n_syms", "n_chars")
        .orderBy("lang")
    },
    bench = true,
    oracle = Some(
      s"""WITH $duckBpeChain,
         |dw AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         |       FROM documents),
         |enc AS (SELECT doc_id, count(*) AS n_words,
         |    sum(len(syms)) AS n_syms, sum(length(w)) AS n_chars
         |  FROM dw JOIN w${BpeRounds + 1} USING (w) GROUP BY doc_id)
         |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(enc.n_words) AS BIGINT) AS n_words,
         |  CAST(sum(enc.n_syms) AS BIGINT) AS n_tokens,
         |  CAST(sum(enc.n_chars) AS BIGINT) AS n_size,
         |  CAST(sum(enc.n_chars) * 1000000 // sum(enc.n_syms) AS BIGINT) AS size_per_token_micro,
         |  CAST(sum(enc.n_syms) * 1000000 // sum(enc.n_words) AS BIGINT) AS tokens_per_word_micro
         |FROM enc JOIN documents d USING (doc_id)
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin))

  /** VOCABULARY COVERAGE by source for the t104-trained WordPiece
    * ([[graft.operators.TokenizerEval.coverageByGroup]]): the model
    * trains on the ORIGINAL all-ASCII corpus and encodes the
    * PLANTED-unicode twin ([[plantedDocs]]) — the planted é/ü/日/α
    * words have no covering piece, so BERT's whole-word UNK branch
    * genuinely bites and `oov_per_million` is non-trivial per source
    * (exactly one UNK word per document, diluted by per-source word
    * counts). Same scale shape as t117. */
  val t118_wordpiece_coverage_by_source: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val (merges, words) = WordPiece.train(docs, "text", rounds = WpRounds)
      graft.operators.TokenizerEval.coverageByGroup(
          WordPiece.encodeStats(plantedDocs(docs), "doc_id", "text",
            WordPiece.vocab(words, merges)),
          docs, "doc_id", "source")
        .orderBy("source")
    },
    oracle = Some(
      s"""WITH $duckPlantedD2,
         |$duckWpChain,
         |${duckWpEncodeFor("d2")},
         |dw AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         |       FROM d2),
         |enc AS (SELECT doc_id, count(*) AS n_words,
         |    sum(n_pieces) AS n_pieces, sum(unki) AS n_unk
         |  FROM dw JOIN wenc USING (w) GROUP BY doc_id)
         |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_words) AS BIGINT) AS n_words,
         |  CAST(sum(n_pieces) AS BIGINT) AS n_tokens,
         |  CAST(sum(n_unk) AS BIGINT) AS n_unk_words,
         |  CAST(sum(n_unk) * 1000000 // sum(n_words) AS BIGINT) AS oov_per_million,
         |  CAST(sum(n_pieces) * 1000000 // sum(n_words) AS BIGINT) AS tokens_per_word_micro
         |FROM enc JOIN documents d USING (doc_id)
         |GROUP BY d.source ORDER BY d.source""".stripMargin))

  /** The FERTILITY DISTRIBUTION for the t104-trained WordPiece
    * ([[graft.operators.TokenizerEval.fertilityHistogram]]): per
    * pieces-per-word value, the distinct-word count (UNKs flagged)
    * and the occurrence-weighted count — the fertility histogram of
    * the multilingual-tokenizer literature. Encodes the planted
    * corpus so the UNK bucket is non-empty (t118's construction). Two
    * vocab-sized aggregations + one bounded occurrence probe. */
  val t119_wordpiece_fertility: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val (merges, words) = WordPiece.train(docs, "text", rounds = WpRounds)
      val planted = plantedDocs(docs)
      graft.operators.TokenizerEval.fertilityHistogram(planted, "text",
          WordPiece.wordPieces(planted, "text",
            WordPiece.vocab(words, merges)))
        .orderBy("n_pieces")
    },
    oracle = Some(
      s"""WITH $duckPlantedD2,
         |$duckWpChain,
         |${duckWpEncodeFor("d2")},
         |dw AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         |       FROM d2),
         |dist AS (SELECT n_pieces,
         |    CAST(count(*) AS BIGINT) AS n_distinct_words,
         |    CAST(sum(unki) AS BIGINT) AS n_unk_words
         |  FROM wenc GROUP BY n_pieces),
         |occ AS (SELECT n_pieces, CAST(count(*) AS BIGINT) AS n_occurrences
         |  FROM dw JOIN wenc USING (w) GROUP BY n_pieces)
         |SELECT n_pieces, n_distinct_words, n_unk_words, n_occurrences
         |FROM dist JOIN occ USING (n_pieces)
         |ORDER BY n_pieces""".stripMargin))

  /** The compression table for the THIRD model family — the
    * t101-trained unigram LM ([[graft.operators.TokenizerEval
    * .compressionByGroup]] over [[graft.operators.UnigramLm
    * .encodeStats]], tokens = Viterbi pieces with the char fallback
    * for over-long words): the same per-lang micro ratios as t117, so
    * the three trainers' compression rates are directly comparable on
    * one corpus. Routing rides t102's `trainAndCount` contract (no
    * probe job). */
  val t123_unigram_compression_by_lang: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val (vocab, nWords) =
        graft.operators.UnigramLm.trainAndCount(docs, "text")
      graft.operators.TokenizerEval.compressionByGroup(
          graft.operators.UnigramLm.encodeStats(docs, "doc_id", "text",
            vocab, knownWords = Some(nWords)),
          docs, "doc_id", "lang", "n_pieces", "n_chars")
        .orderBy("lang")
    },
    oracle = Some {
      val enc = 4 // emIters + 2: the encode walk under the FINAL scores
      s"""WITH ${duckUnigramChain(16, 4, 120, 2, 60)},
         |usf AS MATERIALIZED (SELECT piece, score_micro AS score FROM uvocab),
         |${duckUnigramEStep(enc, "usf", 16, 4).mkString(",\n")},
         |np AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS n_pieces
         |  FROM upath$enc GROUP BY w),
         |dw AS MATERIALIZED (SELECT doc_id, unnest(list_filter(
         |    string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         |  FROM documents),
         |encd AS (SELECT doc_id, count(*) AS n_words,
         |    sum(CASE WHEN length(w) > 16 THEN length(w)
         |      ELSE np.n_pieces END) AS n_pieces,
         |    sum(length(w)) AS n_chars
         |  FROM dw LEFT JOIN np USING (w) GROUP BY doc_id)
         |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(encd.n_words) AS BIGINT) AS n_words,
         |  CAST(sum(encd.n_pieces) AS BIGINT) AS n_tokens,
         |  CAST(sum(encd.n_chars) AS BIGINT) AS n_size,
         |  CAST(sum(encd.n_chars) * 1000000 // sum(encd.n_pieces) AS BIGINT) AS size_per_token_micro,
         |  CAST(sum(encd.n_pieces) * 1000000 // sum(encd.n_words) AS BIGINT) AS tokens_per_word_micro
         |FROM encd JOIN documents d USING (doc_id)
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin
    })

  /** BYTES-per-token by language for the BYTE-LEVEL family — the
    * metric byte-level BPE exists for (UTF-8 bytes, not chars):
    * [[graft.operators.TokenizerEval.compressionByGroup]] over the
    * t116 byte-level encode (`n_bytes` as the size column) on the
    * planted-unicode corpus, grouped by the original documents' lang.
    * Together with t117 the compression table covers TWO model
    * families, per the round-19 metrics contract. */
  val t120_bytelevel_bytes_per_token: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val planted = plantedDocs(docs)
      val (merges, _) = BpeTrain.trainByteLevel(planted, "text",
        rounds = BpeRounds)
      graft.operators.TokenizerEval.compressionByGroup(
          BpeTrain.encodeStatsByteLevelWithMerges(planted, "doc_id",
            "text", merges),
          docs, "doc_id", "lang", "n_syms", "n_bytes")
        .orderBy("lang")
    },
    oracle = Some(
      s"""WITH ${duckBpeByteChain(BpeRounds)},
         |dw AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         |       FROM d2),
         |enc AS (SELECT doc_id, count(*) AS n_words,
         |    sum(len(syms)) AS n_syms,
         |    sum(octet_length(encode(w))) AS n_bytes
         |  FROM dw JOIN w${BpeRounds + 1} USING (w) GROUP BY doc_id)
         |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_words) AS BIGINT) AS n_words,
         |  CAST(sum(n_syms) AS BIGINT) AS n_tokens,
         |  CAST(sum(n_bytes) AS BIGINT) AS n_size,
         |  CAST(sum(n_bytes) * 1000000 // sum(n_syms) AS BIGINT) AS size_per_token_micro,
         |  CAST(sum(n_syms) * 1000000 // sum(n_words) AS BIGINT) AS tokens_per_word_micro
         |FROM enc JOIN documents d USING (doc_id)
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin))

  /** Blocklist/taxonomy tagging via Aho–Corasick
    * ([[DictionaryMatch.tag]]) — the C4 bad-words-filter primitive at
    * blocklist scale: ONE broadcast automaton pass per document,
    * O(|text| + matches) regardless of dictionary size (the naive
    * scan is O(|text|·K); a regex alternation backtracks). Keywords
    * deliberately include a NESTED pair ("scan" emits "can" through
    * the output-link closure), a phrase, and an absent word; the
    * oracle replays all-occurrence semantics with a per-position
    * substring probe per keyword. */
  val t111_blocklist_tag: Q = Q(
    run = (spark, dir) =>
      DictionaryMatch.tag(t(spark, dir, "documents"), "doc_id", "text",
          Seq("scan", "can", "join", "batch batch", "merge", "zebra",
            "slow", "row"))
        .orderBy("doc_id"),
    bench = true,
    oracle = Some(
      """WITH kw AS (SELECT unnest(['scan','can','join','batch batch','merge','zebra','slow','row']) AS k),
        |h AS (SELECT d.doc_id, k.k,
        |  len([i for i in range(length(lower(d.text)))
        |       if substr(lower(d.text), CAST(i + 1 AS INT), CAST(length(k.k) AS INT)) = k.k]) AS c
        |  FROM documents d CROSS JOIN kw k)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_hits,
        |  CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keywords,
        |  (sum(c) > 0) AS flagged
        |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** VERSIONED blocklist with AS-OF tagging
    * ([[TokenizerStore.saveDictionary]] + [[DictionaryMatch.tag]]) —
    * policy lists are governed artifacts: version 1 holds four
    * keywords, version 2 the gated eight, and the tagging run pins
    * version 1 — the oracle replays the FOUR-keyword scan, so a load
    * that leaked version 2 hash-mismatches. */
  val t112_blocklist_store_asof: Q = Q(
    run = (spark, dir) => {
      val table = "graft_dict_store"
      CommitLog.clear(spark, table)
      TokenizerStore.saveDictionary(spark, table, 1L,
        Seq("scan", "can", "join", "merge"))
      TokenizerStore.saveDictionary(spark, table, 2L,
        Seq("scan", "can", "join", "batch batch", "merge", "zebra",
          "slow", "row"))
      DictionaryMatch.tag(t(spark, dir, "documents"), "doc_id", "text",
          TokenizerStore.loadDictionary(spark, table, asOf = Some(1L)))
        .orderBy("doc_id")
    },
    oracle = Some(
      """WITH kw AS (SELECT unnest(['scan','can','join','merge']) AS k),
        |h AS (SELECT d.doc_id, k.k,
        |  len([i for i in range(length(lower(d.text)))
        |       if substr(lower(d.text), CAST(i + 1 AS INT), CAST(length(k.k) AS INT)) = k.k]) AS c
        |  FROM documents d CROSS JOIN kw k)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_hits,
        |  CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keywords,
        |  (sum(c) > 0) AS flagged
        |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** Fuzzy string join ([[FuzzyJoin.fuzzyJoin]]) — PassJoin segment
    * blocking + levenshtein verify, the record-linkage primitive: a
    * third of part names, each with its 3rd character deleted
    * (edit distance 1 from its source), joins back against ALL part
    * names at distance ≤ 1. The Spark side never cross-joins
    * (pigeonhole-complete segment keys, candidates only pay the
    * verify); the oracle IS the length-filtered cross join with the
    * same predicate, so the gate proves the blocking loses no pair
    * and Spark's levenshtein ≡ DuckDB's integer-exactly. Part names
    * draw on ~90 shared color words — a deliberately ADVERSE, heavily
    * clustered name space — so the gated threshold is d = 1 (two
    * ~15-char half segments stay discriminative); at d = 2 the TRUE
    * answer itself grows quadratically on this corpus, an output-size
    * property no blocking can beat (FuzzyJoinSpec proves d = 2
    * completeness on diverse strings). */
  val t79_fuzzy_join: Q = Q(
    run = (spark, dir) => {
      val parts = t(spark, dir, "part")
        .select(col("p_partkey"), col("p_name"))
      val probes = parts.filter(col("p_partkey") % 3 === 1)
        .select(col("p_partkey").as("qid"),
          concat(substring(col("p_name"), 1, 2),
            expr("substring(p_name, 4)")).as("q"))
      FuzzyJoin.fuzzyJoin(probes, "qid", "q",
          parts.select(col("p_partkey").as("sid"), col("p_name").as("s")),
          "sid", "s", maxDist = 1)
        .orderBy("left_id", "right_id")
    },
    benchRun = Some { (spark, dir) =>
      // comparison-only ORDER BY dropped: the answer on this corpus is
      // inherently quadratic (64 distinct names in every part table →
      // ~2.1M id pairs at sf0.1), so the bench measures the join, not
      // a giant output sort the operator never requires
      val parts = t(spark, dir, "part")
        .select(col("p_partkey"), col("p_name"))
      val probes = parts.filter(col("p_partkey") % 3 === 1)
        .select(col("p_partkey").as("qid"),
          concat(substring(col("p_name"), 1, 2),
            expr("substring(p_name, 4)")).as("q"))
      FuzzyJoin.fuzzyJoin(probes, "qid", "q",
          parts.select(col("p_partkey").as("sid"), col("p_name").as("s")),
          "sid", "s", maxDist = 1)
    },
    oracle = Some(
      """WITH probes AS (
        |  SELECT p_partkey AS qid,
        |    substr(p_name, 1, 2) || substr(p_name, 4) AS q
        |  FROM part WHERE p_partkey % 3 = 1),
        |base AS (SELECT p_partkey AS sid, p_name AS s FROM part)
        |SELECT qid AS left_id, sid AS right_id,
        |  CAST(levenshtein(q, s) AS BIGINT) AS dist
        |FROM probes JOIN base
        |  ON abs(length(q) - length(s)) <= 1 AND levenshtein(q, s) <= 1
        |ORDER BY left_id, right_id""".stripMargin))

  /** The DISTINCT-STRING fuzzy-join core ([[FuzzyJoin
    * .fuzzyJoinStrings]]) — the scale-path output: one row per
    * distinct (probe string, base string) pair within distance 1.
    * On duplication-heavy corpora this is the metadata-sized answer a
    * pipeline persists (64 distinct part names at ANY scale factor —
    * the id expansion t79 gates is quadratic in duplication and
    * measured 207 s at 10× purely generating its 209M-row answer,
    * while this core stays sub-second). */
  val t80_fuzzy_join_strings: Q = Q(
    run = (spark, dir) => {
      val parts = t(spark, dir, "part")
      val probes = parts.filter(col("p_partkey") % 3 === 1)
        .select(concat(substring(col("p_name"), 1, 2),
          expr("substring(p_name, 4)")).as("q"))
      FuzzyJoin.fuzzyJoinStrings(probes,
          parts.select(col("p_name").as("s")), maxDist = 1)
        .orderBy("q", "s")
    },
    oracle = Some(
      """WITH probes AS (
        |  SELECT DISTINCT substr(p_name, 1, 2) || substr(p_name, 4) AS q
        |  FROM part WHERE p_partkey % 3 = 1),
        |base AS (SELECT DISTINCT p_name AS s FROM part)
        |SELECT q, s, CAST(levenshtein(q, s) AS BIGINT) AS dist
        |FROM probes JOIN base
        |  ON abs(length(q) - length(s)) <= 1 AND levenshtein(q, s) <= 1
        |ORDER BY q, s""".stripMargin),
    bench = true)

  /** [[t80_fuzzy_join_strings]] at maxDist = 2 — the distance where
    * the PassJoin pigeonhole argument is actually stressed: 3
    * segments per index string, 75 probe keys per row, the ±2 shift
    * window, and a deeper short-string route. The probe corpus is a
    * TWO-character deletion of every third part name (chars 3–4
    * dropped), so matches genuinely sit at distance 2, not 1;
    * levenshtein-exact against the length-filtered oracle. */
  val t81_fuzzy_join_d2: Q = Q(
    run = (spark, dir) => {
      val parts = t(spark, dir, "part")
      val probes = parts.filter(col("p_partkey") % 3 === 1)
        .select(concat(substring(col("p_name"), 1, 2),
          expr("substring(p_name, 5)")).as("q"))
      FuzzyJoin.fuzzyJoinStrings(probes,
          parts.select(col("p_name").as("s")), maxDist = 2)
        .orderBy("q", "s")
    },
    oracle = Some(
      """WITH probes AS (
        |  SELECT DISTINCT substr(p_name, 1, 2) || substr(p_name, 5) AS q
        |  FROM part WHERE p_partkey % 3 = 1),
        |base AS (SELECT DISTINCT p_name AS s FROM part)
        |SELECT q, s, CAST(levenshtein(q, s) AS BIGINT) AS dist
        |FROM probes JOIN base
        |  ON abs(length(q) - length(s)) <= 2 AND levenshtein(q, s) <= 2
        |ORDER BY q, s""".stripMargin),
    bench = true)

  /** Persisted fuzzy-join SEGMENT INDEX
    * ([[FuzzyJoin.writeSegmentIndex]] / [[FuzzyJoin
    * .probeSegmentIndex]]) — the string modality's
    * build-once/probe-many form, closing the retrieval-family
    * symmetry (BM25 t46, IVF+SQ8 t40, PQ t45 all have one): the
    * segment entries persist bucketed+sorted by the packed blocking
    * key so a probe's index side scans exchange-free, the probe
    * replays the build's split arithmetic from the persisted
    * max_dist, and the answer is the in-query t80 result VERBATIM —
    * gated on t80's oracle. */
  val t82_fuzzy_segment_index_persist: Q = Q(
    run = (spark, dir) => {
      val table = "graft_fuzzy_seg_index"
      val parts = t(spark, dir, "part")
      FuzzyJoin.writeSegmentIndex(parts.select(col("p_name").as("s")),
        "s", table, maxDist = 1)
      val probes = parts.filter(col("p_partkey") % 3 === 1)
        .select(concat(substring(col("p_name"), 1, 2),
          expr("substring(p_name, 4)")).as("q"))
      FuzzyJoin.probeSegmentIndex(spark, table, probes)
        .orderBy("q", "s")
    },
    oracle = t80_fuzzy_join_strings.oracle)

  private val ClassifierBandHiMicro = 5000L

  /** Hashed linear quality classifier ([[TextAnalysis
    * .classifyQuality]]): fastText-shaped inference — unigram+bigram
    * feature bag, md5-bucketed weights, integer micro-logit
    * (Σ weight − 1000·|bag|, centering by subtraction so no division
    * enters the gate), keep flag and three-way band. Map-only at any
    * scale; the hash-derived weights are the documented model seam. */
  val t68_quality_classifier: Q = Q(
    run = (spark, dir) =>
      TextAnalysis.classifyQuality(t(spark, dir, "documents"),
          "doc_id", "text", bandHiMicro = ClassifierBandHiMicro)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
    oracle = Some(
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
         |  FROM documents),
         |feats AS (SELECT doc_id,
         |    list_concat(t, [t[i+1] || ' ' || t[i+2] for i in range(len(t)-1)]) AS f
         |  FROM toks),
         |scored AS (SELECT doc_id, CAST(len(f) AS BIGINT) AS n_feats,
         |    CAST(COALESCE(list_sum(list_transform(f,
         |        x -> CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) % 2001)), 0)
         |      AS BIGINT) - 1000 * len(f) AS logit_micro
         |  FROM feats)
         |SELECT doc_id, n_feats, logit_micro, logit_micro > 0 AS keep,
         |  CASE WHEN logit_micro > $ClassifierBandHiMicro THEN 'high'
         |       WHEN logit_micro > 0 THEN 'mid' ELSE 'low' END AS band
         |FROM scored ORDER BY doc_id""".stripMargin))

  private val DupGramN = 5

  /** Cross-document duplicate n-gram fraction ([[TextDedup
    * .dupGramFractions]]) — the RefinedWeb/MassiveText `dup_ngram`
    * corpus-quality metric: per document, the share of its distinct
    * 5-grams that occur in at least one other document. Gram-keyed df
    * aggregate + join-back (same shuffle key), integer fixed-point
    * fraction. The Spark side joins on xxhash64 gram ids, the oracle
    * on gram strings — identical modulo the documented ~2⁻⁶⁴ birthday
    * collision. */
  val t69_dup_ngram_fraction: Q = Q(
    run = (spark, dir) =>
      TextDedup.dupGramFractions(tf(spark, dir, "documents"),
          "doc_id", "text", n = DupGramN)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
    oracle = Some(
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
         |  FROM documents),
         |sh AS (SELECT doc_id,
         |    CASE WHEN len(t) >= $DupGramN
         |      THEN list_distinct([array_to_string(list_slice(t, i+1, i+$DupGramN), ' ')
         |                          for i in range(len(t)-${DupGramN - 1})])
         |      ELSE [] END AS s
         |  FROM toks),
         |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
         |dfc AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM ex GROUP BY g)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS dup_frac_micro
         |FROM ex JOIN dfc USING (g)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    bench = true)

  private val CollocMinCount = 5L
  private val CollocTopK = 100

  /** Top-100 PMI collocations ([[CorpusStats.collocations]]) — phrase
    * mining over adjacent token pairs. The PMI ratio is assembled in
    * one fixed IEEE operation order and rounded to integer micro-units
    * before the gate (the t32 float discipline); ties break on
    * (pmi desc, left, right) so the LIMIT cut is deterministic
    * cross-engine. */
  val t70_collocations: Q = Q(
    run = (spark, dir) =>
      CorpusStats.collocations(tf(spark, dir, "documents"), "text",
        minCount = CollocMinCount, k = CollocTopK),
    oracle = Some(
      s"""WITH toks AS (
         |  SELECT list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
         |  FROM documents),
         |pairs AS (SELECT unnest([{'l': t[i+1], 'r': t[i+2]} for i in range(len(t)-1)]) AS u
         |  FROM toks),
         |bic AS (SELECT u.l AS left_tok, u.r AS right_tok, CAST(count(*) AS BIGINT) AS c_ab
         |  FROM pairs GROUP BY 1, 2),
         |uc AS (SELECT w, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
         |n1 AS (SELECT CAST(sum(c) AS BIGINT) AS v FROM uc),
         |n2 AS (SELECT CAST(sum(c_ab) AS BIGINT) AS v FROM bic)
         |SELECT left_tok, right_tok, c_ab,
         |  CAST(round(log10((CAST(c_ab AS DOUBLE) * (SELECT v FROM n1) * (SELECT v FROM n1))
         |      / (CAST((SELECT v FROM n2) AS DOUBLE) * a.c * b.c)) * 1000000) AS BIGINT) AS pmi_micro
         |FROM bic JOIN uc a ON a.w = left_tok JOIN uc b ON b.w = right_tok
         |WHERE c_ab >= $CollocMinCount
         |ORDER BY pmi_micro DESC, left_tok, right_tok LIMIT $CollocTopK""".stripMargin),
    bench = true)

  private val PsiBoundaries = Seq(200L, 260L, 300L, 340L, 400L)

  /** Distribution-drift PSI ([[CorpusStats.driftPsi]]): the even-id
    * half of the corpus as reference vs the odd-id half as candidate,
    * bucketed on `n_chars` — per-bucket counts (exact integers) plus
    * the add-one-smoothed PSI term in fixed-order micro (the t70
    * float discipline: one assembly order, one ln, round before the
    * gate). */
  val p15_drift_psi: Q = Q(
    run = (spark, dir) =>
      CorpusStats.driftPsi(t(spark, dir, "documents"), col("n_chars"),
          col("doc_id") % 2 === 1, PsiBoundaries)
        .orderBy("bucket"),
    oracle = Some {
      val nb = PsiBoundaries.length + 1
      val cases = PsiBoundaries.zipWithIndex
        .map { case (b, i) => s"WHEN n_chars < $b THEN $i" }.mkString(" ")
      def p(c: String, n: String) =
        s"($c + 1) * 1.0 / ((SELECT $n FROM tot) + $nb)"
      s"""WITH c AS (SELECT CASE $cases ELSE ${nb - 1} END AS bucket,
         |    doc_id % 2 = 1 AS is_b FROM documents),
         |g0 AS (SELECT bucket,
         |    CAST(sum(CASE WHEN NOT is_b THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
         |    CAST(sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT) AS c_b
         |  FROM c GROUP BY bucket),
         |g AS (SELECT CAST(s.bucket AS INT) AS bucket,
         |    CAST(COALESCE(c_a, 0) AS BIGINT) AS c_a,
         |    CAST(COALESCE(c_b, 0) AS BIGINT) AS c_b
         |  FROM (SELECT unnest(generate_series(0, ${nb - 1})) AS bucket) s
         |  LEFT JOIN g0 ON g0.bucket = s.bucket),
         |tot AS (SELECT CAST(sum(c_a) AS BIGINT) AS na,
         |    CAST(sum(c_b) AS BIGINT) AS nbt FROM g)
         |SELECT bucket, c_a, c_b,
         |  CAST(round((${p("c_a", "na")} - ${p("c_b", "nbt")})
         |    * ln((${p("c_a", "na")}) / (${p("c_b", "nbt")})) * 1000000) AS BIGINT)
         |    AS psi_term_micro
         |FROM g ORDER BY bucket""".stripMargin
    })

  /** Vocabulary-growth curve ([[CorpusStats.vocabGrowth]]): new words
    * per ingestion-order decile + cumulative vocabulary — the Heaps-law
    * corpus-diversity probe, with no corpus-scale window (bucketed
    * prefix-sum rank; the cumulative sum runs over 10 metadata rows).
    * All-integer gate. */
  val p14_vocab_growth: Q = Q(
    run = (spark, dir) =>
      CorpusStats.vocabGrowth(t(spark, dir, "documents"), "doc_id", "text")
        .orderBy("decile"),
    oracle = Some(
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
         |  FROM documents),
         |fw AS (SELECT w, min(doc_id) AS fd
         |  FROM (SELECT doc_id, unnest(t) AS w FROM toks) GROUP BY w),
         |dr AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn FROM documents),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents),
         |wd AS (SELECT w, CAST((rn - 1) * 10 // (SELECT c FROM nn) AS INT) AS decile
         |  FROM fw JOIN dr ON dr.doc_id = fw.fd),
         |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS new_words FROM wd GROUP BY decile)
         |SELECT decile, new_words,
         |  CAST(sum(new_words) OVER (ORDER BY decile) AS BIGINT) AS cum_vocab
         |FROM g ORDER BY decile""".stripMargin))

  /** Bigram-LM coherence ([[TextAnalysis.bigramLmQuality]]): add-half
    * smoothed bigram conditionals in integer micro (the t32 discipline
    * one order up — local fluency, not just word frequency). The
    * oracle replays counts → smoothed score table → per-doc integer
    * sum with the identical single-division float spelling. */
  val t76_bigram_lm: Q = Q(
    run = (spark, dir) =>
      TextAnalysis.bigramLmQuality(tf(spark, dir, "documents"),
          "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
    oracle = Some(
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
         |  FROM documents),
         |bg AS (SELECT doc_id, u.l AS l, u.r AS r
         |  FROM (SELECT doc_id, unnest([{'l': t[i+1], 'r': t[i+2]} for i in range(len(t)-1)]) AS u
         |        FROM toks)),
         |c1 AS (SELECT w, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
         |vn AS (SELECT CAST(count(*) AS BIGINT) AS v FROM c1),
         |sc AS (SELECT b.l, b.r,
         |    CAST(round(log10((b.c * 2 + 1) * 1.0 / (c1.c * 2 + (SELECT v FROM vn))) * 1000000) AS BIGINT) AS lp
         |  FROM (SELECT l, r, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY l, r) b
         |  JOIN c1 ON c1.w = b.l),
         |scored AS (SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(sum(sc.lp) AS BIGINT) AS sum_lp_micro
         |  FROM bg JOIN sc ON sc.l = bg.l AND sc.r = bg.r GROUP BY bg.doc_id)
         |SELECT d.doc_id, COALESCE(s.n_bigrams, 0) AS n_bigrams,
         |  COALESCE(s.sum_lp_micro, 0) AS sum_lp_micro
         |FROM documents d LEFT JOIN scored s USING (doc_id)
         |ORDER BY doc_id""".stripMargin),
    bench = true)

  /** Interpolated Kneser–Ney bigram LM
    * ([[TextAnalysis.kneserNeyLmQuality]]) — the production smoothing
    * (KenLM's) next to t76's add-half baseline. Discount 3/4 is kept
    * exactly rational: both engines build the SAME integer fraction
    * `[max(4c2−3,0)·B + 3·N1l·N1r] / (4·cl·B)` per observed bigram
    * from the bigram-TYPE table (left-context totals, continuation
    * counts, type count B), then one division + log10 rounded to
    * BIGINT micro per bigram before the per-doc integer sum. */
  val t92_kneser_ney_lm: Q = Q(
    run = (spark, dir) =>
      TextAnalysis.kneserNeyLmQuality(tf(spark, dir, "documents"),
          "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
    bench = true,
    oracle = Some(
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
         |  FROM documents),
         |bg AS (SELECT doc_id, u.l AS l, u.r AS r
         |  FROM (SELECT doc_id, unnest([{'l': t[i+1], 'r': t[i+2]} for i in range(len(t)-1)]) AS u
         |        FROM toks)),
         |bgc AS (SELECT l, r, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY l, r),
         |cl AS (SELECT l, CAST(sum(c2) AS BIGINT) AS cl, CAST(count(*) AS BIGINT) AS n1l
         |  FROM bgc GROUP BY l),
         |nr AS (SELECT r, CAST(count(*) AS BIGINT) AS n1r FROM bgc GROUP BY r),
         |bb AS (SELECT CAST(count(*) AS BIGINT) AS b FROM bgc),
         |sc AS (SELECT bgc.l, bgc.r,
         |    CAST(round(log10(
         |      (greatest(bgc.c2 * 4 - 3, 0) * (SELECT b FROM bb) + 3 * cl.n1l * nr.n1r) * 1.0
         |      / (cl.cl * 4 * (SELECT b FROM bb))) * 1000000) AS BIGINT) AS lp
         |  FROM bgc JOIN cl ON cl.l = bgc.l JOIN nr ON nr.r = bgc.r),
         |scored AS (SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(sum(sc.lp) AS BIGINT) AS sum_lp_micro
         |  FROM bg JOIN sc ON sc.l = bg.l AND sc.r = bg.r GROUP BY bg.doc_id)
         |SELECT d.doc_id, COALESCE(s.n_bigrams, 0) AS n_bigrams,
         |  COALESCE(s.sum_lp_micro, 0) AS sum_lp_micro
         |FROM documents d LEFT JOIN scored s USING (doc_id)
         |ORDER BY doc_id""".stripMargin))

  /** TRIGRAM interpolated Kneser–Ney
    * ([[TextAnalysis.kneserNeyTrigramQuality]]) — the full KenLM-shape
    * recursion (continuation backoff through the bigram level, all
    * statistics from the trigram-type table). A single common integer
    * denominator would overflow BIGINT, so the gate rides IEEE
    * determinism of the IDENTICAL division/add/multiply tree spelled
    * verbatim in both engines (the t76 log10 contract extended to the
    * arithmetic), rounded to BIGINT micro per trigram before the
    * per-doc integer sum. */
  val t93_kneser_ney_trigram: Q = Q(
    run = (spark, dir) =>
      TextAnalysis.kneserNeyTrigramQuality(tf(spark, dir, "documents"),
          "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
    bench = true,
    oracle = Some(
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
         |  FROM documents),
         |tg AS (SELECT doc_id, u.w1 AS w1, u.w2 AS w2, u.w3 AS w3
         |  FROM (SELECT doc_id, unnest([{'w1': t[i+1], 'w2': t[i+2], 'w3': t[i+3]} for i in range(len(t)-2)]) AS u
         |        FROM toks WHERE len(t) >= 3)),
         |tgc AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c3 FROM tg GROUP BY w1, w2, w3),
         |c12 AS (SELECT w1, w2, CAST(sum(c3) AS BIGINT) AS c12, CAST(count(*) AS BIGINT) AS n1l
         |  FROM tgc GROUP BY w1, w2),
         |bg23 AS (SELECT w2, w3, CAST(count(*) AS BIGINT) AS cc23 FROM tgc GROUP BY w2, w3),
         |m2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS m2 FROM tgc GROUP BY w2),
         |k2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS k2 FROM bg23 GROUP BY w2),
         |r3 AS (SELECT w3, CAST(count(*) AS BIGINT) AS r3 FROM bg23 GROUP BY w3),
         |b2 AS (SELECT CAST(count(*) AS BIGINT) AS b FROM bg23),
         |sc AS (SELECT tgc.w1, tgc.w2, tgc.w3,
         |    CAST(round(log10(
         |      (greatest(tgc.c3 * 4 - 3, 0) / (c12.c12 * 4.0)) +
         |      ((3.0 * c12.n1l) / (c12.c12 * 4.0)) *
         |      ((greatest(bg23.cc23 * 4 - 3, 0) / (m2.m2 * 4.0)) +
         |       ((3.0 * k2.k2) / (m2.m2 * 4.0)) *
         |       (r3.r3 * 1.0 / (SELECT b FROM b2)))
         |    ) * 1000000) AS BIGINT) AS lp
         |  FROM tgc JOIN c12 ON c12.w1 = tgc.w1 AND c12.w2 = tgc.w2
         |  JOIN bg23 ON bg23.w2 = tgc.w2 AND bg23.w3 = tgc.w3
         |  JOIN m2 ON m2.w2 = tgc.w2
         |  JOIN k2 ON k2.w2 = tgc.w2
         |  JOIN r3 ON r3.w3 = tgc.w3),
         |scored AS (SELECT tg.doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
         |    CAST(sum(sc.lp) AS BIGINT) AS sum_lp_micro
         |  FROM tg JOIN sc ON sc.w1 = tg.w1 AND sc.w2 = tg.w2 AND sc.w3 = tg.w3
         |  GROUP BY tg.doc_id)
         |SELECT d.doc_id, COALESCE(s.n_trigrams, 0) AS n_trigrams,
         |  COALESCE(s.sum_lp_micro, 0) AS sum_lp_micro
         |FROM documents d LEFT JOIN scored s USING (doc_id)
         |ORDER BY doc_id""".stripMargin))

  /** 4-gram MODIFIED Kneser–Ney
    * ([[TextAnalysis.kneserNeyModified4gramQuality]]): the full KenLM
    * configuration — three count-dependent discounts per order
    * (D1 = Y, D2 = 2−3Y·n3/n2, D3+ = 3−4Y·n4/n3 from each level's
    * count-of-counts), applied through the 4-gram → continuation
    * trigram → continuation bigram → unigram-tail recursion. Every
    * statistic is an integer type-table aggregate; the discounts and
    * the score ride ONE identical IEEE expression tree in both engines
    * (the t93 contract — the oracle recomputes the same count-of-
    * counts and spells the same division/multiply parenthesization). */
  val t97_kneser_ney_modified_4gram: Q = Q(
    run = (spark, dir) =>
      TextAnalysis.kneserNeyModified4gramQuality(tf(spark, dir, "documents"),
          "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
    bench = true,
    oracle = Some {
      def ddCte(name: String, src: String, cCol: String): String =
        s"""$name AS (SELECT
           |    CAST(n1 AS DOUBLE)/(n1 + 2*n2) AS d1,
           |    2.0 - 3.0*(CAST(n1 AS DOUBLE)/(n1 + 2*n2))*n3/n2 AS d2,
           |    3.0 - 4.0*(CAST(n1 AS DOUBLE)/(n1 + 2*n2))*n4/n3 AS d3
           |  FROM (SELECT
           |    sum(CASE WHEN $cCol = 1 THEN 1 ELSE 0 END) AS n1,
           |    sum(CASE WHEN $cCol = 2 THEN 1 ELSE 0 END) AS n2,
           |    sum(CASE WHEN $cCol = 3 THEN 1 ELSE 0 END) AS n3,
           |    sum(CASE WHEN $cCol = 4 THEN 1 ELSE 0 END) AS n4
           |  FROM $src))""".stripMargin
      def dSel(dd: String, cExpr: String): String =
        s"""CASE WHEN $cExpr = 1 THEN (SELECT d1 FROM $dd)
           |     WHEN $cExpr = 2 THEN (SELECT d2 FROM $dd)
           |     ELSE (SELECT d3 FROM $dd) END""".stripMargin
      def clsCte(name: String, src: String, cCol: String, keys: String,
          pfx: String): String =
        s"""$name AS (SELECT $keys, CAST(sum($cCol) AS BIGINT) AS ${pfx}m,
           |    CAST(sum(CASE WHEN $cCol = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ${pfx}1,
           |    CAST(sum(CASE WHEN $cCol = 2 THEN 1 ELSE 0 END) AS BIGINT) AS ${pfx}2,
           |    CAST(sum(CASE WHEN $cCol >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS ${pfx}3
           |  FROM $src GROUP BY $keys)""".stripMargin
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
         |  FROM documents),
         |fg AS (SELECT doc_id, u.w1 AS w1, u.w2 AS w2, u.w3 AS w3, u.w4 AS w4
         |  FROM (SELECT doc_id, unnest([{'w1': t[i+1], 'w2': t[i+2], 'w3': t[i+3], 'w4': t[i+4]} for i in range(len(t)-3)]) AS u
         |        FROM toks WHERE len(t) >= 4)),
         |fgc AS (SELECT w1, w2, w3, w4, CAST(count(*) AS BIGINT) AS c4
         |  FROM fg GROUP BY w1, w2, w3, w4),
         |cc234 AS (SELECT w2, w3, w4, CAST(count(*) AS BIGINT) AS cc234
         |  FROM fgc GROUP BY w2, w3, w4),
         |cc34 AS (SELECT w3, w4, CAST(count(*) AS BIGINT) AS cc34
         |  FROM cc234 GROUP BY w3, w4),
         |${ddCte("dd4", "fgc", "c4")},
         |${ddCte("dd3", "cc234", "cc234")},
         |${ddCte("dd2", "cc34", "cc34")},
         |${clsCte("ca", "fgc", "c4", "w1, w2, w3", "a")},
         |${clsCte("cb", "cc234", "cc234", "w2, w3", "b")},
         |${clsCte("cg", "cc34", "cc34", "w3", "g")},
         |r4 AS (SELECT w4, CAST(count(*) AS BIGINT) AS r4 FROM cc34 GROUP BY w4),
         |b3t AS (SELECT CAST(count(*) AS BIGINT) AS b FROM cc34),
         |sc AS (SELECT fgc.w1, fgc.w2, fgc.w3, fgc.w4,
         |    CAST(round(log10(
         |      ((fgc.c4 - ${dSel("dd4", "fgc.c4")}) / ca.am) +
         |      (((SELECT d1 FROM dd4)*ca.a1 + (SELECT d2 FROM dd4)*ca.a2 +
         |        (SELECT d3 FROM dd4)*ca.a3) / ca.am) * (
         |        ((cc234.cc234 - ${dSel("dd3", "cc234.cc234")}) / cb.bm) +
         |        (((SELECT d1 FROM dd3)*cb.b1 + (SELECT d2 FROM dd3)*cb.b2 +
         |          (SELECT d3 FROM dd3)*cb.b3) / cb.bm) * (
         |          ((cc34.cc34 - ${dSel("dd2", "cc34.cc34")}) / cg.gm) +
         |          (((SELECT d1 FROM dd2)*cg.g1 + (SELECT d2 FROM dd2)*cg.g2 +
         |            (SELECT d3 FROM dd2)*cg.g3) / cg.gm) *
         |          (r4.r4 * 1.0 / (SELECT b FROM b3t))))
         |    ) * 1000000) AS BIGINT) AS lp
         |  FROM fgc
         |  JOIN ca ON ca.w1 = fgc.w1 AND ca.w2 = fgc.w2 AND ca.w3 = fgc.w3
         |  JOIN cc234 ON cc234.w2 = fgc.w2 AND cc234.w3 = fgc.w3 AND cc234.w4 = fgc.w4
         |  JOIN cb ON cb.w2 = fgc.w2 AND cb.w3 = fgc.w3
         |  JOIN cc34 ON cc34.w3 = fgc.w3 AND cc34.w4 = fgc.w4
         |  JOIN cg ON cg.w3 = fgc.w3
         |  JOIN r4 ON r4.w4 = fgc.w4),
         |scored AS (SELECT fg.doc_id, CAST(count(*) AS BIGINT) AS n_4grams,
         |    CAST(sum(sc.lp) AS BIGINT) AS sum_lp_micro
         |  FROM fg JOIN sc ON sc.w1 = fg.w1 AND sc.w2 = fg.w2
         |    AND sc.w3 = fg.w3 AND sc.w4 = fg.w4
         |  GROUP BY fg.doc_id)
         |SELECT d.doc_id, COALESCE(s.n_4grams, 0) AS n_4grams,
         |  COALESCE(s.sum_lp_micro, 0) AS sum_lp_micro
         |FROM documents d LEFT JOIN scored s USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    })

  /** Z-ORDER clustering key ([[Layout.zValue]]): Morton interleave of
    * (l_orderkey, l_partkey), the layout-maintenance primitive a
    * 100 TB table uses so a TWO-dimensional box predicate prunes from
    * parquet footer stats (AUDIT_r14_zorder measures the effect; this
    * gate proves the bit arithmetic — pure shift/and/or, whole-stage
    * codegen — against a DuckDB bit-op replay). */
  val t94_zorder_key: Q = Q(
    run = (spark, dir) =>
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.operators.Layout.zValue(
            pmod(col("l_orderkey").cast("long"), lit(1L << 21)),
            pmod(col("l_partkey").cast("long"), lit(1L << 21)),
            bits = 21).as("z_key"))
        .orderBy("l_orderkey", "l_linenumber"),
    bench = true,
    benchRun = Some((spark, dir) =>
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.operators.Layout.zValue(
            pmod(col("l_orderkey").cast("long"), lit(1L << 21)),
            pmod(col("l_partkey").cast("long"), lit(1L << 21)),
            bits = 21).as("z_key"))),
    oracle = Some {
      val m = 1L << 21
      def side(expr: String, off: Int): Seq[String] =
        (0 until 21).map(i => s"((($expr >> $i) & 1) << ${2 * i + off})")
      val z = (side(s"(l_orderkey % $m)", 0) ++
        side(s"(l_partkey % $m)", 1)).mkString(" | ")
      s"""SELECT l_orderkey, l_linenumber, CAST($z AS BIGINT) AS z_key
         |FROM lineitem
         |ORDER BY l_orderkey, l_linenumber""".stripMargin
    })

  /** N-key Morton interleave ([[graft.operators.Layout.zValueN]], the
    * t94 2-key gate's 3-key sibling — round 15): round-robin bit
    * interleave of (l_orderkey, l_partkey, l_suppkey) at 20 bits/key
    * (3·20 = 60 ≤ 62), the clustering key [[graft.operators.Layout
    * .zOrderWriteN]] sorts by. Oracle spells the identical shift/and/
    * or tree in DuckDB integer bit ops. */
  val t96_zorder_key_3d: Q = Q(
    run = (spark, dir) =>
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.operators.Layout.zValueN(
            Seq("l_orderkey", "l_partkey", "l_suppkey").map(c =>
              pmod(col(c).cast("long"), lit(1L << 20))),
            bits = 20).as("z_key"))
        .orderBy("l_orderkey", "l_linenumber"),
    bench = true,
    benchRun = Some((spark, dir) =>
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.operators.Layout.zValueN(
            Seq("l_orderkey", "l_partkey", "l_suppkey").map(c =>
              pmod(col(c).cast("long"), lit(1L << 20))),
            bits = 20).as("z_key"))),
    oracle = Some {
      val m = 1L << 20
      val keys = Seq("l_orderkey", "l_partkey", "l_suppkey")
      val z = (for (i <- 0 until 20; j <- keys.indices) yield
        s"((((${keys(j)} % $m) >> $i) & 1) << ${i * 3 + j})").mkString(" | ")
      s"""SELECT l_orderkey, l_linenumber, CAST($z AS BIGINT) AS z_key
         |FROM lineitem
         |ORDER BY l_orderkey, l_linenumber""".stripMargin
    })

  /** HILBERT clustering key ([[Layout.hilbertValue]]): the Morton
    * upgrade at the same bit budget — consecutive key values are
    * always grid-adjacent, so equal key ranges give tighter per-file
    * envelopes (t94/t96 gate the Z family; AUDIT_r16_hilbert measures
    * the pruning delta). The oracle replays the identical xy2d
    * quadrant-rotation recurrence level by level as chained CTEs —
    * every DuckDB bit op fully parenthesized (single flat precedence
    * level), xor via the function form. All-integer arithmetic, so
    * the gate is hash-exact by construction. */
  val t98_hilbert_key: Q = Q(
    run = (spark, dir) =>
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.operators.Layout.hilbertValue(
            pmod(col("l_orderkey").cast("long"), lit(1L << 16)),
            pmod(col("l_partkey").cast("long"), lit(1L << 16)),
            bits = 16).as("h_key"))
        .orderBy("l_orderkey", "l_linenumber"),
    bench = true,
    benchRun = Some((spark, dir) =>
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.operators.Layout.hilbertValue(
            pmod(col("l_orderkey").cast("long"), lit(1L << 16)),
            pmod(col("l_partkey").cast("long"), lit(1L << 16)),
            bits = 16).as("h_key"))),
    oracle = Some {
      val bits = 16
      val m = 1L << bits
      def lvl(i: Int, s: Long, prev: String): String =
        s"""h$i AS (SELECT l_orderkey, l_linenumber,
           |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${s - 1} - y ELSE y END) ELSE x END AS x,
           |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${s - 1} - x ELSE x END) ELSE y END AS y,
           |    d + ${s * s} * xor(3 * rx, ry) AS d
           |  FROM (SELECT *,
           |      CASE WHEN ((x & $s)) > 0 THEN 1 ELSE 0 END AS rx,
           |      CASE WHEN ((y & $s)) > 0 THEN 1 ELSE 0 END AS ry
           |    FROM $prev))""".stripMargin
      val levels = (1 to bits).map(i =>
        lvl(i, 1L << (bits - i), s"h${i - 1}")).mkString(",\n")
      s"""WITH h0 AS (SELECT l_orderkey, l_linenumber,
         |    CAST((l_orderkey % $m) AS BIGINT) AS x,
         |    CAST((l_partkey % $m) AS BIGINT) AS y,
         |    CAST(0 AS BIGINT) AS d
         |  FROM lineitem),
         |$levels
         |SELECT l_orderkey, l_linenumber, CAST(d AS BIGINT) AS h_key
         |FROM h$bits
         |ORDER BY l_orderkey, l_linenumber""".stripMargin
    })

  /** 3-KEY Hilbert clustering key ([[Layout.hilbertValue3]], the t96
    * 3-key Morton configuration's locality upgrade): Skilling's
    * transpose algorithm — per-level undo rotations, Gray encode,
    * last-axis parity smear, MSB-first round-robin interleave. The
    * oracle replays the identical integer recurrence as chained
    * DuckDB CTEs (one per (level, axis) sequential step — the C
    * loop's in-place updates become simultaneous two-column CASEs
    * reading the previous CTE), every bit op fully parenthesized.
    * All-integer, hash-exact by construction. */
  val t99_hilbert_key_3d: Q = Q(
    run = (spark, dir) =>
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.operators.Layout.hilbertValue3(
            pmod(col("l_orderkey").cast("long"), lit(1L << 16)),
            pmod(col("l_partkey").cast("long"), lit(1L << 16)),
            pmod(col("l_suppkey").cast("long"), lit(1L << 16)),
            bits = 16).as("h_key"))
        .orderBy("l_orderkey", "l_linenumber"),
    bench = true,
    benchRun = Some((spark, dir) =>
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.operators.Layout.hilbertValue3(
            pmod(col("l_orderkey").cast("long"), lit(1L << 16)),
            pmod(col("l_partkey").cast("long"), lit(1L << 16)),
            pmod(col("l_suppkey").cast("long"), lit(1L << 16)),
            bits = 16).as("h_key"))),
    oracle = Some {
      val bits = 16
      val m = 1L << bits
      val xs = Seq("x0", "x1", "x2")
      var ctes = Seq(
        s"""h0 AS (SELECT l_orderkey, l_linenumber,
           |    CAST((l_orderkey % $m) AS BIGINT) AS x0,
           |    CAST((l_partkey % $m) AS BIGINT) AS x1,
           |    CAST((l_suppkey % $m) AS BIGINT) AS x2
           |  FROM lineitem)""".stripMargin)
      var idx = 0
      // undo-excess-work rotations: q = 2^(bits-1) .. 2, axes 0..2
      for (sh <- (bits - 1) to 1 by -1; i <- 0 to 2) {
        val (q, p) = (1L << sh, (1L << sh) - 1L)
        val prev = s"h$idx"; idx += 1
        val cols = xs.map { c =>
          val xi = xs(i)
          if (i == 0) {
            if (c == "x0")
              s"CASE WHEN ((x0 & $q)) <> 0 THEN xor(x0, $p) ELSE x0 END AS x0"
            else s"$c"
          } else if (c == "x0")
            s"CASE WHEN (($xi & $q)) <> 0 THEN xor(x0, $p) " +
              s"ELSE xor(x0, ((xor(x0, $xi)) & $p)) END AS x0"
          else if (c == xi)
            s"CASE WHEN (($xi & $q)) <> 0 THEN $xi " +
              s"ELSE xor($xi, ((xor(x0, $xi)) & $p)) END AS $xi"
          else s"$c"
        }
        ctes :+= s"""h$idx AS (SELECT l_orderkey, l_linenumber,
           |    ${cols.mkString(",\n    ")} FROM $prev)""".stripMargin
      }
      // gray encode (sequential X[i] ^= X[i-1], spelled simultaneous)
      val prevG = s"h$idx"; idx += 1
      ctes :+= s"""h$idx AS (SELECT l_orderkey, l_linenumber, x0,
         |    xor(x1, x0) AS x1, xor(x2, xor(x1, x0)) AS x2
         |  FROM $prevG)""".stripMargin
      // parity smear from the last axis
      val tExpr = ((bits - 1) to 1 by -1).map { sh =>
        s"(CASE WHEN ((x2 & ${1L << sh})) <> 0 THEN ${(1L << sh) - 1L} ELSE 0 END)"
      }.reduce((a, b) => s"xor($a, $b)")
      val prevT = s"h$idx"; idx += 1
      ctes :+= s"""h$idx AS (SELECT l_orderkey, l_linenumber,
         |    xor(x0, t) AS x0, xor(x1, t) AS x1, xor(x2, t) AS x2
         |  FROM (SELECT *, $tExpr AS t FROM $prevT))""".stripMargin
      // MSB-first round-robin interleave
      val d = (for (sh <- (bits - 1) to 0 by -1; i <- 0 to 2) yield {
        val pos = 3 * bits - 1 - ((bits - 1 - sh) * 3 + i)
        s"((((${xs(i)} >> $sh)) & 1) << $pos)"
      }).mkString(" | ")
      s"""WITH ${ctes.mkString(",\n")}
         |SELECT l_orderkey, l_linenumber, CAST($d AS BIGINT) AS h_key
         |FROM h$idx
         |ORDER BY l_orderkey, l_linenumber""".stripMargin
    })

  /** Dimension-generic DuckDB replay of the Skilling transpose walk
    * ([[graft.functions.HilbertIndexN]]) — t99's CTE chain with the
    * axis list parameterized: one CTE per (level, axis)
    * undo-excess-work rotation, a cumulative-xor Gray encode, the
    * parity smear from the last axis, then the MSB-first round-robin
    * interleave. `keys` are raw column expressions (bounded here by
    * `% 2^bits`); every bit-op term fully parenthesized (DuckDB's
    * flat bitwise precedence, the t96 lesson). A `def`, not a `val` —
    * the Queries.scala val-order rule. */
  private def duckHilbertNSql(keys: Seq[String], bits: Int,
      idCols: Seq[String], table: String): String = {
    val n = keys.length
    val m = 1L << bits
    val xs = (0 until n).map(i => s"x$i")
    val ids = idCols.mkString(", ")
    var ctes = Seq(
      s"""h0 AS (SELECT $ids,
         |    ${keys.zipWithIndex.map { case (k, i) =>
               s"CAST(($k % $m) AS BIGINT) AS x$i" }.mkString(",\n    ")}
         |  FROM $table)""".stripMargin)
    var idx = 0
    for (sh <- (bits - 1) to 1 by -1; i <- 0 until n) {
      val (q, p) = (1L << sh, (1L << sh) - 1L)
      val prev = s"h$idx"; idx += 1
      val cols = xs.map { c =>
        val xi = xs(i)
        if (i == 0) {
          if (c == "x0")
            s"CASE WHEN ((x0 & $q)) <> 0 THEN xor(x0, $p) ELSE x0 END AS x0"
          else s"$c"
        } else if (c == "x0")
          s"CASE WHEN (($xi & $q)) <> 0 THEN xor(x0, $p) " +
            s"ELSE xor(x0, ((xor(x0, $xi)) & $p)) END AS x0"
        else if (c == xi)
          s"CASE WHEN (($xi & $q)) <> 0 THEN $xi " +
            s"ELSE xor($xi, ((xor(x0, $xi)) & $p)) END AS $xi"
        else s"$c"
      }
      ctes :+= s"""h$idx AS (SELECT $ids,
         |    ${cols.mkString(",\n    ")} FROM $prev)""".stripMargin
    }
    // gray encode: X[i] ^= X[i-1] sequentially = cumulative-xor prefix
    val prevG = s"h$idx"; idx += 1
    val gray = xs.zipWithIndex.map { case (c, i) =>
      if (i == 0) "x0"
      else s"${(0 to i).map(xs).foldLeft("") { (acc, x) =>
        if (acc.isEmpty) x else s"xor($x, $acc)" }} AS $c"
    }
    ctes :+= s"""h$idx AS (SELECT $ids, ${gray.mkString(",\n    ")}
       |  FROM $prevG)""".stripMargin
    val tExpr = ((bits - 1) to 1 by -1).map { sh =>
      s"(CASE WHEN ((${xs.last} & ${1L << sh})) <> 0 THEN ${(1L << sh) - 1L} ELSE 0 END)"
    }.reduce((a, b) => s"xor($a, $b)")
    val prevT = s"h$idx"; idx += 1
    ctes :+= s"""h$idx AS (SELECT $ids,
       |    ${xs.map(c => s"xor($c, t) AS $c").mkString(", ")}
       |  FROM (SELECT *, $tExpr AS t FROM $prevT))""".stripMargin
    val d = (for (sh <- (bits - 1) to 0 by -1; i <- 0 until n) yield {
      val pos = n * bits - 1 - ((bits - 1 - sh) * n + i)
      s"((((${xs(i)} >> $sh)) & 1) << $pos)"
    }).mkString(" | ")
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT $ids, CAST($d AS BIGINT) AS h_key
       |FROM h$idx
       |ORDER BY $ids""".stripMargin
  }

  /** 4-KEY Hilbert clustering key ([[Layout.hilbertValueN]], the
    * dimension-generic Skilling loop at `zValueN`'s arity — round-16
    * verdict item 5) over lineitem's (orderkey, partkey, suppkey,
    * linenumber) at 15 bits/key (60 interleaved bits). Hash-exact vs
    * the [[duckHilbertNSql]] replay; the 4-d pruning-vs-Morton
    * receipts are AUDIT_r17's rows. */
  val t100_hilbert_key_4d: Q = Q(
    run = (spark, dir) =>
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.operators.Layout.hilbertValueN(Seq(
            pmod(col("l_orderkey").cast("long"), lit(1L << 15)),
            pmod(col("l_partkey").cast("long"), lit(1L << 15)),
            pmod(col("l_suppkey").cast("long"), lit(1L << 15)),
            pmod(col("l_linenumber").cast("long"), lit(1L << 15))),
            bits = 15).as("h_key"))
        .orderBy("l_orderkey", "l_linenumber"),
    bench = true,
    benchRun = Some((spark, dir) =>
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.operators.Layout.hilbertValueN(Seq(
            pmod(col("l_orderkey").cast("long"), lit(1L << 15)),
            pmod(col("l_partkey").cast("long"), lit(1L << 15)),
            pmod(col("l_suppkey").cast("long"), lit(1L << 15)),
            pmod(col("l_linenumber").cast("long"), lit(1L << 15))),
            bits = 15).as("h_key"))),
    oracle = Some(duckHilbertNSql(
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
      bits = 15, idCols = Seq("l_orderkey", "l_linenumber"),
      table = "lineitem")))

  /** One unrolled E-step of the unigram-LM oracle
    * ([[graft.operators.UnigramLm]]): the per-word Viterbi DP as a
    * position-indexed CTE chain — `ub{k}_i` holds each word's best
    * score and chosen last-piece length at position i (argmax
    * `ORDER BY s DESC, l DESC`, the trainer's longer-last-piece tie
    * rule), `uwk{k}_j` walks the choices back from `length(w)`
    * emitting the path pieces, `uus{k}` aggregates word-frequency-
    * weighted piece usage. Fan-in per position is `maxPieceLen`; the
    * chain depth is `maxWordLen` (the trainer's word-length bound —
    * what makes the unrolled oracle finite). */
  private def duckUnigramEStep(k: Int, scoreTable: String,
      maxWordLen: Int, maxPieceLen: Int): Seq[String] = {
    val ctes = Seq.newBuilder[String]
    ctes += s"""ue$k AS MATERIALIZED (SELECT words.w, ci.i, cl.l, s.score
       |  FROM words
       |  CROSS JOIN (SELECT unnest(generate_series(1, $maxWordLen)) AS i) ci
       |  CROSS JOIN (SELECT unnest(generate_series(1, $maxPieceLen)) AS l) cl
       |  JOIN $scoreTable s
       |    ON s.piece = substring(words.w, CAST((ci.i - cl.l + 1) AS INT), CAST(cl.l AS INT))
       |  WHERE cl.l <= ci.i AND ci.i <= length(words.w))""".stripMargin
    ctes += s"ub${k}_0 AS MATERIALIZED (SELECT w, CAST(0 AS BIGINT) AS s FROM words)"
    for (i <- 1 to maxWordLen) {
      val cands = (1 to math.min(i, maxPieceLen)).map { l =>
        s"""SELECT e.w, p.s + e.score AS s, e.l AS l
           |      FROM ue$k e JOIN ub${k}_${i - l} p USING (w)
           |      WHERE e.i = $i AND e.l = $l""".stripMargin
      }.mkString("\n      UNION ALL ")
      ctes += s"""ub${k}_$i AS MATERIALIZED (SELECT w, s, l FROM (
         |    SELECT w, s, l,
         |      row_number() OVER (PARTITION BY w ORDER BY s DESC, l DESC) AS rn
         |    FROM ($cands)) WHERE rn = 1)""".stripMargin
    }
    ctes += s"""uch$k AS MATERIALIZED (${(1 to maxWordLen).map(i =>
      s"SELECT w, $i AS pos, l FROM ub${k}_$i").mkString(" UNION ALL ")})"""
    ctes += s"""uwk${k}_0 AS MATERIALIZED (SELECT w, length(w) AS pos,
       |  CAST(NULL AS VARCHAR) AS piece FROM words)""".stripMargin
    for (j <- 1 to maxWordLen) {
      ctes += s"""uwk${k}_$j AS MATERIALIZED (SELECT t.w, t.pos - c.l AS pos,
         |    substring(t.w, CAST((t.pos - c.l + 1) AS INT), CAST(c.l AS INT)) AS piece
         |  FROM uwk${k}_${j - 1} t JOIN uch$k c ON c.w = t.w AND c.pos = t.pos
         |  WHERE t.pos > 0)""".stripMargin
    }
    ctes += s"""upath$k AS MATERIALIZED (${(1 to maxWordLen).map(j =>
      s"SELECT w, piece FROM uwk${k}_$j").mkString(" UNION ALL ")})"""
    ctes += s"""uus$k AS MATERIALIZED (SELECT piece, CAST(sum(cnt) AS BIGINT) AS cnt
       |  FROM upath$k JOIN words USING (w) GROUP BY piece)""".stripMargin
    ctes.result()
  }

  /** The micro-log10 M-step score CTE: `round(log10(cnt/total)·1e6)`
    * as BIGINT — the one libm call both engines compute identically
    * (the t32/t92 discipline), over integer counts cast to DOUBLE in
    * one fixed order. */
  private def duckUnigramScoreCte(name: String, src: String): String =
    s"""$name AS MATERIALIZED (SELECT piece,
       |  CAST(round(log10(CAST(cnt AS DOUBLE) /
       |    CAST((SELECT sum(cnt) FROM $src) AS DOUBLE)) * 1000000) AS BIGINT)
       |    AS score FROM $src)""".stripMargin

  /** The full unigram-LM training replay as a WITH-body: word table →
    * substring seed (all chars + top `seedSize` multi by count then
    * binary piece order) → `emIters` unrolled EM rounds → usage-ranked
    * prune to `vocabMulti` multi pieces → one final EM round →
    * `uvocab(piece, usage, score_micro)`. Mirrors
    * [[graft.operators.UnigramLm.train]] decision for decision. */
  private def duckUnigramChain(maxWordLen: Int, maxPieceLen: Int,
      seedSize: Int, emIters: Int, vocabMulti: Int): String = {
    val ctes = Seq.newBuilder[String]
    ctes += s"""uw AS MATERIALIZED (SELECT unnest(list_filter(
       |    string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
       |  FROM documents)""".stripMargin
    ctes += s"""words AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS cnt
       |  FROM uw WHERE length(w) <= $maxWordLen GROUP BY w)""".stripMargin
    ctes += s"""sub AS MATERIALIZED (SELECT substring(w, CAST(ci.i AS INT), CAST(cl.l AS INT)) AS piece,
       |    CAST(sum(cnt) AS BIGINT) AS cnt
       |  FROM words
       |  CROSS JOIN (SELECT unnest(generate_series(1, $maxWordLen)) AS i) ci
       |  CROSS JOIN (SELECT unnest(generate_series(1, $maxPieceLen)) AS l) cl
       |  WHERE ci.i + cl.l - 1 <= length(w) GROUP BY 1)""".stripMargin
    ctes += "chars0 AS MATERIALIZED (SELECT piece, cnt FROM sub WHERE length(piece) = 1)"
    ctes += s"""multi0 AS MATERIALIZED (SELECT piece, cnt FROM (
       |  SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rn
       |  FROM sub WHERE length(piece) > 1) WHERE rn <= $seedSize)""".stripMargin
    ctes += "v0 AS MATERIALIZED (SELECT * FROM chars0 UNION ALL SELECT * FROM multi0)"
    ctes += duckUnigramScoreCte("us1", "v0")
    for (k <- 1 to emIters) {
      ctes ++= duckUnigramEStep(k, s"us$k", maxWordLen, maxPieceLen)
      ctes += s"""um$k AS MATERIALIZED (SELECT c.piece,
         |    CASE WHEN u.cnt IS NULL THEN CAST(1 AS BIGINT) ELSE u.cnt END AS cnt
         |  FROM chars0 c LEFT JOIN uus$k u USING (piece)
         |  UNION ALL
         |  SELECT piece, cnt FROM uus$k WHERE length(piece) > 1 AND cnt > 0)""".stripMargin
      ctes += duckUnigramScoreCte(s"us${k + 1}", s"um$k")
    }
    val kf = emIters + 1
    ctes += s"""ukeep AS MATERIALIZED (SELECT piece FROM (
       |  SELECT piece, row_number() OVER (ORDER BY cnt DESC, piece) AS rn
       |  FROM um$emIters WHERE length(piece) > 1) WHERE rn <= $vocabMulti)""".stripMargin
    ctes += s"""usp AS MATERIALIZED (SELECT piece, score FROM us$kf
       |  WHERE length(piece) = 1 OR piece IN (SELECT piece FROM ukeep))""".stripMargin
    ctes ++= duckUnigramEStep(kf, "usp", maxWordLen, maxPieceLen)
    ctes += s"""um$kf AS MATERIALIZED (SELECT c.piece,
       |    CASE WHEN u.cnt IS NULL THEN CAST(1 AS BIGINT) ELSE u.cnt END AS cnt
       |  FROM chars0 c LEFT JOIN uus$kf u USING (piece)
       |  UNION ALL
       |  SELECT piece, cnt FROM uus$kf WHERE length(piece) > 1 AND cnt > 0)""".stripMargin
    ctes += duckUnigramScoreCte(s"us${kf + 1}", s"um$kf")
    ctes += s"""uvocab AS MATERIALIZED (SELECT m.piece, m.cnt AS usage, s.score AS score_micro
       |  FROM um$kf m JOIN us${kf + 1} s USING (piece))""".stripMargin
    ctes.result().mkString(",\n")
  }

  /** SENTENCEPIECE-STYLE unigram-LM tokenizer training
    * ([[graft.operators.UnigramLm.train]]) — the BPE sibling (t66)
    * and the last big tokenizer-training family: substring seeding,
    * `emIters` deterministic Viterbi-EM rounds over the word table,
    * usage-ranked pruning, one re-estimating round. Gated hash-exact
    * against the fully unrolled DuckDB EM replay
    * ([[duckUnigramChain]]) — integer micro-log10 scores and integer
    * usage counts only. */
  val t101_unigram_vocab: Q = Q(
    run = (spark, dir) => {
      import spark.implicits._
      graft.operators.UnigramLm.train(t(spark, dir, "documents"), "text")
        .map(v => (v.piece, v.usage, v.scoreMicro))
        .toDF("piece", "usage", "score_micro")
        .orderBy("piece")
    },
    oracle = Some {
      s"""WITH ${duckUnigramChain(16, 4, 120, 2, 60)}
         |SELECT piece, usage, score_micro FROM uvocab
         |ORDER BY piece""".stripMargin
    })

  /** Per-document token statistics under the t101-trained unigram
    * vocabulary ([[graft.operators.UnigramLm.encodeStats]]): word,
    * piece and character counts, with over-`maxWordLen` words
    * falling back to character segmentation. The oracle replays the
    * full training chain, runs ONE more Viterbi walk under the final
    * vocabulary scores, and joins path lengths back to the corpus. */
  val t102_unigram_encode: Q = Q(
    run = (spark, dir) => {
      val docs = tf(spark, dir, "documents")
      // trainAndCount: the distinct-word count training already
      // measures routes the encode probe with no extra job (r19)
      val (vocab, nWords) =
        graft.operators.UnigramLm.trainAndCount(docs, "text")
      graft.operators.UnigramLm.encodeStats(docs, "doc_id", "text",
          vocab, knownWords = Some(nWords))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    bench = true,
    oracle = Some {
      val enc = 4 // emIters + 2: the encode walk under the FINAL scores
      s"""WITH ${duckUnigramChain(16, 4, 120, 2, 60)},
         |usf AS MATERIALIZED (SELECT piece, score_micro AS score FROM uvocab),
         |${duckUnigramEStep(enc, "usf", 16, 4).mkString(",\n")},
         |np AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS n_pieces
         |  FROM upath$enc GROUP BY w),
         |dw AS MATERIALIZED (SELECT doc_id, unnest(list_filter(
         |    string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         |  FROM documents)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(CASE WHEN length(w) > 16 THEN length(w)
         |    ELSE np.n_pieces END) AS BIGINT) AS n_pieces,
         |  CAST(sum(length(w)) AS BIGINT) AS n_chars
         |FROM dw LEFT JOIN np USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    })

  /** Per-document LM score under the t101-trained unigram vocabulary
    * ([[graft.operators.UnigramLm.docScores]]) — the CCNet-style
    * quality/perplexity signal: sum of each word's Viterbi-best total
    * micro-log10 score. The oracle reads each ≤maxWordLen word's
    * score straight off the encode walk's DP table (`best[len(w)]` —
    * Viterbi maximizes the score sum, so the path sum IS the DP
    * optimum) and scores longer words per character with the UNK
    * floor (one decade below the vocabulary minimum). */
  val t103_unigram_doc_score: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val (vocab, nWords) =
        graft.operators.UnigramLm.trainAndCount(docs, "text")
      graft.operators.UnigramLm.docScores(docs, "doc_id", "text",
          vocab, knownWords = Some(nWords))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    oracle = Some {
      val enc = 4 // the encode walk under the FINAL scores (as t102)
      s"""WITH ${duckUnigramChain(16, 4, 120, 2, 60)},
         |usf AS MATERIALIZED (SELECT piece, score_micro AS score FROM uvocab),
         |${duckUnigramEStep(enc, "usf", 16, 4).mkString(",\n")},
         |ubp AS MATERIALIZED (${(1 to 16).map(i =>
           s"SELECT w, $i AS pos, s FROM ub${enc}_$i").mkString(" UNION ALL ")}),
         |wsc AS MATERIALIZED (SELECT u.w, u.s FROM ubp u
         |  JOIN words wd ON wd.w = u.w AND u.pos = length(wd.w)),
         |unkv AS MATERIALIZED (SELECT min(score) - 1000000 AS unk FROM usf),
         |lw AS MATERIALIZED (SELECT DISTINCT w FROM uw WHERE length(w) > 16),
         |lwi AS MATERIALIZED (SELECT w,
         |  unnest(generate_series(1, length(w))) AS i FROM lw),
         |lws AS MATERIALIZED (SELECT t.w,
         |    CAST(sum(COALESCE(v.score, (SELECT unk FROM unkv))) AS BIGINT) AS s
         |  FROM (SELECT w, substring(w, CAST(i AS INT), 1) AS piece FROM lwi) t
         |  LEFT JOIN usf v USING (piece) GROUP BY t.w),
         |ws AS MATERIALIZED (SELECT w, s FROM wsc
         |  UNION ALL SELECT w, s FROM lws),
         |dw AS MATERIALIZED (SELECT doc_id, unnest(list_filter(
         |    string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         |  FROM documents)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(ws.s) AS BIGINT) AS score_micro_total
         |FROM dw JOIN ws USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    })

  private val ProbeIters = 3
  private val ProbeLr = 0.1

  /** One unrolled gradient-descent iteration of the t71 oracle: dot via
    * `list_dot_product` (sequential fold ≡ the repo's DotProduct
    * kernel), per-row/per-dim gradient rounded to BIGINT micro BEFORE
    * the cross-row sum (order-independent), weight update in the same
    * fixed double order as [[LinearProbe.train]]. */
  private def duckProbeIter(k: Int): String =
    s"""wl${k - 1} AS (SELECT list(w ORDER BY dim) AS wl FROM w${k - 1}),
       |d$k AS (SELECT e, y, list_dot_product(e, (SELECT wl FROM wl${k - 1})) AS dot FROM v),
       |g$k AS (SELECT d.i AS dim,
       |    CAST(sum(CAST(round((dot - y) * e[d.i] * 1000000) AS BIGINT)) AS BIGINT) AS g
       |  FROM d$k, dims d GROUP BY 1),
       |w$k AS (SELECT p.dim,
       |    p.w - $ProbeLr * ((CAST(COALESCE(g.g, 0) AS DOUBLE) / 1000000.0) / (SELECT nn FROM n)) AS w
       |  FROM w${k - 1} p LEFT JOIN g$k g USING (dim))""".stripMargin

  /** Deterministic distributed linear-probe training
    * ([[LinearProbe.trainedWeights]]): least-squares probe on the
    * embedding table against the binary target `label % 2`, 3
    * full-batch GD iterations. The gated weights are bit-reproducible
    * because every cross-row float sum is rounded to integer micro
    * PER ROW first (the t32 discipline applied to training); the
    * oracle replays all iterations unrolled. */
  /** The shared t71/t72 training replay: labeled vector table, dim
    * spine, and all [[ProbeIters]] unrolled GD iterations ending in
    * `w$ProbeIters`. */
  private lazy val duckProbeChain: String = {
    val iterBlocks = (1 to ProbeIters).map(duckProbeIter).mkString(",\n")
    s"""v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
       |    CAST(label % 2 AS DOUBLE) AS y FROM embeddings),
       |dims AS (SELECT unnest(range(1, (SELECT max(len(e)) FROM v) + 1)) AS i),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM v),
       |w0 AS (SELECT i AS dim, 0.0 AS w FROM dims),
       |$iterBlocks""".stripMargin
  }

  val t71_linear_probe: Q = Q(
    run = (spark, dir) =>
      LinearProbe.trainedWeights(spark, t(spark, dir, "embeddings"),
          "embedding", col("label") % 2, iters = ProbeIters, lr = ProbeLr)
        .orderBy("dim"),
    oracle = Some(
      s"""WITH $duckProbeChain
         |SELECT CAST(dim AS INT) AS dim,
         |  CAST(round(w * 1000000) AS BIGINT) AS w_micro
         |FROM w$ProbeIters ORDER BY dim""".stripMargin))

  private val ProbeSelectK = 50

  /** Probe-based corpus selection ([[LinearProbe.selectTop]]): train
    * the t71 probe, score every vector map-side with the trained
    * weights riding along as a literal, keep the global top-50 by
    * (score desc, id) via TakeOrderedAndProject — the
    * train-on-seed → score-corpus → select curation workflow as one
    * operator, with the scoring pass map-only at any corpus size. */
  val t72_probe_select: Q = Q(
    run = (spark, dir) =>
      LinearProbe.selectTop(tf(spark, dir, "embeddings"), "vec_id",
        "embedding", col("label") % 2, iters = ProbeIters, lr = ProbeLr,
        k = ProbeSelectK),
    oracle = Some(
      s"""WITH $duckProbeChain
         |SELECT vec_id, CAST(y AS INT) AS y,
         |  CAST(round(list_dot_product(e,
         |    (SELECT list(w ORDER BY dim) FROM w$ProbeIters)) * 1000000) AS BIGINT) AS score_micro
         |FROM v ORDER BY score_micro DESC, vec_id LIMIT $ProbeSelectK""".stripMargin),
    bench = true)

  // ---------------------------------------------------------------------
  // Training-data dedup family (documents / embeddings tables)
  // ---------------------------------------------------------------------

  /** Shared DuckDB CTEs: whitespace tokens + distinct 3-gram shingles. */
  private val duckToksSh =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS t
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) >= 3
      |      THEN list_distinct([array_to_string(list_slice(t, i+1, i+3), ' ') for i in range(len(t)-2)])
      |      ELSE [] END AS s
      |  FROM toks
      |)""".stripMargin

  val t1_exact_dedup: Q = Q(
    run = (spark, dir) =>
      TextDedup.exactDedup(t(spark, dir, "documents"), "doc_id", "text")
        .orderBy("keep_id"),
    oracle = Some(
      """SELECT md5(text) AS text_md5, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
        |  CAST(COUNT(*) AS BIGINT) AS dup_count
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin),
    bench = true)

  private val JaccardThreshold = 0.5

  val t2_ngram_jaccard_pairs: Q = Q(
    run = (spark, dir) => {
      // staged+persisted: see TextDedup.shingleSets (quadratic-lambda and
      // self-join-recompute hazards). 64-bit currency: the staged frame
      // holds xxhash64 shingle ids, never strings (TextDedup
      // .hashedShingles — hashes at the edges, ids inside every join).
      // Skew-adaptive: a sampled df probe routes flat corpora (like this
      // synthetic one) to the direct exploded join and heavy-tailed
      // corpora to the prefix-filtered variant — see
      // TextDedup.jaccardPairsAdaptive
      val withSh = Staging.barrier(TextDedup.hashedShingles(
        tf(spark, dir, "documents"), "doc_id", "text", 3))
      TextDedup.jaccardPairsAdaptive(withSh, JaccardThreshold)
        .orderBy("id_a", "id_b")
    },
    oracle = Some(
      s"""WITH $duckToksSh,
         |ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
         |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
         |inter AS (
         |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
         |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT ida AS id_a, idb AS id_b, i * 1.0 / (sa.n + sb.n - i) AS jaccard
         |FROM inter JOIN sizes sa ON sa.doc_id = ida JOIN sizes sb ON sb.doc_id = idb
         |WHERE i * 1.0 / (sa.n + sb.n - i) >= $JaccardThreshold
         |ORDER BY id_a, id_b""".stripMargin),
    bench = true)

  private val MinhashK = 16
  private val BandSize = 4
  private val NumBands = 4

  /** t3's DuckDB twin, parameterized by a corpus predicate — the
    * minhash index lifecycle gates (t86–t89) compare a probe over a
    * mutated index against the SAME self-join oracle restricted to the
    * visible survivor set. */
  private def minhashPairsOracleSql(whereSql: String = ""): String = {
    val toksSh =
      if (whereSql.isEmpty) duckToksSh
      else duckToksSh.replace("FROM documents",
        s"FROM documents WHERE $whereSql")
    val sigElems = (0 until MinhashK).map(i =>
      s"list_min(list_transform(s, x -> md5('$i:' || x)))").mkString(", ")
    val bandElems = (0 until NumBands).map(b =>
      s"md5(array_to_string(list_slice(sig, ${b * BandSize + 1}, ${(b + 1) * BandSize}), ','))")
      .mkString(", ")
    s"""WITH $toksSh,
       |shf AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
       |sig AS (SELECT doc_id, s, [$sigElems] AS sig FROM shf),
       |bands AS (SELECT doc_id, [$bandElems] AS bands FROM sig),
       |ex AS (
       |  SELECT doc_id, r.range AS band_idx, bands[r.range + 1] AS bh
       |  FROM bands CROSS JOIN range($NumBands) r),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM ex a JOIN ex b
       |    ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b,
       |  len(list_intersect(sa.s, sb.s)) * 1.0
       |    / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS jaccard
       |FROM cand JOIN shf sa ON sa.doc_id = id_a JOIN shf sb ON sb.doc_id = id_b
       |WHERE len(list_intersect(sa.s, sb.s)) * 1.0
       |    / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= $JaccardThreshold
       |ORDER BY id_a, id_b""".stripMargin
  }

  val t3_minhash_lsh_pairs: Q = Q(
    run = (spark, dir) =>
      TextDedup.minhashLshPairs(tf(spark, dir, "documents"), "doc_id", "text",
          n = 3, k = MinhashK, bandSize = BandSize, numBands = NumBands,
          threshold = JaccardThreshold)
        .orderBy("id_a", "id_b"),
    oracle = Some(minhashPairsOracleSql()),
    bench = true)

  /** Cross-source duplication matrix — the corpus-overlap report a data
    * team reads before mixing sources: near-dup pairs (the t3 LSH
    * pipeline) rolled up by (source, source), canonicalized with
    * least/greatest so the matrix is upper-triangular.
    *
    * Broadcast discipline (ADVICE r7): the PAIR list is the tiny side —
    * the doc→source map is corpus-cardinality and must never broadcast.
    * Each pair is unpivoted to its two member ids, that sliver is
    * broadcast against ONE map-side pass over documents, and least/
    * greatest collapse back per pair via min/max over the two matched
    * rows (id_a < id_b guarantees exactly two). Shuffle carries only
    * (id_a, id_b, source) for matched pairs. */
  val t38_overlap_matrix: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val pairs = TextDedup.minhashLshPairs(docs, "doc_id", "text",
          n = 3, k = MinhashK, bandSize = BandSize, numBands = NumBands,
          threshold = JaccardThreshold)
        .select("id_a", "id_b")
      val sides = pairs.select(col("id_a"), col("id_b"),
        explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      docs.select(col("doc_id"), col("source"))
        .join(broadcast(sides), Seq("doc_id"))
        .groupBy("id_a", "id_b")
        .agg(min(col("source")).as("source_a"),
          max(col("source")).as("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_a", "source_b")
    },
    oracle = Some(
      s"""WITH pairs AS (SELECT id_a, id_b FROM (${t3_minhash_lsh_pairs.oracle.get})),
         |m AS (SELECT least(da.source, db.source) AS source_a,
         |    greatest(da.source, db.source) AS source_b
         |  FROM pairs
         |  JOIN documents da ON da.doc_id = pairs.id_a
         |  JOIN documents db ON db.doc_id = pairs.id_b)
         |SELECT source_a, source_b, COUNT(*) AS n_pairs
         |FROM m GROUP BY source_a, source_b
         |ORDER BY source_a, source_b""".stripMargin))

  /** Persisted MinHash-LSH BAND INDEX ([[TextDedup.writeMinhashIndex]]
    * / [[TextDedup.probeMinhashIndex]]) — the near-dup family's
    * build-once/probe-many form, closing the retrieval-family symmetry
    * from the other side (BM25 t46, IVF+SQ8 t40, PQ t45, fuzzy
    * segments t82): index the corpus once (band entries bucketed+sorted
    * by the packed `band_idx#hash` key, hashed-shingle arrays bucketed
    * by id, LSH parameters in a meta table), then dedup every new
    * batch against it with a probe whose index side scans
    * exchange-free. Gated: probing the indexed corpus with ITSELF,
    * restricted to `q_id < id`, must reproduce the in-query t3
    * self-join — gated on t3's oracle verbatim (the t82 pattern). */
  val t83_minhash_index_persist: Q = Q(
    run = (spark, dir) => {
      val table = "graft_minhash_index"
      val docs = tf(spark, dir, "documents")
      TextDedup.writeMinhashIndex(docs, "doc_id", "text", n = 3,
        k = MinhashK, bandSize = BandSize, numBands = NumBands,
        threshold = JaccardThreshold, table = table)
      TextDedup.probeMinhashIndex(spark, table, docs, "doc_id", "text")
        .filter(col("q_id") < col("id"))
        .select(col("q_id").as("id_a"), col("id").as("id_b"), col("jaccard"))
        .orderBy("id_a", "id_b")
    },
    oracle = t3_minhash_lsh_pairs.oracle,
    bench = true,
    // bench the build+probe, not the gate's row-stability sort
    benchRun = Some((spark, dir) => {
      val table = "graft_minhash_index"
      val docs = tf(spark, dir, "documents")
      TextDedup.writeMinhashIndex(docs, "doc_id", "text", n = 3,
        k = MinhashK, bandSize = BandSize, numBands = NumBands,
        threshold = JaccardThreshold, table = table)
      TextDedup.probeMinhashIndex(spark, table, docs, "doc_id", "text")
        .filter(col("q_id") < col("id"))
    }))

  /** PROBE-ONLY form of t83 — the build-once/probe-many payoff made
    * measurable: the index is built once per JVM (dir-keyed table
    * name; bench rep 1 builds, every later rep hits the catalog and
    * ONLY probes), so min-of-reps isolates the probe — batch band
    * entries shuffled against an exchange-free bucketed index scan.
    * Value-gated identically to t83 (t3's oracle verbatim). */
  /** ONE shared build-if-missing + probe body for t90's gate and bench
    * paths (no drift surface). The table is keyed by the md5 of the sf
    * dir — collision-proof and always a valid identifier (hashCode
    * collides across strings and abs(Int.MinValue) stays negative). */
  private def t90Probe(spark: SparkSession, dir: String): DataFrame = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val table = s"graft_minhash_probe_$key"
    val docs = tf(spark, dir, "documents")
    if (!spark.catalog.tableExists(table))
      TextDedup.writeMinhashIndex(docs, "doc_id", "text", n = 3,
        k = MinhashK, bandSize = BandSize, numBands = NumBands,
        threshold = JaccardThreshold, table = table)
    TextDedup.probeMinhashIndex(spark, table, docs, "doc_id", "text")
      .filter(col("q_id") < col("id"))
  }

  val t90_minhash_index_probe: Q = Q(
    run = (spark, dir) =>
      t90Probe(spark, dir)
        .select(col("q_id").as("id_a"), col("id").as("id_b"), col("jaccard"))
        .orderBy("id_a", "id_b"),
    oracle = t3_minhash_lsh_pairs.oracle,
    bench = true,
    benchRun = Some((spark, dir) => t90Probe(spark, dir)))

  /** Minhash index COMMITTED APPEND
    * ([[TextDedup.appendToMinhashIndexCommitted]]): band entries and
    * shingle docs land under ONE CommitLog rename (the t62/t63/BM25
    * atomic-append shape, near-dup side); a live probe over base ∪
    * committed batch must equal the from-scratch self-join on the full
    * corpus — t3's oracle verbatim. */
  val t86_minhash_index_append: Q = Q(
    run = (spark, dir) => {
      val table = "graft_minhash_append"
      val docs = t(spark, dir, "documents")
      TextDedup.writeMinhashIndex(docs.filter(col("doc_id") % 3 =!= 0),
        "doc_id", "text", n = 3, k = MinhashK, bandSize = BandSize,
        numBands = NumBands, threshold = JaccardThreshold, table = table)
      TextDedup.appendToMinhashIndexCommitted(
        docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", table,
        batchId = 1L)
      TextDedup.probeMinhashIndex(spark, table, docs, "doc_id", "text")
        .filter(col("q_id") < col("id"))
        .select(col("q_id").as("id_a"), col("id").as("id_b"), col("jaccard"))
        .orderBy("id_a", "id_b")
    },
    oracle = Some(minhashPairsOracleSql()))

  /** Minhash index AS-OF read ([[TextDedup.loadMinhashIndexAsOf]]):
    * snapshot time travel over the append history — the index as seen
    * after batch 1 committed is base ∪ batch 1, batch 2 invisible;
    * probing that snapshot with the snapshot's own documents equals
    * the self-join on the prefix corpus (doc_id % 3 ≠ 0). */
  val t87_minhash_index_asof: Q = Q(
    run = (spark, dir) => {
      val table = "graft_minhash_asof"
      val docs = t(spark, dir, "documents")
      TextDedup.writeMinhashIndex(docs.filter(col("doc_id") % 3 === 1),
        "doc_id", "text", n = 3, k = MinhashK, bandSize = BandSize,
        numBands = NumBands, threshold = JaccardThreshold, table = table)
      TextDedup.appendToMinhashIndexCommitted(
        docs.filter(col("doc_id") % 3 === 2), "doc_id", "text", table,
        batchId = 1L)
      TextDedup.appendToMinhashIndexCommitted(
        docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", table,
        batchId = 2L)
      val snap = TextDedup.loadMinhashIndexAsOf(spark, table, asOfBatch = 1L)
      TextDedup.probeMinhashLoaded(snap,
          docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text")
        .filter(col("q_id") < col("id"))
        .select(col("q_id").as("id_a"), col("id").as("id_b"), col("jaccard"))
        .orderBy("id_a", "id_b")
    },
    oracle = Some(minhashPairsOracleSql("doc_id % 3 <> 0")))

  /** Minhash index DELETE ([[TextDedup.deleteFromMinhashIndex]]):
    * tombstones anti-join both the entry and doc sides at probe time
    * (merge-on-read), so a probe over the survivors equals a
    * from-scratch build on them. */
  val t88_minhash_index_delete: Q = Q(
    run = (spark, dir) => {
      val table = "graft_minhash_delete"
      val docs = t(spark, dir, "documents")
      TextDedup.writeMinhashIndex(docs, "doc_id", "text", n = 3,
        k = MinhashK, bandSize = BandSize, numBands = NumBands,
        threshold = JaccardThreshold, table = table)
      TextDedup.deleteFromMinhashIndex(
        docs.filter(col("doc_id") % 5 === 2), "doc_id", table)
      TextDedup.probeMinhashIndex(spark, table,
          docs.filter(col("doc_id") % 5 =!= 2), "doc_id", "text")
        .filter(col("q_id") < col("id"))
        .select(col("q_id").as("id_a"), col("id").as("id_b"), col("jaccard"))
        .orderBy("id_a", "id_b")
    },
    oracle = Some(minhashPairsOracleSql("doc_id % 5 <> 2")))

  /** FULL minhash index lifecycle
    * ([[TextDedup.compactMinhashIndex]]): build → committed append →
    * delete → compact → probe. Compaction folds the committed batch
    * into both bucketed base tables, drops tombstoned rows physically,
    * clears exactly the folded batches then the delete list — after
    * it the probe plan is the fresh-build plan (no side unions, no
    * anti-joins), and the result equals a from-scratch build on the
    * survivors. */
  val t89_minhash_index_compact: Q = Q(
    run = (spark, dir) => {
      val table = "graft_minhash_compact"
      val docs = t(spark, dir, "documents")
      TextDedup.writeMinhashIndex(docs.filter(col("doc_id") % 3 =!= 0),
        "doc_id", "text", n = 3, k = MinhashK, bandSize = BandSize,
        numBands = NumBands, threshold = JaccardThreshold, table = table)
      TextDedup.appendToMinhashIndexCommitted(
        docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", table,
        batchId = 1L)
      TextDedup.deleteFromMinhashIndex(
        docs.filter(col("doc_id") % 5 === 2), "doc_id", table)
      TextDedup.compactMinhashIndex(spark, table)
      TextDedup.probeMinhashIndex(spark, table,
          docs.filter(col("doc_id") % 5 =!= 2), "doc_id", "text")
        .filter(col("q_id") < col("id"))
        .select(col("q_id").as("id_a"), col("id").as("id_b"), col("jaccard"))
        .orderBy("id_a", "id_b")
    },
    oracle = Some(minhashPairsOracleSql("doc_id % 5 <> 2")))

  private val SimhashBits = 32

  val t4_simhash: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      // stage the 60-bit token-hash array: the 32 per-bit aggregates each
      // reference it, and without a barrier every one re-runs the
      // tokenize+md5 pipeline
      val withHs = Staging.barrier(docs.select(col("doc_id"),
        transform(TextDedup.tokens(col("text")), TextDedup.tokenHash60(_)).as("hs")))
      withHs.select(col("doc_id"),
          TextDedup.simhashFromHashes(col("hs"), SimhashBits).as("simhash"))
        .orderBy("doc_id")
    },
    oracle = {
      val terms = (0 until SimhashBits).map { b =>
        s"(CASE WHEN list_sum(list_transform(h, v -> CASE WHEN (v >> $b) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString(" + ")
      Some(
        s"""WITH toks AS (
           |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
           |  FROM documents),
           |hs AS (SELECT doc_id, list_transform(t, x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)) AS h FROM toks)
           |SELECT doc_id, CAST($terms AS BIGINT) AS simhash FROM hs ORDER BY doc_id""".stripMargin)
    })

  /** SimHash near-dup pairs (hamming ≤ 3 of 32 bits) via
    * pigeonhole-exact banding ([[TextDedup.simhashPairs]]). The oracle
    * is deliberately the EXHAUSTIVE quadratic join — hash equality
    * proves the banded plan loses no pair at the distance bound. */
  val t26_simhash_pairs: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val withHs = Staging.barrier(docs.select(col("doc_id"),
        transform(TextDedup.tokens(col("text")), TextDedup.tokenHash60(_)).as("hs")))
      val sh = Staging.barrier(withHs.select(col("doc_id"),
        TextDedup.simhashFromHashes(col("hs"), SimhashBits).as("simhash")))
      TextDedup.simhashPairs(sh, "doc_id", "simhash", SimhashBits,
          bands = 4, maxDist = 3)
        .orderBy("id_a", "id_b")
    },
    oracle = {
      val terms = (0 until SimhashBits).map { b =>
        s"(CASE WHEN list_sum(list_transform(h, v -> CASE WHEN (v >> $b) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString(" + ")
      Some(
        s"""WITH toks AS (
           |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
           |  FROM documents),
           |hs AS (SELECT doc_id, list_transform(t, x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)) AS h FROM toks),
           |sim AS (SELECT doc_id, CAST($terms AS BIGINT) AS simhash FROM hs)
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS dist
           |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
           |ORDER BY id_a, id_b""".stripMargin)
    })

  private val SpanGram = 5

  /** Span-level (substring) duplication — the ExactSubstr modality: which
    * parts of each document are copied verbatim from elsewhere in the
    * corpus, not just which documents are near-duplicates. See
    * [[TextDedup.spanDuplication]] for the scale argument (gram-digest
    * aggregation, no pairwise join, no global sort). */
  val t27_span_dedup: Q = Q(
    run = (spark, dir) =>
      TextDedup.spanDuplication(tf(spark, dir, "documents"), "doc_id", "text",
          gram = SpanGram)
        .orderBy("doc_id"),
    oracle = Some(
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
         |  FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    CASE WHEN len(t) >= $SpanGram
         |      THEN [array_to_string(list_slice(t, i+1, i+$SpanGram), ' ') for i in range(len(t)-${SpanGram - 1})]
         |      ELSE [] END AS gs
         |  FROM toks),
         |ex AS (
         |  SELECT doc_id, unnest(range(len(gs))) AS pos, md5(unnest(gs)) AS gh
         |  FROM g),
         |dup AS (SELECT gh FROM ex GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
         |fl AS (SELECT doc_id, pos FROM ex WHERE gh IN (SELECT gh FROM dup)),
         |rn AS (
         |  SELECT doc_id, pos,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |  FROM fl),
         |r2 AS (SELECT doc_id, grp, count(*) AS run FROM rn GROUP BY 1, 2),
         |ra AS (
         |  SELECT doc_id, max(run) AS max_run,
         |    CAST(sum(run) AS BIGINT) AS dup_grams
         |  FROM r2 GROUP BY 1),
         |tot AS (SELECT doc_id, count(*) AS n_grams FROM ex GROUP BY 1)
         |SELECT d.doc_id,
         |  COALESCE(n_grams, 0) AS n_grams,
         |  COALESCE(dup_grams, 0) AS dup_grams,
         |  CASE WHEN COALESCE(n_grams, 0) = 0 THEN 0.0
         |       ELSE COALESCE(dup_grams, 0) * 1.0 / n_grams END AS dup_fraction,
         |  COALESCE(max_run + ${SpanGram - 1}, 0) AS max_dup_span_tokens
         |FROM documents d
         |LEFT JOIN tot USING (doc_id) LEFT JOIN ra USING (doc_id)
         |ORDER BY doc_id""".stripMargin),
    bench = true)

  /** True ExactSubstr span REMOVAL ([[TextDedup.spanDedup]]): where t27
    * only measures duplicated spans, this cuts every duplicated run
    * except its first (doc_id, start) occurrence and rebuilds the text —
    * Lee et al. 2022's actual transformation, composed from t27's
    * run-length spans and t48's reassembly. The oracle replays the
    * gram-df + run-length CTEs, the digest-sequence span keys, the
    * keep-first window and the positional removal, and the gate is
    * hash-exact on the rebuilt strings. */
  val t51_span_removal: Q = Q(
    run = (spark, dir) => smallShuffleFloor(spark, "64k")(
      TextDedup.spanDedup(tf(spark, dir, "documents"), "doc_id", "text",
          gram = SpanGram)
        .orderBy("doc_id")),
    oracle = Some(
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
         |  FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    CASE WHEN len(t) >= $SpanGram
         |      THEN [array_to_string(list_slice(t, i+1, i+$SpanGram), ' ') for i in range(len(t)-${SpanGram - 1})]
         |      ELSE [] END AS gs
         |  FROM toks),
         |ex AS (
         |  SELECT doc_id, unnest(range(len(gs))) AS pos, md5(unnest(gs)) AS gh
         |  FROM g),
         |dup AS (SELECT gh FROM ex GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
         |fl AS (SELECT doc_id, pos, gh FROM ex WHERE gh IN (SELECT gh FROM dup)),
         |rn AS (
         |  SELECT doc_id, pos, gh,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |  FROM fl),
         |spans AS (
         |  SELECT doc_id, min(pos) AS start,
         |    min(pos) + count(*) + ${SpanGram - 2} AS last,
         |    md5(string_agg(gh, '' ORDER BY pos)) AS sh
         |  FROM rn GROUP BY doc_id, grp),
         |firsts AS (
         |  SELECT sh, doc_id, start FROM (
         |    SELECT sh, doc_id, start,
         |      row_number() OVER (PARTITION BY sh ORDER BY doc_id, start) AS r
         |    FROM spans) WHERE r = 1),
         |removed AS (
         |  SELECT s.doc_id, s.start, s.last FROM spans s
         |  WHERE NOT EXISTS (SELECT 1 FROM firsts f
         |    WHERE f.sh = s.sh AND f.doc_id = s.doc_id AND f.start = s.start)),
         |rmpos AS (
         |  SELECT DISTINCT doc_id, pos FROM (
         |    SELECT doc_id, unnest(range(start, last + 1)) AS pos FROM removed)),
         |tokpos AS (
         |  SELECT doc_id, unnest(range(len(t))) AS pos, unnest(t) AS tok FROM toks),
         |kept AS (
         |  SELECT tp.doc_id, tp.pos, tp.tok FROM tokpos tp
         |  WHERE NOT EXISTS (SELECT 1 FROM rmpos r
         |    WHERE r.doc_id = tp.doc_id AND r.pos = tp.pos)),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_kept,
         |    string_agg(tok, ' ' ORDER BY pos) AS clean_text
         |  FROM kept GROUP BY doc_id)
         |SELECT tk.doc_id, len(tk.t) AS n_tokens,
         |  COALESCE(a.n_kept, 0) AS n_kept,
         |  COALESCE(a.clean_text, '') AS clean_text
         |FROM toks tk LEFT JOIN agg a USING (doc_id)
         |ORDER BY tk.doc_id""".stripMargin),
    bench = true)

  private val CosineThreshold = 0.45

  private val NearDupBits = 4
  private val NearDupBands = 16

  /** Gated on the scale-safe plan: banded sign-LSH candidates → exact
    * cosine verify. The quadratic all-pairs form
    * ([[VectorOps.cosineNearDupPairs]]) is the test-only recall baseline
    * (DedupSpec). */
  val t5_cosine_neardup: Q = Q(
    run = (spark, dir) =>
      VectorOps.bucketedNearDupPairs(
          t(spark, dir, "embeddings"), "vec_id", "embedding", CosineThreshold,
          bits = NearDupBits, bands = NearDupBands)
        .orderBy("id_a", "id_b"),
    oracle = {
      val bandSelects = (0 until NearDupBands).map { j =>
        val bkt = (0 until NearDupBits).map(i =>
          s"(CASE WHEN e[${j * NearDupBits + i + 1}] >= 0 THEN ${1 << i} ELSE 0 END)")
          .mkString(" + ")
        s"SELECT vec_id, $j AS band, $bkt AS bkt FROM n"
      }.mkString("\n  UNION ALL ")
      Some(
        s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
           |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
           |bands AS (
           |  $bandSelects),
           |cand AS (
           |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM bands a JOIN bands b
           |    ON a.band = b.band AND a.bkt = b.bkt AND a.vec_id < b.vec_id)
           |SELECT id_a, id_b,
           |  list_dot_product(x.e, y.e) / (x.nrm * y.nrm) AS cos
           |FROM cand JOIN n x ON x.vec_id = id_a JOIN n y ON y.vec_id = id_b
           |WHERE list_dot_product(x.e, y.e) / (x.nrm * y.nrm) >= $CosineThreshold
           |ORDER BY id_a, id_b""".stripMargin)
    })

  /** Near-dup clustering: t3's LSH pairs → connected components → one
    * survivor per cluster (the min-id member; `doc_id = cluster_id`).
    * The pair operators find EDGES; an actual corpus dedup keeps one doc
    * per transitive cluster — this is that resolution step. Oracle:
    * DuckDB `WITH RECURSIVE` min-label closure over the same pairs. */
  val t16_dedup_clusters: Q = Q(
    run = (spark, dir) => {
      val pairs = TextDedup.minhashLshPairs(t(spark, dir, "documents"),
          "doc_id", "text", n = 3, k = MinhashK, bandSize = BandSize,
          numBands = NumBands, threshold = JaccardThreshold)
        .select("id_a", "id_b")
      TextDedup.connectedComponents(pairs).orderBy("doc_id")
    },
    oracle = Some(
      s"""WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM (${t3_minhash_lsh_pairs.oracle.get})),
         |nodes AS (SELECT DISTINCT id FROM (
         |  SELECT id_a AS id FROM pairs UNION ALL SELECT id_b AS id FROM pairs)),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
         |reach AS (
         |  SELECT id, id AS lbl FROM nodes
         |  UNION
         |  SELECT e.dst AS id, r.lbl AS lbl FROM reach r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id)
         |SELECT comp.id AS doc_id, comp.cluster_id,
         |  CAST(cs.cluster_size AS BIGINT) AS cluster_size
         |FROM comp JOIN (SELECT cluster_id, COUNT(*) AS cluster_size
         |  FROM comp GROUP BY cluster_id) cs USING (cluster_id)
         |ORDER BY doc_id""".stripMargin))

  /** Leakage-safe train/val/test split ([[TextDedup.leakageSafeSplit]]):
    * the split is assigned per NEAR-DUP CLUSTER (t16's components;
    * singletons are their own cluster), so near-duplicates never
    * straddle the train/test boundary — the per-document hash split's
    * silent contamination leak, closed. 80/10/10 on the md5-prefix
    * bucket of the cluster id; oracle = the recursive-CTE closure plus
    * the same bucket arithmetic. */
  val t75_leakage_safe_split: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val pairs = TextDedup.minhashLshPairs(docs, "doc_id", "text",
          n = 3, k = MinhashK, bandSize = BandSize, numBands = NumBands,
          threshold = JaccardThreshold)
        .select("id_a", "id_b")
      TextDedup.leakageSafeSplit(docs, "doc_id",
          TextDedup.connectedComponents(pairs), trainPct = 80, valPct = 10)
        .orderBy("doc_id")
    },
    oracle = Some(
      s"""WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM (${t3_minhash_lsh_pairs.oracle.get})),
         |nodes AS (SELECT DISTINCT id FROM (
         |  SELECT id_a AS id FROM pairs UNION ALL SELECT id_b AS id FROM pairs)),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
         |reach AS (
         |  SELECT id, id AS lbl FROM nodes
         |  UNION
         |  SELECT e.dst AS id, r.lbl AS lbl FROM reach r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id),
         |assigned AS (SELECT d.doc_id, COALESCE(comp.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN comp ON comp.id = d.doc_id),
         |b AS (SELECT doc_id, cluster_id,
         |    CAST('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 AS bucket
         |  FROM assigned)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin))

  /** The composed corpus-dedup PIPELINE as one gated query: documents →
    * LSH pairs → connected components → survivors-only corpus (each
    * duplicate cluster contributes exactly its min-id doc; singletons
    * pass through). This is the end-to-end shape a user actually runs —
    * t3/t16 prove the stages, this proves the composition. Output is the
    * kept doc ids with token counts (a downstream-visible projection). */
  val t19_dedup_apply: Q = Q(
    run = (spark, dir) => {
      val docs = tf(spark, dir, "documents")
      val pairs = TextDedup.minhashLshPairs(docs, "doc_id", "text",
          n = 3, k = MinhashK, bandSize = BandSize, numBands = NumBands,
          threshold = JaccardThreshold)
        .select("id_a", "id_b")
      TextDedup.keepSurvivors(docs, "doc_id", TextDedup.connectedComponents(pairs))
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("ws_tokens"))
        .orderBy("doc_id")
    },
    oracle = Some(
      s"""WITH clusters AS (SELECT * FROM (${t16_dedup_clusters.oracle.get}))
         |SELECT d.doc_id,
         |  CAST(len(list_filter(string_split_regex(lower(trim(d.text)), '\\s+'), x -> x <> '')) AS BIGINT) AS ws_tokens
         |FROM documents d
         |WHERE NOT EXISTS (SELECT 1 FROM clusters c
         |  WHERE c.doc_id = d.doc_id AND c.doc_id <> c.cluster_id)
         |ORDER BY d.doc_id""".stripMargin),
    bench = true)

  /** SOFT dedup — duplicate-aware reweighting
    * ([[TextDedup.softDedupSample]], round 19): instead of hard
    * removal (t19's survivors), every near-dup cluster member keeps
    * sampling weight 1/n — the cluster contributes ONE expected
    * document with no privileged copy. Composes t16's connected
    * components with t64's integer-exact seedless Bernoulli
    * discipline (md5-prefix uint vs 2^64·1/n in HUGEINT /
    * DECIMAL(38,0) — hash-exact, retry-stable). Output: the KEPT
    * docs' annotations `(doc_id, cluster_id, cluster_size,
    * keep_prob_micro)`; the oracle replays closure + sizes + the same
    * HUGEINT predicate. */
  val t121_soft_dedup_sample: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val pairs = TextDedup.minhashLshPairs(docs, "doc_id", "text",
          n = 3, k = MinhashK, bandSize = BandSize, numBands = NumBands,
          threshold = JaccardThreshold)
        .select("id_a", "id_b")
      TextDedup.softDedupSample(docs, "doc_id",
          TextDedup.connectedComponents(pairs))
        .orderBy("doc_id")
    },
    oracle = Some(
      s"""WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM (${t3_minhash_lsh_pairs.oracle.get})),
         |nodes AS (SELECT DISTINCT id FROM (
         |  SELECT id_a AS id FROM pairs UNION ALL SELECT id_b AS id FROM pairs)),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
         |reach AS (
         |  SELECT id, id AS lbl FROM nodes
         |  UNION
         |  SELECT e.dst AS id, r.lbl AS lbl FROM reach r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id),
         |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n FROM comp GROUP BY cluster_id),
         |ann AS (SELECT d.doc_id,
         |    COALESCE(comp.cluster_id, d.doc_id) AS cluster_id,
         |    COALESCE(sz.n, 1) AS cluster_size
         |  FROM documents d LEFT JOIN comp ON comp.id = d.doc_id
         |  LEFT JOIN sz ON sz.cluster_id = comp.cluster_id)
         |SELECT doc_id, cluster_id,
         |  CAST(cluster_size AS BIGINT) AS cluster_size,
         |  CAST(1000000 // cluster_size AS BIGINT) AS keep_prob_micro
         |FROM ann
         |WHERE CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16) AS UBIGINT) AS HUGEINT)
         |    * cluster_size < CAST('18446744073709551616' AS HUGEINT)
         |ORDER BY doc_id""".stripMargin))

  /** The survivors-vs-reweighted corpus-size REPORT
    * ([[TextDedup.softDedupReport]]): one row comparing the full
    * corpus, hard dedup (exactly one doc per cluster) and the soft
    * sample (1/n expected) in documents and whitespace tokens — the
    * number a curation run reads before choosing a dedup policy. The
    * oracle replays closure + both predicates in one conditional
    * aggregation. */
  val t122_soft_dedup_report: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val pairs = TextDedup.minhashLshPairs(docs, "doc_id", "text",
          n = 3, k = MinhashK, bandSize = BandSize, numBands = NumBands,
          threshold = JaccardThreshold)
        .select("id_a", "id_b")
      TextDedup.softDedupReport(docs, "doc_id", "text",
        TextDedup.connectedComponents(pairs))
    },
    oracle = Some(
      s"""WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM (${t3_minhash_lsh_pairs.oracle.get})),
         |nodes AS (SELECT DISTINCT id FROM (
         |  SELECT id_a AS id FROM pairs UNION ALL SELECT id_b AS id FROM pairs)),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
         |reach AS (
         |  SELECT id, id AS lbl FROM nodes
         |  UNION
         |  SELECT e.dst AS id, r.lbl AS lbl FROM reach r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id),
         |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n FROM comp GROUP BY cluster_id),
         |ann AS (SELECT d.doc_id,
         |    CAST(len(list_filter(string_split_regex(lower(trim(d.text)), '\\s+'), x -> x <> '')) AS BIGINT) AS ws,
         |    COALESCE(comp.cluster_id, d.doc_id) AS cluster_id,
         |    COALESCE(sz.n, 1) AS cluster_size
         |  FROM documents d LEFT JOIN comp ON comp.id = d.doc_id
         |  LEFT JOIN sz ON sz.cluster_id = comp.cluster_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(ws) AS BIGINT) AS ws_tokens,
         |  CAST(sum(CASE WHEN cluster_id = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_hard_survivors,
         |  CAST(sum(CASE WHEN cluster_id = doc_id THEN ws ELSE 0 END) AS BIGINT) AS hard_ws_tokens,
         |  CAST(sum(CASE WHEN CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16) AS UBIGINT) AS HUGEINT)
         |      * cluster_size < CAST('18446744073709551616' AS HUGEINT)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_soft_kept,
         |  CAST(sum(CASE WHEN CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16) AS UBIGINT) AS HUGEINT)
         |      * cluster_size < CAST('18446744073709551616' AS HUGEINT)
         |    THEN ws ELSE 0 END) AS BIGINT) AS soft_ws_tokens
         |FROM ann""".stripMargin))

  /** Containment threshold for the decontamination gate — tuned to the
    * synthetic fixture (one fully-contained doc at 1.0 plus single-
    * shingle brushes at ~0.07–0.13); production pipelines run ~0.8 on
    * longer shingles, which only changes the constant. */
  private val DecontThreshold = 0.1
  private val EvalModulus = 37

  /** Train/eval decontamination: shingle containment of each pseudo-eval
    * doc (`doc_id % 37 = 0` stands in for a benchmark table) within every
    * train doc — the corpus-hygiene operator an LLM pipeline runs before
    * training. Bipartite hashed-shingle equi-join; see
    * [[TextDedup.decontaminate]]. */
  val t17_decontaminate: Q = Q(
    run = (spark, dir) => {
      val withSh = Staging.barrier(TextDedup.hashedShingles(
        t(spark, dir, "documents"), "doc_id", "text", 3))
      TextDedup.decontaminate(withSh, col("id") % EvalModulus === 0, DecontThreshold)
        .orderBy("train_id", "eval_id")
    },
    oracle = Some(
      s"""WITH $duckToksSh,
         |shf AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
         |ev AS (SELECT doc_id AS eval_id, len(s) AS n_e, unnest(s) AS shingle
         |  FROM shf WHERE doc_id % $EvalModulus = 0),
         |tr AS (SELECT doc_id AS train_id, unnest(s) AS shingle
         |  FROM shf WHERE doc_id % $EvalModulus <> 0),
         |ov AS (SELECT train_id, eval_id, n_e, count(*) AS overlap
         |  FROM tr JOIN ev USING (shingle) GROUP BY 1, 2, 3)
         |SELECT train_id, eval_id, CAST(overlap AS BIGINT) AS overlap,
         |  overlap * 1.0 / n_e AS containment
         |FROM ov WHERE overlap * 1.0 / n_e >= $DecontThreshold
         |ORDER BY train_id, eval_id""".stripMargin))

  /** Embedding-side near-dup clustering: the same connected-components
    * resolution over t5's cosine pairs — the clustering operator is
    * modality-agnostic (any (id_a, id_b) edge list), so text (t16) and
    * embedding corpora share one code path. */
  val t20_embedding_clusters: Q = Q(
    run = (spark, dir) => {
      val pairs = VectorOps.bucketedNearDupPairs(
          t(spark, dir, "embeddings"), "vec_id", "embedding", CosineThreshold,
          bits = NearDupBits, bands = NearDupBands)
        .select("id_a", "id_b")
      TextDedup.connectedComponents(pairs).orderBy("doc_id")
    },
    oracle = Some(
      s"""WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM (${t5_cosine_neardup.oracle.get})),
         |nodes AS (SELECT DISTINCT id FROM (
         |  SELECT id_a AS id FROM pairs UNION ALL SELECT id_b AS id FROM pairs)),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
         |reach AS (
         |  SELECT id, id AS lbl FROM nodes
         |  UNION
         |  SELECT e.dst AS id, r.lbl AS lbl FROM reach r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id)
         |SELECT comp.id AS doc_id, comp.cluster_id,
         |  CAST(cs.cluster_size AS BIGINT) AS cluster_size
         |FROM comp JOIN (SELECT cluster_id, COUNT(*) AS cluster_size
         |  FROM comp GROUP BY cluster_id) cs USING (cluster_id)
         |ORDER BY doc_id""".stripMargin))

  /** Embedding-side corpus prep as one gated query: t5's banded cosine
    * pairs → t20's connected components → survivors-only embedding corpus
    * — the embedding mirror of t19 (the same one-line [[TextDedup
    * .keepSurvivors]] composition), so BOTH modalities have an
    * end-to-end pipeline gate, not just their stage gates. Output is the
    * kept vec_ids with the vector dimension (a downstream-visible
    * projection that proves the corpus row survived intact). */
  val p2_embedding_prep: Q = Q(
    run = (spark, dir) => {
      val emb = t(spark, dir, "embeddings")
      val pairs = VectorOps.bucketedNearDupPairs(emb, "vec_id", "embedding",
          CosineThreshold, bits = NearDupBits, bands = NearDupBands)
        .select("id_a", "id_b")
      TextDedup.keepSurvivors(emb, "vec_id", TextDedup.connectedComponents(pairs))
        .select(col("vec_id"), size(col("embedding")).as("dim"))
        .orderBy("vec_id")
    },
    oracle = Some(
      s"""WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM (${t5_cosine_neardup.oracle.get})),
         |nodes AS (SELECT DISTINCT id FROM (
         |  SELECT id_a AS id FROM pairs UNION ALL SELECT id_b AS id FROM pairs)),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
         |reach AS (
         |  SELECT id, id AS lbl FROM nodes
         |  UNION
         |  SELECT e.dst AS id, r.lbl AS lbl FROM reach r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id)
         |SELECT emb.vec_id, CAST(len(emb.embedding) AS INT) AS dim
         |FROM embeddings emb
         |WHERE NOT EXISTS (SELECT 1 FROM comp c
         |  WHERE c.id = emb.vec_id AND c.id <> c.cluster_id)
         |ORDER BY emb.vec_id""".stripMargin))

  // ---------------------------------------------------------------------
  // Similarity search / text analysis / multimodal
  // ---------------------------------------------------------------------

  private val duckVecPrep =
    """v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v)""".stripMargin

  /** Metadata-FILTERED vector search: top-5 neighbors sharing the
    * query's `label` ([[VectorOps.filteredTopK]] — predicate inside the
    * join, non-matching vectors never scored). */
  val t25_filtered_ann: Q = Q(
    run = (spark, dir) => {
      val emb = t(spark, dir, "embeddings")
      VectorOps.filteredTopK(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", Seq("label"), k = 5)
        .orderBy("query_id", "rank")
    },
    oracle = Some(
      """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |n AS (SELECT vec_id, label, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |q AS (SELECT * FROM n WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.label AS label,
        |    list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos
        |  FROM q JOIN n c ON c.vec_id <> q.vec_id AND c.label = q.label),
        |ranked AS (SELECT *, row_number() OVER
        |  (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM scored)
        |SELECT query_id, neighbor_id, label, cos, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin))

  val t6_ann_topk: Q = Q(
    run = (spark, dir) => {
      val emb = tf(spark, dir, "embeddings")
      VectorOps.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    },
    oracle = Some(
      s"""WITH $duckVecPrep,
         |q AS (SELECT * FROM n WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos
         |  FROM q JOIN n c ON c.vec_id <> q.vec_id),
         |ranked AS (SELECT *, row_number() OVER
         |  (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM scored)
         |SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
    bench = true)

  private val NegBandTop = 50
  private val NegPerQuery = 5

  /** Contrastive pairs: top-5 positives + 5 hash-sampled hard negatives
    * from ranks (5, 50] per query — [[VectorOps.hardNegatives]]. */
  val t28_hard_negatives: Q = Q(
    run = (spark, dir) => {
      val emb = t(spark, dir, "embeddings")
      VectorOps.hardNegatives(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, m = NegBandTop, nNeg = NegPerQuery)
        .orderBy("query_id", "rank")
    },
    oracle = Some(
      s"""WITH $duckVecPrep,
         |q AS (SELECT * FROM n WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos
         |  FROM q JOIN n c ON c.vec_id <> q.vec_id),
         |ranked AS (SELECT *, row_number() OVER
         |  (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM scored),
         |b AS (SELECT * FROM ranked WHERE rank <= $NegBandTop),
         |pos AS (SELECT query_id, neighbor_id, cos, rank, 'pos' AS role
         |  FROM b WHERE rank <= 5),
         |neg AS (SELECT query_id, neighbor_id, cos, rank, 'neg' AS role
         |  FROM b WHERE rank > 5
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY md5(CAST(query_id AS VARCHAR) || ':' || CAST(neighbor_id AS VARCHAR)),
         |      neighbor_id) <= $NegPerQuery)
         |SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank, role
         |FROM (SELECT * FROM pos UNION ALL SELECT * FROM neg)
         |ORDER BY query_id, rank""".stripMargin))

  /** Per-source document quota — [[TextAnalysis.capPerGroup]]. */
  val t29_source_caps: Q = Q(
    run = (spark, dir) =>
      TextAnalysis.capPerGroup(t(spark, dir, "documents"), "source", "doc_id",
          cap = 10)
        .select("doc_id", "source")
        .orderBy("doc_id"),
    oracle = Some(
      """SELECT doc_id, source FROM documents
        |QUALIFY row_number() OVER (PARTITION BY source
        |  ORDER BY md5(source || ':' || CAST(doc_id AS VARCHAR)), doc_id) <= 10
        |ORDER BY doc_id""".stripMargin))

  /** Seeded corpus shuffle + round-robin shards —
    * [[TextAnalysis.shuffleShards]] (distributed rank, no global-order
    * window; the oracle IS the single global row_number). */
  val t31_corpus_shuffle: Q = Q(
    run = (spark, dir) =>
      TextAnalysis.shuffleShards(t(spark, dir, "documents"), "doc_id",
          seed = "s1", nShards = 8)
        .orderBy("doc_id"),
    oracle = Some(
      """WITH rk AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY md5('s1:' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS rank
        |  FROM documents)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank,
        |  CAST(rank % 8 AS INT) AS shard
        |FROM rk ORDER BY doc_id""".stripMargin))

  private val ChunkTokens = 8
  private val ChunkOverlap = 2

  /** Overlapping token-window chunking — [[TextAnalysis.chunkDocuments]]
    * (embedding/retrieval prep; chunks march by chunk−overlap). */
  val t30_chunk_documents: Q = Q(
    run = (spark, dir) =>
      TextAnalysis.chunkDocuments(tf(spark, dir, "documents"), "doc_id", "text",
          chunkTokens = ChunkTokens, overlap = ChunkOverlap)
        .orderBy("doc_id", "chunk_idx"),
    oracle = {
      val step = ChunkTokens - ChunkOverlap
      Some(
        s"""WITH toks AS (
           |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
           |  FROM documents),
           |st AS (
           |  SELECT doc_id, t, unnest(range(0, len(t), $step)) AS start
           |  FROM toks WHERE len(t) > 0)
           |SELECT doc_id, CAST(start // $step AS INT) AS chunk_idx,
           |  CAST(start AS INT) AS start_tok,
           |  CAST(LEAST($ChunkTokens, len(t) - start) AS INT) AS n_tok,
           |  array_to_string(list_slice(t, start + 1, start + $ChunkTokens), ' ') AS chunk_text
           |FROM st ORDER BY doc_id, chunk_idx""".stripMargin)
    },
    bench = true)

  /** Paragraph-level dedup + reassembly over non-overlapping
    * [[ChunkTokens]]-token chunks — see [[TextDedup.paragraphDedup]].
    * The oracle replays chunking, first-occurrence selection
    * (row_number over md5 groups ≡ Spark's min-struct), and ordered
    * string_agg reassembly. */
  val t48_paragraph_dedup: Q = Q(
    run = (spark, dir) =>
      TextDedup.paragraphDedup(tf(spark, dir, "documents"), "doc_id", "text",
          chunkTokens = ChunkTokens)
        .orderBy("doc_id"),
    oracle = Some(
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
         |  FROM documents),
         |st AS (
         |  SELECT doc_id, t, unnest(range(0, len(t), $ChunkTokens)) AS start
         |  FROM toks WHERE len(t) > 0),
         |ch AS (
         |  SELECT doc_id, CAST(start // $ChunkTokens AS INT) AS chunk_idx,
         |    array_to_string(list_slice(t, start + 1, start + $ChunkTokens), ' ') AS chunk_text
         |  FROM st),
         |k AS (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY md5(chunk_text) ORDER BY doc_id, chunk_idx) AS rn
         |  FROM ch)
         |SELECT doc_id, count(*) AS n_chunks,
         |  count(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
         |  coalesce(string_agg(CASE WHEN rn = 1 THEN chunk_text END, ' ' ORDER BY chunk_idx), '') AS clean_text
         |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    bench = true)

  /** FUZZY paragraph dedup ([[TextDedup.fuzzyParagraphDedup]]): t48's
    * exact-chunk rule widened to NEAR-duplicate chunks (CCNet) — the
    * whole t3 LSH stack at chunk granularity, t16's connected
    * components, t48's reassembly. The oracle replays chunking, the
    * banded minhash candidate join, exact-Jaccard verification, the
    * recursive-CTE min-label closure and ordered reassembly; the gate
    * is hash-exact on the rebuilt strings. */
  val t53_fuzzy_paragraph_dedup: Q = Q(
    run = (spark, dir) =>
      TextDedup.fuzzyParagraphDedup(tf(spark, dir, "documents"), "doc_id",
          "text", chunkTokens = ChunkTokens, n = 3, k = MinhashK,
          bandSize = BandSize, numBands = NumBands,
          threshold = JaccardThreshold)
        .orderBy("doc_id"),
    oracle = {
      val sigElems = (0 until MinhashK).map(i =>
        s"list_min(list_transform(s, x -> md5('$i:' || x)))").mkString(", ")
      val bandElems = (0 until NumBands).map(b =>
        s"md5(array_to_string(list_slice(sig, ${b * BandSize + 1}, ${(b + 1) * BandSize}), ','))")
        .mkString(", ")
      Some(
        s"""WITH RECURSIVE toks AS (
           |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
           |  FROM documents),
           |st AS (
           |  SELECT doc_id, t, unnest(range(0, len(t), $ChunkTokens)) AS start
           |  FROM toks WHERE len(t) > 0),
           |ch AS (
           |  SELECT doc_id, CAST(start // $ChunkTokens AS INT) AS chunk_idx,
           |    doc_id * ${TextDedup.ChunkIdStride} + (start // $ChunkTokens) AS cid,
           |    list_slice(t, start + 1, start + $ChunkTokens) AS ctoks,
           |    array_to_string(list_slice(t, start + 1, start + $ChunkTokens), ' ') AS chunk_text
           |  FROM st),
           |csh AS (
           |  SELECT cid,
           |    CASE WHEN len(ctoks) >= 3
           |      THEN list_distinct([array_to_string(list_slice(ctoks, i+1, i+3), ' ') for i in range(len(ctoks)-2)])
           |      ELSE [] END AS s
           |  FROM ch),
           |shf AS (SELECT cid, s FROM csh WHERE len(s) > 0),
           |sig AS (SELECT cid, s, [$sigElems] AS sig FROM shf),
           |bands AS (SELECT cid, [$bandElems] AS bands FROM sig),
           |bex AS (
           |  SELECT cid, r.range AS band_idx, bands[r.range + 1] AS bh
           |  FROM bands CROSS JOIN range($NumBands) r),
           |cand AS (
           |  SELECT DISTINCT a.cid AS id_a, b.cid AS id_b
           |  FROM bex a JOIN bex b
           |    ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.cid < b.cid),
           |pairs AS (
           |  SELECT id_a, id_b
           |  FROM cand JOIN shf sa ON sa.cid = id_a JOIN shf sb ON sb.cid = id_b
           |  WHERE len(list_intersect(sa.s, sb.s)) * 1.0
           |      / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= $JaccardThreshold),
           |nodes AS (SELECT DISTINCT id FROM (
           |  SELECT id_a AS id FROM pairs UNION ALL SELECT id_b AS id FROM pairs)),
           |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
           |reach AS (
           |  SELECT id, id AS lbl FROM nodes
           |  UNION
           |  SELECT e.dst AS id, r.lbl AS lbl FROM reach r JOIN edges e ON e.src = r.id),
           |comp AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id),
           |kk AS (
           |  SELECT ch.doc_id, ch.chunk_idx, ch.chunk_text,
           |    CASE WHEN comp.cluster_id IS NULL OR comp.cluster_id = ch.cid
           |      THEN 1 END AS keep
           |  FROM ch LEFT JOIN comp ON comp.id = ch.cid)
           |SELECT doc_id, count(*) AS n_chunks,
           |  count(CASE WHEN keep = 1 THEN 1 END) AS n_kept,
           |  coalesce(string_agg(CASE WHEN keep = 1 THEN chunk_text END, ' ' ORDER BY chunk_idx), '') AS clean_text
           |FROM kk GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    },
    bench = true)

  /** Gopher-rule quality filter vector — see [[TextAnalysis.gopherRules]].
    * All-rational comparisons; the oracle replays every rule on DuckDB's
    * list primitives. */
  val t49_gopher_rules: Q = Q(
    run = (spark, dir) =>
      TextAnalysis.gopherRules(tf(spark, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
    oracle = Some(
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_words,
         |    CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS total_len,
         |    CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS alpha_words,
         |    CAST(len(list_intersect(list_distinct(t), ['the','a','of','to','and','in'])) AS BIGINT) AS n_stop
         |  FROM toks WHERE len(t) > 0)
         |SELECT doc_id, n_words,
         |  (n_words >= 50 AND n_words <= 100000) AS r_word_count,
         |  (3 * n_words <= total_len AND total_len <= 10 * n_words) AS r_mean_word_len,
         |  (5 * alpha_words >= 4 * n_words) AS r_alpha_frac,
         |  (n_stop >= 2) AS r_stop_words,
         |  (n_words >= 50 AND n_words <= 100000
         |    AND 3 * n_words <= total_len AND total_len <= 10 * n_words
         |    AND 5 * alpha_words >= 4 * n_words AND n_stop >= 2) AS keep
         |FROM m ORDER BY doc_id""".stripMargin),
    bench = true)

  private val BucketedQueryBound = 100

  /** Sign-bucket ANN recall baseline with a BOUNDED query set (the
    * corpus-as-queries form is O(n²/2^bits) — quadratic in corpus size —
    * and lives on only as a small-corpus benchmark; the scale answers
    * are t12/t15). */
  val t7_ann_bucketed: Q = Q(
    run = (spark, dir) =>
      VectorOps.bucketedTopK(t(spark, dir, "embeddings"),
          "vec_id", "embedding", col("vec_id") < BucketedQueryBound,
          k = 5, bits = 8)
        .orderBy("query_id", "rank"),
    oracle = {
      val bkt = (0 until 8).map(i =>
        s"(CASE WHEN e[${i + 1}] >= 0 THEN ${1 << i} ELSE 0 END)").mkString(" + ")
      Some(
        s"""WITH $duckVecPrep,
           |b AS (SELECT vec_id, e, nrm, $bkt AS bkt FROM n),
           |scored AS (
           |  SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id,
           |    list_dot_product(a.e, c.e) / (a.nrm * c.nrm) AS cos
           |  FROM b a JOIN b c ON a.bkt = c.bkt AND a.vec_id <> c.vec_id
           |  WHERE a.vec_id < $BucketedQueryBound),
           |ranked AS (SELECT *, row_number() OVER
           |  (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM scored)
           |SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
           |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)
    })

  private val IvfClusters = 10
  private val IvfIters = 5
  private val IvfNprobe = 2
  // SemDeDup (t34) pair threshold: below t5's 0.45 so the within-cell
  // rule actually fires on the synthetic corpus (max pairwise cos ≈ 0.51)
  private val SemDedupThreshold = 0.40
  // declared here (before every use site) — a forward reference to an
  // uninitialized val would silently bake 0 into the oracle SQL
  private val Sq8Candidates = 20

  /** Shared CTE prefix replicating [[VectorOps.kmeansCentroids]] plus
    * cell assignment and the query-side probe list: the Lloyd loop
    * unrolls into chained CTEs (c0 → s1/a1/c1 → … → c_iters), possible
    * because every step is engine-portable — md5-ordered seeds,
    * bit-identical cosine scoring, exact decimal means. Yields CTEs
    * `corpus` (vec_id, e, nrm, cell) and `probed` (query_id, qv, qnrm,
    * cell ≤ nprobe). */
  private def kmeansCtePrefix(queryPredSql: String = "vec_id < 10",
      trainPredSql: Option[String] = None,
      dataPredSql: Option[String] = None,
      kSql: String = IvfClusters.toString,
      // leading CTE chain that DEFINES `v (vec_id, e)` — override to
      // train/search the same pipeline over a derived vector space
      // (t91 passes the random-projection chain)
      vCtesSql: String =
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)")
      : String = {
    // Frozen-quantizer variant (t50): seeds and Lloyd iterations read
    // only the TRAINING subset `tn`; assignment/coding/probing (sfin,
    // corpus, probed) always read the full corpus `n`. With no training
    // predicate the generated SQL is the historical full-corpus text.
    // Deleted-data variant (t56/t58): `dataPredSql` names the SURVIVING
    // vectors — coding/probing read only `dn` while training still reads
    // its own subset, replaying an index whose quantizers were trained
    // before a delete removed rows.
    val tn = if (trainPredSql.isDefined) "tn" else "n"
    val tnCte = trainPredSql
      .map(p => s"tn AS (SELECT * FROM n WHERE $p),\n").getOrElse("")
    val dn = if (dataPredSql.isDefined) "dn" else "n"
    val dnCte = dataPredSql
      .map(p => s"dn AS (SELECT * FROM n WHERE $p),\n").getOrElse("")
    val iterCtes = (1 to IvfIters).map { i =>
      s"""s$i AS (SELECT n.vec_id, n.e, c.label,
         |  list_dot_product(n.e, c.c) / (n.nrm * sqrt(list_dot_product(c.c, c.c))) AS cs
         |  FROM $tn n CROSS JOIN c${i - 1} c),
         |a$i AS (SELECT vec_id, e, label FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, label) AS rn
         |  FROM s$i) WHERE rn = 1),
         |ex$i AS (SELECT label, t.pos, e[t.pos + 1] AS val
         |  FROM a$i, unnest(range(len(e))) AS t(pos)),
         |c$i AS (SELECT label, array_agg(CAST(s AS DOUBLE) / cnt ORDER BY pos) AS c FROM (
         |  SELECT label, pos, SUM(CAST(val AS DECIMAL(27,12))) AS s, COUNT(*) AS cnt
         |  FROM ex$i GROUP BY 1, 2) GROUP BY label)""".stripMargin
    }.mkString(",\n")
    s"""WITH $vCtesSql,
       |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
       |$tnCte${dnCte}c0 AS (SELECT label, c FROM (
       |  SELECT e AS c,
       |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS label
       |  FROM $tn) WHERE label < $kSql),
       |$iterCtes,
       |cf AS (SELECT label, c, sqrt(list_dot_product(c, c)) AS cnrm FROM c$IvfIters),
       |sfin AS (SELECT n.vec_id, n.e, n.nrm, c.label,
       |  list_dot_product(n.e, c.c) / (n.nrm * c.cnrm) AS cs
       |  FROM $dn n CROSS JOIN cf c),
       |corpus AS (SELECT vec_id, e, nrm, label AS cell FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, label) AS rn
       |  FROM sfin) WHERE rn = 1),
       |probed AS (SELECT vec_id AS query_id, e AS qv, nrm AS qnrm, label AS cell FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, label) AS rn
       |  FROM sfin WHERE $queryPredSql) WHERE rn <= $IvfNprobe)""".stripMargin
  }

  private def kmeansIvfOracleSql: String = kmeansIvfOracleSqlOver()

  // None = kmeansCtePrefix's own default — the historical v-CTE text
  // lives in exactly ONE place, so it cannot drift between the two defs
  private def kmeansIvfOracleSqlOver(
      vCtesSql: Option[String] = None): String =
    s"""${vCtesSql.map(v => kmeansCtePrefix(vCtesSql = v))
        .getOrElse(kmeansCtePrefix())},
       |scored AS (SELECT p.query_id, c.vec_id AS neighbor_id,
       |  list_dot_product(p.qv, c.e) / (p.qnrm * c.nrm) AS cos
       |  FROM probed p JOIN corpus c ON c.cell = p.cell AND c.vec_id <> p.query_id),
       |ranked AS (SELECT *, row_number() OVER
       |  (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** IVF over TRAINED (k-means) centroids with multi-probe — the honest
    * unsupervised index (the label-quantizer variant remains as
    * [[VectorOps.ivfTopK]], exercised by DedupSpec). */
  val t12_ivf_ann: Q = Q(
    run = (spark, dir) =>
      VectorOps.kmeansIvfTopK(tf(spark, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") < 10, k = 5, kClusters = IvfClusters, iters = IvfIters,
          nprobe = IvfNprobe)
        .orderBy("query_id", "rank"),
    oracle = Some(kmeansIvfOracleSql),
    bench = true)

  /** The leading-CTE chain defining `v (vec_id, e)` as the RANDOM
    * PROJECTION of the embeddings — drops into [[kmeansCtePrefix]]'s
    * `vCtesSql` seam so the whole unrolled Lloyd/IVF oracle replays in
    * the projected space (projected lists built by `list(pr ORDER BY
    * j)` — collection, not float aggregation, so both engines fold the
    * same doubles). */
  private def duckProjVecCtes: String =
    s"""ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e0 FROM embeddings),
       |$duckProjSigns,
       |pj0 AS (SELECT vec_id, j, list_dot_product(e0, s) AS pr FROM ev CROSS JOIN sj),
       |v AS (SELECT vec_id, list(pr ORDER BY j) AS e FROM pj0 GROUP BY vec_id)""".stripMargin

  /** RP ∘ IVF — the composition t84's scaladoc promises as the 100 TB
    * scale path: PROJECT the corpus 64→16 dims (map-only), then train
    * the k-means coarse quantizer and search ENTIRELY in the projected
    * space — every Lloyd iteration, cell assignment and probe costs
    * inDim/outDim less arithmetic and shuffle width. Same operator
    * ([[VectorOps.kmeansIvfTopK]]) over the projected frame — the
    * composition is pure piping, nothing re-implemented — and the
    * oracle is the SAME unrolled k-means SQL with its vector prep
    * swapped to the projection chain (the vCtesSql seam). */
  val t91_rp_ivf_ann: Q = Q(
    run = (spark, dir) => {
      val proj = VectorOps.randomProjection(tf(spark, dir, "embeddings"),
        "vec_id", "embedding", RpInDim, RpOutDim)
      VectorOps.kmeansIvfTopK(proj, "id", "proj", col("id") < 10,
          k = 5, kClusters = IvfClusters, iters = IvfIters,
          nprobe = IvfNprobe)
        .orderBy("query_id", "rank")
    },
    oracle = Some(kmeansIvfOracleSqlOver(Some(duckProjVecCtes))),
    bench = true)

  /** ANN quality monitoring: recall@5 of the IVF index against the
    * brute-force truth, per query. Production ANN pipelines run exactly
    * this as a canary; here it also quantifies the nprobe=1 trade-off. */
  val t13_ann_recall: Q = Q(
    run = (spark, dir) => {
      val truth = t6_ann_topk.run(spark, dir)
        .select(col("query_id"), col("neighbor_id"))
      val ivf = t12_ivf_ann.run(spark, dir)
        .select(col("query_id"), col("neighbor_id"))
      truth.join(ivf, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
        .join(truth.groupBy("query_id").agg(count(lit(1)).as("k")), Seq("query_id"), "right")
        .select(col("query_id"),
          (coalesce(col("hits"), lit(0L)) * lit(1.0) / col("k")).as("recall"))
        .orderBy("query_id")
    },
    oracle = Some(
      s"""WITH truth AS (SELECT query_id, neighbor_id FROM (${t6_ann_topk.oracle.get})),
         |ivf AS (SELECT query_id, neighbor_id FROM (${t12_ivf_ann.oracle.get})),
         |hits AS (
         |  SELECT t.query_id, count(*) AS h
         |  FROM truth t JOIN ivf i
         |    ON i.query_id = t.query_id AND i.neighbor_id = t.neighbor_id
         |  GROUP BY t.query_id),
         |ks AS (SELECT query_id, count(*) AS k FROM truth GROUP BY query_id)
         |SELECT ks.query_id, COALESCE(h, 0) * 1.0 / k AS recall
         |FROM ks LEFT JOIN hits ON hits.query_id = ks.query_id
         |ORDER BY ks.query_id""".stripMargin))

  private def RpInDim = 64
  private def RpOutDim = 16

  /** The DuckDB twin of [[VectorOps.projectionSigns]]: per output
    * coordinate j, the ±1.0 list over input coordinates i from the
    * parity of md5("i:j")'s first hex digit — regenerated in SQL so
    * both engines project with the SAME matrix, no side channel. */
  private def duckProjSigns =
    s"""sj AS (
       |  SELECT j, [CASE WHEN CAST('0x' || substr(md5(i || ':' || j), 1, 1)
       |      AS BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END
       |    for i in range($RpInDim)] AS s
       |  FROM range($RpOutDim) t(j))""".stripMargin

  /** Random-projection dimensionality reduction
    * ([[VectorOps.randomProjection]]) — the Johnson–Lindenstrauss
    * scale path: shrink the embedding column 64→16 dims BEFORE index
    * build / pair generation, cutting every downstream shuffle and
    * scan 4×. Map-only (16 fused codegen dot products per row, zero
    * shuffles); the deterministic md5-seeded ±1 matrix makes the gate
    * exact — each projected coordinate is a left-to-right double fold
    * ≡ DuckDB `list_dot_product`, rounded per ROW to micro BIGINT
    * (the t32/t70 fixed-point discipline). */
  val t84_random_projection: Q = Q(
    run = (spark, dir) => {
      val emb = t(spark, dir, "embeddings")
      VectorOps.randomProjection(emb, "vec_id", "embedding", RpInDim, RpOutDim)
        .select(col("id").as("vec_id"), posexplode(col("proj")).as(Seq("j", "pr")))
        .select(col("vec_id"), col("j"),
          round(col("pr") * lit(1000000)).cast("bigint").as("p_micro"))
        .orderBy("vec_id", "j")
    },
    // bench the map-only projection kernel, not the gate's sort
    benchRun = Some((spark, dir) =>
      VectorOps.randomProjection(t(spark, dir, "embeddings"),
        "vec_id", "embedding", RpInDim, RpOutDim)),
    oracle = Some(
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |$duckProjSigns,
         |p AS (SELECT vec_id, j, list_dot_product(e, s) AS pr FROM v CROSS JOIN sj)
         |SELECT vec_id, CAST(j AS INT) AS j,
         |  CAST(round(pr * 1000000) AS BIGINT) AS p_micro
         |FROM p ORDER BY vec_id, j""".stripMargin),
    bench = true)

  private val RpCand = 250

  /** Recall@5 of the RP CANDIDATE-FILTER pipeline
    * ([[VectorOps.rpRerankTopK]]): score in the cheap 16-dim projected
    * space, keep the top-250 candidates per query, exact-re-rank only
    * those in the full 64-dim space — the production use of t84 (raw
    * projected-space top-5-of-5000 is near chance on an iid-ish corpus;
    * the JL guarantee buys candidate CONTAINMENT, not fine ranks, and
    * containment is what a re-rank converts to recall — 0.88 measured
    * at sf0.01). Same recall shape as t13 (IVF); every cosine on both
    * engines is a deterministic double fold over the SAME projected
    * lists (DuckDB rebuilds them via `list(pr ORDER BY j)` —
    * collection, not float aggregation), so ranks compare bit-for-bit
    * and recall is an exact small-integer division. */
  val t85_rp_rerank_recall: Q = Q(
    run = (spark, dir) => {
      val emb = t(spark, dir, "embeddings")
      val truth = t6_ann_topk.run(spark, dir)
        .select(col("query_id"), col("neighbor_id"))
      val rr = VectorOps.rpRerankTopK(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", RpInDim, RpOutDim, nCand = RpCand, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      truth.join(rr, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
        .join(truth.groupBy("query_id").agg(count(lit(1)).as("k")),
          Seq("query_id"), "right")
        .select(col("query_id"),
          (coalesce(col("hits"), lit(0L)) * lit(1.0) / col("k")).as("recall"))
        .orderBy("query_id")
    },
    oracle = Some(
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |$duckProjSigns,
         |pj AS (SELECT vec_id, j, list_dot_product(e, s) AS pr FROM v CROSS JOIN sj),
         |pv AS (SELECT vec_id, list(pr ORDER BY j) AS p FROM pj GROUP BY vec_id),
         |pn AS (SELECT vec_id, p, sqrt(list_dot_product(p, p)) AS nrm FROM pv),
         |pq AS (SELECT * FROM pn WHERE vec_id < 10),
         |pscored AS (
         |  SELECT pq.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    list_dot_product(pq.p, c.p) / (pq.nrm * c.nrm) AS cos
         |  FROM pq JOIN pn c ON c.vec_id <> pq.vec_id),
         |pranked AS (SELECT *, row_number() OVER
         |  (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM pscored),
         |cand AS (SELECT query_id, neighbor_id FROM pranked WHERE rank <= $RpCand),
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |rscored AS (
         |  SELECT cand.query_id, cand.neighbor_id,
         |    list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos
         |  FROM cand
         |  JOIN n c ON c.vec_id = cand.neighbor_id
         |  JOIN n q ON q.vec_id = cand.query_id),
         |rranked AS (SELECT *, row_number() OVER
         |  (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM rscored),
         |rr AS (SELECT query_id, neighbor_id FROM rranked WHERE rank <= 5),
         |truth AS (SELECT query_id, neighbor_id FROM (${t6_ann_topk.oracle.get})),
         |hits AS (
         |  SELECT t.query_id, count(*) AS h
         |  FROM truth t JOIN rr i
         |    ON i.query_id = t.query_id AND i.neighbor_id = t.neighbor_id
         |  GROUP BY t.query_id),
         |ks AS (SELECT query_id, count(*) AS k FROM truth GROUP BY query_id)
         |SELECT ks.query_id, COALESCE(h, 0) * 1.0 / k AS recall
         |FROM ks LEFT JOIN hits ON hits.query_id = ks.query_id
         |ORDER BY ks.query_id""".stripMargin))

  private val duckToks =
    """toks AS (
      |  SELECT doc_id, text,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS t
      |  FROM documents)""".stripMargin

  private def duckMarkerScore(markers: Seq[String]): String =
    s"CASE WHEN len(t) > 0 THEN len(list_filter(t, x -> x IN (" +
      markers.map(m => s"'$m'").mkString(", ") + s"))) * 1.0 / len(t) ELSE 0.0 END"

  val t8_langid: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val toks = TextDedup.tokens(col("text"))
      val scores = TextAnalysis.langScores(toks)
      docs.select(Seq(col("doc_id"),
          TextAnalysis.langId(col("text")).as("detected_lang")) ++
          scores.map { case (l, c) => c.as(s"s_$l") }: _*)
        .orderBy("doc_id")
    },
    oracle = {
      val langs = TextAnalysis.LangMarkers
      val scoreCols = langs.map { case (l, ms) => s"${duckMarkerScore(ms)} AS s_$l" }
      val m = s"greatest(${langs.map("s_" + _._1).mkString(", ")})"
      val pick = langs.map { case (l, _) =>
        s"WHEN s_$l = $m AND s_$l > 0 THEN '$l'" }.mkString(" ")
      Some(
        s"""WITH $duckToks,
           |sc AS (SELECT doc_id, text, ${scoreCols.mkString(",\n  ")} FROM toks)
           |SELECT doc_id,
           |  CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
           |       $pick ELSE 'und' END AS detected_lang,
           |  ${langs.map("s_" + _._1).mkString(", ")}
           |FROM sc ORDER BY doc_id""".stripMargin)
    })

  val t9_quality_score: Q = Q(
    run = (spark, dir) => {
      // stage the token array ONCE: five component columns plus the
      // composite each embed the tokenizer inside interpreted lambda
      // bodies (no subexpression elimination there — the langId lesson),
      // so an unstaged spelling tokenizes ~10× per row
      val toks = Staging.barrier(tf(spark, dir, "documents")
        .select(col("doc_id"), col("text"),
          TextDedup.tokens(col("text")).as("t")))
      val comps = TextAnalysis.qualityComponentsFrom(col("text"), col("t"))
      toks.select(col("doc_id") +:
          comps.map { case (n, c) => c.as(n) } :+
          TextAnalysis.qualityScoreFrom(col("text"), col("t")).as("quality"): _*)
        .orderBy("doc_id")
    },
    oracle = {
      val allMarkers = TextAnalysis.LangMarkers.flatMap(_._2)
      Some(
        s"""WITH $duckToks,
           |c AS (SELECT doc_id,
           |  CAST(len(t) AS BIGINT) AS n_tokens,
           |  CASE WHEN len(t) > 0 THEN list_sum(list_transform(t, x -> length(x))) * 1.0 / len(t) ELSE 0.0 END AS mean_token_len,
           |  CASE WHEN length(text) > 0 THEN length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / length(text) ELSE 0.0 END AS punct_ratio,
           |  ${duckMarkerScore(allMarkers)} AS stopword_ratio
           |FROM toks)
           |SELECT doc_id, n_tokens, mean_token_len, punct_ratio, stopword_ratio,
           |  CAST((CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 0.25 ELSE 0.0 END)
           |  + (CASE WHEN mean_token_len BETWEEN 3.0 AND 12.0 THEN 0.25 ELSE 0.0 END)
           |  + (CASE WHEN punct_ratio < 0.1 THEN 0.25 ELSE 0.0 END)
           |  + (CASE WHEN stopword_ratio > 0.01 THEN 0.25 ELSE 0.0 END) AS DOUBLE) AS quality
           |FROM c ORDER BY doc_id""".stripMargin)
    },
    bench = true)

  val t10_token_counts: Q = Q(
    run = (spark, dir) =>
      t(spark, dir, "documents").select(
          col("doc_id"),
          length(col("text")).cast("bigint").as("n_chars"),
          TextAnalysis.tokenCount(col("text")).as("ws_tokens"),
          TextAnalysis.bpeishCount(col("text")).as("bpeish_tokens"))
        .orderBy("doc_id"),
    oracle = Some(
      s"""SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS BIGINT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(lower(text), '${TextAnalysis.BpeishPattern}')) AS BIGINT) AS bpeish_tokens
         |FROM documents ORDER BY doc_id""".stripMargin))

  /** The normalized text is STAGED behind a barrier before the gram
    * transform (the shingleSets pattern): feeding `lower(trim(text))`
    * straight into [[TextAnalysis.fingerprintFromNorm]]'s lambda makes
    * Catalyst re-evaluate the normalization per character 5-gram —
    * O(L²) per document (see the fingerprintFromNorm scaladoc). */
  private def fingerprintFrame(spark: SparkSession, dir: String): DataFrame = {
    val staged = Staging.barrier(tf(spark, dir, "documents")
      .select(col("doc_id"), lower(trim(col("text"))).as("norm")))
    staged.select(col("doc_id"),
      TextAnalysis.fingerprintFromNorm(col("norm")).as("fingerprint"))
  }

  /** Gopher-style repetition filters over the corpus (top-bigram
    * fraction + duplicate-trigram fraction; see
    * [[TextAnalysis.repetitionScores]]). */
  val t21_repetition: Q = Q(
    run = (spark, dir) =>
      TextAnalysis.repetitionScores(t(spark, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
    oracle = Some(
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |big AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 2
        |    THEN [array_to_string(list_slice(t, i+1, i+2), ' ') for i in range(len(t)-1)]
        |    ELSE [] END) AS g FROM toks),
        |bc AS (SELECT doc_id, g, count(*) AS c FROM big GROUP BY 1, 2),
        |ba AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS top_bigram_frac FROM bc GROUP BY 1),
        |trg AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 3
        |    THEN [array_to_string(list_slice(t, i+1, i+3), ' ') for i in range(len(t)-2)]
        |    ELSE [] END) AS g FROM toks),
        |tc AS (SELECT doc_id, g, count(*) AS c FROM trg GROUP BY 1, 2),
        |ta AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0 / sum(c) AS dup_trigram_frac FROM tc GROUP BY 1)
        |SELECT d.doc_id,
        |  COALESCE(ba.top_bigram_frac, 0.0) AS top_bigram_frac,
        |  COALESCE(ta.dup_trigram_frac, 0.0) AS dup_trigram_frac
        |FROM documents d
        |LEFT JOIN ba ON ba.doc_id = d.doc_id
        |LEFT JOIN ta ON ta.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin))

  /** PII redaction gate. The corpus is synthetic word-soup with no real
    * PII, so the fixture INJECTS deterministic PII derived from doc_id
    * (an email + a phone per doc) and the gate verifies that Spark's
    * java.util.regex and DuckDB's RE2 agree on detection counts AND the
    * md5 of the fully redacted text — the cross-engine contract a
    * production redaction pass relies on. */
  val t22_redact_pii: Q = Q(
    run = (spark, dir) => {
      val injected = concat(lower(col("text")),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or call 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      t(spark, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.piiEmailCount(injected).as("n_emails"),
          TextAnalysis.piiPhoneCount(injected).as("n_phones"),
          md5(TextAnalysis.redactPii(injected)).as("redacted_md5"))
        .orderBy("doc_id")
    },
    oracle = {
      val e = TextAnalysis.EmailPattern
      val p = TextAnalysis.PhonePattern
      Some(
        s"""WITH inj AS (
           |  SELECT doc_id, lower(text) || ' contact user' || CAST(doc_id AS VARCHAR)
           |    || '@example.com or call 555-'
           |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
           |  FROM documents)
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(t, '$e')) AS BIGINT) AS n_emails,
           |  CAST(len(regexp_extract_all(t, '$p')) AS BIGINT) AS n_phones,
           |  md5(regexp_replace(regexp_replace(t, '$e', '<email>', 'g'),
           |    '$p', '<phone>', 'g')) AS redacted_md5
           |FROM inj ORDER BY doc_id""".stripMargin)
    })

  /** GPT-style sequence packing as a relation: concatenate docs in id
    * order, chop into 512-token sequences; each doc's stream offset and
    * starting sequence id ([[TextAnalysis.packSequences]] — distributed
    * prefix-sum, no global window). */
  val t23_pack_sequences: Q = Q(
    run = (spark, dir) =>
      TextAnalysis.packSequences(t(spark, dir, "documents"), "doc_id", "text",
          capacity = 512)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
    oracle = Some(
      """WITH n AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
        |  FROM n)
        |SELECT doc_id, n_tokens, CAST(start_offset AS BIGINT) AS start_offset,
        |  CAST(FLOOR(start_offset / 512) AS BIGINT) AS seq_id
        |FROM o ORDER BY doc_id""".stripMargin))

  /** Keyword extraction: per-doc top-5 rarity-weighted terms
    * ([[TextAnalysis.topTermsByRarity]]; exact-rational score so the
    * differential can hash it). */
  val t24_top_terms: Q = Q(
    run = (spark, dir) =>
      TextAnalysis.topTermsByRarity(t(spark, dir, "documents"), "doc_id", "text",
          k = 5)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "rank"),
    oracle = Some(
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(t) AS term FROM toks) GROUP BY 1, 2),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |scored AS (SELECT doc_id, term, tf, df, tf * 1.0 / df AS score
        |  FROM tf JOIN dfreq USING (term)),
        |ranked AS (SELECT *, CAST(row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, term) AS INT) AS rank
        |  FROM scored)
        |SELECT doc_id, rank, term, tf, df, score FROM ranked WHERE rank <= 5
        |ORDER BY doc_id, rank""".stripMargin))

  /** Unigram-LM quality filter (see [[TextAnalysis.lmQuality]]): the
    * oracle retrains the identical LM in SQL — same tokenizer, same
    * deterministic top-`LmVocab` cut, same integer micro-logprob
    * fixed-pointing — so the comparison is hash-exact despite the
    * transcendental scoring. */
  val t32_lm_quality: Q = Q(
    run = (spark, dir) =>
      TextAnalysis.lmQuality(tf(spark, dir, "documents"), "doc_id", "text",
          vocab = LmVocab)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
    oracle = Some(
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         |  FROM documents),
         |counts AS (SELECT w, count(*) AS cnt FROM toks GROUP BY w),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts),
         |lm AS (SELECT w, CAST(round(log10(cnt * 1.0 / (SELECT total FROM tot)) * 1000000) AS BIGINT) AS lp
         |  FROM counts ORDER BY cnt DESC, w LIMIT $LmVocab),
         |oov AS (SELECT CAST(round(log10(0.5 / total) * 1000000) AS BIGINT) AS lp FROM tot),
         |scored AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(SUM(COALESCE(lm.lp, (SELECT lp FROM oov))) AS BIGINT) AS sum_lp_micro
         |  FROM toks t LEFT JOIN lm ON lm.w = t.w GROUP BY t.doc_id)
         |SELECT d.doc_id, COALESCE(s.n_tokens, 0) AS n_tokens,
         |  COALESCE(s.sum_lp_micro, 0) AS sum_lp_micro,
         |  CASE WHEN s.n_tokens > 0
         |       THEN s.sum_lp_micro * 1.0 / s.n_tokens / 1000000.0 END AS avg_logprob
         |FROM documents d LEFT JOIN scored s USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin),
    bench = true)

  val t11_fingerprint: Q = Q(
    run = (spark, dir) => fingerprintFrame(spark, dir).orderBy("doc_id"),
    benchRun = Some((spark, dir) => fingerprintFrame(spark, dir)),
    bench = true,
    oracle = Some(
      """SELECT doc_id,
        |  CASE WHEN length(lower(trim(text))) >= 5 THEN
        |    array_to_string(list_slice(list_sort(
        |      [md5(substr(lower(trim(text)), i+1, 5)) for i in range(length(lower(trim(text))) - 4)]
        |    ), 1, 4), '')
        |  ELSE NULL END AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin))

  /**
   * Stratified deterministic downsampling — the selection half of a data
   * pipeline: per-language median quality threshold → (lang, high/low)
   * strata → per-stratum keep rates decided by an md5 hash of the doc id.
   *
   * The threshold is the DETERMINISTIC percentile (the value at row
   * ⌈n/2⌉ in (quality, doc_id) order — percentile_disc with a total
   * tie-break), which is engine-exact and therefore oracle-able where
   * `approx_percentile`'s sketch is not; at 100 TB swap in
   * `approx_percentile(quality, 0.5)` for the threshold subplan (the
   * per-lang sort is the only part that doesn't scale) and keep the
   * hash-mod sampling, which is map-side, seedless, and reproducible
   * across engines, runs, AND retries — the property `sample()` lacks.
   */
  val t18_stratified_sample: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      // one row per doc with its stratum keys; staged because it feeds
      // the rank window, the threshold lookup, and the final sample
      val scored = Staging.barrier(docs.select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang"),
        TextAnalysis.qualityScore(col("text")).as("quality")))
      val wRank = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("quality", "doc_id")
      val wN = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      val thr = scored
        .withColumn("rn", row_number().over(wRank))
        .withColumn("n", count(lit(1)).over(wN))
        .filter(col("rn") === ceil(col("n") * 0.5))
        .select(col("lang"), col("quality").as("thr"))
      val hm = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast(LongType) % 100
      scored.join(broadcast(thr), Seq("lang"))
        .withColumn("bucket",
          when(col("quality") >= col("thr"), "high").otherwise("low"))
        .filter((col("bucket") === "high" && hm < 50) ||
          (col("bucket") === "low" && hm < 20))
        .select("doc_id", "lang", "quality", "bucket")
        .orderBy("doc_id")
    },
    oracle = {
      val langs = TextAnalysis.LangMarkers
      val scoreCols = langs.map { case (l, ms) => s"${duckMarkerScore(ms)} AS s_$l" }
      val m = s"greatest(${langs.map("s_" + _._1).mkString(", ")})"
      val pick = langs.map { case (l, _) =>
        s"WHEN s_$l = $m AND s_$l > 0 THEN '$l'" }.mkString(" ")
      val allMarkers = langs.flatMap(_._2)
      Some(
        s"""WITH $duckToks,
           |sc AS (SELECT doc_id, text, ${scoreCols.mkString(",\n  ")} FROM toks),
           |lang AS (SELECT doc_id,
           |  CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
           |       $pick ELSE 'und' END AS lang
           |FROM sc),
           |c AS (SELECT doc_id,
           |  CAST(len(t) AS BIGINT) AS n_tokens,
           |  CASE WHEN len(t) > 0 THEN list_sum(list_transform(t, x -> length(x))) * 1.0 / len(t) ELSE 0.0 END AS mean_token_len,
           |  CASE WHEN length(text) > 0 THEN length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / length(text) ELSE 0.0 END AS punct_ratio,
           |  ${duckMarkerScore(allMarkers)} AS stopword_ratio
           |FROM toks),
           |q AS (SELECT doc_id,
           |  CAST((CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 0.25 ELSE 0.0 END)
           |  + (CASE WHEN mean_token_len BETWEEN 3.0 AND 12.0 THEN 0.25 ELSE 0.0 END)
           |  + (CASE WHEN punct_ratio < 0.1 THEN 0.25 ELSE 0.0 END)
           |  + (CASE WHEN stopword_ratio > 0.01 THEN 0.25 ELSE 0.0 END) AS DOUBLE) AS quality
           |FROM c),
           |lq AS (SELECT lang.doc_id, lang.lang, q.quality
           |  FROM lang JOIN q ON q.doc_id = lang.doc_id),
           |ranked AS (SELECT *,
           |  row_number() OVER (PARTITION BY lang ORDER BY quality, doc_id) AS rn,
           |  count(*) OVER (PARTITION BY lang) AS n FROM lq),
           |thr AS (SELECT lang, quality AS thr FROM ranked WHERE rn = CEIL(n * 0.5)),
           |b AS (SELECT lq.doc_id, lq.lang, lq.quality,
           |  CASE WHEN lq.quality >= thr.thr THEN 'high' ELSE 'low' END AS bucket,
           |  CAST('0x' || substr(md5(CAST(lq.doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 AS hm
           |FROM lq JOIN thr ON thr.lang = lq.lang)
           |SELECT doc_id, lang, quality, bucket FROM b
           |WHERE (bucket = 'high' AND hm < 50) OR (bucket = 'low' AND hm < 20)
           |ORDER BY doc_id""".stripMargin)
    })

  /**
   * The WHOLE training-corpus prep pipeline as one gated query — what a
   * user of this library actually runs before training: exact-dedup
   * survivors ∩ near-dup cluster survivors (LSH → connected components)
   * ∩ not-contaminated (shingle containment vs the eval split) ∩ not an
   * eval doc ∩ stratified-sample keeps (per-lang median quality strata,
   * md5-mod rates). Every stage is independently gated (t1, t16, t17,
   * t18); this query gates their COMPOSITION. All predicates evaluate
   * against the full corpus (thresholds are corpus-wide, then filters
   * intersect), so stage order cannot change the result.
   */
  /** The composed corpus-prep pipeline (exact-dedup ∩ near-dup-cluster
    * survivors ∩ not-contaminated ∩ stratified keeps) — shared by the
    * gated query (+ oracle-stability ORDER BY) and the bench (without). */
  private def p1Frame(spark: SparkSession, dir: String): DataFrame = {
      val docs = tf(spark, dir, "documents")
      // ONE corpus shingle pass, shared by near-dup LSH and
      // decontamination (both are 3-gram consumers); the staged frame
      // carries 64-bit shingle ids + band digests, never strings
      val withSh = Staging.barrier(TextDedup.shingleLshFrame(
        docs, "doc_id", "text", 3, MinhashK, BandSize, NumBands))
      // near-dup clusters over the full corpus
      val pairs = TextDedup.minhashLshPairsFromFrame(withSh, JaccardThreshold)
        .select("id_a", "id_b")
      val clusters = TextDedup.connectedComponents(pairs)
      // exact-dup survivors (one keep_id per identical text)
      val exactKeep = TextDedup.exactDedup(docs, "doc_id", "text")
        .select(col("keep_id"))
      // contaminated train docs (shingle containment vs the eval split)
      val contaminated = TextDedup
        .decontaminate(withSh, col("id") % EvalModulus === 0, DecontThreshold)
        .select(col("train_id")).distinct()
      // stratum assignment on corpus-wide thresholds (the t18 subplan)
      val scored = Staging.barrier(docs.select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang"),
        TextAnalysis.qualityScore(col("text")).as("quality")))
      val thr = scored
        .withColumn("rn", row_number().over(org.apache.spark.sql.expressions
          .Window.partitionBy("lang").orderBy("quality", "doc_id")))
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("lang")))
        .filter(col("rn") === ceil(col("n") * 0.5))
        .select(col("lang"), col("quality").as("thr"))
      val hm = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast(LongType) % 100
      scored.join(broadcast(thr), Seq("lang"))
        .withColumn("bucket",
          when(col("quality") >= col("thr"), "high").otherwise("low"))
        .filter((col("bucket") === "high" && hm < 50) ||
          (col("bucket") === "low" && hm < 20))
        .filter(col("doc_id") % EvalModulus =!= 0)
        .join(exactKeep, col("doc_id") === col("keep_id"), "left_semi")
        .join(clusters.filter(col("doc_id") =!= col("cluster_id"))
          .select(col("doc_id").as("nd_drop")),
          col("doc_id") === col("nd_drop"), "left_anti")
        .join(contaminated, col("doc_id") === col("train_id"), "left_anti")
        .select("doc_id", "lang", "quality", "bucket")
  }

  val p1_corpus_prep: Q = Q(
    run = (spark, dir) =>
      smallShuffleFloor(spark, "64k")(p1Frame(spark, dir).orderBy("doc_id")),
    benchRun = Some((spark, dir) =>
      smallShuffleFloor(spark, "64k")(p1Frame(spark, dir))),
    bench = true,
    oracle = {
      val langs = TextAnalysis.LangMarkers
      val scoreCols = langs.map { case (l, ms) => s"${duckMarkerScore(ms)} AS s_$l" }
      val m = s"greatest(${langs.map("s_" + _._1).mkString(", ")})"
      val pick = langs.map { case (l, _) =>
        s"WHEN s_$l = $m AND s_$l > 0 THEN '$l'" }.mkString(" ")
      val allMarkers = langs.flatMap(_._2)
      Some(
        s"""WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM (${t3_minhash_lsh_pairs.oracle.get})),
           |nodes AS (SELECT DISTINCT id FROM (
           |  SELECT id_a AS id FROM pairs UNION ALL SELECT id_b AS id FROM pairs)),
           |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
           |reach AS (
           |  SELECT id, id AS lbl FROM nodes
           |  UNION
           |  SELECT e.dst AS id, r.lbl AS lbl FROM reach r JOIN edges e ON e.src = r.id),
           |comp AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id),
           |exact_keep AS (SELECT MIN(doc_id) AS keep_id FROM documents GROUP BY md5(text)),
           |$duckToksSh,
           |shf AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
           |ev AS (SELECT doc_id AS eval_id, len(s) AS n_e, unnest(s) AS shingle
           |  FROM shf WHERE doc_id % $EvalModulus = 0),
           |tr AS (SELECT doc_id AS train_id, unnest(s) AS shingle
           |  FROM shf WHERE doc_id % $EvalModulus <> 0),
           |contaminated AS (SELECT DISTINCT train_id FROM (
           |  SELECT train_id, eval_id, n_e, count(*) AS overlap
           |  FROM tr JOIN ev USING (shingle) GROUP BY 1, 2, 3)
           |  WHERE overlap * 1.0 / n_e >= $DecontThreshold),
           |toksq AS (
           |  SELECT doc_id, text, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
           |  FROM documents),
           |sc AS (SELECT doc_id, text, ${scoreCols.mkString(",\n  ")} FROM toksq),
           |lang AS (SELECT doc_id,
           |  CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
           |       $pick ELSE 'und' END AS lang
           |FROM sc),
           |c AS (SELECT doc_id,
           |  CAST(len(t) AS BIGINT) AS n_tokens,
           |  CASE WHEN len(t) > 0 THEN list_sum(list_transform(t, x -> length(x))) * 1.0 / len(t) ELSE 0.0 END AS mean_token_len,
           |  CASE WHEN length(text) > 0 THEN length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / length(text) ELSE 0.0 END AS punct_ratio,
           |  ${duckMarkerScore(allMarkers)} AS stopword_ratio
           |FROM toksq),
           |q AS (SELECT doc_id,
           |  CAST((CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 0.25 ELSE 0.0 END)
           |  + (CASE WHEN mean_token_len BETWEEN 3.0 AND 12.0 THEN 0.25 ELSE 0.0 END)
           |  + (CASE WHEN punct_ratio < 0.1 THEN 0.25 ELSE 0.0 END)
           |  + (CASE WHEN stopword_ratio > 0.01 THEN 0.25 ELSE 0.0 END) AS DOUBLE) AS quality
           |FROM c),
           |lq AS (SELECT lang.doc_id, lang.lang, q.quality
           |  FROM lang JOIN q ON q.doc_id = lang.doc_id),
           |ranked AS (SELECT *,
           |  row_number() OVER (PARTITION BY lang ORDER BY quality, doc_id) AS rn,
           |  count(*) OVER (PARTITION BY lang) AS n FROM lq),
           |thr AS (SELECT lang, quality AS thr FROM ranked WHERE rn = CEIL(n * 0.5)),
           |b AS (SELECT lq.doc_id, lq.lang, lq.quality,
           |  CASE WHEN lq.quality >= thr.thr THEN 'high' ELSE 'low' END AS bucket,
           |  CAST('0x' || substr(md5(CAST(lq.doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 AS hm
           |FROM lq JOIN thr ON thr.lang = lq.lang)
           |SELECT doc_id, lang, quality, bucket FROM b
           |WHERE ((bucket = 'high' AND hm < 50) OR (bucket = 'low' AND hm < 20))
           |  AND doc_id % $EvalModulus <> 0
           |  AND doc_id IN (SELECT keep_id FROM exact_keep)
           |  AND NOT EXISTS (SELECT 1 FROM comp WHERE comp.id = b.doc_id
           |    AND comp.id <> comp.cluster_id)
           |  AND NOT EXISTS (SELECT 1 FROM contaminated t WHERE t.train_id = b.doc_id)
           |ORDER BY doc_id""".stripMargin)
    })

  val m1_multimodal_features: Q = Q(
    run = (spark, dir) =>
      Multimodal.features(spark, t(spark, dir, "documents")).orderBy("asset_id"),
    oracle = {
      val fs = (0 until 4).map(k =>
        s"CAST('0x' || substr(md5(text), ${k * 8 + 1}, 8) AS BIGINT) / 4294967296.0 AS f$k")
      Some(
        s"""SELECT doc_id AS asset_id,
           |  ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
           |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           |  substr(lower(hex(encode(text))), 1, 8) AS magic,
           |  CAST(64 + (doc_id % 8) * 16 AS INT) AS width,
           |  CAST(64 + (doc_id % 6) * 16 AS INT) AS height,
           |  ${fs.mkString(",\n  ")}
           |FROM documents ORDER BY asset_id""".stripMargin)
    })

  /** Frame SAMPLING over real containers — "every 3rd frame of each
    * video" via [[Multimodal.mp4FrameIndex]]'s genuine ISO-BMFF box
    * walk over the [[mp4ContainerHex]] planted layout. Round 18: this
    * retires the legacy fixed-stride byte-slicing gate entirely (the
    * verdict's last stub-shaped query) — sampling IS the stride
    * parameter of the real sample-table parse, so m2 and m4 now pin
    * the SAME parser at two strides and the headerless
    * [[Multimodal.frameSample]] cut stays spec-covered as the RAW
    * payload path. */
  val m2_frame_sample: Q = Q(
    run = (spark, dir) =>
      Multimodal.mp4FrameIndex(
          t(spark, dir, "documents")
            .select(col("doc_id").as("asset_id"),
              unhex(mp4ContainerHex(col("doc_id"))).as("payload")),
          stride = 3)
        .orderBy("asset_id", "frame_idx"),
    oracle = Some(duckMp4Sql(stride = 3)))

  /** REAL container-header parsing ([[Multimodal.pngDimensions]] /
    * [[Multimodal.jpegDimensions]]): per document a VALID container is
    * synthesized byte-for-byte to the actual format spec — PNG
    * signature + IHDR (even ids) or JPEG SOI + real APP0/JFIF + a
    * variable-length COM segment + a 0–3-byte 0xFF FILL run (T.81
    * §B.1.1.2, varying by id — round 15) + SOF0 (odd ids, COM length
    * varying by id so the marker WALK lands at a different offset per
    * row) — and the parsers must recover the planted dimensions
    * through the genuine layout (big-endian fields, self-counting
    * segment lengths, fill-byte skipping). The oracle computes the
    * planted values arithmetically:
    * round-tripping the real byte layout IS the parse check. Together
    * with m2/m4's ISO-BMFF sample-table walk (re-gated through the
    * real parser in round 18) this retires the "container parse is a
    * stub" seam for every format; only PIXEL decode remains
    * environment-blocked (no codec libraries in the sandbox). */
  val m3_container_headers: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val w = lit(64) + (col("doc_id") % 8).cast("int") * 16
      val h = lit(48) + (col("doc_id") % 6).cast("int") * 16
      val comN = (col("doc_id") % 5).cast("int") + 3
      val pngHex = concat(lit("89504e470d0a1a0a0000000d49484452"),
        lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"), lit("0806000000"))
      val fillN = (col("doc_id") % 4).cast("int")
      val jpegHex = concat(lit("ffd8" + "ffe00010" + "4a46494600" + "00" * 9),
        lit("fffe"), lpad(hex(comN + 2), 4, "0"),
        substring(lit("0" * 20), lit(1), comN * 2),
        substring(lit("ff" * 3), lit(1), fillN * 2),
        lit("ffc0000b08"), lpad(hex(h), 4, "0"), lpad(hex(w), 4, "0"),
        lit("01011100" + "ffd9"))
      val even = col("doc_id") % 2 === 0
      val payload = unhex(when(even, pngHex).otherwise(jpegHex))
      docs.select(col("doc_id").as("asset_id"),
          when(even, "png").otherwise("jpeg").as("fmt"),
          when(even, Multimodal.pngDimensions(payload))
            .otherwise(Multimodal.jpegDimensions(payload)).as("d"))
        .select(col("asset_id"), col("fmt"), col("d.valid").as("valid"),
          col("d.width").as("width"), col("d.height").as("height"))
        .orderBy("asset_id")
    },
    oracle = Some(
      s"""SELECT doc_id AS asset_id,
         |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
         |  TRUE AS valid,
         |  CAST(64 + (doc_id % 8) * 16 AS INT) AS width,
         |  CAST(48 + (doc_id % 6) * 16 AS INT) AS height
         |FROM documents ORDER BY asset_id""".stripMargin))

  /** REAL MP4 frame-index parsing ([[Multimodal.mp4FrameIndex]]) —
    * the verdict's last non-blocked seam (the m2 fixed-stride stub)
    * retired the m3 way: per document a VALID minimal ISO-BMFF file
    * is synthesized byte-for-byte (`ftyp`, an id-varying `free` box
    * so every moov sits at a different offset, `moov/mvhd/trak/mdia/
    * mdhd/minf/stbl` with real `stts` run pairs, an id-varying `stsz`
    * size table and `stco`, then `mdat` with deterministic frame
    * bytes), and the parser must recover frame count, timescale,
    * duration, and every 2nd frame's timestamp/offset/size through
    * the genuine box walk — the frame md5 is computed by SLICING the
    * payload at the PARSED offsets, so the oracle's closed-form
    * content hash proves the offset arithmetic end to end. */
  /** A VALID minimal ISO-BMFF file synthesized byte-for-byte per doc
    * id, as a hex Column: `ftyp`, an id-varying `free` box (every moov
    * at a different offset), `moov/mvhd/trak/mdia/mdhd/hdlr(vide)/
    * minf/stbl` with real `stts` run pairs, an id-varying `stsz` size
    * table and single-chunk `stco`, then `mdat` with deterministic
    * frame bytes. Shared by m4 (stride 2) and m2 (stride 3) so both
    * gates replay ONE planted layout; the oracle arithmetic lives in
    * [[duckMp4Sql]]. The hdlr box (33 bytes, handler `vide`) is part
    * of the layout since round 18's fail-closed track validation. */
  private def mp4ContainerHex(id: Column): Column = {
    val n = lit(4L) + id % 5L
    val freeN = id % 7L
    val tscale = lit(1000L) + (id % 3L) * 500L
    val delta2 = lit(512L) + (id % 2L) * 256L
    val dur = lit(512L) + (n - 2L) * delta2
    def h32(c: Column) = lpad(hex(c), 8, "0")
    def sizeOf(i: Column) = lit(16L) + ((id + i) % 4L) * 8L
    val sizesHex = array_join(transform(sequence(lit(0L), n - 1L),
      i => lpad(hex(sizeOf(i)), 8, "0")), "")
    val framesHex = array_join(transform(sequence(lit(0L), n - 1L),
      i => repeat(lpad(lower(hex((id * 7L + i * 13L) % 256L)), 2, "0"),
        40).substr(lit(1), (sizeOf(i) * 2L).cast("int"))), "")
    val mdatBytes = aggregate(sequence(lit(0L), n - 1L), lit(0L),
      (acc, i) => acc + sizeOf(i))
    val stcoBase = lit(317L) + freeN + lit(4L) * n
    concat(
      lit("00000010" + "66747970" + "69736f6d" + "00000000"),
      h32(lit(8L) + freeN), lit("66726565"),
      substring(lit("00" * 6), lit(1), (freeN * 2L).cast("int")),
      h32(lit(285L) + lit(4L) * n), lit("6d6f6f76"),
      lit("0000006c" + "6d766864" + "00000000" + "00000000" +
        "00000000"), h32(tscale), h32(dur), lit("00" * 80),
      h32(lit(169L) + lit(4L) * n), lit("7472616b"),
      h32(lit(161L) + lit(4L) * n), lit("6d646961"),
      lit("00000020" + "6d646864" + "00000000" + "00000000" +
        "00000000"), h32(tscale), h32(dur), lit("55c40000"),
      lit("00000021" + "68646c72" + "00000000" + "00000000" +
        "76696465" + "00" * 12 + "00"),
      h32(lit(88L) + lit(4L) * n), lit("6d696e66"),
      h32(lit(80L) + lit(4L) * n), lit("7374626c"),
      lit("00000020" + "73747473" + "00000000" + "00000002"),
      h32(lit(2L)), h32(lit(256L)), h32(n - 2L), h32(delta2),
      h32(lit(20L) + lit(4L) * n), lit("7374737a" + "00000000" +
        "00000000"), h32(n), sizesHex,
      lit("00000014" + "7374636f" + "00000000" + "00000001"),
      h32(stcoBase),
      h32(lit(8L) + mdatBytes), lit("6d646174"), framesHex)
  }

  /** The DuckDB replay of [[mp4ContainerHex]]'s planted layout at the
    * given sampling stride — closed-form per (id, frame): run-pair
    * timestamps, size-table prefix sums from the stco base
    * (317 + freeN + 4n since the hdlr joined the layout), and the
    * content hash of the planted frame bytes. */
  private def duckMp4Sql(stride: Int): String =
    s"""WITH p AS (SELECT doc_id AS id, 4 + doc_id % 5 AS n,
       |    doc_id % 7 AS freeN, 1000 + (doc_id % 3) * 500 AS tscale,
       |    512 + (doc_id % 2) * 256 AS delta2 FROM documents),
       |f AS (SELECT id, n, tscale, delta2,
       |    512 + (n - 2) * delta2 AS dur,
       |    317 + freeN + 4 * n AS base,
       |    unnest(range(0, CAST(n AS BIGINT), $stride)) AS i FROM p)
       |SELECT id AS asset_id, CAST(n AS BIGINT) AS n_frames,
       |  CAST(tscale AS BIGINT) AS timescale, CAST(dur AS BIGINT) AS duration,
       |  CAST(i // $stride AS INT) AS sample_idx, CAST(i AS BIGINT) AS frame_idx,
       |  CAST(CASE WHEN i < 2 THEN i * 256
       |       ELSE 512 + (i - 2) * delta2 END AS BIGINT) AS ts_units,
       |  CAST(base + COALESCE(list_sum(
       |    [16 + ((id + j) % 4) * 8 for j in range(i)]), 0) AS BIGINT) AS offset,
       |  CAST(16 + ((id + i) % 4) * 8 AS BIGINT) AS size,
       |  md5(repeat(lpad(lower(hex((id * 7 + i * 13) % 256)), 2, '0'),
       |    CAST(16 + ((id + i) % 4) * 8 AS INT))) AS frame_md5
       |FROM f ORDER BY asset_id, frame_idx""".stripMargin

  val m4_mp4_frame_index: Q = Q(
    run = (spark, dir) =>
      Multimodal.mp4FrameIndex(
          t(spark, dir, "documents")
            .select(col("doc_id").as("asset_id"),
              unhex(mp4ContainerHex(col("doc_id"))).as("payload")),
          stride = 2)
        .orderBy("asset_id", "frame_idx"),
    oracle = Some(duckMp4Sql(stride = 2)))

  // ---------------------------------------------------------------------
  // Event-stream analytics (batch equivalents of the streaming surface;
  // streaming execution itself is exercised in StreamingSpec)
  // ---------------------------------------------------------------------

  val w1_windowed_agg: Q = Q(
    run = (spark, dir) => {
      val ev = eventsWithTs(spark, dir)
      ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("value").cast(DecimalType(18, 6))), 2).cast(DoubleType).as("sum_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value"), col("min_value"), col("max_value"))
        .orderBy("window_start", "event_type")
    },
    oracle = Some(
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value,
        |  MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    bench = true)

  val w2_sessionization: Q = Q(
    run = (spark, dir) => {
      val ev = eventsWithTs(spark, dir)
        .withColumn("us", unix_micros(col("ts").cast(TimestampType)))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("us", "event_id")
      ev.withColumn("prev", lag("us", 1).over(w))
        .withColumn("new_s",
          when(col("prev").isNull ||
            col("us") - col("prev") > graft.streaming.StreamingIngest.SessionGapMicros, 1L)
            .otherwise(0L))
        .groupBy("user_id").agg(sum("new_s").as("n_sessions"))
        .orderBy("user_id")
    },
    oracle = Some(
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         |g AS (SELECT user_id,
         |  us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS d FROM e)
         |SELECT user_id,
         |  CAST(SUM(CASE WHEN d IS NULL OR d > ${graft.streaming.StreamingIngest.SessionGapMicros} THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
         |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin))

  val w4_session_window: Q = Q(
    run = (spark, dir) =>
      graft.streaming.StreamingIngest
        .sessionWindowAgg(eventsWithTs(spark, dir), "30 minutes")
        .orderBy("user_id", "session_start"),
    oracle = Some(
      s"""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
         |g AS (SELECT user_id, ts, event_id,
         |  CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |            > ${graft.streaming.StreamingIngest.SessionGapMicros}
         |       THEN 1 ELSE 0 END AS new_s FROM e),
         |s AS (SELECT user_id, ts,
         |  SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS UNBOUNDED PRECEDING) AS sid FROM g)
         |SELECT user_id, MIN(ts) AS session_start,
         |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
         |  CAST(COUNT(*) AS BIGINT) AS n_events
         |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin))

  /** w3's at-scale twin: HLL++ `approx_count_distinct`. Exact
    * countDistinct shuffles one row per distinct (event_type, user) —
    * fine here, unbounded at 100 TB; the sketch twin shuffles one
    * fixed-size mergeable HLL buffer per partition per group. Guarded by
    * QueriesSpec: the estimate must land within the configured rsd band
    * of the exact w3 answer on the corpus (the t18
    * approx-vs-deterministic twin pattern). */
  def w3ApproxDistinct(spark: SparkSession, dir: String,
      rsd: Double = 0.05): DataFrame =
    eventsWithTs(spark, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_distinct_users"),
        count(lit(1)).as("n"))

  val w3_distinct_users: Q = Q(
    run = (spark, dir) =>
      eventsWithTs(spark, dir)
        .groupBy("event_type")
        .agg(countDistinct("user_id").as("distinct_users"), count(lit(1)).as("n"))
        .orderBy("event_type"),
    oracle = Some(
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Composed IVF+SQ8 index: trained cells bound WHICH vectors a query
    * touches, 8-bit codes bound the BYTES per touched vector, exact
    * re-rank bounds the error. The oracle is the kmeans CTE prefix
    * composed with the SQ8 quantize/decode CTEs — both replicas already
    * proven exact independently (t12, t14). */
  /** IVF+SQ8 oracle CTE chain through `ranked` (per-query exact-cosine
    * re-rank of the SQ8 candidate cut), parameterized by the probe
    * predicate and candidate width — shared by t15 (top-5, all probe
    * queries) and t47 (the persisted hybrid's single-query vector
    * list). */
  private def ivfSq8OracleCtes(queryPredSql: String = "vec_id < 10",
      candidates: Int = Sq8Candidates,
      trainPredSql: Option[String] = None,
      dataPredSql: Option[String] = None): String =
    s"""${kmeansCtePrefix(queryPredSql, trainPredSql, dataPredSql)},
       |ex0 AS (SELECT vec_id, t.pos, e[t.pos + 1] AS val
       |  FROM v, unnest(range(len(e))) AS t(pos)),
       |st AS (SELECT pos, min(val) AS lo, max(val) AS hi FROM ex0
       |  ${trainPredSql.map(p => s"WHERE $p ").getOrElse("")}GROUP BY pos),
       |qvs AS (SELECT ex0.vec_id, ex0.pos, st.lo, st.hi,
       |    CASE WHEN st.hi = st.lo THEN 0
       |         ELSE greatest(0, least(255,
       |           CAST(floor((ex0.val - st.lo) / (st.hi - st.lo) * 255) AS INTEGER))) END AS qv
       |  FROM ex0 JOIN st ON st.pos = ex0.pos),
       |dec AS (SELECT vec_id,
       |    array_agg(lo + qv * ((hi - lo) / 255.0) ORDER BY pos) AS d
       |  FROM qvs GROUP BY vec_id),
       |qsq AS (SELECT p.query_id, p.qnrm, p.cell, d.d AS qd
       |  FROM probed p JOIN dec d ON d.vec_id = p.query_id),
       |cscored AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |    list_dot_product(cd.d, q.qd) / (c.nrm * q.qnrm) AS qscore
       |  FROM qsq q JOIN corpus c ON c.cell = q.cell AND c.vec_id <> q.query_id
       |  JOIN dec cd ON cd.vec_id = c.vec_id),
       |cand AS (SELECT query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY qscore DESC, neighbor_id) AS rn FROM cscored) WHERE rn <= $candidates),
       |rescored AS (SELECT cand.query_id, cand.neighbor_id,
       |    list_dot_product(a.e, b.e) / (a.nrm * b.nrm) AS cos
       |  FROM cand JOIN n a ON a.vec_id = cand.query_id
       |             JOIN n b ON b.vec_id = cand.neighbor_id),
       |ranked AS (SELECT *, row_number() OVER
       |  (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM rescored)""".stripMargin

  val t15_ivf_sq8_ann: Q = Q(
    run = (spark, dir) =>
      VectorOps.ivfSq8TopK(tf(spark, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") < 10, k = 5, kClusters = IvfClusters, iters = IvfIters,
          nprobe = IvfNprobe, candidates = Sq8Candidates)
        .orderBy("query_id", "rank"),
    oracle = Some(
      s"""${ivfSq8OracleCtes()}
         |SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
    bench = true)

  private val PqM = 8
  private val PqKsub = 16
  private val PqIters = 2
  private val PqCandidates = 50

  /** PQ-ADC oracle: per-subspace L2 Lloyd (same seeding/decimal-mean
    * recipe as the coarse k-means CTEs), dense code renumbering, corpus
    * coding, per-query ADC lookup tables, estimated-cosine candidate
    * cut, exact re-rank — every float expression tree mirrors the Spark
    * side operator-for-operator. */
  private def pqOracleSql(trainPredSql: Option[String] = None,
      dataPredSql: Option[String] = None): String = {
    // Survivor-restriction variant (t60/t61): training reads the train
    // subset, but coding (cd), query LUTs (ql) and query norms (qn) read
    // only surviving ids — merge-on-read deletes keep the stored codes
    // of survivors (coding is a deterministic per-row map), so deleting
    // D from build(X) must equal coding X∖D under frozen quantizers(X).
    val dataAnd = dataPredSql.map(p => s" AND ($p)").getOrElse("")
    val subLen = 64 / PqM
    val perSub = (0 until PqM).map { si =>
      val off = si * subLen
      // Frozen-codebook variant (t55): seeding and Lloyd read only the
      // training subset; coding (cd) and query LUTs (ql) read all.
      val tsub = if (trainPredSql.isDefined) s"tsub$si" else s"sub$si"
      val tsubCte = trainPredSql.map(p =>
        s"tsub$si AS MATERIALIZED (SELECT * FROM sub$si WHERE $p),\n")
        .getOrElse("")
      val train = (1 to PqIters).map { j =>
        s"""ps${si}_$j AS MATERIALIZED (SELECT t.vec_id, t.s, c.code,
           |  (list_dot_product(c.c, c.c) - 2.0 * list_dot_product(t.s, c.c)) AS d2
           |  FROM $tsub t CROSS JOIN pc${si}_${j - 1} c),
           |pa${si}_$j AS MATERIALIZED (SELECT vec_id, s, code FROM (
           |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, code) AS rn
           |  FROM ps${si}_$j) WHERE rn = 1),
           |px${si}_$j AS MATERIALIZED (SELECT code, t.pos, s[t.pos + 1] AS val
           |  FROM pa${si}_$j, unnest(range(len(s))) AS t(pos)),
           |pc${si}_$j AS MATERIALIZED (SELECT code, array_agg(CAST(sm AS DOUBLE) / cnt ORDER BY pos) AS c FROM (
           |  SELECT code, pos, SUM(CAST(val AS DECIMAL(27,12))) AS sm, COUNT(*) AS cnt
           |  FROM px${si}_$j GROUP BY 1, 2) GROUP BY code)""".stripMargin
      }.mkString(",\n")
      s"""sub$si AS MATERIALIZED (SELECT vec_id, e[${off + 1}:${off + subLen}] AS s FROM n),
         |${tsubCte}pc${si}_0 AS MATERIALIZED (SELECT code, c FROM (
         |  SELECT s AS c,
         |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS code
         |  FROM $tsub) WHERE code < $PqKsub),
         |$train,
         |pf$si AS MATERIALIZED (SELECT row_number() OVER (ORDER BY code) - 1 AS code, c
         |  FROM pc${si}_$PqIters),
         |cd$si AS MATERIALIZED (SELECT vec_id, code FROM (
         |  SELECT t.vec_id, c.code, row_number() OVER (PARTITION BY t.vec_id ORDER BY
         |    (list_dot_product(c.c, c.c) - 2.0 * list_dot_product(t.s, c.c)), c.code) AS rn
         |  FROM sub$si t CROSS JOIN pf$si c) WHERE rn = 1$dataAnd),
         |ql$si AS MATERIALIZED (SELECT t.vec_id AS query_id, c.code, list_dot_product(t.s, c.c) AS lv
         |  FROM sub$si t CROSS JOIN pf$si c WHERE t.vec_id < 10$dataAnd)""".stripMargin
    }.mkString(",\n")
    val estExpr = (1 until PqM).foldLeft("l0.lv") { (acc, i) => s"($acc + l$i.lv)" }
    val lutJoins = (0 until PqM).map(i =>
      s"JOIN ql$i l$i ON l$i.query_id = q.query_id AND l$i.code = t.k$i").mkString("\n  ")
    val codeJoin = (1 until PqM).map(i => s"JOIN cd$i USING (vec_id)").mkString(" ")
    val codeCols = (0 until PqM).map(i => s"cd$i.code AS k$i").mkString(", ")
    s"""WITH v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |n AS MATERIALIZED (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
       |$perSub,
       |codes AS MATERIALIZED (SELECT cd0.vec_id, $codeCols FROM cd0 $codeJoin),
       |qn AS MATERIALIZED (SELECT vec_id AS query_id, nrm AS qnrm FROM n WHERE vec_id < 10$dataAnd),
       |cscored AS MATERIALIZED (SELECT q.query_id, t.vec_id AS neighbor_id,
       |    ($estExpr / (nn.nrm * q.qnrm)) AS qscore
       |  FROM qn q
       |  JOIN codes t ON t.vec_id <> q.query_id
       |  JOIN n nn ON nn.vec_id = t.vec_id
       |  $lutJoins),
       |cand AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY qscore DESC, neighbor_id) AS rn FROM cscored) WHERE rn <= $PqCandidates),
       |rescored AS MATERIALIZED (SELECT cand.query_id, cand.neighbor_id,
       |    list_dot_product(a.e, b.e) / (a.nrm * b.nrm) AS cos
       |  FROM cand JOIN n a ON a.vec_id = cand.query_id
       |             JOIN n b ON b.vec_id = cand.neighbor_id),
       |ranked AS MATERIALIZED (SELECT *, row_number() OVER
       |  (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM rescored)
       |SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** PQ-ADC ANN ([[VectorOps.pqTopK]]): product-quantized codes (m bytes
    * per vector — the memory tier below SQ8) scored by asymmetric
    * distance computation against per-query lookup tables, exact cosine
    * re-rank on top. The oracle replays codebook training, coding, ADC
    * and re-rank in SQL, so the gate is hash-exact end-to-end — the PQ
    * approximation is pinned, not sampled. */
  val t43_pq_ann: Q = Q(
    run = (spark, dir) =>
      VectorOps.pqTopK(tf(spark, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") < 10, k = 5, m = PqM, ksub = PqKsub,
          iters = PqIters, candidates = PqCandidates)
        .orderBy("query_id", "rank"),
    oracle = Some(pqOracleSql()),
    bench = true)

  /** Persisted PQ index ([[VectorOps.writePqIndex]] →
    * [[VectorOps.loadPqIndex]] → [[VectorOps.pqTopKFromIndex]]): the
    * t40 build-once/probe-many production shape one memory tier down —
    * codebooks and the coded corpus round-trip through catalog tables,
    * and the probe shares [[VectorOps.pqTopK]]'s code path, so the gate
    * (t43's oracle, hash-exact) proves persistence loses nothing. */
  val t45_pq_index_persist: Q = Q(
    run = (spark, dir) => {
      val table = "graft_pq_index"
      VectorOps.writePqIndex(t(spark, dir, "embeddings"), "vec_id",
        "embedding", table, m = PqM, ksub = PqKsub, iters = PqIters)
      val idx = VectorOps.loadPqIndex(spark, table)
      VectorOps.pqTopKFromIndex(idx, col("id") < 10, k = 5,
          candidates = PqCandidates)
        .orderBy("query_id", "rank")
    },
    oracle = t43_pq_ann.oracle)

  /** Persisted-index ANN: build the IVF+SQ8 index ONCE as catalog tables
    * ([[VectorOps.writeIndex]] — cell-bucketed coded corpus + centroid/
    * stats metadata), then LOAD and probe ([[VectorOps.loadIndex]] →
    * [[VectorOps.ivfSq8TopKFromIndex]]). Everything persisted round-trips
    * exactly, and the probe pipeline is shared code with t15's in-query
    * build, so the loaded path is gated on t15's ORACLE VERBATIM —
    * build-once-probe-many must be invisible to results. The production
    * rationale: t12/t15 retrain inside every query; a pipeline amortizes
    * one build (and its one bucketing shuffle) across every probe. */
  val t40_ann_index_persist: Q = Q(
    run = (spark, dir) => {
      val table = "graft_ann_index"
      VectorOps.writeIndex(t(spark, dir, "embeddings"), "vec_id", "embedding",
        table, kClusters = IvfClusters, iters = IvfIters, numBuckets = 8)
      val idx = VectorOps.loadIndex(spark, table)
      VectorOps.ivfSq8TopKFromIndex(idx, col("id") < 10, k = 5,
          nprobe = IvfNprobe, candidates = Sq8Candidates)
        .orderBy("query_id", "rank")
    },
    oracle = t15_ivf_sq8_ann.oracle)

  /** Deterministic build/append corpus split for the incremental-index
    * family (t50/t54/t55): ids ≢ 0 (mod 3) are the initial build, the
    * rest arrive as the appended batch. Mirrored verbatim in the
    * oracles' training predicates. */
  private val AppendTrainSql = "vec_id % 3 <> 0"

  /** Incremental ANN index maintenance ([[VectorOps.appendToIndex]]):
    * the IVF+SQ8 index is built on two thirds of the corpus, the
    * remaining third is APPENDED against the frozen centroids/SQ8 stats
    * (no retrain, no index rewrite — the batch is coded and routed to
    * its cell buckets, FAISS `IndexIVF.add` semantics), and the probe
    * runs over the combined index. The oracle retrains nothing either:
    * its k-means/stats CTEs read only the training subset while coding
    * and probing read the full corpus — so the gate proves
    * probe(build(A) + append(B)) ≡ probe(build(A∪B) | quantizers(A))
    * value-exactly, the production ingest contract. */
  val t50_ann_index_append: Q = Q(
    run = (spark, dir) => {
      val table = "graft_ann_append"
      val emb = t(spark, dir, "embeddings")
      VectorOps.writeIndex(emb.filter(col("vec_id") % 3 =!= 0), "vec_id",
        "embedding", table, kClusters = IvfClusters, iters = IvfIters,
        numBuckets = 8)
      VectorOps.appendToIndex(emb.filter(col("vec_id") % 3 === 0),
        "vec_id", "embedding", table, numBuckets = 8)
      val idx = VectorOps.loadIndex(spark, table)
      VectorOps.ivfSq8TopKFromIndex(idx, col("id") < 10, k = 5,
          nprobe = IvfNprobe, candidates = Sq8Candidates)
        .orderBy("query_id", "rank")
    },
    oracle = Some(
      s"""${ivfSq8OracleCtes(trainPredSql = Some(AppendTrainSql))}
         |SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin))

  /** Incremental PQ index maintenance ([[VectorOps.appendToPqIndex]]):
    * same contract as t50 one memory tier down — codebooks train on the
    * build subset and FREEZE; the appended batch is only coded. Gated
    * on the PQ oracle with training restricted to the build subset. */
  val t55_pq_index_append: Q = Q(
    run = (spark, dir) => {
      val table = "graft_pq_append"
      val emb = t(spark, dir, "embeddings")
      VectorOps.writePqIndex(emb.filter(col("vec_id") % 3 =!= 0), "vec_id",
        "embedding", table, m = PqM, ksub = PqKsub, iters = PqIters)
      VectorOps.appendToPqIndex(emb.filter(col("vec_id") % 3 === 0),
        "vec_id", "embedding", table)
      val idx = VectorOps.loadPqIndex(spark, table)
      VectorOps.pqTopKFromIndex(idx, col("id") < 10, k = 5,
          candidates = PqCandidates)
        .orderBy("query_id", "rank")
    },
    oracle = Some(pqOracleSql(Some(AppendTrainSql))))

  /** Deterministic delete set for the index-delete/compact family
    * (t56–t59): ids ≡ 2 (mod 5) are deleted. Chosen coprime to the
    * append family's mod-3 split so lifecycle gates (t58/t59) delete
    * across BOTH the build and the appended batch. */
  private val DeleteSurvivorSql = "vec_id % 5 <> 2"

  /** Index DELETE ([[VectorOps.deleteFromIndex]]): the index is built
    * on the full corpus, then ids ≡ 2 (mod 5) are tombstoned — parquet
    * files are immutable, so the delete is merge-on-read (a tiny side
    * table every probe anti-joins, the Iceberg-v2 equality-delete
    * shape; FAISS `remove_ids` semantics for the quantizers: centroids
    * and SQ8 stats are frozen build artifacts and do NOT refresh). The
    * oracle trains on the FULL corpus but codes/probes only survivors,
    * so the gate proves probe(build(X) − delete(D)) ≡
    * probe(X∖D | quantizers(X)) value-exactly. */
  val t56_ann_index_delete: Q = Q(
    run = (spark, dir) => {
      val table = "graft_ann_delete"
      val emb = t(spark, dir, "embeddings")
      VectorOps.writeIndex(emb, "vec_id", "embedding", table,
        kClusters = IvfClusters, iters = IvfIters, numBuckets = 8)
      VectorOps.deleteFromIndex(emb.filter(col("vec_id") % 5 === 2),
        "vec_id", table)
      val idx = VectorOps.loadIndex(spark, table)
      VectorOps.ivfSq8TopKFromIndex(idx, col("id") < 10, k = 5,
          nprobe = IvfNprobe, candidates = Sq8Candidates)
        .orderBy("query_id", "rank")
    },
    oracle = Some(
      s"""${ivfSq8OracleCtes(dataPredSql = Some(DeleteSurvivorSql))}
         |SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin))

  /** FULL index lifecycle, vector side ([[VectorOps.compactIndex]]):
    * build on two thirds → append the rest against frozen quantizers →
    * delete ids ≡ 2 (mod 5) (tombstones spanning BOTH batches) →
    * COMPACT (physically rewrite survivors bucket-preserving, clear
    * tombstones) → probe. The oracle trains quantizers on the build
    * subset only and codes/probes survivors only — the gate proves the
    * whole maintenance chain is invisible next to a hypothetical
    * survivor corpus indexed under the same frozen quantizers.
    * Compaction must both EXCLUDE the tombstoned rows in the rewrite
    * and clear the delete list; forgetting either fails the oracle
    * (resurrected rows) or the RetrievalSpec file/catalog pins. */
  val t58_ann_index_compact: Q = Q(
    run = (spark, dir) => {
      val table = "graft_ann_compact"
      val emb = t(spark, dir, "embeddings")
      VectorOps.writeIndex(emb.filter(col("vec_id") % 3 =!= 0), "vec_id",
        "embedding", table, kClusters = IvfClusters, iters = IvfIters,
        numBuckets = 8)
      VectorOps.appendToIndex(emb.filter(col("vec_id") % 3 === 0),
        "vec_id", "embedding", table, numBuckets = 8)
      VectorOps.deleteFromIndex(emb.filter(col("vec_id") % 5 === 2),
        "vec_id", table)
      VectorOps.compactIndex(spark, table)
      val idx = VectorOps.loadIndex(spark, table)
      VectorOps.ivfSq8TopKFromIndex(idx, col("id") < 10, k = 5,
          nprobe = IvfNprobe, candidates = Sq8Candidates)
        .orderBy("query_id", "rank")
    },
    oracle = Some(
      s"""${ivfSq8OracleCtes(trainPredSql = Some(AppendTrainSql),
            dataPredSql = Some(DeleteSurvivorSql))}
         |SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin))

  /** ATOMIC (CommitLog) incremental ANN maintenance
    * ([[VectorOps.appendToIndexCommitted]]) — t50's contract through
    * the streaming commit protocol: the appended third arrives as TWO
    * atomically-committed side batches (unbucketed L0 runs the probe
    * unions with the bucketed base) instead of a direct bucketed
    * append. Gated on t50's frozen-training oracle VERBATIM, so the
    * whole protocol — staging write, rename commit, side-run union —
    * must be value-invisible next to the one-shot append. A replayed
    * batch id inside the run doubles nothing (the oracle would see
    * duplicated candidates and fail). */
  val t62_ann_append_committed: Q = Q(
    run = (spark, dir) => {
      val table = "graft_ann_commitlog"
      val emb = t(spark, dir, "embeddings")
      VectorOps.writeIndex(emb.filter(col("vec_id") % 3 =!= 0), "vec_id",
        "embedding", table, kClusters = IvfClusters, iters = IvfIters,
        numBuckets = 8)
      val batch = emb.filter(col("vec_id") % 3 === 0)
      VectorOps.appendToIndexCommitted(batch.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", table, batchId = 0L)
      VectorOps.appendToIndexCommitted(batch.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", table, batchId = 1L)
      // replay of a committed id must be a no-op or the oracle fails
      VectorOps.appendToIndexCommitted(batch.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", table, batchId = 0L)
      val idx = VectorOps.loadIndex(spark, table)
      VectorOps.ivfSq8TopKFromIndex(idx, col("id") < 10, k = 5,
          nprobe = IvfNprobe, candidates = Sq8Candidates)
        .orderBy("query_id", "rank")
    },
    oracle = t50_ann_index_append.oracle)

  /** [[t62_ann_append_committed]] one memory tier down
    * ([[VectorOps.appendToPqIndexCommitted]]): the PQ append through
    * the atomic commit protocol, gated on t55's frozen-codebook oracle
    * verbatim — all three streamed-maintenance modalities end
    * oracle-gated (ANN t62, PQ here, BM25 t54 whose ledgered append
    * writes the same tables as the batch path). */
  val t63_pq_append_committed: Q = Q(
    run = (spark, dir) => {
      val table = "graft_pq_commitlog"
      val emb = t(spark, dir, "embeddings")
      VectorOps.writePqIndex(emb.filter(col("vec_id") % 3 =!= 0), "vec_id",
        "embedding", table, m = PqM, ksub = PqKsub, iters = PqIters)
      val batch = emb.filter(col("vec_id") % 3 === 0)
      VectorOps.appendToPqIndexCommitted(batch.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", table, batchId = 0L)
      VectorOps.appendToPqIndexCommitted(batch.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", table, batchId = 1L)
      VectorOps.appendToPqIndexCommitted(batch.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", table, batchId = 1L)
      val idx = VectorOps.loadPqIndex(spark, table)
      VectorOps.pqTopKFromIndex(idx, col("id") < 10, k = 5,
          candidates = PqCandidates)
        .orderBy("query_id", "rank")
    },
    oracle = t55_pq_index_append.oracle)

  /** Snapshot time travel on the persisted ANN index
    * ([[VectorOps.loadIndexAsOf]]): base build + two committed append
    * batches, probed AS OF batch 0 — batch 1's rows must be invisible.
    * The oracle replays the frozen-quantizer probe with the corpus
    * restricted to base ∪ batch 0 (train = base, data = base ∪ even
    * appends), so the gate proves probe(asOf N) ≡
    * probe(appends-stopped-at-N) value-exactly. History reaches back
    * to the last compaction (= expire_snapshots); delete rewind is the
    * documented Iceberg v2 delete-file seam. */
  val t73_ann_index_asof: Q = Q(
    run = (spark, dir) => {
      val table = "graft_ann_asof"
      val emb = t(spark, dir, "embeddings")
      VectorOps.writeIndex(emb.filter(col("vec_id") % 3 =!= 0), "vec_id",
        "embedding", table, kClusters = IvfClusters, iters = IvfIters,
        numBuckets = 8)
      val batch = emb.filter(col("vec_id") % 3 === 0)
      VectorOps.appendToIndexCommitted(batch.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", table, batchId = 0L)
      VectorOps.appendToIndexCommitted(batch.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", table, batchId = 1L)
      val idx = VectorOps.loadIndexAsOf(spark, table, asOfBatch = 0L)
      VectorOps.ivfSq8TopKFromIndex(idx, col("id") < 10, k = 5,
          nprobe = IvfNprobe, candidates = Sq8Candidates)
        .orderBy("query_id", "rank")
    },
    oracle = Some(
      s"""${ivfSq8OracleCtes(trainPredSql = Some(AppendTrainSql),
             dataPredSql = Some(s"($AppendTrainSql OR vec_id % 2 = 0)"))}
         |SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin))

  /** [[t73_ann_index_asof]] one memory tier down
    * ([[VectorOps.loadPqIndexAsOf]]): snapshot time travel on the PQ
    * index, gated on the frozen-codebook oracle with the corpus
    * restricted to base ∪ batch 0. */
  val t74_pq_index_asof: Q = Q(
    run = (spark, dir) => {
      val table = "graft_pq_asof"
      val emb = t(spark, dir, "embeddings")
      VectorOps.writePqIndex(emb.filter(col("vec_id") % 3 =!= 0), "vec_id",
        "embedding", table, m = PqM, ksub = PqKsub, iters = PqIters)
      val batch = emb.filter(col("vec_id") % 3 === 0)
      VectorOps.appendToPqIndexCommitted(batch.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", table, batchId = 0L)
      VectorOps.appendToPqIndexCommitted(batch.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", table, batchId = 1L)
      val idx = VectorOps.loadPqIndexAsOf(spark, table, asOfBatch = 0L)
      VectorOps.pqTopKFromIndex(idx, col("id") < 10, k = 5,
          candidates = PqCandidates)
        .orderBy("query_id", "rank")
    },
    oracle = Some(pqOracleSql(Some(AppendTrainSql),
      Some(s"($AppendTrainSql OR vec_id % 2 = 0)"))))

  /** EMBEDDING-space drift ([[CorpusStats.driftPsi]] over quantizer
    * cells): the k-means quantizer trains on the even-id half (the
    * reference snapshot — deterministic Lloyd, the t12 chain), BOTH
    * halves assign to its cells map-side, and the PSI ledger runs over
    * the cell populations — the vector-database answer to "has the
    * embedding distribution moved since the index was built", with the
    * cells doubling as the drift histogram. Composition of two gated
    * machines (trained k-means + the p15 ledger); the oracle chains
    * the Lloyd replay into the PSI arithmetic. */
  val p16_embedding_drift: Q = Q(
    run = (spark, dir) => {
      val p = Staging.barrier(VectorOps.prepared(
        t(spark, dir, "embeddings"), "vec_id", "embedding"))
      val cent = VectorOps.kmeansCentroidsPrepared(
        p.filter(col("id") % 2 === 0), IvfClusters, IvfIters)
      val cells = p.select(col("id"),
        VectorOps.assignCell(col("v"), col("nrm"), cent).as("cell"))
      CorpusStats.driftPsi(cells, col("cell"), col("id") % 2 === 1,
          (1L until IvfClusters).toSeq)
        .orderBy("bucket")
    },
    oracle = Some {
      val nb = IvfClusters
      def p(c: String, n: String) =
        s"($c + 1) * 1.0 / ((SELECT $n FROM tot) + $nb)"
      s"""${kmeansCtePrefix(trainPredSql = Some("vec_id % 2 = 0"))},
         |cdf AS (SELECT CAST(cell AS INT) AS bucket, vec_id % 2 = 1 AS is_b FROM corpus),
         |g0 AS (SELECT bucket,
         |    CAST(sum(CASE WHEN NOT is_b THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
         |    CAST(sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT) AS c_b
         |  FROM cdf GROUP BY bucket),
         |g AS (SELECT CAST(s.bucket AS INT) AS bucket,
         |    CAST(COALESCE(c_a, 0) AS BIGINT) AS c_a,
         |    CAST(COALESCE(c_b, 0) AS BIGINT) AS c_b
         |  FROM (SELECT unnest(generate_series(0, ${nb - 1})) AS bucket) s
         |  LEFT JOIN g0 ON g0.bucket = s.bucket),
         |tot AS (SELECT CAST(sum(c_a) AS BIGINT) AS na,
         |    CAST(sum(c_b) AS BIGINT) AS nbt FROM g)
         |SELECT bucket, c_a, c_b,
         |  CAST(round((${p("c_a", "na")} - ${p("c_b", "nbt")})
         |    * ln((${p("c_a", "na")}) / (${p("c_b", "nbt")})) * 1000000) AS BIGINT)
         |    AS psi_term_micro
         |FROM g ORDER BY bucket""".stripMargin
    })

  /** PQ index DELETE ([[VectorOps.deleteFromPqIndex]]) — t56 one memory
    * tier down, restoring three-modality symmetry (ANN t56, BM25 t57,
    * PQ here): the PQ index is built on the full corpus, ids ≡ 2
    * (mod 5) are tombstoned merge-on-read, codebooks stay FROZEN (FAISS
    * `remove_ids` semantics — the reconstruction grid does not move when
    * vectors leave). The oracle trains codebooks on the full corpus but
    * codes/probes survivors only, so the gate proves
    * probe(build(X) − delete(D)) ≡ probe(X∖D | codebooks(X))
    * value-exactly. Deleted queries vanish from the output (8×5 rows). */
  val t60_pq_index_delete: Q = Q(
    run = (spark, dir) => {
      val table = "graft_pq_delete"
      val emb = t(spark, dir, "embeddings")
      VectorOps.writePqIndex(emb, "vec_id", "embedding", table,
        m = PqM, ksub = PqKsub, iters = PqIters)
      VectorOps.deleteFromPqIndex(emb.filter(col("vec_id") % 5 === 2),
        "vec_id", table)
      val idx = VectorOps.loadPqIndex(spark, table)
      VectorOps.pqTopKFromIndex(idx, col("id") < 10, k = 5,
          candidates = PqCandidates)
        .orderBy("query_id", "rank")
    },
    oracle = Some(pqOracleSql(dataPredSql = Some(DeleteSurvivorSql))))

  /** FULL PQ index lifecycle ([[VectorOps.compactPqIndex]]) — t58 one
    * memory tier down: build codebooks on two thirds → append the rest
    * against FROZEN codebooks → delete ids ≡ 2 (mod 5) across both
    * batches → COMPACT (rewrite survivors, clear tombstones) → probe.
    * The oracle trains on the build subset only and codes/probes
    * survivors only — the whole maintenance chain must be invisible
    * next to a hypothetical survivor corpus coded under the same frozen
    * codebooks. Compaction must both exclude tombstoned rows and clear
    * the delete list; forgetting either resurrects rows or drops
    * survivors, and the oracle catches both. */
  val t61_pq_index_compact: Q = Q(
    run = (spark, dir) => {
      val table = "graft_pq_compact"
      val emb = t(spark, dir, "embeddings")
      VectorOps.writePqIndex(emb.filter(col("vec_id") % 3 =!= 0), "vec_id",
        "embedding", table, m = PqM, ksub = PqKsub, iters = PqIters)
      VectorOps.appendToPqIndex(emb.filter(col("vec_id") % 3 === 0),
        "vec_id", "embedding", table)
      VectorOps.deleteFromPqIndex(emb.filter(col("vec_id") % 5 === 2),
        "vec_id", table)
      VectorOps.compactPqIndex(spark, table)
      val idx = VectorOps.loadPqIndex(spark, table)
      VectorOps.pqTopKFromIndex(idx, col("id") < 10, k = 5,
          candidates = PqCandidates)
        .orderBy("query_id", "rank")
    },
    oracle = Some(pqOracleSql(Some(AppendTrainSql), Some(DeleteSurvivorSql))))

  // ---------------------------------------------------------------------
  // Classic analytical shapes over the TPC-H-ish tables
  // ---------------------------------------------------------------------

  private val Dec6 = DecimalType(18, 6)
  private def dec6(c: Column): Column = c.cast(Dec6)

  /** Driver-hash-safe rendering of an exact decimal aggregate: the
    * correctness driver's hasher diverges on DECIMAL output columns even
    * when the values and declared types are identical on both sides
    * (round-2 finding: q1/q3/q5/q6/q7/q18/w1 all rows/schema-green,
    * hash-red, values join-verified equal). DOUBLE outputs hash
    * stably (every avg_* double was green), so final aggregates are
    * rounded to cents and emitted as DOUBLE. Internal arithmetic stays
    * exact decimal; only the emitted column changes. After rounding the
    * value carries ≤13 significant digits — well inside the ≤15-digit
    * band where decimal→double conversion is bit-identical across
    * Spark and DuckDB (measured, round 2). Oracle twin: [[OracleSql.money]].
    *
    * SCALE-FACTOR ASSUMPTION, not a law: the ≤13-digit bound holds for
    * the test corpora (sums ≤ ~1e8 dollars). A 100 TB corpus can push a
    * cent-rounded sum past ~15 significant digits (2^53 cents ≈ $9e13),
    * where Spark's BigDecimal-string and DuckDB's exact-binary
    * decimal→double conversions diverge by 1 ulp — the q10 s2 hazard.
    * QueriesSpec ("money magnitudes stay inside the double-exact band")
    * asserts the bound against the corpus so a larger corpus fails
    * loudly instead of hashing differently; past the bound, emit the
    * DECIMAL itself and give the driver a decimal-aware comparator. */
  private def money(c: Column): Column = round(c, 2).cast(DoubleType)
  /** DuckDB twin of [[money]]; both engines round decimals HALF_UP
    * (away from zero — all these sums are positive). */
  private def duckMoney(expr: String): String = s"CAST(ROUND($expr, 2) AS DOUBLE)"

  /** `price·(1−disc)` with every step pinned to DECIMAL(18,6). The money
    * columns are exact 2-decimal values, so each product (scale ≤ 6) is
    * EXACT — no rounding anywhere, which is what makes the cross-engine
    * comparison exact. (A double product cast to decimal at the end
    * would diverge: Spark rounds the shortest-repr string, DuckDB the
    * exact binary expansion.) */
  private def discPrice: Column =
    dec6(dec6(col("l_extendedprice")) * (lit(1).cast(Dec6) - dec6(col("l_discount"))))
  private val duckDiscPrice =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))"

  /** TPC-H Q1 shape: pricing summary report. Map-side partial hash
    * aggregation over 6 states × 2 group keys — the canonical "wide agg,
    * tiny result" scan; every sum is exact decimal, averages are pinned
    * `CAST(sum AS DOUBLE)/n` on both sides. */
  val q1_pricing_summary: Q = Q(
    run = (spark, dir) => {
      val cutoff = java.sql.Timestamp.valueOf("1998-09-02 00:00:00")
      val charge = dec6(discPrice * (lit(1).cast(Dec6) + dec6(col("l_tax"))))
      tf(spark, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(cutoff).cast(TimestampNTZType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          money(sum(dec6(col("l_quantity")))).as("sum_qty"),
          money(sum(dec6(col("l_extendedprice")))).as("sum_base_price"),
          money(sum(discPrice)).as("sum_disc_price"),
          money(sum(charge)).as("sum_charge"),
          (sum(dec6(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
          (sum(dec6(col("l_extendedprice"))).cast(DoubleType) / count(lit(1))).as("avg_price"),
          (sum(dec6(col("l_discount"))).cast(DoubleType) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    oracle = Some(
      s"""SELECT l_returnflag, l_linestatus,
         |  ${duckMoney("SUM(CAST(l_quantity AS DECIMAL(18,6)))")} AS sum_qty,
         |  ${duckMoney("SUM(CAST(l_extendedprice AS DECIMAL(18,6)))")} AS sum_base_price,
         |  ${duckMoney(s"SUM($duckDiscPrice)")} AS sum_disc_price,
         |  ${duckMoney(s"SUM(CAST($duckDiscPrice * (CAST(1 AS DECIMAL(18,6)) + CAST(l_tax AS DECIMAL(18,6))) AS DECIMAL(18,6)))")} AS sum_charge,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price,
         |  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
         |  CAST(COUNT(*) AS BIGINT) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    bench = true)

  /** TPC-H Q3 shape: three-table join (customer ⋈ orders ⋈ lineitem)
    * with selective dimension filter + top-10 by revenue. Plan shape at
    * scale: the filtered customer side broadcasts, orders⋈lineitem
    * shuffles on the order key, final top-10 is TakeOrdered (no global
    * sort). */
  val q3_shipping_priority: Q = Q(
    run = (spark, dir) => {
      val cut = lit(java.sql.Timestamp.valueOf("1998-03-15 00:00:00"))
        .cast(TimestampNTZType)
      val cust = t(spark, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = t(spark, dir, "orders").filter(col("o_orderdate") < cut)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = t(spark, dir, "lineitem").filter(col("l_shipdate") > cut)
        .select(col("l_orderkey"), discPrice.as("dp"))
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money(sum(col("dp"))).as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },
    oracle = Some(
      s"""SELECT l_orderkey, ${duckMoney(s"SUM($duckDiscPrice)")} AS revenue,
         |  o_orderdate, o_orderpriority
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin))

  /** TPC-H Q5 shape: six-table join (region → nation → supplier, customer
    * → orders → lineitem, co-nation constraint) — the dimension chain
    * broadcasts end-to-end, the fact table shuffles once on the order
    * key; at scale AQE re-plans the orders⋈lineitem side to SMJ. */
  val q5_local_supplier_volume: Q = Q(
    run = (spark, dir) => {
      val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")).cast(TimestampNTZType)
      val hi = lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")).cast(TimestampNTZType)
      val nat = t(spark, dir, "region").filter(col("r_name") === "ASIA")
        .join(t(spark, dir, "nation"), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val sup = t(spark, dir, "supplier").join(nat,
        col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
      val ord = t(spark, dir, "orders")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select("o_orderkey", "o_custkey")
      val cust = t(spark, dir, "customer").select("c_custkey", "c_nationkey")
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), discPrice.as("dp"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(money(sum(col("dp"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    oracle = Some(
      s"""SELECT n_name, ${duckMoney(s"SUM($duckDiscPrice)")} AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),
    bench = true)

  /** ROLLUP aggregation (subtotal + grand-total rows) — the grouping-sets
    * family, absent from the reference; planned as a single Expand +
    * hash aggregate, NOT one scan per grouping set. NULL-first ordering
    * pinned on both sides (DuckDB defaults NULLS LAST). */
  val q6_rollup_orders: Q = Q(
    run = (spark, dir) =>
      t(spark, dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          money(sum(dec6(col("o_totalprice")))).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
    oracle = Some(
      s"""SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  ${duckMoney("SUM(CAST(o_totalprice AS DECIMAL(18,6)))")} AS sum_price
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin))

  /** LEFT ANTI join — customers with no orders since a cutoff. Plans as
    * BroadcastHashJoin LeftAnti over the filtered (pushed-down) orders
    * projection: the probe side carries only the join key. */
  val q8_inactive_customers: Q = Q(
    run = (spark, dir) => {
      val cut = lit(java.sql.Timestamp.valueOf("2001-01-01 00:00:00"))
        .cast(TimestampNTZType)
      val recent = t(spark, dir, "orders")
        .filter(col("o_orderdate") >= cut).select("o_custkey")
      t(spark, dir, "customer")
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    oracle = Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin))

  /** TPC-H Q18 shape: HAVING-filtered aggregate subquery joined back to
    * the fact tables (large-volume orders). The aggregate runs FIRST and
    * shrinks to the rare qualifying keys; the joins then touch only
    * those. */
  val q18_large_orders: Q = Q(
    run = (spark, dir) => {
      val big = t(spark, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(dec6(col("l_quantity"))).as("qty_dec"))
        .filter(col("qty_dec") > 300)
        .select(col("l_orderkey"), money(col("qty_dec")).as("sum_qty"))
      t(spark, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "sum_qty")
        .orderBy("o_orderkey")
    },
    oracle = Some(
      s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey,
        |        ${duckMoney("SUM(CAST(l_quantity AS DECIMAL(18,6)))")} AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300) big
        |  ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin))

  /** Running total per customer — the window-FRAME family (`ROWS
    * UNBOUNDED PRECEDING`), distinct from w1's bucketed groupBy: one
    * hash-partition shuffle on the key, per-partition sort, single pass.
    * Frame sums in exact decimal so every prefix is cross-engine
    * comparable. */
  val q7_running_total: Q = Q(
    run = (spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      t(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          dec6(col("o_totalprice")).as("p"))
        .withColumn("running_spend", money(sum(col("p")).over(w)))
        .drop("p")
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },
    oracle = Some(
      s"""SELECT o_custkey, o_orderkey, o_orderdate,
        |  ${duckMoney(
             """SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
               |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               |    ROWS UNBOUNDED PRECEDING)""".stripMargin)} AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin))

  /** PIVOT — long→wide aggregation with an explicit (plannable, no
    * distinct-values pre-pass) column list; each cell is a conditional
    * count, one scan, map-side combine. */
  val q9_pivot_events: Q = Q(
    run = (spark, dir) =>
      eventsWithTs(spark, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id"),
    oracle = Some(
      """SELECT user_id,
        |  CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS click,
        |  CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 END), 0) AS BIGINT) AS error,
        |  CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchase,
        |  CAST(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN 1 END), 0) AS BIGINT) AS signup,
        |  CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END), 0) AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** Deterministic dispersion statistics from EXACT decimal moments:
    * Σx and Σx² are exact, so mean/variance are reproducible across
    * runs, partitionings, and engines — `var_samp`'s floating sum is
    * order-dependent and would flap the hash gate (and any 100 TB
    * regression baseline). Final arithmetic pinned to double on both
    * sides. */
  val q10_value_moments: Q = Q(
    run = (spark, dir) =>
      eventsWithTs(spark, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(dec6(col("value"))).as("s1"),
          // Σx² is pinned to scale 6 BEFORE the double cast: the scale-12
          // sum has ~19 significant digits, where decimal→double rounding
          // diverges between engines (Spark via BigDecimal string, DuckDB
          // via exact binary); at ≤15 digits both round identically
          sum(dec6(col("value")) * dec6(col("value")))
            .cast(DecimalType(38, 6)).as("s2"))
        .select(col("event_type"), col("n"),
          (col("s1").cast(DoubleType) / col("n")).as("mean_value"),
          ((col("s2").cast(DoubleType)
            - col("s1").cast(DoubleType) * col("s1").cast(DoubleType) / col("n"))
            / (col("n") - lit(1))).as("var_value"))
        .orderBy("event_type"),
    oracle = Some(
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_value,
        |  (CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
        |    - CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |      * CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
        |    / (COUNT(*) - 1) AS var_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** TPC-H Q4 shape: correlated EXISTS — orders with at least one
    * late-shipping lineitem (shipped ≥ 90 days after the order date),
    * counted per priority. The EXISTS decorrelates to a LEFT SEMI join
    * keyed on the order — one shuffle pair, each order emitted at most
    * once however many lineitems match; the date bound rides in the join
    * condition so unmatched lineitems die at the join, not in a
    * post-filter. */
  val q4_priority_exists: Q = Q(
    run = (spark, dir) => {
      val li = t(spark, dir, "lineitem").select("l_orderkey", "l_shipdate")
      t(spark, dir, "orders")
        .join(li, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    oracle = Some(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_shipdate >= o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** TPC-H Q17 shape: correlated SCALAR subquery — revenue from
    * lineitems whose quantity is below 20% of their part's average.
    * Expressed as the decorrelated plan Catalyst produces for the
    * subquery form: one per-part aggregate joined back to the fact (the
    * oracle keeps the correlated spelling). The threshold
    * `0.2·Σqty/count` is division/multiplication of EXACT doubles
    * (integral quantities sum exactly below 2⁵³), so both engines
    * compare against bit-identical bounds; revenue totals in exact
    * decimal. */
  val q17_small_quantity: Q = Q(
    run = (spark, dir) => {
      val li = t(spark, dir, "lineitem")
      val thresh = li.groupBy("l_partkey")
        .agg((lit(0.2) * sum(col("l_quantity")) / count(lit(1))).as("thresh"))
      li.join(thresh, Seq("l_partkey"))
        .filter(col("l_quantity") < col("thresh"))
        .agg(money(sum(dec6(col("l_extendedprice")))).as("total_revenue"),
          count(lit(1)).as("n_items"))
    },
    oracle = Some(
      s"""SELECT
         |  ${duckMoney("SUM(CAST(l_extendedprice AS DECIMAL(18,6)))")} AS total_revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem l
         |WHERE l_quantity < (SELECT 0.2 * SUM(l_quantity) / COUNT(*)
         |  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin))

  /** TPC-H Q11 shape: share-of-total HAVING — nations whose supplier
    * revenue exceeds 4% of the global total. The global total is a
    * SCALAR aggregate broadcast against the per-nation rows (no second
    * scan of the fact: both aggregates fold the same shuffled relation),
    * and the share test is the RATIONAL form `rev·25 > total` — an
    * integer multiply on exact decimals instead of a lossy
    * `rev/total > 0.04` double division. */
  val q11_revenue_share: Q = Q(
    run = (spark, dir) => {
      // barrier: the per-nation aggregate feeds BOTH the output rows and
      // the scalar total — without it each branch re-scans the fact
      // table (verified in the physical plan; the staged form reads the
      // ~#nations-row cache twice instead)
      val rev = Staging.barrier(t(spark, dir, "lineitem")
        .join(t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(spark, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(discPrice).as("rev_dec")))
      rev.crossJoin(broadcast(rev.agg(sum(col("rev_dec")).as("total_dec"))))
        .filter(col("rev_dec") * 25 > col("total_dec"))
        .select(col("n_name"), money(col("rev_dec")).as("revenue"))
        .orderBy("n_name")
    },
    oracle = Some(
      s"""WITH rev AS (
         |  SELECT n_name, SUM($duckDiscPrice) AS rev_dec
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  GROUP BY n_name)
         |SELECT n_name, ${duckMoney("rev_dec")} AS revenue
         |FROM rev WHERE rev_dec * 25 > (SELECT SUM(rev_dec) FROM rev)
         |ORDER BY n_name""".stripMargin))

  /** Customer-spend DECILES — the ntile ranking family. The decile
    * assignment needs a TOTAL order over per-customer spend (single
    * range-sorted partition); at 100 TB the swap is
    * `approxQuantileThresholds`-style bucket bounds (the t18 twin) with
    * deciles assigned map-side against broadcast cut points — gated here
    * in the exact form, tie-broken by customer key so the ranking is
    * deterministic. Per-decile stats are exact decimal. */
  val q13_spend_deciles: Q = Q(
    run = (spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("spend_dec"), col("o_custkey"))
      t(spark, dir, "orders")
        .groupBy("o_custkey")
        .agg(sum(dec6(col("o_totalprice"))).as("spend_dec"))
        .withColumn("decile", ntile(10).over(w))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_customers"),
          money(min(col("spend_dec"))).as("min_spend"),
          money(max(col("spend_dec"))).as("max_spend"),
          money(sum(col("spend_dec"))).as("sum_spend"))
        .orderBy("decile")
    },
    oracle = Some(
      s"""WITH spend AS (
         |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS spend_dec
         |  FROM orders GROUP BY o_custkey),
         |tiled AS (
         |  SELECT spend_dec,
         |    ntile(10) OVER (ORDER BY spend_dec, o_custkey) AS decile
         |  FROM spend)
         |SELECT CAST(decile AS INT) AS decile, COUNT(*) AS n_customers,
         |  ${duckMoney("MIN(spend_dec)")} AS min_spend,
         |  ${duckMoney("MAX(spend_dec)")} AS max_spend,
         |  ${duckMoney("SUM(spend_dec)")} AS sum_spend
         |FROM tiled GROUP BY decile ORDER BY decile""".stripMargin))

  /** TPC-H Q12 shape: join + conditional counting — line shipments in a
    * date window, classified by order priority. The shipdate range is a
    * pushable scan predicate (PushedFilters on the parquet min/max), the
    * priority split is a map-side CASE fold: one shuffle, two counters. */
  val q12_priority_lines: Q = Q(
    run = (spark, dir) => {
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast(TimestampNTZType) &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast(TimestampNTZType))
        .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_returnflag")
    },
    oracle = Some(
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    bench = true)

  /** TPC-H Q14 shape: promo revenue share. Both sums fold the SAME
    * joined relation in one aggregate (no second scan); the share is a
    * double division of two cent-rounded doubles — bit-identical inputs,
    * one IEEE op, so the quotient is engine-exact without a rational
    * workaround. Part side is a broadcast dimension. */
  val q14_promo_revenue: Q = Q(
    run = (spark, dir) =>
      t(spark, dir, "lineitem")
        .join(broadcast(t(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
        .agg(
          money(sum(when(col("p_type") === "PROMO", discPrice).otherwise(lit(0).cast(Dec6))))
            .as("promo_revenue"),
          money(sum(discPrice)).as("total_revenue"))
        .withColumn("promo_share", col("promo_revenue") / col("total_revenue")),
    oracle = Some(
      s"""WITH agg AS (SELECT
         |  ${duckMoney(s"SUM(CASE WHEN p_type = 'PROMO' THEN $duckDiscPrice ELSE CAST(0 AS DECIMAL(18,6)) END)")} AS promo_revenue,
         |  ${duckMoney(s"SUM($duckDiscPrice)")} AS total_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey)
         |SELECT promo_revenue, total_revenue,
         |  promo_revenue / total_revenue AS promo_share FROM agg""".stripMargin))

  /** TPC-H Q16 shape: DISTINCT-count with an exclusion anti-join —
    * suppliers per (brand, type) for small parts, excluding
    * negative-balance suppliers (the NOT IN sub). The exclusion list is
    * a broadcast LEFT ANTI (never a shuffled NOT IN), the distinct-agg
    * shuffles (brand, type, suppkey) once, partial-deduped map-side. */
  val q16_supplier_count: Q = Q(
    run = (spark, dir) => {
      val bad = t(spark, dir, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      t(spark, dir, "lineitem")
        .join(broadcast(t(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
        .filter(col("p_size") <= 25)
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))
    },
    oracle = Some(
      """SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 25
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type
        |ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin))

  /** TPC-H Q19 shape: disjunctive OR-of-ANDs join predicate — three
    * (brand, size-band, quantity-band) arms. Catalyst extracts the
    * common `l_partkey = p_partkey` equi-condition out of the
    * disjunction (hash join, not BNL) and pushes each arm's local
    * conjuncts to its side's scan. */
  val q19_disjunctive: Q = Q(
    run = (spark, dir) => {
      val arm = (brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =>
        col("p_brand") === brand &&
          col("p_size").between(szLo, szHi) &&
          col("l_quantity").between(qLo, qHi)
      t(spark, dir, "lineitem")
        .join(broadcast(t(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
        .filter(arm("Brand#11", 1, 15, 1, 20) || arm("Brand#22", 10, 30, 10, 35) ||
          arm("Brand#15", 20, 50, 20, 50))
        .agg(money(sum(discPrice)).as("revenue"), count(lit(1)).as("n_items"))
    },
    oracle = Some(
      s"""SELECT ${duckMoney(s"SUM($duckDiscPrice)")} AS revenue, COUNT(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
         |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
         |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""".stripMargin))

  /** TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS —
    * above-average-balance customers with no urgent orders, per segment.
    * The average test is the RATIONAL form `bal·n > total` on exact
    * decimals (q11/q17 precedent — no lossy double division); the NOT
    * EXISTS is a broadcast LEFT ANTI against the (small) urgent-customer
    * key list. */
  val q22_idle_balance: Q = Q(
    run = (spark, dir) => {
      val cust = t(spark, dir, "customer")
      val stats = cust.filter(col("c_acctbal") > 0)
        .agg(count(lit(1)).as("n"), sum(dec6(col("c_acctbal"))).as("total_dec"))
      val urgent = t(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      cust.crossJoin(broadcast(stats))
        .filter(dec6(col("c_acctbal")) * col("n") > col("total_dec"))
        .join(broadcast(urgent), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("numcust"),
          money(sum(dec6(col("c_acctbal")))).as("totacctbal"))
        .orderBy("c_mktsegment")
    },
    oracle = Some(
      s"""WITH a AS (SELECT COUNT(*) AS n, SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS t
         |  FROM customer WHERE c_acctbal > 0)
         |SELECT c_mktsegment, COUNT(*) AS numcust,
         |  ${duckMoney("SUM(CAST(c_acctbal AS DECIMAL(18,6)))")} AS totacctbal
         |FROM customer c
         |WHERE CAST(c_acctbal AS DECIMAL(18,6)) * (SELECT n FROM a) > (SELECT t FROM a)
         |  AND NOT EXISTS (SELECT 1 FROM orders o
         |    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  /** TPC-H Q2 shape: correlated per-group ARGMIN + dimension chain — for
    * each size-15 part, the cheapest supplier (min extended price, ties
    * to the lowest suppkey) with its nation/region names. The argmin is
    * a STRUCT-MIN hash aggregation (the w5 pattern: map-side combinable,
    * one partially-combined struct per (part × map task) in the shuffle —
    * never the row_number window sort the correlated-subquery spelling
    * implies); dimensions are broadcast. The oracle keeps the window
    * spelling, so the gate also checks the reformulation. */
  val q2_min_cost_supplier: Q = Q(
    run = (spark, dir) => {
      val li = t(spark, dir, "lineitem")
      val best = li
        .join(broadcast(t(spark, dir, "part").filter(col("p_size") === 15)
          .select("p_partkey", "p_name")), col("l_partkey") === col("p_partkey"))
        .groupBy("p_partkey", "p_name")
        .agg(min(struct(dec6(col("l_extendedprice")).as("price"),
          col("l_suppkey").as("sk"))).as("m"))
        .select(col("p_partkey"), col("p_name"),
          money(col("m.price")).as("min_price"), col("m.sk").as("s_suppkey"))
      best
        .join(broadcast(t(spark, dir, "supplier")), Seq("s_suppkey"))
        .join(broadcast(t(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .select("p_partkey", "p_name", "s_name", "n_name", "r_name", "min_price")
        .orderBy("p_partkey")
    },
    oracle = Some(
      s"""WITH ranked AS (
         |  SELECT l_partkey, l_suppkey,
         |    CAST(l_extendedprice AS DECIMAL(18,6)) AS price,
         |    row_number() OVER (PARTITION BY l_partkey
         |      ORDER BY CAST(l_extendedprice AS DECIMAL(18,6)), l_suppkey) AS rn
         |  FROM lineitem)
         |SELECT p_partkey, p_name, s_name, n_name, r_name,
         |  ${duckMoney("price")} AS min_price
         |FROM ranked
         |JOIN part ON p_partkey = l_partkey AND p_size = 15
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN nation ON n_nationkey = s_nationkey
         |JOIN region ON r_regionkey = n_regionkey
         |WHERE rn = 1
         |ORDER BY p_partkey""".stripMargin))

  /** TPC-H Q15 shape: top supplier(s) by windowed revenue — the
    * aggregate-then-scalar-MAX HAVING. The per-supplier aggregate is
    * staged (q11's rationale: it feeds both the output rows and the
    * scalar max, one fact-scan not two) and the max test compares EXACT
    * decimals, so ties — which Q15 explicitly allows — are engine-exact,
    * never a double-epsilon accident. */
  val q15_top_supplier: Q = Q(
    run = (spark, dir) => {
      val rev = Staging.barrier(t(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast(TimestampNTZType) &&
          col("l_shipdate") < lit("1997-07-01 00:00:00").cast(TimestampNTZType))
        .groupBy("l_suppkey")
        .agg(sum(discPrice).as("total_rev_dec")))
      rev.crossJoin(broadcast(rev.agg(max(col("total_rev_dec")).as("mx"))))
        .filter(col("total_rev_dec") === col("mx"))
        .join(broadcast(t(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          money(col("total_rev_dec")).as("total_revenue"))
        .orderBy("s_suppkey")
    },
    oracle = Some(
      s"""WITH rev AS (
         |  SELECT l_suppkey, SUM($duckDiscPrice) AS total_rev_dec
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, ${duckMoney("total_rev_dec")} AS total_revenue
         |FROM rev JOIN supplier ON s_suppkey = l_suppkey
         |WHERE total_rev_dec = (SELECT MAX(total_rev_dec) FROM rev)
         |ORDER BY s_suppkey""".stripMargin))

  /** TPC-H Q20 shape: correlated-aggregate semi-join — suppliers in a
    * nation band who shipped more than half of their lifetime volume of
    * 'large …' parts during 1997 (the corpus has no partsupp table, so
    * lifetime shipped quantity stands in for availqty; reference scope
    * is the §2 A-family aggregate verification reshaped as TPC-H Q20).
    * Both the 1997 and the lifetime sums fold in ONE (part, supplier)
    * hash aggregation — a conditional SUM, never a lineitem self-join —
    * and the qualifying-supplier key list (bounded by supplier
    * cardinality, a true dimension) broadcasts into a LEFT SEMI against
    * the supplier table. Quantities are integer-valued doubles, so
    * `qty97 * 2 > qty_all` is exact in both engines (no epsilon). */
  val q20_promotion_supplier: Q = Q(
    run = (spark, dir) => {
      val in97 =
        col("l_shipdate") >= lit("1997-01-01 00:00:00").cast(TimestampNTZType) &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast(TimestampNTZType)
      val qualifying = t(spark, dir, "lineitem")
        .join(broadcast(t(spark, dir, "part")
          .filter(col("p_name").startsWith("large")).select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("l_quantity")).as("qty_all"),
          sum(when(in97, col("l_quantity"))).as("qty97"))
        .filter(col("qty97") * 2 > col("qty_all"))
        .select(col("l_suppkey")).distinct()
      t(spark, dir, "supplier")
        .join(broadcast(t(spark, dir, "nation")
          .filter(col("n_name").isin("NATION_3", "NATION_7", "NATION_11"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(qualifying), col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    },
    oracle = Some(
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    SUM(l_quantity) AS qty_all,
        |    SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |              AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |             THEN l_quantity END) AS qty97
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
        |  GROUP BY 1, 2)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
        |  AND s_suppkey IN (SELECT l_suppkey FROM ps WHERE qty97 * 2 > qty_all)
        |ORDER BY s_suppkey""".stripMargin))

  /** TPC-H Q21 shape: suppliers who kept orders waiting — for finalized
    * multi-supplier orders, the supplier whose line shipped more than 90
    * days after the order date while NO other supplier in that order was
    * late (the corpus has no commit/receipt dates; o_orderdate + 90d is
    * the lateness rule). The EXISTS / NOT-EXISTS lineitem self-join PAIR
    * is reformulated as ONE per-order hash aggregation: a distinct
    * supplier count plus the late suppkeys collected WITH multiplicity —
    * collect_list over an order's lines is a bounded-size group (order
    * cardinality, like w2's sessions), never a corpus-wide collect. At
    * 100 TB that is a single orderkey shuffle where the correlated
    * spelling adds two more full lineitem shuffles. The oracle keeps the
    * EXISTS/NOT-EXISTS spelling, so the gate also proves the
    * reformulation. Exploding the kept late-list restores per-LINE
    * multiplicity (numwait counts late lines, not late orders). */
  val q21_waiting_supplier: Q = Q(
    run = (spark, dir) => {
      val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")
      t(spark, dir, "lineitem")
        .join(t(spark, dir, "orders").filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          collect_list(when(late, col("l_suppkey"))).as("late_supps"))
        .filter(col("n_supp") > 1 && size(array_distinct(col("late_supps"))) === 1)
        .select(explode(col("late_supps")).as("l_suppkey"))
        .join(broadcast(t(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    },
    oracle = Some(
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin))

  /** CDC-style latest-state compaction: one row per key, the row with
    * the greatest (ts, event_id). Expressed as a HASH AGGREGATION over a
    * struct max — map-side partial aggregation, no per-key window sort:
    * at 100 TB this shuffles one partially-combined struct per (key ×
    * map task), where the row_number() formulation would range-sort the
    * whole corpus. The reference reserves CDC envelope columns
    * (op/ts_ms, FB:82–85) without implementing compaction; this is that
    * missing half. */
  val w5_latest_state: Q = Q(
    run = (spark, dir) =>
      eventsWithTs(spark, dir)
        .groupBy("user_id")
        .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
          col("value"))).as("m"))
        .select(col("user_id"), col("m.ts").as("last_ts"),
          col("m.event_id").as("last_event_id"),
          col("m.event_type").as("last_event_type"),
          col("m.value").as("last_value"))
        .orderBy("user_id"),
    oracle = Some(
      """SELECT user_id, CAST(ts AS TIMESTAMP) AS last_ts,
        |  event_id AS last_event_id, event_type AS last_event_type,
        |  value AS last_value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id
        |  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin),
    bench = true)

  /** Absence detection ([[TemporalJoin.notFollowedBy]]): every view
    * flagged with whether a purchase by the same user follows strictly
    * within one hour — Flink CEP's `notFollowedBy`, batch-shaped as a
    * one-sided interval join (window-width buckets, two-bucket probe,
    * per-event max-hit dedup). The `followed = false` rows are the
    * alert stream. */
  val j6_not_followed_by: Q = Q(
    run = (spark, dir) => {
      val ev = t(spark, dir, "events")
      TemporalJoin.notFollowedBy(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "purchase"),
          "user_id", "event_id", "ts", "ts",
          windowMicros = 3600000000L)
        .select(col("k").as("user_id"), col("lid").as("event_id"),
          col("lus").as("ts_us"), col("followed"))
        .orderBy("event_id")
    },
    oracle = Some(
      """WITH v AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events WHERE event_type = 'purchase')
        |SELECT v.user_id, v.event_id, v.us AS ts_us,
        |  EXISTS (SELECT 1 FROM p WHERE p.user_id = v.user_id
        |          AND p.us > v.us AND p.us <= v.us + 3600000000) AS followed
        |FROM v ORDER BY event_id""".stripMargin),
    bench = true)

  /** Conversion-latency quantiles ([[TemporalJoin.followLag]] +
    * [[Quality.quantilesApproxByKey]]): the time from each followed
    * view to its EARLIEST purchase, summarized at the p9 percentile
    * grid — the funnel-health metric paired with j6's absence alarm,
    * and a demonstration that the sketch machinery composes over a
    * join result (exact under capacity, so the rank-percentile oracle
    * gates it). */
  val j7_conversion_latency: Q = Q(
    run = (spark, dir) => {
      val ev = t(spark, dir, "events")
      val lags = TemporalJoin.followLag(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "purchase"),
          "user_id", "event_id", "ts", "ts",
          windowMicros = 3600000000L)
        .withColumn("grp", lit("all"))
      Quality.quantilesApproxByKey(lags, key = "grp", c = "lag_us",
          P9Probs, capacity = 8192)
        .orderBy("p")
    },
    oracle = Some {
      val perQ = P9Probs.map { q =>
        s"""SELECT 'all' AS grp, CAST($q AS DOUBLE) AS p,
           |  MIN(v) FILTER (WHERE rn >= GREATEST(1,
           |    CAST(CEIL(CAST($q AS DOUBLE) * n) AS BIGINT))) AS value
           |FROM r""".stripMargin
      }
      s"""WITH v AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
         |  FROM events WHERE event_type = 'view'),
         |pu AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
         |  FROM events WHERE event_type = 'purchase'),
         |lag AS (SELECT v.event_id, CAST(min(pu.us - v.us) AS DOUBLE) AS lag
         |  FROM v JOIN pu ON pu.user_id = v.user_id
         |    AND pu.us > v.us AND pu.us <= v.us + 3600000000
         |  GROUP BY v.event_id),
         |r AS (SELECT lag AS v, row_number() OVER (ORDER BY lag) AS rn,
         |    COUNT(*) OVER () AS n FROM lag)
         |${perQ.mkString("\nUNION ALL\n")}
         |ORDER BY p""".stripMargin
    })

  private val FunnelStages = Seq("view", "click", "purchase")

  /** CEP ordered-funnel matching ([[Funnel.funnel]]): per-user greedy
    * stage progression view → click → purchase in the total
    * (event-time, event_id) order. One user-keyed hash-agg + an
    * expression fold — no per-stage self-join, no window; the oracle
    * replays the greedy-earliest witness as a chain of row_number=1
    * picks each strictly after the previous. */
  val w6_funnel: Q = Q(
    run = (spark, dir) =>
      Funnel.funnel(t(spark, dir, "events"), "user_id", "event_type",
          "ts", "event_id", FunnelStages)
        .orderBy("user_id"),
    oracle = Some {
      def pick(k: Int, tp: String, prev: String): String =
        s"""s$k AS (SELECT user_id, us, event_id FROM (
           |  SELECT e.user_id, e.us, e.event_id,
           |    row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) AS rn
           |  FROM e JOIN $prev p ON p.user_id = e.user_id
           |    AND (e.us > p.us OR (e.us = p.us AND e.event_id > p.event_id))
           |  WHERE e.event_type = '$tp') WHERE rn = 1)""".stripMargin
      s"""WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |    event_id, event_type FROM events),
         |u AS (SELECT DISTINCT user_id FROM e),
         |s1 AS (SELECT user_id, us, event_id FROM (
         |  SELECT user_id, us, event_id,
         |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
         |  FROM e WHERE event_type = '${FunnelStages(0)}') WHERE rn = 1),
         |${pick(2, FunnelStages(1), "s1")},
         |${pick(3, FunnelStages(2), "s2")}
         |SELECT u.user_id,
         |  CASE WHEN s3.user_id IS NOT NULL THEN 3
         |       WHEN s2.user_id IS NOT NULL THEN 2
         |       WHEN s1.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage_reached,
         |  s1.us AS ts1_us, s2.us AS ts2_us, s3.us AS ts3_us
         |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
         |  LEFT JOIN s3 USING (user_id)
         |ORDER BY user_id""".stripMargin
    },
    bench = true)

  /** [[w6_funnel]] through the SKEW-SAFE bucketed monoid
    * ([[Funnel.funnelBucketed]], 1-hour segments): each segment's
    * effect is a (k+1)-slot transition vector, composed in bucket
    * order — value-identical to the single fold by the composition
    * law, so it gates against w6's oracle VERBATIM (the p12a-style
    * strongest twin check). Per-group memory is bounded by the bucket
    * width, the power-user answer the w6 scaladoc promises. */
  val w7_funnel_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelBucketed(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id", FunnelStages,
          bucketSeconds = 3600L)
        .orderBy("user_id"),
    oracle = w6_funnel.oracle)

  private val FunnelWithinMicros = 7200000000L // CEP within(2 hours)

  /** WINDOWED funnel — Flink CEP's signature `within(T)` constraint
    * ([[Funnel.funnelWithin]]): a match counts only if it completes
    * within 2 h of its own stage-1 event. Greedy-earliest is WRONG
    * here (an early view's window can expire while a later restart
    * converts — FunnelSpec pins the trap), so the operator runs the
    * max-start DP: per stage, the latest feasible window start — k
    * nullable longs of state, one user-keyed shuffle, any restart
    * count. The oracle replays the DP as chained total-order joins
    * with the window predicate on every hop, pruned by the SAME
    * max-start dominance (`max(start_us)` per reached event), and
    * gates (stage_reached, win_start_us) hash-exactly. */
  val w8_funnel_within: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelWithin(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id", FunnelStages,
          FunnelWithinMicros)
        .orderBy("user_id"),
    oracle = Some {
      def hop(k: Int, tp: String, prev: String): String =
        s"""c$k AS (SELECT e.user_id, e.us, e.event_id,
           |    max(p.start_us) AS start_us
           |  FROM $prev p JOIN e ON e.user_id = p.user_id
           |    AND (e.us > p.us OR (e.us = p.us AND e.event_id > p.event_id))
           |    AND e.event_type = '$tp'
           |    AND e.us <= p.start_us + $FunnelWithinMicros
           |  GROUP BY e.user_id, e.us, e.event_id)""".stripMargin
      s"""WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |    event_id, event_type FROM events),
         |u AS (SELECT DISTINCT user_id FROM e),
         |c1 AS (SELECT user_id, us, event_id, us AS start_us
         |  FROM e WHERE event_type = '${FunnelStages(0)}'),
         |${hop(2, FunnelStages(1), "c1")},
         |${hop(3, FunnelStages(2), "c2")},
         |m1 AS (SELECT user_id, max(start_us) AS r FROM c1 GROUP BY user_id),
         |m2 AS (SELECT user_id, max(start_us) AS r FROM c2 GROUP BY user_id),
         |m3 AS (SELECT user_id, max(start_us) AS r FROM c3 GROUP BY user_id)
         |SELECT u.user_id,
         |  CASE WHEN m3.r IS NOT NULL THEN 3
         |       WHEN m2.r IS NOT NULL THEN 2
         |       WHEN m1.r IS NOT NULL THEN 1 ELSE 0 END AS stage_reached,
         |  CAST(coalesce(m3.r, m2.r, m1.r) AS BIGINT) AS win_start_us
         |FROM u LEFT JOIN m1 USING (user_id) LEFT JOIN m2 USING (user_id)
         |  LEFT JOIN m3 USING (user_id)
         |ORDER BY user_id""".stripMargin
    },
    bench = true)

  /** [[w8_funnel_within]] through the SKEW-SAFE bucketed split
    * ([[Funnel.funnelWithinBucketed]], 1-hour segments): the windowed
    * DP's segment summary needs the window-start slot the
    * unconstrained monoid lacked — in-segment DP starts, plus
    * greedy-earliest i→j completion times that decide whether a
    * carried start's deadline survives the segment. Value-identical
    * to the single fold, so it gates against w8's oracle VERBATIM
    * (the w7-style strongest twin check). */
  val w9_funnel_within_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelWithinBucketed(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id", FunnelStages,
          FunnelWithinMicros, bucketSeconds = 3600L)
        .orderBy("user_id"),
    oracle = w8_funnel_within.oracle)

  /** COMBINED windowed + guarded funnel
    * ([[Funnel.funnelWithinGuarded]]): convert within 2 h of your own
    * first view AND with no `error` between consecutive matched
    * stages — the full production CEP constraint product. The DP
    * layers guard kills onto the max-start vector (dominance survives
    * because a blocker kills every alive partial at its stage
    * equally); the oracle is the w8 chained-hop replay with BOTH the
    * window predicate and a NOT EXISTS blocker probe on every hop,
    * pruned by the same max-start dominance. */
  val w14_funnel_within_guarded: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelWithinGuarded(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id", FunnelStages,
          FunnelWithinMicros, Seq(Some("error"), Some("error")))
        .orderBy("user_id"),
    oracle = Some {
      def hop(j: Int, tp: String, prev: String): String =
        s"""c$j AS (SELECT user_id, us, event_id, max(start_us) AS start_us
           |  FROM (SELECT e.user_id, e.us, e.event_id, p.start_us
           |    FROM $prev p JOIN e ON e.user_id = p.user_id
           |      AND (e.us > p.us OR (e.us = p.us AND e.event_id > p.event_id))
           |      AND e.event_type = '$tp'
           |      AND e.us <= p.start_us + $FunnelWithinMicros
           |    WHERE NOT EXISTS (SELECT 1 FROM e b
           |      WHERE b.user_id = p.user_id AND b.event_type = 'error'
           |        AND (b.us > p.us OR (b.us = p.us AND b.event_id > p.event_id))
           |        AND (b.us < e.us OR (b.us = e.us AND b.event_id < e.event_id))))
           |  GROUP BY user_id, us, event_id)""".stripMargin
      s"""WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |    event_id, event_type FROM events),
         |u AS (SELECT DISTINCT user_id FROM e),
         |c1 AS (SELECT user_id, us, event_id, us AS start_us
         |  FROM e WHERE event_type = '${FunnelStages(0)}'),
         |${hop(2, FunnelStages(1), "c1")},
         |${hop(3, FunnelStages(2), "c2")},
         |m1 AS (SELECT user_id, max(start_us) AS r FROM c1 GROUP BY user_id),
         |m2 AS (SELECT user_id, max(start_us) AS r FROM c2 GROUP BY user_id),
         |m3 AS (SELECT user_id, max(start_us) AS r FROM c3 GROUP BY user_id)
         |SELECT u.user_id,
         |  CASE WHEN m3.r IS NOT NULL THEN 3
         |       WHEN m2.r IS NOT NULL THEN 2
         |       WHEN m1.r IS NOT NULL THEN 1 ELSE 0 END AS stage_reached,
         |  CAST(coalesce(m3.r, m2.r, m1.r) AS BIGINT) AS win_start_us
         |FROM u LEFT JOIN m1 USING (user_id) LEFT JOIN m2 USING (user_id)
         |  LEFT JOIN m3 USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** [[w14_funnel_within_guarded]] through the SKEW-SAFE segment
    * split ([[Funnel.funnelWithinGuardedBucketed]]): the combined
    * constraint's segment summary is richer than either single twin's
    * — the fresh in-segment DP plus per-entry MIN-completion DPs
    * whose alive vectors carry the clean-suffix requirement through
    * the boundary, window feasibility tested against the carried
    * start at merge time. Gates against w14's oracle VERBATIM. */
  val w15_funnel_within_guarded_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelWithinGuardedBucketed(t(spark, dir, "events"),
          "user_id", "event_type", "ts", "event_id", FunnelStages,
          FunnelWithinMicros, Seq(Some("error"), Some("error")),
          bucketSeconds = 3600L)
        .orderBy("user_id"),
    oracle = w14_funnel_within_guarded.oracle)

  /** QUANTIFIED funnel — Flink CEP's `times(n)`
    * ([[Funnel.funnelTimes]]): two views, then two clicks, then a
    * purchase. The operator reduces the quantifiers to stage-list
    * EXPANSION (n ordered occurrences ≡ n consecutive same-type
    * stages) and reuses the plain fold; the oracle chains the
    * expanded greedy picks (w6's machinery, five hops) and reads the
    * full-stage boundaries. `ts<j>_us` gates the n_j-th occurrence
    * time per completed stage. */
  val w12_funnel_times: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelTimes(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(("view", 2), ("click", 2), ("purchase", 1)))
        .orderBy("user_id"),
    oracle = Some {
      def pick(k: Int, tp: String, prev: String): String =
        s"""s$k AS (SELECT user_id, us, event_id FROM (
           |  SELECT e.user_id, e.us, e.event_id,
           |    row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) AS rn
           |  FROM e JOIN $prev p ON p.user_id = e.user_id
           |    AND (e.us > p.us OR (e.us = p.us AND e.event_id > p.event_id))
           |  WHERE e.event_type = '$tp') WHERE rn = 1)""".stripMargin
      val expanded = Seq("view", "view", "click", "click", "purchase")
      val hops = (2 to 5).map(k => pick(k, expanded(k - 1), s"s${k - 1}"))
        .mkString(",\n")
      s"""WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |    event_id, event_type FROM events),
         |u AS (SELECT DISTINCT user_id FROM e),
         |s1 AS (SELECT user_id, us, event_id FROM (
         |  SELECT user_id, us, event_id,
         |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
         |  FROM e WHERE event_type = 'view') WHERE rn = 1),
         |$hops
         |SELECT u.user_id,
         |  CASE WHEN s5.user_id IS NOT NULL THEN 3
         |       WHEN s4.user_id IS NOT NULL THEN 2
         |       WHEN s2.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage_reached,
         |  s2.us AS ts1_us, s4.us AS ts2_us, s5.us AS ts3_us
         |FROM u LEFT JOIN s2 USING (user_id) LEFT JOIN s4 USING (user_id)
         |  LEFT JOIN s5 USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** [[w12_funnel_times]] through the SKEW-SAFE segment monoid — the
    * expansion composes with [[Funnel.funnelBucketed]] for free (same
    * expanded stage list, k+1 transition slots per segment), so the
    * quantified bucketed variant gates against w12's oracle
    * VERBATIM. */
  val w13_funnel_times_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelTimes(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(("view", 2), ("click", 2), ("purchase", 1)),
          bucketSeconds = Some(3600L))
        .orderBy("user_id"),
    oracle = w12_funnel_times.oracle)

  /** LOOPING-quantifier funnel — Flink CEP's `oneOrMore` /
    * `timesOrMore(n)` with GREEDY repetition
    * ([[Funnel.funnelLoop]]): two-or-more views, then two-or-more
    * clicks, then one-or-more purchases. The spine is w12's expanded
    * chained-pick chain (existence is count-only), and each stage's
    * loop absorbs every own-type event from its first pick up to the
    * next stage's first pick (the last stage to end of log) —
    * `reps<j>` and `ts<j>_us` (LAST consumed occurrence) are the
    * loop observables `times(n)` cannot express. The oracle replays
    * the spine with w12's five chained picks and adds one interval
    * COUNT/MAX per stage. */
  val w16_funnel_loop: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelLoop(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(("view", 2), ("click", 2), ("purchase", 1)))
        .orderBy("user_id"),
    bench = true,
    oracle = Some {
      def pick(k: Int, tp: String, prev: String): String =
        s"""s$k AS (SELECT user_id, us, event_id FROM (
           |  SELECT e.user_id, e.us, e.event_id,
           |    row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) AS rn
           |  FROM e JOIN $prev p ON p.user_id = e.user_id
           |    AND (e.us > p.us OR (e.us = p.us AND e.event_id > p.event_id))
           |  WHERE e.event_type = '$tp') WHERE rn = 1)""".stripMargin
      // stage j's loop interval: [its first pick, the next stage's
      // first pick) in the (us, event_id) total order — count and max
      // over the stage's own type inside it
      def reps(j: Int, tp: String, first: String, next: Option[String]): String = {
        val nextJoin = next.map(n =>
          s"\n  LEFT JOIN $n n ON n.user_id = f.user_id").getOrElse("")
        val nextPred = next.map(_ =>
          "\n  WHERE n.user_id IS NULL OR e.us < n.us OR (e.us = n.us AND e.event_id < n.event_id)")
          .getOrElse("")
        s"""r$j AS (SELECT f.user_id, count(*) AS reps, max(e.us) AS last_us
           |  FROM $first f JOIN e ON e.user_id = f.user_id AND e.event_type = '$tp'
           |    AND (e.us > f.us OR (e.us = f.us AND e.event_id >= f.event_id))$nextJoin$nextPred
           |  GROUP BY f.user_id)""".stripMargin
      }
      val expanded = Seq("view", "view", "click", "click", "purchase")
      val hops = (2 to 5).map(k => pick(k, expanded(k - 1), s"s${k - 1}"))
        .mkString(",\n")
      s"""WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |    event_id, event_type FROM events),
         |u AS (SELECT DISTINCT user_id FROM e),
         |s1 AS (SELECT user_id, us, event_id FROM (
         |  SELECT user_id, us, event_id,
         |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
         |  FROM e WHERE event_type = 'view') WHERE rn = 1),
         |$hops,
         |${reps(1, "view", "s1", Some("s3"))},
         |${reps(2, "click", "s3", Some("s5"))},
         |${reps(3, "purchase", "s5", None)}
         |SELECT u.user_id,
         |  CASE WHEN s5.user_id IS NOT NULL THEN 3
         |       WHEN s4.user_id IS NOT NULL THEN 2
         |       WHEN s2.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage_reached,
         |  coalesce(r1.reps, 0) AS reps1, r1.last_us AS ts1_us,
         |  coalesce(r2.reps, 0) AS reps2, r2.last_us AS ts2_us,
         |  coalesce(r3.reps, 0) AS reps3, r3.last_us AS ts3_us
         |FROM u LEFT JOIN s2 USING (user_id) LEFT JOIN s4 USING (user_id)
         |  LEFT JOIN s5 USING (user_id)
         |  LEFT JOIN r1 USING (user_id) LEFT JOIN r2 USING (user_id)
         |  LEFT JOIN r3 USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** [[w16_funnel_loop]] through the SKEW-SAFE segment monoid — the
    * loop fold's summary (exit pointer, count DELTAS, last times) is
    * exact for every entry pointer because increments depend only on
    * the running pointer, so the bucketed variant gates against w16's
    * oracle VERBATIM. */
  val w17_funnel_loop_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelLoopBucketed(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(("view", 2), ("click", 2), ("purchase", 1)),
          bucketSeconds = 3600L)
        .orderBy("user_id"),
    oracle = w16_funnel_loop.oracle)

  /** BOUNDED quantifier times(m, n) ([[Funnel.funnelTimesRange]]) —
    * the last Flink quantifier shape after times(n) (w12) and
    * oneOrMore/timesOrMore (w16): view×(2..3) → click×(1..2) →
    * purchase×(1..1). The oracle is w16's pick-chain + loop-interval
    * replay with the greedy cap applied as a rank cut INSIDE each
    * stage's interval (`row_number ≤ maxReps` before the count/max —
    * the fold ignores overflow, so reps and last_us both stop at the
    * cap'th occurrence while the spine and stage_reached are the
    * uncapped w16 values on the same mandatory counts). */
  val w18_funnel_times_range: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelTimesRange(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(("view", 2, 3), ("click", 1, 2), ("purchase", 1, 1)))
        .orderBy("user_id"),
    bench = true,
    oracle = Some {
      // expanded = view,view,click,purchase; blocks end at s2/s3/s4
      def pick(k: Int, tp: String, prev: String): String =
        s"""s$k AS (SELECT user_id, us, event_id FROM (
           |  SELECT e.user_id, e.us, e.event_id,
           |    row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) AS rn
           |  FROM e JOIN $prev p ON p.user_id = e.user_id
           |    AND (e.us > p.us OR (e.us = p.us AND e.event_id > p.event_id))
           |  WHERE e.event_type = '$tp') WHERE rn = 1)""".stripMargin
      def reps(j: Int, tp: String, first: String, next: Option[String],
          cap: Int): String = {
        val nextJoin = next.map(n =>
          s"\n  LEFT JOIN $n n ON n.user_id = f.user_id").getOrElse("")
        val nextPred = next.map(_ =>
          "\n  WHERE n.user_id IS NULL OR e.us < n.us OR (e.us = n.us AND e.event_id < n.event_id)")
          .getOrElse("")
        s"""r$j AS (SELECT user_id, count(*) AS reps, max(us) AS last_us FROM (
           |  SELECT f.user_id, e.us,
           |    row_number() OVER (PARTITION BY f.user_id ORDER BY e.us, e.event_id) AS rn
           |  FROM $first f JOIN e ON e.user_id = f.user_id AND e.event_type = '$tp'
           |    AND (e.us > f.us OR (e.us = f.us AND e.event_id >= f.event_id))$nextJoin$nextPred
           |  ) WHERE rn <= $cap GROUP BY user_id)""".stripMargin
      }
      val expanded = Seq("view", "view", "click", "purchase")
      val hops = (2 to 4).map(k => pick(k, expanded(k - 1), s"s${k - 1}"))
        .mkString(",\n")
      s"""WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |    event_id, event_type FROM events),
         |u AS (SELECT DISTINCT user_id FROM e),
         |s1 AS (SELECT user_id, us, event_id FROM (
         |  SELECT user_id, us, event_id,
         |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
         |  FROM e WHERE event_type = 'view') WHERE rn = 1),
         |$hops,
         |${reps(1, "view", "s1", Some("s3"), 3)},
         |${reps(2, "click", "s3", Some("s4"), 2)},
         |${reps(3, "purchase", "s4", None, 1)}
         |SELECT u.user_id,
         |  CASE WHEN s4.user_id IS NOT NULL THEN 3
         |       WHEN s3.user_id IS NOT NULL THEN 2
         |       WHEN s2.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage_reached,
         |  coalesce(r1.reps, 0) AS reps1, r1.last_us AS ts1_us,
         |  coalesce(r2.reps, 0) AS reps2, r2.last_us AS ts2_us,
         |  coalesce(r3.reps, 0) AS reps3, r3.last_us AS ts3_us
         |FROM u LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
         |  LEFT JOIN s4 USING (user_id)
         |  LEFT JOIN r1 USING (user_id) LEFT JOIN r2 USING (user_id)
         |  LEFT JOIN r3 USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** [[w18_funnel_times_range]] through the SKEW-SAFE segment monoid
    * ([[Funnel.funnelTimesRangeBucketed]]): with a cap the count-delta
    * summary is insufficient (a segment's usable absorptions depend on
    * slots already used), so segments carry per-stage capped
    * consumed-time LISTS and the merge concatenates-then-truncates —
    * exact because the pointer trajectory never reads counts. Gated on
    * w18's oracle VERBATIM. */
  val w19_funnel_times_range_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelTimesRangeBucketed(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(("view", 2, 3), ("click", 1, 2), ("purchase", 1, 1)),
          bucketSeconds = 3600L)
        .orderBy("user_id"),
    oracle = w18_funnel_times_range.oracle)

  /** RELUCTANT consume mode ([[Funnel.funnelLoopMode]] with
    * [[Funnel.Reluctant]]) on w16's loop pattern — Flink's DEFAULT
    * loop mode, where each stage consumes EXACTLY its mandatory
    * occurrences (`greedy()` being the opt-in w16 measures): same
    * spine and stage_reached as w16 (the adjacent-types contract
    * makes existence mode-independent) but reps stop at minReps and
    * ts<j>_us is the minReps-th pick, not the last absorption. The
    * oracle is w16's pick-chain replay with each stage's repetition
    * interval rank-cut at its own minReps (the w18 cap recipe at the
    * floor m = n). FunnelSpec proves the two modes genuinely differ
    * on a crafted corpus. */
  val w49_funnel_loop_reluctant: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelLoopMode(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(("view", 2), ("click", 2), ("purchase", 1)),
          Funnel.Reluctant)
        .orderBy("user_id"),
    oracle = Some {
      def pick(k: Int, tp: String, prev: String): String =
        s"""s$k AS (SELECT user_id, us, event_id FROM (
           |  SELECT e.user_id, e.us, e.event_id,
           |    row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) AS rn
           |  FROM e JOIN $prev p ON p.user_id = e.user_id
           |    AND (e.us > p.us OR (e.us = p.us AND e.event_id > p.event_id))
           |  WHERE e.event_type = '$tp') WHERE rn = 1)""".stripMargin
      def reps(j: Int, tp: String, first: String, next: Option[String],
          cap: Int): String = {
        val nextJoin = next.map(n =>
          s"\n  LEFT JOIN $n n ON n.user_id = f.user_id").getOrElse("")
        val nextPred = next.map(_ =>
          "\n  WHERE n.user_id IS NULL OR e.us < n.us OR (e.us = n.us AND e.event_id < n.event_id)")
          .getOrElse("")
        s"""r$j AS (SELECT user_id, count(*) AS reps, max(us) AS last_us FROM (
           |  SELECT f.user_id, e.us,
           |    row_number() OVER (PARTITION BY f.user_id ORDER BY e.us, e.event_id) AS rn
           |  FROM $first f JOIN e ON e.user_id = f.user_id AND e.event_type = '$tp'
           |    AND (e.us > f.us OR (e.us = f.us AND e.event_id >= f.event_id))$nextJoin$nextPred
           |  ) WHERE rn <= $cap GROUP BY user_id)""".stripMargin
      }
      val expanded = Seq("view", "view", "click", "click", "purchase")
      val hops = (2 to 5).map(k => pick(k, expanded(k - 1), s"s${k - 1}"))
        .mkString(",\n")
      s"""WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |    event_id, event_type FROM events),
         |u AS (SELECT DISTINCT user_id FROM e),
         |s1 AS (SELECT user_id, us, event_id FROM (
         |  SELECT user_id, us, event_id,
         |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
         |  FROM e WHERE event_type = 'view') WHERE rn = 1),
         |$hops,
         |${reps(1, "view", "s1", Some("s3"), 2)},
         |${reps(2, "click", "s3", Some("s5"), 2)},
         |${reps(3, "purchase", "s5", None, 1)}
         |SELECT u.user_id,
         |  CASE WHEN s5.user_id IS NOT NULL THEN 3
         |       WHEN s4.user_id IS NOT NULL THEN 2
         |       WHEN s2.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage_reached,
         |  coalesce(r1.reps, 0) AS reps1, r1.last_us AS ts1_us,
         |  coalesce(r2.reps, 0) AS reps2, r2.last_us AS ts2_us,
         |  coalesce(r3.reps, 0) AS reps3, r3.last_us AS ts3_us
         |FROM u LEFT JOIN s2 USING (user_id) LEFT JOIN s4 USING (user_id)
         |  LEFT JOIN s5 USING (user_id)
         |  LEFT JOIN r1 USING (user_id) LEFT JOIN r2 USING (user_id)
         |  LEFT JOIN r3 USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** [[w49_funnel_loop_reluctant]] through the SKEW-SAFE twin the
    * mode flag routes to (the w19 list-carrying monoid at the m = n
    * floor). Gated on w49's oracle VERBATIM. */
  val w49b_funnel_loop_reluctant_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelLoopMode(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(("view", 2), ("click", 2), ("purchase", 1)),
          Funnel.Reluctant, bucketSeconds = Some(3600L))
        .orderBy("user_id"),
    oracle = w49_funnel_loop_reluctant.oracle)

  /** Events with the `value` column converted ONCE to integer cents —
    * the fixed-point domain every iterative-condition predicate runs
    * in (cross-engine exact: `value * 100` is one IEEE product and
    * both engines round half-away-from-zero). */
  private def eventsWithCents(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    t(spark, dir, "events").withColumn("v_cents",
      org.apache.spark.sql.functions.expr(
        "CAST(round(value * 100) AS BIGINT)"))

  private val iterStagesFirst = Seq(Funnel.IterStage("view"),
    Funnel.IterStage("click", Some(Funnel.RelGt(11, 10))),
    Funnel.IterStage("purchase", Some(Funnel.RelGt(6, 5))))

  /** ITERATIVE conditions, first-anchored
    * ([[Funnel.funnelIterative]] with [[Funnel.AnchorFirst]]) —
    * Flink CEP's `IterativeCondition`, the canonical relative
    * threshold: view → click whose value exceeds 1.1× the FIRST
    * view's → purchase exceeding 1.2× that first view. Greedy is
    * wrong (the earliest view can carry a hopeless anchor) and the
    * general NFA tracks every partial chain; the num ≥ 0
    * monotonicity contract collapses the state to ONE min anchor per
    * stage. The oracle carries the first value through chained hop
    * joins with the identical integer predicate on every hop, then
    * takes min time per stage. */
  val w50_funnel_iterative_first: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelIterative(eventsWithCents(spark, dir), "user_id",
          "event_type", "ts", "event_id", "v_cents", iterStagesFirst,
          Funnel.AnchorFirst)
        .orderBy("user_id"),
    bench = true,
    oracle = Some {
      s"""WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |    event_id, event_type, CAST(round(value * 100) AS BIGINT) AS v
         |  FROM events),
         |u AS (SELECT DISTINCT user_id FROM e),
         |c1 AS (SELECT user_id, us, event_id, v AS f FROM e
         |  WHERE event_type = 'view'),
         |c2 AS (SELECT DISTINCT e.user_id, e.us, e.event_id, p.f
         |  FROM c1 p JOIN e ON e.user_id = p.user_id
         |    AND e.event_type = 'click' AND ${sqlBefore("p", "e")}
         |    AND e.v * 10 > p.f * 11),
         |c3 AS (SELECT DISTINCT e.user_id, e.us, e.event_id, p.f
         |  FROM c2 p JOIN e ON e.user_id = p.user_id
         |    AND e.event_type = 'purchase' AND ${sqlBefore("p", "e")}
         |    AND e.v * 5 > p.f * 6),
         |m1 AS (SELECT user_id, min(us) AS ts FROM c1 GROUP BY user_id),
         |m2 AS (SELECT user_id, min(us) AS ts FROM c2 GROUP BY user_id),
         |m3 AS (SELECT user_id, min(us) AS ts FROM c3 GROUP BY user_id)
         |SELECT u.user_id,
         |  CASE WHEN m3.ts IS NOT NULL THEN 3
         |       WHEN m2.ts IS NOT NULL THEN 2
         |       WHEN m1.ts IS NOT NULL THEN 1 ELSE 0 END AS stage_reached,
         |  m1.ts AS ts1_us, m2.ts AS ts2_us, m3.ts AS ts3_us
         |FROM u LEFT JOIN m1 USING (user_id) LEFT JOIN m2 USING (user_id)
         |  LEFT JOIN m3 USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** ITERATIVE conditions, previous-anchored
    * ([[Funnel.AnchorPrev]]): each later stage's value must exceed
    * 1.1× the PREVIOUS matched value — chained relative growth, the
    * loop-previous-element flavor of Flink iterative conditions.
    * Dominance tracks the min stage-j matched value (every extension
    * rebases the anchor to the hop's own value, so the reachable-set
    * min is the running min of joining events). Oracle: the hop joins
    * carry the hop event's OWN value forward. */
  val w51_funnel_iterative_prev: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelIterative(eventsWithCents(spark, dir), "user_id",
          "event_type", "ts", "event_id", "v_cents",
          Seq(Funnel.IterStage("view"),
            Funnel.IterStage("click", Some(Funnel.RelGt(11, 10))),
            Funnel.IterStage("purchase", Some(Funnel.RelGt(11, 10)))),
          Funnel.AnchorPrev)
        .orderBy("user_id"),
    oracle = Some {
      s"""WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |    event_id, event_type, CAST(round(value * 100) AS BIGINT) AS v
         |  FROM events),
         |u AS (SELECT DISTINCT user_id FROM e),
         |c1 AS (SELECT user_id, us, event_id, v AS pv FROM e
         |  WHERE event_type = 'view'),
         |c2 AS (SELECT DISTINCT e.user_id, e.us, e.event_id, e.v AS pv
         |  FROM c1 p JOIN e ON e.user_id = p.user_id
         |    AND e.event_type = 'click' AND ${sqlBefore("p", "e")}
         |    AND e.v * 10 > p.pv * 11),
         |c3 AS (SELECT DISTINCT e.user_id, e.us, e.event_id, e.v AS pv
         |  FROM c2 p JOIN e ON e.user_id = p.user_id
         |    AND e.event_type = 'purchase' AND ${sqlBefore("p", "e")}
         |    AND e.v * 10 > p.pv * 11),
         |m1 AS (SELECT user_id, min(us) AS ts FROM c1 GROUP BY user_id),
         |m2 AS (SELECT user_id, min(us) AS ts FROM c2 GROUP BY user_id),
         |m3 AS (SELECT user_id, min(us) AS ts FROM c3 GROUP BY user_id)
         |SELECT u.user_id,
         |  CASE WHEN m3.ts IS NOT NULL THEN 3
         |       WHEN m2.ts IS NOT NULL THEN 2
         |       WHEN m1.ts IS NOT NULL THEN 1 ELSE 0 END AS stage_reached,
         |  m1.ts AS ts1_us, m2.ts AS ts2_us, m3.ts AS ts3_us
         |FROM u LEFT JOIN m1 USING (user_id) LEFT JOIN m2 USING (user_id)
         |  LEFT JOIN m3 USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** [[Funnel.funnelIterativeAuto]] — the iterative machine through
    * the feasibility router (single array fold below the threshold,
    * the wall-free sorted fold above it — AUDIT_r16_newops' measured
    * pair). Routes single at sf0.01; FunnelSpec forces both routes.
    * Gated on w50's oracle VERBATIM. */
  val w55_funnel_iterative_auto: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelIterativeAuto(eventsWithCents(spark, dir), "user_id",
          "event_type", "ts", "event_id", "v_cents", iterStagesFirst,
          Funnel.AnchorFirst)
        .orderBy("user_id"),
    oracle = w50_funnel_iterative_first.oracle)

  /** Per-stage SIMPLE conditions ([[Funnel.funnelWhere]]) — Flink
    * CEP's `where(SimpleCondition)`: view worth ≥ $5 → click worth
    * ≥ $8 → any purchase, each stage an arbitrary event-local
    * predicate (type AND value here) rather than bare type equality.
    * Greedy-earliest stays optimal (conditions read only the current
    * event); the oracle replays the chained greedy picks with each
    * hop's WHERE spelling the same predicate. */
  val w53_funnel_where: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelWhere(eventsWithCents(spark, dir), "user_id", "ts",
          "event_id", Seq("event_type", "v_cents"),
          Seq(
            e => e.getField("event_type") === "view" &&
              e.getField("v_cents") >= 500L,
            e => e.getField("event_type") === "click" &&
              e.getField("v_cents") >= 800L,
            e => e.getField("event_type") === "purchase"))
        .orderBy("user_id"),
    bench = true,
    oracle = Some {
      def pick(j: Int, cond: String, prev: Option[String]): String = {
        val from = prev.map(p =>
          s"""FROM e JOIN $p p ON p.user_id = e.user_id
             |    AND ${sqlBefore("p", "e")}""".stripMargin)
          .getOrElse("FROM e")
        s"""s$j AS (SELECT user_id, us, event_id FROM (
           |  SELECT e.user_id, e.us, e.event_id,
           |    row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) AS rn
           |  $from
           |  WHERE $cond) WHERE rn = 1)""".stripMargin
      }
      s"""WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |    event_id, event_type, CAST(round(value * 100) AS BIGINT) AS v
         |  FROM events),
         |u AS (SELECT DISTINCT user_id FROM e),
         |${pick(1, "e.event_type = 'view' AND e.v >= 500", None)},
         |${pick(2, "e.event_type = 'click' AND e.v >= 800", Some("s1"))},
         |${pick(3, "e.event_type = 'purchase'", Some("s2"))}
         |SELECT u.user_id,
         |  CASE WHEN s3.user_id IS NOT NULL THEN 3
         |       WHEN s2.user_id IS NOT NULL THEN 2
         |       WHEN s1.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage_reached,
         |  s1.us AS ts1_us, s2.us AS ts2_us, s3.us AS ts3_us
         |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
         |  LEFT JOIN s3 USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** Flink's `where(...).or(...)` — DISJUNCTIVE stage conditions,
    * pinned explicitly: [[Funnel.funnelWhere]]'s stages are arbitrary
    * `Column => Column` predicates, so the OR combinator is plain
    * predicate composition (`p1(e) || p2(e)`), not a new machine.
    * Stage 1 accepts a HIGH-VALUE view OR any error event; stage 2 a
    * click OR a purchase. The oracle spells the same disjunctions in
    * SQL over the same greedy-pick chain. */
  val w66_funnel_where_or: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelWhere(eventsWithCents(spark, dir), "user_id", "ts",
          "event_id", Seq("event_type", "v_cents"),
          Seq(
            e => (e.getField("event_type") === "view" &&
              e.getField("v_cents") >= 500L) ||
              e.getField("event_type") === "error",
            e => e.getField("event_type") === "click" ||
              e.getField("event_type") === "purchase"))
        .orderBy("user_id"),
    oracle = Some {
      def pick(j: Int, cond: String, prev: Option[String]): String = {
        val from = prev.map(p =>
          s"""FROM e JOIN $p p ON p.user_id = e.user_id
             |    AND ${sqlBefore("p", "e")}""".stripMargin)
          .getOrElse("FROM e")
        s"""s$j AS (SELECT user_id, us, event_id FROM (
           |  SELECT e.user_id, e.us, e.event_id,
           |    row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) AS rn
           |  $from
           |  WHERE $cond) WHERE rn = 1)""".stripMargin
      }
      s"""WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |    event_id, event_type, CAST(round(value * 100) AS BIGINT) AS v
         |  FROM events),
         |u AS (SELECT DISTINCT user_id FROM e),
         |${pick(1, "(e.event_type = 'view' AND e.v >= 500) OR e.event_type = 'error'", None)},
         |${pick(2, "e.event_type = 'click' OR e.event_type = 'purchase'", Some("s1"))}
         |SELECT u.user_id,
         |  CASE WHEN s2.user_id IS NOT NULL THEN 2
         |       WHEN s1.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage_reached,
         |  s1.us AS ts1_us, s2.us AS ts2_us
         |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** [[w53_funnel_where]] through the SKEW-SAFE split
    * ([[Funnel.funnelWhereBucketed]]): the funnel segment monoid never
    * read WHAT the advance test is — (exit stage, witnesses) per entry
    * stage summarizes a segment under any event-local predicate.
    * Gated on w53's oracle VERBATIM. */
  val w54_funnel_where_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelWhereBucketed(eventsWithCents(spark, dir), "user_id",
          "ts", "event_id", Seq("event_type", "v_cents"),
          Seq(
            e => e.getField("event_type") === "view" &&
              e.getField("v_cents") >= 500L,
            e => e.getField("event_type") === "click" &&
              e.getField("v_cents") >= 800L,
            e => e.getField("event_type") === "purchase"),
          bucketSeconds = 3600L)
        .orderBy("user_id"),
    oracle = w53_funnel_where.oracle)

  /** [[w50_funnel_iterative_first]] through the SKEW-SAFE plan
    * ([[Funnel.funnelIterativeSorted]]): iterative conditions break
    * the segment monoid (a segment's effect depends on entry anchors
    * through value comparisons — no O(k) summary), so the skew path
    * is the sort-based fold: one hash exchange, spill-backed
    * secondary sort, O(k) memory per key with NO 2 GB collected-row
    * wall. Gated on w50's oracle VERBATIM. */
  val w52_funnel_iterative_sorted: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelIterativeSorted(eventsWithCents(spark, dir),
          "user_id", "event_type", "ts", "event_id", "v_cents",
          iterStagesFirst, Funnel.AnchorFirst)
        .orderBy("user_id"),
    oracle = w50_funnel_iterative_first.oracle)

  // -------------------------------------------------------------------
  // CEP contiguity modes (next / notNext / optional) + match
  // enumeration (after-match-skip) — w20–w27
  // -------------------------------------------------------------------

  /** The (us, event_id) total-order comparison both engines share —
    * `a` strictly before `b`. A def, not a val: oracle-fragment
    * helpers in this file must be order-independent (the p16/t91
    * val-init trap). */
  private def sqlBefore(a: String, b: String): String =
    s"($a.us < $b.us OR ($a.us = $b.us AND $a.event_id < $b.event_id))"

  /** Relaxed hop CTE: every event of `tp` strictly after a member of
    * `prev`, with an optional immediate-successor blocker guard on the
    * predecessor (notNext: the chain died if `prev`'s VERY NEXT event
    * was the blocker and came before the consumer) and an optional
    * strict-contiguity requirement (next: the consumer IS the
    * immediate successor). */
  private def sqlHop(tag: String, tp: String, prev: String,
      strict: Boolean, notNextBlocker: Option[String]): String = {
    val strictGuard = if (strict)
      s"""
         |    AND NOT EXISTS (SELECT 1 FROM e b WHERE b.user_id = p.user_id
         |      AND ${sqlBefore("p", "b")} AND ${sqlBefore("b", "e")})""".stripMargin
    else ""
    val killGuard = notNextBlocker.map(x =>
      s"""
         |    AND NOT EXISTS (SELECT 1 FROM e b WHERE b.user_id = p.user_id
         |      AND b.event_type = '$x'
         |      AND ${sqlBefore("p", "b")} AND ${sqlBefore("b", "e")}
         |      AND NOT EXISTS (SELECT 1 FROM e c WHERE c.user_id = p.user_id
         |        AND ${sqlBefore("p", "c")} AND ${sqlBefore("c", "b")}))""".stripMargin)
      .getOrElse("")
    s"""$tag AS (SELECT DISTINCT e.user_id, e.us, e.event_id
       |  FROM $prev p JOIN e ON e.user_id = p.user_id
       |    AND e.event_type = '$tp'
       |    AND ${sqlBefore("p", "e")}$strictGuard$killGuard)""".stripMargin
  }

  private def sqlEventsPrefix: String =
    s"""WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
       |    event_id, event_type FROM events),
       |u AS (SELECT DISTINCT user_id FROM e),""".stripMargin

  /** STRICT-contiguity funnel — Flink CEP's `next`
    * ([[Funnel.funnelPattern]] with strict hops): view → click →
    * purchase where each later stage must be the IMMEDIATE successor
    * of the previous stage's event in the user's total order. Greedy
    * is wrong (the first view's successor slot can be dead while a
    * later view's is live), so the operator runs the l/o contiguity
    * NFA — 2k booleans + k first-reach longs, one user-keyed shuffle.
    * The oracle replays each hop as a join with a NOT EXISTS
    * nothing-strictly-between probe. */
  val w20_funnel_strict: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelPattern(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view"),
            Funnel.PatternStage("click", strict = true),
            Funnel.PatternStage("purchase", strict = true)))
        .orderBy("user_id"),
    bench = true,
    oracle = Some {
      s"""$sqlEventsPrefix
         |c1 AS (SELECT user_id, us, event_id FROM e WHERE event_type = 'view'),
         |${sqlHop("c2", "click", "c1", strict = true, None)},
         |${sqlHop("c3", "purchase", "c2", strict = true, None)},
         |m1 AS (SELECT user_id, min(us) AS ts FROM c1 GROUP BY user_id),
         |m2 AS (SELECT user_id, min(us) AS ts FROM c2 GROUP BY user_id),
         |m3 AS (SELECT user_id, min(us) AS ts FROM c3 GROUP BY user_id)
         |SELECT u.user_id,
         |  CASE WHEN m3.ts IS NOT NULL THEN 3 WHEN m2.ts IS NOT NULL THEN 2
         |       WHEN m1.ts IS NOT NULL THEN 1 ELSE 0 END AS stage_reached,
         |  m1.ts AS ts1_us, m2.ts AS ts2_us, m3.ts AS ts3_us
         |FROM u LEFT JOIN m1 USING (user_id) LEFT JOIN m2 USING (user_id)
         |  LEFT JOIN m3 USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** [[w20_funnel_strict]] through the SKEW-SAFE bucketed split
    * ([[Funnel.funnelPatternBucketed]], 1-hour segments): chains stay
    * independent under strict hops, so a segment's effect is linear
    * over the (l, o) entry vector — 2k+1 unit-entry folds, min-merge
    * on first-reach times. Cross-boundary adjacency is sound because
    * time buckets partition the total order contiguously. Gates
    * against w20's oracle VERBATIM. */
  val w21_funnel_strict_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelPatternBucketed(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view"),
            Funnel.PatternStage("click", strict = true),
            Funnel.PatternStage("purchase", strict = true)),
          bucketSeconds = 3600L)
        .orderBy("user_id"),
    oracle = w20_funnel_strict.oracle)

  /** OPTIONAL stage — Flink CEP's `optional()`: signup →
    * error(optional) → purchase. A chain may skip the optional stage
    * (prefix satisfied, `ts2_us` NULL on the skipping path) while an
    * actual error match still stamps its first-reach time. With the
    * middle stage optional, prefix 2 is satisfiable exactly when
    * prefix 1 is, so `stage_reached` is never 1 — both engines encode
    * that. */
  val w22_funnel_optional: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelPattern(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("signup"),
            Funnel.PatternStage("error", optional = true),
            Funnel.PatternStage("purchase")))
        .orderBy("user_id"),
    oracle = Some {
      s"""$sqlEventsPrefix
         |c1 AS (SELECT user_id, us, event_id FROM e WHERE event_type = 'signup'),
         |${sqlHop("c2", "error", "c1", strict = false, None)},
         |eff2 AS (SELECT * FROM c2 UNION SELECT * FROM c1),
         |${sqlHop("c3", "purchase", "eff2", strict = false, None)},
         |m1 AS (SELECT user_id, min(us) AS ts FROM c1 GROUP BY user_id),
         |m2 AS (SELECT user_id, min(us) AS ts FROM c2 GROUP BY user_id),
         |m3 AS (SELECT user_id, min(us) AS ts FROM c3 GROUP BY user_id)
         |SELECT u.user_id,
         |  CASE WHEN m3.ts IS NOT NULL THEN 3
         |       WHEN m1.ts IS NOT NULL THEN 2 ELSE 0 END AS stage_reached,
         |  m1.ts AS ts1_us, m2.ts AS ts2_us, m3.ts AS ts3_us
         |FROM u LEFT JOIN m1 USING (user_id) LEFT JOIN m2 USING (user_id)
         |  LEFT JOIN m3 USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** `notNext` gap guard — view whose IMMEDIATE successor is not an
    * error, then (relaxed) purchase. Unlike notFollowedBy (w10, any
    * blocker in the gap kills), only the very next event can poison
    * the chain here; the already-reached prefix stays counted (sticky
    * ever). The oracle's kill probe is a doubly-nested NOT EXISTS:
    * a blocker after the view with nothing between them, before the
    * consumer. */
  val w23_funnel_not_next: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelPattern(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view", notNextAfter = Some("error")),
            Funnel.PatternStage("purchase")))
        .orderBy("user_id"),
    oracle = Some {
      s"""$sqlEventsPrefix
         |c1 AS (SELECT user_id, us, event_id FROM e WHERE event_type = 'view'),
         |${sqlHop("c2", "purchase", "c1", strict = false, Some("error"))},
         |m1 AS (SELECT user_id, min(us) AS ts FROM c1 GROUP BY user_id),
         |m2 AS (SELECT user_id, min(us) AS ts FROM c2 GROUP BY user_id)
         |SELECT u.user_id,
         |  CASE WHEN m2.ts IS NOT NULL THEN 2
         |       WHEN m1.ts IS NOT NULL THEN 1 ELSE 0 END AS stage_reached,
         |  m1.ts AS ts1_us, m2.ts AS ts2_us
         |FROM u LEFT JOIN m1 USING (user_id) LEFT JOIN m2 USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** The contiguity PRODUCT — all three new combinators in one
    * pattern: view (immediate successor must not be an error) →
    * click(optional) → purchase(strict). The strict purchase hop may
    * ride the optional skip (immediately after the click, or
    * immediately after the view itself — where the view's notNext
    * guard can never bite, since the purchase occupies the immediate
    * slot). */
  val w24_funnel_pattern_product: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelPattern(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view", notNextAfter = Some("error")),
            Funnel.PatternStage("click", optional = true),
            Funnel.PatternStage("purchase", strict = true)))
        .orderBy("user_id"),
    bench = true,
    oracle = Some {
      s"""$sqlEventsPrefix
         |c1 AS (SELECT user_id, us, event_id FROM e WHERE event_type = 'view'),
         |${sqlHop("c2", "click", "c1", strict = false, Some("error"))},
         |eff2 AS (SELECT * FROM c2 UNION SELECT * FROM c1),
         |${sqlHop("c3", "purchase", "eff2", strict = true, None)},
         |m1 AS (SELECT user_id, min(us) AS ts FROM c1 GROUP BY user_id),
         |m2 AS (SELECT user_id, min(us) AS ts FROM c2 GROUP BY user_id),
         |m3 AS (SELECT user_id, min(us) AS ts FROM c3 GROUP BY user_id)
         |SELECT u.user_id,
         |  CASE WHEN m3.ts IS NOT NULL THEN 3
         |       WHEN m1.ts IS NOT NULL THEN 2 ELSE 0 END AS stage_reached,
         |  m1.ts AS ts1_us, m2.ts AS ts2_us, m3.ts AS ts3_us
         |FROM u LEFT JOIN m1 USING (user_id) LEFT JOIN m2 USING (user_id)
         |  LEFT JOIN m3 USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** [[w24_funnel_pattern_product]] through the bucketed split —
    * notNext kills discriminate only by last-ness, which the (l, o)
    * entry vector carries, so segment linearity survives the full
    * combinator product. Gated on w24's oracle VERBATIM. */
  val w25_funnel_pattern_product_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelPatternBucketed(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view", notNextAfter = Some("error")),
            Funnel.PatternStage("click", optional = true),
            Funnel.PatternStage("purchase", strict = true)),
          bucketSeconds = 3600L)
        .orderBy("user_id"),
    oracle = w24_funnel_pattern_product.oracle)

  /** [[Funnel.funnelPatternAuto]] — the contiguity-NFA pair through
    * the round-16 feasibility router (the w44 recipe extended to the
    * pattern family): one peak-per-key probe, single NFA fold below
    * [[Funnel.AutoBucketKeyEvents]], the (l, o) segment split above
    * it. Routes single at sf0.01; FunnelSpec forces both routes and
    * proves them equal. Gated on w24's oracle VERBATIM. */
  val w47_funnel_pattern_auto: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelPatternAuto(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view", notNextAfter = Some("error")),
            Funnel.PatternStage("click", optional = true),
            Funnel.PatternStage("purchase", strict = true)))
        .orderBy("user_id"),
    oracle = w24_funnel_pattern_product.oracle)

  /** The CONTIGUITY × WITHIN product
    * ([[Funnel.funnelPatternWithin]]): w24's full combinator pattern —
    * view (notNext `error`) → click (optional) → purchase (strict) —
    * under a 2-hour `within` window, Flink's `Pattern.within(T)` on a
    * next/notNext/optional pattern. The machine lifts the l/o NFA's
    * booleans to max-start slot values with the deadline checked per
    * advance; the oracle carries each chain's START through the w24
    * hop joins and bounds every hop at `start + T`, then aggregates
    * max-start per stage (the skip-realizer rule makes reached-2's
    * winner the stage-1 max). */
  val w42_funnel_pattern_within: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelPatternWithin(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view", notNextAfter = Some("error")),
            Funnel.PatternStage("click", optional = true),
            Funnel.PatternStage("purchase", strict = true)),
          windowMicros = 7200L * 1000000L)
        .orderBy("user_id"),
    bench = true,
    oracle = Some {
      val T = 7200L * 1000000L
      s"""$sqlEventsPrefix
         |c1 AS (SELECT user_id, us AS su, event_id AS so, us, event_id
         |  FROM e WHERE event_type = 'view'),
         |c2 AS (SELECT DISTINCT p.user_id, p.su, p.so, e.us, e.event_id
         |  FROM c1 p JOIN e ON e.user_id = p.user_id
         |    AND e.event_type = 'click'
         |    AND ${sqlBefore("p", "e")}
         |    AND e.us - p.su <= $T
         |    AND NOT EXISTS (SELECT 1 FROM e b WHERE b.user_id = p.user_id
         |      AND b.event_type = 'error'
         |      AND ${sqlBefore("p", "b")} AND ${sqlBefore("b", "e")}
         |      AND NOT EXISTS (SELECT 1 FROM e c WHERE c.user_id = p.user_id
         |        AND ${sqlBefore("p", "c")} AND ${sqlBefore("c", "b")}))),
         |eff2 AS (SELECT * FROM c2 UNION SELECT * FROM c1),
         |c3 AS (SELECT DISTINCT p.user_id, p.su, p.so, e.us, e.event_id
         |  FROM eff2 p JOIN e ON e.user_id = p.user_id
         |    AND e.event_type = 'purchase'
         |    AND ${sqlBefore("p", "e")}
         |    AND e.us - p.su <= $T
         |    AND NOT EXISTS (SELECT 1 FROM e b WHERE b.user_id = p.user_id
         |      AND ${sqlBefore("p", "b")} AND ${sqlBefore("b", "e")})),
         |m1 AS (SELECT user_id, max(su) AS v FROM c1 GROUP BY user_id),
         |m3 AS (SELECT user_id, max(su) AS v FROM c3 GROUP BY user_id)
         |SELECT u.user_id,
         |  CAST(CASE WHEN m3.v IS NOT NULL THEN 3
         |            WHEN m1.v IS NOT NULL THEN 2 ELSE 0 END AS INT)
         |    AS stage_reached,
         |  CASE WHEN m3.v IS NOT NULL THEN m3.v ELSE m1.v END
         |    AS win_start_us
         |FROM u LEFT JOIN m1 USING (user_id) LEFT JOIN m3 USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** [[w42_funnel_pattern_within]] through the SKEW-SAFE split
    * ([[Funnel.funnelPatternWithinBucketed]]): fresh product-NFA fold
    * plus 2k entry folds carrying first-reach times per (stage, l/o)
    * slot; composition applies the deadline once per target against
    * the carried max-start. Gated on w42's oracle VERBATIM. */
  val w43_funnel_pattern_within_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelPatternWithinBucketed(t(spark, dir, "events"),
          "user_id", "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view", notNextAfter = Some("error")),
            Funnel.PatternStage("click", optional = true),
            Funnel.PatternStage("purchase", strict = true)),
          windowMicros = 7200L * 1000000L, bucketSeconds = 3600L)
        .orderBy("user_id"),
    oracle = w42_funnel_pattern_within.oracle)

  /** [[Funnel.funnelPatternWithinAuto]] — w42's product NFA through
    * the feasibility router (twins were flat at the 20M power key, so
    * the threshold only guards the 2 GB wall). Routes single at
    * sf0.01; FunnelSpec forces both routes. Gated on w42's oracle
    * VERBATIM. */
  val w48_funnel_pattern_within_auto: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelPatternWithinAuto(t(spark, dir, "events"),
          "user_id", "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view", notNextAfter = Some("error")),
            Funnel.PatternStage("click", optional = true),
            Funnel.PatternStage("purchase", strict = true)),
          windowMicros = 7200L * 1000000L)
        .orderBy("user_id"),
    oracle = w42_funnel_pattern_within.oracle)

  /** Loop boundary condition — Flink CEP's `until`
    * ([[Funnel.funnelLoopUntil]]): view(1+, until `signup`) →
    * click(2+) → purchase(1+, until `error`). A close during a
    * stage's mandatory block stalls the pattern (u's with a signup
    * before their first view report 0); a close while the loop is
    * open truncates absorption only — the spine still advances. The
    * oracle replays the machine as the w16 pick chain with each
    * stage's repetition interval additionally truncated at its first
    * until event (stage 1's measured from the log start — the machine
    * is current in stage 1 before its first pick), and the whole row
    * zeroed when stage 1 closed unstarted. */
  /** Loop-internal CONTIGUITY — Flink CEP's `oneOrMore.consecutive()`
    * ([[Funnel.funnelLoopConsecutive]]): view{2+ consecutive} →
    * click{2+ consecutive}, each repetition block a run of IMMEDIATELY
    * adjacent same-type events (any intervening event resets a partial
    * block, permanently closes a completed one); between stages
    * contiguity stays relaxed. The oracle is the chained
    * immediate-successor formulation: per-type maximal runs via
    * gaps-and-islands, the earliest island of length ≥ minReps after
    * the previous stage's completion index per stage, and the island
    * containing the user's last event for the trailing partial run. */
  val w38_funnel_loop_consecutive: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelLoopConsecutive(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq("view" -> 2, "click" -> 2))
        .orderBy("user_id"),
    bench = true,
    oracle = Some(
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    event_id, event_type FROM events),
        |u AS (SELECT DISTINCT user_id FROM e),
        |ei AS (SELECT user_id, us, event_id, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY us, event_id)
        |    AS idx FROM e),
        |isl AS (SELECT *, idx - row_number() OVER (
        |    PARTITION BY user_id, event_type ORDER BY idx) AS grp FROM ei),
        |islands AS (SELECT user_id, event_type, grp, min(idx) AS s,
        |    max(idx) AS e2, CAST(count(*) AS BIGINT) AS len, max(us) AS lus
        |  FROM isl GROUP BY 1, 2, 3),
        |lastidx AS (SELECT user_id, max(idx) AS mx FROM ei GROUP BY user_id),
        |c1 AS (SELECT user_id, s, len, lus FROM (
        |  SELECT user_id, s, len, lus,
        |    row_number() OVER (PARTITION BY user_id ORDER BY s) AS rn
        |  FROM islands WHERE event_type = 'view' AND len >= 2) WHERE rn = 1),
        |c2 AS (SELECT user_id, s, len, lus FROM (
        |  SELECT i.user_id, i.s, i.len, i.lus,
        |    row_number() OVER (PARTITION BY i.user_id ORDER BY i.s) AS rn
        |  FROM islands i JOIN c1 ON c1.user_id = i.user_id
        |  WHERE i.event_type = 'click' AND i.len >= 2 AND i.s > c1.s + 1)
        |  WHERE rn = 1),
        |tr AS (SELECT i.user_id, i.event_type AS ttp, i.s AS tst,
        |    i.len AS tlen, i.lus AS tlus
        |  FROM islands i JOIN lastidx x ON x.user_id = i.user_id
        |    AND i.e2 = x.mx)
        |SELECT u.user_id,
        |  CAST(CASE WHEN c2.s IS NOT NULL THEN 2
        |            WHEN c1.s IS NOT NULL THEN 1 ELSE 0 END AS INT)
        |    AS stage_reached,
        |  CAST(CASE WHEN c1.s IS NOT NULL THEN c1.len
        |            WHEN tr.ttp = 'view' THEN tr.tlen
        |            ELSE 0 END AS BIGINT) AS reps1,
        |  CASE WHEN c1.s IS NOT NULL THEN c1.lus
        |       WHEN tr.ttp = 'view' THEN tr.tlus ELSE NULL END AS ts1_us,
        |  CAST(CASE WHEN c2.s IS NOT NULL THEN c2.len
        |            WHEN c1.s IS NOT NULL AND tr.ttp = 'click'
        |              AND tr.tst > c1.s + 1 THEN tr.tlen
        |            ELSE 0 END AS BIGINT) AS reps2,
        |  CASE WHEN c2.s IS NOT NULL THEN c2.lus
        |       WHEN c1.s IS NOT NULL AND tr.ttp = 'click'
        |         AND tr.tst > c1.s + 1 THEN tr.tlus ELSE NULL END AS ts2_us
        |FROM u LEFT JOIN c1 USING (user_id) LEFT JOIN c2 USING (user_id)
        |  LEFT JOIN tr USING (user_id)
        |ORDER BY user_id""".stripMargin))

  /** RELUCTANT consume mode × loop-internal contiguity
    * ([[Funnel.funnelLoopConsecutiveMode]] with [[Funnel.Reluctant]])
    * on w38's pattern — the consume-mode axis completed on the
    * consecutive machine: the spine and stage_reached are
    * mode-independent (the run's remainder is same-type, so
    * absorption never touches the next stage's pick), but a completed
    * stage reports exactly minReps and the mandatory block's m-th
    * occurrence time instead of the full run. The oracle is w38's
    * gaps-and-islands replay with each completed stage's reps
    * literal-capped and its time read from the island's (s+m-1)-th
    * event (one idx join); trailing-partial branches are unchanged —
    * a partial run consumes identically under both modes. The
    * bucketed twin gates on the same oracle (w56b): the entry-state
    * machinery is mode-independent (a reluctant open segment's count
    * delta is zero). */
  val w56_funnel_loop_consecutive_reluctant: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelLoopConsecutiveMode(t(spark, dir, "events"),
          "user_id", "event_type", "ts", "event_id",
          Seq("view" -> 2, "click" -> 2), Funnel.Reluctant)
        .orderBy("user_id"),
    oracle = Some(
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    event_id, event_type FROM events),
        |u AS (SELECT DISTINCT user_id FROM e),
        |ei AS (SELECT user_id, us, event_id, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY us, event_id)
        |    AS idx FROM e),
        |isl AS (SELECT *, idx - row_number() OVER (
        |    PARTITION BY user_id, event_type ORDER BY idx) AS grp FROM ei),
        |islands AS (SELECT user_id, event_type, grp, min(idx) AS s,
        |    max(idx) AS e2, CAST(count(*) AS BIGINT) AS len, max(us) AS lus
        |  FROM isl GROUP BY 1, 2, 3),
        |lastidx AS (SELECT user_id, max(idx) AS mx FROM ei GROUP BY user_id),
        |c1 AS (SELECT user_id, s, len, lus FROM (
        |  SELECT user_id, s, len, lus,
        |    row_number() OVER (PARTITION BY user_id ORDER BY s) AS rn
        |  FROM islands WHERE event_type = 'view' AND len >= 2) WHERE rn = 1),
        |c2 AS (SELECT user_id, s, len, lus FROM (
        |  SELECT i.user_id, i.s, i.len, i.lus,
        |    row_number() OVER (PARTITION BY i.user_id ORDER BY i.s) AS rn
        |  FROM islands i JOIN c1 ON c1.user_id = i.user_id
        |  WHERE i.event_type = 'click' AND i.len >= 2 AND i.s > c1.s + 1)
        |  WHERE rn = 1),
        |r1 AS (SELECT c1.user_id, ei.us FROM c1
        |  JOIN ei ON ei.user_id = c1.user_id AND ei.idx = c1.s + 1),
        |r2 AS (SELECT c2.user_id, ei.us FROM c2
        |  JOIN ei ON ei.user_id = c2.user_id AND ei.idx = c2.s + 1),
        |tr AS (SELECT i.user_id, i.event_type AS ttp, i.s AS tst,
        |    i.len AS tlen, i.lus AS tlus
        |  FROM islands i JOIN lastidx x ON x.user_id = i.user_id
        |    AND i.e2 = x.mx)
        |SELECT u.user_id,
        |  CAST(CASE WHEN c2.s IS NOT NULL THEN 2
        |            WHEN c1.s IS NOT NULL THEN 1 ELSE 0 END AS INT)
        |    AS stage_reached,
        |  CAST(CASE WHEN c1.s IS NOT NULL THEN 2
        |            WHEN tr.ttp = 'view' THEN tr.tlen
        |            ELSE 0 END AS BIGINT) AS reps1,
        |  CASE WHEN c1.s IS NOT NULL THEN r1.us
        |       WHEN tr.ttp = 'view' THEN tr.tlus ELSE NULL END AS ts1_us,
        |  CAST(CASE WHEN c2.s IS NOT NULL THEN 2
        |            WHEN c1.s IS NOT NULL AND tr.ttp = 'click'
        |              AND tr.tst > c1.s + 1 THEN tr.tlen
        |            ELSE 0 END AS BIGINT) AS reps2,
        |  CASE WHEN c2.s IS NOT NULL THEN r2.us
        |       WHEN c1.s IS NOT NULL AND tr.ttp = 'click'
        |         AND tr.tst > c1.s + 1 THEN tr.tlus ELSE NULL END AS ts2_us
        |FROM u LEFT JOIN c1 USING (user_id) LEFT JOIN c2 USING (user_id)
        |  LEFT JOIN r1 USING (user_id) LEFT JOIN r2 USING (user_id)
        |  LEFT JOIN tr USING (user_id)
        |ORDER BY user_id""".stripMargin))

  /** [[w56_funnel_loop_consecutive_reluctant]] through the SKEW-SAFE
    * segment split. Gated on w56's oracle VERBATIM. */
  val w56b_funnel_loop_consecutive_reluctant_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelLoopConsecutiveMode(t(spark, dir, "events"),
          "user_id", "event_type", "ts", "event_id",
          Seq("view" -> 2, "click" -> 2), Funnel.Reluctant,
          bucketSeconds = Some(3600L))
        .orderBy("user_id"),
    oracle = w56_funnel_loop_consecutive_reluctant.oracle)

  /** Consume mode THROUGH the auto-router
    * ([[Funnel.funnelLoopConsecutiveAuto]] with [[Funnel.Reluctant]]):
    * `maxKeyEvents = 1` forces the above-threshold route, so this row
    * proves a reluctant call lands on the reluctant BUCKETED twin —
    * not a silently-greedy one (the round-16 verdict's router/mode
    * coverage gap). Gated on w56's oracle VERBATIM; the router audit
    * (AuditR17) additionally pins the picked route structurally. */
  val w58_funnel_loop_consecutive_auto_reluctant: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelLoopConsecutiveAuto(t(spark, dir, "events"),
          "user_id", "event_type", "ts", "event_id",
          Seq("view" -> 2, "click" -> 2), bucketSeconds = 3600L,
          maxKeyEvents = 1L, mode = Funnel.Reluctant)
        .orderBy("user_id"),
    oracle = w56_funnel_loop_consecutive_reluctant.oracle)

  /** GROUP pattern under `times(n)` ([[Funnel.funnelGroupTimes]]) —
    * Flink CEP's GroupPattern: the quantifier applied to a SEQUENCE
    * (`begin(begin("view").next("click")).times(2)`). The reduction is
    * stage-list expansion (w12's rule) composed with the contiguity
    * NFA: two copies of the group, strict INSIDE each copy, the seam
    * relaxed (Flink's default `times` contiguity between repetitions).
    * Oracle: the w20 chained-join replay over the expanded hop list —
    * immediate-successor guards on the in-copy hops, none at the
    * seam — projected to repetitions. */
  val w59_funnel_group_times: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupTimes(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view"),
            Funnel.PatternStage("click", strict = true)), times = 2)
        .orderBy("user_id"),
    bench = true,
    oracle = Some {
      s"""$sqlEventsPrefix
         |c1 AS (SELECT user_id, us, event_id FROM e WHERE event_type = 'view'),
         |${sqlHop("c2", "click", "c1", strict = true, None)},
         |${sqlHop("c3", "view", "c2", strict = false, None)},
         |${sqlHop("c4", "click", "c3", strict = true, None)},
         |m1 AS (SELECT user_id, min(us) AS ts FROM c1 GROUP BY user_id),
         |m2 AS (SELECT user_id, min(us) AS ts FROM c2 GROUP BY user_id),
         |m3 AS (SELECT user_id, min(us) AS ts FROM c3 GROUP BY user_id),
         |m4 AS (SELECT user_id, min(us) AS ts FROM c4 GROUP BY user_id)
         |SELECT u.user_id,
         |  CAST(CASE WHEN m4.ts IS NOT NULL THEN 2
         |            WHEN m2.ts IS NOT NULL THEN 1 ELSE 0 END AS INT)
         |    AS reps_completed,
         |  m1.ts AS ts_r1_s1_us, m2.ts AS ts_r1_s2_us,
         |  m3.ts AS ts_r2_s1_us, m4.ts AS ts_r2_s2_us
         |FROM u LEFT JOIN m1 USING (user_id) LEFT JOIN m2 USING (user_id)
         |  LEFT JOIN m3 USING (user_id) LEFT JOIN m4 USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** [[w59_funnel_group_times]] through the SKEW-SAFE bucketed split
    * ([[Funnel.funnelGroupTimesBucketed]]): the segment split never
    * reads what the stage list means, only its length. Gates on w59's
    * oracle VERBATIM. */
  val w59b_funnel_group_times_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupTimesBucketed(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view"),
            Funnel.PatternStage("click", strict = true)), times = 2,
          bucketSeconds = 3600L)
        .orderBy("user_id"),
    oracle = w59_funnel_group_times.oracle)

  /** [[w59_funnel_group_times]] with CONSECUTIVE seams — Flink's
    * `consecutive()` on the GROUP: repetitions must be strictly
    * contiguous with each other, so the seam hop carries the same
    * immediate-successor guard as the in-copy hops. Gated against the
    * oracle with the seam guard ADDED — the pair (w59, w60) pins the
    * seam-contiguity axis cross-engine. */
  val w60_funnel_group_times_consecutive: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupTimes(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view"),
            Funnel.PatternStage("click", strict = true)), times = 2,
          consecutiveSeams = true)
        .orderBy("user_id"),
    oracle = Some {
      s"""$sqlEventsPrefix
         |c1 AS (SELECT user_id, us, event_id FROM e WHERE event_type = 'view'),
         |${sqlHop("c2", "click", "c1", strict = true, None)},
         |${sqlHop("c3", "view", "c2", strict = true, None)},
         |${sqlHop("c4", "click", "c3", strict = true, None)},
         |m1 AS (SELECT user_id, min(us) AS ts FROM c1 GROUP BY user_id),
         |m2 AS (SELECT user_id, min(us) AS ts FROM c2 GROUP BY user_id),
         |m3 AS (SELECT user_id, min(us) AS ts FROM c3 GROUP BY user_id),
         |m4 AS (SELECT user_id, min(us) AS ts FROM c4 GROUP BY user_id)
         |SELECT u.user_id,
         |  CAST(CASE WHEN m4.ts IS NOT NULL THEN 2
         |            WHEN m2.ts IS NOT NULL THEN 1 ELSE 0 END AS INT)
         |    AS reps_completed,
         |  m1.ts AS ts_r1_s1_us, m2.ts AS ts_r1_s2_us,
         |  m3.ts AS ts_r2_s1_us, m4.ts AS ts_r2_s2_us
         |FROM u LEFT JOIN m1 USING (user_id) LEFT JOIN m2 USING (user_id)
         |  LEFT JOIN m3 USING (user_id) LEFT JOIN m4 USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** GROUP pattern × WITHIN ([[Funnel.funnelGroupTimesWithin]]) —
    * Flink's `within(T)` on a group-quantified pattern: BOTH
    * repetitions must land inside one window from the first matched
    * event. The oracle is the w42 recipe over the expanded hop list:
    * each hop carries the chain's start and bounds at `start + T`;
    * in-copy hops keep the immediate-successor guard, the seam stays
    * relaxed; max-start per deepest reached flat stage is the window
    * observable (the w8 dominance). */
  val w61_funnel_group_times_within: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupTimesWithin(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view"),
            Funnel.PatternStage("click", strict = true)), times = 2,
          windowMicros = 7200L * 1000000L)
        .orderBy("user_id"),
    oracle = Some {
      val T = 7200L * 1000000L
      def hop(tag: String, tp: String, prev: String,
          strict: Boolean): String = {
        val strictGuard = if (strict)
          s"""
             |    AND NOT EXISTS (SELECT 1 FROM e b WHERE b.user_id = p.user_id
             |      AND ${sqlBefore("p", "b")} AND ${sqlBefore("b", "e")})""".stripMargin
        else ""
        s"""$tag AS (SELECT DISTINCT p.user_id, p.su, p.so, e.us, e.event_id
           |  FROM $prev p JOIN e ON e.user_id = p.user_id
           |    AND e.event_type = '$tp'
           |    AND ${sqlBefore("p", "e")}
           |    AND e.us - p.su <= $T$strictGuard)""".stripMargin
      }
      s"""$sqlEventsPrefix
         |c1 AS (SELECT user_id, us AS su, event_id AS so, us, event_id
         |  FROM e WHERE event_type = 'view'),
         |${hop("c2", "click", "c1", strict = true)},
         |${hop("c3", "view", "c2", strict = false)},
         |${hop("c4", "click", "c3", strict = true)},
         |m1 AS (SELECT user_id, max(su) AS v FROM c1 GROUP BY user_id),
         |m2 AS (SELECT user_id, max(su) AS v FROM c2 GROUP BY user_id),
         |m3 AS (SELECT user_id, max(su) AS v FROM c3 GROUP BY user_id),
         |m4 AS (SELECT user_id, max(su) AS v FROM c4 GROUP BY user_id)
         |SELECT u.user_id,
         |  CAST(CASE WHEN m4.v IS NOT NULL THEN 2
         |            WHEN m2.v IS NOT NULL THEN 1 ELSE 0 END AS INT)
         |    AS reps_completed,
         |  COALESCE(m4.v, m3.v, m2.v, m1.v) AS win_start_us
         |FROM u LEFT JOIN m1 USING (user_id) LEFT JOIN m2 USING (user_id)
         |  LEFT JOIN m3 USING (user_id) LEFT JOIN m4 USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** Greedy-earliest repetition chain for the RELAXED-seam group
    * loop, unrolled: rep k's completion is the earliest click whose
    * view falls strictly after rep k−1's completion (exchange
    * argument: under relaxed seams an earlier completion leaves a
    * suffix superset, so the greedy chain depth IS the max). Total
    * order via per-user row_number (us, event_id). */
  private def duckGroupLoopGreedy(rounds: Int): String = {
    val ei =
      """ei AS MATERIALIZED (SELECT user_id, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY us, event_id)
        |    AS idx FROM e)""".stripMargin
    val steps = (1 to rounds).map { k =>
      val vSrc =
        if (k == 1)
          s"""r${k}v AS MATERIALIZED (SELECT user_id, min(idx) AS vi FROM ei
             |  WHERE event_type = 'view' GROUP BY user_id)""".stripMargin
        else
          s"""r${k}v AS MATERIALIZED (SELECT e.user_id, min(e.idx) AS vi
             |  FROM ei e JOIN r${k - 1}c p ON p.user_id = e.user_id
             |    AND e.idx > p.ci
             |  WHERE e.event_type = 'view' GROUP BY e.user_id)""".stripMargin
      s"""$vSrc,
         |r${k}c AS MATERIALIZED (SELECT e.user_id, min(e.idx) AS ci
         |  FROM ei e JOIN r${k}v p ON p.user_id = e.user_id
         |    AND e.idx > p.vi
         |  WHERE e.event_type = 'click' GROUP BY e.user_id)""".stripMargin
    }.mkString(",\n")
    val lv = (1 to rounds).map(k =>
      s"SELECT user_id, $k AS lvl FROM r${k}c").mkString(" UNION ALL ")
    s"$ei,\n$steps,\nlv AS ($lv)"
  }

  /** [[duckGroupLoopGreedy]] with the TRAILING seam guard: the click
    * pick additionally requires the completion's immediate successor
    * not be the blocker (end-of-log passes — `next_tp IS NULL`).
    * Greedy-earliest stays existence-optimal under relaxed seams with
    * the guard folded into the pick: validity is a property of the
    * completion index alone, so taking the earliest VALID completion
    * still leaves a suffix superset (the same exchange argument). */
  private def duckGroupLoopGreedyGuarded(rounds: Int,
      blocker: String): String = {
    val ei =
      s"""ei AS MATERIALIZED (SELECT user_id, event_type,
         |  row_number() OVER (PARTITION BY user_id ORDER BY us, event_id)
         |    AS idx,
         |  lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
         |    AS next_tp FROM e)""".stripMargin
    val steps = (1 to rounds).map { k =>
      val vSrc =
        if (k == 1)
          s"""r${k}v AS MATERIALIZED (SELECT user_id, min(idx) AS vi FROM ei
             |  WHERE event_type = 'view' GROUP BY user_id)""".stripMargin
        else
          s"""r${k}v AS MATERIALIZED (SELECT e.user_id, min(e.idx) AS vi
             |  FROM ei e JOIN r${k - 1}c p ON p.user_id = e.user_id
             |    AND e.idx > p.ci
             |  WHERE e.event_type = 'view' GROUP BY e.user_id)""".stripMargin
      s"""$vSrc,
         |r${k}c AS MATERIALIZED (SELECT e.user_id, min(e.idx) AS ci
         |  FROM ei e JOIN r${k}v p ON p.user_id = e.user_id
         |    AND e.idx > p.vi
         |  WHERE e.event_type = 'click'
         |    AND (e.next_tp IS NULL OR e.next_tp <> '$blocker')
         |  GROUP BY e.user_id)""".stripMargin
    }.mkString(",\n")
    val lv = (1 to rounds).map(k =>
      s"SELECT user_id, $k AS lvl FROM r${k}c").mkString(" UNION ALL ")
    s"$ei,\n$steps,\nlv AS ($lv)"
  }

  /** GROUP `oneOrMore` with a TRAILING seam guard
    * ([[Funnel.PatternStage]]`("click", notNextAfter = "error")` as
    * the group's LAST stage, round 18) — Flink's gap guard where it
    * is genuinely meaningful for a loop: a repetition whose
    * completing click is immediately followed by an error is INVALID
    * (the chain dies at the blocker — no seam extension, no count);
    * completions at end-of-log pass. The machine is the dominance
    * fold's `bl` kill transition — still max-plus linear, so the
    * bucketed twin (w71b) carries it through the gain matrices
    * unchanged. Oracle: the guarded greedy-earliest chain —
    * exchange-optimal because completion validity is an index
    * property (see [[duckGroupLoopGreedyGuarded]]). */
  val w71_funnel_group_loop_seam_guard: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupLoop(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view"),
            Funnel.PatternStage("click", notNextAfter = Some("error"))))
        .orderBy("user_id"),
    oracle = Some(
      s"""$sqlEventsPrefix
         |${duckGroupLoopGreedyGuarded(28, "error")}
         |SELECT u.user_id, CAST(COALESCE(max(lvl), 0) AS BIGINT) AS reps
         |FROM u LEFT JOIN lv USING (user_id)
         |GROUP BY u.user_id ORDER BY u.user_id""".stripMargin))

  /** [[w71_funnel_group_loop_seam_guard]] through the TROPICAL
    * segment split: the kill is the -inf coefficient, linear, so the
    * twin gates on w71's oracle VERBATIM. */
  val w71b_funnel_group_loop_seam_guard_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupLoopBucketed(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view"),
            Funnel.PatternStage("click", notNextAfter = Some("error"))),
          bucketSeconds = 3600L)
        .orderBy("user_id"),
    oracle = w71_funnel_group_loop_seam_guard.oracle)

  /** BOUNDED group quantifier WITH a trailing seam guard —
    * `begin(view→click·notNextAfter(error)).times(2,3)`, the one
    * combination the stage-list expansion rejects, now ROUTED through
    * the capped dominance machine (round 19, closing the r18
    * verdict's last missing surface): cap = maxTimes saturates the
    * guarded fold's completion step (truncation lemma — a kept
    * prefix's guard outcomes are index properties of the event
    * stream, unchanged by dropping the suffix), `matched = reps >=
    * minTimes`. The gate calls the PUBLIC [[Funnel
    * .funnelGroupTimesRange]] so the routing itself is gated; output
    * is the guarded report shape `(user_id, reps_completed,
    * matched)`. Oracle: the guarded greedy-earliest chain (w71's)
    * with `LEAST(·, 3)` and the `>= 2` threshold. */
  val w72_funnel_group_times_range_guarded: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupTimesRange(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view"),
            Funnel.PatternStage("click", notNextAfter = Some("error"))),
          minTimes = 2, maxTimes = 3)
        .orderBy("user_id"),
    oracle = Some(
      s"""$sqlEventsPrefix
         |${duckGroupLoopGreedyGuarded(28, "error")}
         |SELECT u.user_id,
         |  CAST(LEAST(COALESCE(max(lvl), 0), 3) AS INT) AS reps_completed,
         |  (COALESCE(max(lvl), 0) >= 2) AS matched
         |FROM u LEFT JOIN lv USING (user_id)
         |GROUP BY u.user_id ORDER BY u.user_id""".stripMargin))

  /** [[w72_funnel_group_times_range_guarded]] through the TROPICAL
    * segment split: the guarded gain matrices run UNCHANGED (the kill
    * is the −inf coefficient, w71b) and the cap applies to the OUTPUT
    * (min-with-constant is not max-plus linear; the w68b placement
    * argument). Gates on w72's oracle VERBATIM. */
  val w72b_funnel_group_times_range_guarded_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupTimesRangeGuarded(t(spark, dir, "events"),
          "user_id", "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view"),
            Funnel.PatternStage("click", notNextAfter = Some("error"))),
          minTimes = 2, maxTimes = 3, bucketSeconds = Some(3600L))
        .orderBy("user_id"),
    oracle = w72_funnel_group_times_range_guarded.oracle)

  /** [[w72_funnel_group_times_range_guarded]] through the AUTO router
    * ([[Funnel.funnelGroupTimesRangeGuardedAuto]]): the guarded range
    * rides the measured feasibility routing — below the 24M threshold
    * this is the capped single fold. Gates on w72's oracle VERBATIM
    * (the w68c auto-gate pattern). */
  val w72c_funnel_group_times_range_guarded_auto: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupTimesRangeGuardedAuto(t(spark, dir, "events"),
          "user_id", "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view"),
            Funnel.PatternStage("click", notNextAfter = Some("error"))),
          minTimes = 2, maxTimes = 3)
        .orderBy("user_id"),
    oracle = w72_funnel_group_times_range_guarded.oracle)

  /** GROUP pattern under `oneOrMore` ([[Funnel.funnelGroupLoop]]) —
    * the UNBOUNDED quantifier over a sequence, which stage-list
    * expansion cannot reach: view→click traversals repeated
    * sequentially, reps = the longest chain any branch achieves. The
    * machine is a max-plus dominance fold (max completed reps per
    * (stage, l/o) slot + two idle slots — FunnelSpec pins why greedy
    * replay fails under consecutive seams); the oracle is the
    * greedy-earliest chain unrolled 28 deep (valid exactly because
    * these seams are RELAXED; per-user ceilings: 19 at sf0.01, 21 at
    * sf0.1). */
  val w62_funnel_group_loop: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupLoop(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view"), Funnel.PatternStage("click")))
        .orderBy("user_id"),
    bench = true,
    oracle = Some(
      s"""$sqlEventsPrefix
         |${duckGroupLoopGreedy(28)}
         |SELECT u.user_id, CAST(COALESCE(max(lvl), 0) AS BIGINT) AS reps
         |FROM u LEFT JOIN lv USING (user_id)
         |GROUP BY u.user_id ORDER BY u.user_id""".stripMargin))

  /** [[w62_funnel_group_loop]] through the TROPICAL segment split
    * ([[Funnel.funnelGroupLoopBucketed]]): the dominance fold is
    * max-plus linear, so a segment is a (gain matrix, fresh vector)
    * pair and composition is the tropical matrix product. Gates on
    * w62's oracle VERBATIM. */
  val w62b_funnel_group_loop_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupLoopBucketed(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view"), Funnel.PatternStage("click")),
          bucketSeconds = 3600L)
        .orderBy("user_id"),
    oracle = w62_funnel_group_loop.oracle)

  /** [[w62_funnel_group_loop]] with STRICT in-group contiguity AND
    * consecutive seams (`oneOrMore.consecutive()` on the group): each
    * traversal is a view with its click as immediate successor, and
    * each later traversal's view must immediately follow the previous
    * traversal's click. Greedy-earliest is WRONG here (the spec's
    * trap), so the oracle is honest reachability: the all-matches
    * table (idx-adjacent view→click pairs) and an unrolled DP over
    * the seam relation `next.start = prev.end + 1` — depth 16 against
    * corpus ceilings of 7 (sf0.01) and 10 (sf0.1). */
  val w63_funnel_group_loop_consecutive: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupLoop(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view"),
            Funnel.PatternStage("click", strict = true)),
          consecutiveSeams = true)
        .orderBy("user_id"),
    oracle = Some {
      val rounds = 16
      val dp = (2 to rounds).map(k =>
        s"""d$k AS MATERIALIZED (SELECT DISTINCT m.user_id, m.t
           |  FROM mt m JOIN d${k - 1} p ON p.user_id = m.user_id
           |    AND m.s = p.t + 1)""".stripMargin).mkString(",\n")
      val lv = (1 to rounds).map(k =>
        s"SELECT user_id, $k AS lvl FROM d$k").mkString(" UNION ALL ")
      s"""$sqlEventsPrefix
         |ei AS MATERIALIZED (SELECT user_id, event_type,
         |  row_number() OVER (PARTITION BY user_id ORDER BY us, event_id)
         |    AS idx FROM e),
         |mt AS MATERIALIZED (SELECT a.user_id, a.idx AS s, b.idx AS t
         |  FROM ei a JOIN ei b ON b.user_id = a.user_id
         |    AND b.idx = a.idx + 1
         |  WHERE a.event_type = 'view' AND b.event_type = 'click'),
         |d1 AS MATERIALIZED (SELECT DISTINCT user_id, t FROM mt),
         |$dp,
         |lv AS ($lv)
         |SELECT u.user_id, CAST(COALESCE(max(lvl), 0) AS BIGINT) AS reps
         |FROM u LEFT JOIN lv USING (user_id)
         |GROUP BY u.user_id ORDER BY u.user_id""".stripMargin
    })

  /** GROUP `oneOrMore` under RELUCTANT consumption
    * ([[Funnel.funnelGroupLoopMode]], round 18 — closing the r17
    * verdict's consume-mode asymmetry): the match stops at the floor
    * (here `timesOrMore(2)`'s floor of 2), so `reps` is the greedy
    * machine's chain depth CAPPED at 2 — exact by the truncation
    * lemma (any r-rep chain truncates to every r' ≤ r at repetition
    * boundaries). The machine threads the cap through the dominance
    * fold's completion step; the oracle is w62's greedy-earliest
    * chain with `LEAST(·, 2)` — valid precisely because truncation
    * makes every intermediate depth realizable. */
  val w68_funnel_group_loop_reluctant: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupLoopMode(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view"), Funnel.PatternStage("click")),
          Funnel.Reluctant, minTimes = 2)
        .orderBy("user_id"),
    bench = true,
    oracle = Some(
      s"""$sqlEventsPrefix
         |${duckGroupLoopGreedy(28)}
         |SELECT u.user_id,
         |  LEAST(CAST(COALESCE(max(lvl), 0) AS BIGINT), 2) AS reps
         |FROM u LEFT JOIN lv USING (user_id)
         |GROUP BY u.user_id ORDER BY u.user_id""".stripMargin))

  /** [[w68_funnel_group_loop_reluctant]] through the TROPICAL segment
    * split: the cap is min-with-a-constant — NOT max-plus linear — so
    * the bucketed twin runs the greedy gain matrices UNCHANGED and
    * caps the OUTPUT; the truncation lemma makes the two placements
    * the same function. Gates on w68's oracle VERBATIM. */
  val w68b_funnel_group_loop_reluctant_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupLoopMode(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view"), Funnel.PatternStage("click")),
          Funnel.Reluctant, bucketSeconds = Some(3600L), minTimes = 2)
        .orderBy("user_id"),
    oracle = w68_funnel_group_loop_reluctant.oracle)

  /** [[w68_funnel_group_loop_reluctant]] through the AUTO router
    * ([[Funnel.funnelGroupLoopAuto]] with `mode = Reluctant`): the
    * consume mode rides the feasibility routing — below the threshold
    * this is the capped single fold. Gates on w68's oracle VERBATIM
    * (the j5a/t34a auto-gate pattern). */
  val w68c_funnel_group_loop_reluctant_auto: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupLoopAuto(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view"), Funnel.PatternStage("click")),
          mode = Funnel.Reluctant, minTimes = 2)
        .orderBy("user_id"),
    oracle = w68_funnel_group_loop_reluctant.oracle)

  /** RELUCTANT group loop under CONSECUTIVE seams and strict in-group
    * contiguity — the mode composed with the seam axis where greedy
    * replay is WRONG (w63's trap): the oracle is w63's honest
    * reachability DP with `LEAST(·, 2)`, exact because truncating a
    * repetition chain never disturbs the adjacency of the prefix it
    * keeps. */
  val w69_funnel_group_loop_reluctant_consecutive: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupLoopMode(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view"),
            Funnel.PatternStage("click", strict = true)),
          Funnel.Reluctant, consecutiveSeams = true, minTimes = 2)
        .orderBy("user_id"),
    oracle = Some {
      val rounds = 16
      val dp = (2 to rounds).map(k =>
        s"""d$k AS MATERIALIZED (SELECT DISTINCT m.user_id, m.t
           |  FROM mt m JOIN d${k - 1} p ON p.user_id = m.user_id
           |    AND m.s = p.t + 1)""".stripMargin).mkString(",\n")
      val lv = (1 to rounds).map(k =>
        s"SELECT user_id, $k AS lvl FROM d$k").mkString(" UNION ALL ")
      s"""$sqlEventsPrefix
         |ei AS MATERIALIZED (SELECT user_id, event_type,
         |  row_number() OVER (PARTITION BY user_id ORDER BY us, event_id)
         |    AS idx FROM e),
         |mt AS MATERIALIZED (SELECT a.user_id, a.idx AS s, b.idx AS t
         |  FROM ei a JOIN ei b ON b.user_id = a.user_id
         |    AND b.idx = a.idx + 1
         |  WHERE a.event_type = 'view' AND b.event_type = 'click'),
         |d1 AS MATERIALIZED (SELECT DISTINCT user_id, t FROM mt),
         |$dp,
         |lv AS ($lv)
         |SELECT u.user_id,
         |  LEAST(CAST(COALESCE(max(lvl), 0) AS BIGINT), 2) AS reps
         |FROM u LEFT JOIN lv USING (user_id)
         |GROUP BY u.user_id ORDER BY u.user_id""".stripMargin
    })

  /** GROUP pattern under the BOUNDED range `times(2, 3)`
    * ([[Funnel.funnelGroupTimesRange]]) — the last group-quantifier
    * shape: the existence machine over three expanded copies plus the
    * threshold report `matched = reps_completed >= 2`. The oracle is
    * w59's chained-join replay extended to the third copy (strict
    * in-copy hops, relaxed seams) with the same threshold column. */
  val w64_funnel_group_times_range: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupTimesRange(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view"),
            Funnel.PatternStage("click", strict = true)),
          minTimes = 2, maxTimes = 3)
        .orderBy("user_id"),
    oracle = Some {
      s"""$sqlEventsPrefix
         |c1 AS (SELECT user_id, us, event_id FROM e WHERE event_type = 'view'),
         |${sqlHop("c2", "click", "c1", strict = true, None)},
         |${sqlHop("c3", "view", "c2", strict = false, None)},
         |${sqlHop("c4", "click", "c3", strict = true, None)},
         |${sqlHop("c5", "view", "c4", strict = false, None)},
         |${sqlHop("c6", "click", "c5", strict = true, None)},
         |${(1 to 6).map(i =>
            s"m$i AS (SELECT user_id, min(us) AS ts FROM c$i GROUP BY user_id)")
            .mkString(",\n")}
         |SELECT u.user_id,
         |  CAST(CASE WHEN m6.ts IS NOT NULL THEN 3
         |            WHEN m4.ts IS NOT NULL THEN 2
         |            WHEN m2.ts IS NOT NULL THEN 1 ELSE 0 END AS INT)
         |    AS reps_completed,
         |  (m4.ts IS NOT NULL) AS matched,
         |  m1.ts AS ts_r1_s1_us, m2.ts AS ts_r1_s2_us,
         |  m3.ts AS ts_r2_s1_us, m4.ts AS ts_r2_s2_us,
         |  m5.ts AS ts_r3_s1_us, m6.ts AS ts_r3_s2_us
         |FROM u ${(1 to 6).map(i => s"LEFT JOIN m$i USING (user_id)")
            .mkString(" ")}
         |ORDER BY user_id""".stripMargin
    })

  /** GROUP pattern under `timesOrMore(3)`
    * ([[Funnel.funnelGroupTimesOrMore]]): the unbounded dominance
    * machine (w62) plus the threshold report. Oracle: w62's
    * greedy-earliest chain with `matched = reps >= 3`. */
  val w65_funnel_group_times_or_more: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupTimesOrMore(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(Funnel.PatternStage("view"), Funnel.PatternStage("click")),
          minTimes = 3)
        .orderBy("user_id"),
    oracle = Some(
      s"""$sqlEventsPrefix
         |${duckGroupLoopGreedy(28)}
         |SELECT u.user_id, CAST(COALESCE(max(lvl), 0) AS BIGINT) AS reps,
         |  (COALESCE(max(lvl), 0) >= 3) AS matched
         |FROM u LEFT JOIN lv USING (user_id)
         |GROUP BY u.user_id ORDER BY u.user_id""".stripMargin))

  /** Match ENUMERATION on a GROUP ([[Funnel.funnelGroupMatches]]) —
    * `begin(view→click).times(2)` with every skip-past-last match
    * EMITTED: the w26 cyclic witness machine over the expansion, each
    * match carrying its two repetitions' per-stage times. The oracle
    * unrolls the greedy pick chain match by match over the 4 expanded
    * hops and projects the same rep/stage labels. */
  /** The (ctes, rows) pair of the canonical group-match enumeration
    * replay — the chained greedy pick CTEs over the `times`-fold
    * expansion of (view, click) and the per-match projection rows.
    * Shared by w67 (unfiltered) and w70 (span-filtered). */
  private lazy val duckGroupMatchParts: (String, String) = {
    val expanded = Seq("view", "click", "view", "click")
    def first(tag: String, tp: String, prev: Option[String]): String =
      prev match {
        case None =>
          s"""$tag AS (SELECT user_id, us, event_id FROM (
             |  SELECT user_id, us, event_id,
             |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
             |  FROM e WHERE event_type = '$tp') WHERE rn = 1)""".stripMargin
        case Some(p) =>
          s"""$tag AS (SELECT user_id, us, event_id FROM (
             |  SELECT e.user_id, e.us, e.event_id,
             |    row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) AS rn
             |  FROM e JOIN $p p ON p.user_id = e.user_id
             |    AND ${sqlBefore("p", "e")}
             |  WHERE e.event_type = '$tp') WHERE rn = 1)""".stripMargin
      }
    val ctes = (1 to MultiMatchCap).flatMap { m =>
      expanded.zipWithIndex.map { case (tp, j) =>
        val prev = if (j > 0) Some(s"g${m}_$j")
          else if (m > 1) Some(s"g${m - 1}_${expanded.length}") else None
        first(s"g${m}_${j + 1}", tp, prev)
      }
    }.mkString(",\n")
    val rows = (1 to MultiMatchCap).map { m =>
      s"""SELECT a.user_id, $m AS match_idx, a.us AS ts_r1_s1_us,
         |  b.us AS ts_r1_s2_us, c.us AS ts_r2_s1_us, d.us AS ts_r2_s2_us
         |FROM g${m}_1 a JOIN g${m}_2 b USING (user_id)
         |  JOIN g${m}_3 c USING (user_id) JOIN g${m}_4 d USING (user_id)""".stripMargin
    }.mkString("\nUNION ALL\n")
    (ctes, rows)
  }

  lazy val w67_funnel_group_matches: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupMatches(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq("view", "click"), times = 2, maxMatches = MultiMatchCap)
        .orderBy("user_id", "match_idx"),
    oracle = Some {
      val (ctes, rows) = duckGroupMatchParts
      s"""$sqlEventsPrefix
         |$ctes
         |SELECT user_id, CAST(match_idx AS BIGINT) AS match_idx,
         |  CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_matches,
         |  ts_r1_s1_us, ts_r1_s2_us, ts_r2_s1_us, ts_r2_s2_us
         |FROM ($rows)
         |ORDER BY user_id, match_idx""".stripMargin
    })

  /** Group repetition under a match-SPAN time bound
    * ([[Funnel.funnelGroupMatchesWithin]], round 18) — the
    * answer-size-bounded `within(T)` the unbounded group loop cannot
    * have as a fold (the documented Pareto obstruction): every
    * canonical skip-past-last match of two view→click repetitions
    * whose whole span fits in 5 days, `match_idx` keeping its
    * enumeration index (gaps mark over-window matches) and
    * `n_matches` recounted over the fitting ones. Oracle: w67's
    * chained-pick replay with the same span predicate and recount. */
  lazy val w70_funnel_group_matches_within: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupMatchesWithin(t(spark, dir, "events"),
          "user_id", "event_type", "ts", "event_id",
          Seq("view", "click"), times = 2, maxMatches = MultiMatchCap,
          windowMicros = 432000L * 1000000L)
        .orderBy("user_id", "match_idx"),
    oracle = Some {
      val (ctes, rows) = duckGroupMatchParts
      s"""$sqlEventsPrefix
         |$ctes
         |SELECT user_id, CAST(match_idx AS BIGINT) AS match_idx,
         |  CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_matches,
         |  ts_r1_s1_us, ts_r1_s2_us, ts_r2_s1_us, ts_r2_s2_us
         |FROM ($rows)
         |WHERE ts_r2_s2_us - ts_r1_s1_us <= ${432000L * 1000000L}
         |ORDER BY user_id, match_idx""".stripMargin
    })

  /** Group repetition with the TRAILING absence tail
    * ([[Funnel.funnelGroupMatchesAbsence]], round 19) — Flink's
    * `begin(view→click).times(2).notFollowedBy(error).within(5 days)`:
    * w70's span-fit matches additionally survive only if no error
    * event falls in (completion, start + 5 d]. Oracle: w67's
    * chained-pick replay with both predicates, the tail as NOT
    * EXISTS. */
  lazy val w74_funnel_group_matches_absence: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupMatchesAbsence(t(spark, dir, "events"),
          "user_id", "event_type", "ts", "event_id",
          Seq("view", "click"), times = 2, maxMatches = MultiMatchCap,
          windowMicros = 432000L * 1000000L, absentType = "error")
        .orderBy("user_id", "match_idx"),
    oracle = Some {
      val (ctes, rows) = duckGroupMatchParts
      s"""$sqlEventsPrefix
         |$ctes
         |SELECT user_id, CAST(match_idx AS BIGINT) AS match_idx,
         |  CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_matches,
         |  ts_r1_s1_us, ts_r1_s2_us, ts_r2_s1_us, ts_r2_s2_us
         |FROM ($rows) m
         |WHERE ts_r2_s2_us - ts_r1_s1_us <= ${432000L * 1000000L}
         |  AND NOT EXISTS (SELECT 1 FROM e b
         |    WHERE b.user_id = m.user_id AND b.event_type = 'error'
         |      AND b.us > m.ts_r2_s2_us
         |      AND b.us <= m.ts_r1_s1_us + ${432000L * 1000000L})
         |ORDER BY user_id, match_idx""".stripMargin
    })

  /** The (ctes, rows) pair of the RANGE-quantified group-match replay
    * — `begin(view→click).times(2, 3)`: the chained greedy picks over
    * the CEILING (3-fold, 6-hop) expansion, each match emitted via
    * LEFT joins so the trailing SHORT match (the chain that dies
    * mid-extension) surfaces with its own rep count — `reps` = the
    * deepest completed repetition, witnesses of incomplete
    * repetitions NULLed (a dangling partial pick is not part of any
    * match). The `reps >= minTimes` floor and the absence predicates
    * are applied by the consuming gates (w75/w75b). A short match is
    * always LAST by construction: its missing pick empties every
    * later CTE in the chain. */
  private lazy val duckGroupMatchRangeParts: (String, String) = {
    val expanded = Seq("view", "click", "view", "click", "view", "click")
    def first(tag: String, tp: String, prev: Option[String]): String =
      prev match {
        case None =>
          s"""$tag AS (SELECT user_id, us, event_id FROM (
             |  SELECT user_id, us, event_id,
             |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
             |  FROM e WHERE event_type = '$tp') WHERE rn = 1)""".stripMargin
        case Some(p) =>
          s"""$tag AS (SELECT user_id, us, event_id FROM (
             |  SELECT e.user_id, e.us, e.event_id,
             |    row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) AS rn
             |  FROM e JOIN $p p ON p.user_id = e.user_id
             |    AND ${sqlBefore("p", "e")}
             |  WHERE e.event_type = '$tp') WHERE rn = 1)""".stripMargin
      }
    val ctes = (1 to MultiMatchCap).flatMap { m =>
      expanded.zipWithIndex.map { case (tp, j) =>
        val prev = if (j > 0) Some(s"h${m}_$j")
          else if (m > 1) Some(s"h${m - 1}_${expanded.length}") else None
        first(s"h${m}_${j + 1}", tp, prev)
      }
    }.mkString(",\n")
    val rows = (1 to MultiMatchCap).map { m =>
      s"""SELECT a1.user_id, $m AS match_idx,
         |  CASE WHEN a6.us IS NOT NULL THEN 3
         |       WHEN a4.us IS NOT NULL THEN 2
         |       WHEN a2.us IS NOT NULL THEN 1 ELSE 0 END AS reps,
         |  a1.us AS ts_r1_s1_us, a2.us AS ts_r1_s2_us,
         |  CASE WHEN a4.us IS NOT NULL THEN a3.us END AS ts_r2_s1_us,
         |  a4.us AS ts_r2_s2_us,
         |  CASE WHEN a6.us IS NOT NULL THEN a5.us END AS ts_r3_s1_us,
         |  a6.us AS ts_r3_s2_us
         |FROM h${m}_1 a1
         |  ${(2 to 6).map(j => s"LEFT JOIN h${m}_$j a$j USING (user_id)")
              .mkString(" ")}""".stripMargin
    }.mkString("\nUNION ALL\n")
    (ctes, rows)
  }

  /** RANGE-quantified group enumeration
    * ([[Funnel.funnelGroupMatchesRange]], round 20 — the last
    * enumeration shape): `begin(view→click).times(2, 3)` under greedy
    * skip-past-last, read off [[Funnel.funnelMulti]]'s witness stream
    * over the ceiling expansion — full matches from the exact advance
    * counter, the one possible trailing SHORT match (every non-final
    * match is full: a failed extension kills every later match too)
    * from the stream's remainder, each match carrying its own `reps`
    * with witnesses beyond it NULL. Oracle: the chained greedy-pick
    * replay over the 6-hop expansion with LEFT-join emission and the
    * `reps >= 2` floor. */
  lazy val w75_funnel_group_matches_range: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupMatchesRange(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq("view", "click"), minTimes = 2, maxTimes = 3,
          maxMatches = MultiMatchCap)
        .orderBy("user_id", "match_idx"),
    oracle = Some {
      val (ctes, rows) = duckGroupMatchRangeParts
      s"""$sqlEventsPrefix
         |$ctes
         |SELECT user_id, CAST(match_idx AS BIGINT) AS match_idx,
         |  CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_matches,
         |  reps, ts_r1_s1_us, ts_r1_s2_us, ts_r2_s1_us, ts_r2_s2_us,
         |  ts_r3_s1_us, ts_r3_s2_us
         |FROM ($rows)
         |WHERE reps >= 2
         |ORDER BY user_id, match_idx""".stripMargin
    })

  /** The LAST combinator cell — range-quantified group repetition
    * with the trailing absence tail
    * ([[Funnel.funnelGroupMatchesRangeAbsence]]): Flink's
    * `begin(view→click).times(2, 3).notFollowedBy(error)
    * .within(5 days)`. All three predicates ride the w75 enumeration:
    * `reps ∈ [2, 3]` (the floor, from the replay), span fit and tail
    * absence anchored at each match's OWN completion —
    * `COALESCE(ts_r3_s2_us, ts_r2_s2_us)`, exactly the operator's
    * rep-descending coalesce — with the tail as NOT EXISTS and
    * `n_matches` recounted over survivors. */
  lazy val w75b_funnel_group_matches_range_absence: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupMatchesRangeAbsence(t(spark, dir, "events"),
          "user_id", "event_type", "ts", "event_id",
          Seq("view", "click"), minTimes = 2, maxTimes = 3,
          maxMatches = MultiMatchCap,
          windowMicros = 432000L * 1000000L, absentType = "error")
        .orderBy("user_id", "match_idx"),
    oracle = Some {
      val (ctes, rows) = duckGroupMatchRangeParts
      s"""$sqlEventsPrefix
         |$ctes
         |SELECT user_id, CAST(match_idx AS BIGINT) AS match_idx,
         |  CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_matches,
         |  reps, ts_r1_s1_us, ts_r1_s2_us, ts_r2_s1_us, ts_r2_s2_us,
         |  ts_r3_s1_us, ts_r3_s2_us
         |FROM ($rows) m
         |WHERE reps >= 2
         |  AND COALESCE(ts_r3_s2_us, ts_r2_s2_us) - ts_r1_s1_us <=
         |    ${432000L * 1000000L}
         |  AND NOT EXISTS (SELECT 1 FROM e b
         |    WHERE b.user_id = m.user_id AND b.event_type = 'error'
         |      AND b.us > COALESCE(m.ts_r3_s2_us, m.ts_r2_s2_us)
         |      AND b.us <= m.ts_r1_s1_us + ${432000L * 1000000L})
         |ORDER BY user_id, match_idx""".stripMargin
    })

  /** [[w75_funnel_group_matches_range]] through the SKEW-SAFE segment
    * split ([[Funnel.funnelMultiBucketed]]'s monoid over the ceiling
    * expansion): the bucketed machine reproduces the witness stream
    * `(n, w)` bit-identically, so the range reading composes onto it
    * unchanged. Gates on w75's oracle VERBATIM. */
  lazy val w75c_funnel_group_matches_range_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupMatchesRange(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq("view", "click"), minTimes = 2, maxTimes = 3,
          maxMatches = MultiMatchCap, bucketSeconds = Some(3600L))
        .orderBy("user_id", "match_idx"),
    oracle = w75_funnel_group_matches_range.oracle)

  /** [[w75b_funnel_group_matches_range_absence]] with the enumeration
    * routed through the bucketed split — the absence predicates are
    * per-match index properties of the (bit-identical) witness
    * stream, so the whole composition is route-independent (the w73b
    * pattern). Gates on w75b's oracle VERBATIM. */
  lazy val w75d_funnel_group_matches_range_absence_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGroupMatchesRangeAbsence(t(spark, dir, "events"),
          "user_id", "event_type", "ts", "event_id",
          Seq("view", "click"), minTimes = 2, maxTimes = 3,
          maxMatches = MultiMatchCap,
          windowMicros = 432000L * 1000000L, absentType = "error",
          bucketSeconds = Some(3600L))
        .orderBy("user_id", "match_idx"),
    oracle = w75b_funnel_group_matches_range_absence.oracle)

  /** [[w38_funnel_loop_consecutive]] through the SKEW-SAFE segment
    * split ([[Funnel.funnelLoopConsecutiveBucketed]]): one machine fold
    * per entry state (stage × partial-run-count-or-open), composed by
    * table lookup with replace-vs-add merge. Gated on w38's oracle
    * VERBATIM. */
  val w40_funnel_loop_consecutive_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelLoopConsecutiveBucketed(t(spark, dir, "events"),
          "user_id", "event_type", "ts", "event_id",
          Seq("view" -> 2, "click" -> 2), bucketSeconds = 3600L)
        .orderBy("user_id"),
    oracle = w38_funnel_loop_consecutive.oracle)

  /** [[Funnel.funnelLoopConsecutiveAuto]] — w38's consecutive-run
    * machine through the feasibility router (this split honestly
    * LOSES ~1.5× on skew, so the default threshold routes single
    * until the 2 GB wall makes the split the only runnable plan).
    * Routes single at sf0.01; FunnelSpec forces both routes. Gated on
    * w38's oracle VERBATIM. */
  val w46_funnel_loop_consecutive_auto: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelLoopConsecutiveAuto(t(spark, dir, "events"),
          "user_id", "event_type", "ts", "event_id",
          Seq("view" -> 2, "click" -> 2))
        .orderBy("user_id"),
    oracle = w38_funnel_loop_consecutive.oracle)

  val w31_funnel_loop_until: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelLoopUntil(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(("view", 1, Some("signup")), ("click", 2, None),
            ("purchase", 1, Some("error"))))
        .orderBy("user_id"),
    bench = true,
    oracle = Some {
      def pick(tag: String, tp: String, prev: String): String =
        s"""$tag AS (SELECT user_id, us, event_id FROM (
           |  SELECT e.user_id, e.us, e.event_id,
           |    row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) AS rn
           |  FROM e JOIN $prev p ON p.user_id = e.user_id
           |    AND ${sqlBefore("p", "e")}
           |  WHERE e.event_type = '$tp') WHERE rn = 1)""".stripMargin
      s"""$sqlEventsPrefix
         |s1 AS (SELECT user_id, us, event_id FROM (
         |  SELECT user_id, us, event_id,
         |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
         |  FROM e WHERE event_type = 'view') WHERE rn = 1),
         |u1 AS (SELECT user_id, us, event_id FROM (
         |  SELECT user_id, us, event_id,
         |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
         |  FROM e WHERE event_type = 'signup') WHERE rn = 1),
         |v1 AS (SELECT s1.user_id FROM s1 LEFT JOIN u1 USING (user_id)
         |  WHERE u1.user_id IS NULL OR ${sqlBefore("s1", "u1")}),
         |${pick("s2", "click", "s1")},
         |${pick("s3", "click", "s2")},
         |${pick("s4", "purchase", "s3")},
         |e3 AS (SELECT user_id, us, event_id FROM (
         |  SELECT e.user_id, e.us, e.event_id,
         |    row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) AS rn
         |  FROM e JOIN s4 p ON p.user_id = e.user_id
         |    AND ${sqlBefore("p", "e")}
         |  WHERE e.event_type = 'error') WHERE rn = 1),
         |r1 AS (SELECT f.user_id, count(*) AS reps, max(e.us) AS last_us
         |  FROM s1 f JOIN v1 ON v1.user_id = f.user_id
         |  JOIN e ON e.user_id = f.user_id AND e.event_type = 'view'
         |    AND (e.us > f.us OR (e.us = f.us AND e.event_id >= f.event_id))
         |  LEFT JOIN s2 n ON n.user_id = f.user_id
         |  LEFT JOIN u1 x ON x.user_id = f.user_id
         |  WHERE (n.user_id IS NULL OR ${sqlBefore("e", "n")})
         |    AND (x.user_id IS NULL OR ${sqlBefore("e", "x")})
         |  GROUP BY f.user_id),
         |r2 AS (SELECT f.user_id, count(*) AS reps, max(e.us) AS last_us
         |  FROM s2 f JOIN v1 ON v1.user_id = f.user_id
         |  JOIN e ON e.user_id = f.user_id AND e.event_type = 'click'
         |    AND (e.us > f.us OR (e.us = f.us AND e.event_id >= f.event_id))
         |  LEFT JOIN s4 n ON n.user_id = f.user_id
         |  WHERE (n.user_id IS NULL OR ${sqlBefore("e", "n")})
         |  GROUP BY f.user_id),
         |r3 AS (SELECT f.user_id, count(*) AS reps, max(e.us) AS last_us
         |  FROM s4 f JOIN v1 ON v1.user_id = f.user_id
         |  JOIN e ON e.user_id = f.user_id AND e.event_type = 'purchase'
         |    AND (e.us > f.us OR (e.us = f.us AND e.event_id >= f.event_id))
         |  LEFT JOIN e3 n ON n.user_id = f.user_id
         |  WHERE (n.user_id IS NULL OR ${sqlBefore("e", "n")})
         |  GROUP BY f.user_id)
         |SELECT u.user_id,
         |  CASE WHEN v1.user_id IS NULL THEN 0
         |       WHEN s4.user_id IS NOT NULL THEN 3
         |       WHEN s3.user_id IS NOT NULL THEN 2
         |       ELSE 1 END AS stage_reached,
         |  coalesce(r1.reps, 0) AS reps1, r1.last_us AS ts1_us,
         |  coalesce(r2.reps, 0) AS reps2, r2.last_us AS ts2_us,
         |  coalesce(r3.reps, 0) AS reps3, r3.last_us AS ts3_us
         |FROM u LEFT JOIN v1 USING (user_id)
         |  LEFT JOIN s3 USING (user_id) LEFT JOIN s4 USING (user_id)
         |  LEFT JOIN r1 USING (user_id) LEFT JOIN r2 USING (user_id)
         |  LEFT JOIN r3 USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** RELUCTANT consume mode × `until` boundary
    * ([[Funnel.funnelLoopUntilMode]] with [[Funnel.Reluctant]]) on
    * w31's pattern — the consume-mode product completed across all
    * three loop machines: the until machinery (mid-block close
    * STALLS, open close stops absorption) reads only the pointer and
    * closed-bit, so the spine and stage_reached are mode-independent;
    * reluctant caps each completed stage's reps at minReps with ts at
    * the block's last mandatory pick. Oracle: w31's pick-chain +
    * until-truncated repetition intervals with a rank cut at each
    * stage's minReps (the w18 cap recipe inside w31's truncation).
    * The bucketed twin gates on the same oracle (w57b). */
  val w57_funnel_loop_until_reluctant: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelLoopUntilMode(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(("view", 1, Some("signup")), ("click", 2, None),
            ("purchase", 1, Some("error"))),
          Funnel.Reluctant)
        .orderBy("user_id"),
    oracle = Some {
      def pick(tag: String, tp: String, prev: String): String =
        s"""$tag AS (SELECT user_id, us, event_id FROM (
           |  SELECT e.user_id, e.us, e.event_id,
           |    row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) AS rn
           |  FROM e JOIN $prev p ON p.user_id = e.user_id
           |    AND ${sqlBefore("p", "e")}
           |  WHERE e.event_type = '$tp') WHERE rn = 1)""".stripMargin
      s"""$sqlEventsPrefix
         |s1 AS (SELECT user_id, us, event_id FROM (
         |  SELECT user_id, us, event_id,
         |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
         |  FROM e WHERE event_type = 'view') WHERE rn = 1),
         |u1 AS (SELECT user_id, us, event_id FROM (
         |  SELECT user_id, us, event_id,
         |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
         |  FROM e WHERE event_type = 'signup') WHERE rn = 1),
         |v1 AS (SELECT s1.user_id FROM s1 LEFT JOIN u1 USING (user_id)
         |  WHERE u1.user_id IS NULL OR ${sqlBefore("s1", "u1")}),
         |${pick("s2", "click", "s1")},
         |${pick("s3", "click", "s2")},
         |${pick("s4", "purchase", "s3")},
         |e3 AS (SELECT user_id, us, event_id FROM (
         |  SELECT e.user_id, e.us, e.event_id,
         |    row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) AS rn
         |  FROM e JOIN s4 p ON p.user_id = e.user_id
         |    AND ${sqlBefore("p", "e")}
         |  WHERE e.event_type = 'error') WHERE rn = 1),
         |r1 AS (SELECT user_id, count(*) AS reps, max(us) AS last_us FROM (
         |  SELECT f.user_id, e.us,
         |    row_number() OVER (PARTITION BY f.user_id ORDER BY e.us, e.event_id) AS rk
         |  FROM s1 f JOIN v1 ON v1.user_id = f.user_id
         |  JOIN e ON e.user_id = f.user_id AND e.event_type = 'view'
         |    AND (e.us > f.us OR (e.us = f.us AND e.event_id >= f.event_id))
         |  LEFT JOIN s2 n ON n.user_id = f.user_id
         |  LEFT JOIN u1 x ON x.user_id = f.user_id
         |  WHERE (n.user_id IS NULL OR ${sqlBefore("e", "n")})
         |    AND (x.user_id IS NULL OR ${sqlBefore("e", "x")})
         |  ) WHERE rk <= 1 GROUP BY user_id),
         |r2 AS (SELECT user_id, count(*) AS reps, max(us) AS last_us FROM (
         |  SELECT f.user_id, e.us,
         |    row_number() OVER (PARTITION BY f.user_id ORDER BY e.us, e.event_id) AS rk
         |  FROM s2 f JOIN v1 ON v1.user_id = f.user_id
         |  JOIN e ON e.user_id = f.user_id AND e.event_type = 'click'
         |    AND (e.us > f.us OR (e.us = f.us AND e.event_id >= f.event_id))
         |  LEFT JOIN s4 n ON n.user_id = f.user_id
         |  WHERE (n.user_id IS NULL OR ${sqlBefore("e", "n")})
         |  ) WHERE rk <= 2 GROUP BY user_id),
         |r3 AS (SELECT user_id, count(*) AS reps, max(us) AS last_us FROM (
         |  SELECT f.user_id, e.us,
         |    row_number() OVER (PARTITION BY f.user_id ORDER BY e.us, e.event_id) AS rk
         |  FROM s4 f JOIN v1 ON v1.user_id = f.user_id
         |  JOIN e ON e.user_id = f.user_id AND e.event_type = 'purchase'
         |    AND (e.us > f.us OR (e.us = f.us AND e.event_id >= f.event_id))
         |  LEFT JOIN e3 n ON n.user_id = f.user_id
         |  WHERE (n.user_id IS NULL OR ${sqlBefore("e", "n")})
         |  ) WHERE rk <= 1 GROUP BY user_id)
         |SELECT u.user_id,
         |  CASE WHEN v1.user_id IS NULL THEN 0
         |       WHEN s4.user_id IS NOT NULL THEN 3
         |       WHEN s3.user_id IS NOT NULL THEN 2
         |       ELSE 1 END AS stage_reached,
         |  coalesce(r1.reps, 0) AS reps1, r1.last_us AS ts1_us,
         |  coalesce(r2.reps, 0) AS reps2, r2.last_us AS ts2_us,
         |  coalesce(r3.reps, 0) AS reps3, r3.last_us AS ts3_us
         |FROM u LEFT JOIN v1 USING (user_id)
         |  LEFT JOIN s3 USING (user_id) LEFT JOIN s4 USING (user_id)
         |  LEFT JOIN r1 USING (user_id) LEFT JOIN r2 USING (user_id)
         |  LEFT JOIN r3 USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** [[w57_funnel_loop_until_reluctant]] through the SKEW-SAFE
    * doubled-entry split. Gated on w57's oracle VERBATIM. */
  val w57b_funnel_loop_until_reluctant_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelLoopUntilMode(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(("view", 1, Some("signup")), ("click", 2, None),
            ("purchase", 1, Some("error"))),
          Funnel.Reluctant, bucketSeconds = Some(3600L))
        .orderBy("user_id"),
    oracle = w57_funnel_loop_until_reluctant.oracle)

  /** [[w31_funnel_loop_until]] through the SKEW-SAFE split
    * ([[Funnel.funnelLoopUntilBucketed]]): the loop monoid's entry
    * state doubles to (pointer, closed-bit) — 2·(K'+1) slots per
    * segment, count deltas still exact (absorption reads the pointer
    * and the bit, never counts). Gated on w31's oracle VERBATIM. */
  val w32_funnel_loop_until_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelLoopUntilBucketed(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq(("view", 1, Some("signup")), ("click", 2, None),
            ("purchase", 1, Some("error"))),
          bucketSeconds = 3600L)
        .orderBy("user_id"),
    oracle = w31_funnel_loop_until.oracle)

  /** `followedByAny` MULTIPLICITY ([[Funnel.funnelAnyCount]]): the
    * number of ALL ordered view → click → purchase combinations per
    * user (overlapping included — w6 is one witness, w26 the
    * non-overlapping set, this the full non-deterministic count).
    * Path counting: one fold, cnt[j] += cnt[j-1] on a type-j event,
    * O(k) state, no enumeration. The oracle counts the literal 3-way
    * ordered join. */
  val w28_funnel_any_count: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelAnyCount(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id", Seq("view", "click", "purchase"))
        .orderBy("user_id"),
    bench = true,
    oracle = Some {
      s"""$sqlEventsPrefix
         |m AS (SELECT a.user_id, CAST(count(*) AS BIGINT) AS n
         |  FROM e a
         |  JOIN e b ON b.user_id = a.user_id AND b.event_type = 'click'
         |    AND ${sqlBefore("a", "b")}
         |  JOIN e c ON c.user_id = b.user_id AND c.event_type = 'purchase'
         |    AND ${sqlBefore("b", "c")}
         |  WHERE a.event_type = 'view'
         |  GROUP BY a.user_id)
         |SELECT u.user_id, COALESCE(m.n, 0) AS n_any
         |FROM u LEFT JOIN m USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** [[w28_funnel_any_count]] through the SKEW-SAFE split
    * ([[Funnel.funnelAnyCountBucketed]]): the count vector evolves
    * linearly, so a segment summarizes as the (k+1)² unit-triangular
    * product matrix — the cheapest segment summary in the family —
    * and merging is one matrix–vector product. Gated on w28's oracle
    * VERBATIM. */
  val w29_funnel_any_count_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelAnyCountBucketed(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id", Seq("view", "click", "purchase"),
          bucketSeconds = 3600L)
        .orderBy("user_id"),
    oracle = w28_funnel_any_count.oracle)

  /** [[Funnel.funnelAnyCountAuto]] — the measured-crossover router
    * (round 15): probe the peak per-key event count once, take the
    * single fold below [[Funnel.AutoBucketKeyEvents]] and the matrix
    * monoid above it (the single fold's ~2 GB collected-row wall,
    * AUDIT_r15_cep_crossover). Routes to the single fold at sf0.01;
    * FunnelSpec forces both routes and proves them equal. Gated on
    * w28's oracle VERBATIM. */
  val w44_funnel_any_count_auto: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelAnyCountAuto(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id", Seq("view", "click", "purchase"))
        .orderBy("user_id"),
    oracle = w28_funnel_any_count.oracle)

  /** `followedByAny` ENUMERATION ([[Funnel.funnelAnyEnumerate]]): one
    * row per ordered combination. Answer-size-bound by construction
    * (the t79 rationale) — the chained user-keyed range join IS the
    * right distributed plan when the output is the combination set;
    * the fold-based w28 serves the count-only case. The comparison
    * form adds a total ORDER BY for row stability; the bench form
    * drops it. */
  val w30_funnel_any: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelAnyEnumerate(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id", Seq("view", "click", "purchase"))
        .orderBy("user_id", "ts1_us", "ts2_us", "ts3_us"),
    bench = true,
    benchRun = Some((spark, dir) =>
      Funnel.funnelAnyEnumerate(t(spark, dir, "events"), "user_id",
        "event_type", "ts", "event_id", Seq("view", "click", "purchase"))),
    oracle = Some {
      s"""$sqlEventsPrefix
         |dummy AS (SELECT 1)
         |SELECT a.user_id, a.us AS ts1_us, b.us AS ts2_us, c.us AS ts3_us
         |FROM e a
         |JOIN e b ON b.user_id = a.user_id AND b.event_type = 'click'
         |  AND ${sqlBefore("a", "b")}
         |JOIN e c ON c.user_id = b.user_id AND c.event_type = 'purchase'
         |  AND ${sqlBefore("b", "c")}
         |WHERE a.event_type = 'view'
         |ORDER BY 1, 2, 3, 4""".stripMargin
    })

  private def MultiMatchCap = 12 // > the data's max (7 at sf0.01), with headroom

  /** Match ENUMERATION — Flink CEP's AFTER MATCH SKIP PAST LAST EVENT
    * ([[Funnel.funnelMulti]]): every non-overlapping view → click →
    * purchase match per user, not just the first ([[w6_funnel]]'s
    * contract). The operator is ONE fold via the witness-stream
    * reduction (pointer = advances mod k); the oracle replays the
    * greedy-restart machine literally as cap×k chained first-picks,
    * where match m's view is picked strictly after match m-1's
    * purchase. `n_matches` is the TRUE per-user total — exact against
    * the oracle's windowed count because the cap (12) exceeds the
    * data's maximum (7 at sf0.01); if a regenerated corpus ever
    * crosses the cap this gate fails LOUDLY rather than comparing
    * truncated counts. */
  val w26_funnel_matches: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelMulti(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq("view", "click", "purchase"), maxMatches = MultiMatchCap)
        .orderBy("user_id", "match_idx"),
    bench = true,
    oracle = Some {
      val stages = Seq("view", "click", "purchase")
      def first(tag: String, tp: String, prev: Option[String]): String =
        prev match {
          case None =>
            s"""$tag AS (SELECT user_id, us, event_id FROM (
               |  SELECT user_id, us, event_id,
               |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
               |  FROM e WHERE event_type = '$tp') WHERE rn = 1)""".stripMargin
          case Some(p) =>
            s"""$tag AS (SELECT user_id, us, event_id FROM (
               |  SELECT e.user_id, e.us, e.event_id,
               |    row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) AS rn
               |  FROM e JOIN $p p ON p.user_id = e.user_id
               |    AND ${sqlBefore("p", "e")}
               |  WHERE e.event_type = '$tp') WHERE rn = 1)""".stripMargin
        }
      val ctes = (1 to MultiMatchCap).flatMap { m =>
        stages.zipWithIndex.map { case (tp, j) =>
          val prev = if (j > 0) Some(s"s${m}_$j")
            else if (m > 1) Some(s"s${m - 1}_${stages.length}") else None
          first(s"s${m}_${j + 1}", tp, prev)
        }
      }.mkString(",\n")
      val rows = (1 to MultiMatchCap).map { m =>
        s"""SELECT a.user_id, $m AS match_idx, a.us AS ts1_us,
           |  b.us AS ts2_us, c.us AS ts3_us
           |FROM s${m}_1 a JOIN s${m}_2 b USING (user_id)
           |  JOIN s${m}_3 c USING (user_id)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""$sqlEventsPrefix
         |$ctes
         |SELECT user_id, CAST(match_idx AS BIGINT) AS match_idx,
         |  CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_matches,
         |  ts1_us, ts2_us, ts3_us
         |FROM ($rows)
         |ORDER BY user_id, match_idx""".stripMargin
    })

  /** [[w26_funnel_matches]] through the SKEW-SAFE segment monoid
    * ([[Funnel.funnelMultiBucketed]]): the witness-stream reduction
    * makes the summary (advance count, capped witness list) with
    * concat-truncate composition — exact because the trajectory reads
    * the TRUE counter, never the capped list. Gated on w26's oracle
    * VERBATIM. */
  val w27_funnel_matches_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelMultiBucketed(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq("view", "click", "purchase"), maxMatches = MultiMatchCap,
          bucketSeconds = 3600L)
        .orderBy("user_id", "match_idx"),
    oracle = w26_funnel_matches.oracle)

  private val AbsenceWindowUs = 432000L * 1000000L // 5 days

  /** TRAILING `notFollowedBy(error).within(5 days)` — Flink's absence
    * alarm, the one place Flink ADMITS a pattern ending in a negation
    * ([[Funnel.funnelMatchesAbsence]], round 19): every canonical
    * skip-past-last view→click→purchase match that fits the window
    * AND has no error event in its absence tail (completion,
    * start + 5 d]. `match_idx` keeps its enumeration index (gaps mark
    * window-cut or blocker-killed matches); `n_matches` recounts
    * survivors. Oracle: w26's chained greedy-pick replay with the
    * same two predicates, the tail as NOT EXISTS. */
  val w73_funnel_matches_absence: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelMatchesAbsence(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq("view", "click", "purchase"), maxMatches = MultiMatchCap,
          windowMicros = AbsenceWindowUs, absentType = "error")
        .orderBy("user_id", "match_idx"),
    oracle = Some {
      val stages = Seq("view", "click", "purchase")
      def first(tag: String, tp: String, prev: Option[String]): String =
        prev match {
          case None =>
            s"""$tag AS (SELECT user_id, us, event_id FROM (
               |  SELECT user_id, us, event_id,
               |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
               |  FROM e WHERE event_type = '$tp') WHERE rn = 1)""".stripMargin
          case Some(p) =>
            s"""$tag AS (SELECT user_id, us, event_id FROM (
               |  SELECT e.user_id, e.us, e.event_id,
               |    row_number() OVER (PARTITION BY e.user_id ORDER BY e.us, e.event_id) AS rn
               |  FROM e JOIN $p p ON p.user_id = e.user_id
               |    AND ${sqlBefore("p", "e")}
               |  WHERE e.event_type = '$tp') WHERE rn = 1)""".stripMargin
        }
      val ctes = (1 to MultiMatchCap).flatMap { m =>
        stages.zipWithIndex.map { case (tp, j) =>
          val prev = if (j > 0) Some(s"a${m}_$j")
            else if (m > 1) Some(s"a${m - 1}_${stages.length}") else None
          first(s"a${m}_${j + 1}", tp, prev)
        }
      }.mkString(",\n")
      val rows = (1 to MultiMatchCap).map { m =>
        s"""SELECT a.user_id, $m AS match_idx, a.us AS ts1_us,
           |  b.us AS ts2_us, c.us AS ts3_us
           |FROM a${m}_1 a JOIN a${m}_2 b USING (user_id)
           |  JOIN a${m}_3 c USING (user_id)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""$sqlEventsPrefix
         |$ctes
         |SELECT user_id, CAST(match_idx AS BIGINT) AS match_idx,
         |  CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_matches,
         |  ts1_us, ts2_us, ts3_us
         |FROM ($rows) m
         |WHERE ts3_us - ts1_us <= $AbsenceWindowUs
         |  AND NOT EXISTS (SELECT 1 FROM e b
         |    WHERE b.user_id = m.user_id AND b.event_type = 'error'
         |      AND b.us > m.ts3_us AND b.us <= m.ts1_us + $AbsenceWindowUs)
         |ORDER BY user_id, match_idx""".stripMargin
    })

  /** [[w73_funnel_matches_absence]] through the SKEW-SAFE segment
    * monoid (the enumeration rides [[Funnel.funnelMultiBucketed]],
    * w27's machine; span and tail filters are per-match index
    * properties, unchanged by how the witness stream was folded).
    * Gates on w73's oracle VERBATIM. */
  val w73b_funnel_matches_absence_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelMatchesAbsence(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq("view", "click", "purchase"), maxMatches = MultiMatchCap,
          windowMicros = AbsenceWindowUs, absentType = "error",
          bucketSeconds = Some(3600L))
        .orderBy("user_id", "match_idx"),
    oracle = w73_funnel_matches_absence.oracle)

  /** Oracle for the after-match-skip family ([[Funnel.funnelSkip]]):
    * per-start greedy chains as k-1 chained first-after picks (one
    * row_number-1 hop per expanded stage, each strictly after the
    * previous bound event in the (us, event_id) total order), then the
    * completion-order pruning scan as a RECURSIVE CTE walking each
    * user's chains in completion order and carrying the running anchor
    * threshold — the data-dependent running max that plain window
    * functions cannot express. `anchor` = 1-based expanded witness
    * index (None = no pruning), `inclusive` = survivor keeps start >=
    * threshold (vs strictly > for past-last). */
  private def sqlSkipOracle(types: Seq[String], anchor: Option[Int],
      inclusive: Boolean, cap: Int): String = {
    val k = types.length
    val hops = (2 to k).map { j =>
      val prevCols = (1 to j - 1).flatMap(i => Seq(s"u$i", s"g$i"))
        .map("c." + _).mkString(", ")
      s"""c$j AS (SELECT * EXCLUDE (rn) FROM (
         |  SELECT c.user_id, $prevCols, e.us AS u$j, e.event_id AS g$j,
         |    row_number() OVER (PARTITION BY c.user_id, c.u1, c.g1
         |      ORDER BY e.us, e.event_id) AS rn
         |  FROM c${j - 1} c JOIN e ON e.user_id = c.user_id
         |    AND e.event_type = '${types(j - 1)}'
         |    AND (e.us > c.u${j - 1} OR (e.us = c.u${j - 1}
         |         AND e.event_id > c.g${j - 1}))) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val survOp = if (inclusive) ">=" else ">"
    val (thr, surv) = anchor match {
      case None => (
        "s.mu AS mu, s.mo AS mo",
        "TRUE")
      case Some(a) => (
        s"""CASE WHEN (c.u1 > s.mu OR (c.u1 = s.mu AND c.g1 $survOp s.mo))
           |      AND (c.u$a > s.mu OR (c.u$a = s.mu AND c.g$a > s.mo))
           |    THEN c.u$a ELSE s.mu END AS mu,
           |  CASE WHEN (c.u1 > s.mu OR (c.u1 = s.mu AND c.g1 $survOp s.mo))
           |      AND (c.u$a > s.mu OR (c.u$a = s.mu AND c.g$a > s.mo))
           |    THEN c.g$a ELSE s.mo END AS mo""".stripMargin,
        s"(c.u1 > s.mu OR (c.u1 = s.mu AND c.g1 $survOp s.mo))")
    }
    val uCols = (1 to k).map(j => s"c.u$j").mkString(", ")
    val tsCols = (1 to k).map(j => s"u$j AS ts${j}_us").mkString(", ")
    s"""WITH RECURSIVE e AS (SELECT user_id,
       |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id, event_type
       |  FROM events),
       |c1 AS (SELECT user_id, us AS u1, event_id AS g1 FROM e
       |  WHERE event_type = '${types.head}'),
       |$hops,
       |ch AS (SELECT *,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY u$k, g$k, u1, g1) AS rk
       |  FROM c$k),
       |sel AS (
       |  SELECT user_id, CAST(0 AS BIGINT) AS rk,
       |    CAST(-1 AS BIGINT) AS mu, CAST(-1 AS BIGINT) AS mo,
       |    FALSE AS emit,
       |    ${(1 to k).map(j => s"CAST(NULL AS BIGINT) AS u$j").mkString(", ")}
       |  FROM (SELECT DISTINCT user_id FROM ch)
       |  UNION ALL
       |  SELECT c.user_id, CAST(c.rk AS BIGINT) AS rk,
       |    $thr,
       |    $surv AS emit,
       |    $uCols
       |  FROM sel s JOIN ch c ON c.user_id = s.user_id AND c.rk = s.rk + 1)
       |SELECT * FROM (
       |  SELECT user_id,
       |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY rk)
       |      AS BIGINT) AS match_idx,
       |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_matches,
       |    $tsCols
       |  FROM sel WHERE emit)
       |WHERE match_idx <= $cap
       |ORDER BY user_id, match_idx""".stripMargin
  }

  /** Loop-stage COMBINATIONS multiplicity — Flink CEP's
    * `oneOrMore().allowCombinations()` ([[Funnel.funnelCombinations]]):
    * view → click+(combinations) → purchase counts every (view, click
    * subset, purchase) match — the loop stage may pick ANY non-empty
    * ordered subset of clicks between the anchors. The fold is linear
    * (loop stage = diagonal 2), the count is the answer; the oracle is
    * the closed form Σ over (view, purchase) pairs of
    * `2^{clicks between} − 1`, exact in BIGINT via a shift. */
  val w39_funnel_combinations: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelCombinations(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq("view" -> false, "click" -> true, "purchase" -> false))
        .orderBy("user_id"),
    bench = true,
    oracle = Some(
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    event_id, event_type FROM events),
        |u AS (SELECT DISTINCT user_id FROM e),
        |v AS (SELECT user_id, us, event_id FROM e WHERE event_type = 'view'),
        |p AS (SELECT user_id, us, event_id FROM e
        |  WHERE event_type = 'purchase'),
        |pairs AS (SELECT v.user_id,
        |    (SELECT count(*) FROM e c WHERE c.user_id = v.user_id
        |      AND c.event_type = 'click'
        |      AND (c.us > v.us OR (c.us = v.us AND c.event_id > v.event_id))
        |      AND (c.us < p.us OR (c.us = p.us AND c.event_id < p.event_id)))
        |      AS nb
        |  FROM v JOIN p ON p.user_id = v.user_id
        |    AND (v.us < p.us OR (v.us = p.us AND v.event_id < p.event_id)))
        |SELECT u.user_id,
        |  CAST(coalesce(sum((CAST(1 AS BIGINT) << nb) - 1), 0) AS BIGINT)
        |    AS n_combi
        |FROM u LEFT JOIN pairs USING (user_id)
        |GROUP BY u.user_id ORDER BY user_id""".stripMargin))

  /** [[w39_funnel_combinations]] through the SKEW-SAFE matrix-monoid
    * split ([[Funnel.funnelCombinationsBucketed]] — the w29 machinery
    * with diagonal-2 loop rows). Gated on w39's oracle VERBATIM. */
  val w41_funnel_combinations_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelCombinationsBucketed(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq("view" -> false, "click" -> true, "purchase" -> false),
          bucketSeconds = 3600L)
        .orderBy("user_id"),
    oracle = w39_funnel_combinations.oracle)

  /** After-match skip SKIP_TO_LAST ([[Funnel.funnelSkip]] with
    * [[Funnel.SkipToLast]]): view → click×2 → purchase, an emitted
    * match discards partial matches started strictly before its LAST
    * click — the quantified middle stage is what makes FIRST and LAST
    * anchors differ (w34 is the same pattern re-anchored). The machine
    * is the per-start branch NFA (one greedy chain per view, branch
    * buckets advancing together — O(k) buckets, one user-keyed
    * shuffle) plus the completion-order pruning scan; the oracle
    * replays the chains as chained first-after hop joins and the
    * pruning as a recursive CTE carrying the running anchor
    * threshold. */
  val w33_funnel_skip_to_last: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelSkip(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq("view" -> 1, "click" -> 2, "purchase" -> 1),
          Funnel.SkipToLast(2), maxMatches = MultiMatchCap)
        .orderBy("user_id", "match_idx"),
    bench = true,
    oracle = Some(sqlSkipOracle(
      Seq("view", "click", "click", "purchase"),
      anchor = Some(3), inclusive = true, cap = MultiMatchCap)))

  /** After-match skip SKIP_TO_FIRST ([[Funnel.SkipToFirst]]): w33's
    * pattern anchored at the FIRST click of the emitted match — a
    * strictly weaker threshold, so it emits a superset of w33's
    * matches (both gated independently; the pair is what proves the
    * first/last anchors are genuinely different machines). */
  val w34_funnel_skip_to_first: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelSkip(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq("view" -> 1, "click" -> 2, "purchase" -> 1),
          Funnel.SkipToFirst(2), maxMatches = MultiMatchCap)
        .orderBy("user_id", "match_idx"),
    oracle = Some(sqlSkipOracle(
      Seq("view", "click", "click", "purchase"),
      anchor = Some(2), inclusive = true, cap = MultiMatchCap)))

  /** After-match skip SKIP_TO_NEXT ([[Funnel.SkipToNext]]): EVERY view
    * event's greedy chain emits (an emitted match discards only
    * branches sharing its own start) — the full per-start enumeration,
    * where w26's skip-past-last emits only non-overlapping matches.
    * The output cap is exercised here (users with more starts than
    * `maxMatches` report the true n_matches with the first
    * `maxMatches` rows). */
  val w35_funnel_skip_to_next: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelSkip(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq("view" -> 1, "click" -> 1, "purchase" -> 1),
          Funnel.SkipToNext, maxMatches = MultiMatchCap)
        .orderBy("user_id", "match_idx"),
    oracle = Some(sqlSkipOracle(
      Seq("view", "click", "purchase"),
      anchor = None, inclusive = true, cap = MultiMatchCap)))

  /** [[w33_funnel_skip_to_last]] through the SKEW-SAFE bucketed split
    * ([[Funnel.funnelSkipBucketed]]): per-segment entry-bucket scalar
    * simulations + an internal machine run, carried buckets
    * re-distributed through the entry table, completions re-sorted on
    * (completion, start) before the identical pruning scan. Gated on
    * w33's oracle VERBATIM. */
  val w36_funnel_skip_to_last_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelSkipBucketed(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq("view" -> 1, "click" -> 2, "purchase" -> 1),
          Funnel.SkipToLast(2), maxMatches = MultiMatchCap,
          bucketSeconds = 3600L)
        .orderBy("user_id", "match_idx"),
    oracle = w33_funnel_skip_to_last.oracle)

  /** [[Funnel.funnelSkipAuto]] — w33's after-match-skip machine
    * through the feasibility router: the family where routing matters
    * most (bucketed WON 2.6× at the 20M power key and the single fold
    * dies at ~48M events — before the router the caller had to know
    * both facts). Routes single at sf0.01; FunnelSpec forces both
    * routes. Gated on w33's oracle VERBATIM. */
  val w45_funnel_skip_auto: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelSkipAuto(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq("view" -> 1, "click" -> 2, "purchase" -> 1),
          Funnel.SkipToLast(2), maxMatches = MultiMatchCap)
        .orderBy("user_id", "match_idx"),
    oracle = w33_funnel_skip_to_last.oracle)

  /** [[w35_funnel_skip_to_next]] through the bucketed split — the
    * no-pruning case exercises the pure chain-enumeration monoid
    * (entry-table composition with nothing killed). Gated on w35's
    * oracle VERBATIM. */
  val w37_funnel_skip_to_next_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelSkipBucketed(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          Seq("view" -> 1, "click" -> 1, "purchase" -> 1),
          Funnel.SkipToNext, maxMatches = MultiMatchCap,
          bucketSeconds = 3600L)
        .orderBy("user_id", "match_idx"),
    oracle = w35_funnel_skip_to_next.oracle)

  /** GUARDED funnel — Flink CEP's `notFollowedBy` INSIDE a pattern
    * ([[Funnel.funnelGuarded]]): view → click → purchase counts only
    * via chains with NO `error` event strictly between consecutive
    * matched stages. Greedy is wrong here too (the earliest start can
    * be poisoned by a blocker while a later restart stays clean), so
    * the operator runs the NFA existence fold — 2k booleans of state,
    * one user-keyed shuffle. The oracle replays it as chained
    * total-order joins with a NOT EXISTS blocker probe on every hop. */
  val w10_funnel_guarded: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGuarded(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id", FunnelStages,
          Seq(Some("error"), Some("error")))
        .orderBy("user_id"),
    oracle = Some {
      def hop(j: Int, tp: String, prev: String): String =
        s"""c$j AS (SELECT DISTINCT e.user_id, e.us, e.event_id
           |  FROM $prev p JOIN e ON e.user_id = p.user_id
           |    AND (e.us > p.us OR (e.us = p.us AND e.event_id > p.event_id))
           |    AND e.event_type = '$tp'
           |  WHERE NOT EXISTS (SELECT 1 FROM e b
           |    WHERE b.user_id = p.user_id AND b.event_type = 'error'
           |      AND (b.us > p.us OR (b.us = p.us AND b.event_id > p.event_id))
           |      AND (b.us < e.us OR (b.us = e.us AND b.event_id < e.event_id))))""".stripMargin
      s"""WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |    event_id, event_type FROM events),
         |u AS (SELECT DISTINCT user_id FROM e),
         |c1 AS (SELECT user_id, us, event_id FROM e
         |  WHERE event_type = '${FunnelStages(0)}'),
         |${hop(2, FunnelStages(1), "c1")},
         |${hop(3, FunnelStages(2), "c2")},
         |m1 AS (SELECT DISTINCT user_id FROM c1),
         |m2 AS (SELECT DISTINCT user_id FROM c2),
         |m3 AS (SELECT DISTINCT user_id FROM c3)
         |SELECT u.user_id,
         |  CASE WHEN m3.user_id IS NOT NULL THEN 3
         |       WHEN m2.user_id IS NOT NULL THEN 2
         |       WHEN m1.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage_reached
         |FROM u LEFT JOIN m1 USING (user_id) LEFT JOIN m2 USING (user_id)
         |  LEFT JOIN m3 USING (user_id)
         |ORDER BY user_id""".stripMargin
    })

  /** [[w10_funnel_guarded]] through the SKEW-SAFE bucketed split
    * ([[Funnel.funnelGuardedBucketed]], 1-hour segments): the NFA is
    * a union of independent chains, so a segment's effect is LINEAR
    * over the entry vector in the boolean semiring — k+1 unit-entry
    * folds of O(k) metadata per segment, composed in bucket order.
    * Gates against w10's oracle VERBATIM. */
  val w11_funnel_guarded_bucketed: Q = Q(
    run = (spark, dir) =>
      Funnel.funnelGuardedBucketed(t(spark, dir, "events"), "user_id",
          "event_type", "ts", "event_id", FunnelStages,
          Seq(Some("error"), Some("error")), bucketSeconds = 3600L)
        .orderBy("user_id"),
    oracle = w10_funnel_guarded.oracle)

  /** Semi-structured extraction: pull a typed field out of the JSON
    * `props` column and aggregate it — the event-pipeline staple Spark
    * runs as `get_json_object` inside whole-stage codegen (no UDF, no
    * schema inference pass; at 100 TB the JSON never leaves the scan
    * projection). */
  val j2_json_extract: Q = Q(
    run = (spark, dir) =>
      t(spark, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          coalesce(sum("k"), lit(0L)).as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type"),
    oracle = Some(
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COALESCE(SUM(CAST(props ->> 'k' AS BIGINT)), 0) AS BIGINT) AS sum_k,
        |  CAST(MIN(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(MAX(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Incremental dedup of a RESUMED ingest batch against already-landed
    * data ([[IncrementalDedup]]): the resumed scan re-reads the
    * watermark boundary region (keys in (max/2, max·6/10] here), and the
    * operator drops exactly the re-read rows by canonical row hash —
    * Bloom-prefiltered so only candidates shuffle into the anti-join.
    * The oracle is the honest NOT EXISTS over the same split: the Bloom
    * must be semantically invisible. */
  val t33_bloom_dedup: Q = Q(
    run = (spark, dir) => {
      val li = tf(spark, dir, "lineitem")
      val metas = ColumnMeta.fromSchema(li.schema)
      // barrier: the canonical row hash is the expensive part and FOUR
      // consumers read it (Bloom train, anti-join corpus side, the two
      // batch branches) — unstaged, each replays the MD5 over its slice
      // (measured 12.9 s → 4.4 s at sf0.1). The max-key probe reads the
      // staged table too, so the corpus scan happens exactly once.
      // planBarrier (r21/r22): the canonical-hash tree is ENORMOUS (11
      // per-column token pipelines feeding two MD5s), a persist
      // barrier inlines it into all four consumer plans, and the
      // analyzer/optimizer + AQE replans were walking it 4× per run —
      // 1.3 s/rep of pure driver time (ProfileQuery: wall 4.1 s,
      // jobSum 2.8 s). In local mode the barrier is a localCheckpoint
      // (truncates the lineage to a leaf, guide §3.3/§5; no new
      // failure mode — the blocks live in the one process either
      // way); on a cluster it stays a recoverable persist barrier
      // (r21 ADVICE: unreplicated checkpoint blocks make an executor
      // loss fatal at scale).
      val hashed = Staging.planBarrier(li.select(col("l_orderkey"),
        col("l_linenumber"), CanonicalHash.rowHashExpr(metas).as("row_md5")))
      // max + count fused into ONE driver job (guide §5); the count
      // sizes the Bloom from the DATA — the old 2^20 constant would
      // undersize the filter as the corpus grows (fpp explodes and the
      // anti-join floods; result-identical either way, the Bloom is
      // semantically invisible, but the sizing must scale)
      val stats = hashed.agg(max("l_orderkey"), count(lit(1))).head
      val (maxKey, totalRows) = (stats.getLong(0), stats.getLong(1))
      val corpus = hashed.filter(col("l_orderkey") <= maxKey * 6 / 10)
        .select("row_md5")
      val batch = hashed.filter(col("l_orderkey") > maxKey / 2)
        .select("l_orderkey", "l_linenumber", "row_md5")
      IncrementalDedup.newRows(batch, corpus, "row_md5",
          expectedItems = totalRows.max(1L), fpp = 0.01)
        .orderBy("l_orderkey", "l_linenumber")
    },
    oracle = {
      val h = OracleSql.rowHash(LineitemMetas)
      Some(
        s"""WITH h AS (SELECT l_orderkey, l_linenumber, $h AS row_md5 FROM lineitem),
           |mx AS (SELECT max(l_orderkey) AS mk FROM lineitem)
           |SELECT l_orderkey, l_linenumber, row_md5
           |FROM h b
           |WHERE b.l_orderkey > (SELECT mk // 2 FROM mx)
           |  AND NOT EXISTS (SELECT 1 FROM h c
           |    WHERE c.l_orderkey <= (SELECT mk * 6 // 10 FROM mx)
           |      AND c.row_md5 = b.row_md5)
           |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    },
    bench = true)

  /** SemDeDup semantic dedup: the k-means cells from the t12 index bound
    * the pairwise-cosine space (within-cell only, never corpus²); a
    * vector survives iff no lower-id cell-mate is ≥ threshold similar.
    * The oracle reuses the t12 Lloyd CTEs so both engines derive the
    * SAME cells, then replays the pair rule in SQL. */
  val t34_semdedup: Q = Q(
    run = (spark, dir) =>
      VectorOps.semDedup(tf(spark, dir, "embeddings"), "vec_id", "embedding",
          kClusters = IvfClusters, iters = IvfIters,
          threshold = SemDedupThreshold)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id"),
    oracle = Some(
      s"""${kmeansCtePrefix()},
         |drp AS (SELECT DISTINCT b.vec_id AS id
         |  FROM corpus a JOIN corpus b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= $SemDedupThreshold)
         |SELECT c.vec_id, CAST(c.cell AS INT) AS cell, (d.id IS NULL) AS keep
         |FROM corpus c LEFT JOIN drp d ON d.id = c.vec_id
         |ORDER BY vec_id""".stripMargin),
    bench = true)

  /** The SQL twin of [[VectorOps.semDedupAutoK]]:
    * k = clamp(⌈√(N / (2·(iters+1)))⌉, 2,
    * [[VectorOps.SemDedupMaxClusters]]) as a scalar subquery over the
    * corpus count, so the t34a oracle stays valid at ANY verify scale —
    * both engines derive k from the same count (and the same iters
    * literal) rather than baking one scale's value into the SQL. */
  private val semDedupAutoKSql: String =
    s"""(SELECT GREATEST(2, LEAST(${VectorOps.SemDedupMaxClusters},
       |    CAST(ceil(sqrt(CAST(count(*) AS DOUBLE) / ${2.0 * (IvfIters + 1)})) AS BIGINT))) FROM embeddings)""".stripMargin

  /** t34 with kClusters DERIVED from the corpus count —
    * [[VectorOps.semDedupAuto]], the scale-safe SemDeDup entry point
    * (fixed k turns 10× data into ~100× within-cell pairwise work; the
    * round-10 audit measured that as an 11.8× runtime row). The oracle
    * replays the SAME derivation in SQL ([[semDedupAutoKSql]]) feeding
    * the shared Lloyd unroll, so the gate holds at any scale, and both
    * engines train the same derived seed count (7 at the sf0.01 verify
    * corpus's N=500, iters=5) through bit-identical iterations. */
  val t34a_semdedup_auto: Q = Q(
    run = (spark, dir) =>
      VectorOps.semDedupAuto(tf(spark, dir, "embeddings"), "vec_id", "embedding",
          threshold = SemDedupThreshold, iters = IvfIters)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id"),
    oracle = Some(
      s"""${kmeansCtePrefix(kSql = semDedupAutoKSql)},
         |drp AS (SELECT DISTINCT b.vec_id AS id
         |  FROM corpus a JOIN corpus b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= $SemDedupThreshold)
         |SELECT c.vec_id, CAST(c.cell AS INT) AS cell, (d.id IS NULL) AS keep
         |FROM corpus c LEFT JOIN drp d ON d.id = c.vec_id
         |ORDER BY vec_id""".stripMargin),
    bench = true)

  private val MixtureBudget = 200L

  /** Temperature mixture sampling — [[TextAnalysis.mixtureWeights]]
    * (α = 1/2 source reweighting toward a document budget; integer-scaled
    * weights so both engines agree bit-for-bit). */
  val t35_mixture_weights: Q = Q(
    run = (spark, dir) =>
      TextAnalysis.mixtureWeights(t(spark, dir, "documents"), "source",
          "doc_id", budget = MixtureBudget)
        .select("doc_id", "source", "n_docs", "ppm", "quota", "keep")
        .orderBy("doc_id"),
    oracle = Some(
      s"""WITH cnt AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
         |wi AS (SELECT source, n_docs,
         |    CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT) AS wi
         |  FROM cnt),
         |tot AS (SELECT SUM(wi) AS tw FROM wi),
         |wts AS (SELECT source, n_docs, wi * 1000000 // tw AS ppm,
         |    least(n_docs, (wi * 1000000 // tw) * $MixtureBudget // 1000000) AS quota
         |  FROM wi, tot),
         |rk AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source
         |    ORDER BY md5(source || ':' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
         |  FROM documents)
         |SELECT r.doc_id, r.source, w.n_docs, CAST(w.ppm AS BIGINT) AS ppm,
         |  CAST(w.quota AS BIGINT) AS quota, (r.rk <= w.quota) AS keep
         |FROM rk r JOIN wts w USING (source)
         |ORDER BY doc_id""".stripMargin))

  private val WinnowGram = 5
  private val WinnowWindow = 4

  /** Winnowing positional fingerprints — [[graft.functions
    * .WinnowFingerprints]] (Schleimer et al. SIGMOD'03 / MOSS): one pick
    * per sliding window of `WinnowWindow` consecutive `WinnowGram`-char
    * gram hashes, rightmost-min tie-break, deduplicated. Unlike t11's
    * global min-k signature these localize WHERE documents overlap: any
    * shared substring of ≥ gram+w−1 chars shares a fingerprint. Docs
    * shorter than gram+w−1 codepoints emit nothing. Map-only after the
    * scan; the oracle replays the same windows relationally. */
  val t37_winnowing: Q = Q(
    run = (spark, dir) =>
      tf(spark, dir, "documents")
        .select(col("doc_id"),
          explode(graft.functions.WinnowFingerprints(
            lower(trim(col("text"))), WinnowGram, WinnowWindow)).as("fp"))
        .select(col("doc_id"), col("fp.pos").as("pos"), col("fp.h").as("h"))
        .orderBy("doc_id", "pos"),
    oracle = Some(
      s"""WITH n AS (SELECT doc_id, lower(trim(text)) AS norm FROM documents),
         |hs AS (SELECT doc_id,
         |    [md5(substr(norm, i+1, $WinnowGram)) for i in range(length(norm) - ${WinnowGram - 1})] AS h
         |  FROM n WHERE length(norm) >= ${WinnowGram + WinnowWindow - 1}),
         |g AS (SELECT doc_id, t.i AS pos, h[t.i+1] AS hv
         |  FROM hs, unnest(range(len(h))) t(i)),
         |wj AS (SELECT doc_id, t.j AS j
         |  FROM hs, unnest(range(len(h) - ${WinnowWindow - 1})) t(j)),
         |ex AS (SELECT w.doc_id, w.j, g.pos, g.hv FROM wj w
         |  JOIN g ON g.doc_id = w.doc_id
         |    AND g.pos BETWEEN w.j AND w.j + ${WinnowWindow - 1}),
         |wmin AS (SELECT doc_id, j, min(hv) AS mh FROM ex GROUP BY 1, 2),
         |pick AS (SELECT e.doc_id, e.j, max(e.pos) AS pos FROM ex e
         |  JOIN wmin m ON m.doc_id = e.doc_id AND m.j = e.j AND e.hv = m.mh
         |  GROUP BY 1, 2)
         |SELECT DISTINCT p.doc_id AS doc_id, CAST(p.pos AS INT) AS pos, g.hv AS h
         |FROM pick p JOIN g ON g.doc_id = p.doc_id AND g.pos = p.pos
         |ORDER BY p.doc_id, pos""".stripMargin),
    bench = true)

  private val WinnowMaxDf = 20
  private val WinnowMinShared = 3

  /** Winnowing-pair candidates — [[TextDedup.winnowPairs]] (docs sharing
    * ≥ minShared rare fingerprints; the df-cap drops stop-grams before
    * the self-join). Composes the t37 fingerprints into the dedup
    * family's pair-finding stage. */
  val t39_winnow_pairs: Q = Q(
    run = (spark, dir) =>
      TextDedup.winnowPairs(t(spark, dir, "documents"), "doc_id", "text",
          gram = WinnowGram, w = WinnowWindow, maxDf = WinnowMaxDf,
          minShared = WinnowMinShared)
        .orderBy("id_a", "id_b"),
    oracle = Some(
      s"""WITH wfp AS (SELECT doc_id, h FROM (${"" /* t37 CTE below */}
         |  ${t37_winnowing.oracle.get.replace("\n", "\n  ")}
         |) GROUP BY doc_id, h),
         |dfq AS (SELECT h FROM (SELECT h, count(*) AS c FROM wfp GROUP BY h)
         |  WHERE c <= $WinnowMaxDf),
         |rare AS (SELECT doc_id, h FROM wfp JOIN dfq USING (h)),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
         |  FROM rare a JOIN rare b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, CAST(shared AS BIGINT) AS shared
         |FROM p WHERE shared >= $WinnowMinShared
         |ORDER BY id_a, id_b""".stripMargin))

  /** The composed MOSS-style dedup PIPELINE: winnowing fingerprints →
    * rare-fingerprint candidate pairs (t39) → connected components →
    * survivors-only corpus — the winnow family brought to full parity
    * with the MinHash route (t3 → t16 → t19). Same modality-agnostic
    * clustering and survivor application; only the pair-finding stage
    * differs (positional fingerprints localize overlap, so this pipeline
    * catches long shared SPANS that whole-doc Jaccard dilutes away).
    * Output mirrors t19: surviving doc ids with token counts. */
  val t41_winnow_dedup_apply: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val pairs = TextDedup.winnowPairs(docs, "doc_id", "text",
          gram = WinnowGram, w = WinnowWindow, maxDf = WinnowMaxDf,
          minShared = WinnowMinShared)
        .select("id_a", "id_b")
      TextDedup.keepSurvivors(docs, "doc_id", TextDedup.connectedComponents(pairs))
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("ws_tokens"))
        .orderBy("doc_id")
    },
    oracle = Some(
      s"""WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM (${t39_winnow_pairs.oracle.get})),
         |nodes AS (SELECT DISTINCT id FROM (
         |  SELECT id_a AS id FROM pairs UNION ALL SELECT id_b AS id FROM pairs)),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
         |reach AS (
         |  SELECT id, id AS lbl FROM nodes
         |  UNION
         |  SELECT e.dst AS id, r.lbl AS lbl FROM reach r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id)
         |SELECT d.doc_id,
         |  CAST(len(list_filter(string_split_regex(lower(trim(d.text)), '\\s+'), x -> x <> '')) AS BIGINT) AS ws_tokens
         |FROM documents d
         |WHERE NOT EXISTS (SELECT 1 FROM comp c
         |  WHERE c.id = d.doc_id AND c.id <> c.cluster_id)
         |ORDER BY d.doc_id""".stripMargin))

  private val DsirBudget = 100

  /** DSIR importance resampling — [[TextAnalysis.dsirWeights]] (unigram
    * target-vs-raw log-ratio, integer micro-logprobs, TakeOrdered
    * cutoff). Target domain = source 'src0'. */
  val t36_dsir_weights: Q = Q(
    run = (spark, dir) =>
      TextAnalysis.dsirWeights(t(spark, dir, "documents"), "doc_id", "text",
          targetPred = col("source") === "src0", vocab = LmVocab,
          budget = DsirBudget)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
    oracle = Some(
      s"""WITH base AS (SELECT doc_id, text, (source = 'src0') AS is_target FROM documents),
         |toks AS (SELECT doc_id, is_target,
         |    unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
         |  FROM base),
         |rc AS (SELECT w, count(*) AS rcnt FROM toks GROUP BY w),
         |rtot AS (SELECT CAST(sum(rcnt) AS BIGINT) AS total FROM rc),
         |tc AS (SELECT w, count(*) AS tcnt FROM toks WHERE is_target GROUP BY w),
         |ttot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM toks WHERE is_target),
         |lm AS (SELECT v.w,
         |    CAST(round(log10(v.rcnt * 1.0 / (SELECT total FROM rtot)) * 1000000) AS BIGINT) AS lp_raw,
         |    COALESCE(CAST(round(log10(tc.tcnt * 1.0 / (SELECT total FROM ttot)) * 1000000) AS BIGINT),
         |      CAST(round(log10(0.5 / (SELECT total FROM ttot)) * 1000000) AS BIGINT)) AS lp_tgt
         |  FROM (SELECT w, rcnt FROM rc ORDER BY rcnt DESC, w LIMIT $LmVocab) v
         |  LEFT JOIN tc ON tc.w = v.w),
         |oov AS (SELECT CAST(round(log10(0.5 / (SELECT total FROM ttot)) * 1000000) AS BIGINT) AS t,
         |    CAST(round(log10(0.5 / (SELECT total FROM rtot)) * 1000000) AS BIGINT) AS r),
         |scored AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(SUM(COALESCE(lm.lp_tgt, (SELECT t FROM oov))
         |      - COALESCE(lm.lp_raw, (SELECT r FROM oov))) AS BIGINT) AS dsir_micro
         |  FROM toks t LEFT JOIN lm ON lm.w = t.w GROUP BY t.doc_id),
         |fl AS (SELECT d.doc_id, COALESCE(s.n_tokens, 0) AS n_tokens,
         |    COALESCE(s.dsir_micro, 0) AS dsir_micro
         |  FROM documents d LEFT JOIN scored s USING (doc_id)),
         |cut AS (SELECT dsir_micro AS cd, doc_id AS ci FROM (
         |    SELECT * FROM fl ORDER BY dsir_micro DESC, doc_id LIMIT $DsirBudget)
         |  ORDER BY dsir_micro ASC, doc_id DESC LIMIT 1)
         |SELECT doc_id, n_tokens, dsir_micro,
         |  (dsir_micro > (SELECT cd FROM cut)
         |   OR (dsir_micro = (SELECT cd FROM cut) AND doc_id <= (SELECT ci FROM cut))) AS keep
         |FROM fl ORDER BY doc_id""".stripMargin))

  private val Bm25Terms = Seq("spark", "query", "stream", "filter")
  private val Bm25K = 25

  /** Okapi BM25 oracle, parameterized for reuse by t42 (whole corpus)
    * and t44 (corpus minus the probe document, list depth n). Mirrors
    * [[TextAnalysis.bm25TopK]]'s IEEE expression tree
    * parenthesis-for-parenthesis; scores in integer micro-units. */
  private def bm25OracleSql(terms: Seq[String], k: Int,
      excludeId: Option[Long] = None,
      survivorPredSql: Option[String] = None): String = {
    val tf = terms.indices.map(i =>
      s"len(list_filter(toks, x -> x = '${terms(i)}')) AS tf_$i")
    val dfAgg = terms.indices.map(i =>
      s"SUM(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS df_$i")
    val contrib = terms.indices.map(i =>
      s"""CAST(ROUND(1e6 * log10(1.0 + (n_docs - df_$i + 0.5) / (df_$i + 0.5)) *
         |    ((CAST(tf_$i AS DOUBLE) * (1.2 + 1.0)) /
         |     (CAST(tf_$i AS DOUBLE) + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / avgdl)))) AS BIGINT)""".stripMargin)
    val preds = excludeId.map(id => s"doc_id <> $id").toSeq ++
      survivorPredSql.toSeq
    val excl = if (preds.isEmpty) "" else "WHERE " + preds.mkString(" AND ")
    s"""WITH base AS (
       |  SELECT doc_id AS id,
       |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS toks
       |  FROM documents $excl),
       |perdoc AS (
       |  SELECT id, len(toks) AS dl, ${tf.mkString(",\n    ")}
       |  FROM base),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl, ${dfAgg.mkString(",\n    ")}
       |  FROM perdoc)
       |SELECT id AS doc_id,
       |  (${contrib.mkString("\n + ")}) AS score_micro
       |FROM perdoc CROSS JOIN stats
       |WHERE ${terms.indices.map(i => s"tf_$i > 0").mkString(" OR ")}
       |ORDER BY score_micro DESC, id LIMIT $k""".stripMargin
  }

  /** BM25 top-k keyword retrieval ([[TextAnalysis.bm25TopK]]): rank
    * documents for a static probe query — the quality-retrieval /
    * exemplar-selection primitive. Map-side tf columns over one
    * let-bound token array, one single-row stats aggregate broadcast
    * back, TakeOrderedAndProject cut — zero corpus shuffles. The oracle
    * mirrors the IEEE expression tree parenthesis-for-parenthesis and
    * compares the integer micro-unit scores hash-exactly (the t32
    * fixed-pointing rule). */
  val t42_bm25_topk: Q = Q(
    run = (spark, dir) =>
      TextAnalysis.bm25TopK(t(spark, dir, "documents"), "doc_id", "text",
          Bm25Terms, Bm25K)
        .withColumnRenamed("id", "doc_id"),
    oracle = Some(bm25OracleSql(Bm25Terms, Bm25K)))

  /** Persisted inverted index ([[Retrieval.writeBm25Index]] →
    * [[Retrieval.bm25TopKFromIndex]]): term-bucketed postings +
    * persisted corpus stats, probed for the t42 terms — the keyword
    * side of the build-once/probe-many family (t40 IVF+SQ8, t45 PQ).
    * Probe cost is the query terms' bucket-pruned postings, never a
    * corpus scan; the gate is t42's oracle hash-exact because the
    * per-term contribution is the same shared float tree and absent
    * terms contribute exactly 0. */
  val t46_bm25_index_persist: Q = Q(
    run = (spark, dir) => {
      val table = "graft_bm25_index"
      Retrieval.writeBm25Index(t(spark, dir, "documents"), "doc_id",
        "text", table)
      Retrieval.bm25TopKFromIndex(spark, table, Bm25Terms, Bm25K)
        .withColumnRenamed("id", "doc_id")
    },
    oracle = Some(bm25OracleSql(Bm25Terms, Bm25K)))

  /** Incremental BM25 index maintenance ([[Retrieval.appendToBm25Index]]):
    * the inverted index is built on two thirds of the corpus, the rest
    * is APPENDED — new postings land in their term buckets, (n_docs,
    * avgdl) are refreshed, per-term df is counted from postings at probe
    * time so it is exact by construction. BM25 has no trained state, so
    * append loses NOTHING: the gate is the full-corpus t42 oracle
    * VERBATIM — a probe after append must be indistinguishable from a
    * probe over a from-scratch build on the union. */
  val t54_bm25_index_append: Q = Q(
    run = (spark, dir) => {
      val table = "graft_bm25_append"
      val docs = t(spark, dir, "documents")
      Retrieval.writeBm25Index(docs.filter(col("doc_id") % 3 =!= 0),
        "doc_id", "text", table)
      Retrieval.appendToBm25Index(docs.filter(col("doc_id") % 3 === 0),
        "doc_id", "text", table)
      Retrieval.bm25TopKFromIndex(spark, table, Bm25Terms, Bm25K)
        .withColumnRenamed("id", "doc_id")
    },
    oracle = Some(bm25OracleSql(Bm25Terms, Bm25K)))

  /** BM25 index DELETE ([[Retrieval.deleteFromBm25Index]]): tombstone
    * the ids AND refresh the stats row — BM25's statistics are live
    * corpus aggregates, and all three refresh exactly ((n_docs, avgdl)
    * from surviving `_docs` rows, df from surviving postings at probe
    * time), so a probe after delete equals a probe over a from-scratch
    * build on the survivors. Gated on the survivor-restricted t42
    * oracle. */
  val t57_bm25_index_delete: Q = Q(
    run = (spark, dir) => {
      val table = "graft_bm25_delete"
      val docs = t(spark, dir, "documents")
      Retrieval.writeBm25Index(docs, "doc_id", "text", table)
      Retrieval.deleteFromBm25Index(docs.filter(col("doc_id") % 5 === 2),
        "doc_id", table)
      Retrieval.bm25TopKFromIndex(spark, table, Bm25Terms, Bm25K)
        .withColumnRenamed("id", "doc_id")
    },
    oracle = Some(bm25OracleSql(Bm25Terms, Bm25K,
      survivorPredSql = Some("doc_id % 5 <> 2"))))

  /** Cross-modality DELETE PROPAGATION ([[Forget.forgetEverywhere]]):
    * build all four index modalities, forget ids ≡ 2 (mod 5) in ONE
    * operation per id space, then probe EVERY modality in one unified
    * result — each block must equal its from-scratch survivor-built
    * oracle (the union of the four restricted oracles t56/t60/t57/t88
    * gate individually). Placeholder −1 instead of NULL in the k2/rank
    * slots keeps cross-engine row ordering deterministic. */
  val t95_forget_everywhere: Q = Q(
    run = (spark, dir) => {
      val docs = t(spark, dir, "documents")
      val emb = t(spark, dir, "embeddings")
      val annT = "graft_forget_ann"
      val pqT = "graft_forget_pq"
      val bmT = "graft_forget_bm25"
      val mhT = "graft_forget_minhash"
      VectorOps.writeIndex(emb, "vec_id", "embedding", annT,
        kClusters = IvfClusters, iters = IvfIters, numBuckets = 8)
      VectorOps.writePqIndex(emb, "vec_id", "embedding", pqT,
        m = PqM, ksub = PqKsub, iters = PqIters)
      Retrieval.writeBm25Index(docs, "doc_id", "text", bmT)
      TextDedup.writeMinhashIndex(docs, "doc_id", "text", n = 3,
        k = MinhashK, bandSize = BandSize, numBands = NumBands,
        threshold = JaccardThreshold, table = mhT)
      Forget.forgetEverywhere(emb.filter(col("vec_id") % 5 === 2),
        "vec_id", Forget.CorpusIndexes(ann = Some(annT), pq = Some(pqT)))
      Forget.forgetEverywhere(docs.filter(col("doc_id") % 5 === 2),
        "doc_id", Forget.CorpusIndexes(bm25 = Some(bmT), minhash = Some(mhT)))
      val none = lit(-1L)
      val ann = VectorOps.ivfSq8TopKFromIndex(VectorOps.loadIndex(spark, annT),
          col("id") < 10, k = 5, nprobe = IvfNprobe,
          candidates = Sq8Candidates)
        .select(lit("ann").as("modality"), col("query_id").as("k1"),
          col("neighbor_id").as("k2"), col("rank").cast("long").as("rank"),
          col("cos").cast("double").as("metric"))
      val pq = VectorOps.pqTopKFromIndex(VectorOps.loadPqIndex(spark, pqT),
          col("id") < 10, k = 5, candidates = PqCandidates)
        .select(lit("pq").as("modality"), col("query_id").as("k1"),
          col("neighbor_id").as("k2"), col("rank").cast("long").as("rank"),
          col("cos").cast("double").as("metric"))
      val bm = Retrieval.bm25TopKFromIndex(spark, bmT, Bm25Terms, Bm25K)
        .select(lit("bm25").as("modality"), col("id").as("k1"),
          none.as("k2"), none.as("rank"),
          col("score_micro").cast("double").as("metric"))
      val mh = TextDedup.probeMinhashIndex(spark, mhT,
          docs.filter(col("doc_id") % 5 =!= 2), "doc_id", "text")
        .filter(col("q_id") < col("id"))
        .select(lit("minhash").as("modality"), col("q_id").as("k1"),
          col("id").as("k2"), none.as("rank"),
          col("jaccard").cast("double").as("metric"))
      ann.unionByName(pq).unionByName(bm).unionByName(mh)
        .orderBy("modality", "k1", "k2", "rank")
    },
    oracle = Some {
      val annFull =
        s"""${ivfSq8OracleCtes(dataPredSql = Some(DeleteSurvivorSql))}
           |SELECT query_id, neighbor_id, cos, rank
           |FROM ranked WHERE rank <= 5""".stripMargin
      val pqFull = pqOracleSql(dataPredSql = Some(DeleteSurvivorSql))
      val bmFull = bm25OracleSql(Bm25Terms, Bm25K,
        survivorPredSql = Some("doc_id % 5 <> 2"))
      val mhFull = minhashPairsOracleSql("doc_id % 5 <> 2")
      s"""SELECT 'ann' AS modality, query_id AS k1, neighbor_id AS k2,
         |  CAST(rank AS BIGINT) AS rank, CAST(cos AS DOUBLE) AS metric
         |FROM ($annFull)
         |UNION ALL
         |SELECT 'pq', query_id, neighbor_id, CAST(rank AS BIGINT),
         |  CAST(cos AS DOUBLE)
         |FROM ($pqFull)
         |UNION ALL
         |SELECT 'bm25', doc_id, -1, -1, CAST(score_micro AS DOUBLE)
         |FROM ($bmFull)
         |UNION ALL
         |SELECT 'minhash', id_a, id_b, -1, CAST(jaccard AS DOUBLE)
         |FROM ($mhFull)
         |ORDER BY modality, k1, k2, rank""".stripMargin
    })


  /** FULL index lifecycle, keyword side ([[Retrieval.compactBm25Index]]):
    * build → append → delete → compact → probe, gated on the
    * survivor-restricted t42 oracle. Compaction rewrites both the
    * term-bucketed postings and the `_docs` sibling (they share the
    * index's tombstones) and clears the delete list; stats were already
    * exact from the delete-time refresh. Compaction must both EXCLUDE
    * the tombstoned rows and clear the delete list; forgetting either
    * fails this oracle or the RetrievalSpec pins. */
  val t59_bm25_index_compact: Q = Q(
    run = (spark, dir) => {
      val table = "graft_bm25_compact"
      val docs = t(spark, dir, "documents")
      Retrieval.writeBm25Index(docs.filter(col("doc_id") % 3 =!= 0),
        "doc_id", "text", table)
      Retrieval.appendToBm25Index(docs.filter(col("doc_id") % 3 === 0),
        "doc_id", "text", table)
      Retrieval.deleteFromBm25Index(docs.filter(col("doc_id") % 5 === 2),
        "doc_id", table)
      Retrieval.compactBm25Index(spark, table)
      Retrieval.bm25TopKFromIndex(spark, table, Bm25Terms, Bm25K)
        .withColumnRenamed("id", "doc_id")
    },
    oracle = Some(bm25OracleSql(Bm25Terms, Bm25K,
      survivorPredSql = Some("doc_id % 5 <> 2"))))

  /** Snapshot time travel on the persisted BM25 index
    * ([[Retrieval.loadBm25IndexAsOf]]) — the keyword third of the
    * as-of family (ANN t73, PQ t74): base build on two thirds of the
    * corpus, two ATOMIC committed append batches
    * ([[Retrieval.appendToBm25IndexCommitted]] — postings and docs
    * land under ONE CommitLog rename), probed AS OF batch 0 — batch
    * 1's documents must be invisible AND the statistics (n_docs,
    * avgdl, per-term df) must be the PREFIX corpus's, not the live
    * ones (BM25 scores move with the stats, so a stale-stats snapshot
    * read would be numerically wrong everywhere, not just missing
    * rows). The oracle replays a from-scratch build restricted to
    * base ∪ batch 0, so the gate proves probe(asOf N) ≡
    * probe(appends-stopped-at-N) hash-exactly. */
  val t77_bm25_index_asof: Q = Q(
    run = (spark, dir) => {
      val table = "graft_bm25_asof"
      val docs = t(spark, dir, "documents")
      Retrieval.writeBm25Index(docs.filter(col("doc_id") % 3 =!= 0),
        "doc_id", "text", table)
      val batch = docs.filter(col("doc_id") % 3 === 0)
      Retrieval.appendToBm25IndexCommitted(
        batch.filter(col("doc_id") % 2 === 0), "doc_id", "text", table,
        batchId = 0L)
      Retrieval.appendToBm25IndexCommitted(
        batch.filter(col("doc_id") % 2 === 1), "doc_id", "text", table,
        batchId = 1L)
      val idx = Retrieval.loadBm25IndexAsOf(spark, table, asOfBatch = 0L)
      Retrieval.bm25TopKFromLoaded(idx, Bm25Terms, Bm25K)
        .withColumnRenamed("id", "doc_id")
    },
    oracle = Some(bm25OracleSql(Bm25Terms, Bm25K,
      survivorPredSql = Some("(doc_id % 3 <> 0 OR doc_id % 2 = 0)"))))

  private val HybridN = 50
  private val HybridK = 15
  private val HybridQueryVec = 0L

  /** Hybrid keyword+vector retrieval ([[Retrieval.hybridTopK]]): BM25
    * list for the probe terms and exact-cosine list for the probe
    * document's embedding, fused by reciprocal rank fusion (Cormack et
    * al., SIGIR 2009) — the standard production shape for combining
    * incommensurable retrievers without score calibration. Fusion is
    * list-sized; scores emitted in integer nano-units so the gate
    * compares longs (the t42 rule). */
  val t44_hybrid_rrf: Q = Q(
    run = (spark, dir) =>
      Retrieval.hybridTopK(tf(spark, dir, "documents"),
          tf(spark, dir, "embeddings"), "doc_id", "text", "vec_id",
          "embedding", Bm25Terms, HybridQueryVec, n = HybridN, k = HybridK)
        .withColumnRenamed("id", "doc_id")
        .orderBy("rank"),
    bench = true,
    oracle = Some(
      s"""WITH blist AS (
         |  SELECT doc_id AS id,
         |    row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rk
         |  FROM (${bm25OracleSql(Bm25Terms, HybridN, Some(HybridQueryVec))})),
         |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |nv AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |q AS (SELECT e AS qe, nrm AS qnrm FROM nv WHERE vec_id = $HybridQueryVec),
         |vlist AS (SELECT id, rk FROM (
         |  SELECT c.vec_id AS id, row_number() OVER (ORDER BY
         |      list_dot_product(q.qe, c.e) / (q.qnrm * c.nrm) DESC, c.vec_id) AS rk
         |  FROM nv c CROSS JOIN q WHERE c.vec_id <> $HybridQueryVec)
         |  WHERE rk <= $HybridN),
         |fused AS (
         |  SELECT COALESCE(b.id, vl.id) AS doc_id,
         |    CAST(ROUND(1e9 * (
         |      COALESCE(1.0 / (60.0 + CAST(b.rk AS DOUBLE)), 0.0)
         |      + COALESCE(1.0 / (60.0 + CAST(vl.rk AS DOUBLE)), 0.0))) AS BIGINT)
         |      AS rrf_nano
         |  FROM blist b FULL OUTER JOIN vlist vl ON b.id = vl.id),
         |cut AS (SELECT * FROM fused ORDER BY rrf_nano DESC, doc_id LIMIT $HybridK)
         |SELECT doc_id, rrf_nano, CAST(row_number() OVER
         |  (ORDER BY rrf_nano DESC, doc_id) AS INT) AS rank
         |FROM cut ORDER BY rank""".stripMargin))

  private val HybridIdxCand = 60

  /** The persisted retrieval STACK end-to-end ([[Retrieval]] +
    * [[VectorOps]]): both indexes built once as catalog tables — the
    * term-bucketed BM25 inverted index (t46's) and the IVF+SQ8 ANN
    * index (t40's) — then probed for one hybrid query (the t44 terms +
    * probe document 0's embedding) and RRF-fused. Differences from t44
    * are deliberate production semantics: the keyword index serves MANY
    * probes, so its statistics are global (the probe doc is dropped
    * post-retrieval, not re-scored out of the stats), and the vector
    * list is the APPROXIMATE IVF+SQ8 probe, not brute force. The
    * oracle replays all of it — BM25, k-means cells, SQ8
    * quantize/decode, exact re-rank, fusion — and the gate is
    * hash-exact. */
  val t47_hybrid_index_stack: Q = Q(
    run = (spark, dir) => {
      val bmTable = "graft_hybrid_bm25"
      val annTable = "graft_hybrid_ann"
      Retrieval.writeBm25Index(t(spark, dir, "documents"), "doc_id",
        "text", bmTable)
      VectorOps.writeIndex(t(spark, dir, "embeddings"), "vec_id",
        "embedding", annTable, kClusters = IvfClusters, iters = IvfIters,
        numBuckets = 8)
      val kw = Retrieval
        .bm25TopKFromIndex(spark, bmTable, Bm25Terms, HybridN + 1)
        .filter(col("id") =!= HybridQueryVec)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("score_micro").desc, col("id").asc)))
        .filter(col("rank") <= HybridN)
        .select("id", "rank")
      val vec = VectorOps
        .ivfSq8TopKFromIndex(VectorOps.loadIndex(spark, annTable),
          col("id") === HybridQueryVec, k = HybridN, nprobe = IvfNprobe,
          candidates = HybridIdxCand)
        .select(col("neighbor_id").as("id"), col("rank"))
      Retrieval.rrfFuse(Seq(kw, vec), HybridK)
        .withColumnRenamed("id", "doc_id")
        .orderBy("rank")
    },
    oracle = Some(
      s"""${ivfSq8OracleCtes(s"vec_id = $HybridQueryVec", HybridIdxCand)},
         |vlist AS (SELECT neighbor_id AS id, rank AS rk FROM ranked
         |  WHERE rank <= $HybridN),
         |blist AS (SELECT id, rk FROM (
         |  SELECT doc_id AS id,
         |    row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rk
         |  FROM (${bm25OracleSql(Bm25Terms, HybridN + 1)})
         |  WHERE doc_id <> $HybridQueryVec) WHERE rk <= $HybridN),
         |fused AS (
         |  SELECT COALESCE(b.id, vl.id) AS doc_id,
         |    CAST(ROUND(1e9 * (
         |      COALESCE(1.0 / (60.0 + CAST(b.rk AS DOUBLE)), 0.0)
         |      + COALESCE(1.0 / (60.0 + CAST(vl.rk AS DOUBLE)), 0.0))) AS BIGINT)
         |      AS rrf_nano
         |  FROM blist b FULL OUTER JOIN vlist vl ON b.id = vl.id),
         |cut AS (SELECT * FROM fused ORDER BY rrf_nano DESC, doc_id LIMIT $HybridK)
         |SELECT doc_id, rrf_nano, CAST(row_number() OVER
         |  (ORDER BY rrf_nano DESC, doc_id) AS INT) AS rank
         |FROM cut ORDER BY rank""".stripMargin))

  /** (query_id, term) pairs for the batched retrieval probe (t52):
    * four query-by-example probes, each with its own term set. */
  private val BatchedQueries: Seq[(Long, String)] = Seq(
    0L -> "spark", 0L -> "query",
    1L -> "stream", 1L -> "filter",
    2L -> "data", 2L -> "model",
    3L -> "join", 3L -> "window")

  /** BATCHED hybrid retrieval over the persisted index stack
    * ([[Retrieval.bm25ScoreBatchedFromIndex]] + the multi-query IVF+SQ8
    * probe + [[Retrieval.rrfFuseBatched]]): four query-by-example
    * probes — each with its OWN term set and its own embedding — score,
    * rank and fuse in ONE plan. Every per-query cut is a rank window
    * PARTITIONED by query_id (the t28 shape): no single-partition
    * window, no per-query job loop (QueriesSpec pins the plan). The
    * keyword side reads the term-bucketed postings without reshuffling
    * them; the vector side is the t47 probe with a 4-query predicate.
    * Self-hits (id = query_id) are dropped post-retrieval, t47's
    * production semantics. The oracle replays batched BM25 (per-query
    * tf/df over a VALUES term relation), the k-means/SQ8 probe and the
    * per-query fusion; the gate is hash-exact. */
  val t52_hybrid_batched: Q = Q(
    run = (spark, dir) => {
      val bmTable = "graft_batched_bm25"
      val annTable = "graft_batched_ann"
      Retrieval.writeBm25Index(t(spark, dir, "documents"), "doc_id",
        "text", bmTable)
      VectorOps.writeIndex(t(spark, dir, "embeddings"), "vec_id",
        "embedding", annTable, kClusters = IvfClusters, iters = IvfIters,
        numBuckets = 8)
      val qt = spark.createDataFrame(BatchedQueries).toDF("query_id", "term")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(col("score_micro").desc, col("id").asc)
      val kw = Retrieval.bm25ScoreBatchedFromIndex(spark, bmTable, qt)
        .filter(col("id") =!= col("query_id"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= HybridN)
        .select("query_id", "id", "rank")
      val vec = VectorOps
        .ivfSq8TopKFromIndex(VectorOps.loadIndex(spark, annTable),
          col("id") < 4, k = HybridN, nprobe = IvfNprobe,
          candidates = HybridIdxCand)
        .select(col("query_id"), col("neighbor_id").as("id"), col("rank"))
      Retrieval.rrfFuseBatched(Seq(kw, vec), HybridK)
        .withColumnRenamed("id", "doc_id")
        .orderBy("query_id", "rank")
    },
    oracle = {
      val qtValues = BatchedQueries
        .map { case (q, t) => s"($q, '$t')" }.mkString(", ")
      Some(
        s"""${ivfSq8OracleCtes("vec_id < 4", HybridIdxCand)},
           |vlist AS (SELECT query_id, neighbor_id AS id, rank AS rk
           |  FROM ranked WHERE rank <= $HybridN),
           |qt AS (SELECT CAST(q AS BIGINT) AS query_id, term
           |  FROM (VALUES $qtValues) vv(q, term)),
           |base AS (
           |  SELECT doc_id AS id,
           |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS toks
           |  FROM documents),
           |perdoc AS (SELECT id, len(toks) AS dl, toks FROM base),
           |bstats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM perdoc),
           |tft AS (SELECT p.id, tt.term, len(list_filter(p.toks, x -> x = tt.term)) AS tf, p.dl
           |  FROM perdoc p CROSS JOIN (SELECT DISTINCT term FROM qt) tt),
           |dfs AS (SELECT term, SUM(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS df
           |  FROM tft GROUP BY term),
           |contrib AS (SELECT q.query_id, f.id,
           |  CAST(ROUND(1e6 * log10(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
           |    ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
           |     (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / avgdl)))) AS BIGINT) AS c
           |  FROM tft f JOIN dfs USING (term) JOIN qt q ON q.term = f.term
           |  CROSS JOIN bstats
           |  WHERE f.tf > 0),
           |kscore AS (SELECT query_id, id, SUM(c) AS score_micro
           |  FROM contrib GROUP BY 1, 2),
           |blist AS (SELECT query_id, id, rk FROM (
           |  SELECT query_id, id,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY score_micro DESC, id) AS rk
           |  FROM kscore WHERE id <> query_id) WHERE rk <= $HybridN),
           |fused AS (
           |  SELECT COALESCE(b.query_id, vl.query_id) AS query_id,
           |    COALESCE(b.id, vl.id) AS doc_id,
           |    CAST(ROUND(1e9 * (
           |      COALESCE(1.0 / (60.0 + CAST(b.rk AS DOUBLE)), 0.0)
           |      + COALESCE(1.0 / (60.0 + CAST(vl.rk AS DOUBLE)), 0.0))) AS BIGINT)
           |      AS rrf_nano
           |  FROM blist b FULL OUTER JOIN vlist vl
           |    ON b.query_id = vl.query_id AND b.id = vl.id)
           |SELECT query_id, doc_id, rrf_nano, CAST(rank AS INT) AS rank FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |    ORDER BY rrf_nano DESC, doc_id) AS rank FROM fused)
           |WHERE rank <= $HybridK ORDER BY query_id, rank""".stripMargin)
    })

  /** AS-OF join: every click event matched to the user's most recent
    * purchase at-or-before it (ties on ts broken by greatest event_id),
    * nulls when no purchase precedes. The Spark side is
    * [[TemporalJoin.asOf]] — union + one running-`last` window, ONE
    * shuffle on the key, merge-join cost — never the range-join +
    * per-row argmax that explodes |clicks|×|purchases| per user. The
    * oracle is a plain LATERAL top-1 (no DuckDB ASOF dialect
    * dependence) so the tie-break is explicit and identical. */
  /** [[j3_asof_join]] with a 30-minute TOLERANCE
    * ([[TemporalJoin.asOfTolerance]], the pandas `merge_asof
    * (tolerance=…)` semantics): the last purchase older than 30 min
    * is STALE — the click row survives with a NULL payload. One
    * staleness check on the as-of winner ≡ restricting the lateral's
    * candidates, which is exactly how the oracle spells it. */
  val j8_asof_tolerance: Q = Q(
    run = (spark, dir) => {
      val ev = eventsWithTs(spark, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("last_purchase_id"),
          col("ts").as("last_purchase_ts"),
          col("value").as("last_purchase_value"))
      TemporalJoin.asOfTolerance(clicks, purchases,
          leftKey = "user_id", rightKey = "user_id",
          leftTs = "ts", rightTs = "ts",
          rightPayload = Seq("last_purchase_id", "last_purchase_ts",
            "last_purchase_value"),
          tieBreak = Seq("last_purchase_id"),
          toleranceMicros = 30L * 60 * 1000000)
        .orderBy("event_id")
    },
    bench = true,
    oracle = Some(
      """SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS ts,
        |  p.last_purchase_id, p.last_purchase_ts, p.last_purchase_value
        |FROM events c
        |LEFT JOIN LATERAL (
        |  SELECT event_id AS last_purchase_id,
        |         CAST(ts AS TIMESTAMP) AS last_purchase_ts,
        |         value AS last_purchase_value
        |  FROM events p
        |  WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
        |    AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP)
        |    AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP) - INTERVAL 30 MINUTE
        |  ORDER BY CAST(p.ts AS TIMESTAMP) DESC, event_id DESC LIMIT 1
        |) p ON true
        |WHERE c.event_type = 'click'
        |ORDER BY c.event_id""".stripMargin))

  /** [[j8_asof_tolerance]]'s NUMERIC-timestamp twin (round 15 —
    * the advisor-fix path): both sides carry epoch-micros LONG
    * columns (the funnel family's `*_us` convention), so
    * [[TemporalJoin.asOfTolerance]] compares RAW values —
    * `toleranceMicros` is in the caller's own epoch unit and no
    * long→timestamp cast (which would read micros as seconds) ever
    * happens. Oracle does the same micros arithmetic. */
  val j9_asof_tolerance_us: Q = Q(
    run = (spark, dir) => {
      val ev = eventsWithTs(spark, dir)
        .withColumn("us", unix_micros(col("ts").cast(TimestampType)))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us"),
          col("event_id").as("last_purchase_id"),
          col("us").as("last_purchase_us"),
          col("value").as("last_purchase_value"))
      TemporalJoin.asOfTolerance(clicks, purchases,
          leftKey = "user_id", rightKey = "user_id",
          leftTs = "us", rightTs = "us",
          rightPayload = Seq("last_purchase_id", "last_purchase_us",
            "last_purchase_value"),
          tieBreak = Seq("last_purchase_id"),
          toleranceMicros = 30L * 60 * 1000000)
        .orderBy("event_id")
    },
    oracle = Some(
      """SELECT c.event_id, c.user_id,
        |  epoch_us(CAST(c.ts AS TIMESTAMP)) AS us,
        |  p.last_purchase_id, p.last_purchase_us, p.last_purchase_value
        |FROM events c
        |LEFT JOIN LATERAL (
        |  SELECT event_id AS last_purchase_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS last_purchase_us,
        |         value AS last_purchase_value
        |  FROM events p
        |  WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
        |    AND epoch_us(CAST(p.ts AS TIMESTAMP))
        |        <= epoch_us(CAST(c.ts AS TIMESTAMP))
        |    AND epoch_us(CAST(p.ts AS TIMESTAMP))
        |        >= epoch_us(CAST(c.ts AS TIMESTAMP)) - 1800000000
        |  ORDER BY epoch_us(CAST(p.ts AS TIMESTAMP)) DESC, event_id DESC
        |  LIMIT 1
        |) p ON true
        |WHERE c.event_type = 'click'
        |ORDER BY c.event_id""".stripMargin))

  private def asOfFrame(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsWithTs(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("last_purchase_id"),
        col("ts").as("last_purchase_ts"),
        col("value").as("last_purchase_value"))
    TemporalJoin.asOf(clicks, purchases,
      leftKey = "user_id", rightKey = "user_id",
      leftTs = "ts", rightTs = "ts",
      rightPayload = Seq("last_purchase_id", "last_purchase_ts",
        "last_purchase_value"),
      tieBreak = Seq("last_purchase_id"))
  }

  val j3_asof_join: Q = Q(
    run = (spark, dir) => asOfFrame(spark, dir).orderBy("event_id"),
    benchRun = Some((spark, dir) => asOfFrame(spark, dir)),
    oracle = Some(
      """SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS ts,
        |  p.last_purchase_id, p.last_purchase_ts, p.last_purchase_value
        |FROM events c
        |LEFT JOIN LATERAL (
        |  SELECT event_id AS last_purchase_id,
        |         CAST(ts AS TIMESTAMP) AS last_purchase_ts,
        |         value AS last_purchase_value
        |  FROM events p
        |  WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
        |    AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP)
        |  ORDER BY CAST(p.ts AS TIMESTAMP) DESC, event_id DESC LIMIT 1
        |) p ON true
        |WHERE c.event_type = 'click'
        |ORDER BY c.event_id""".stripMargin),
    bench = true)

  /** Bucketed RANGE join (no equi-key): one-hour incident windows
    * anchored at high-value error events, counting/summing ALL events
    * that fall inside each window. [[TemporalJoin.rangeJoin]] replicates
    * each window to the ≤2 hour-buckets it covers and equi-joins events
    * on their own bucket — each matching pair meets exactly once, the
    * cross product never materializes, and Catalyst sees an ordinary
    * equi-join (AQE broadcasts the filtered window side). Empty windows
    * are recovered by re-joining the aggregate to the window list, which
    * keeps the event stream un-outer-joined. Hour buckets are computed
    * with timezone-free field arithmetic (datediff×24+hour) so the plan
    * is session-timezone-independent. */
  /** Bucketed INTERVAL-OVERLAP join (no equi-key): 48-hour incident
    * windows × 24-hour high-value purchase windows, every overlapping
    * pair with its exact overlap duration. [[TemporalJoin.intervalJoin]]
    * replicates both sides to day buckets and claims each pair once in
    * the overlap-start's bucket — an ordinary equi-join, never |A|×|B|,
    * no post-join DISTINCT. */
  val j5_interval_join: Q = Q(
    run = (spark, dir) => {
      val ev = eventsWithTs(spark, dir)
      val incidents = ev.filter(col("event_type") === "error" && col("value") > 150)
        .select(col("event_id").as("incident_id"), col("ts").as("i_start"),
          (col("ts") + expr("INTERVAL 48 HOURS")).as("i_end"))
      val promos = ev.filter(col("event_type") === "purchase" && col("value") > 150)
        .select(col("event_id").as("purchase_id"), col("ts").as("p_start"),
          (col("ts") + expr("INTERVAL 24 HOURS")).as("p_end"))
      val epoch = lit(java.sql.Date.valueOf("2024-01-01"))
      val dayBucket = (c: Column) => datediff(to_date(c), epoch).cast(LongType)
      // overlap duration via NTZ field arithmetic (timestamp_ntz
      // subtraction → day-time interval → exact decimal seconds → micros)
      // — session-timezone-independent like j4's bucketing, where a
      // unix_micros over an NTZ→LTZ cast would shift across a DST gap in
      // any non-UTC session
      TemporalJoin.intervalJoin(incidents, "i_start", "i_end",
          promos, "p_start", "p_end", dayBucket)
        .select(col("incident_id"), col("purchase_id"),
          expr("CAST(CAST(least(i_end, p_end) - greatest(i_start, p_start) " +
            "AS DECIMAL(28,6)) * 1000000 AS BIGINT)").as("overlap_us"))
        .orderBy("incident_id", "purchase_id")
    },
    oracle = Some(
      """WITH a AS (SELECT event_id AS incident_id, CAST(ts AS TIMESTAMP) AS s,
        |    CAST(ts AS TIMESTAMP) + INTERVAL 48 HOUR AS e
        |  FROM events WHERE event_type = 'error' AND value > 150),
        |b AS (SELECT event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS s,
        |    CAST(ts AS TIMESTAMP) + INTERVAL 24 HOUR AS e
        |  FROM events WHERE event_type = 'purchase' AND value > 150)
        |SELECT incident_id, purchase_id,
        |  CAST(epoch_us(least(a.e, b.e)) - epoch_us(greatest(a.s, b.s)) AS BIGINT) AS overlap_us
        |FROM a JOIN b ON a.s < b.e AND b.s < a.e
        |ORDER BY incident_id, purchase_id""".stripMargin),
    bench = true)

  /** j5 with the bucket granularity DERIVED by
    * [[TemporalJoin.autoGranularity]]'s density probe instead of a
    * fixed day — the round-10 audit's density caveat turned into
    * behavior. Interval boundaries become exact NTZ-epoch microsecond
    * longs (the same session-timezone-independent field arithmetic as
    * j5's overlap), the probe starts at j5's 24 h granularity and
    * halves it while the peak per-bucket candidate product exceeds the
    * bound — but never below the mean interval span, where finer
    * buckets stop thinning candidates. The RESULT SET is
    * granularity-independent (exactly-once claim predicate at any g —
    * TemporalJoinSpec gates auto ≡ naive), so the oracle is j5's
    * verbatim: same pairs, same exact overlap microseconds. */
  val j5a_interval_join_auto: Q = Q(
    run = (spark, dir) => {
      val ev = eventsWithTs(spark, dir)
      // NTZ-epoch micros: NTZ subtraction → day-time interval → exact
      // decimal seconds → micros; offsets from 2024-01-01 stay far
      // below 2^53, so the probe's double bucketing is exact
      val ntzEpoch = expr("TIMESTAMP_NTZ '2024-01-01 00:00:00'")
      val us = (c: Column) =>
        ((c - ntzEpoch).cast(DecimalType(28, 6)) * 1000000).cast(LongType)
      val incidents = ev.filter(col("event_type") === "error" && col("value") > 150)
        .select(col("event_id").as("incident_id"), us(col("ts")).as("i_start"),
          us(col("ts") + expr("INTERVAL 48 HOURS")).as("i_end"))
      val promos = ev.filter(col("event_type") === "purchase" && col("value") > 150)
        .select(col("event_id").as("purchase_id"), us(col("ts")).as("p_start"),
          us(col("ts") + expr("INTERVAL 24 HOURS")).as("p_end"))
      TemporalJoin.intervalJoinAuto(incidents, "i_start", "i_end",
          promos, "p_start", "p_end",
          initialGranularity = 24L * 3600 * 1000000)
        .select(col("incident_id"), col("purchase_id"),
          (least(col("i_end"), col("p_end")) -
            greatest(col("i_start"), col("p_start"))).as("overlap_us"))
        .orderBy("incident_id", "purchase_id")
    },
    oracle = Some(
      """WITH a AS (SELECT event_id AS incident_id, CAST(ts AS TIMESTAMP) AS s,
        |    CAST(ts AS TIMESTAMP) + INTERVAL 48 HOUR AS e
        |  FROM events WHERE event_type = 'error' AND value > 150),
        |b AS (SELECT event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS s,
        |    CAST(ts AS TIMESTAMP) + INTERVAL 24 HOUR AS e
        |  FROM events WHERE event_type = 'purchase' AND value > 150)
        |SELECT incident_id, purchase_id,
        |  CAST(epoch_us(least(a.e, b.e)) - epoch_us(greatest(a.s, b.s)) AS BIGINT) AS overlap_us
        |FROM a JOIN b ON a.s < b.e AND b.s < a.e
        |ORDER BY incident_id, purchase_id""".stripMargin),
    bench = true)

  val j4_range_join: Q = Q(
    run = (spark, dir) => {
      val ev = eventsWithTs(spark, dir)
      val wins = ev.filter(col("event_type") === "error" && col("value") > 180)
        .select(col("event_id").as("window_id"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
      val points = ev.select(col("ts"), dec6(col("value")).as("v"))
      val epoch = lit(java.sql.Date.valueOf("2024-01-01"))
      val hourBucket = (c: Column) =>
        datediff(to_date(c), epoch).cast(LongType) * 24 + hour(c)
      val matched = TemporalJoin.rangeJoin(wins, "w_start", "w_end",
        points, "ts", hourBucket)
      val agg = matched.groupBy("window_id")
        .agg(count(lit(1)).as("n_events"), money(sum(col("v"))).as("sum_value"))
      wins.select("window_id", "w_start")
        .join(agg, Seq("window_id"), "left")
        .select(col("window_id"), col("w_start"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
        .orderBy("window_id")
    },
    oracle = Some(
      s"""WITH w AS (SELECT event_id AS window_id, CAST(ts AS TIMESTAMP) AS w_start,
         |    CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR AS w_end
         |  FROM events WHERE event_type = 'error' AND value > 180),
         |e AS (SELECT CAST(ts AS TIMESTAMP) AS ts,
         |    CAST(value AS DECIMAL(18,6)) AS v FROM events),
         |m AS (SELECT w.window_id, count(e.ts) AS n_events,
         |    ${duckMoney("SUM(e.v)")} AS sum_value
         |  FROM w LEFT JOIN e ON e.ts >= w.w_start AND e.ts < w.w_end
         |  GROUP BY w.window_id)
         |SELECT window_id, w_start, CAST(n_events AS BIGINT) AS n_events,
         |  COALESCE(sum_value, 0.0) AS sum_value
         |FROM w JOIN m USING (window_id)
         |ORDER BY window_id""".stripMargin))

  /** SQ8 scalar-quantized ANN: 8-bit codes for candidate generation
    * (integer dot product — exactly portable), exact cosine re-rank of
    * the top candidates. */
  val t14_sq8_ann: Q = Q(
    run = (spark, dir) =>
      VectorOps.sq8TopK(t(spark, dir, "embeddings"), "vec_id", "embedding",
          col("vec_id") < 10, k = 5, candidates = Sq8Candidates)
        .orderBy("query_id", "rank"),
    oracle = Some(
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |ex AS (SELECT vec_id, t.pos, e[t.pos + 1] AS val
         |  FROM v, unnest(range(len(e))) AS t(pos)),
         |st AS (SELECT pos, min(val) AS lo, max(val) AS hi FROM ex GROUP BY pos),
         |qvs AS (SELECT ex.vec_id, ex.pos, st.lo, st.hi,
         |    CASE WHEN st.hi = st.lo THEN 0
         |         ELSE greatest(0, least(255,
         |           CAST(floor((ex.val - st.lo) / (st.hi - st.lo) * 255) AS INTEGER))) END AS qv
         |  FROM ex JOIN st ON st.pos = ex.pos),
         |dec AS (SELECT vec_id,
         |    array_agg(lo + qv * ((hi - lo) / 255.0) ORDER BY pos) AS d
         |  FROM qvs GROUP BY vec_id),
         |q AS (SELECT dec.vec_id AS query_id, dec.d AS qd, n.nrm AS qnrm
         |  FROM dec JOIN n ON n.vec_id = dec.vec_id WHERE dec.vec_id < 10),
         |qs AS (SELECT q.query_id, c.vec_id AS neighbor_id,
         |    list_dot_product(c.d, q.qd) / (n2.nrm * q.qnrm) AS qscore
         |  FROM q JOIN dec c ON c.vec_id <> q.query_id
         |         JOIN n n2 ON n2.vec_id = c.vec_id),
         |cand AS (SELECT query_id, neighbor_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY qscore DESC, neighbor_id) AS rn FROM qs) WHERE rn <= $Sq8Candidates),
         |scored AS (SELECT cand.query_id, cand.neighbor_id,
         |    list_dot_product(a.e, b.e) / (a.nrm * b.nrm) AS cos
         |  FROM cand JOIN n a ON a.vec_id = cand.query_id
         |             JOIN n b ON b.vec_id = cand.neighbor_id),
         |ranked AS (SELECT *, row_number() OVER
         |  (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM scored)
         |SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin))

  /** E2E: the full ingest pipeline (probe → snapshot scan → enrich →
    * partitioned write → read-back → count+dual-hash verify) as a query —
    * the oracle asserts the pipeline invariant itself: rows_written =
    * rows_read and zero hash mismatches, per table. */
  val e2e_ingest_roundtrip: Q = Q(
    run = (spark, dir) => {
      import spark.implicits._
      val wh = java.nio.file.Files.createTempDirectory("graft-e2e").toString
      val cfg = IngestJob.IngestConfig(dir, wh,
        IngestJob.TableMapping.parse("region,nation,supplier"), replace = true)
      IngestJob.run(spark, cfg)
        .flatMap(r => r.report.map(rep =>
          (r.mapping.sink, rep.sourceCount, rep.sinkCount, rep.hashMismatches)))
        .toDF("table_name", "rows_read", "rows_written", "hash_mismatches")
        .orderBy("table_name")
    },
    oracle = Some(
      """SELECT * FROM (
        |  SELECT 'region' AS table_name,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM region) AS rows_read,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM region) AS rows_written,
        |    CAST(0 AS BIGINT) AS hash_mismatches
        |  UNION ALL SELECT 'nation',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nation),
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nation), CAST(0 AS BIGINT)
        |  UNION ALL SELECT 'supplier',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM supplier),
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM supplier), CAST(0 AS BIGINT)
        |) ORDER BY table_name""".stripMargin))

  /** Fixture setup for [[e2e_jdbc_roundtrip]]: seed an embedded Derby
    * database from the parquet corpus (REGION/NATION — int + varchar
    * columns, so canonical tokens are identical across the JDBC and
    * parquet type paths; the typed-token JDBC coverage lives in
    * JdbcSourceSpec). Seeding is setup, not the operator: the gate runs
    * the real [[graft.sources.JdbcIngest]] path over a live connection. */
  private def seedDerbyFromParquet(spark: SparkSession, dir: String, url: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE REGION (R_REGIONKEY INTEGER NOT NULL PRIMARY KEY, " +
        "R_NAME VARCHAR(200))")
      st.execute("CREATE TABLE NATION (N_NATIONKEY INTEGER NOT NULL PRIMARY KEY, " +
        "N_NAME VARCHAR(200), N_REGIONKEY INTEGER)")
      st.close()
      val rIns = conn.prepareStatement("INSERT INTO REGION VALUES (?, ?)")
      t(spark, dir, "region").collect().foreach { r =>
        rIns.setInt(1, r.getInt(0)); rIns.setString(2, r.getString(1)); rIns.addBatch()
      }
      rIns.executeBatch(); rIns.close()
      val nIns = conn.prepareStatement("INSERT INTO NATION VALUES (?, ?, ?)")
      t(spark, dir, "nation").collect().foreach { r =>
        nIns.setInt(1, r.getInt(0)); nIns.setString(2, r.getString(1))
        nIns.setInt(3, r.getInt(2)); nIns.addBatch()
      }
      nIns.executeBatch(); nIns.close()
    } finally conn.close()
  }

  /** S1/S3–S5/A1/A3 over a LIVE JDBC connection, gated: probe → metadata
    * discovery → PK order key → frozen watermark → pushed-down COUNT →
    * pushed-down bounded ordered scan → enrich → partitioned write →
    * isolated count/dual-hash verify ([[graft.sources.JdbcIngest]], the
    * reference's actual deployment shape). The oracle recomputes counts
    * AND the min/max canonical row hash from the parquet tables — the
    * sink hashes match only if the JDBC scan delivered every row
    * byte-identically to the parquet path. */
  val e2e_jdbc_roundtrip: Q = Q(
    run = (spark, dir) => {
      import spark.implicits._
      val db = "graftjdbc" + java.util.UUID.randomUUID().toString.replace("-", "")
      val url = s"jdbc:derby:memory:$db;create=true"
      try {
        seedDerbyFromParquet(spark, dir, url)
        val wh = java.nio.file.Files.createTempDirectory("graft-jdbc-e2e").toString
        val cfg = sources.JdbcIngest.JdbcConfig(url, wh,
          IngestJob.TableMapping.parseFb("REGION,NATION"), replace = true)
        sources.JdbcIngest.run(spark, cfg)
          .flatMap { r => r.report.map { rep =>
            val mm = spark.read.parquet(s"$wh/${r.mapping.sink}")
              .agg(min(col("row_hash")), max(col("row_hash"))).head()
            (r.mapping.sink, rep.sourceCount, rep.sinkCount, rep.hashMismatches,
              mm.getString(0), mm.getString(1))
          }}
          .toDF("table_name", "rows_read", "rows_written", "hash_mismatches",
            "min_row_hash", "max_row_hash")
          .orderBy("table_name")
      } finally {
        // in-memory Derby holds the db until dropped; drop= signals
        // success via SQLException 08006
        try { java.sql.DriverManager.getConnection(s"jdbc:derby:memory:$db;drop=true"); () }
        catch { case _: java.sql.SQLException => () }
      }
    },
    oracle = {
      def metasOf(fields: (String, DataType)*): Seq[ColumnMeta] =
        ColumnMeta.fromSchema(StructType(fields.map { case (n, dt) =>
          StructField(n, dt) }))
      val rHash = OracleSql.rowHash(metasOf(
        "r_regionkey" -> IntegerType, "r_name" -> StringType))
      val nHash = OracleSql.rowHash(metasOf(
        "n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType))
      Some(
        s"""SELECT * FROM (
           |  SELECT 'nation' AS table_name,
           |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nation) AS rows_read,
           |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nation) AS rows_written,
           |    CAST(0 AS BIGINT) AS hash_mismatches,
           |    (SELECT MIN($nHash) FROM nation) AS min_row_hash,
           |    (SELECT MAX($nHash) FROM nation) AS max_row_hash
           |  UNION ALL SELECT 'region',
           |    (SELECT CAST(COUNT(*) AS BIGINT) FROM region),
           |    (SELECT CAST(COUNT(*) AS BIGINT) FROM region),
           |    CAST(0 AS BIGINT),
           |    (SELECT MIN($rHash) FROM region),
           |    (SELECT MAX($rHash) FROM region)
           |) ORDER BY table_name""".stripMargin)
    })

  /** The reference-surface inventory. */
  def referenceQueries: Map[String, Q] = Map(
    "s1_resumable_scan" -> s1_resumable_scan,
    "s3_access_probe" -> s3_access_probe,
    "s4_schema_inference" -> s4_schema_inference,
    "s5_order_key_detection" -> s5_order_key_detection,
    "s6_jsonl_roundtrip" -> s6_jsonl_roundtrip,
    "s7_csv_roundtrip" -> s7_csv_roundtrip,
    "f1_enrich_lineitem" -> f1_enrich_lineitem,
    "f_canonical_tokens" -> f_canonical_tokens,
    "a1_count_bounded" -> a1_count_bounded,
    "a2_consistency_metrics" -> a2_consistency_metrics,
    "a3_max_watermark" -> a3_max_watermark,
    "k3_mismatch_topk" -> k3_mismatch_topk,
    "k4_first_row" -> k4_first_row,
    "o9_first_column_diff" -> o9_first_column_diff,
    "j1_hash_diff" -> j1_hash_diff,
    "o3_create_table_ddl" -> o3_create_table_ddl,
    "o10_fb_table_mapping" -> o10_fb_table_mapping,
    "e2e_ingest_roundtrip" -> e2e_ingest_roundtrip,
    "e2e_jdbc_roundtrip" -> e2e_jdbc_roundtrip,
    "c1_cdc_merge" -> c1_cdc_merge,
    "c2_snapshot_diff" -> c2_snapshot_diff,
    "c3_scd2_history" -> c3_scd2_history,
    "c4_scd2_asof" -> c4_scd2_asof,
    "c5_scd2_incremental" -> c5_scd2_incremental,
    "p3_profile" -> p3_profile,
    "p4_quality_checks" -> p4_quality_checks,
    "p5_histogram" -> p5_histogram,
    "p6_heavy_hitters" -> p6_heavy_hitters,
    "p7_heavy_hitters_sketch" -> p7_heavy_hitters_sketch,
    "p8_heavy_hitters_grouped" -> p8_heavy_hitters_grouped,
    "p9_quantile_sketch" -> p9_quantile_sketch,
    "p10_count_min" -> p10_count_min,
    "p11_hll_distinct" -> p11_hll_distinct,
    "p12_kmv_distinct" -> p12_kmv_distinct,
    "p12a_kmv_distinct_agg" -> p12a_kmv_distinct_agg,
    "p13_kmv_overlap" -> p13_kmv_overlap,
    "t64_weighted_sample" -> t64_weighted_sample,
    "t65_perplexity_buckets" -> t65_perplexity_buckets,
    "t66_bpe_merges" -> t66_bpe_merges,
    "t67_bpe_encode" -> t67_bpe_encode,
    "t78_bpe_encode_unseen" -> t78_bpe_encode_unseen,
    "t79_fuzzy_join" -> t79_fuzzy_join,
    "t80_fuzzy_join_strings" -> t80_fuzzy_join_strings,
    "t81_fuzzy_join_d2" -> t81_fuzzy_join_d2,
    "t82_fuzzy_segment_index_persist" -> t82_fuzzy_segment_index_persist,
    "t83_minhash_index_persist" -> t83_minhash_index_persist,
    "t86_minhash_index_append" -> t86_minhash_index_append,
    "t90_minhash_index_probe" -> t90_minhash_index_probe,
    "t91_rp_ivf_ann" -> t91_rp_ivf_ann,
    "w18_funnel_times_range" -> w18_funnel_times_range,
    "w19_funnel_times_range_bucketed" -> w19_funnel_times_range_bucketed,
    "t87_minhash_index_asof" -> t87_minhash_index_asof,
    "t88_minhash_index_delete" -> t88_minhash_index_delete,
    "t89_minhash_index_compact" -> t89_minhash_index_compact,
    "t84_random_projection" -> t84_random_projection,
    "t85_rp_rerank_recall" -> t85_rp_rerank_recall,
    "t68_quality_classifier" -> t68_quality_classifier,
    "t69_dup_ngram_fraction" -> t69_dup_ngram_fraction,
    "t70_collocations" -> t70_collocations,
    "t71_linear_probe" -> t71_linear_probe,
    "t72_probe_select" -> t72_probe_select,
    "t73_ann_index_asof" -> t73_ann_index_asof,
    "t74_pq_index_asof" -> t74_pq_index_asof,
    "t77_bm25_index_asof" -> t77_bm25_index_asof,
    "t75_leakage_safe_split" -> t75_leakage_safe_split,
    "t76_bigram_lm" -> t76_bigram_lm,
    "t92_kneser_ney_lm" -> t92_kneser_ney_lm,
    "t93_kneser_ney_trigram" -> t93_kneser_ney_trigram,
    "t97_kneser_ney_modified_4gram" -> t97_kneser_ney_modified_4gram,
    "t94_zorder_key" -> t94_zorder_key,
    "t96_zorder_key_3d" -> t96_zorder_key_3d,
    "t98_hilbert_key" -> t98_hilbert_key,
    "t99_hilbert_key_3d" -> t99_hilbert_key_3d,
    "t100_hilbert_key_4d" -> t100_hilbert_key_4d,
    "t101_unigram_vocab" -> t101_unigram_vocab,
    "t102_unigram_encode" -> t102_unigram_encode,
    "t104_wordpiece_merges" -> t104_wordpiece_merges,
    "t105_wordpiece_encode" -> t105_wordpiece_encode,
    "t106_wordpiece_encode_unseen" -> t106_wordpiece_encode_unseen,
    "t107_wordpiece_store_asof" -> t107_wordpiece_store_asof,
    "t108_wordpiece_store_latest" -> t108_wordpiece_store_latest,
    "t109_bpe_store_roundtrip" -> t109_bpe_store_roundtrip,
    "t110_unigram_store_roundtrip" -> t110_unigram_store_roundtrip,
    "t113_bpe_interchange" -> t113_bpe_interchange,
    "t114_unigram_interchange" -> t114_unigram_interchange,
    "t115_wordpiece_interchange" -> t115_wordpiece_interchange,
    "t116_bytelevel_bpe" -> t116_bytelevel_bpe,
    "t117_bpe_compression_by_lang" -> t117_bpe_compression_by_lang,
    "t118_wordpiece_coverage_by_source" ->
      t118_wordpiece_coverage_by_source,
    "t119_wordpiece_fertility" -> t119_wordpiece_fertility,
    "t120_bytelevel_bytes_per_token" -> t120_bytelevel_bytes_per_token,
    "t123_unigram_compression_by_lang" ->
      t123_unigram_compression_by_lang,
    "t111_blocklist_tag" -> t111_blocklist_tag,
    "t112_blocklist_store_asof" -> t112_blocklist_store_asof,
    "t103_unigram_doc_score" -> t103_unigram_doc_score,
    "t95_forget_everywhere" -> t95_forget_everywhere,
    "p14_vocab_growth" -> p14_vocab_growth,
    "p15_drift_psi" -> p15_drift_psi,
    "p16_embedding_drift" -> p16_embedding_drift)

  /** Training-data pipeline extensions. */
  def pipelineQueries: Map[String, Q] = Map(
    "t1_exact_dedup" -> t1_exact_dedup,
    "t2_ngram_jaccard_pairs" -> t2_ngram_jaccard_pairs,
    "t3_minhash_lsh_pairs" -> t3_minhash_lsh_pairs,
    "t4_simhash" -> t4_simhash,
    "t26_simhash_pairs" -> t26_simhash_pairs,
    "t27_span_dedup" -> t27_span_dedup,
    "t51_span_removal" -> t51_span_removal,
    "t5_cosine_neardup" -> t5_cosine_neardup,
    "t16_dedup_clusters" -> t16_dedup_clusters,
    "t121_soft_dedup_sample" -> t121_soft_dedup_sample,
    "t122_soft_dedup_report" -> t122_soft_dedup_report,
    "t17_decontaminate" -> t17_decontaminate,
    "t19_dedup_apply" -> t19_dedup_apply,
    "p1_corpus_prep" -> p1_corpus_prep,
    "p2_embedding_prep" -> p2_embedding_prep,
    "t20_embedding_clusters" -> t20_embedding_clusters,
    "t18_stratified_sample" -> t18_stratified_sample,
    "t6_ann_topk" -> t6_ann_topk,
    "t25_filtered_ann" -> t25_filtered_ann,
    "t28_hard_negatives" -> t28_hard_negatives,
    "t29_source_caps" -> t29_source_caps,
    "t30_chunk_documents" -> t30_chunk_documents,
    "t31_corpus_shuffle" -> t31_corpus_shuffle,
    "t7_ann_bucketed" -> t7_ann_bucketed,
    "t12_ivf_ann" -> t12_ivf_ann,
    "t13_ann_recall" -> t13_ann_recall,
    "t8_langid" -> t8_langid,
    "t9_quality_score" -> t9_quality_score,
    "t10_token_counts" -> t10_token_counts,
    "t11_fingerprint" -> t11_fingerprint,
    "t21_repetition" -> t21_repetition,
    "t22_redact_pii" -> t22_redact_pii,
    "t23_pack_sequences" -> t23_pack_sequences,
    "t24_top_terms" -> t24_top_terms,
    "t32_lm_quality" -> t32_lm_quality,
    "t33_bloom_dedup" -> t33_bloom_dedup,
    "t34_semdedup" -> t34_semdedup,
    "t34a_semdedup_auto" -> t34a_semdedup_auto,
    "t35_mixture_weights" -> t35_mixture_weights,
    "t36_dsir_weights" -> t36_dsir_weights,
    "t42_bm25_topk" -> t42_bm25_topk,
    "t44_hybrid_rrf" -> t44_hybrid_rrf,
    "t45_pq_index_persist" -> t45_pq_index_persist,
    "t46_bm25_index_persist" -> t46_bm25_index_persist,
    "t50_ann_index_append" -> t50_ann_index_append,
    "t54_bm25_index_append" -> t54_bm25_index_append,
    "t55_pq_index_append" -> t55_pq_index_append,
    "t56_ann_index_delete" -> t56_ann_index_delete,
    "t57_bm25_index_delete" -> t57_bm25_index_delete,
    "t58_ann_index_compact" -> t58_ann_index_compact,
    "t59_bm25_index_compact" -> t59_bm25_index_compact,
    "t60_pq_index_delete" -> t60_pq_index_delete,
    "t61_pq_index_compact" -> t61_pq_index_compact,
    "t62_ann_append_committed" -> t62_ann_append_committed,
    "t63_pq_append_committed" -> t63_pq_append_committed,
    "t47_hybrid_index_stack" -> t47_hybrid_index_stack,
    "t52_hybrid_batched" -> t52_hybrid_batched,
    "t37_winnowing" -> t37_winnowing,
    "t38_overlap_matrix" -> t38_overlap_matrix,
    "t39_winnow_pairs" -> t39_winnow_pairs,
    "t41_winnow_dedup_apply" -> t41_winnow_dedup_apply,
    "t48_paragraph_dedup" -> t48_paragraph_dedup,
    "t53_fuzzy_paragraph_dedup" -> t53_fuzzy_paragraph_dedup,
    "t49_gopher_rules" -> t49_gopher_rules,
    "m1_multimodal_features" -> m1_multimodal_features,
    "m2_frame_sample" -> m2_frame_sample,
    "m3_container_headers" -> m3_container_headers,
    "m4_mp4_frame_index" -> m4_mp4_frame_index,
    "w1_windowed_agg" -> w1_windowed_agg,
    "w2_sessionization" -> w2_sessionization,
    "w3_distinct_users" -> w3_distinct_users,
    "w4_session_window" -> w4_session_window,
    "w5_latest_state" -> w5_latest_state,
    "j6_not_followed_by" -> j6_not_followed_by,
    "j7_conversion_latency" -> j7_conversion_latency,
    "w6_funnel" -> w6_funnel,
    "w7_funnel_bucketed" -> w7_funnel_bucketed,
    "w8_funnel_within" -> w8_funnel_within,
    "w9_funnel_within_bucketed" -> w9_funnel_within_bucketed,
    "w10_funnel_guarded" -> w10_funnel_guarded,
    "w11_funnel_guarded_bucketed" -> w11_funnel_guarded_bucketed,
    "w12_funnel_times" -> w12_funnel_times,
    "w13_funnel_times_bucketed" -> w13_funnel_times_bucketed,
    "w14_funnel_within_guarded" -> w14_funnel_within_guarded,
    "w15_funnel_within_guarded_bucketed" -> w15_funnel_within_guarded_bucketed,
    "w16_funnel_loop" -> w16_funnel_loop,
    "w17_funnel_loop_bucketed" -> w17_funnel_loop_bucketed,
    "w20_funnel_strict" -> w20_funnel_strict,
    "w21_funnel_strict_bucketed" -> w21_funnel_strict_bucketed,
    "w22_funnel_optional" -> w22_funnel_optional,
    "w23_funnel_not_next" -> w23_funnel_not_next,
    "w24_funnel_pattern_product" -> w24_funnel_pattern_product,
    "w25_funnel_pattern_product_bucketed" -> w25_funnel_pattern_product_bucketed,
    "w26_funnel_matches" -> w26_funnel_matches,
    "w73_funnel_matches_absence" -> w73_funnel_matches_absence,
    "w73b_funnel_matches_absence_bucketed" ->
      w73b_funnel_matches_absence_bucketed,
    "w27_funnel_matches_bucketed" -> w27_funnel_matches_bucketed,
    "w33_funnel_skip_to_last" -> w33_funnel_skip_to_last,
    "w34_funnel_skip_to_first" -> w34_funnel_skip_to_first,
    "w35_funnel_skip_to_next" -> w35_funnel_skip_to_next,
    "w36_funnel_skip_to_last_bucketed" -> w36_funnel_skip_to_last_bucketed,
    "w37_funnel_skip_to_next_bucketed" -> w37_funnel_skip_to_next_bucketed,
    "w31_funnel_loop_until" -> w31_funnel_loop_until,
    "w38_funnel_loop_consecutive" -> w38_funnel_loop_consecutive,
    "w42_funnel_pattern_within" -> w42_funnel_pattern_within,
    "w43_funnel_pattern_within_bucketed" -> w43_funnel_pattern_within_bucketed,
    "w40_funnel_loop_consecutive_bucketed" -> w40_funnel_loop_consecutive_bucketed,
    "w39_funnel_combinations" -> w39_funnel_combinations,
    "w41_funnel_combinations_bucketed" -> w41_funnel_combinations_bucketed,
    "w32_funnel_loop_until_bucketed" -> w32_funnel_loop_until_bucketed,
    "w28_funnel_any_count" -> w28_funnel_any_count,
    "w29_funnel_any_count_bucketed" -> w29_funnel_any_count_bucketed,
    "w44_funnel_any_count_auto" -> w44_funnel_any_count_auto,
    "w45_funnel_skip_auto" -> w45_funnel_skip_auto,
    "w46_funnel_loop_consecutive_auto" -> w46_funnel_loop_consecutive_auto,
    "w47_funnel_pattern_auto" -> w47_funnel_pattern_auto,
    "w48_funnel_pattern_within_auto" -> w48_funnel_pattern_within_auto,
    "w49_funnel_loop_reluctant" -> w49_funnel_loop_reluctant,
    "w49b_funnel_loop_reluctant_bucketed" -> w49b_funnel_loop_reluctant_bucketed,
    "w50_funnel_iterative_first" -> w50_funnel_iterative_first,
    "w51_funnel_iterative_prev" -> w51_funnel_iterative_prev,
    "w52_funnel_iterative_sorted" -> w52_funnel_iterative_sorted,
    "w53_funnel_where" -> w53_funnel_where,
    "w54_funnel_where_bucketed" -> w54_funnel_where_bucketed,
    "w55_funnel_iterative_auto" -> w55_funnel_iterative_auto,
    "w56_funnel_loop_consecutive_reluctant" -> w56_funnel_loop_consecutive_reluctant,
    "w56b_funnel_loop_consecutive_reluctant_bucketed" -> w56b_funnel_loop_consecutive_reluctant_bucketed,
    "w58_funnel_loop_consecutive_auto_reluctant" -> w58_funnel_loop_consecutive_auto_reluctant,
    "w59_funnel_group_times" -> w59_funnel_group_times,
    "w59b_funnel_group_times_bucketed" -> w59b_funnel_group_times_bucketed,
    "w60_funnel_group_times_consecutive" -> w60_funnel_group_times_consecutive,
    "w61_funnel_group_times_within" -> w61_funnel_group_times_within,
    "w62_funnel_group_loop" -> w62_funnel_group_loop,
    "w62b_funnel_group_loop_bucketed" -> w62b_funnel_group_loop_bucketed,
    "w63_funnel_group_loop_consecutive" -> w63_funnel_group_loop_consecutive,
    "w68_funnel_group_loop_reluctant" -> w68_funnel_group_loop_reluctant,
    "w68b_funnel_group_loop_reluctant_bucketed" ->
      w68b_funnel_group_loop_reluctant_bucketed,
    "w68c_funnel_group_loop_reluctant_auto" ->
      w68c_funnel_group_loop_reluctant_auto,
    "w69_funnel_group_loop_reluctant_consecutive" ->
      w69_funnel_group_loop_reluctant_consecutive,
    "w64_funnel_group_times_range" -> w64_funnel_group_times_range,
    "w65_funnel_group_times_or_more" -> w65_funnel_group_times_or_more,
    "w66_funnel_where_or" -> w66_funnel_where_or,
    "w67_funnel_group_matches" -> w67_funnel_group_matches,
    "w70_funnel_group_matches_within" -> w70_funnel_group_matches_within,
    "w74_funnel_group_matches_absence" ->
      w74_funnel_group_matches_absence,
    "w75_funnel_group_matches_range" ->
      w75_funnel_group_matches_range,
    "w75b_funnel_group_matches_range_absence" ->
      w75b_funnel_group_matches_range_absence,
    "w75c_funnel_group_matches_range_bucketed" ->
      w75c_funnel_group_matches_range_bucketed,
    "w75d_funnel_group_matches_range_absence_bucketed" ->
      w75d_funnel_group_matches_range_absence_bucketed,
    "w71_funnel_group_loop_seam_guard" ->
      w71_funnel_group_loop_seam_guard,
    "w71b_funnel_group_loop_seam_guard_bucketed" ->
      w71b_funnel_group_loop_seam_guard_bucketed,
    "w72_funnel_group_times_range_guarded" ->
      w72_funnel_group_times_range_guarded,
    "w72b_funnel_group_times_range_guarded_bucketed" ->
      w72b_funnel_group_times_range_guarded_bucketed,
    "w72c_funnel_group_times_range_guarded_auto" ->
      w72c_funnel_group_times_range_guarded_auto,
    "w57_funnel_loop_until_reluctant" -> w57_funnel_loop_until_reluctant,
    "w57b_funnel_loop_until_reluctant_bucketed" -> w57b_funnel_loop_until_reluctant_bucketed,
    "w30_funnel_any" -> w30_funnel_any,
    "t14_sq8_ann" -> t14_sq8_ann,
    "j2_json_extract" -> j2_json_extract,
    "j3_asof_join" -> j3_asof_join,
    "j8_asof_tolerance" -> j8_asof_tolerance,
    "j9_asof_tolerance_us" -> j9_asof_tolerance_us,
    "j4_range_join" -> j4_range_join,
    "j5_interval_join" -> j5_interval_join,
    "j5a_interval_join_auto" -> j5a_interval_join_auto,
    "q1_pricing_summary" -> q1_pricing_summary,
    "q3_shipping_priority" -> q3_shipping_priority,
    "q5_local_supplier_volume" -> q5_local_supplier_volume,
    "q6_rollup_orders" -> q6_rollup_orders,
    "q7_running_total" -> q7_running_total,
    "q8_inactive_customers" -> q8_inactive_customers,
    "q18_large_orders" -> q18_large_orders,
    "t15_ivf_sq8_ann" -> t15_ivf_sq8_ann,
    "t40_ann_index_persist" -> t40_ann_index_persist,
    "t43_pq_ann" -> t43_pq_ann,
    "q9_pivot_events" -> q9_pivot_events,
    "q10_value_moments" -> q10_value_moments,
    "q4_priority_exists" -> q4_priority_exists,
    "q17_small_quantity" -> q17_small_quantity,
    "q11_revenue_share" -> q11_revenue_share,
    "q13_spend_deciles" -> q13_spend_deciles,
    "q12_priority_lines" -> q12_priority_lines,
    "q14_promo_revenue" -> q14_promo_revenue,
    "q16_supplier_count" -> q16_supplier_count,
    "q19_disjunctive" -> q19_disjunctive,
    "q22_idle_balance" -> q22_idle_balance,
    "q2_min_cost_supplier" -> q2_min_cost_supplier,
    "q15_top_supplier" -> q15_top_supplier,
    "q20_promotion_supplier" -> q20_promotion_supplier,
    "q21_waiting_supplier" -> q21_waiting_supplier)

  def all: Map[String, Q] = referenceQueries ++ pipelineQueries
}
