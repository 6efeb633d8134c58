package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.operators._

/**
 * Orchestration (SURVEY §2 O1–O9, §3 E1): the reference's `main`
 * (FB:98–417) re-expressed over Spark actions. Per table: access probe →
 * schema discovery → order-by resolution → watermark freeze → frozen
 * source COUNT → DDL (append/replace) → watermark-bounded (resumable)
 * scan → 11-column lineage enrichment with canonical hashes →
 * month-partitioned zstd parquet write → count + dual-hash consistency
 * check with drill-down.
 *
 * The reference batches ≤N tables per Flink job graph and rebuilds the
 * whole environment between batches (FB:177–413) purely to bound DAG size
 * and isolate failures; Spark submits one action per table from a
 * long-lived session, so "batching" degenerates to a loop with per-table
 * failure isolation — the 60-line env-rebuild block (FB:302–352) has no
 * Spark analogue and is intentionally absent.
 */
object IngestJob {

  /** O2: source-table → sink-table mapping (`TableMapping` FB:471–484).
    * MIS semantics: case-preserving, no `$`→`_` mangling (MIS:437–468). */
  final case class TableMapping(source: String, sink: String)

  object TableMapping {
    /** Parse `--tables A,B,SRC:dst` (FB:438–466 / MIS:437–468). */
    def parse(spec: String): Seq[TableMapping] =
      spec.split(",").filter(_.nonEmpty).toSeq.map { t =>
        t.split(":") match {
          case Array(s, d) => TableMapping(s.trim, d.trim)
          case Array(s)    => TableMapping(s.trim, s.trim)
          case _ => throw new IllegalArgumentException(s"bad table spec: $t")
        }
      }

    /** Iceberg rejects `$` in table names (Firebird system/legacy tables
      * carry it): `sanitizeIcebergName` FB:427–429. */
    def sanitizeSinkName(name: String): String = name.replace("$", "_")

    /** FB-variant normalization (FB:438–466): the SOURCE name is
      * uppercased (Firebird stores unquoted identifiers uppercase), the
      * SINK name lowercased — auto-derived sinks additionally get
      * `$`→`_`; an EXPLICIT `src:dst` sink is lowercased but not
      * sanitized, exactly as the reference does it. */
    def parseFb(spec: String): Seq[TableMapping] =
      spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { t =>
        t.split(":", 2) match {
          case Array(s, d) => TableMapping(s.trim.toUpperCase, d.trim.toLowerCase)
          case Array(s) =>
            TableMapping(s.trim.toUpperCase, sanitizeSinkName(s.trim.toLowerCase))
          case _ => throw new IllegalArgumentException(s"bad table spec: $t")
        }
      }

    /** Mode dispatch: `fb` → [[parseFb]], anything else → MIS
      * case-preserving [[parse]]. */
    def parse(spec: String, namingMode: String): Seq[TableMapping] =
      if (namingMode != null && namingMode.equalsIgnoreCase("fb")) parseFb(spec)
      else parse(spec)
  }

  final case class IngestConfig(
      sourceDir: String,                       // parquet dir standing in for the JDBC source
      warehouseDir: String,                    // sink root
      tables: Seq[TableMapping],
      orderByOverride: Map[String, String] = Map.empty, // --order-by per table
      replace: Boolean = false,                // O4 append/replace
      failOnConsistencyError: Boolean = true,  // FB:112–114
      offsetRows: Map[String, Long] = Map.empty, // S2 resume offsets
      lineage: Enrich.Lineage = Enrich.Lineage())

  final case class TableResult(
      mapping: TableMapping,
      skipped: Boolean,
      report: Option[ConsistencyCheck.ConsistencyReport],
      error: Option[String],
      // non-fatal per-table notices (e.g. a requested parallel scan
      // silently degrading to single-stream) — surfaced so a many-hour
      // 100 TB ingest can't hide a 1-connection fallback in its report
      warnings: Seq[String] = Nil)

  /** S5 order-by resolution chain (FB:224–235): explicit `--order-by` →
    * primary key → first column. Parquet sources carry no PK metadata, so
    * the conventional `<prefix>key` column stands in for PK detection. */
  def resolveOrderBy(mapping: TableMapping, schema: Seq[String],
      overrides: Map[String, String]): String =
    overrides.get(mapping.source)
      .orElse(schema.find(_.toLowerCase.endsWith("key")))
      .getOrElse(schema.head)

  def sourcePath(cfg: IngestConfig, m: TableMapping): String =
    s"${cfg.sourceDir}/${m.source}.parquet"

  def sinkPath(cfg: IngestConfig, m: TableMapping): String =
    s"${cfg.warehouseDir}/${m.sink}"

  /** Ingest + verify one table; returns a structured result instead of
    * failing the whole run (per-table failure isolation, FB:302–352). */
  def ingestTable(spark: SparkSession, cfg: IngestConfig, m: TableMapping): TableResult = {
    try {
      // S3: access probe — skip gracefully (FB:494–525)
      if (!SnapshotScan.probeAccess(spark.read.parquet(sourcePath(cfg, m))))
        return TableResult(m, skipped = true, None, None)

      val src = spark.read.parquet(sourcePath(cfg, m))
      val metas = ColumnMeta.fromSchema(src.schema)
      val orderBy = resolveOrderBy(m, src.columns.toSeq, cfg.orderByOverride)

      // F2/A3: freeze the snapshot bound before anything else (FB:237–246)
      val wm = SnapshotScan.freezeWatermark(src, orderBy)
      val bounded = SnapshotScan.bounded(src, orderBy, wm)

      // A1: frozen source baseline count (FB:244–246)
      val srcCount = ConsistencyCheck.sourceCount(bounded)

      // S1/S2/K1/K2: resumable scan (ordered only when resuming). The
      // remaining columns serve as tie-breakers, making the resume order
      // TOTAL even when the order key has duplicates — the reference
      // leaves this nondeterministic (FB:1084, its documented latent
      // flaw); sorting by the full row costs nothing extra on the happy
      // path (no resume → no sort at all).
      val offset = cfg.offsetRows.getOrElse(m.source, 0L)
      val scanned: DataFrame =
        if (offset > 0) SnapshotScan.resumableScan(src, orderBy, wm, offset,
          tieBreakers = src.columns.toSeq.filterNot(_ == orderBy))
        else bounded

      // F1 + F5–F13: lineage envelope + canonical hashes
      val enriched = Enrich.enrich(scanned, metas, cfg.lineage)

      // O3/O4 + S6: partitioned write. A resume (offset > 0) ALWAYS
      // appends — the first `offset` rows are already in the sink, and an
      // overwrite would silently drop them (the reference's SKIP-n resume
      // appends the suffix, FB:1220–1258).
      val mode =
        if (offset > 0 || !cfg.replace) SaveMode.Append else SaveMode.Overwrite
      Ddl.writePartitioned(enriched, sinkPath(cfg, m), mode)

      // A2 + O7: read back, count + dual-hash check (FB:1261–1328).
      // The expectation is always the FULL frozen source count: on resume
      // the sink holds prefix + suffix = srcCount (reference's SKIP-n +
      // full-count verification). The verify read runs ISOLATED —
      // vectorization off, parallelism 1 (FB:1330–1341).
      val metrics = ConsistencyCheck.isolatedSinkMetrics(spark, sinkPath(cfg, m))
      val report = ConsistencyCheck.check(m.sink, srcCount, metrics,
        cfg.failOnConsistencyError)
      TableResult(m, skipped = false, Some(report), None)
    } catch {
      case e: ConsistencyCheck.ConsistencyCheckException => throw e
      case e: Exception =>
        TableResult(m, skipped = false, None, Some(e.getMessage))
    }
  }

  /** O5: the multi-table loop. */
  def run(spark: SparkSession, cfg: IngestConfig): Seq[TableResult] =
    cfg.tables.map(ingestTable(spark, cfg, _))
}
