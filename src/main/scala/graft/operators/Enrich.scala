package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ColumnMeta
import graft.functions.CanonicalHash

/**
 * Technical-lineage enrichment (SURVEY §1): every output row = source
 * columns + 11 fixed tech columns (names FB:82–85 / MIS:89–90, values set
 * per row at FB:1106–1116, types FB:894).
 *
 * `row_hash` is the "source-side" hash and `row_hash_iceberg` the
 * "sink-side" hash; in the reference these are computed by two independent
 * engines (Java at the source, SQL at the sink — MIS:1598 vs MIS:1802) and
 * compared by the consistency check. Here both are Catalyst expressions
 * over the same canonical token rules; the independent second
 * implementation lives in [[CanonicalHash.rowHash]] (pure Scala) and the
 * DuckDB oracle.
 */
object Enrich {

  /** Tech column names, lowercase variant (FB:82–85). MIS uses UPPERCASE
    * (MIS:89–90); configurable via [[techColumnNames]]. */
  val TechColsLower: Seq[String] = Seq(
    "load_dttm", "load_dttm_tz", "load_id", "op", "ts_ms", "source_ts_ms",
    "src_system_code", "extract_dttm", "src_chng_dttm",
    "row_hash", "row_hash_iceberg")

  val TechColsCount = 11

  def techColumnNames(uppercase: Boolean): Seq[String] =
    if (uppercase) TechColsLower.map(_.toUpperCase) else TechColsLower

  // NTZ (naive) timestamps: matches the source tables' parquet encoding
  // (isAdjustedToUTC=false) and the reference's LocalDateTime semantics.
  def techColumnTypes: Seq[DataType] = Seq(
    TimestampNTZType, TimestampNTZType, LongType, StringType, LongType, LongType,
    StringType, TimestampNTZType, TimestampNTZType, StringType, StringType)

  /** Nullability of the envelope on initial load: constant lineage values
    * and the hashes are NOT NULL (load_dttm NOT NULL per FB:894); the
    * reserved CDC fields are nullable. */
  def techColumnNullable: Seq[Boolean] = Seq(
    false, true, true, false, true, true, false, true, true, false, false)

  /** Constant lineage values for a load. `loadDttm` defaults to a fixed
    * instant so query results stay deterministic for the differential
    * oracle; production ingest passes wall-clock. */
  final case class Lineage(
      loadDttm: Timestamp = Timestamp.valueOf("2026-01-01 00:00:00"),
      op: String = "INITIAL",
      srcSystemCode: String = "mis",
      loadId: Option[Long] = None)

  /**
   * Resolve tech-column name collisions against the source schema: a tech
   * name already present as a source column (case-insensitive, MIS:875)
   * gets a `__` prefix (`resolveTechColumnNames` FB:862–879).
   */
  def resolveTechColumnNames(
      sourceCols: Seq[String], uppercase: Boolean = false): Seq[String] = {
    val taken = sourceCols.map(_.toLowerCase).toSet
    techColumnNames(uppercase).map { n =>
      if (taken.contains(n.toLowerCase)) "__" + n else n
    }
  }

  /**
   * Append the 11-column lineage envelope. Initial-load value semantics
   * (FB:1106–1116): load_dttm = load instant, op = 'INITIAL',
   * src_system_code = source code, everything else NULL except the two
   * hashes. Both hashes cover ONLY the source columns, in source order.
   */
  def enrich(
      df: DataFrame,
      metas: Seq[ColumnMeta],
      lineage: Lineage = Lineage(),
      uppercase: Boolean = false): DataFrame = {
    val names = resolveTechColumnNames(df.columns.toSeq, uppercase)
    val hash: Column = CanonicalHash.rowHashExpr(metas)
    val hashName = names(TechColsLower.indexOf("row_hash"))
    val values: Seq[Column] = Seq(
      lit(lineage.loadDttm).cast(TimestampNTZType),
      lit(null).cast(TimestampNTZType),
      lineage.loadId.map(lit(_).cast(LongType)).getOrElse(lit(null).cast(LongType)),
      lit(lineage.op),
      lit(null).cast(LongType),
      lit(null).cast(LongType),
      lit(lineage.srcSystemCode),
      lit(null).cast(TimestampNTZType),
      lit(null).cast(TimestampNTZType),
      hash)  // row_hash: "source-side"
    val src = df.columns.map(col).toSeq
    val withHash =
      df.select(src ++ names.dropRight(1).zip(values).map { case (n, c) => c.as(n) }: _*)
    // row_hash_iceberg ("sink-side", FB:928) references the already-
    // computed row_hash column — one md5 evaluation per row, not two
    withHash.withColumn(names.last, col(hashName))
  }
}
