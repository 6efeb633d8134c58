package graft

import java.sql.Types
import org.apache.spark.sql.types._

/**
 * Column metadata carried through the pipeline — the Spark-native analogue
 * of the reference's `ColumnInfo` struct (firebird-job/src/main/java/com/
 * rzdmed/flink/FirebirdToIcebergJob.java:1709–1724, hereafter FB:…; the
 * mis_initial_job variant is MIS:…).
 *
 * Where the reference keeps THREE parallel type mappings (JDBC→Flink
 * TypeInformation FB:698, JDBC→Iceberg DDL FB:750, JDBC→Table-API DataType
 * FB:804), Spark unifies runtime, DDL and API types in a single
 * [[org.apache.spark.sql.types.DataType]], so one mapping suffices; the DDL
 * string falls out of `DataType.sql`.
 */
final case class ColumnMeta(
    name: String,
    jdbcType: Int,
    typeName: String,
    precision: Int,
    scale: Int,
    nullable: Boolean) {

  /** The single Spark type for this column (replaces flinkType/icebergType/
    * flinkDataType, FB:1716–1718). */
  lazy val dataType: DataType = TypeMapping.toSparkType(jdbcType, precision, scale)

  /** True for fixed-width CHAR/NCHAR whose hash token must be right-padded
    * to declared precision (FB:1684–1694 / MIS:1680–1686). */
  def isFixedChar: Boolean =
    jdbcType == Types.CHAR || jdbcType == Types.NCHAR

  /** True for the SQL TIME type, which Spark lacks; represented as a
    * canonical `HH:mm:ss.SSSS` string (SURVEY §1, §7 hard-part 3). */
  def isTime: Boolean = jdbcType == Types.TIME
}

object ColumnMeta {
  /** Build metadata from a Spark field (parquet-sourced tables, where JDBC
    * metadata is unavailable — the inverse of the reference's JDBC-first
    * discovery, same information content). */
  def fromField(f: StructField): ColumnMeta = {
    val (jdbc, p, s) = f.dataType match {
      case BooleanType         => (Types.BOOLEAN, 0, 0)
      case ShortType           => (Types.SMALLINT, 5, 0)
      case IntegerType         => (Types.INTEGER, 10, 0)
      case LongType            => (Types.BIGINT, 19, 0)
      case FloatType           => (Types.FLOAT, 7, 0)
      case DoubleType          => (Types.DOUBLE, 15, 0)
      case d: DecimalType      => (Types.DECIMAL, d.precision, d.scale)
      case DateType            => (Types.DATE, 0, 0)
      case TimestampType | TimestampNTZType => (Types.TIMESTAMP, 6, 0)
      case BinaryType          => (Types.BINARY, 0, 0)
      case _                   => (Types.VARCHAR, 0, 0)
    }
    ColumnMeta(f.name, jdbc, f.dataType.typeName, p, s, f.nullable)
  }

  def fromSchema(schema: StructType): Seq[ColumnMeta] =
    schema.fields.toSeq.map(fromField)
}

/**
 * JDBC type code → Spark DataType. One switch replacing the reference's
 * three (FB:698–745, FB:750–799, FB:804–844). Same closed type set:
 * BOOLEAN, SMALLINT (TINYINT folded in), INT, BIGINT, FLOAT (REAL folded
 * in), DOUBLE, DECIMAL(p,s) defaulting to (38,0) when metadata is missing
 * (FB:775–777), DATE, TIME→STRING, TIMESTAMP, BYTES, STRING fallback for
 * unknown types (FB:568–579). BLOBs are skipped at metadata time
 * (FB:552–555), so they never reach this mapping.
 */
object TypeMapping {
  val DefaultDecimalPrecision = 38
  val DefaultDecimalScale = 0

  def toSparkType(jdbcType: Int, precision: Int, scale: Int): DataType =
    jdbcType match {
      case Types.BOOLEAN | Types.BIT              => BooleanType
      case Types.TINYINT | Types.SMALLINT         => ShortType
      case Types.INTEGER                          => IntegerType
      case Types.BIGINT                           => LongType
      case Types.REAL | Types.FLOAT               => FloatType
      case Types.DOUBLE                           => DoubleType
      case Types.NUMERIC | Types.DECIMAL =>
        val p = if (precision > 0) precision else DefaultDecimalPrecision
        val s = if (scale >= 0) scale else DefaultDecimalScale
        // Clamp scale to the CLAMPED precision: NUMERIC(45,40) must yield
        // DECIMAL(38,38), not the invalid DECIMAL(38,40).
        val p2 = math.min(p, DecimalType.MAX_PRECISION)
        DecimalType(p2, math.min(s, p2))
      case Types.DATE                             => DateType
      // Spark has no TIME type: canonical HH:mm:ss.SSSS string (SURVEY §1).
      case Types.TIME                             => StringType
      case Types.TIMESTAMP                        => TimestampType
      case Types.BINARY | Types.VARBINARY | Types.LONGVARBINARY => BinaryType
      case _                                      => StringType
    }

  /** DDL type string for generated CREATE TABLE (reference's icebergType
    * switch FB:750–799 → Spark's canonical SQL rendering). */
  def ddlType(dt: DataType): String = dt.sql
}
