package graft

import org.apache.spark.sql.types._

/**
 * DuckDB-dialect canonical-token SQL generator — the analogue of the
 * reference's *generated source-side SQL* hash (FB:1590–1638 builds the
 * Firebird-dialect hash expression; here the "source dialect" is the
 * DuckDB oracle used for differential testing).
 *
 * The rendered SQL must agree byte-for-byte with
 * [[graft.functions.CanonicalHash.tokenExpr]]; every rule below was
 * validated empirically against DuckDB (decimal rendering "17.000000",
 * strftime %f truncation to 4 digits, concat_ws/md5 parity).
 *
 * Known parity domain for DOUBLE tokens: DuckDB's double→decimal cast
 * follows the exact binary expansion while Spark/Java use the shortest
 * decimal representation, so tokens diverge for doubles needing > ~15
 * significant digits at scale 6 (|x| ≳ 1e10 with full fractional
 * precision). The ENGINE's two implementations (Catalyst ⟷ Scala) agree
 * for ALL doubles — this caveat is about the external test oracle only.
 * It is the same cross-engine float-rendering hazard that made the
 * reference move row hashing entirely into one engine (comment
 * MIS:1595–1597).
 */
object OracleSql {
  import graft.functions.CanonicalHash.{NullToken, Separator, TokenMaxLen, FloatScale}

  /** Canonical token for one column, DuckDB dialect. `ref` defaults to the
    * quoted column name. */
  def token(meta: ColumnMeta, ref: String = null): String = {
    val c = if (ref != null) ref else quote(meta.name)
    val rendered = meta.dataType match {
      case StringType if meta.isTime =>
        s"CASE WHEN POSITION('.' IN $c) = 0 THEN $c || '.0000' ELSE $c END"
      case StringType if meta.isFixedChar && meta.precision > 0 =>
        s"rpad($c, ${meta.precision}, ' ')"
      case StringType => c
      case BooleanType | ShortType | IntegerType | LongType => s"CAST($c AS VARCHAR)"
      case FloatType | DoubleType =>
        // NaN/Inf/overflow → NULL explicitly (DuckDB refuses the decimal
        // cast even under TRY_CAST), matching tokenExpr's ANSI-safe guard.
        s"CASE WHEN isnan(CAST($c AS DOUBLE)) OR abs(CAST($c AS DOUBLE)) >= ${graft.functions.CanonicalHash.DoubleTokenMax} THEN NULL " +
        s"ELSE CAST(CAST(ROUND(CAST($c AS DOUBLE), $FloatScale) AS DECIMAL(38,$FloatScale)) AS VARCHAR) END"
      case _: DecimalType => s"CAST($c AS VARCHAR)"
      case DateType => s"CAST($c AS VARCHAR)"
      case TimestampType | TimestampNTZType =>
        // 19-char date-time prefix + '.' + 4 fraction digits (truncating)
        s"substr(strftime($c, '%Y-%m-%d %H:%M:%S.%f'), 1, 24)"
      case BinaryType => s"lower(hex($c))"
      case _ => s"CAST($c AS VARCHAR)"
    }
    s"COALESCE(SUBSTRING($rendered, 1, $TokenMaxLen), '$NullToken')"
  }

  /** Full row-hash expression, DuckDB dialect (mirror of
    * [[graft.functions.CanonicalHash.rowHashExpr]]). */
  def rowHash(metas: Seq[ColumnMeta]): String =
    rowHash(metas, metas.map(m => quote(m.name)))

  def rowHash(metas: Seq[ColumnMeta], refs: Seq[String]): String =
    s"md5(concat_ws('$Separator', " +
      metas.zip(refs).map { case (m, r) => token(m, r) }.mkString(", ") + "))"

  def quote(name: String): String = "\"" + name.replace("\"", "\"\"") + "\""
}
