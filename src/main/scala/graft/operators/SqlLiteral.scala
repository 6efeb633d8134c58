package graft.operators

import java.time.format.DateTimeFormatter

/**
 * Typed SQL literal rendering + identifier escaping (SURVEY §2 F3–F4) —
 * used when generating SQL for an external system (the reference embeds
 * the frozen watermark into both the Firebird scan SQL and the engine
 * verification SQL, FB:645–657; literal formats at FB:659–689).
 *
 * Inside Spark plans none of this is needed (`lit()` carries types);
 * these functions exist for generated-SQL surfaces: the DuckDB oracle,
 * external JDBC pushdown, diagnostics output.
 */
object SqlLiteral {

  private val tsFormatter =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS") // FB:681

  /** Port of `toSqlLiteral` (FB:659–689): numbers raw; DATE/TIME/
    * TIMESTAMP as typed literals; NULL as NULL; everything else a
    * single-quoted string with '' escaping (FB:687). */
  def toSqlLiteral(value: Any): String = value match {
    case null => "NULL"
    case n @ (_: Byte | _: Short | _: Int | _: Long |
              _: Float | _: Double) => n.toString
    case b: java.math.BigDecimal => b.toPlainString
    case b: BigDecimal => b.bigDecimal.toPlainString
    case b: Boolean => if (b) "TRUE" else "FALSE"
    case d: java.sql.Date => s"DATE '${d.toLocalDate}'"
    case d: java.time.LocalDate => s"DATE '$d'"
    case t: java.sql.Time => s"TIME '${t.toLocalTime}'"
    case t: java.time.LocalTime => s"TIME '$t'"
    case ts: java.sql.Timestamp =>
      s"TIMESTAMP '${tsFormatter.format(ts.toLocalDateTime)}'"
    case ts: java.time.LocalDateTime => s"TIMESTAMP '${tsFormatter.format(ts)}'"
    case s => "'" + s.toString.replace("'", "''") + "'"
  }

  /** Engine-side identifier quoting: backticks, doubled inside
    * (FB:853–855 — Flink/Spark dialect). */
  def escapeEngineIdentifier(name: String): String =
    "`" + name.replace("`", "``") + "`"

  /** Source-side identifier quoting: double quotes, doubled inside
    * (MIS:857–860 — standard-SQL dialect; MIS semantics: quote,
    * don't mangle). */
  def escapeSourceIdentifier(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""
}
