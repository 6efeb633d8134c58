package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ColumnMeta

/**
 * Canonical row hashing — the semantic core of the engine (SURVEY §2
 * F5–F14). A row's hash is `md5(token1 || '|' || token2 || …)` where each
 * token is a per-type canonical string rendering. The reference implements
 * this THREE times — Firebird SQL (FB:1596–1605), Flink SQL
 * (FB:1640–1699), and pure Java (MIS:1598–1694) — and requires the
 * variants to produce byte-identical hashes; its runtime consistency check
 * is precisely "do the independently-computed hashes agree".
 *
 * Here there are two provably-equivalent implementations:
 *   - [[tokenExpr]] / [[rowHashExpr]]: Catalyst `Column` trees built from
 *     codegen'd built-ins (`md5, concat_ws, round, rpad, date_format,
 *     hex, substring, coalesce`) — the hot path, whole-stage-codegen
 *     friendly, pushdown-transparent.
 *   - [[tokenOf]] / [[rowHash]]: plain Scala (port of `toHashTokenJava`
 *     MIS:1615–1694 + `computeRowHashJava` MIS:1598–1613 +
 *     `bytesToHexLower` FB:1580–1589) — used by driver-side diagnostics
 *     and as the property-test oracle for the expression side.
 *
 * Canonicalization rules (each detail changes the MD5 — FIXTURES.md §1):
 *   separator `|`; NULL → `<NULL>` (FB:1699); every token truncated to
 *   1,000 chars (FB:1592–1595); FLOAT/DOUBLE → round(x, 6) HALF_UP
 *   rendered as DECIMAL(38,6) plain string (FB:1675–1683); DECIMAL →
 *   plain string with comma→dot normalization (MIS:1655–1662); TIME →
 *   `HH:mm:ss.0000` without double-appending when a fraction exists
 *   (FB:1667–1673); TIMESTAMP → `yyyy-MM-dd HH:mm:ss.SSSS`, 4 fractional
 *   digits (FB:1662–1666); CHAR → right-padded to declared precision
 *   (FB:1684–1694); BINARY → lowercase hex (FB:1580–1589); hash =
 *   lowercase MD5 hex (FB:1570–1578).
 */
object CanonicalHash {
  val Separator = "|"
  val NullToken = "<NULL>"
  val TokenMaxLen = 1000
  val FloatScale = 6
  /** DECIMAL(38,6) integer-digit capacity: doubles at or beyond this
    * magnitude (and ±Inf, which compares ≥) render as NULL tokens. */
  val DoubleTokenMax = 1e32
  val TimestampPattern = "yyyy-MM-dd HH:mm:ss.SSSS"

  // ---------------------------------------------------------------------
  // Catalyst-expression side
  // ---------------------------------------------------------------------

  /** Canonical token for one column as a Column expression. `NULL →
    * <NULL>` and the 1,000-char cap are applied uniformly at the end
    * (FB:1699: `COALESCE(SUBSTRING(expr, 1, 1000), '<NULL>')`). */
  def tokenExpr(c: Column, meta: ColumnMeta): Column = {
    val rendered: Column = meta.dataType match {
      case StringType if meta.isTime =>
        // F7: append .0000 only when no fraction is present (FB:1667–1673)
        when(instr(c, ".") === 0, concat(c, lit(".0000"))).otherwise(c)
      case StringType if meta.isFixedChar && meta.precision > 0 =>
        // F11: Firebird hashes the padded CHAR value (FB:1684–1694)
        rpad(c, meta.precision, " ")
      case StringType => c
      case BooleanType => c.cast(StringType) // "true"/"false"
      case ShortType | IntegerType | LongType => c.cast(StringType)
      case FloatType | DoubleType =>
        // F9: kill binary-arithmetic noise (FB:1675–1683). NaN/Inf and
        // values beyond DECIMAL(38,6) range (|x| ≥ 1e32) → NULL → <NULL>
        // explicitly (mirrored in tokenOf and the DuckDB oracle) — under
        // Spark 4's default ANSI mode the bare decimal cast would throw.
        val cd = c.cast(DoubleType)
        when(isnan(cd) || abs(cd) >= lit(DoubleTokenMax), lit(null).cast(StringType))
          .otherwise(round(cd, FloatScale)
            .cast(DecimalType(38, FloatScale)).cast(StringType))
      case _: DecimalType =>
        // F10: Spark's decimal→string is already plain, dot-separated —
        // the comma→dot REPLACE of MIS:1779–1785 is a no-op here.
        c.cast(StringType)
      case DateType => c.cast(StringType) // yyyy-MM-dd
      case TimestampType | TimestampNTZType =>
        // F8: 4 fractional digits, Firebird CAST convention (FB:1662–1666).
        // Spark's date_format drops a zero fraction entirely for 'S'
        // patterns, so render the 4-digit fraction explicitly from the
        // microsecond remainder (truncating, like the Java formatter).
        // NTZ (parquet isAdjustedToUTC=false) casts to TimestampType
        // losslessly under the pinned UTC session timezone.
        val ts = c.cast(TimestampType)
        concat(
          date_format(ts, "yyyy-MM-dd HH:mm:ss"), lit("."),
          lpad(floor(pmod(unix_micros(ts), lit(1000000L)) / 100)
            .cast(StringType), 4, "0"))
      case BinaryType => lower(hex(c)) // F12
      case _ => c.cast(StringType)
    }
    // F13: truncate then NULL-sentinel (FB:1699)
    coalesce(substring(rendered, 1, TokenMaxLen), lit(NullToken))
  }

  /** F5/F6: the full row-hash expression over the given source columns —
    * `md5(concat_ws("|", tokens…))` (FB:1640–1649 / MIS:1802). Tokens are
    * never NULL (coalesce above), so concat_ws's null-skipping semantics
    * can't bite. */
  def rowHashExpr(metas: Seq[ColumnMeta]): Column =
    md5(concat_ws(Separator, metas.map(m => tokenExpr(col(m.name), m)): _*))

  /** Same hash over explicit input columns (e.g. qualified/renamed). */
  def rowHashExpr(cols: Seq[Column], metas: Seq[ColumnMeta]): Column =
    md5(concat_ws(Separator, cols.zip(metas).map { case (c, m) => tokenExpr(c, m) }: _*))

  // ---------------------------------------------------------------------
  // Pure-Scala side (diagnostics + property-test oracle)
  // ---------------------------------------------------------------------

  private val tsFormatter = DateTimeFormatter.ofPattern(TimestampPattern)

  /** Port of `toHashTokenJava` (MIS:1615–1694): canonical token for one
    * value. Accepts the JVM-side representations Spark rows carry. */
  def tokenOf(value: Any, meta: ColumnMeta): String = {
    if (value == null) return NullToken
    val rendered: String = value match {
      case s: String if meta.isTime =>
        if (s.contains(".")) s else s + ".0000"
      case s: String if meta.isFixedChar && meta.precision > 0 =>
        // Codepoint-counted like the Catalyst side: Spark's rpad counts
        // codepoints (UTF8String.numChars), so astral-plane chars must not
        // be split or double-counted here either (mirrors truncateToken).
        val cps = s.codePointCount(0, s.length)
        if (cps >= meta.precision) s.substring(0, s.offsetByCodePoints(0, meta.precision))
        else s + (" " * (meta.precision - cps))
      case s: String => s
      case b: Boolean => String.valueOf(b)
      case n @ (_: Short | _: Int | _: Long | _: Byte) => n.toString
      case f: Float => doubleToken(f.toDouble)
      case d: Double => doubleToken(d)
      case bd: JBigDecimal => bd.toPlainString.replace(',', '.')
      case bd: BigDecimal => bd.bigDecimal.toPlainString.replace(',', '.')
      case d: java.sql.Date => d.toLocalDate.toString
      case d: java.time.LocalDate => d.toString
      case t: java.sql.Timestamp => tsFormatter.format(t.toLocalDateTime)
      case t: java.time.LocalDateTime => tsFormatter.format(t)
      case t: java.time.Instant =>
        tsFormatter.format(java.time.LocalDateTime.ofInstant(t, java.time.ZoneOffset.UTC))
      case b: Array[Byte] => bytesToHexLower(b)
      case other => other.toString
    }
    if (rendered == null) NullToken else truncateToken(rendered)
  }

  /** F13 truncation counts CODEPOINTS, not UTF-16 units — Spark's
    * `substring` (and DuckDB's) are codepoint-based, so astral-plane
    * characters must not be split or double-counted. */
  private def truncateToken(s: String): String =
    if (s.codePointCount(0, s.length) <= TokenMaxLen) s
    else s.substring(0, s.offsetByCodePoints(0, TokenMaxLen))

  /** F9 Java side (MIS:1645–1654): BigDecimal HALF_UP at scale 6, plain
    * string. NaN/Inf → null token, matching the expression side where
    * CAST(NaN AS DECIMAL) yields NULL. */
  private def doubleToken(d: Double): String =
    if (d.isNaN || d.isInfinite || math.abs(d) >= DoubleTokenMax) null
    else JBigDecimal.valueOf(d).setScale(FloatScale, RoundingMode.HALF_UP).toPlainString

  /** Port of `computeRowHashJava` (MIS:1598–1613): MD5 of the UTF-8
    * canonical concatenation, lowercase hex. */
  def rowHash(values: Seq[Any], metas: Seq[ColumnMeta]): String = {
    require(values.length == metas.length,
      s"row arity ${values.length} != metadata arity ${metas.length}")
    val canonical = values.zip(metas)
      .map { case (v, m) => tokenOf(v, m) }.mkString(Separator)
    md5Hex(canonical)
  }

  def md5Hex(s: String): String =
    bytesToHexLower(MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8)))

  /** Port of `bytesToHexLower` (FB:1580–1589). */
  def bytesToHexLower(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** F14 `normalizeRowHash` (FB:1570–1578): hash-as-bytes or hash-as-string
    * → canonical lowercase hex string. */
  def normalizeRowHash(hash: Any): String = hash match {
    case null => null
    case b: Array[Byte] => bytesToHexLower(b)
    case s: String => s.toLowerCase
    case other => other.toString.toLowerCase
  }
}
