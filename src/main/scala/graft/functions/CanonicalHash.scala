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
        // (mirrored in tokenOf and the DuckDB oracle). Fused single-call
        // renderer ([[RenderDoubleToken]]) replacing the measured
        // 3-BigDecimal `round → cast DECIMAL(38,6) → cast STRING` chain;
        // byte-equivalence enforced by CanonicalHashPropertySpec.
        org.apache.spark.sql.graft.bridge.column(
          RenderDoubleToken(org.apache.spark.sql.graft.bridge.expression(
            c.cast(DoubleType))))
      case _: DecimalType =>
        // F10: Spark's decimal→string is already plain, dot-separated —
        // the comma→dot REPLACE of MIS:1779–1785 is a no-op here.
        c.cast(StringType)
      case DateType => c.cast(StringType) // yyyy-MM-dd
      case TimestampType | TimestampNTZType =>
        // F8: 4 fractional digits, Firebird CAST convention (FB:1662–1666),
        // truncating like the Java formatter. Fused single-call renderer
        // ([[RenderTimestampToken]], direct digit construction from the
        // internal micros — no `date_format` formatter machinery, no
        // pmod/lpad/concat chain); byte-equivalence enforced by
        // CanonicalHashPropertySpec incl. pre-1970 and fraction edges.
        // NTZ (parquet isAdjustedToUTC=false) casts to TimestampType
        // losslessly under the pinned UTC session timezone.
        org.apache.spark.sql.graft.bridge.column(
          RenderTimestampToken(org.apache.spark.sql.graft.bridge.expression(
            c.cast(TimestampType))))
      case BinaryType => lower(hex(c)) // F12
      case _ => c.cast(StringType)
    }
    // F13: truncate then NULL-sentinel (FB:1699)
    coalesce(substring(rendered, 1, TokenMaxLen), lit(NullToken))
  }

  /** F5/F6: the full row-hash expression over the given source columns —
    * `md5(concat_ws("|", tokens…))` (FB:1640–1649 / MIS:1802), fused as
    * one [[Md5Join]] node that streams token bytes through the digest
    * instead of materializing the joined row string. Tokens are never
    * NULL (coalesce above), so concat_ws's null-skipping semantics can't
    * bite — and Md5Join mirrors them anyway. */
  def rowHashExpr(metas: Seq[ColumnMeta]): Column =
    rowHashExpr(metas.map(m => col(m.name)), metas)

  /** Same hash over explicit input columns (e.g. qualified/renamed). */
  def rowHashExpr(cols: Seq[Column], metas: Seq[ColumnMeta]): Column =
    org.apache.spark.sql.graft.bridge.column(Md5Join(
      cols.zip(metas).map { case (c, m) =>
        org.apache.spark.sql.graft.bridge.expression(tokenExpr(c, m)) }))

  /** The composed-built-ins spelling — the semantic baseline
    * [[Md5Join]] is equivalence-tested against (CanonicalHashSpec), and
    * the direct transliteration of the reference SQL / DuckDB oracle. */
  def rowHashExprComposed(cols: Seq[Column], metas: Seq[ColumnMeta]): Column =
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

/**
 * Fused canonical-token renderers — static helpers called from BOTH the
 * interpreted and the generated code of the expressions below (the
 * [[DotProduct]] escape-hatch pattern applied to the hash hot path).
 *
 * Why: the composed builtin chains are measurably wasteful per value —
 * the F9 double token ran `round(double)` (one BigDecimal), `cast(…AS
 * DECIMAL(38,6))` (a second BigDecimal inside a Decimal wrapper) and
 * `cast(…AS STRING)` (Decimal→JBigDecimal→String→UTF8String); the F8
 * timestamp token ran `date_format` (formatter machinery) + `unix_micros
 * → pmod → floor → cast → lpad → concat` (six more nodes). Each fused
 * renderer is ONE static call producing the final UTF8String (measured
 * at sf0.1: full lineitem row hash 4.6 s → ~3 s, every hash consumer —
 * f1, a2, k3, j1, t33, the ingest enrichment — inherits the cut).
 *
 * Equivalence is the SAME contract the pure-Scala side implements
 * ([[CanonicalHash.tokenOf]]) and CanonicalHashPropertySpec enforces
 * byte-identity against adversarial inputs (NaN/±Inf/±0/half-way
 * doubles, pre-1970 + fraction-edge timestamps), so a drift here fails
 * the suite, not the differential gate.
 */
object CanonicalTokens {
  import org.apache.spark.unsafe.types.UTF8String

  /** Thread-local MD5, reset — the [[Md5Join]] codegen entry (public so
    * generated code can call it without reaching the package-private
    * [[HashKernels]]). */
  def freshDigest(): MessageDigest = {
    val d = HashKernels.mdLocal.get()
    d.reset()
    d
  }

  /** Finish a [[freshDigest]] digest as lowercase-hex UTF8String. */
  def hexDigest(d: MessageDigest): UTF8String = HashKernels.hex32(d.digest())

  /** F9 fused: `round(x, 6) HALF_UP → DECIMAL(38,6) plain string` as a
    * single BigDecimal op (the exact [[CanonicalHash.tokenOf]] double
    * path). NaN/±Inf/|x| ≥ 1e32 → null (→ `<NULL>` after coalesce). */
  def renderDouble(x: Double): UTF8String =
    if (java.lang.Double.isNaN(x) || math.abs(x) >= CanonicalHash.DoubleTokenMax) null
    else UTF8String.fromString(
      JBigDecimal.valueOf(x).setScale(CanonicalHash.FloatScale, RoundingMode.HALF_UP)
        .toPlainString)

  /** F8 fused: epoch micros → `yyyy-MM-dd HH:mm:ss.SSSS` (4 fractional
    * digits, truncating) by direct digit construction — no formatter.
    * Years are rendered zero-padded to 4 digits (the reference's
    * Firebird CAST convention; its TIMESTAMP domain is years 1–9999). */
  def renderTimestampMicros(micros: Long): UTF8String = {
    val secs = Math.floorDiv(micros, 1000000L)
    val frac = (Math.floorMod(micros, 1000000L) / 100L).toInt
    val ldt = java.time.LocalDateTime.ofEpochSecond(secs, 0, java.time.ZoneOffset.UTC)
    val sb = new java.lang.StringBuilder(24)
    append4(sb, ldt.getYear); sb.append('-')
    append2(sb, ldt.getMonthValue); sb.append('-')
    append2(sb, ldt.getDayOfMonth); sb.append(' ')
    append2(sb, ldt.getHour); sb.append(':')
    append2(sb, ldt.getMinute); sb.append(':')
    append2(sb, ldt.getSecond); sb.append('.')
    append4(sb, frac)
    UTF8String.fromString(sb.toString)
  }

  private def append2(sb: java.lang.StringBuilder, v: Int): Unit = {
    if (v < 10) sb.append('0')
    sb.append(v)
  }

  private def append4(sb: java.lang.StringBuilder, v: Int): Unit = {
    if (v >= 0 && v < 10000) {
      if (v < 1000) sb.append('0')
      if (v < 100) sb.append('0')
      if (v < 10) sb.append('0')
    }
    sb.append(v)
  }
}

/** F9 as one fused expression node (codegen emits a single static call). */
case class RenderDoubleToken(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_double_token"

  override def nullSafeEval(v: Any): Any =
    CanonicalTokens.renderDouble(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.CanonicalTokens.renderDouble($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): RenderDoubleToken =
    copy(child = newChild)
}

/** F8 as one fused expression node over internal micros. */
case class RenderTimestampToken(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_ts_token"

  override def nullSafeEval(v: Any): Any =
    CanonicalTokens.renderTimestampMicros(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CanonicalTokens.renderTimestampMicros($c);")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): RenderTimestampToken =
    copy(child = newChild)
}

/** F5/F6's outer `md5(concat_ws("|", token…))` as ONE variadic fused
  * node: every token's bytes stream through a thread-local MessageDigest
  * with the separator byte between non-null children — the concatenated
  * row string (≈ row width per hash, twice per enriched row) is never
  * materialized. Tokens are non-null by construction (the F13 coalesce),
  * but a NULL child is mirrored exactly as `concat_ws` skips it — value
  * AND separator — so the node is contract-identical on ANY input.
  * CanonicalHashSpec asserts equality with the pure-Scala [[CanonicalHash
  * .rowHash]] on random rows (the definitional triangle); the
  * f1/a2/j1/t33/e2e differential gates hold end-to-end. */
case class Md5Join(children: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
    extends org.apache.spark.sql.catalyst.expressions.Expression {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.codegen.{Block, CodegenContext, ExprCode, FalseLiteral}
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "graft_md5_join"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.nonEmpty && children.forall(_.dataType == StringType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects one or more string children, got " +
          children.map(_.dataType.simpleString).mkString(", "))
    }

  // All children are evaluated BEFORE the digest is initialized (eval
  // and codegen alike): child trees may themselves use the shared
  // thread-local digest (a kernel-derived column inlined by
  // CollapseProject, or a nested Md5Join), and interleaving their
  // evaluation with updates to the same digest would silently corrupt
  // the outer hash. Buffer-then-stream keeps the node contract-correct
  // on ANY input, matching the scaladoc claim.
  override def eval(input: InternalRow): Any = {
    val vals = new Array[UTF8String](children.length)
    var i = 0
    while (i < children.length) {
      vals(i) = children(i).eval(input).asInstanceOf[UTF8String]
      i += 1
    }
    val d = CanonicalTokens.freshDigest()
    var first = true
    i = 0
    while (i < vals.length) {
      val v = vals(i)
      if (v != null) {
        if (!first) d.update('|'.toByte)
        d.update(v.getBytes)
        first = false
      }
      i += 1
    }
    CanonicalTokens.hexDigest(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Child values land in a mutable-state array so the per-child blocks
    // can be split into separate methods (splitExpressionsWithCurrentInputs)
    // — wide rows (many metas) stay under the 64KB JVM method limit
    // instead of falling back to the interpreted path.
    val vals = ctx.addMutableState("UTF8String[]", "md5JoinVals",
      v => s"$v = new UTF8String[${children.length}];")
    val assigns = children.zipWithIndex.map { case (ch, i) =>
      val g = ch.genCode(ctx)
      s"""
         |${g.code}
         |$vals[$i] = ${g.isNull} ? null : ${g.value};
         |""".stripMargin
    }
    val evalChildren = ctx.splitExpressionsWithCurrentInputs(assigns)
    val digest = ctx.freshName("digest")
    val first = ctx.freshName("first")
    val i = ctx.freshName("i")
    ev.copy(code = code"""
      |$evalChildren
      |java.security.MessageDigest $digest =
      |  graft.functions.CanonicalTokens.freshDigest();
      |boolean $first = true;
      |for (int $i = 0; $i < ${children.length}; $i++) {
      |  UTF8String v = $vals[$i];
      |  if (v != null) {
      |    if (!$first) { $digest.update((byte) '|'); }
      |    $digest.update(v.getBytes());
      |    $first = false;
      |  }
      |}
      |UTF8String ${ev.value} =
      |  graft.functions.CanonicalTokens.hexDigest($digest);
      |""".stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Md5Join =
    copy(children = newChildren)
}
