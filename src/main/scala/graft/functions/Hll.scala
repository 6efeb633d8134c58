package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet, Meunier,
 * AofA 2007) as a custom `TypedImperativeAggregate` — cardinality
 * estimation over an arbitrary-cardinality column in `2^p` bytes of
 * fixed memory, the fourth member of the sketch family (MG heavy
 * hitters `p7`/`p8`, quantiles `p9`, Count-Min `p10`).
 *
 * Gating strength: STRONGEST of the family. Registers are element-wise
 * `max` of per-value rank contributions — commutative, associative AND
 * idempotent — so the sketch state is a deterministic function of the
 * input SET (not even the multiset matters: duplicates are free). Like
 * `p10`, the oracle replays the ENTIRE sketch in SQL; unlike `p10` it
 * also replays the estimate without touching a single float: the raw
 * HLL estimate `α_m · m² / Σ 2^{-M_j}` is computed in exact integer
 * arithmetic by scaling the harmonic sum by `2^64` (each term
 * `2^{64-M_j}` is an exact integer; DuckDB sums them in HUGEINT, Spark
 * in BigInt) and expressing `α_m` as the exact rational the HLL paper
 * defines (`697/1000` at m=32, `7213·m / (10000·m + 10790)` at
 * m ≥ 128). The gated `p11` row is therefore hash-exact at any
 * capacity, any merge order, any partitioning.
 *
 * The engine-portable hash is the repo's md5 idiom (CountMin.scala):
 * `h` = first 64 bits of `md5(v)` (big-endian unsigned — DuckDB
 * `CAST('0x' || substr(md5(v), 1, 16) AS UBIGINT)`); register index =
 * top `p` bits; rank ρ = leading-zero count of the remaining `64-p`
 * bits + 1 (in DuckDB, `60 - length(bin(w))` at p=5, with `w = 0 →
 * 64-p+1`).
 *
 * `eval` returns one struct per group:
 *   - `m`, `nonzero`: register count / touched registers;
 *   - `harmonic`: `Σ_j 2^{64-M_j}` as DECIMAL(38,0) — the full sketch
 *     state collapsed to its estimate-determining statistic (together
 *     with `nonzero` it pins every register's contribution);
 *   - `est_raw_e6`: the uncorrected HLL estimate in micro-units,
 *     integer-exact cross-engine (the oracle-gated column);
 *   - `est`: the production estimate with the paper's small-range
 *     correction (linear counting `m·ln(m/V)` when `raw ≤ 5m/2` and
 *     empty registers exist) — `ln` is JVM-deterministic but not
 *     bit-portable across engines, so this column is spec-gated on
 *     accuracy bands (QualitySpec), not oracle equality, the same
 *     honesty split as the MG/quantile guarantees. No large-range
 *     correction: with a 64-bit hash the collision regime starts at
 *     ~2^57 distinct values (Heule et al., EDBT 2013 make the same
 *     argument for HLL++).
 *
 * At 100 TB: one `m`-byte buffer per group however many rows, map-side
 * combined like any aggregate — the shuffle carries `|groups| · 2^p`
 * bytes total. This is the scale shape `w3`'s exact COUNT(DISTINCT)
 * (a full shuffle of every distinct value) cannot have; Spark's own
 * `approx_count_distinct` is the same algorithm but its state is not
 * oracle-replayable (different hash), which is why the repo carries its
 * own.
 */
case class HllAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"HllAgg precision p must be in [4,16], got $p")

  private val m: Int = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_distinct"

  override def dataType: DataType = StructType(Seq(
    StructField("m", IntegerType, nullable = false),
    StructField("nonzero", IntegerType, nullable = false),
    StructField("harmonic", DecimalType(38, 0), nullable = false),
    StructField("est_raw_e6", LongType, nullable = false),
    StructField("est", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) return buf
    val md = HashKernels.mdLocal.get()
    md.reset()
    md.update(v.asInstanceOf[UTF8String].getBytes)
    val d = md.digest()
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    val idx = (h >>> (64 - p)).toInt
    val w = h & ((1L << (64 - p)) - 1L)
    val rho =
      if (w == 0L) (64 - p + 1).toByte
      else (java.lang.Long.numberOfLeadingZeros(w) - p + 1).toByte
    if (rho > buf(idx)) buf(idx) = rho
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  /** α_m as the paper's exact rational (numerator, denominator). */
  private def alpha: (Long, Long) = m match {
    case 16 => (673L, 1000L)
    case 32 => (697L, 1000L)
    case 64 => (709L, 1000L)
    case _ => (7213L * m, 10000L * m + 10790L)
  }

  override def eval(buf: Array[Byte]): Any = {
    var nonzero = 0
    var harmonic = BigInt(0)
    val one = BigInt(1)
    var i = 0
    while (i < m) {
      val r = buf(i) & 0xff
      if (r > 0) nonzero += 1
      harmonic += one << (64 - r)
      i += 1
    }
    val (an, ad) = alpha
    val estRawE6Big =
      (BigInt(an) * m * m * (one << 64) * 1000000L) / (BigInt(ad) * harmonic)
    // micro-units overflow Long only past ~9.2e12 estimated distincts —
    // beyond the 64-bit hash's own collision regime; fail loudly rather
    // than wrap (BigInt.toLong keeps the low bits silently)
    require(estRawE6Big.isValidLong,
      s"$prettyName: raw estimate ${estRawE6Big / 1000000L} overflows the " +
        "est_raw_e6 micro-unit Long; p=" + p)
    val estRawE6 = estRawE6Big.toLong
    // production estimate: raw, with the small-range linear-counting
    // correction (spec-gated — see scaladoc)
    val raw = estRawE6.toDouble / 1e6
    val zeros = m - nonzero
    val est =
      if (raw <= 2.5 * m && zeros > 0) math.rint(m * math.log(m.toDouble / zeros)).toLong
      else math.rint(raw).toLong
    InternalRow(m, nonzero,
      org.apache.spark.sql.types.Decimal(scala.math.BigDecimal(harmonic), 38, 0),
      estRawE6, est)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)
}

object HllAgg {
  /** Column-API entry: the sketch as an aggregate column. */
  def apply(c: Column, p: Int): Column =
    bridge.column(HllAgg(bridge.expression(c), p).toAggregateExpression())
}
