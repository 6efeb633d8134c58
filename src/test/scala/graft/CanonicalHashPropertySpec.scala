package graft

import java.sql.{Timestamp, Types}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, rng}

import graft.functions.CanonicalHash
import graft.functions.CanonicalHash._

/**
 * Property-based equivalence of the dual hash implementations (SURVEY §5):
 * generate adversarial random rows with ScalaCheck generators, evaluate
 * the Catalyst expression side and the pure-Scala side on the SAME
 * values, demand byte-identical tokens and hashes. One Spark job per
 * property (all samples in one frame), fixed seed for reproducibility.
 */
class CanonicalHashPropertySpec extends SparkSpec {

  private val N = 400
  private def sample[A](g: Gen[A]): List[A] =
    Gen.listOfN(N, g).pureApply(Gen.Parameters.default, rng.Seed(42L))

  private def meta(name: String, jdbc: Int, p: Int = 0, s: Int = 0) =
    ColumnMeta(name, jdbc, "t", p, s, nullable = true)

  private def checkColumn(dt: DataType, m: ColumnMeta, values: List[Any]): Unit = {
    val schema = StructType(Seq(StructField("v", dt)))
    val rows = values.map(v => Row(v))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
    val got = df.select(CanonicalHash.tokenExpr(col("v"), m).as("t"), col("v"))
      .collect()
    got.foreach { r =>
      val want = tokenOf(r.get(1), m)
      assert(r.getString(0) === want,
        s"value=${r.get(1)} expr=[${r.getString(0)}] scala=[$want]")
    }
  }

  test("property: double tokens agree (specials, subnormals, huge, exact halves)") {
    val g: Gen[Any] = Gen.frequency(
      6 -> Gen.chooseNum(-1e9, 1e9),
      2 -> Gen.oneOf[Double](Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity, 0.0, -0.0, Double.MinPositiveValue,
        1e31, -1e31, 1e32, 1e33, Double.MaxValue, Double.MinValue),
      2 -> Gen.chooseNum(-1000000L, 1000000L).map(_ / 2e6), // exact .x5 halves
      1 -> Gen.const(null))
    checkColumn(DoubleType, meta("v", Types.DOUBLE), sample(g))
  }

  test("property: float tokens agree") {
    val g: Gen[Any] = Gen.frequency(
      8 -> Gen.chooseNum(-1e6f, 1e6f),
      1 -> Gen.oneOf[Float](Float.NaN, Float.PositiveInfinity, 0.001f, -0.0f),
      1 -> Gen.const(null))
    checkColumn(FloatType, meta("v", Types.FLOAT), sample(g))
  }

  test("property: string tokens agree (unicode incl. astral, >1000 chars)") {
    val astral = Gen.chooseNum(0x10000, 0x10FFFF).map(cp =>
      new String(Character.toChars(cp)))
    val bmp = Gen.chooseNum(32, 0xD7FF).map(_.toChar.toString)
    val chunk = Gen.frequency(9 -> bmp, 1 -> astral)
    val g: Gen[Any] = Gen.frequency(
      5 -> Gen.chooseNum(0, 50).flatMap(n => Gen.listOfN(n, chunk).map(_.mkString)),
      3 -> Gen.chooseNum(990, 1200).flatMap(n => Gen.listOfN(n, chunk).map(_.mkString)),
      1 -> Gen.oneOf("", "|", "<NULL>", "a|b|c"),
      1 -> Gen.const(null))
    checkColumn(StringType, meta("v", Types.VARCHAR), sample(g))
  }

  test("property: timestamp tokens agree incl. pre-1970 and fraction edges") {
    val g: Gen[Any] = Gen.frequency(
      8 -> Gen.chooseNum(-2208988800000L, 4102444800000L).map(new Timestamp(_)),
      1 -> Gen.oneOf[Any](
        Timestamp.valueOf("1969-12-31 23:59:59.9999"),
        Timestamp.valueOf("1970-01-01 00:00:00.0001"),
        Timestamp.valueOf("2000-02-29 00:00:00")),
      1 -> Gen.const(null))
    checkColumn(TimestampType, meta("v", Types.TIMESTAMP, 6), sample(g))
  }

  test("property: decimal tokens agree (scales, negatives, trailing zeros)") {
    val g: Gen[Any] = Gen.frequency(
      9 -> Gen.chooseNum(-999999999999L, 999999999999L)
        .map(n => new java.math.BigDecimal(java.math.BigInteger.valueOf(n), 4)),
      1 -> Gen.const(null))
    checkColumn(DecimalType(16, 4), meta("v", Types.DECIMAL, 16, 4), sample(g))
  }

  test("property: binary tokens agree") {
    val g: Gen[Any] = Gen.frequency(
      9 -> Gen.chooseNum(0, 64).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)),
      1 -> Gen.const(null))
    checkColumn(BinaryType, meta("v", Types.BINARY), sample(g))
  }

  test("property: CHAR padding agrees for all lengths around the precision") {
    val m = ColumnMeta("v", Types.CHAR, "CHAR", 10, 0, nullable = true)
    // Astral chars included: pad/truncate must count CODEPOINTS (Spark's
    // rpad does) — a surrogate pair is ONE char for padding purposes.
    val astral = Gen.chooseNum(0x10000, 0x10FFFF).map(cp =>
      new String(Character.toChars(cp)))
    val ch = Gen.frequency(8 -> Gen.alphaChar.map(_.toString), 2 -> astral)
    val g: Gen[Any] = Gen.frequency(
      9 -> Gen.chooseNum(0, 15).flatMap(n => Gen.listOfN(n, ch).map(_.mkString)),
      1 -> Gen.const(null))
    checkColumn(StringType, m, sample(g))
  }

  test("property: TIME-string fraction handling agrees") {
    val m = ColumnMeta("v", Types.TIME, "TIME", 0, 0, nullable = true)
    val g: Gen[Any] = Gen.frequency(
      5 -> (for {
        h <- Gen.chooseNum(0, 23); mi <- Gen.chooseNum(0, 59); s <- Gen.chooseNum(0, 59)
      } yield f"$h%02d:$mi%02d:$s%02d"),
      4 -> (for {
        h <- Gen.chooseNum(0, 23); mi <- Gen.chooseNum(0, 59); s <- Gen.chooseNum(0, 59)
        f <- Gen.chooseNum(0, 9999)
      } yield f"$h%02d:$mi%02d:$s%02d.$f%04d"),
      1 -> Gen.const(null))
    checkColumn(StringType, m, sample(g))
  }

  test("law: token never exceeds 1000 codepoints; null is always <NULL>") {
    val m = meta("v", Types.VARCHAR)
    sample(Gen.chooseNum(0, 3000).flatMap(n =>
      Gen.listOfN(n, Gen.asciiPrintableChar).map(_.mkString))).foreach { s =>
      val t = tokenOf(s, m)
      assert(t.codePointCount(0, t.length) <= 1000)
    }
    assert(tokenOf(null, m) === NullToken)
  }

  test("law: rowHash is the md5 of the pipe-joined tokens (definitional triangle)") {
    val metas = Seq(meta("a", Types.INTEGER), meta("b", Types.VARCHAR),
      meta("c", Types.DOUBLE))
    val rows: List[Seq[Any]] = sample(for {
      a <- Gen.option(Gen.chooseNum(-100, 100))
      b <- Gen.option(Gen.alphaStr)
      c <- Gen.option(Gen.chooseNum(-1e6, 1e6))
    } yield Seq(a.orNull, b.orNull, c.orNull))
    rows.foreach { vs =>
      val joined = vs.zip(metas).map { case (v, m) => tokenOf(v, m) }.mkString("|")
      assert(rowHash(vs, metas) === md5Hex(joined))
    }
  }
}
