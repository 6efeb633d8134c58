package graft

import java.sql.{Timestamp, Types}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.CanonicalHash
import graft.functions.CanonicalHash._

/** The dual-implementation equivalence contract (SURVEY §7 step 1–2): the
  * Catalyst-expression hash and the pure-Scala hash must agree
  * byte-for-byte — the Spark analogue of the reference's source-side vs
  * sink-side hash agreement check. */
class CanonicalHashSpec extends SparkSpec {

  private def meta(name: String, jdbc: Int, p: Int = 0, s: Int = 0): ColumnMeta =
    ColumnMeta(name, jdbc, "t", p, s, nullable = true)

  test("golden fact: reference fixture row hashes md5('1|row1')") {
    // FIXTURES.md §1: TEST(ID INT, NAME VARCHAR) row (1, 'row1')
    val metas = Seq(meta("id", Types.INTEGER), meta("name", Types.VARCHAR))
    assert(rowHash(Seq(1, "row1"), metas) === md5Hex("1|row1"))
    assert(md5Hex("1|row1") === "28b1d696dcd825defc802a3a3bf81203")
  }

  test("NULL sentinel and separator") {
    val metas = Seq(meta("a", Types.INTEGER), meta("b", Types.VARCHAR))
    assert(rowHash(Seq(null, null), metas) === md5Hex("<NULL>|<NULL>"))
  }

  test("token truncation at 1000 chars") {
    val m = meta("a", Types.VARCHAR)
    val long = "x" * 2500
    assert(tokenOf(long, m) === "x" * 1000)
  }

  test("double token: round 6 HALF_UP, DECIMAL(38,6) plain string") {
    val m = meta("a", Types.DOUBLE)
    assert(tokenOf(1.0000005, m) === "1.000001")
    assert(tokenOf(17.0, m) === "17.000000")
    assert(tokenOf(-0.05, m) === "-0.050000")
    assert(tokenOf(Double.NaN, m) === NullToken)
  }

  test("time token: append .0000 only when fraction absent") {
    val m = ColumnMeta("t", Types.TIME, "TIME", 0, 0, nullable = true)
    assert(tokenOf("12:34:56", m) === "12:34:56.0000")
    assert(tokenOf("12:34:56.1200", m) === "12:34:56.1200")
  }

  test("char token: right-pad to declared precision") {
    val m = ColumnMeta("c", Types.CHAR, "CHAR", 8, 0, nullable = true)
    assert(tokenOf("ab", m) === "ab      ")
  }

  test("binary token: lowercase hex") {
    val m = meta("b", Types.BINARY)
    assert(tokenOf(Array[Byte](0x0a, 0x7f, -1), m) === "0a7fff")
  }

  test("timestamp token: 4 fractional digits") {
    val m = meta("ts", Types.TIMESTAMP)
    assert(tokenOf(Timestamp.valueOf("2024-02-29 23:59:59.123"), m)
      === "2024-02-29 23:59:59.1230")
  }

  test("expression side ≡ Scala side on a mixed-type frame") {
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("ts", TimestampType), StructField("bin", BinaryType),
      StructField("dec", DecimalType(12, 3)), StructField("b", BooleanType)))
    val metas = ColumnMeta.fromSchema(schema)
    val rows = Seq(
      Row(1, 2L, 3.14159265, "hello", Timestamp.valueOf("2020-01-02 03:04:05.678"),
        Array[Byte](1, 2, 3), new java.math.BigDecimal("12.345"), true),
      Row(null, null, null, null, null, null, null, null),
      Row(-7, Long.MaxValue, 1.0000005, "x" * 1500,
        Timestamp.valueOf("1999-12-31 23:59:59.0"), Array[Byte](),
        new java.math.BigDecimal("-0.001"), false))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val got = df.select(CanonicalHash.rowHashExpr(metas).as("h")).collect().map(_.getString(0))
    val want = rows.map(r => rowHash(r.toSeq, metas))
    assert(got.toSeq === want)
  }

  test("fused Md5Join row hash equals the composed md5∘concat_ws, both eval paths") {
    val df = spark.read.parquet(sf() + "/lineitem.parquet").limit(300)
    val metas = ColumnMeta.fromSchema(df.schema)
    val cols = df.columns.map(col).toSeq
    def run() = df.select(
        CanonicalHash.rowHashExpr(cols, metas).as("fused"),
        CanonicalHash.rowHashExprComposed(cols, metas).as("composed"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val codegen = run()
    assert(codegen.forall { case (f, c) => f == c })
    val factory = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(factory, "FALLBACK")
    try {
      spark.conf.set(factory, "NO_CODEGEN") // force Md5Join.eval()
      assert(run().toSeq === codegen.toSeq)
    } finally spark.conf.set(factory, prev)
  }

  test("Md5Join survives very wide rows (split codegen) and digest-using children") {
    import org.apache.spark.sql.graft.bridge
    // 300 children — far past the point where unsplit per-child blocks
    // would overflow the 64KB method limit.
    val df = spark.range(50).toDF("id")
    val cols = (0 until 300).map(i => md5(concat_ws(":", lit(i), col("id").cast("string"))))
    val both = df.select(
      bridge.column(graft.functions.Md5Join(cols.map(bridge.expression))).as("fused"),
      md5(concat_ws("|", cols: _*)).as("composed"))
    assert(both.collect().forall(r => r.getString(0) == r.getString(1)))
    // nested Md5Join as a child: the inner node uses the same shared
    // thread-local digest — buffered child evaluation keeps the outer
    // hash correct (the interleaving hazard this node guards against)
    val inner = bridge.column(graft.functions.Md5Join(
      Seq(col("id").cast("string")).map(bridge.expression)))
    val nested = df.select(
      bridge.column(graft.functions.Md5Join(
        Seq(inner, col("id").cast("string")).map(bridge.expression))).as("fused"),
      md5(concat_ws("|", md5(col("id").cast("string")), col("id").cast("string"))).as("composed"))
    assert(nested.collect().forall(r => r.getString(0) == r.getString(1)))
  }

  test("Md5Join mirrors concat_ws null skipping on raw nullable children") {
    // unreachable through rowHashExpr (F13 coalesce makes tokens
    // non-null) but part of the node's declared contract
    import spark.implicits._
    val df = Seq(
      (Some("a"), Some("b"), Some("c")),
      (None: Option[String], Some("b"), Some("c")), // leading null: no sep
      (Some("a"), None: Option[String], Some("c")), // inner null: one sep
      (Some("a"), Some("b"), None: Option[String]), // trailing null
      (None: Option[String], None: Option[String], None: Option[String])
    ).toDF("x", "y", "z")
    val cols = Seq(col("x"), col("y"), col("z"))
    val both = df.select(
      org.apache.spark.sql.graft.bridge.column(graft.functions.Md5Join(
        cols.map(org.apache.spark.sql.graft.bridge.expression))).as("fused"),
      md5(concat_ws("|", cols: _*)).as("composed"))
    assert(both.collect().forall(r => r.getString(0) == r.getString(1)))
  }

  test("expression side ≡ Scala side on lineitem sf0.001") {
    val df = spark.read.parquet(sf() + "/lineitem.parquet")
    val metas = ColumnMeta.fromSchema(df.schema)
    val sample = df.limit(200)
    val got = sample.select(
      CanonicalHash.rowHashExpr(metas).as("h"), struct(df.columns.map(col): _*).as("r"))
      .collect()
    got.foreach { r =>
      val row = r.getStruct(1)
      assert(r.getString(0) === rowHash(row.toSeq, metas))
    }
  }
}
