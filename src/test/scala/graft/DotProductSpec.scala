package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.functions.DotProduct
import graft.operators.VectorOps

class DotProductSpec extends SparkSpec {

  test("native graft_dot is bit-identical to the composed fold on random vectors") {
    import spark.implicits._
    val g = for {
      n <- Gen.chooseNum(0, 128)
      a <- Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6))
      b <- Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6))
    } yield (a, b)
    val samples = Gen.listOfN(300, g).pureApply(Gen.Parameters.default, rng.Seed(7L))
    val df = samples.toDF("a", "b")
    val bad = df.select(
        VectorOps.dot(col("a"), col("b")).as("native"),
        VectorOps.dotComposed(col("a"), col("b")).as("composed"))
      .filter(col("native") =!= col("composed") ||
        (col("native").isNull =!= col("composed").isNull))
      .count()
    assert(bad === 0L)
  }

  test("length mismatch: native truncates to shorter (zip_with pads with null → composed null)") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0))).toDF("a", "b")
    val r = df.select(VectorOps.dot(col("a"), col("b"))).head
    assert(r.getDouble(0) === 14.0) // 1*4 + 2*5, documented truncation contract
  }

  test("null input → null out") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(df.select(VectorOps.dot(col("a"), col("b"))).head.isNullAt(0))
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq((Seq(1.5, -2.5, 3.25), Seq(0.5, 4.0, -1.0))).toDF("a", "b")
    val expected = 1.5 * 0.5 + -2.5 * 4.0 + 3.25 * -1.0
    // whole-stage codegen on
    assert(df.select(VectorOps.dot(col("a"), col("b"))).head.getDouble(0) === expected)
    // force interpreted path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(df.select(VectorOps.dot(col("a"), col("b"))).head.getDouble(0) === expected)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("SQL registration: SELECT graft_dot(...) resolves and computes") {
    // getOrCreate() reuses the suite session, so install the same
    // builder GraftExtensions wires, via the registry
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head
    assert(r.getDouble(0) === 11.0)
    // type check surfaces through analysis
    val err = intercept[Exception](
      spark.sql("SELECT graft_dot(array('x'), array(1.0D))").collect())
    assert(err.getMessage.contains("graft_dot"))
  }

  test("GraftExtensions injects the function into a fresh extensions set") {
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(exts) // must not throw; builder wired
  }

  test("SQL layout/container functions: graft_zvalue interleaves, graft_png_dims parses") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_zvalue(3L, 5L) AS z,
        |  graft_png_dims(unhex(concat('89504e470d0a1a0a0000000d49484452',
        |    '00000101', '00000041', '0806000000'))) AS d""".stripMargin).head
    // a=3 (bits 0,1 -> even slots 0,2), b=5 (bits 0,2 -> odd slots 1,5):
    // 1 + 4 + 2 + 32 = 39
    assert(r.getLong(0) === 39L)
    val d = r.getStruct(1)
    assert(d.getBoolean(0) && d.getInt(1) === 257 && d.getInt(2) === 65)
    // graft_hilbert: the SQL macro matches the gated Column path
    // (same 21-bit, pmod-bounded configuration)
    val h = spark.sql("SELECT graft_hilbert(3L, 5L) AS h").head.getLong(0)
    val hCol = spark.range(1)
      .select(graft.operators.Layout.hilbertValue(
        org.apache.spark.sql.functions.lit(3L),
        org.apache.spark.sql.functions.lit(5L), 21))
      .head.getLong(0)
    assert(h === hCol)
    // negative input wraps via pmod instead of two's-complement noise
    assert(spark.sql("SELECT graft_hilbert(-1L, 0L)").head.getLong(0) ===
      spark.range(1).select(graft.operators.Layout.hilbertValue(
        org.apache.spark.sql.functions.lit((1L << 21) - 1L),
        org.apache.spark.sql.functions.lit(0L), 21)).head.getLong(0))
    // graft_hilbertn: variadic macro, bits = 62 div n, matches the
    // Column path at n = 4 (15 bits/key) and wraps negatives
    val h4 = spark.sql(
      "SELECT graft_hilbertn(3L, 5L, 7L, -1L) AS h").head.getLong(0)
    val h4Col = spark.range(1)
      .select(graft.operators.Layout.hilbertValueN(Seq(
        org.apache.spark.sql.functions.lit(3L),
        org.apache.spark.sql.functions.lit(5L),
        org.apache.spark.sql.functions.lit(7L),
        org.apache.spark.sql.functions.lit((1L << 15) - 1L)), 15))
      .head.getLong(0)
    assert(h4 === h4Col)
  }

  test("SQL text macros expand to the Column-API expression trees") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_redact('mail a@b.io or 555-1234') AS red,
        |  graft_tokens('  The quick  FOX ') AS toks,
        |  graft_langid('the cat and the dog is a pet') AS lang,
        |  graft_quality('the quick brown fox jumps over the lazy dog') AS q,
        |  graft_fingerprint('abcdefgh') AS fp""".stripMargin).head
    assert(r.getString(0) === "mail <email> or <phone>")
    assert(r.getSeq[String](1) === Seq("the", "quick", "fox"))
    assert(r.getString(2) === "en")
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    // identical to the Column-API result — macro, not a reimplementation
    import spark.implicits._
    val viaColumn = Seq("abcdefgh").toDF("t")
      .select(graft.operators.TextAnalysis.fingerprint(col("t"))).head.getString(0)
    assert(r.getString(4) === viaColumn)
    // arity errors surface through analysis
    val err = intercept[Exception](
      spark.sql("SELECT graft_redact('a', 'b')").collect())
    assert(err.getMessage.contains("graft_redact"))
  }

  test("SQL kernel macro: graft_dict_tag scans with the gated blocklist") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dict_tag('the scan can merge') AS d").head
      .getStruct(0)
    // scan(+nested can), can, merge → 4 hits over 3 distinct keywords
    assert(r.getLong(0) === 4L && r.getLong(1) === 3L)
    assert(spark.sql("SELECT graft_dict_tag('nothing') AS d")
      .head.getStruct(0).getLong(0) === 0L)
  }

  test("SQL macro graft_dict_tag 2-arg form: caller-supplied literal dictionary; non-literal list rejected loudly") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dict_tag('red fox, blue fox', 'fox,blue') AS d")
      .head.getStruct(0)
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
    // the 1-arg fixture list does NOT apply to the 2-arg form
    val r2 = spark.sql(
      "SELECT graft_dict_tag('the scan can merge', 'zebra') AS d")
      .head.getStruct(0)
    assert(r2.getLong(0) === 0L)
    val err = intercept[Exception](spark.sql(
      "SELECT graft_dict_tag(c, c) FROM (SELECT 'x' AS c)").collect())
    assert(err.getMessage.contains("foldable"))
    // a keyword list that trims to empty names the function and the
    // expected format, not DictionaryMatch's generic internals
    val errEmpty = intercept[Exception](spark.sql(
      "SELECT graft_dict_tag('x', ' , ')").collect())
    assert(errEmpty.getMessage.contains("graft_dict_tag") &&
      errEmpty.getMessage.contains("kw1,kw2"))
  }

  test("SQL kernel macros: graft_minhash and graft_winnow match the Column API") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val r = spark.sql(
      """SELECT graft_minhash(array('a b c', 'b c d')) AS sig,
        |  graft_winnow('the quick brown fox jumps') AS fps""".stripMargin).head
    val viaCol = Seq((Seq("a b c", "b c d"), "the quick brown fox jumps"))
      .toDF("sh", "t")
      .select(graft.operators.TextDedup.minhashSignature(col("sh"), 16).as("sig"),
        graft.functions.WinnowFingerprints(col("t"), 5, 4).as("fps"))
      .head
    assert(r.getSeq[String](0) === viaCol.getSeq[String](0))
    assert(r.getSeq[org.apache.spark.sql.Row](1) === viaCol.getSeq[org.apache.spark.sql.Row](1))
  }

  test("SQL kernel macros: graft_shingle_ids and graft_shingle_lsh match the Column API") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val r = spark.sql(
      """SELECT graft_shingle_ids(array('a', 'b', 'c', 'a', 'b', 'c')) AS ids,
        |  graft_shingle_lsh(array('a', 'b', 'c', 'd')) AS sl""".stripMargin).head
    val viaCol = Seq((Seq("a", "b", "c", "a", "b", "c"), Seq("a", "b", "c", "d")))
      .toDF("t1", "t2")
      .select(graft.functions.ShingleIds(col("t1"), 3).as("ids"),
        graft.functions.ShingleLshBands(col("t2"), 3, 16, 4, 4).as("sl"))
      .head
    assert(r.getSeq[Long](0) === viaCol.getSeq[Long](0))
    assert(r.getStruct(1) === viaCol.getStruct(1))
  }

  test("SQL sketch aggregates: graft_heavy_hitters and graft_quantiles analyze and aggregate") {
    GraftExtensions.register(spark)
    spark.range(100)
      .selectExpr("CAST(id % 3 AS STRING) AS s", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("sketch_probe")
    val hh = spark.sql(
      "SELECT graft_heavy_hitters(s) AS hh FROM sketch_probe").head
      .getSeq[org.apache.spark.sql.Row](0)
    // 3 distinct values, capacity 8 → exact counting: 34/33/33
    assert(hh.map(r => (r.getString(0), r.getLong(1))) ===
      Seq(("0", 34L), ("1", 33L), ("2", 33L)))
    val qs = spark.sql(
      "SELECT graft_quantiles(v) AS qs FROM sketch_probe").head
      .getSeq[org.apache.spark.sql.Row](0)
    // under capacity → exact rank-ceil(q*100) percentiles of 0..99
    assert(qs.map(r => (r.getDouble(0), r.getDouble(1))) ===
      Seq((0.1, 9.0), (0.25, 24.0), (0.5, 49.0), (0.75, 74.0), (0.9, 89.0)))
    // HLL distinct sketch at p=11: 3 distinct values, tiny-V
    // linear-counting regime → the estimate is (near-)exact
    val hll = spark.sql(
      "SELECT graft_hll_distinct(s) AS h FROM sketch_probe").head
      .getStruct(0)
    assert(hll.getAs[Int]("m") === 2048)
    assert(math.abs(hll.getAs[Long]("est") - 3L) <= 1L)
    // KMV bottom-k at k=256: 3 distinct values → below capacity, the
    // sketch IS the value set and the estimate is exact
    val kmv = spark.sql(
      "SELECT graft_kmv_distinct(s) AS k FROM sketch_probe").head
      .getStruct(0)
    assert(kmv.getAs[Long]("n_keys") === 3L)
    assert(kmv.getAs[Long]("est_e6") === 3000000L)
    assert(kmv.getAs[Seq[String]]("sketch").length === 3)
  }

  test("SQL classifier logit composes over graft_tokens and matches the Column API") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_classifier_logit(graft_tokens('the quick brown fox')) AS l")
      .head.getLong(0)
    val viaCol = Seq("the quick brown fox").toDF("text")
      .select(graft.functions.ClassifierLogit(
        graft.operators.TextDedup.tokens(col("text"))))
      .head.getLong(0)
    assert(viaSql === viaCol)
    assert(viaSql !== 0L) // 7 features actually scored
  }
}
