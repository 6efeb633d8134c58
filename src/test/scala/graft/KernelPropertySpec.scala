package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.operators.TextDedup

/**
 * Property-based byte-equivalence of the fused text kernels against
 * their composed-built-ins baselines (the CanonicalHashPropertySpec
 * pattern applied to the dedup front end): ScalaCheck generates
 * adversarial inputs — every Java `\s` byte, NBSP (NOT `\s`),
 * multi-byte case mappings (ß/ẞ/İ/ı/Σ/σ/ς), astral emoji, empty and
 * null tokens, duplicate grams — and each property demands exact
 * equality on the SAME frame. One Spark job per property, fixed seed.
 */
class KernelPropertySpec extends SparkSpec {

  private val N = 300
  private def sample[A](g: Gen[A]): List[A] =
    Gen.listOfN(N, g).pureApply(Gen.Parameters.default, rng.Seed(4242L))

  private val atoms = Gen.oneOf(
    " ", "\t", "\n", "", "\f", "\r", " ",
    "a", "B", "z", "ß", "ẞ", "İ", "ı", "Σ", "σ", "ς", "Ä", "é",
    "中", "😀", "0", ".", "-")
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, atoms).map(_.mkString))

  // token atoms skew toward a tiny vocabulary so n-gram DUPLICATES are
  // common (the dedup table's interesting path); nulls and empties mixed
  // in (concat_ws skips nulls with their separator, keeps empties)
  private val tokGen: Gen[String] = Gen.frequency(
    8 -> Gen.oneOf("a", "b", "c", "ab", "ß", "中", "😀", ""),
    1 -> Gen.const(null))
  private val arrGen: Gen[Seq[String]] = Gen.frequency(
    9 -> Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, tokGen)),
    1 -> Gen.const(null))

  test("property: fused tokenizer == composed trim+lower+split+filter") {
    import spark.implicits._
    val df = sample(textGen).toDF("text")
    val both = df.select(
      TextDedup.tokens(col("text")).as("fused"),
      TextDedup.tokensComposed(col("text")).as("composed"))
    val bad = both.filter(!(col("fused") <=> col("composed")))
    assert(bad.count() === 0L, bad.take(3).mkString("; "))
    assert(both.filter(size(col("fused")) > 1).count() > 0L)
  }

  test("property: fused shingle kernels == composed distinct/minhash/band pipeline") {
    import spark.implicits._
    val df = sample(arrGen).toDF("t")
    val sl = graft.functions.ShingleLshBands(col("t"), 3, 8, 2, 4)
    val both = df.select(
      graft.functions.ShingleIds(col("t"), 3).as("fused_ids"),
      transform(TextDedup.shingles(col("t"), 3), x => xxhash64(x))
        .as("composed_ids"),
      sl.getField("s").as("lsh_ids"),
      sl.getField("bands").as("fused_bands"),
      graft.functions.ShingleBands(col("t"), 3, 8, 2, 4).as("bands_only"),
      TextDedup.bandHashes(
        TextDedup.minhashSignatureComposed(TextDedup.shingles(col("t"), 3), 8),
        2, 4).as("composed_bands"),
      graft.functions.GramMd5s(col("t"), 3).as("fused_md5s"),
      transform(TextDedup.gramOccurrences(col("t"), 3), g => md5(g))
        .as("composed_md5s"))
    Seq(("fused_ids", "composed_ids"), ("lsh_ids", "composed_ids"),
      ("fused_bands", "composed_bands"), ("bands_only", "composed_bands"),
      ("fused_md5s", "composed_md5s"))
      .foreach { case (f, c) =>
        val bad = both.filter(!(col(f) <=> col(c)))
        assert(bad.count() === 0L, s"$f vs $c: ${bad.take(3).mkString("; ")}")
      }
    // non-degenerate: duplicate grams occurred AND were deduplicated
    assert(both.filter(size(col("fused_md5s")) > size(col("fused_ids")))
      .count() > 0L)
  }

  test("property: kernels agree with themselves across codegen and interpreted eval") {
    // the eval() overrides carry their own null-handling glue, separate
    // from doGenCode's — they must be byte-identical. Merely disabling
    // whole-stage codegen is NOT enough to reach them (projections still
    // compile per-operator via CodeGeneratorWithInterpretedFallback);
    // factoryMode=NO_CODEGEN forces the true interpreted path.
    import spark.implicits._
    val texts = sample(textGen).toDF("text")
    val arrs = sample(arrGen).toDF("t")
    def run(): (Array[org.apache.spark.sql.Row], Array[org.apache.spark.sql.Row]) = (
      texts.select(TextDedup.tokens(col("text"))).collect(),
      arrs.select(
        graft.functions.ShingleIds(col("t"), 3),
        graft.functions.ShingleLshBands(col("t"), 3, 8, 2, 4),
        graft.functions.ShingleBands(col("t"), 3, 8, 2, 4),
        graft.functions.GramMd5s(col("t"), 3)).collect())
    val codegen = run()
    val wholeStage = "spark.sql.codegen.wholeStage"
    val factory = "spark.sql.codegen.factoryMode"
    val prevWs = spark.conf.get(wholeStage)
    val prevFm = spark.conf.get(factory, "FALLBACK")
    try {
      spark.conf.set(wholeStage, "false")
      spark.conf.set(factory, "NO_CODEGEN")
      val interpreted = run()
      assert(interpreted._1 === codegen._1)
      assert(interpreted._2 === codegen._2)
    } finally {
      spark.conf.set(wholeStage, prevWs)
      spark.conf.set(factory, prevFm)
    }
  }

  test("property: fused lang-marker scores == composed isin-filter ratios") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // marker-dense token generator: real markers mixed with noise,
    // empties, nulls, and a word ("es") that is a marker in TWO sets
    val markerTok: Gen[String] = Gen.frequency(
      6 -> Gen.oneOf("the", "a", "der", "und", "le", "et", "el", "y", "es", "is"),
      3 -> Gen.oneOf("zzz", "", "ß", "中"),
      1 -> Gen.const(null))
    val mArr: Gen[Seq[String]] = Gen.frequency(
      9 -> Gen.chooseNum(0, 15).flatMap(n => Gen.listOfN(n, markerTok)),
      1 -> Gen.const(null))
    val df = sample(mArr).toDF("t")
    val both = df.select(
      graft.functions.LangMarkerScores(col("t"),
        TextAnalysis.LangMarkers.map(_._2)).as("fused"),
      array(TextAnalysis.langScores(col("t")).map(_._2): _*).as("composed"))
    val bad = both.filter(!(col("fused") <=> col("composed")))
    assert(bad.count() === 0L, bad.take(3).mkString("; "))
    assert(both.filter(element_at(col("fused"), 1) > 0).count() > 0L)
  }

  test("property: fused classifier logit == composed feature-bag fold") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val df = sample(arrGen).toDF("t")
    val both = df.select(
      graft.functions.ClassifierLogit(col("t")).as("fused"),
      TextAnalysis.classifierLogitMicro(
        TextAnalysis.classifierFeatures(col("t"))).as("composed"),
      (size(col("t")) + greatest(size(col("t")) - 1, lit(0)))
        .cast("long").as("arith_feats"),
      size(TextAnalysis.classifierFeatures(col("t"))).cast("long")
        .as("bag_feats"))
    val bad = both.filter(!(col("fused") <=> col("composed")) ||
      !(col("arith_feats") <=> col("bag_feats")))
    assert(bad.count() === 0L, bad.take(3).mkString("; "))
    // the generator must exercise non-trivial bags and the null poisons
    assert(both.filter(col("fused").isNotNull && col("arith_feats") > 3).count() > 0L)
    assert(both.filter(col("fused").isNull).count() > 0L)
  }
}
