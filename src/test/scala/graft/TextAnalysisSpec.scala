package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, TextAnalysis}
import org.apache.spark.sql.expressions.Window

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId: marker argmax with declaration-order tie-break and CJK short-circuit") {
    val df = Seq(
      ("the cat and the dog is a pet", "en"),
      ("der hund und die katze ist das tier", "de"),
      ("le chat et la souris est les amis", "fr"),
      ("el gato y los perros es las mascotas", "es"),
      ("总之 这是 中文", "zh"),
      ("xyzzy quux plugh", "und")
    ).toDF("text", "expected")
    val got = df.select(col("expected"), TextAnalysis.langId(col("text")).as("got"))
      .collect()
    got.foreach(r => assert(r.getString(1) === r.getString(0), r.toString))
  }

  test("quality score components bounded and composite in [0,1]") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val q = docs.select(TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.tokenCount(col("text")).as("n"))
    val rows = q.collect()
    assert(rows.forall(r => r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0))
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("fingerprint is stable under leading/trailing whitespace and case") {
    val df = Seq(("Hello World Document Text",
      "  hello world document text  ")).toDF("a", "b")
    val r = df.select(
      TextAnalysis.fingerprint(col("a")).as("fa"),
      TextAnalysis.fingerprint(col("b")).as("fb")).head
    assert(r.getString(0) === r.getString(1))
    assert(r.getString(0).length === 4 * 32)
  }

  test("multimodal: batched stub decode matches expression-side metadata keys") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val out = Multimodal.features(spark, docs)
    assert(out.count() === docs.count())
    assert(out.columns.toSet === Set("asset_id", "modality", "n_bytes",
      "magic", "width", "height", "f0", "f1", "f2", "f3"))
    // features are [0,1) and deterministic
    val f = out.select("f0", "f1", "f2", "f3").collect()
    assert(f.forall(r => (0 until 4).forall(i =>
      r.getDouble(i) >= 0.0 && r.getDouble(i) < 1.0)))
    val again = Multimodal.features(spark, docs).select("asset_id", "f0")
      .except(out.select("asset_id", "f0")).count()
    assert(again === 0L)
  }

  test("multimodal: magic hex matches payload's leading UTF-8 bytes") {
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(5)
    val rows = Multimodal.withMetadata(Multimodal.assetsFromDocuments(docs))
      .join(docs.select(col("doc_id").as("asset_id"), col("text")), Seq("asset_id"))
      .select("magic", "text").collect()
    rows.foreach { r =>
      val expect = r.getString(1).getBytes("UTF-8").take(4)
        .map(b => f"${b & 0xff}%02x").mkString
      assert(r.getString(0) === expect)
    }
  }

  test("approx quantile thresholds sit in the valid median band of the deterministic twin") {
    // the at-scale (sketch) form of t18's threshold subplan must pick a
    // REAL data value in the median band; the deterministic row_number
    // formulation (the gated twin) picks the ceil(n/2) rank — conventions
    // may differ by at most one rank at even group sizes
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val scored = docs.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    val approx = TextAnalysis.approxQuantileThresholds(scored, "lang", "quality", 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy("quality", "doc_id")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .filter(col("rn") === ceil(col("n") * 0.5))
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(approx.keySet === exact.keySet)
    val byLang = scored.collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getDouble(2)).sorted)
    approx.foreach { case (lang, a) =>
      val qs = byLang(lang)
      assert(qs.contains(a), s"$lang: approx threshold $a is not a data value")
      val below = qs.count(_ < a).toDouble
      val atOrBelow = qs.count(_ <= a).toDouble
      // a valid median element, with one rank of convention slack
      assert(below <= qs.length * 0.5 && atOrBelow >= qs.length * 0.5 - 1,
        s"$lang: approx $a outside the median band (exact ${exact(lang)})")
    }
  }
}
