package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, TextAnalysis}

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
}
