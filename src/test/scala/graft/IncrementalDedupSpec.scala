package graft

import org.apache.spark.sql.functions._

import graft.operators.IncrementalDedup

class IncrementalDedupSpec extends SparkSpec {

  // corpus: keys 0..9999; batch: keys 8000..12999 (overlap 8000..9999)
  private lazy val corpus = spark.range(0, 10000)
    .select(md5(concat(lit("k"), col("id"))).as("key"))
  private lazy val batch = spark.range(8000, 13000)
    .select(col("id").as("batch_id"),
      md5(concat(lit("k"), col("id"))).as("key"))

  test("newRows equals the plain anti-join exactly") {
    val got = IncrementalDedup.newRows(batch, corpus, "key",
      expectedItems = 10000, fpp = 0.01)
    // using-column joins put the join key FIRST in the output; align
    // columns explicitly before the positional except comparison
    val want = batch.join(corpus, Seq("key"), "left_anti")
      .select("batch_id", "key")
    assert(got.count() === 3000L) // 10000..12999 are new
    assert(got.select("batch_id", "key").except(want).count() === 0L)
    assert(want.except(got.select("batch_id", "key")).count() === 0L)
  }

  test("bloom has no false negatives: every corpus key probes true") {
    val bloom = IncrementalDedup.trainBloom(corpus, "key", 10000, 0.01)
    val misses = corpus
      .filter(!IncrementalDedup.mightContain(bloom, col("key"))).count()
    assert(misses === 0L)
  }

  test("bloom prefilter holds its false-positive budget on novel keys") {
    val bloom = IncrementalDedup.trainBloom(corpus, "key", 10000, 0.01)
    val novel = batch.filter(col("batch_id") >= 10000) // 3000 novel keys
    val fps = novel
      .filter(IncrementalDedup.mightContain(bloom, col("key"))).count()
    // 1% nominal; allow 3x slack before calling the sizing wrong
    assert(fps <= 90L, s"false positives $fps exceed 3x the 1% budget")
  }
}
