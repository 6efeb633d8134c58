package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.CorpusStats

class CorpusStatsSpec extends SparkSpec {

  import spark.implicits._

  private def keyed(g: String, n: Int, offset: Int = 0): DataFrame =
    (0 until n).map(i => (g, s"key-${i + offset}")).toDF("g", "v")

  test("kmvSketch keeps exactly the k smallest distinct hashes per group") {
    // duplicates must not consume sketch slots
    val df = keyed("a", 50).unionAll(keyed("a", 50)).unionAll(keyed("b", 5))
    val sk = CorpusStats.kmvSketch(df, "g", "v", 8).collect()
    val a = sk.filter(_.getString(0) == "a").map(_.getString(1)).sorted
    val b = sk.filter(_.getString(0) == "b").map(_.getString(1)).sorted
    val expectA = (0 until 50).map(i => s"key-$i")
      .map(v => java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString)
      .distinct.sorted.take(8)
    assert(a.toSeq === expectA)
    assert(b.length === 5) // fewer distinct values than k → the exact set
    // rn is a 1-based dense enumeration in hash order
    val rns = sk.filter(_.getString(0) == "a").map(_.getInt(2)).sorted
    assert(rns.toSeq === (1 to 8))
  }

  test("kmvSketch merges losslessly: sketch(A ∪ B) == fold of the two sketches") {
    val a = keyed("x", 200)
    val b = keyed("x", 200, offset = 150) // overlapping ranges
    val k = 16
    val whole = CorpusStats.kmvSketch(a.unionAll(b), "g", "v", k)
      .select("h").as[String].collect().sorted.toSeq
    val folded = CorpusStats.kmvSketch(a, "g", "v", k)
      .unionByName(CorpusStats.kmvSketch(b, "g", "v", k))
      .select("h").distinct().as[String].collect().sorted.take(k)
    assert(whole === folded)
  }

  test("kmvDistinct is exact below capacity and within KMV error above it") {
    val df = keyed("small", 10).unionAll(keyed("big", 5000))
    val est = CorpusStats.kmvDistinct(
        CorpusStats.kmvSketch(df, "g", "v", 256), 256)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(est("small") === ((10L, 10L * 1000000)))
    val (nKeys, estE6) = est("big")
    assert(nKeys === 256L)
    // KMV std ≈ 1/√k ≈ 6.25%; assert a generous 4σ band
    assert(math.abs(estE6 / 1e6 - 5000.0) < 5000.0 * 0.25, s"est=$estE6")
  }

  test("kmvOverlap bounds: disjoint corpora → 0; identical corpora → k") {
    val a = CorpusStats.kmvSketch(keyed("a", 400), "g", "v", 32)
    val b = CorpusStats.kmvSketch(keyed("b", 400, offset = 1000), "g", "v", 32)
    val disjoint = CorpusStats.kmvOverlap(a, b, 32).head()
    assert(disjoint.getLong(1) === 0L && disjoint.getLong(2) === 0L)
    val same = CorpusStats.kmvOverlap(a,
      CorpusStats.kmvSketch(keyed("b", 400), "g", "v", 32), 32).head()
    assert(same.getLong(0) === 32L)     // k_used
    assert(same.getLong(1) === 32L)     // inter_k
    assert(same.getLong(2) === 1000000L) // jaccard_e6 = 1
  }

  test("KmvAgg equals the window-pipeline sketch value-for-value") {
    val df = keyed("a", 3000).unionAll(keyed("a", 3000)) // dups are free
      .unionAll(keyed("b", 7))
    val k = 128
    val windowed = CorpusStats.kmvDistinct(
        CorpusStats.kmvSketch(df, "g", "v", k), k)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    val agged = df.groupBy("g")
      .agg(graft.functions.KmvAgg(col("v"), k).as("kmv"))
      .select(col("g"), col("kmv.n_keys"), col("kmv.kth_hash"),
        col("kmv.est_e6"), col("kmv.sketch"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    assert(agged === windowed)
    // the sketch array is the k smallest hex hashes ascending
    val sk = df.groupBy("g")
      .agg(graft.functions.KmvAgg(col("v"), k).as("kmv"))
      .filter(col("g") === "a")
      .select(explode(col("kmv.sketch"))).as[String].collect()
    assert(sk.length === k && sk.toSeq === sk.sorted.toSeq)
    assert(sk.last === windowed("a")._2)
  }

  test("KmvAgg is partitioning-invariant (merge through any split)") {
    val df = keyed("x", 2000)
    def run(parts: Int) =
      df.repartition(parts).groupBy("g")
        .agg(graft.functions.KmvAgg(col("v"), 64).as("kmv"))
        .select(col("kmv.sketch")).as[Seq[String]].head()
    assert(run(1) === run(13))
  }

  test("weightedSample is deterministic, monotone in weight, and near its rate") {
    val docs = (1L to 4000L).map(i => (i, (i % 500) + 50)).toDF("id", "w0")
    val s1 = CorpusStats.weightedSample(docs, "id", "w0", 400, 3, 10)
    val s2 = CorpusStats.weightedSample(docs, "id", "w0", 400, 3, 10)
    val ids = s1.select("id").as[Long].collect().sorted
    assert(ids.toSeq === s2.select("id").as[Long].collect().sorted.toSeq)
    // zero weight can never be included
    val zero = CorpusStats.weightedSample(
      Seq((1L, 0L), (2L, -5L)).toDF("id", "w0"), "id", "w0", 400, 3, 10)
    assert(zero.count() === 0L)
    // empirical rate ≈ rate · E[min(w,cap)]/cap; w0 ∈ 50..549, cap 400
    val expectedP = (50 to 549).map(w => 0.3 * math.min(w, 400) / 400.0).sum / 500
    val got = ids.length.toDouble / 4000
    assert(math.abs(got - expectedP) < 0.05, s"got=$got expected≈$expectedP")
    // monotone: raising every weight to the cap is a superset
    val full = CorpusStats.weightedSample(
        docs.withColumn("w0", lit(400L)), "id", "w0", 400, 3, 10)
      .select("id").as[Long].collect().toSet
    assert(ids.forall(full.contains))
  }

  test("perplexityBuckets splits each language 30/40/30 by rank") {
    val docs = (1 to 100).map { i =>
      val langWords = if (i % 2 == 0) "the of and is in" else "der die und ist das"
      (i.toLong, s"$langWords sample text number ${i % 7} with word-$i tail")
    }.toDF("doc_id", "text")
    val out = CorpusStats.perplexityBuckets(docs, "doc_id", "text", vocab = 64)
    val byLang = out.groupBy("lang", "bucket").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = byLang.keys.map(_._1).toSet
    assert(langs.size >= 2)
    langs.foreach { l =>
      val n = byLang.collect { case ((`l`, _), c) => c }.sum
      assert(byLang.getOrElse((l, "tail"), 0L) === 3 * n / 10)
      assert(byLang.getOrElse((l, "head"), 0L) === n - 7 * n / 10)
    }
    // deterministic: same input, same buckets
    val again = CorpusStats.perplexityBuckets(docs, "doc_id", "text", vocab = 64)
      .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.select("id", "bucket").collect()
      .foreach(r => assert(again(r.getLong(0)) === r.getString(1)))
  }

  test("collocations: PMI micro matches an independent JVM replay; minCount filters") {
    import spark.implicits._
    // unigrams x:3 y:3 z:1 (N1=7); bigrams (x,y):3 (y,x):1 (y,z):1 (N2=5)
    val docs = Seq("x y x y", "x y z").toDF("text")
    val r = CorpusStats.collocations(docs, "text", minCount = 2L, k = 10)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(3)))
    val expectedPmi = roundHalf(
      math.log10((3.0 * 7 * 7) / (5.0 * 3 * 3)) * 1e6)
    assert(r === Array(("x", "y", 3L, expectedPmi)))
    // k cuts on (pmi desc, left, right): with minCount=1 all three pairs
    // surface and the rarer pairs (c_ab=1 against c=1 unigrams) outrank
    val all = CorpusStats.collocations(docs, "text", minCount = 1L, k = 2)
      .collect().map(x => (x.getString(0), x.getString(1)))
    assert(all.length === 2)
    assert(all.contains(("y", "z"))) // z is rare → highest association
  }

  test("driftPsi: identical slices score ~0; an injected shift crosses the 0.25 alarm") {
    import spark.implicits._
    val bounds = Seq(25L, 50L, 75L)
    def psiTotal(df: org.apache.spark.sql.DataFrame): Double =
      CorpusStats.driftPsi(df, col("f"), col("doc_id") % 2 === 1, bounds)
        .agg(sum("psi_term_micro")).head.getLong(0) / 1e6
    // identical distributions in both slices
    val same = (0 until 2000).map(i => (i.toLong, (i / 2 % 100).toLong))
      .toDF("doc_id", "f")
    assert(math.abs(psiTotal(same)) < 0.01)
    // candidate slice squeezed into [0, 50): a real shift
    val shifted = (0 until 2000).map { i =>
      (i.toLong, if (i % 2 == 0) (i / 2 % 100).toLong else (i / 2 % 50).toLong)
    }.toDF("doc_id", "f")
    assert(psiTotal(shifted) > 0.25)
  }

  test("driftPsi: empty buckets still emit their smoothed term; empty input fails loudly") {
    import spark.implicits._
    // bucket 1 ([10, 20)) has NO rows in either slice, yet the slice
    // totals differ (3 vs 1) so add-one smoothing gives it a nonzero
    // term — dropping the row would understate the PSI total
    val df = Seq((0L, 5L), (2L, 5L), (4L, 25L), (1L, 5L))
      .toDF("doc_id", "f") // even ids → A (3 rows), odd → B (1 row)
    val r = CorpusStats.driftPsi(df, col("f"), col("doc_id") % 2 === 1,
        Seq(10L, 20L))
      .orderBy("bucket").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.map(_._1).toSeq === Seq(0, 1, 2))
    val (_, ca1, cb1, term1) = r(1)
    assert(ca1 === 0L && cb1 === 0L)
    // replay: p_a = 1/6, p_b = 1/4 → (p_a-p_b)·ln(p_a/p_b) in micro
    val expected = roundHalf(
      (1.0 / 6 - 1.0 / 4) * math.log((1.0 / 6) / (1.0 / 4)) * 1e6)
    assert(term1 === expected)
    val e = intercept[IllegalArgumentException](
      CorpusStats.driftPsi(df.filter(lit(false)), col("f"),
        col("doc_id") % 2 === 1, Seq(10L)).collect())
    assert(e.getMessage.contains("non-empty"))
  }

  test("weightedSample: rateDen*cap beyond the DECIMAL(38,0) domain fails loudly, not silently") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, 1000000L)).toDF("id", "w0")
    // rateDen * cap = 4e18 * 1e6 = 4e24: the old Long product overflowed
    // SILENTLY and corrupted the inclusion decision; now the BigInt domain
    // check rejects it before any comparison runs
    val e = intercept[IllegalArgumentException](
      CorpusStats.weightedSample(docs, "id", "w0",
        cap = 1000000L, rateNum = 1L, rateDen = 4000000000000000000L))
    assert(e.getMessage.contains("DECIMAL(38,0)"))
    // near the top of the legal domain (≈5.4e18 / cap) the decision is
    // exact: rate 1 with w = cap includes everything
    val top = 5000000000000000000L
    val all = CorpusStats.weightedSample(docs.withColumn("w0", lit(1L)),
      "id", "w0", cap = 1L, rateNum = top, rateDen = top)
    assert(all.count() === 100L)
  }

  test("vocabGrowth: first occurrences land in the right ingestion deciles") {
    import spark.implicits._
    // 100 docs; doc i carries common filler plus ONE word unique to it,
    // and every doc repeats the previous doc's unique word (so repeats
    // never count). Sparse non-contiguous ids stress the value-bucketed
    // rank (rank != id).
    val docs = (0 until 100).map { i =>
      val id = i.toLong * 7 + 3 // sparse, increasing
      (id, s"common filler u$i " + (if (i > 0) s"u${i - 1}" else "common"))
    }.toDF("doc_id", "text")
    val r = CorpusStats.vocabGrowth(docs, "doc_id", "text")
      .orderBy("decile").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2)))
    // decile 0 introduces common+filler plus u0..u9 = 12; every other
    // decile exactly its 10 unique words; cumulative ends at 102
    assert(r(0) === ((0, 12L, 12L)))
    (1 until 10).foreach(d => assert(r(d) === ((d, 10L, 12L + 10L * d))))
    assert(r.last._3 === 102L)
  }

  test("collocations plan gate: broadcast unigram joins, per-partition top-k") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    graft.operators.Staging.scoped {
      val q = CorpusStats.collocations(docs, "text", minCount = 5L, k = 100)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"top-k must be per-partition heaps, not a global sort:\n$plan")
      assert("BroadcastHashJoin".r.findAllIn(plan).size == 2,
        s"both unigram lookups must broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"), plan)
      assert(q.count() > 0)
    }
  }
}
