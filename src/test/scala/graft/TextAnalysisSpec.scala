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

  test("repetition scores: hand-computed fractions; short docs score zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"),      // bigrams: ab,ba,ab,ba → top 2/4; trigrams: aba,bab,aba → dup 2/3
      (2L, "x y z w"),        // all grams unique → top 1/3, dup 0
      (3L, "solo")            // < 2 tokens → 0, 0
    ).toDF("doc_id", "text")
    val out = graft.operators.Staging.scoped {
      TextAnalysis.repetitionScores(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    }
    assert(out(1L) === ((0.5, 2.0 / 3)))
    assert(out(2L) === ((1.0 / 3, 0.0)))
    assert(out(3L) === ((0.0, 0.0)))
  }

  test("redactPii masks every email and phone; counts match") {
    import spark.implicits._
    val df = Seq(
      "mail me at a.b-c%d@sub.example.org and x@y.io or dial 555-1234 then 010.4242",
      "no pii here at all").toDF("t")
    val out = df.select(
      TextAnalysis.redactPii(col("t")).as("r"),
      TextAnalysis.piiEmailCount(col("t")).as("e"),
      TextAnalysis.piiPhoneCount(col("t")).as("p")).collect()
    assert(out(0).getString(0) ===
      "mail me at <email> and <email> or dial <phone> then <phone>")
    assert(out(0).getLong(1) === 2L && out(0).getLong(2) === 2L)
    assert(out(1).getString(0) === "no pii here at all")
    assert(out(1).getLong(1) === 0L && out(1).getLong(2) === 0L)
  }

  test("packSequences distributed prefix-sum equals the global-window cumsum") {
    import spark.implicits._
    // sparse, non-dense ids straddling several buckets of width 5
    val docs = (1L to 97L by 3L).map(i =>
      (i, Seq.fill((i % 7 + 1).toInt)("w").mkString(" "))).toDF("doc_id", "text")
    val packed = TextAnalysis.packSequences(docs, "doc_id", "text",
        capacity = 8, bucketWidth = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // naive single-partition reference
    val naive = docs.withColumn("n", size(split(col("text"), " ")).cast("long"))
      .withColumn("off", coalesce(sum("n").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("seq", floor(col("off") / 8).cast("long"))
      .select("doc_id", "n", "off", "seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(packed === naive)
    // offsets are a proper prefix sum: each start = previous start + count
    packed.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 === a._3 + a._2) }
  }

  test("shuffleShards: ranks equal the global-window spelling; shards balanced") {
    import spark.implicits._
    val df = (1L to 257L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val got = TextAnalysis.shuffleShards(df, "doc_id", seed = "sX", nShards = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val expect = df.select(col("doc_id"),
        (row_number().over(Window.orderBy(
          md5(concat_ws(":", lit("sX"), col("doc_id"))), col("doc_id"))) - 1).as("rank"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(got.map { case (k, v) => k -> v._1 } === expect)
    // round-robin: shard sizes within 1 of each other (257 = 4×64 + 1)
    val sizes = got.values.groupBy(_._2).view.mapValues(_.size).values.toSeq.sorted
    assert(sizes === Seq(64, 64, 64, 65))
    // different seed ⇒ different permutation (overwhelmingly)
    val other = TextAnalysis.shuffleShards(df, "doc_id", seed = "sY", nShards = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(other !== got.map { case (k, v) => k -> v._1 })
  }

  test("chunkDocuments: marching starts, short tail, overlap region shared verbatim") {
    import spark.implicits._
    val doc = (0 until 12).map(i => s"w$i").mkString(" ") // 12 tokens
    val out = graft.operators.Staging.scoped {
      TextAnalysis.chunkDocuments(
          Seq((1L, doc), (2L, "")).toDF("doc_id", "text"),
          "doc_id", "text", chunkTokens = 5, overlap = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    }
    // step 3 → starts 0,3,6,9; last chunk is the 3-token tail
    assert(out.map(c => (c._2, c._3, c._4)).toSeq ===
      Seq((0, 0, 5), (1, 3, 5), (2, 6, 5), (3, 9, 3)))
    assert(out(0)._5 === "w0 w1 w2 w3 w4")
    assert(out(3)._5 === "w9 w10 w11")
    // consecutive chunks share exactly the 2-token overlap
    assert(out(0)._5.split(" ").takeRight(2).sameElements(
      out(1)._5.split(" ").take(2)))
    assert(out.forall(_._1 == 1L)) // the empty doc emits nothing
  }

  test("capPerGroup: exact cap per group, deterministic across runs") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    def run(): Seq[Long] = TextAnalysis.capPerGroup(df, "grp", "id", cap = 7)
      .collect().map(_.getLong(0)).toSeq.sorted
    val a = run()
    assert(a.size === 21) // 3 groups × 7
    assert(a === run())   // hash order, not partition order: reproducible
    val kept = TextAnalysis.capPerGroup(df, "grp", "id", cap = 7)
      .groupBy("grp").count().collect().map(_.getLong(1))
    assert(kept.forall(_ === 7L))
  }

  test("topTermsByRarity ranks distinctive terms above ubiquitous ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common rare1"),    // 'common' in all docs, rare1 only here
      (2L, "common rare2 rare2"),
      (3L, "common xyz")).toDF("doc_id", "text")
    val out = TextAnalysis.topTermsByRarity(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1: rare1 df=1 tf=1 → 1.0 beats common tf=2 df=3 → 0.667
    assert(out((1L, 1)) === (("rare1", 1L, 1L)))
    assert(out((1L, 2)) === (("common", 2L, 3L)))
    // doc 2: rare2 tf=2 df=1 → 2.0 first
    assert(out((2L, 1)) === (("rare2", 2L, 1L)))
    // doc 3: xyz (1/1) beats common (1/3)
    assert(out((3L, 1)) === (("xyz", 1L, 1L)))
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

  test("fused fingerprint kernel equals the composed formulation incl. astral chars") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aaaaaaaaaa"),                    // duplicate grams → duplicate hashes kept
      (3L, "abcd"),                          // < 5 codepoints → NULL
      (4L, ""),                              // empty → NULL
      (5L, "ab😀cd😁ef"), // astral codepoints count as one char
      (6L, "exact5")).toDF("id", "norm")
    val both = docs.select(col("id"),
      TextAnalysis.fingerprintFromNorm(col("norm")).as("fused"),
      TextAnalysis.fingerprintFromNormComposed(col("norm")).as("composed"))
    val bad = both.filter(!(col("fused") <=> col("composed"))).count()
    assert(bad === 0L)
    // malformed UTF-8 (stray continuation bytes, disallowed leads): the
    // kernel's codepoint walk must match Spark's substring semantics —
    // both advance 1 byte on 0x80–0xBF and 0xF8–0xFF leads (ADVICE r7).
    // binary→string cast wraps the bytes unvalidated.
    val malformed = Seq(
      Array[Byte](0x80.toByte, 'a', 'b', 'c', 'd', 0xbf.toByte, 'e'),
      Array[Byte]('x', 0xf8.toByte, 0xff.toByte, 'y', 'z', 'w'),
      Array[Byte](0xe2.toByte, 'a', 'b', 'c', 'd', 'e', 'f') // truncated 3-byte lead
    ).toDF("raw").select(col("raw").cast("string").as("norm"))
    val mb = malformed.select(
      TextAnalysis.fingerprintFromNorm(col("norm")).as("fused"),
      TextAnalysis.fingerprintFromNormComposed(col("norm")).as("composed"))
    assert(mb.filter(!(col("fused") <=> col("composed"))).count() === 0L)
    // and over the real corpus
    val corpus = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
      .select(col("doc_id"), lower(trim(col("text"))).as("norm"))
    val cb = corpus.select(
      TextAnalysis.fingerprintFromNorm(col("norm")).as("fused"),
      TextAnalysis.fingerprintFromNormComposed(col("norm")).as("composed"))
    assert(cb.filter(!(col("fused") <=> col("composed"))).count() === 0L)
  }

  test("winnowing: shared-substring guarantee, w-bounded gaps, short docs null") {
    import spark.implicits._
    val shared = "unmistakably shared span of text here"
    val docs = Seq(
      (1L, s"left padding words then $shared and a tail"),
      (2L, s"totally different opening but $shared closes it"),
      (3L, "zz"),               // < gram+w-1 codepoints → no window → null
      (4L, "independent content with no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val fp = docs.select(col("doc_id"),
      graft.functions.WinnowFingerprints(lower(trim(col("text"))), 5, 4).as("fps"))
    val rows = fp.collect().map(r => r.getLong(0) ->
      Option(r.getSeq[org.apache.spark.sql.Row](1))).toMap
    assert(rows(3L).isEmpty, "doc below gram+w-1 must yield NULL")
    // guarantee: docs 1 and 2 share a substring far longer than w+gram-1
    // → at least one common fingerprint HASH; doc 4 shares none of them
    def hashes(id: Long): Set[String] =
      rows(id).get.map(_.getString(1)).toSet
    val common = hashes(1L) intersect hashes(2L)
    assert(common.nonEmpty, "winnowing must fingerprint the shared span")
    assert((common intersect hashes(4L)).isEmpty)
    // density: consecutive picked positions gap by at most w
    val pos = rows(1L).get.map(_.getInt(0))
    assert(pos === pos.sorted, "picks must be position-ordered")
    pos.sliding(2).foreach { case Seq(a, b) =>
      assert(b - a <= 4, s"gap $a -> $b exceeds the window bound") }
  }

  test("mixtureWeights: quotas honored exactly; sqrt temperature flattens the mix") {
    import spark.implicits._
    // skewed corpus: big group 400 docs, small group 25 docs
    val docs = ((0L until 400L).map(i => (i, "big")) ++
      (400L until 425L).map(i => (i, "small"))).toDF("doc_id", "grp")
    val got = TextAnalysis.mixtureWeights(docs, "grp", "doc_id", budget = 100L)
      .cache()
    assert(got.count() === 425L) // total function: one row per doc
    val byGrp = got.groupBy("grp").agg(
        first("n_docs").as("n"), first("ppm").as("ppm"),
        first("quota").as("quota"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (nB, ppmB, quotaB, keptB) = byGrp("big")
    val (nS, ppmS, quotaS, keptS) = byGrp("small")
    assert(keptB === quotaB && keptS === quotaS) // selection fills the quota
    assert(quotaB <= nB && quotaS <= nS)
    // α=1/2 flattening: big/small count ratio 16×, weight ratio must be
    // the sqrt (4×), far below proportional
    assert(ppmB < ppmS * 16L && ppmB >= ppmS * 3L && ppmB <= ppmS * 5L)
    assert(quotaB + quotaS <= 100L) // never exceeds the budget
    // deterministic across runs (md5-rank selection, no RNG)
    val again = TextAnalysis.mixtureWeights(docs, "grp", "doc_id", budget = 100L)
    assert(got.except(again).count() === 0L && again.except(got).count() === 0L)
    got.unpersist()
  }

  test("dsirWeights: target-domain lookalikes outrank background; budget exact") {
    import spark.implicits._
    // target domain (docs 0-4) speaks "ml ai"; background (5-24) "cat dog"
    val docs = ((0L until 5L).map(i => (i, "ml ai ml ai", true)) ++
      (5L until 25L).map(i => (i, "cat dog cat dog", false)) ++
      Seq((25L, "ml ai cat dog", false),   // mixed: closer to target than pure bg
        (26L, "", false))                  // empty: zero tokens, score 0
      ).toDF("doc_id", "text", "tgt")
    val got = TextAnalysis.dsirWeights(docs, "doc_id", "text",
      targetPred = col("tgt"), vocab = 100, budget = 6).cache()
    assert(got.count() === 27L)
    val byId = got.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // every target-vocab doc scores above every background doc
    val tgtScores = (0L until 5L).map(byId(_)._2)
    val bgScores = (5L until 25L).map(byId(_)._2)
    assert(tgtScores.min > bgScores.max)
    // the mixed doc sits strictly between
    assert(byId(25L)._2 < tgtScores.min && byId(25L)._2 > bgScores.max)
    assert(byId(26L)._1 === 0L && byId(26L)._2 === 0L) // empty doc
    // exactly budget docs kept: the 5 target docs + the mixed one... unless
    // the empty doc's 0 outranks — assert the keep SET is the top-6 by score
    assert(got.filter(col("keep")).count() === 6L)
    val keptIds = got.filter(col("keep")).select("id")
      .collect().map(_.getLong(0)).toSet
    val top6 = byId.toSeq.sortBy { case (id, (_, s, _)) => (-s, id) }
      .take(6).map(_._1).toSet
    assert(keptIds === top6)
    got.unpersist()
  }

  test("lmQuality: exact integer micro-logprobs, vocab cut, OOV floor, empty docs") {
    import spark.implicits._
    // corpus: "the" ×6, "cat" ×2, "dog" ×1, "zzz" ×1 → total 10 tokens
    val docs = Seq(
      (1L, "the the the cat"),      // all in-vocab (vocab=3 keeps the,cat,dog)
      (2L, "the zzz"),              // zzz falls outside vocab → OOV floor
      (3L, "   "),                  // zero tokens
      (4L, "the the dog cat")).toDF("doc_id", "text")
    val got = TextAnalysis.lmQuality(docs, "doc_id", "text", vocab = 3)
      .orderBy("id").collect()
    def lp(p: Double): Long = roundHalf(math.log10(p) * 1e6)
    val (lpThe, lpCat, lpDog, lpOov) =
      (lp(6 / 10.0), lp(2 / 10.0), lp(1 / 10.0), lp(0.5 / 10.0))
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(got(0).getLong(1) === 4L)
    assert(got(0).getLong(2) === 3 * lpThe + lpCat)
    assert(got(1).getLong(2) === lpThe + lpOov) // zzz ranked out of vocab=3
    assert(got(2).getLong(1) === 0L && got(2).getLong(2) === 0L
      && got(2).isNullAt(3)) // empty doc: zero tokens, null score
    assert(got(3).getLong(2) === 2 * lpThe + lpDog + lpCat)
    val avg1 = got(0).getDouble(3)
    assert(avg1 === (3 * lpThe + lpCat) * 1.0 / 4 / 1e6)
  }

  test("bm25TopK: exact micro scores, tf monotonicity, no-term exclusion, k cut") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark data"), // tf=3, dl=4
      (2L, "spark data data data"),   // tf=1, dl=4 → scores below doc 1
      (3L, "data data data data"),    // no query term → excluded
      (4L, "spark"),                  // tf=1, dl=1 → shorter doc beats doc 2
      (5L, "spark data")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      terms = Seq("spark"), k = 3).collect()
    // k cut honored; doc 3 (no term) never appears
    assert(got.length === 3 && !got.map(_.getLong(0)).contains(3L))
    // hand-computed BM25 (k1=1.2, b=0.75): N=5, df=4, avgdl=15/5=3
    def score(tf: Double, dl: Double): Long = {
      val idf = math.log10(1.0 + (5 - 4.0 + 0.5) / (4.0 + 0.5))
      val tfn = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
      roundHalf(1e6 * idf * tfn)
    }
    val expected = Seq(
      1L -> score(3, 4), 4L -> score(1, 1), 2L -> score(1, 4),
      5L -> score(1, 2)).sortBy { case (id, s) => (-s, id) }.take(3)
    assert(got.map(r => r.getLong(0) -> r.getLong(1)).toSeq === expected)
    // the expected ranking also exhibits the two BM25 laws: tf
    // monotonicity (doc 1 over docs 2/5 at tf=1) and length
    // normalization (doc 4, dl=1, over doc 2, dl=4, at equal tf)
  }

  test("gopherRules: each rule trips independently; rational bounds are inclusive") {
    import spark.implicits._
    val w50 = (1 to 50).map(i => s"word$i").mkString(" ") // 50 words, no stopwords
    val docs = Seq(
      // 50 words incl. "the a": passes count (inclusive lower bound),
      // mean len (283 chars / 50 words inside [150, 500]), alpha, stops
      (1L, (1 to 48).map(i => s"word$i").mkString(" ") + " the a"),
      (2L, "the a short doc"),                       // fails word count only
      (3L, w50),                                     // fails stop words only
      // 50 single-char words + the a → mean word len 1 < 3: fails mean only
      (4L, (1 to 48).map(_ => "x").mkString(" ") + " the a"),
      // 48 digit words + the a → alpha frac 2/50 < 0.8: fails alpha (and mean)
      (5L, (1 to 48).map(_ => "123").mkString(" ") + " the a")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs, "doc_id", "text").orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getBoolean(2), x.getBoolean(3),
        x.getBoolean(4), x.getBoolean(5), x.getBoolean(6))).toSeq
    assert(r === Seq(
      (1L, true, true, true, true, true),
      (2L, false, true, true, true, false),
      (3L, true, true, true, false, false),
      (4L, true, false, true, true, false),
      (5L, true, false, false, true, false)))
  }

  test("bigramLmQuality: smoothed conditionals match a JVM replay; short docs score zero") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b"), (3L, "c"), (4L, "  "))
      .toDF("doc_id", "text")
    // replay: V=3 (a,b,c); c1(a)=2, c1(b)=2; c2(a,b)=2, c2(b,c)=1
    def lp(c2: Long, c1: Long, v: Long): Long =
      roundHalf(math.log10((c2 * 2 + 1) * 1.0 / (c1 * 2 + v)) * 1e6)
    val lpAB = lp(2, 2, 3)
    val lpBC = lp(1, 2, 3)
    val r = TextAnalysis.bigramLmQuality(docs, "doc_id", "text")
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r === Array(
      (1L, 2L, lpAB + lpBC),
      (2L, 1L, lpAB),
      (3L, 0L, 0L),
      (4L, 0L, 0L)))
    // the coherence property the unigram LM cannot see: same bag of
    // words, common transition vs rare one
    assert(lpAB > lpBC)
  }

  test("kneserNeyLmQuality: KN fractions match a JVM replay; continuation counts punish single-context words") {
    import spark.implicits._
    // corpus engineered so raw frequency and continuation frequency
    // DISAGREE: "x" appears 3 times but always after "san" (one left
    // context); "y" appears twice after two different contexts
    val docs = Seq(
      (1L, "san x san x"),
      (2L, "san x a y"),
      (3L, "b y"),
      (4L, "c")).toDF("doc_id", "text")
    // bigram types: (san,x)c2=3 (x,san)1 (x,a)1 (a,y)1 (b,y)1
    // cl: san=3,n1l=1; x=2,n1l=2; a=1; b=1. n1r: x=1, san=1, a=1, y=2. B=5
    def lp(c2: Long, clv: Long, n1l: Long, n1r: Long, b: Long): Long =
      roundHalf(math.log10(
        (math.max(4 * c2 - 3, 0) * b + 3 * n1l * n1r) * 1.0 /
          (clv * 4 * b)) * 1e6)
    val lpSanX = lp(3, 3, 1, 1, 5)
    val lpXSan = lp(1, 2, 2, 1, 5)
    val lpXA = lp(1, 2, 2, 1, 5)
    val lpAY = lp(1, 1, 1, 2, 5)
    val lpBY = lp(1, 1, 1, 2, 5)
    val r = TextAnalysis.kneserNeyLmQuality(docs, "doc_id", "text")
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r === Array(
      (1L, 3L, lpSanX + lpXSan + lpSanX),
      (2L, 3L, lpSanX + lpXA + lpAY),
      (3L, 1L, lpBY),
      (4L, 0L, 0L)))
    // KN's defining property: the continuation term gives the
    // two-context word (y after a, unseen-ish transition weight) MORE
    // backoff mass than a same-shape one-context transition would get
    // — concretely, with equal c2/cl/n1l, n1r=2 beats n1r=1
    assert(lp(1, 1, 1, 2, 5) > lp(1, 1, 1, 1, 5))
    // observed-probability sanity: per left context the discounted
    // masses stay below 1 (0.75 of each count is kept at minimum)
    def p(c2: Long, clv: Long, n1l: Long, n1r: Long, b: Long): Double =
      ((math.max(4 * c2 - 3, 0) * b + 3.0 * n1l * n1r) / (clv * 4.0 * b))
    assert(p(3, 3, 1, 1, 5) < 1.0 && p(3, 3, 1, 1, 5) > 0.5)
  }

  test("kneserNeyTrigramQuality: recursion matches a JVM replay; short docs score zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c"),
      (2L, "a b d"),
      (3L, "x y"),
      (4L, "z")).toDF("doc_id", "text")
    // trigram types: (a,b,c)2 (b,c,a)1 (c,a,b)1 (a,b,d)1
    // c12: (a,b): c12=3,n1l=2; (b,c): 1,1; (c,a): 1,1
    // bg23 (w2,w3,cc23): (b,c)1 (c,a)1 (a,b)1 (b,d)1
    // m2 (per w2 over tgc): b->2 ((a,c),(a,d)), c->1, a->1
    // k2 (per w2 over bg23): b->2 (c,d), c->1 (a), a->1 (b)
    // r3 (per w3 over bg23): c->1 (b), a->1 (c), b->1 (a), d->1 (b)
    // B2 = 4
    def lp(c3: Long, c12v: Long, n1l: Long, cc23: Long, m2v: Long,
        k2v: Long, r3v: Long, b2: Long): Long =
      roundHalf(math.log10(
        (math.max(c3 * 4 - 3, 0).toDouble / (c12v * 4.0)) +
        ((3.0 * n1l) / (c12v * 4.0)) *
        ((math.max(cc23 * 4 - 3, 0).toDouble / (m2v * 4.0)) +
         ((3.0 * k2v) / (m2v * 4.0)) * (r3v * 1.0 / b2))) * 1e6)
    val lpABC = lp(2, 3, 2, 1, 2, 2, 1, 4)
    val lpBCA = lp(1, 1, 1, 1, 1, 1, 1, 4)
    val lpCAB = lp(1, 1, 1, 1, 1, 1, 1, 4)
    val lpABD = lp(1, 3, 2, 1, 2, 2, 1, 4)
    val r = TextAnalysis.kneserNeyTrigramQuality(docs, "doc_id", "text")
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r === Array(
      (1L, 4L, lpABC + lpBCA + lpCAB + lpABC),
      (2L, 1L, lpABD),
      (3L, 0L, 0L),
      (4L, 0L, 0L)))
    // the repeated trigram scores above its single-occurrence peers
    assert(lpABC > lpABD)
  }

  test("kneserNeyModified4gramQuality: three-discount recursion matches an independent JVM replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(8841L)
    val vocab = (0 until 16).map(i => s"w$i")
    // random docs give each level its singleton mass; the crafted
    // single-4-gram docs (length exactly 4 → one gram each, dedicated
    // tokens → no interference) plant exact multiplicities so every
    // level's count-of-counts n1..n3 is populated (the discount guard):
    // raw-count 2/3/4 types for fgc, 2- and 3-distinct-w1 contexts for
    // cc234, 2- and 3-distinct-w2 contexts for cc34
    val crafted = Seq(
      "k1 k2 k3 k4", "k1 k2 k3 k4",
      "k5 k6 k7 k8", "k5 k6 k7 k8", "k5 k6 k7 k8",
      "m1 m2 m3 m4", "m1 m2 m3 m4", "m1 m2 m3 m4", "m1 m2 m3 m4",
      "u1 c1 c2 c3", "u2 c1 c2 c3",
      "v1 d1 d2 d3", "v2 d1 d2 d3", "v3 d1 d2 d3",
      "z1 e1 f1 f2", "z1 e2 f1 f2",
      "z1 g1 h1 h2", "z1 g2 h1 h2", "z1 g3 h1 h2")
    val docs = ((1L to 60L).map(i => (i,
      (0 until 20).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))) ++
      crafted.zipWithIndex.map { case (s, i) => (200L + i, s) })
      .toDF("doc_id", "text")
    // ---- independent JVM replay ----
    val toksByDoc = docs.collect().map(r => r.getLong(0) ->
      r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
      .toMap
    val fgByDoc = toksByDoc.view.mapValues(t =>
      if (t.length < 4) Seq.empty
      else t.sliding(4).map(s => (s(0), s(1), s(2), s(3))).toSeq).toMap
    val fgc = fgByDoc.values.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val cc234 = fgc.keys.groupBy(k => (k._2, k._3, k._4))
      .view.mapValues(_.size.toLong).toMap
    val cc34 = cc234.keys.groupBy(k => (k._2, k._3))
      .view.mapValues(_.size.toLong).toMap
    def disc(cs: Iterable[Long]): (Double, Double, Double) = {
      def n(i: Long) = cs.count(_ == i).toLong
      val (n1, n2, n3, n4) = (n(1), n(2), n(3), n(4))
      assert(n2 > 0 && n3 > 0, s"generator gap: $n1 $n2 $n3 $n4")
      val y = n1.toDouble / (n1 + 2 * n2)
      (y, 2.0 - 3.0 * y * n3 / n2, 3.0 - 4.0 * y * n4 / n3)
    }
    val (d41, d42, d43) = disc(fgc.values)
    val (d31, d32, d33) = disc(cc234.values)
    val (d21, d22, d23) = disc(cc34.values)
    def dOf(c: Long, d1: Double, d2: Double, d3: Double) =
      if (c == 1) d1 else if (c == 2) d2 else d3
    def cls(cs: Iterable[Long]) = (cs.sum, cs.count(_ == 1).toLong,
      cs.count(_ == 2).toLong, cs.count(_ >= 3).toLong)
    val aT = fgc.groupBy(k => (k._1._1, k._1._2, k._1._3))
      .view.mapValues(m => cls(m.values)).toMap
    val bT = cc234.groupBy(k => (k._1._1, k._1._2))
      .view.mapValues(m => cls(m.values)).toMap
    val gT = cc34.groupBy(_._1._1).view.mapValues(m => cls(m.values)).toMap
    val r4 = cc34.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val b3t = cc34.size.toLong
    def lp(k: (String, String, String, String)): Long = {
      val c4 = fgc(k); val cc2 = cc234((k._2, k._3, k._4))
      val cc3 = cc34((k._3, k._4))
      val (am, a1, a2, a3) = aT((k._1, k._2, k._3))
      val (bm, b1, b2, b3) = bT((k._2, k._3))
      val (gm, g1, g2, g3) = gT(k._3)
      roundHalf(math.log10(
        ((c4 - dOf(c4, d41, d42, d43)) / am) +
        ((d41 * a1 + d42 * a2 + d43 * a3) / am) * (
          ((cc2 - dOf(cc2, d31, d32, d33)) / bm) +
          ((d31 * b1 + d32 * b2 + d33 * b3) / bm) * (
            ((cc3 - dOf(cc3, d21, d22, d23)) / gm) +
            ((d21 * g1 + d22 * g2 + d23 * g3) / gm) *
            (r4(k._4) * 1.0 / b3t)))) * 1e6)
    }
    val expected = toksByDoc.keys.map { id =>
      val grams = fgByDoc(id)
      (id, grams.size.toLong, grams.map(lp).sum)
    }.toSeq.sortBy(_._1)
    val got = TextAnalysis.kneserNeyModified4gramQuality(docs, "doc_id",
        "text")
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(got === expected)
    // the discounts are genuinely three-valued on this corpus
    assert(Set(d41, d42, d43).size === 3)
    assert(got.exists(_._3 != 0L))
  }

  /** Independent JVM-side replay of the classifier model: md5 prefix →
    * bucket → weight, centered sum — checks Spark's conv/md5/aggregate
    * chain against java.security MessageDigest arithmetic. */
  private def expectedLogitMicro(text: String): (Long, Long) = {
    val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val feats = toks ++ toks.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    val md = java.security.MessageDigest.getInstance("MD5")
    val ws = feats.map { f =>
      val hex = md.digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 2001L
    }
    (feats.size.toLong, ws.sum - 1000L * feats.size)
  }

  test("classifyQuality: integer logit matches an independent JVM replay; empty doc scores 0") {
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a b"), (3L, "   "), (4L, "single")).toDF("doc_id", "text")
    val r = TextAnalysis.classifyQuality(docs, "doc_id", "text", bandHiMicro = 5000L)
      .orderBy("id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getBoolean(3), x.getString(4))).toSeq
    val e1 = expectedLogitMicro("the quick brown fox jumps over the lazy dog")
    val e2 = expectedLogitMicro("a b")
    val e4 = expectedLogitMicro("single")
    assert(r(0) === ((1L, e1._1, e1._2, e1._2 > 0,
      if (e1._2 > 5000) "high" else if (e1._2 > 0) "mid" else "low")))
    // "a b" → feats [a, b, "a b"]: bigrams counted as bag members
    assert(e2._1 === 3L)
    assert(r(1) === ((2L, 3L, e2._2, e2._2 > 0,
      if (e2._2 > 5000) "high" else if (e2._2 > 0) "mid" else "low")))
    // whitespace-only doc: empty bag, logit exactly 0, not kept
    assert(r(2) === ((3L, 0L, 0L, false, "low")))
    assert(r(3) === ((4L, 1L, e4._2, e4._2 > 0,
      if (e4._2 > 5000) "high" else if (e4._2 > 0) "mid" else "low")))
  }
}
