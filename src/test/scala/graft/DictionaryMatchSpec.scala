package graft

import graft.operators.DictionaryMatch

class DictionaryMatchSpec extends SparkSpec {

  import spark.implicits._

  /** All-occurrence reference scan: every (position, keyword) pair. */
  private def brute(text: String, kws: Seq[String]): (Long, Int) = {
    val perKw = kws.map { k =>
      (0 to text.length - k.length)
        .count(i => text.regionMatches(i, k, 0, k.length)).toLong
    }
    (perKw.sum, perKw.count(_ > 0))
  }

  test("automaton scan equals the per-position reference: overlaps, nesting, self-overlap, misses") {
    val kws = Seq("a", "aa", "ab", "aba", "bab", "zzz")
    val ac = DictionaryMatch.build(kws)
    // hand-pinned: "aaa" has a×3, aa×2 (overlapping)
    assert(ac.scan("aaa") === ((5L, 2)))
    // nesting through output links: "aba" emits aba, ab, a(×2), bab? no
    assert(ac.scan("aba") === ((4L, 3)))
    val rnd = new scala.util.Random(20260816L)
    (1 to 200).foreach { _ =>
      val s = (1 to rnd.nextInt(40) + 1)
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      assert(ac.scan(s) === brute(s, kws), s"text '$s'")
    }
    // word-and-phrase dictionary on natural-ish text
    val kws2 = Seq("scan", "can", "batch batch", "row")
    val ac2 = DictionaryMatch.build(kws2)
    val t2 = "the scan can batch batch batch rows"
    assert(ac2.scan(t2) === brute(t2, kws2))
    // "batch batch batch" contains the phrase TWICE (overlapping)
    assert(brute("batch batch batch", Seq("batch batch")) === ((2L, 1)))
  }

  test("tag: map-only corpus pass with broadcast automaton; flags and counts per doc") {
    val docs = Seq((1L, "Scan the table SCAN"), (2L, "nothing here"),
      (3L, "zebra"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val r = DictionaryMatch.tag(docs, "doc_id", "text",
        Seq("scan", "can", "zebra"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect()
    // lowercased matching: both SCANs count, each also emits "can"
    assert(r(0) === ((1L, 4L, 2L, true)))
    assert(r(1) === ((2L, 0L, 0L, false)))
    assert(r(2) === ((3L, 1L, 1L, true)))
    // NULL text: the doc still appears, zero hits (not dropped)
    assert(r(3) === ((4L, 0L, 0L, false)))
    // expression-tier proof: the plan has no typed-encoder round trip
    val plan = DictionaryMatch.tag(docs, "doc_id", "text",
      Seq("scan")).queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") &&
      !plan.contains("MapElements"), plan)
    intercept[IllegalArgumentException] {
      DictionaryMatch.build(Seq.empty)
    }
    intercept[IllegalArgumentException] {
      DictionaryMatch.build(Seq("ok", ""))
    }
  }
}
