package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeTrain

class BpeTrainSpec extends SparkSpec {

  import spark.implicits._

  private def applied(syms: Seq[String], a: String, b: String): Seq[String] =
    Seq(Tuple1(syms)).toDF("syms")
      .select(BpeTrain.applyMerge(col("syms"), a, b).as("m"))
      .as[Seq[String]].head()

  test("applyMerge is greedy left-to-right and non-overlapping") {
    assert(applied(Seq("a", "b", "c"), "a", "b") === Seq("ab", "c"))
    assert(applied(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(applied(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(applied(Seq("x", "a", "b", "a", "b"), "a", "b") === Seq("x", "ab", "ab"))
    // a merged symbol never chains within the same round
    assert(applied(Seq("a", "b", "b"), "a", "b") === Seq("ab", "b"))
    // no occurrences → unchanged
    assert(applied(Seq("q", "r"), "a", "b") === Seq("q", "r"))
  }

  test("pair counts weight by word frequency and count overlapping occurrences") {
    val docs = Seq("aa aa aa ab", "aa zz").toDF("text")
    val (merges, _) = BpeTrain.train(docs, "text", rounds = 1)
    // "aa"×4 contributes 4 to (a,a); "ab"×1 gives (a,b)=1; "zz"×1 gives (z,z)=1
    assert(merges.head === BpeTrain.Merge(1, "a", "a", 4L))
  }

  test("ties break on (count desc, left asc, right asc) and rounds chain") {
    // both ("ab" and "cd") appear twice; (a,b) < (c,d) lexicographically
    val docs = Seq("ab cd", "ab cd").toDF("text")
    val (merges, words) = BpeTrain.train(docs, "text", rounds = 2)
    assert(merges.map(m => (m.round, m.left, m.right, m.count)) ===
      Seq((1, "a", "b", 2L), (2, "c", "d", 2L)))
    // after both rounds every word is a single symbol
    val syms = words.select("syms").as[Seq[String]].collect()
    assert(syms.forall(_.length == 1))
  }

  test("training stops early when no pairs remain") {
    val docs = Seq("a b c").toDF("text") // all words single-char
    val (merges, _) = BpeTrain.train(docs, "text", rounds = 5)
    assert(merges.isEmpty)
  }

  test("encodeStats: per-doc word/symbol/char counts under the trained merges") {
    val docs = Seq((1L, "ab ab cd"), (2L, "ab")).toDF("doc_id", "text")
    val (merges, words) = BpeTrain.train(docs, "text", rounds = 1)
    assert(merges.head === BpeTrain.Merge(1, "a", "b", 3L))
    val r = BpeTrain.encodeStats(docs, "doc_id", "text", words)
      .orderBy("id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // doc 1: ab→[ab](1 sym), ab→1, cd→[c,d](2 syms); doc 2: ab→1
    assert(r === Array((1L, 3L, 4L, 6L), (2L, 1L, 1L, 2L)))
  }
}
