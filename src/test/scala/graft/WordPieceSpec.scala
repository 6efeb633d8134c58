package graft

import org.apache.spark.sql.functions._

import graft.operators.{BpeTrain, WordPiece}

class WordPieceSpec extends SparkSpec {

  import spark.implicits._

  private def applied(syms: Seq[String], a: String, b: String): Seq[String] =
    Seq(Tuple1(syms)).toDF("syms")
      .select(WordPiece.applyMerge(col("syms"), a, b).as("m"))
      .as[Seq[String]].head()

  test("applyMerge fuses with the continuation marker stripped") {
    assert(applied(Seq("a", "##b", "##c"), "a", "##b") === Seq("ab", "##c"))
    assert(applied(Seq("a", "##b", "##c"), "##b", "##c") === Seq("a", "##bc"))
    // greedy, non-overlapping, no same-round chaining (BPE's law)
    assert(applied(Seq("a", "##a", "##a"), "a", "##a") === Seq("aa", "##a"))
    assert(applied(Seq("a", "##a", "##a", "##a"), "##a", "##a") ===
      Seq("a", "##aa", "##a"))
    assert(applied(Seq("a", "##a", "##a", "##a", "##a"), "##a", "##a") ===
      Seq("a", "##aa", "##aa"))
    assert(applied(Seq("q", "##r"), "x", "##y") === Seq("q", "##r"))
  }

  test("initial segmentation: plain head, ## continuations; score is the likelihood gain") {
    // corpus: "ab" ×4, "cb" ×1 → pairs (a,##b)=4 with c(a)=4,c(##b)=5;
    // (c,##b)=1 with c(c)=1. score(a,##b) = r6(4)−r6(4)−r6(5) = −r6(5);
    // score(c,##b) = r6(1)−r6(1)−r6(5) = −r6(5) — equal scores, so the
    // UTF-8 tie-break picks left 'a'. The likelihood objective is
    // genuinely count-blind here: BPE would pick (a,##b) on raw count 4,
    // WordPiece needs the tie-break.
    val docs = Seq("ab ab ab ab cb").toDF("text")
    val (merges, _) = WordPiece.train(docs, "text", rounds = 1)
    val m = merges.head
    assert((m.left, m.right, m.pairCount) === ("a", "##b", 4L))
    assert(m.scoreMicro === -WordPiece.microLog10Count(5L))
  }

  test("likelihood argmax genuinely differs from BPE's frequency argmax") {
    // (a,##b) appears 6× but both symbols are everywhere (c(a)=9, c(##b)=8);
    // (q,##z) appears 2× and its symbols appear ONLY there (c=2 each).
    // score(a,##b) = r6(6)−r6(9)−r6(8) < 0 well below
    // score(q,##z) = r6(2)−r6(2)−r6(2) = −r6(2). BPE (t66 objective)
    // would pick the frequent pair; WordPiece must pick the exclusive one.
    val docs = Seq(
      "ab ab ab ab ab ab qz qz",
      "ac ac ac xb xb").toDF("text")
    val (wp, _) = WordPiece.train(docs, "text", rounds = 1)
    val (bpe, _) = BpeTrain.train(docs, "text", rounds = 1)
    assert((wp.head.left, wp.head.right) === ("q", "##z"))
    assert((bpe.head.left, bpe.head.right) === ("a", "b"))
  }

  test("training stops early when no pairs remain") {
    val docs = Seq("a b c").toDF("text")
    val (merges, _) = WordPiece.train(docs, "text", rounds = 5)
    assert(merges.isEmpty)
  }

  test("position invariant: every non-initial symbol keeps its ## prefix through merges") {
    val docs = Seq("abcd abcd abc bcd ab cd").toDF("text")
    val (_, words) = WordPiece.train(docs, "text", rounds = 8)
    val syms = words.select("syms").as[Seq[String]].collect()
    syms.foreach { ss =>
      assert(!ss.head.startsWith("##"), s"head of $ss")
      ss.drop(1).foreach(s => assert(s.startsWith("##"), s"tail of $ss"))
    }
  }

  test("local fast path ≡ distributed fallback: merges and word tables, ties included") {
    val docs = Seq("ab cd ab cd ef", "xy xy ef abab", "cdcd q abab")
      .toDF("text")
    val rounds = 6
    val (lm, lw) = WordPiece.train(docs, "text", rounds)
    val (dm, dw) = WordPiece.train(docs, "text", rounds, maxLocalWords = 0L)
    assert(lm === dm)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("w", "cnt", "syms").as[(String, Long, Seq[String])]
        .collect().sortBy(_._1).toSeq
    assert(key(lw) === key(dw))
  }

  test("greedy longest-match-first: longest piece wins, UNK is whole-word") {
    val vocab = Set("a", "ab", "abc", "##b", "##c", "##bc", "x")
    // longest first: "abc" → [abc], not [a,##b,##c] or [ab,##c]
    assert(WordPiece.greedyCount("abc", vocab) === ((1L, false)))
    // "abcbc": abc + ##bc (longest at each step)
    assert(WordPiece.greedyCount("abcbc", vocab) === ((2L, false)))
    // mid-word miss → the WHOLE word is one unknown token
    assert(WordPiece.greedyCount("abq", vocab) === ((1L, true)))
    // head miss → unknown
    assert(WordPiece.greedyCount("q", vocab) === ((1L, true)))
    // continuation pieces never match at the head, plain never mid-word
    assert(WordPiece.greedyCount("bc", vocab) === ((1L, true)))
    assert(WordPiece.greedyCount("xa", vocab) === ((1L, true)))
  }

  test("encodeStats: in-vocab words reproduce training piece counts; unseen chars flag UNK") {
    val train = Seq("abab abab cd").toDF("text")
    val (merges, words) = WordPiece.train(train, "text", rounds = 3)
    val vocab = WordPiece.vocab(words, merges)
    val docs = Seq((1L, "abab cd"), (2L, "abab zq")).toDF("doc_id", "text")
    val r = WordPiece.encodeStats(docs, "doc_id", "text", vocab)
      .orderBy("id")
      .as[(Long, Long, Long, Long, Long)].collect()
    // doc 1: both words fully in-vocab
    val (_, n1, p1, u1, c1) = r(0)
    assert(n1 === 2L && u1 === 0L && c1 === 6L)
    // doc 2: "zq" has characters outside the training alphabet → UNK (1 piece)
    val (_, n2, p2, u2, c2) = r(1)
    assert(n2 === 2L && u2 === 1L && c2 === 6L)
    val abPieces = WordPiece.greedyCount("abab", vocab)._1
    assert(p1 === abPieces + WordPiece.greedyCount("cd", vocab)._1)
    assert(p2 === abPieces + 1L)
  }

  test("bounded-broadcast probe: shuffle-join fallback (maxBroadcastWords = 0) is value-identical and drops the broadcast") {
    val train = Seq("abab abab cd").toDF("text")
    val (merges, words) = WordPiece.train(train, "text", rounds = 3)
    val vocab = WordPiece.vocab(words, merges)
    val docs = Seq((1L, "abab cd"), (2L, "abab zq")).toDF("doc_id", "text")
    graft.operators.Staging.scoped {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("id").collect().map(_.toString).toSeq
      // the HINT at the logical layer, not AQE's runtime choice —
      // on a tiny test table AQE re-broadcasts the shuffle join
      // anyway (which is exactly the desired degrade-gracefully
      // behavior at scale, where stats would forbid it)
      def hasBcast(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.optimizedPlan.toString
          .contains("strategy=broadcast")
      val bc = WordPiece.encodeStats(docs, "doc_id", "text", vocab)
      val sh = WordPiece.encodeStats(docs, "doc_id", "text", vocab,
        maxBroadcastWords = 0L)
      assert(rows(bc) === rows(sh))
      assert(hasBcast(bc) && !hasBcast(sh))
      // the trained word table carries its exact row-count tag
      // (abab, cd), and knownWords steers the route job-free: a
      // claimed over-bound count forces the shuffle join, values
      // identical (the r19 same-corpus encode contract)
      assert(graft.operators.BpeTrain.taggedRowCount(words) === Some(2L))
      val shK = WordPiece.encodeStats(docs, "doc_id", "text", vocab,
        maxBroadcastWords = 2L, knownWords = Some(3L))
      assert(rows(bc) === rows(shK))
      assert(!hasBcast(shK))
    }
  }
}
