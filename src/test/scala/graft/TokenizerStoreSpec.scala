package graft

import graft.operators.{BpeTrain, CommitLog, TokenizerStore, UnigramLm, WordPiece}

class TokenizerStoreSpec extends SparkSpec {

  import spark.implicits._

  test("models round-trip field-exactly; versions replace; as-of and latest resolve from both sides") {
    val docs = Seq("abab abab cd", "abab zz qq").toDF("text")
    val sub = Seq("abab abab cd").toDF("text")

    // WordPiece: two versions, full fidelity both directions
    val wpT = "tokstore_spec_wp"
    CommitLog.clear(spark, wpT)
    val (m1, w1) = WordPiece.train(sub, "text", rounds = 3)
    val v1 = WordPiece.vocab(w1, m1)
    assert(TokenizerStore.saveWordPiece(spark, wpT, 1L, m1, v1))
    // replayed save is a no-op (the CommitLog contract)
    assert(!TokenizerStore.saveWordPiece(spark, wpT, 1L, m1, v1))
    val (m2, w2) = WordPiece.train(docs, "text", rounds = 3)
    val v2 = WordPiece.vocab(w2, m2)
    assert(TokenizerStore.saveWordPiece(spark, wpT, 2L, m2, v2))
    assert(TokenizerStore.versions(spark, wpT) === Seq(1L, 2L))
    assert(TokenizerStore.loadWordPieceVocab(spark, wpT, Some(1L)) === v1)
    assert(TokenizerStore.loadWordPieceVocab(spark, wpT) === v2)
    assert(TokenizerStore.loadWordPieceMerges(spark, wpT, Some(1L)) === m1)
    assert(TokenizerStore.loadWordPieceMerges(spark, wpT) === m2)

    // BPE: training order preserved (rank order is load-bearing)
    val bpeT = "tokstore_spec_bpe"
    CommitLog.clear(spark, bpeT)
    val (bm, _) = BpeTrain.train(docs, "text", rounds = 4)
    TokenizerStore.saveBpe(spark, bpeT, 7L, bm)
    assert(TokenizerStore.loadBpe(spark, bpeT) === bm)

    // unigram: usage + scores bit-exact
    val ugT = "tokstore_spec_ug"
    CommitLog.clear(spark, ugT)
    val uv = UnigramLm.train(docs, "text")
    TokenizerStore.saveUnigram(spark, ugT, 1L, uv)
    assert(TokenizerStore.loadUnigram(spark, ugT) === uv)

    // loud resolution: no version at or below the pin, or none at all
    intercept[IllegalArgumentException] {
      TokenizerStore.loadWordPieceVocab(spark, wpT, Some(0L))
    }
    val emptyT = "tokstore_spec_empty"
    CommitLog.clear(spark, emptyT)
    intercept[IllegalArgumentException] {
      TokenizerStore.loadBpe(spark, emptyT)
    }
  }
}
