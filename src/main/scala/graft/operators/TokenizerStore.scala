package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Persisted TOKENIZER-MODEL store — the trained-artifact lifecycle the
 * index families already have (ANN t40/t73, PQ t45/t74, BM25 t46/t77,
 * minhash t83/t87, fuzzy segments t82), closed for the three tokenizer
 * trainers (BPE [[BpeTrain]], unigram-LM [[UnigramLm]], WordPiece
 * [[WordPiece]]). A deployed pipeline never retrains per job: it
 * trains occasionally, PERSISTS the model, and every encode job loads
 * a pinned version — reproducibility demands that "the tokenizer as of
 * run X" stays answerable after retrains, exactly the as-of contract
 * the ANN index family gates.
 *
 * Mechanics: one [[CommitLog]] batch per VERSION (atomic staging +
 * rename — a crashed save is invisible, a replayed save is a no-op),
 * each batch holding the model as parquet rows in one shared schema:
 *
 *   (ord, left, right, n, score)
 *     - BPE merge:        (round, left, right, pairCount, null)
 *     - WordPiece merge:  (round, left, right, pairCount, scoreMicro)
 *     - WordPiece vocab:  (0, piece, null, null, null)
 *     - unigram piece:    (0, piece, null, usage, scoreMicro)
 *
 * Unlike the index families' batches, versions REPLACE each other (a
 * retrain is not an append), so readers never union: a load picks ONE
 * committed version — the latest at or below `asOf`, or the latest
 * overall — and reads only its directory. Models are vocab-sized
 * driver metadata (the ANN-centroid class), so loads collect.
 */
object TokenizerStore {

  val Schema: StructType = StructType(Seq(
    StructField("ord", IntegerType, nullable = false),
    StructField("left", StringType, nullable = false),
    StructField("right", StringType, nullable = true),
    StructField("n", LongType, nullable = true),
    StructField("score", LongType, nullable = true)))

  private def saveRows(spark: SparkSession, table: String, version: Long,
      rows: Seq[Row]): Boolean =
    CommitLog.commit(spark, table, version) { dir =>
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), Schema)
        .write.parquet(dir)
    }

  /** Committed model versions, ascending. */
  def versions(spark: SparkSession, table: String): Seq[Long] =
    CommitLog.committedBatches(spark, table)

  /** The version a load resolves: the latest committed version at or
    * below `asOf` (None = latest overall). Loud when nothing
    * qualifies — encoding under a missing model must not silently
    * fall back to a different one. */
  def resolveVersion(spark: SparkSession, table: String,
      asOf: Option[Long]): Long = {
    val vs = versions(spark, table)
    val eligible = asOf.map(v => vs.filter(_ <= v)).getOrElse(vs)
    require(eligible.nonEmpty,
      s"tokenizer store '$table' has no committed version" +
        asOf.map(v => s" at or below $v").getOrElse(""))
    eligible.max
  }

  private def loadRows(spark: SparkSession, table: String,
      asOf: Option[Long]): DataFrame = {
    val v = resolveVersion(spark, table, asOf)
    CommitLog.sideRowsFor(spark, table, Schema, Seq(v)).get
  }

  // ------------------------------------------------------------------
  // family wrappers
  // ------------------------------------------------------------------

  def saveBpe(spark: SparkSession, table: String, version: Long,
      merges: Seq[BpeTrain.Merge]): Boolean =
    saveRows(spark, table, version, merges.map(m =>
      Row(m.round, m.left, m.right, m.count, null)))

  def loadBpe(spark: SparkSession, table: String,
      asOf: Option[Long] = None): Seq[BpeTrain.Merge] =
    loadRows(spark, table, asOf).collect().toSeq
      .sortBy(_.getInt(0))
      .map(r => BpeTrain.Merge(r.getInt(0), r.getString(1),
        r.getString(2), r.getLong(3)))

  def saveUnigram(spark: SparkSession, table: String, version: Long,
      vocab: Seq[UnigramLm.Piece]): Boolean =
    saveRows(spark, table, version, vocab.map(p =>
      Row(0, p.piece, null, p.usage, p.scoreMicro)))

  def loadUnigram(spark: SparkSession, table: String,
      asOf: Option[Long] = None): Seq[UnigramLm.Piece] =
    loadRows(spark, table, asOf).collect().toSeq
      .map(r => UnigramLm.Piece(r.getString(1), r.getLong(3),
        r.getLong(4)))
      .sortWith((a, b) => BpeTrain.utf8Less(a.piece, b.piece))

  /** Persists the WordPiece model COMPLETE — the encode-time vocab
    * (ord 0) plus the learned merges (ord ≥ 1, auditable lineage of
    * every fused spelling). */
  def saveWordPiece(spark: SparkSession, table: String, version: Long,
      merges: Seq[WordPiece.Merge], vocab: Set[String]): Boolean =
    saveRows(spark, table, version,
      vocab.toSeq.sortWith(BpeTrain.utf8Less).map(p =>
        Row(0, p, null, null, null)) ++
        merges.map(m =>
          Row(m.round, m.left, m.right, m.pairCount, m.scoreMicro)))

  def loadWordPieceVocab(spark: SparkSession, table: String,
      asOf: Option[Long] = None): Set[String] =
    loadRows(spark, table, asOf).filter("ord = 0")
      .collect().map(_.getString(1)).toSet

  def loadWordPieceMerges(spark: SparkSession, table: String,
      asOf: Option[Long] = None): Seq[WordPiece.Merge] =
    loadRows(spark, table, asOf).filter("ord >= 1")
      .collect().toSeq.sortBy(_.getInt(0))
      .map(r => WordPiece.Merge(r.getInt(0), r.getString(1),
        r.getString(2), r.getLong(3), r.getLong(4)))

  /** A versioned KEYWORD DICTIONARY (the [[DictionaryMatch]] blocklist
    * as a governed artifact — policy lists change over time and a
    * tagging run must be pinnable to the list as of a given release):
    * keywords store as (0, keyword) rows, versions replace. */
  def saveDictionary(spark: SparkSession, table: String, version: Long,
      keywords: Seq[String]): Boolean =
    saveRows(spark, table, version,
      keywords.map(k => Row(0, k, null, null, null)))

  def loadDictionary(spark: SparkSession, table: String,
      asOf: Option[Long] = None): Seq[String] =
    loadRows(spark, table, asOf)
      .collect().map(_.getString(1)).toSeq
      .sortWith(BpeTrain.utf8Less)
}
