package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CanonicalHash

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary`
 * payloads with typed metadata, plus a batched decode/feature-extract
 * pass.
 *
 * The Spark-side machinery is real and tested — schema, partition-safe
 * batched iteration (`mapPartitions` over fixed-size batches, the JVM
 * analogue of Arrow-batch processing), typed Datasets in and out. The
 * DECODE STEP IS A STUB: this container has no image/audio codecs, so
 * [[decodeBatch]] derives a deterministic fake feature vector from the
 * payload's md5. Swap `decodeBatch` for a real codec (JNI/FFmpeg/etc.)
 * without touching any of the surrounding plumbing.
 *
 * Scale notes: payloads stay in executor memory one batch at a time
 * (batch size bounds peak usage per task — at 100 TB the inputs would be
 * binary-column parquet with `spark.sql.files.maxPartitionBytes` sized so
 * a partition of payloads fits alongside the codec's working set).
 */
object Multimodal {

  val BatchSize = 64

  final case class Asset(
      asset_id: Long, modality: String, payload: Array[Byte],
      width: Int, height: Int)

  final case class AssetFeatures(
      asset_id: Long, f0: Double, f1: Double, f2: Double, f3: Double)

  /** Synthesize a multimodal asset table from `documents` (the corpus has
    * no real media): payload = UTF-8 bytes, modality round-robins by id,
    * dimension metadata derived from the id. */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      (lit(64) + pmod(col("doc_id"), lit(8)) * 16).cast("int").as("width"),
      (lit(64) + pmod(col("doc_id"), lit(6)) * 16).cast("int").as("height"))

  /** Expression-side metadata extraction (no decode needed): byte size and
    * leading-bytes "magic" hex. */
  def withMetadata(assets: DataFrame): DataFrame =
    assets
      .withColumn("n_bytes", length(col("payload")).cast("bigint"))
      .withColumn("magic", lower(hex(col("payload"))).substr(1, 8))

  /** STUB decode: deterministic pseudo-features from the payload digest —
    * 4 doubles in [0, 1) from 8-hex-char windows of md5(payload). Replace
    * with a real codec for production use; signature and batch shape are
    * the contract. */
  private[operators] def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] =
    batch.map { a =>
      val hexStr = CanonicalHash.bytesToHexLower(
        MessageDigest.getInstance("MD5").digest(a.payload))
      def f(k: Int): Double =
        java.lang.Long.parseLong(hexStr.substring(k * 8, k * 8 + 8), 16)
          .toDouble / 4294967296.0
      AssetFeatures(a.asset_id, f(0), f(1), f(2), f(3))
    }

  /** Batched feature extraction over the asset table: partition-local,
    * fixed-size batches, typed in/out. */
  def extractFeatures(spark: SparkSession, assets: DataFrame): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions(
      _.grouped(BatchSize).flatMap(b => decodeBatch(b.toSeq)))
  }

  /** Full multimodal pipeline: metadata + decoded features, keyed by
    * asset. */
  def features(spark: SparkSession, docs: DataFrame): DataFrame = {
    val assets = assetsFromDocuments(docs)
    withMetadata(assets).drop("payload")
      .join(extractFeatures(spark, assets), Seq("asset_id"))
  }

  /**
   * Frame sampling over video payloads — the "every k-th frame" cut of
   * a video-curation pipeline, on the opaque-binary representation:
   * each payload is treated as a sequence of fixed-size frames
   * (`frameBytes` — a real pipeline reads the container's frame index;
   * the fixed stride is the STUB standing in for that parse, exactly
   * like [[decodeBatch]]'s fake features), and every `stride`-th frame
   * is sliced out map-side with `substring` on the binary column — no
   * decode, no UDF, whole-stage codegen end to end.
   *
   * The gated fingerprint is `md5(lower(hex(frame_bytes)))`: the hex
   * rendering is the cross-engine byte currency (DuckDB's md5/substr
   * are VARCHAR-only, and hex-slicing ≡ byte-slicing at 2 chars per
   * byte), binary-exact for ANY payload bytes. The trailing partial
   * frame is kept, shorter — both engines slice past-end the same way.
   */
  def frameSample(assets: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0, "need frameBytes > 0 and stride > 0")
    assets.filter(col("modality") === "video")
      .select(col("asset_id"), col("payload"),
        length(col("payload")).cast("long").as("n_bytes"))
      .filter(col("n_bytes") > 0)
      .select(col("asset_id"), col("n_bytes"), col("payload"),
        posexplode(sequence(lit(0),
          expr(s"CAST((n_bytes - 1) div $frameBytes AS INT)"),
          lit(stride))).as(Seq("sample_idx", "frame_idx")))
      .select(col("asset_id"), col("n_bytes"),
        col("sample_idx").cast("int").as("sample_idx"), col("frame_idx"),
        md5(lower(hex(col("payload").substr(
          col("frame_idx") * frameBytes + 1, lit(frameBytes)))))
          .as("frame_md5"))
  }
}
