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
   * (`frameBytes` — the cut for RAW/headerless payloads; a container
   * with a real frame index goes through [[mp4FrameIndex]]'s box walk
   * instead), and every `stride`-th frame
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

  // -------------------------------------------------------------------
  // REAL ISO-BMFF (MP4) frame-index parsing — the container walk the
  // m2 fixed-stride stub stood in for (no codec needed: the FRAME
  // INDEX is pure box layout, ISO/IEC 14496-12)
  // -------------------------------------------------------------------

  private def be4(bin: org.apache.spark.sql.Column,
      pos: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(hex(bin.substr(pos, lit(4))), 16, 10).cast("long")

  private def boxTypeHex(t: String): String =
    t.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      .map("%02x".format(_)).mkString

  /** 1-based offset of the first `tp` box among the siblings in
    * [start, end): a bounded walk over `size(4 BE) type(4)` headers,
    * advancing by each box's self-declared size. NULL when absent,
    * truncated, or malformed (size < 8 / overrunning the range stalls
    * the walk — the jpeg-walk fall-through discipline). A 64-bit
    * `largesize` header (size == 1) or a to-end-of-file box
    * (size == 0) also stalls the walk, INCLUDING on the target type:
    * the fixed-offset field reads downstream assume the compact
    * header, so these parse fail-closed rather than silently wrong.
    * NULL inputs propagate to a NULL result through the fold's null
    * comparisons. `maxBoxes` bounds the SIBLING count at each level
    * (a real `stbl` commonly holds 8–10 children — stsd, stts, ctts,
    * stss, stsc, stsz, stco, sgpd, sbgp… — so the default is sized
    * past that, not at it). */
  private def findBox(bin: org.apache.spark.sql.Column,
      start: org.apache.spark.sql.Column,
      end: org.apache.spark.sql.Column, tp: String,
      maxBoxes: Int): org.apache.spark.sql.Column =
    ExprUtil.bound(aggregate(sequence(lit(1), lit(maxBoxes)),
      struct(start.cast("long").as("pos"),
        lit(null).cast("long").as("hit")),
      (st, _) => ExprUtil.bound(st.getField("pos")) { pos =>
        val hit = st.getField("hit")
        val done = hit.isNotNull || pos + 8L > end
        ExprUtil.bound(be4(bin, pos)) { sz =>
          when(done, st)
            .otherwise(when(
              sz >= 8L &&
                lower(hex(bin.substr(pos + 4L, lit(4)))) ===
                lit(boxTypeHex(tp)),
              struct(pos.as("pos"), pos.as("hit")))
              .otherwise(when(sz >= 8L && pos + sz <= end,
                struct((pos + sz).as("pos"), hit.as("hit")))
                .otherwise(st)))
        }
      }))(_.getField("hit"))

  /**
   * The REAL video frame index (ISO/IEC 14496-12 sample tables) —
   * retiring [[frameSample]]'s fixed-stride stand-in the way round
   * 14's header parsers retired the image stub: walk
   * `moov → trak → mdia → minf → stbl` through the actual
   * variable-offset box layout (every hop is a size-advancing sibling
   * walk — a `free` box or any unknown sibling is stepped over
   * byte-exactly), then read the three sample tables —
   * `stts` (time-to-sample run pairs → per-frame timestamps in media
   * timescale units), `stsz` (per-sample sizes, or the uniform
   * `sample_size` fast field), `stco` (chunk offset; single-chunk
   * layout) — plus `mdhd`'s timescale/duration. Every `stride`-th
   * frame emits `(frame_idx, ts_units, offset, size, frame_md5)` with
   * the frame BYTES sliced at the parsed offset — the md5 proves the
   * offset/size arithmetic against the planted content, not just the
   * header fields.
   *
   * Everything is Catalyst expressions over the binary column (hex
   * reads + bounded folds — whole-stage-codegen class, no UDF, no
   * decode); per-frame offset is a prefix-sum fold over the parsed
   * size table (frame counts are per-asset small; a long-video
   * variant would explode the size table once and window-sum it).
   * Assets whose walk fails any hop (not ISO-BMFF, truncated,
   * missing tables) emit NO rows — the loud-skip contract — and so do
   * assets whose layout the fixed-offset reads below would misparse:
   * version-1 (64-bit) mdhd or sample tables, multi-chunk `stco`
   * (entry_count != 1 — the offset prefix-sum is single-chunk
   * arithmetic), a first trak whose `hdlr` handler is not `vide`
   * (audio-first files would otherwise "parse" the wrong track), a
   * missing `hdlr`, and 64-bit `largesize` / to-EOF box headers
   * (which stall the sibling walk). Round 18 closes these as
   * validation guards rather than documented assumptions.
   */
  def mp4FrameIndex(assets: DataFrame, stride: Int,
      maxBoxes: Int = 32): DataFrame = {
    require(stride > 0, "need stride > 0")
    val bin = col("payload")
    val fileEnd = length(bin).cast("long") + 1L
    def inBox(pos: org.apache.spark.sql.Column, tp: String) =
      findBox(bin, pos + 8L, pos + be4(bin, pos), tp, maxBoxes)
    val hdr = ExprUtil.bound(
        findBox(bin, lit(1L), fileEnd, "moov", maxBoxes)) { moov =>
      ExprUtil.bound(inBox(moov, "trak")) { trak =>
        ExprUtil.bound(inBox(trak, "mdia")) { mdia =>
          ExprUtil.bound(inBox(mdia, "minf")) { minf =>
            ExprUtil.bound(inBox(minf, "stbl")) { stbl =>
              struct(inBox(mdia, "mdhd").as("mdhd"),
                inBox(mdia, "hdlr").as("hdlr"),
                inBox(stbl, "stts").as("stts"),
                inBox(stbl, "stsz").as("stsz"),
                inBox(stbl, "stco").as("stco"))
            }}}}}
    val withHdr = assets.select(col("asset_id"), bin.as("payload"))
      .select(col("asset_id"), col("payload"), hdr.as("hdr"))
      .filter(col("hdr.mdhd").isNotNull && col("hdr.hdlr").isNotNull &&
        col("hdr.stts").isNotNull &&
        col("hdr.stsz").isNotNull && col("hdr.stco").isNotNull)
      // Undetected-assumption guards (fail-closed, not silently wrong):
      //   - version/flags must be 0 for every table read at fixed
      //     offsets — a version-1 mdhd (64-bit times) or version-1
      //     sample table would shift every field this parser reads;
      //   - stco entry_count must be 1 — the offset prefix-sum below
      //     is single-chunk arithmetic, and a multi-chunk file would
      //     "parse" with offsets summed from chunk 0 only;
      //   - the walked trak's hdlr handler_type must be 'vide' — the
      //     walk takes the FIRST trak, which in a real file may be the
      //     audio track.
      .filter(
        be4(bin, col("hdr.mdhd") + 8L) === 0L &&
        be4(bin, col("hdr.stts") + 8L) === 0L &&
        be4(bin, col("hdr.stsz") + 8L) === 0L &&
        be4(bin, col("hdr.stco") + 8L) === 0L &&
        be4(bin, col("hdr.stco") + 12L) === 1L &&
        lower(hex(bin.substr(col("hdr.hdlr") + 16L, lit(4)))) ===
          lit(boxTypeHex("vide")))
    // scalar header fields staged in their own projection
    val scalars = withHdr.select(col("asset_id"), col("payload"),
      col("hdr.stts").as("stts"), col("hdr.stsz").as("stsz"),
      be4(bin, col("hdr.mdhd") + 20L).as("timescale"),
      be4(bin, col("hdr.mdhd") + 24L).as("duration"),
      be4(bin, col("hdr.stsz") + 12L).as("uniform"),
      be4(bin, col("hdr.stsz") + 16L).as("n_frames"),
      be4(bin, col("hdr.stts") + 12L).as("stts_entries"),
      be4(bin, col("hdr.stco") + 16L).as("stco_base"))
    def sizeOf(i: org.apache.spark.sql.Column) =
      when(col("uniform") > 0L, col("uniform"))
        .otherwise(be4(bin, col("stsz") + 20L + lit(4L) * i))
    val perFrame = scalars
      .select(col("*"), posexplode(sequence(lit(0L),
        col("n_frames") - 1L, lit(stride.toLong)))
        .as(Seq("sample_idx", "frame_idx")))
      .select(col("asset_id"), col("payload"), col("n_frames"),
        col("timescale"), col("duration"),
        col("sample_idx").cast("int").as("sample_idx"), col("frame_idx"),
        // guard: Spark's sequence counts DOWN on a negative span
        when(col("frame_idx") === 0L, lit(0L))
          .otherwise(aggregate(
            sequence(lit(0L), col("frame_idx") - 1L),
            lit(0L), (acc, j) => acc + sizeOf(j)))
          .plus(col("stco_base")).as("offset"),
        sizeOf(col("frame_idx")).as("size"),
        ExprUtil.bound(aggregate(
            sequence(lit(0L), col("stts_entries") - 1L),
            struct(col("frame_idx").as("rem"), lit(0L).as("ts")),
            (st, e) => ExprUtil.bound(
                least(st.getField("rem"),
                  be4(bin, col("stts") + 16L + lit(8L) * e))) { take =>
              struct((st.getField("rem") - take).as("rem"),
                (st.getField("ts") + take *
                  be4(bin, col("stts") + 20L + lit(8L) * e)).as("ts"))
            }))(_.getField("ts")).as("ts_units"))
    perFrame.select(col("asset_id"), col("n_frames"), col("timescale"),
      col("duration"), col("sample_idx"), col("frame_idx"),
      col("ts_units"), col("offset"), col("size"),
      md5(lower(hex(col("payload").substr(col("offset") + 1L,
        col("size"))))).as("frame_md5"))
  }

  // -------------------------------------------------------------------
  // REAL container-header parsing (no codec needed — pure byte layout)
  // -------------------------------------------------------------------

  /** PNG dimensions from the REAL container layout (ISO/IEC 15948 /
    * RFC 2083): the 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then
    * the IHDR chunk whose type sits at bytes 13–16 and whose first two
    * fields are width and height as 4-byte big-endian at offsets 17
    * and 21 (1-based). Pure Catalyst binary slicing + hex→int — no
    * codec, whole-stage codegen; unlike [[decodeBatch]]'s feature stub,
    * THIS parse is the real format. Returns
    * `struct(valid, width, height)`; a payload failing the signature
    * or IHDR check yields (false, NULL, NULL). */
  def pngDimensions(bin: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val sigOk = length(bin) >= 24 &&
      lower(hex(substring(bin, 1, 8))) === lit("89504e470d0a1a0a") &&
      lower(hex(substring(bin, 13, 4))) === lit("49484452") // "IHDR"
    def be4(pos: Int) = conv(hex(substring(bin, pos, 4)), 16, 10).cast("int")
    struct(sigOk.as("valid"),
      when(sigOk, be4(17)).as("width"),
      when(sigOk, be4(21)).as("height"))
  }

  /** JPEG dimensions by the REAL marker-segment WALK (ITU-T T.81): from
    * the SOI (`FF D8`), each segment is `FF <marker>` + a 2-byte
    * big-endian length that counts itself; the walk advances by
    * `2 + len` until it reaches a start-of-frame marker (SOF0/1/2 —
    * baseline, extended sequential, progressive), whose payload is
    * `precision(1) height(2) width(2) …`. A bounded expression fold
    * (`maxSegments` iterations) over dynamic `substr` positions — this
    * is a genuine variable-offset parse, NOT a fixed-stride stub:
    * APP/COM segments of any length are stepped over byte-exactly.
    * Returns `struct(valid, width, height)`; non-JPEG signatures,
    * truncated files, or no SOF within `maxSegments` yield
    * (false, NULL, NULL). Optional 0xFF fill bytes before a marker
    * (T.81 §B.1.1.2: "any marker may optionally be preceded by any
    * number of fill bytes") ARE skipped: each step counts the
    * leading FF run in a 64-byte window (one let-bound regexp over
    * the hex rendering, not per-reference) and reads the marker as
    * the run's LAST FF plus the following byte — runs longer than
    * 62 fill bytes (beyond any real writer) parse as invalid. */
  def jpegDimensions(bin: org.apache.spark.sql.Column,
      maxSegments: Int = 16): org.apache.spark.sql.Column = {
    val sigOk = length(bin) >= 4 &&
      lower(hex(substring(bin, 1, 2))) === lit("ffd8")
    val init = struct(lit(3).as("pos"),
      lit(null).cast("int").as("w"), lit(null).cast("int").as("h"))
    val walked = aggregate(sequence(lit(1), lit(maxSegments)), init,
      (st, _) => ExprUtil.bound(st.getField("pos")) { pos =>
        // fill-byte run length at pos (in BYTES): count of leading
        // "ff" pairs in the hex of a 64-byte window; the marker is
        // the run's last FF + the next byte, so its position is
        // pos + max(fills-1, 0) (fills = 1 ⇒ no fill bytes, today's
        // layout; fills = 0 ⇒ malformed, unchanged fall-through).
        val fills = (length(regexp_extract(
          lower(hex(substr(bin, pos, lit(64)))), "^((?:ff)*)", 1))
          .cast("int") / 2).cast("int")
        ExprUtil.bound(pos + greatest(fills - 1, lit(0))) { posM =>
          val done = st.getField("w").isNotNull || posM + 8 > length(bin)
          val mk = lower(hex(substr(bin, posM, lit(2))))
          val isSof = mk.isin("ffc0", "ffc1", "ffc2")
          def be2(off: Int) =
            conv(hex(substr(bin, posM + off, lit(2))), 16, 10).cast("int")
          when(done, st)
            .otherwise(when(isSof,
              struct(posM.as("pos"), be2(7).as("w"), be2(5).as("h")))
              .otherwise(struct((posM + 2 + be2(2)).as("pos"),
                st.getField("w"), st.getField("h"))))
        }
      })
    ExprUtil.bound(walked) { r =>
      val ok = sigOk && r.getField("w").isNotNull
      struct(ok.as("valid"),
        when(ok, r.getField("w")).as("width"),
        when(ok, r.getField("h")).as("height"))
    }
  }
}
