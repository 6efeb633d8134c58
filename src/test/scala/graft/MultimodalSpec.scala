package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  test("frameSample: stride cut, partial trailing frame, non-video and empty exclusion") {
    // payloads built to land exact frame boundaries at frameBytes = 4
    val assets = Seq(
      (1L, "video", "abcdefgh"),    // 2 full frames → stride 2 samples frame 0
      (2L, "video", "abcdefghij"),  // 2 full + partial "ij" → frames 0,2(partial)
      (3L, "image", "abcdefgh"),    // wrong modality: excluded
      (4L, "video", "")             // empty payload: excluded
    ).toDF("asset_id", "modality", "text")
      .select(col("asset_id"), col("modality"),
        encode(col("text"), "UTF-8").as("payload"))
    val r = Multimodal.frameSample(assets, frameBytes = 4, stride = 2)
      .orderBy("asset_id", "frame_idx")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2), x.getInt(3),
        x.getString(4)))
    def h(s: String) = {
      val hex = s.getBytes("UTF-8").map("%02x".format(_)).mkString
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(hex.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(r === Array(
      (1L, 8L, 0, 0, h("abcd")),
      (2L, 10L, 0, 0, h("abcd")),
      (2L, 10L, 1, 2, h("ij"))))   // trailing partial frame, shorter
  }

  private def bytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("pngDimensions parses the real IHDR layout; corrupt signatures fail closed") {
    // a REAL minimal PNG prefix (signature + IHDR for a 257x65 image —
    // widths crossing a byte boundary so endianness is actually tested)
    val good = "89504e470d0a1a0a" + "0000000d" + "49484452" +
      "00000101" + "00000041" + "0806000000"
    val badSig = "88504e470d0a1a0a" + "0000000d" + "49484452" +
      "00000101" + "00000041" + "0806000000"
    val notIhdr = "89504e470d0a1a0a" + "0000000d" + "49484453" +
      "00000101" + "00000041" + "0806000000"
    val truncated = "89504e470d0a1a0a" + "0000000d" + "4948"
    val df = Seq((1L, bytes(good)), (2L, bytes(badSig)),
      (3L, bytes(notIhdr)), (4L, bytes(truncated)))
      .toDF("id", "payload")
      .select(col("id"), Multimodal.pngDimensions(col("payload")).as("d"))
      .select(col("id"), col("d.valid"), col("d.width"), col("d.height"))
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getBoolean(1),
        Option(x.get(2)), Option(x.get(3))))
    assert(df === Array(
      (1L, true, Some(257), Some(65)),
      (2L, false, None, None),
      (3L, false, None, None),
      (4L, false, None, None)))
  }

  test("jpegDimensions walks real marker segments (APP0 + variable COM) to SOF; truncation and missing SOF fail closed") {
    def jfif(comPayload: Int, sof: String, w: Int, h: Int): String =
      "ffd8" +
        "ffe0" + "0010" + "4a46494600" + "00" * 9 + // real APP0/JFIF, len 16
        "fffe" + f"${comPayload + 2}%04x" + "00" * comPayload + // COM, varies
        sof + "000b" + "08" + f"$h%04x" + f"$w%04x" + "01" + "011100" +
        "ffd9"
    val df = Seq(
      (1L, bytes(jfif(3, "ffc0", 640, 480))),   // baseline SOF0
      (2L, bytes(jfif(11, "ffc2", 257, 65))),   // progressive SOF2, longer COM
      (3L, bytes("ffd8" + "ffe0" + "0010" + "4a46494600" + "00" * 9 + "ffd9")), // no SOF
      (4L, bytes("ffd9ffd8")),                   // wrong signature
      (5L, bytes(jfif(3, "ffc0", 640, 480).take(24))) // truncated mid-walk
    ).toDF("id", "payload")
      .select(col("id"), Multimodal.jpegDimensions(col("payload")).as("d"))
      .select(col("id"), col("d.valid"), col("d.width"), col("d.height"))
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getBoolean(1),
        Option(x.get(2)), Option(x.get(3))))
    assert(df === Array(
      (1L, true, Some(640), Some(480)),
      (2L, true, Some(257), Some(65)),
      (3L, false, None, None),
      (4L, false, None, None),
      (5L, false, None, None)))
  }

  test("jpegDimensions skips T.81 §B.1.1.2 fill bytes before any marker; over-long runs fail closed") {
    // fill bytes (extra 0xFF) may precede ANY marker: plant runs before
    // the COM marker, before SOF, and before both at once.
    def jfif(fillCom: Int, com: Int, fillSof: Int, w: Int, h: Int): String =
      "ffd8" +
        "ffe0" + "0010" + "4a46494600" + "00" * 9 +
        "ff" * fillCom + "fffe" + f"${com + 2}%04x" + "00" * com +
        "ff" * fillSof + "ffc0" + "000b" + "08" + f"$h%04x" + f"$w%04x" +
        "01" + "011100" + "ffd9"
    val df = Seq(
      (1L, bytes(jfif(0, 3, 1, 640, 480))),  // one fill before SOF
      (2L, bytes(jfif(2, 3, 0, 257, 65))),   // run of 2 before COM
      (3L, bytes(jfif(3, 5, 3, 33, 17))),    // runs before both
      (4L, bytes(jfif(0, 3, 70, 640, 480)))  // beyond the 64-byte window
    ).toDF("id", "payload")
      .select(col("id"), Multimodal.jpegDimensions(col("payload")).as("d"))
      .select(col("id"), col("d.valid"), col("d.width"), col("d.height"))
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getBoolean(1),
        Option(x.get(2)), Option(x.get(3))))
    assert(df === Array(
      (1L, true, Some(640), Some(480)),
      (2L, true, Some(257), Some(65)),
      (3L, true, Some(33), Some(17)),
      (4L, false, None, None)))
  }

  test("mp4FrameIndex: hand-built container parses exactly; unknown siblings stepped over; uniform stsz; malformed fails closed") {
    import spark.implicits._
    def h32(v: Long) = f"$v%08x"
    def box(tp: String, payloadHex: String): String = {
      val size = 8 + payloadHex.length / 2
      h32(size) + tp.getBytes("US-ASCII").map("%02x".format(_)).mkString +
        payloadHex
    }
    // 3 frames: sizes 4,6,8; stts runs (2×100)(1×300); timescale 600;
    // an UNKNOWN 'udta' sibling sits between mvhd and trak, and a
    // 'free' box precedes moov — both must be walked over, not choked on
    val frames = "aa" * 4 + "bb" * 6 + "cc" * 8
    val stts = box("stts", "00000000" + "00000002" +
      h32(2) + h32(100) + h32(1) + h32(300))
    val stsz = box("stsz", "00000000" + h32(0) + h32(3) +
      h32(4) + h32(6) + h32(8))
    def stcoFor(base: Long) = box("stco", "00000000" + "00000001" + h32(base))
    val mdhd = box("mdhd", "00000000" + "00000000" + "00000000" +
      h32(600) + h32(500) + "55c40000")
    def hdlrFor(handler: String) = box("hdlr", "00000000" + "00000000" +
      handler.getBytes("US-ASCII").map("%02x".format(_)).mkString +
      "00" * 12 + "00")
    val hdlr = hdlrFor("vide")
    def file(stcoBase: Long, uniformSz: Option[Long] = None): Array[Byte] = {
      val sz = uniformSz.map(u => box("stsz",
        "00000000" + h32(u) + h32(3))).getOrElse(stsz)
      val stbl = box("stbl", stts + sz + stcoFor(stcoBase))
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd + hdlr + minf)
      val trak = box("trak", mdia)
      val mvhd = box("mvhd", "00" * 100)
      val udta = box("udta", "00" * 5)
      val moov = box("moov", mvhd + udta + trak)
      val ftyp = box("ftyp", "69736f6d00000000")
      val free = box("free", "00" * 3)
      val hexStr = ftyp + free + moov + box("mdat", frames)
      hexStr.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    }
    // header length before mdat payload: computable from the parts
    val headerLen = file(0L).length - frames.length / 2
    val good = file(headerLen.toLong)
    val rows = Multimodal.mp4FrameIndex(
        Seq((1L, good)).toDF("asset_id", "payload"), stride = 1)
      .orderBy("frame_idx")
      .collect().map(r => (r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8)))
    // (frame_idx, ts_units, offset, size)
    assert(rows === Array(
      (0L, 0L, headerLen.toLong, 4L),
      (1L, 100L, headerLen + 4L, 6L),
      (2L, 200L, headerLen + 10L, 8L)))
    val head = Multimodal.mp4FrameIndex(
        Seq((1L, good)).toDF("asset_id", "payload"), stride = 1)
      .select("n_frames", "timescale", "duration").head
    assert((head.getLong(0), head.getLong(1), head.getLong(2)) ===
      ((3L, 600L, 500L)))
    // frame md5 = md5 of the sliced content's lowercase hex
    val md = Multimodal.mp4FrameIndex(
        Seq((1L, good)).toDF("asset_id", "payload"), stride = 2)
      .orderBy("frame_idx").collect().map(_.getString(9))
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("US-ASCII")).map("%02x".format(_)).mkString
    assert(md === Array(m("aa" * 4), m("cc" * 8)))
    // uniform sample_size branch (stsz fast field, no per-sample table)
    val uni = Multimodal.mp4FrameIndex(
        Seq((1L, file(100L, uniformSz = Some(6L))))
          .toDF("asset_id", "payload"), stride = 1)
      .orderBy("frame_idx").collect().map(r => (r.getLong(7), r.getLong(8)))
    assert(uni === Array((100L, 6L), (106L, 6L), (112L, 6L)))
    // malformed inputs emit NO rows: not ISO-BMFF, truncated, no stbl
    val junk: Array[Byte] = "not an mp4 at all".getBytes("US-ASCII")
    val truncated = good.take(40)
    assert(Multimodal.mp4FrameIndex(
      Seq((1L, junk), (2L, truncated)).toDF("asset_id", "payload"),
      stride = 1).count() === 0L)
  }

  test("mp4FrameIndex fail-closed guards: versioned tables, multi-chunk stco, non-video hdlr, largesize, deep sibling lists") {
    import spark.implicits._
    def h32(v: Long) = f"$v%08x"
    def box(tp: String, payloadHex: String): String = {
      val size = 8 + payloadHex.length / 2
      h32(size) + tp.getBytes("US-ASCII").map("%02x".format(_)).mkString +
        payloadHex
    }
    def bytes(hexStr: String): Array[Byte] =
      hexStr.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val frames = "aa" * 4 + "bb" * 6 + "cc" * 8
    val stts = box("stts", "00000000" + "00000002" +
      h32(2) + h32(100) + h32(1) + h32(300))
    val stsz = box("stsz", "00000000" + h32(0) + h32(3) +
      h32(4) + h32(6) + h32(8))
    val mdhd = box("mdhd", "00000000" + "00000000" + "00000000" +
      h32(600) + h32(500) + "55c40000")
    def hdlrFor(handler: String) = box("hdlr", "00000000" + "00000000" +
      handler.getBytes("US-ASCII").map("%02x".format(_)).mkString +
      "00" * 12 + "00")
    def fileHex(mdhdBox: String = mdhd, hdlrBox: String = hdlrFor("vide"),
        sttsBox: String = stts,
        stco: Long => String = b => box("stco",
          "00000000" + "00000001" + h32(b)),
        stblPrefix: String = "", moovSizeOverride: Option[String] = None,
        base: Long = 0L): String = {
      val stbl = box("stbl", stblPrefix + sttsBox + stsz + stco(base))
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhdBox + hdlrBox + minf)
      val trak = box("trak", mdia)
      val moov0 = box("moov", box("mvhd", "00" * 100) + trak)
      val moov = moovSizeOverride.map(_ + moov0.substring(8))
        .getOrElse(moov0)
      box("ftyp", "69736f6d00000000") + moov + box("mdat", frames)
    }
    def fileAt(mk: Long => String): Array[Byte] = {
      val headerLen = mk(0L).length / 2 - frames.length / 2
      bytes(mk(headerLen.toLong))
    }
    // baseline sanity: the helper's default layout parses (3 frames)
    val okFile = fileAt(b => fileHex(base = b))
    assert(Multimodal.mp4FrameIndex(
      Seq((1L, okFile)).toDF("asset_id", "payload"), stride = 1)
      .count() === 3L)
    // each guard drops the asset: version-1 mdhd (shifted offsets),
    // version-1 stts, multi-chunk stco (entry_count = 2), audio hdlr,
    // missing hdlr would have been dropped by the box filter itself,
    // and a largesize (size == 1) moov stalls the top-level walk
    val v1mdhd = fileAt(b => fileHex(mdhdBox = box("mdhd",
      "01000000" + "00" * 8 + "00000000" + h32(600) + h32(500) +
        "55c40000"), base = b))
    val v1stts = fileAt(b => fileHex(sttsBox = box("stts",
      "01000000" + "00000002" + h32(2) + h32(100) + h32(1) + h32(300)),
      base = b))
    val twoChunk = fileAt(b => fileHex(stco = bb => box("stco",
      "00000000" + "00000002" + h32(bb) + h32(bb + 4)), base = b))
    val audio = fileAt(b => fileHex(hdlrBox = hdlrFor("soun"), base = b))
    val largesize = fileAt(b => fileHex(
      moovSizeOverride = Some("00000001"), base = b))
    assert(Multimodal.mp4FrameIndex(
      Seq((1L, v1mdhd), (2L, v1stts), (3L, twoChunk), (4L, audio),
        (5L, largesize)).toDF("asset_id", "payload"), stride = 1)
      .count() === 0L)
    // a realistic stbl sibling list (stsd, ctts, stss, stsc, sgpd,
    // sbgp, and padding) BEFORE the three tables — past the old
    // maxBoxes = 8 bound, inside the new default of 32
    val deepPrefix = Seq("stsd", "ctts", "stss", "stsc", "sgpd", "sbgp",
      "free", "free", "free", "free").map(t => box(t, "00" * 8)).mkString
    val deep = fileAt(b => fileHex(stblPrefix = deepPrefix, base = b))
    val deepRows = Multimodal.mp4FrameIndex(
        Seq((1L, deep)).toDF("asset_id", "payload"), stride = 1)
      .orderBy("frame_idx").collect()
      .map(r => (r.getLong(5), r.getLong(6), r.getLong(8)))
    assert(deepRows === Array((0L, 0L, 4L), (1L, 100L, 6L),
      (2L, 200L, 8L)))
  }
}
