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
}
