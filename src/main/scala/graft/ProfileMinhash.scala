package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TextDedup

/** Dev probe: is a chunked minhash (k elements from k/4 md5 calls, 32-bit
  * hex chunks) actually faster than k independent md5 minhashes?
  *
  * MEASURED (sf0.1, local[32], 2026-08-12): NO — chunked 4.6 s vs
  * current 2.7–3.2 s. Catalyst does not common-subexpression-eliminate
  * the shared md5 inside a lambda body, so the "4 md5s" shape still
  * evaluates 16, and the element-wise `aggregate ∘ zip_with` min-fold
  * allocates two arrays per shingle on top. The 16-seeded-md5
  * string-min form stays ([[TextDedup.minhashSignature]]). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val withSh = TextDedup.shingleSets(docs, "doc_id", "text", 3).persist()
    withSh.count()

    def timeIt(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val k = 16
    // A: current — k seeded md5s, lexicographic min of hex strings
    timeIt("16x md5 string-min") {
      withSh.select(col("id"), TextDedup.minhashSignature(col("s"), k).as("sig"))
        .write.format("noop").mode("overwrite").save()
    }
    // B: chunked — 4 md5s, each split into 4x 32-bit chunks, numeric min
    val chunked = {
      val chunks = transform(col("s"), s =>
        array((0 until k).map { i =>
          val hex = md5(concat(lit(s"${i / 4}:"), s))
          conv(substring(hex, (i % 4) * 8 + 1, 8), 16, 10).cast(LongType)
        }: _*))
      val zero = array((0 until k).map(_ => lit(Long.MaxValue)): _*)
      aggregate(chunks, zero, (acc, x) => zip_with(acc, x, (a, b) => least(a, b)))
    }
    timeIt("4x md5 chunked long-min") {
      withSh.select(col("id"), chunked.as("sig"))
        .write.format("noop").mode("overwrite").save()
    }
    // repeat to control for warmup
    timeIt("16x md5 string-min (2nd)") {
      withSh.select(col("id"), TextDedup.minhashSignature(col("s"), k).as("sig"))
        .write.format("noop").mode("overwrite").save()
    }
    timeIt("4x md5 chunked long-min (2nd)") {
      withSh.select(col("id"), chunked.as("sig"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
