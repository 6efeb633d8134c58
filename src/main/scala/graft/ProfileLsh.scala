package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextDedup

/** Scratch profiler for the LSH pipeline stages (not part of the
  * contract surface). */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    val withToks = docs.select(col("doc_id").as("id"),
      TextDedup.tokens(col("text")).as("t")).persist()
    time("tokens materialize")(withToks.count())
    val withSh = withToks.select(col("id"), TextDedup.shingles(col("t"), 3).as("s"))
      .filter(size(col("s")) > 0).persist()
    time("shingles materialize")(withSh.count())

    val withBands = withSh.select(col("id"),
      TextDedup.bandHashes(TextDedup.minhashSignature(col("s"), 16), 4, 4).as("bands"))
      .persist()
    time("minhash+bands materialize")(withBands.count())

    val cand = TextDedup.candidatePairs(withBands, "id", "bands").persist()
    val nCand = time("candidate pairs")(cand.count())
    println(s"[profile] candidates: $nCand")

    val res = cand
      .join(withSh.select(col("id").as("id_a"), col("s").as("s_a")), Seq("id_a"))
      .join(withSh.select(col("id").as("id_b"), col("s").as("s_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), TextDedup.jaccard(col("s_a"), col("s_b")).as("j"))
      .filter(col("j") >= 0.5)
    println(s"[profile] verified pairs: ${time("verify")(res.count())}")

    // candidate-pair distribution: how hot are the buckets?
    val ex = withBands.select(col("id"), explode(col("bands")).as("bh"))
    ex.groupBy("bh").count().orderBy(desc("count")).show(5)
    spark.stop()
  }
}
