package graft

import org.apache.spark.sql.SparkSession

/**
 * BPE training-path audit: times [[operators.BpeTrain.train]]'s local
 * fast path (word table collected once, merge rounds on the driver)
 * against the distributed fallback (one pair-count barrier + rewrite
 * per round) at a deep merge schedule, asserts the two rule sequences
 * are identical, and prints ONE JSON line with per-round costs — the
 * number that decides whether a ~30k-merge production tokenizer is
 * minutes or hours.
 *
 * Usage: runMain graft.BpeAudit <sfDir> [rounds] [distRounds]
 * `distRounds` caps the distributed timing run (its cost is linear in
 * rounds — extrapolate); the local path always runs the full `rounds`.
 */
object BpeAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val rounds = args.lift(1).map(_.toInt).getOrElse(64)
    val distRounds = args.lift(2).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .appName("graft-bpe-audit")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
    docs.count()
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime; val r = f; (r, (System.nanoTime - t0) / 1e9)
    }
    operators.Staging.scoped {
      // warm the word-table pass once so both timings start from cache
      val (_, _) = operators.BpeTrain.train(docs, "text", rounds = 1)
      val (local, tLocal) = time(
        operators.BpeTrain.train(docs, "text", rounds))
      val (dist, tDist) = time(
        operators.BpeTrain.train(docs, "text", distRounds, maxLocalWords = 0L))
      val equalPrefix = local._1.take(distRounds) == dist._1
      // scalastyle:off println
      println(s"""{"metric":"bpe_rounds","sf":"$dir","rounds":$rounds,""" +
        s""""dist_rounds":$distRounds,"local_sec":$tLocal,""" +
        s""""dist_sec":$tDist,""" +
        s""""local_per_round_sec":${tLocal / rounds},""" +
        s""""dist_per_round_sec":${tDist / distRounds},""" +
        s""""merges_local":${local._1.size},"merges_dist":${dist._1.size},""" +
        s""""shared_prefix_equal":$equalPrefix}""")
      // scalastyle:on println
    }
    spark.stop()
  }
}
