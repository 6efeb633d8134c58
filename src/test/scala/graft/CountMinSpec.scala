package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.CountMinAgg

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def estimates(values: Seq[String], depth: Int, width: Int,
      probes: Seq[String], parts: Int): Map[String, Long] =
    values.toDF("v").repartition(parts)
      .agg(CountMinAgg(col("v"), depth, width, probes).as("cm"))
      .select(explode(col("cm")).as("e"))
      .select(col("e.value"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("estimates never undercount; absent keys report only collision mass") {
    val rnd = new Random(5)
    // zipfian-ish: key k appears ~ 1000/k times
    val values = (1 to 50).flatMap(k => Seq.fill(1000 / k)(s"key$k"))
    val truth = values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val probes = Seq("key1", "key7", "key42", "never-seen")
    val est = estimates(rnd.shuffle(values), depth = 4, width = 64, probes, parts = 8)
    probes.foreach { p =>
      val t = truth.getOrElse(p, 0L)
      assert(est(p) >= t, s"$p: est ${est(p)} < true $t")
      // collision mass is bounded by the non-p rows landing in p's
      // buckets — at most the whole corpus, and for the heavy key1 the
      // estimate must stay within a width-fraction overshoot
      assert(est(p) <= values.size.toLong)
    }
    assert(est("key1") >= 1000L)
  }

  test("merge order cannot matter: counters are sums") {
    val rnd = new Random(11)
    val values = Seq.fill(5000)(s"v${rnd.nextInt(300)}")
    val probes = (0 until 20).map(i => s"v$i")
    val results = Seq(1, 7, 32).map(p =>
      estimates(values, depth = 4, width = 32, probes, parts = p))
    assert(results.distinct.size === 1,
      "estimates diverged across partitionings")
  }
}
