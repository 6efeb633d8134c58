package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key
  private lazy val skewed = spark.range(0, 100000)
    .select(col("id"),
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
      (col("id") % 1000).cast("double").as("v"))

  test("saltedAgg equals the direct groupBy") {
    val direct = skewed.groupBy(col("k").as("key"))
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(20,2)")).as("s"))
    val salted = Skew.saltedAgg(skewed, col("k"), col("id"), buckets = 8,
      partialAggs = Seq(count(lit(1)).as("pn"), sum(col("v").cast("decimal(20,2)")).as("ps")),
      mergeAggs = Seq(sum("pn").as("n"), sum("ps").as("s")))
    assert(direct.count() === salted.count())
    assert(direct.except(salted).count() === 0L)
    assert(salted.except(direct).count() === 0L)
  }

  test("saltedJoin equals the direct join and spreads the hot key") {
    val dim = spark.range(0, 100).select(col("id").as("k"),
      concat(lit("dim"), col("id")).as("name"))
    val direct = skewed.join(dim, "k").select("id", "k", "name")
    val salted = Skew.saltedJoin(skewed, dim, "k", buckets = 8, saltBy = col("id"))
      .select("id", "k", "name")
    assert(direct.count() === salted.count())
    assert(direct.except(salted).count() === 0L)
    assert(salted.except(direct).count() === 0L)
  }
}
