package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities (DESIGN.md "Configuration posture"). AQE's
 * skew-join splitting handles sort-merge joins automatically; explicit
 * salting remains necessary for (a) skewed AGGREGATIONS and (b) joins
 * where one side must be replicated (broadcast-infeasible dimension with
 * a hot key).
 */
object Skew {

  /**
   * Salted two-phase aggregation: groupBy a hot key without funneling a
   * hot key's rows into one task. Phase 1 groups on (key, salt) —
   * spreading each key over `buckets` tasks with map-side partial
   * aggregation — phase 2 merges the per-salt partials. `aggs` must be
   * re-aggregable (sum/count/min/max style).
   *
   * Deterministic: the salt is derived from a hash of `saltBy` (a
   * distinct-per-row column, e.g. the row id), not from rand().
   */
  def saltedAgg(df: DataFrame, key: Column, saltBy: Column, buckets: Int,
      partialAggs: Seq[Column], mergeAggs: Seq[Column],
      keyName: String = "key"): DataFrame = {
    // Temp names must not collide with input columns (or with an agg
    // output that happens to be named "key") — uniquify against both.
    val taken = df.columns.toSet + keyName
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
        .find(!taken.contains(_)).get
    val saltCol = fresh("__salt")
    val keyCol = fresh("__key")
    df.withColumn(saltCol, pmod(xxhash64(saltBy), lit(buckets)))
      .groupBy(key.as(keyCol), col(saltCol))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col(keyCol))
      .agg(mergeAggs.head, mergeAggs.tail: _*)
      .withColumnRenamed(keyCol, keyName)
  }

  /**
   * Salted join: big (skewed) side gets a deterministic salt in
   * [0, buckets); small side is replicated `buckets` times with every
   * salt value. The join key becomes (key, salt) — a hot key's rows
   * spread over `buckets` reducers. Use when the small side is too big
   * to broadcast yet small enough to replicate.
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int, saltBy: Column): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(saltBy), lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
