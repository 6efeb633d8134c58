package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Dataset profiling and constraint validation — the "check the corpus
 * before you train on it / serve it" step (the role Deequ-style
 * libraries play), run as plain aggregations so the whole family stays
 * inside whole-stage codegen.
 *
 * The reference's consistency checker (MIS:1286–1331) validates a COPY
 * against its source; this family validates a table against DECLARED
 * expectations — the complementary half a pipeline needs when there is
 * no source of truth to diff against.
 *
 * Scale notes (100 TB):
 *   - [[profile]] is ONE aggregation job. With `exact = true` the
 *     multi-column `count(DISTINCT)` goes through Spark's Expand (input
 *     replicated once per distinct-agg) — fine to a few columns, the
 *     gated form; `exact = false` swaps every cardinality for
 *     `approx_count_distinct` (HLL++, no Expand, one combinable sketch
 *     per column — the 100 TB default; QualitySpec bounds its error).
 *   - Each constraint check is a COUNT-shaped aggregate (map-side
 *     combinable) or a LEFT ANTI join (broadcast when the parent's key
 *     set fits, shuffle-hash keyed on the FK otherwise). Violations are
 *     COUNTED, not collected — diagnostics sampling is [[ConsistencyCheck]]'s
 *     top-k machinery, deliberately not duplicated here.
 */
object Quality {

  /** Per-column profile: rows, nulls, cardinality, numeric min/max —
    * one row per profiled column, one pass over the data. Non-numeric
    * columns report NULL min/max (cross-engine string rendering of
    * doubles/timestamps is not portable; numeric min/max are existing
    * values, never sums, so they compare exactly). */
  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true, rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    def isNumeric(c: String): Boolean =
      schema(c).dataType.isInstanceOf[NumericType]
    val cardinality: String => org.apache.spark.sql.Column =
      if (exact) c => count_distinct(col(c))
      else c => approx_count_distinct(col(c), rsd)
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"), cardinality(c).as(s"${c}__nd")) ++
        (if (isNumeric(c))
          Seq(min(col(c)).cast(DoubleType).as(s"${c}__min"),
            max(col(c)).cast(DoubleType).as(s"${c}__max"))
        else Nil)
    }
    val row = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val entries = cols.map { c =>
      val (mn, mx) =
        if (isNumeric(c)) (col(s"${c}__min"), col(s"${c}__max"))
        else (lit(null).cast(DoubleType), lit(null).cast(DoubleType))
      struct(lit(c).as("col_name"), col("__total").as("n_rows"),
        (col("__total") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        mn.as("min_value"), mx.as("max_value"))
    }
    row.select(inline(array(entries: _*)))
  }

  private def result(name: String, violations: org.apache.spark.sql.Column,
      df: DataFrame): DataFrame =
    df.agg(violations.cast(LongType).as("violations"))
      .select(lit(name).as("check_name"), col("violations"))

  /** Key uniqueness: rows beyond one per distinct key combination. */
  def uniqueKey(df: DataFrame, cols: Seq[String], name: String): DataFrame =
    result(name,
      count(lit(1)) - count_distinct(struct(cols.map(col): _*)), df)

  /** Completeness: NULLs in a required column. */
  def notNull(df: DataFrame, c: String, name: String): DataFrame =
    result(name, count(lit(1)) - count(col(c)), df)

  /** Domain: non-null values outside the accepted set. */
  def inSet(df: DataFrame, c: String, values: Seq[String],
      name: String): DataFrame =
    result(name,
      sum(when(col(c).isNotNull && !col(c).isin(values: _*), 1L)
        .otherwise(0L)), df)

  /** Bound: non-null values below `lo` (one-sided; compose for ranges). */
  def atLeast(df: DataFrame, c: String, lo: Double, name: String): DataFrame =
    result(name,
      sum(when(col(c) < lo, 1L).otherwise(0L)), df)

  /** Fixed-width HISTOGRAM of a numeric column: `bins` equal-width
    * buckets spanning [min, max], the max landing in the last bucket.
    * Two scans by construction (bounds, then binning) with the bounds
    * row broadcast into the binning pass — no driver action in the
    * plan; empty buckets emit no row. Every arithmetic step (width,
    * bucket index, edges) is a fixed IEEE expression over the exact
    * min/max, so both engines compute identical buckets. A degenerate
    * column (min == max) collapses into bucket 0. */
  def histogram(df: DataFrame, c: String, bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    val stats = df.agg(min(col(c)).cast(DoubleType).as("mn"),
      max(col(c)).cast(DoubleType).as("mx"))
    df.select(col(c).cast(DoubleType).as("v")).filter(col("v").isNotNull)
      .crossJoin(broadcast(stats))
      .withColumn("w", (col("mx") - col("mn")) / lit(bins))
      .withColumn("bin",
        when(col("w") === 0, lit(0))
          .otherwise(least(lit(bins - 1),
            floor((col("v") - col("mn")) / col("w")).cast("int"))))
      .groupBy("bin", "mn", "w")
      .agg(count(lit(1)).as("cnt"))
      .select(col("bin"),
        (col("mn") + col("bin") * col("w")).as("lo"),
        (col("mn") + (col("bin") + 1) * col("w")).as("hi"),
        col("cnt"))
  }

  /** Heavy hitters: the `k` most frequent values of a column, ties
    * broken by value. The ranking window runs over the AGGREGATED
    * value table (cardinality-sized, not corpus-sized); for columns
    * whose distinct count itself explodes, the at-scale swap is a
    * sketch (Misra–Gries / count-min) feeding the same output shape. */
  def topValues(df: DataFrame, c: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val counts = df.filter(col(c).isNotNull)
      .groupBy(col(c).as("value")).agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("value"))
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** The at-scale twin of [[topValues]]: Misra–Gries sketch
    * ([[graft.functions.MisraGriesAgg]]) — fixed `numCounters` memory per
    * partial aggregate instead of a value-domain group-by, with the
    * mergeable-summaries guarantees (every value with frequency
    * > N/(numCounters+1) survives; counts are lower bounds short by at
    * most N/(numCounters+1)). Spec-gated on the guarantees
    * (HeavyHittersSpec), not oracle equality — counter values depend on
    * partition order. Returns (value, count_lb, rank). */
  def topValuesApprox(df: DataFrame, c: String, k: Int,
      numCounters: Int): DataFrame = {
    require(k > 0 && numCounters >= k,
      "need numCounters >= k > 0: the sketch can only report what it retains")
    df.filter(col(c).isNotNull)
      .agg(graft.functions.MisraGriesAgg(col(c), numCounters).as("hh"))
      .select(posexplode(col("hh")).as(Seq("idx", "e")))
      .filter(col("idx") < k)
      .select(col("e.value").as("value"), col("e.count_lb").as("count_lb"),
        (col("idx") + 1).cast("int").as("rank"))
  }

  /** GROUPED [[topValuesApprox]]: one Misra–Gries sketch PER group key —
    * the per-key heavy-hitter report real profiling asks for (top values
    * per column per source/partition/tenant). [[graft.functions
    * .MisraGriesAgg]] is an ordinary aggregate expression, so under
    * `groupBy` Spark runs it with map-side partial sketches merged per
    * key: state is `numCounters` counters × |keys| — never a
    * (key × value-domain) group-by. The mergeable-summaries guarantees
    * hold PER GROUP with N = that group's non-null rows (QualitySpec
    * gates this over grouped multi-partition merges); under capacity it
    * degenerates to exact per-key counting, which is what p8 gates
    * against the DuckDB oracle. Returns (key, value, count_lb, rank),
    * rank partitioned by key. */
  def topValuesApproxByKey(df: DataFrame, key: String, c: String, k: Int,
      numCounters: Int): DataFrame = {
    require(k > 0 && numCounters >= k,
      "need numCounters >= k > 0: the sketch can only report what it retains")
    df.filter(col(c).isNotNull)
      .groupBy(col(key))
      .agg(graft.functions.MisraGriesAgg(col(c), numCounters).as("hh"))
      .select(col(key), posexplode(col("hh")).as(Seq("idx", "e")))
      .filter(col("idx") < k)
      .select(col(key), col("e.value").as("value"),
        col("e.count_lb").as("count_lb"),
        (col("idx") + 1).cast("int").as("rank"))
  }

  /** Per-key quantile profile via the mergeable sketch
    * ([[graft.functions.QuantileSketchAgg]]) — the at-scale twin of an
    * exact per-key percentile (which needs a per-key sort of the value
    * multiset). One fixed-memory sketch per group, map-side combinable;
    * under capacity (group rows ≤ `capacity`) it provably degenerates
    * to the exact rank-`ceil(q·n)` percentile, which is what `p9` gates
    * against the explicit-rank DuckDB oracle; over-capacity rank-error
    * and weight-invariant guarantees are QuantileSketchSpec's. Returns
    * (key, p, value) rows. */
  def quantilesApproxByKey(df: DataFrame, key: String, c: String,
      probabilities: Seq[Double], capacity: Int): DataFrame =
    df.filter(col(c).isNotNull)
      .groupBy(col(key))
      .agg(graft.functions.QuantileSketchAgg(col(c).cast("double"),
        capacity, probabilities).as("qs"))
      .select(col(key), explode(col("qs")).as("e"))
      .select(col(key), col("e.p").as("p"), col("e.value").as("value"))

  /** Watchlist frequency estimates via the Count-Min sketch
    * ([[graft.functions.CountMinAgg]]): depth×width longs of fixed
    * state however high the column's cardinality, estimates never below
    * the true count. Unlike the MG/quantile twins this is exactly
    * oracle-gateable at ANY capacity — counters are order-independent
    * sums — which is what `p10` does. Returns (value, est) in probe
    * order. */
  def frequencyEstimates(df: DataFrame, c: String, depth: Int, width: Int,
      probes: Seq[String]): DataFrame =
    df.filter(col(c).isNotNull)
      .agg(graft.functions.CountMinAgg(col(c), depth, width, probes)
        .as("cm"))
      .select(explode(col("cm")).as("e"))
      .select(col("e.value").as("value"), col("e.est").as("est"))

  /** Grouped HyperLogLog distinct-count sketch
    * ([[graft.functions.HllAgg]]): one `2^p`-byte register array per
    * group however many rows, map-side combined like any aggregate — the
    * shuffle carries `|groups| · 2^p` bytes total, the scale shape
    * `w3`'s exact COUNT(DISTINCT) (one shuffled row per distinct value)
    * cannot have. Values are sketched as strings (cast here) under the
    * repo's engine-portable md5 hash idiom, so the whole register state
    * is SQL-replayable — `p11` gates `m`/`nonzero`/`harmonic` (cast to
    * an exact-digits string there: ~1.2e20 exceeds float64's 2^53)/
    * `est_raw_e6` hash-exact against DuckDB; the corrected `est`
    * (JVM `ln`, not bit-portable) is QualitySpec's accuracy band. */
  def distinctSketchByKey(df: DataFrame, key: String, c: String,
      p: Int): DataFrame =
    df.filter(col(c).isNotNull)
      .groupBy(col(key))
      .agg(graft.functions.HllAgg(col(c).cast("string"), p).as("hll"))
      .select(col(key), col("hll.m").as("m"),
        col("hll.nonzero").as("nonzero"), col("hll.harmonic").as("harmonic"),
        col("hll.est_raw_e6").as("est_raw_e6"), col("hll.est").as("est"))

  /** Referential integrity: child keys (non-null) absent from the
    * parent's key set. LEFT ANTI against the parent keys — broadcast
    * when small, shuffle-hash on the FK otherwise. */
  def foreignKey(child: DataFrame, childCol: String, parent: DataFrame,
      parentCol: String, name: String): DataFrame = {
    val orphans = child.select(col(childCol)).filter(col(childCol).isNotNull)
      .join(parent.select(col(parentCol).as(childCol)).distinct(),
        Seq(childCol), "left_anti")
    result(name, count(lit(1)), orphans)
  }
}
