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
