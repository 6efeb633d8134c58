package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.QuantileSketchAgg

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)

  /** The pinned rank rule: smallest value whose rank reaches ceil(q·n). */
  private def exactQuantile(values: Seq[Double], q: Double): Double = {
    val sorted = values.sorted
    val target = math.max(1L, math.ceil(q * values.size).toLong)
    sorted((target - 1).toInt)
  }

  private def sketchQuantiles(values: Seq[Double], capacity: Int,
      parts: Int): Map[Double, Double] =
    values.toDF("v").repartition(parts)
      .agg(QuantileSketchAgg(col("v"), capacity, probs).as("qs"))
      .select(explode(col("qs")).as("e"))
      .select(col("e.p"), col("e.value"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap

  test("under capacity the sketch IS the exact percentile, for any partitioning") {
    val rnd = new Random(7)
    val values = Seq.fill(1000)(rnd.nextDouble() * 1e6)
    for (parts <- Seq(1, 7, 32)) {
      val got = sketchQuantiles(values, capacity = 1024, parts = parts)
      probs.foreach { q =>
        assert(got(q) === exactQuantile(values, q),
          s"q=$q parts=$parts")
      }
    }
  }

  test("q=0.07 over 100 rows targets rank 8, not 7 (IEEE q*n pinning)") {
    // 0.07*100 = 7.000000000000001 in double, so the IEEE rank rule
    // says 8 where decimal arithmetic says 7; DuckDB's
    // CEIL(CAST(0.07 AS DOUBLE)*100) = 8 — this is the divergence the
    // oracle's CAST(q AS DOUBLE) exists to pin
    assert(math.ceil(0.07 * 100).toLong === 8L)
    val values = (1 to 100).map(_.toDouble)
    val got = values.toDF("v").repartition(4)
      .agg(QuantileSketchAgg(col("v"), 1024, Seq(0.07)).as("qs"))
      .select(explode(col("qs")).as("e")).select(col("e.value"))
      .head.getDouble(0)
    assert(got === 8.0)
  }

  test("over capacity: total weight invariant holds and rank error is bounded") {
    val rnd = new Random(13)
    val n = 20000
    val capacity = 128
    val values = Seq.fill(n)(rnd.nextDouble())
    // weight invariant, asserted on the buffer itself across a
    // multi-partition update/merge drive: compaction must never create
    // or destroy rank mass
    locally {
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.BoundReference
      import org.apache.spark.sql.types.DoubleType
      val agg = QuantileSketchAgg(
        BoundReference(0, DoubleType, nullable = false), capacity, probs)
      val merged = values.grouped(n / 5).toSeq
        .map(_.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
          agg.update(b, InternalRow(v))
        })
        .reduce(agg.merge)
      val totalWeight = merged.levels.zipWithIndex
        .map { case (lv, l) => lv.size.toLong << l }.sum
      assert(totalWeight === n.toLong)
      assert(merged.n === n.toLong)
    }
    for (parts <- Seq(3, 17)) {
      val got = sketchQuantiles(values, capacity, parts)
      val sorted = values.sorted
      probs.foreach { q =>
        val target = math.ceil(q * n).toLong
        val reported = got(q)
        // true rank range of the reported value in the full multiset
        val lo = sorted.count(_ < reported) + 1L
        val hi = sorted.count(_ <= reported).toLong
        val err = if (target < lo) lo - target
          else if (target > hi) target - hi else 0L
        // deterministic keep-odd compaction: observed error stays well
        // inside epsilon*n with epsilon = log2(n/capacity)^2 / capacity
        val bound = (math.pow(log2(n.toDouble / capacity), 2) / capacity * n).toLong
        assert(err <= bound, s"q=$q parts=$parts err=$err bound=$bound")
      }
    }
  }

  test("grouped: one sketch per key, exact under capacity") {
    val rnd = new Random(21)
    val rows = (1 to 600).map(i => (s"s${i % 3}", rnd.nextDouble() * 100))
    val df = rows.toDF("k", "v").repartition(8)
    val got = df.groupBy("k")
      .agg(QuantileSketchAgg(col("v"), 1024, probs).as("qs"))
      .select(col("k"), explode(col("qs")).as("e"))
      .select(col("k"), col("e.p"), col("e.value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    rows.groupBy(_._1).foreach { case (k, grp) =>
      val vs = grp.map(_._2)
      probs.foreach { q =>
        assert(got((k, q)) === exactQuantile(vs, q), s"k=$k q=$q")
      }
    }
  }

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)
}
