package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; suites grab
  * it lazily). */
object SparkSpec {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSpec.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"

  /** Spark/DuckDB `round` semantics — HALF_UP away from zero — for JVM
    * replays of micro-fixed-point scores. Scala `math.round` is
    * `floor(x + 0.5)`, which differs on negative exact halves (the
    * round-15 advisor's latent-flake finding); every replay that can
    * see a negative score must round through this instead. */
  def roundHalf(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
}
