package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, rng}

import graft.operators.Cdc

/**
 * Property-based laws of the CDC family over RANDOM snapshots and change
 * logs (fixed seed, one Spark job per law):
 *   1. capture∘apply round trip: applying the diff between two random
 *      snapshots to the first reproduces the second exactly;
 *   2. apply idempotence: replaying a random change log over its own
 *      result is a no-op;
 *   3. capture of identical snapshots is empty.
 * Random logs include duplicate keys with distinct sequences, deletes of
 * absent keys, and inserts of present keys — the messy cases a real feed
 * produces.
 */
class CdcPropertySpec extends SparkSpec {

  import spark.implicits._

  private val seed = rng.Seed(1234L)

  private def rowsGen(keys: Range): Gen[List[(Long, String, Double)]] =
    Gen.listOf(for {
      k <- Gen.choose(keys.min, keys.max)
      name <- Gen.oneOf("a", "b", "c", "d", "e")
      v <- Gen.choose(0, 999)
    } yield (k.toLong, name, v.toDouble))

  // a snapshot has one row per key: dedupe the generated list by key
  private def snapshot(rows: List[(Long, String, Double)]): DataFrame =
    rows.groupBy(_._1).map(_._2.head).toSeq
      .toDF("k", "name", "v")

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.except(b).count() == 0 && b.except(a).count() == 0

  test("law: applying the captured diff of random snapshots reproduces the target") {
    val gen = for {
      oldRows <- rowsGen(1 to 40)
      newRows <- rowsGen(1 to 40)
    } yield (oldRows, newRows)
    Gen.listOfN(8, gen).pureApply(Gen.Parameters.default, seed).foreach {
      case (oldRows, newRows) =>
        val (o, n) = (snapshot(oldRows), snapshot(newRows))
        val log = Cdc.captureChanges(o, n, Seq("k"), "op")
          .withColumn("seq", org.apache.spark.sql.functions.lit(1L))
        assert(sameRows(Cdc.applyChanges(o, log, Seq("k"), "op", "seq"), n))
    }
  }

  test("law: replaying a random change log over its own result is a no-op") {
    val logGen = Gen.listOf(for {
      k <- Gen.choose(1, 30)
      name <- Gen.oneOf("x", "y", "z")
      v <- Gen.choose(0, 99)
      op <- Gen.frequency(3 -> Gen.const("U"), 2 -> Gen.const("I"),
        2 -> Gen.const("D"))
      s <- Gen.choose(1L, 1000L)
    } yield (k.toLong, name, v.toDouble, op, s))
    val cases = Gen.listOfN(8, Gen.zip(rowsGen(1 to 30), logGen))
      .pureApply(Gen.Parameters.default, seed)
    cases.foreach { case (baseRows, logRows) =>
      // distinct sequences per key: a real log never reuses an LSN
      val log = logRows.zipWithIndex
        .map { case ((k, n, v, op, _), i) => (k, n, v, op, i.toLong) }
        .toDF("k", "name", "v", "op", "seq")
      val base = snapshot(baseRows)
      val once = Cdc.applyChanges(base, log, Seq("k"), "op", "seq")
      val twice = Cdc.applyChanges(once, log, Seq("k"), "op", "seq")
      assert(sameRows(once, twice))
    }
  }

  test("law: capturing identical snapshots yields an empty log") {
    val rows = rowsGen(1 to 40).pureApply(Gen.Parameters.default, seed)
    val s = snapshot(rows)
    assert(Cdc.captureChanges(s, s, Seq("k"), "op").count() === 0L)
  }
}
