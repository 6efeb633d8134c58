package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Cdc

class CdcSpec extends SparkSpec {

  import spark.implicits._

  private def base: DataFrame =
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "v")

  private def merged(b: DataFrame, ch: DataFrame): Map[Long, (String, Double)] =
    Cdc.applyChanges(b, ch, Seq("k"), "op", "seq")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap

  private val changes = Seq(
    (2L, "b2", 21.0, "U", 1L),   // plain update
    (3L, "c", 30.0, "D", 1L),    // plain delete
    (5L, "e", 50.0, "I", 1L),    // insert of a new key
    (4L, "d", 40.0, "D", 1L),    // delete …
    (4L, "d2", 42.0, "I", 2L),   // … then re-insert at a higher seq: survives
    (6L, "f", 60.0, "U", 1L),    // update …
    (6L, "f", 60.0, "D", 2L),    // … then delete at a higher seq: gone
    (9L, "x", 0.0, "D", 1L),     // delete of an absent key: no-op
    (1L, "a2", 11.0, "I", 1L))   // insert on a PRESENT key: acts as update
    .toDF("k", "name", "v", "op", "seq")

  test("latest change per key wins; deletes drop; untouched keys pass through") {
    val out = merged(base, changes)
    assert(out === Map(
      1L -> (("a2", 11.0)),  // upserted by the 'I' on a present key
      2L -> (("b2", 21.0)),  // updated
      4L -> (("d2", 42.0)),  // delete superseded by the later re-insert
      5L -> (("e", 50.0))))  // fresh insert; 3 and 6 deleted, 9 never existed
  }

  test("replaying an already-applied batch is idempotent") {
    val once = Cdc.applyChanges(base, changes, Seq("k"), "op", "seq")
    val twice = Cdc.applyChanges(once, changes, Seq("k"), "op", "seq")
    assert(once.except(twice).count() === 0L)
    assert(twice.except(once).count() === 0L)
  }

  test("captureChanges classifies I/U/D and skips unchanged keys") {
    val newSnap = Seq((1L, "a", 10.0),    // unchanged → no row
        (2L, "b2", 21.0),                 // changed → U
        (5L, "e", 50.0))                  // new key → I; 3,4 dropped → D
      .toDF("k", "name", "v")
    val out = Cdc.captureChanges(base, newSnap, Seq("k"), "op")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2), r.getString(3)))).toMap
    assert(out === Map(
      2L -> (("b2", 21.0, "U")),
      3L -> (("c", 30.0, "D")),   // D carries the OLD payload
      4L -> (("d", 40.0, "D")),
      5L -> (("e", 50.0, "I"))))
  }

  test("round trip: applying the captured diff reproduces the new snapshot") {
    val newSnap = Seq((1L, "a2", 11.0), (2L, "b", 20.0), (6L, "f", 60.0))
      .toDF("k", "name", "v")
    val log = Cdc.captureChanges(base, newSnap, Seq("k"), "op")
      .withColumn("seq", org.apache.spark.sql.functions.lit(1L))
    val applied = Cdc.applyChanges(base, log, Seq("k"), "op", "seq")
    assert(applied.except(newSnap).count() === 0L)
    assert(newSnap.except(applied).count() === 0L)
  }

  test("missing payload columns in the change batch fail loudly") {
    val bad = Seq((1L, "a", "U", 1L)).toDF("k", "name", "op", "seq")
    val e = intercept[IllegalArgumentException](
      Cdc.applyChanges(base, bad, Seq("k"), "op", "seq"))
    assert(e.getMessage.contains("v"))
  }

  test("scd2: version intervals chain, deletes close without contributing, head is current") {
    val log = Seq(
      (1L, "a1", "I", 0L), (1L, "a2", "U", 2L), (1L, "a3", "U", 5L),
      (2L, "b1", "I", 0L), (2L, "b1", "D", 3L),
      (3L, "c1", "I", 1L)
    ).toDF("k", "v", "op", "seq")
    val r = Cdc.scd2(log, Seq("k"), "op", "seq")
      .orderBy("k", "valid_from").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        Option(x.get(3)).map(_.asInstanceOf[Long]), x.getBoolean(4)))
    assert(r === Array(
      (1L, "a1", 0L, Some(2L), false),
      (1L, "a2", 2L, Some(5L), false),
      (1L, "a3", 5L, None, true),
      (2L, "b1", 0L, Some(3L), false), // closed by the delete, no current row
      (3L, "c1", 1L, None, true)))
  }

  test("scd2: a same-seq U+D tie deletes the key (D ranks after I/U, not by ASCII)") {
    // 'D' < 'I' < 'U' in ASCII — a raw (seq, op) sort would put the
    // delete FIRST, it would close nothing, and the U would wrongly
    // survive as the current row of a deleted key
    val log = Seq(
      (1L, "a1", "I", 0L), (1L, "a2", "U", 2L), (1L, "a2d", "D", 2L),
      (2L, "b1", "U", 1L), (2L, "b2", "I", 1L) // I/U tie: stable, head current
    ).toDF("k", "v", "op", "seq")
    val r = Cdc.scd2(log, Seq("k"), "op", "seq")
      .orderBy("k", "valid_from").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        Option(x.get(3)).map(_.asInstanceOf[Long]), x.getBoolean(4)))
    // key 1: both versions closed, no current row; key 2 keeps a head
    assert(r.filter(_._1 == 1L).forall(v => v._4.isDefined && !v._5))
    assert(r.count(v => v._1 == 2L && v._5) === 1)
  }

  test("scd2Step: any batch split of the log equals the one-shot fold; replays are ignored") {
    // the full log exercises every transition ACROSS batch boundaries:
    // update chains, delete-closes, delete-then-reinsert, a brand-new
    // key mid-stream, and an untouched key (5) that must pass through
    val log = Seq(
      (1L, "a1", "I", 0L), (1L, "a2", "U", 2L), (1L, "a3", "U", 5L),
      (2L, "b1", "I", 0L), (2L, "b2", "U", 1L), (2L, "b2", "D", 3L),
      (3L, "c1", "I", 1L), (3L, "c1", "D", 4L), (3L, "c2", "I", 6L),
      (4L, "d1", "I", 7L),
      (5L, "e1", "I", 0L)
    ).toDF("k", "v", "op", "seq")
    val oneShot = Cdc.scd2(log, Seq("k"), "op", "seq")
      .collect().map(_.toString).sorted.toSeq
    // three different splits, including one that separates a D from the
    // I it closes and one that splits a key's chain mid-way
    val splits: Seq[Seq[DataFrame]] = Seq(
      Seq(log.filter("seq <= 1"), log.filter("seq > 1 AND seq <= 4"),
        log.filter("seq > 4")),
      Seq(log.filter("seq = 0"), log.filter("seq IN (1,2)"),
        log.filter("seq IN (3,4,5)"), log.filter("seq > 5")),
      Seq(log))
    splits.zipWithIndex.foreach { case (batches, i) =>
      val folded = batches.foldLeft(Option.empty[DataFrame]) {
        case (None, b) => Some(Cdc.scd2(b, Seq("k"), "op", "seq"))
        case (Some(h), b) => Some(Cdc.scd2Step(h, b, Seq("k"), "op", "seq"))
      }.get
      assert(folded.collect().map(_.toString).sorted.toSeq === oneShot,
        s"split $i")
    }
    // replay guard: re-applying an already-folded slice changes nothing
    val h = Cdc.scd2(log.filter("seq <= 4"), Seq("k"), "op", "seq")
    val h2 = Cdc.scd2Step(h, log.filter("seq > 4"), Seq("k"), "op", "seq")
    val h3 = Cdc.scd2Step(h2, log.filter("seq > 1 AND seq <= 4"),
      Seq("k"), "op", "seq")
    assert(h3.collect().map(_.toString).sorted.toSeq === oneShot)
  }
}
