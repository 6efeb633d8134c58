package graft

import java.sql.Timestamp

import graft.operators.Funnel

class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: Int) = Timestamp.valueOf(f"2026-01-01 00:00:$s%02d")
  private val us0 = ts(0).getTime * 1000L

  test("funnel: ordered progression, out-of-order rejection, ties break on event id") {
    val ev = Seq(
      // user 1: full funnel
      (1L, 1L, ts(10), "view"), (1L, 2L, ts(20), "click"), (1L, 3L, ts(30), "purchase"),
      // user 2: click BEFORE the first view never counts; purchase can't skip click
      (2L, 4L, ts(10), "click"), (2L, 5L, ts(20), "view"), (2L, 6L, ts(30), "purchase"),
      // user 3: view then purchase (no click) → stage 1
      (3L, 7L, ts(10), "view"), (3L, 8L, ts(20), "purchase"),
      // user 4: nothing matching stage 1 → stage 0
      (4L, 9L, ts(5), "purchase"),
      // user 5: same timestamp — click has the HIGHER event id → after view → stage 2
      (5L, 10L, ts(10), "view"), (5L, 11L, ts(10), "click"),
      // user 6: same timestamp — click has the LOWER event id → not after → stage 1
      (6L, 13L, ts(10), "click"), (6L, 14L, ts(10), "view"),
      // user 7: greedy earliest witness — the SECOND view is never needed
      (7L, 15L, ts(10), "view"), (7L, 16L, ts(15), "view"), (7L, 17L, ts(20), "click")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val r = Funnel.funnel(ev, "user_id", "event_type", "ts", "event_id",
        Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
      .map(x => (x.getLong(0), x.getInt(1),
        Option(x.get(2)).map(_.asInstanceOf[Long] - us0),
        Option(x.get(3)).map(_.asInstanceOf[Long] - us0),
        Option(x.get(4)).map(_.asInstanceOf[Long] - us0)))
    val s = 1000000L // seconds → micros
    assert(r === Array(
      (1L, 3, Some(10 * s), Some(20 * s), Some(30 * s)),
      (2L, 1, Some(20 * s), None, None),
      (3L, 1, Some(10 * s), None, None),
      (4L, 0, None, None, None),
      (5L, 2, Some(10 * s), Some(10 * s), None),
      (6L, 1, Some(10 * s), None, None),
      (7L, 2, Some(10 * s), Some(20 * s), None)))
  }

  test("property: funnel fold equals an in-memory greedy reference on random logs") {
    val rnd = new scala.util.Random(4242L)
    val types = Array("view", "click", "purchase", "error")
    val stages = Seq("view", "click", "purchase")
    // dense timestamp collisions on purpose: the (ts, event_id) total
    // order is the contract under test
    val events = (0 until 400).map { i =>
      (rnd.nextInt(12).toLong, i.toLong, ts(rnd.nextInt(50)),
        types(rnd.nextInt(types.length)))
    }
    val expected = events.groupBy(_._1).view.mapValues { es =>
      var stage = 0
      val wit = scala.collection.mutable.ArrayBuffer.empty[Long]
      es.sortBy(e => (e._3.getTime, e._2)).foreach { e =>
        if (stage < stages.length && e._4 == stages(stage)) {
          wit += e._3.getTime * 1000L; stage += 1
        }
      }
      (stage, wit.toSeq)
    }.toMap
    val got = Funnel.funnel(events.toDF("user_id", "event_id", "ts", "event_type"),
        "user_id", "event_type", "ts", "event_id", stages)
      .collect().map { x =>
        x.getLong(0) -> ((x.getInt(1),
          (2 to 4).map(x.get).filter(_ != null).map(_.asInstanceOf[Long]).toSeq))
      }.toMap
    assert(got === expected)
    // the generator must exercise full completion (400 events, 12 users)
    assert(expected.values.exists(_._1 == 3))
  }

  test("bucketed monoid funnel == single fold on random logs (1-second segments)") {
    val rnd = new scala.util.Random(999L)
    val types = Array("view", "click", "purchase", "error")
    val stages = Seq("view", "click", "purchase")
    // 1-second buckets against second-granularity timestamps force MANY
    // multi-segment users, including segments entered mid-funnel
    val events = (0 until 400).map { i =>
      (rnd.nextInt(10).toLong, i.toLong, ts(rnd.nextInt(45)),
        types(rnd.nextInt(types.length)))
    }
    val df = events.toDF("user_id", "event_id", "ts", "event_type")
    val single = Funnel.funnel(df, "user_id", "event_type", "ts", "event_id",
      stages).orderBy("user_id").collect()
    val bucketed = Funnel.funnelBucketed(df, "user_id", "event_type", "ts",
      "event_id", stages, bucketSeconds = 1L).orderBy("user_id").collect()
    assert(bucketed === single)
    // and the degenerate one-bucket case is the single fold trivially
    val coarse = Funnel.funnelBucketed(df, "user_id", "event_type", "ts",
      "event_id", stages, bucketSeconds = 86400L).orderBy("user_id").collect()
    assert(coarse === single)
  }

  test("plan gate: the funnel is ONE user-keyed shuffle, no window, no join") {
    val ev = spark.read.parquet(sf("sf0.001") + "/events.parquet")
    val plan = Funnel.funnel(ev, "user_id", "event_type", "ts", "event_id",
      Seq("view", "click", "purchase")).queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"expected exactly one shuffle (partial+final agg):\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"k-stage funnel must not plan per-stage joins or windows:\n$plan")
  }
}
