package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Ordered-funnel / sequential-pattern matching over an event stream —
 * the CEP primitive (the reference engine's Flink lineage makes this
 * the signature "complex event processing" shape), re-expressed for
 * Spark's execution model.
 *
 * Semantics: for each user, walk the user's events in the TOTAL event
 * order `(event-time, event_id)` and greedily advance a stage pointer —
 * an event whose type equals the CURRENT stage's type advances it and
 * stamps that stage's time. Greedy-earliest is existence-optimal for an
 * unconstrained ordered pattern (taking the earliest match never
 * forecloses a later stage), so `stage_reached = k` iff SOME ordered
 * subsequence of the user's events matches the first k stages — and
 * the stamped times are the lexicographically-least witness, which
 * makes the output deterministic and SQL-replayable (the oracle chains
 * k greedy row_number-1 picks, each strictly after the previous in the
 * same total order).
 *
 * Scale shape: ONE user-keyed shuffle (hash-agg `collect_list`), then
 * the sort and the stage fold run per user as expressions —
 * `sort_array` + `aggregate` over the user's event array, no window
 * function, no self-join per stage (the k-stage SQL formulation costs
 * k user-keyed joins; this costs one agg at any k). Per-user event
 * counts bound the array (sessionized streams are small; a pathological
 * power-user key would need the t23-style bucketed split).
 */
object Funnel {

  /** Per-user funnel progress: `stage_reached` (0..k) and the witness
    * timestamp of each completed stage in unix micros (`ts1_us`…,
    * NULL when unreached). `stages` is the ordered event-type pattern. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, orderCol: String, stages: Seq[String]): DataFrame = {
    val k = stages.length
    require(k >= 1, "need at least one stage")
    val init = struct(lit(0).as("s"),
      array_repeat(lit(null).cast("long"), k).as("ts"))
    val evs = sort_array(collect_list(struct(
      unix_micros(col(tsCol).cast("timestamp")).as("us"),
      col(orderCol).as("oid"), col(typeCol).as("tp"))))
    val folded = aggregate(col("evs"), init, (st, e) =>
      when(st.getField("s") < k &&
          e.getField("tp") === element_at(typedLit(stages), st.getField("s") + 1),
        struct((st.getField("s") + 1).as("s"),
          transform(st.getField("ts"), (x, i) =>
            when(i === st.getField("s"), e.getField("us")).otherwise(x)).as("ts")))
        .otherwise(st))
    events.groupBy(col(userCol).as("user_id"))
      .agg(evs.as("evs"))
      .select(col("user_id") +: TextDedup.bound(folded) { f =>
        struct(f.getField("s").as("stage_reached") +:
          (1 to k).map(i =>
            element_at(f.getField("ts"), i).as(s"ts${i}_us")): _*)
      }.as("f") +: Nil: _*)
      .select(col("user_id") +: (col("f.stage_reached") +:
        (1 to k).map(i => col(s"f.ts${i}_us"))): _*)
  }
}
