package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * CDC merge — apply a change batch (insert/update/delete log) to a base
 * snapshot, latest change per key wins. The natural next step after the
 * reference's append/replace sink modes (MIS:1090–1113 only truncates or
 * appends; a log-consuming pipeline needs MERGE): the same operator a
 * `MERGE INTO` statement or a Debezium-feed materializer runs.
 *
 * Semantics:
 *   - `changes` carries the base's payload columns plus an op column
 *     (`'I' | 'U' | 'D'`) and a per-key strictly-increasing sequence
 *     column (the CDC log's LSN / binlog position). For each key only the
 *     HIGHEST-sequence change applies: `D` removes the key, `I`/`U`
 *     replace the full row (full-row images, as Debezium emits).
 *   - Keys absent from `changes` pass through from `base` untouched.
 *   - A delete of an absent key is a no-op; an insert of a present key
 *     behaves as an update (upsert) — so replaying an already-applied
 *     batch is idempotent (CdcSpec asserts both).
 *
 * Scale shape (100 TB base, ≪ base-sized change batch):
 *   1. latest-per-key via `max_by(struct(payload), seq)` — an AGGREGATION,
 *     not a `row_number` window: partial aggregation combines map-side,
 *     shuffling one row per key per map task instead of sorting every
 *     change inside a window partition. Sequence ties are impossible in
 *     a real log (unique LSN); we still break them deterministically by
 *     including the sequence in the struct ordering.
 *   2. one LEFT ANTI join of base against the touched-key set (AQE
 *     broadcasts it when the batch is small — the common case; falls
 *     back to a shuffle join keyed identically to step 1 otherwise).
 *     With the base bucketed on the key ([[Ddl]] bucketing), the anti
 *     join is exchange-free on the base side.
 *   3. union with the surviving upsert images — map-only.
 *   The base table is never shuffled when the touched-key set broadcasts;
 *   the big side streams through scan → anti-join → union → sink.
 */
object Cdc {

  /** Merge `changes` into `base`. `base` and `changes` must share the
    * payload schema; `changes` additionally carries `opCol` and `seqCol`.
    * Returns the merged snapshot with the payload schema. */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      opCol: String, seqCol: String): DataFrame = {
    require(keyCols.nonEmpty, "CDC merge needs at least one key column")
    val payload = base.columns.toSeq
    require(payload.forall(changes.columns.contains),
      s"changes must carry every base column; missing " +
        payload.filterNot(changes.columns.contains).mkString(","))
    val keys = keyCols.map(col)
    // max_by over (seq, op, payload): seq dominates; op/payload only break
    // impossible-in-practice ties, keeping the operator deterministic
    val image = struct((Seq(col(seqCol), col(opCol)) ++ payload.map(col)): _*)
    val latest = changes.groupBy(keys: _*)
      .agg(max(image).as("img"))
      .select(keys ++ Seq(col(s"img.$opCol").as(opCol)) ++
        payload.filterNot(keyCols.contains).map(c => col(s"img.$c").as(c)): _*)
    val untouched = base.join(latest.select(keys: _*), keyCols, "left_anti")
    val upserts = latest.filter(col(opCol) =!= "D")
      .select(payload.map(col): _*)
    untouched.unionByName(upserts)
  }

  /** CDC CAPTURE — derive the change log between two snapshots: the
    * inverse of [[applyChanges]]. Keys only in `newSnap` emit `I` (new
    * payload), keys only in `oldSnap` emit `D` (old payload), keys in
    * both with differing payloads emit `U` (new payload); unchanged keys
    * emit nothing. Round-trip law (CdcSpec):
    * `applyChanges(old, captureChanges(old, new) + seq) == new`.
    *
    * Shape: ONE full-outer join on the key — shuffle both sides keyed
    * identically (exchange-free when both snapshots are bucketed on the
    * key, [[Ddl]] bucketing); change detection is a null-safe struct
    * comparison (`<=>`), map-side after the join. This is how you
    * bootstrap a CDC feed when the source offers only periodic dumps. */
  def captureChanges(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String], opCol: String): DataFrame = {
    val payload = oldSnap.columns.toSeq
    require(payload.toSet == newSnap.columns.toSet,
      "snapshots must share one schema; got " +
        s"${payload.mkString(",")} vs ${newSnap.columns.mkString(",")}")
    val nonKey = payload.filterNot(keyCols.contains)
    val o = nonKey.foldLeft(oldSnap)((d, c) => d.withColumnRenamed(c, s"__o_$c"))
      .withColumn("__o", lit(1))
    val n = nonKey.foldLeft(newSnap)((d, c) => d.withColumnRenamed(c, s"__n_$c"))
      .withColumn("__n", lit(1))
    val changed =
      if (nonKey.isEmpty) lit(false)
      else !(struct(nonKey.map(c => col(s"__o_$c")): _*) <=>
        struct(nonKey.map(c => col(s"__n_$c")): _*))
    o.join(n, keyCols, "full_outer")
      .withColumn(opCol,
        when(col("__n").isNull, lit("D"))
          .when(col("__o").isNull, lit("I"))
          .when(changed, lit("U")))
      .filter(col(opCol).isNotNull)
      .select(keyCols.map(col) ++ nonKey.map(c =>
        when(col(opCol) === "D", col(s"__o_$c"))
          .otherwise(col(s"__n_$c")).as(c)) :+ col(opCol): _*)
  }

  /** One INCREMENTAL merge step over a sequence-carrying state — the
    * building block of the streaming materializer
    * ([[graft.streaming.StreamingIngest.cdcMaterialize]]). `state` is
    * the merged snapshot plus `seqCol` (the sequence that produced each
    * row); `changes` is a change slice as in [[applyChanges]]. Because
    * the state REMEMBERS its sequence, a stale change (seq ≤ the applied
    * one) loses the struct-max and is ignored — cross-batch replays and
    * late duplicate updates are safe. The one irrecoverable reordering
    * is an insert arriving AFTER the delete that should shadow it:
    * deletes leave no tombstone, so per-key in-order delivery of D is
    * assumed (a CDC log read in offset order provides it).
    *
    * Same aggregation shape as [[applyChanges]] (map-side combinable,
    * no window sort); state rows enter as op `'U'` so an equal-seq
    * replayed insert ties into the identical image. */
  def mergeStep(state: DataFrame, changes: DataFrame, keyCols: Seq[String],
      opCol: String, seqCol: String): DataFrame = {
    val payload = state.columns.toSeq.filterNot(_ == seqCol)
    require(payload.forall(changes.columns.contains) &&
        changes.columns.contains(seqCol),
      s"changes must carry every state column; missing " +
        (payload :+ seqCol).filterNot(changes.columns.contains).mkString(","))
    val cols = (payload :+ seqCol :+ opCol).map(col)
    val combined = state.withColumn(opCol, lit("U")).select(cols: _*)
      .unionByName(changes.select(cols: _*))
    val keys = keyCols.map(col)
    val image = struct((Seq(col(seqCol), col(opCol)) ++ payload.map(col)): _*)
    combined.groupBy(keys: _*)
      .agg(max(image).as("img"))
      .select(keys ++ (payload.filterNot(keyCols.contains) :+ seqCol :+ opCol)
        .map(c => col(s"img.$c").as(c)): _*)
      .filter(col(opCol) =!= "D")
      .drop(opCol)
  }

  /**
   * SCD type-2 history materialization — the lakehouse-standard
   * temporal table built from the change log: every I/U image becomes
   * a VERSION row valid over `[its seq, the key's next change)`,
   * `valid_to` NULL + `is_current` on the open head, and a D closes
   * the last version without contributing one (the key has no current
   * row — exactly [[applyChanges]]' delete semantics, but with the
   * full history retained for AS-OF queries and audits).
   *
   * Plan: ONE per-key window (`lead(seq)`) — the partition is a key's
   * change count (bounded by churn, not corpus size), the classic
   * SCD2 shape; no self-join, no global sort.
   */
  def scd2(changes: DataFrame, keyCols: Seq[String], opCol: String,
      seqCol: String): DataFrame = {
    require(keyCols.nonEmpty, "SCD2 needs at least one key column")
    // op RANK as the tie-break keeps the window deterministic if a producer
    // ever emits two changes for one key at the same seq: D must sort AFTER
    // I/U so the delete still closes the interval (raw ASCII order would put
    // 'D' first — the delete would close nothing, be filtered, and the I/U
    // would wrongly survive as the current row of a deleted key)
    val opRank = when(col(opCol) === "D", lit(1)).otherwise(lit(0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(seqCol), opRank)
    changes
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .filter(col(opCol) =!= "D")
      .withColumnRenamed(seqCol, "valid_from")
      .withColumn("is_current", col("valid_to").isNull)
      .drop(opCol)
  }

  /**
   * One INCREMENTAL SCD2 maintenance step — the building block of the
   * streaming history materializer
   * ([[graft.streaming.StreamingIngest.scd2Materialize]]), closing the
   * batch/stream asymmetry c1 never had (its merge got [[mergeStep]];
   * [[scd2]] had no incremental form). `history` is a previously
   * materialized [[scd2]] output; `changes` is the next change slice.
   *
   * Law (CdcSpec, any split): folding a change log through scd2Step in
   * ANY batch partitioning (per-key seq-ordered across batches, as a
   * CDC log read in offset order delivers) equals one [[scd2]] over
   * the whole log.
   *
   * Seq-guarded: each key's applied frontier is
   * `max(coalesce(valid_to, valid_from))` over its history — a closing
   * seq is remembered even though the close contributed no version —
   * so replayed batches and late duplicates (seq ≤ frontier) are
   * ignored, exactly [[mergeStep]]'s replay discipline.
   *
   * Shape: keys untouched by the batch pass through with ONE anti-join
   * (broadcast when the batch is small — the common case); only the
   * touched keys' history (bounded by batch-key churn, not corpus
   * size) is re-folded, by re-expressing it as its generating change
   * log (each version an upsert at `valid_from`; a key with no open
   * row additionally a delete at its closing seq) and running [[scd2]]
   * over reconstruction ∪ fresh changes.
   *
   * `touched` and `ht` are [[Staging.barrier]]ed: each is referenced
   * by 2–3 plan branches (anti/semi probes; frontier, reopened,
   * closers), and without the barrier every reference recomputes its
   * subtree — for `ht` that is an extra full history scan + semi-join
   * PER REFERENCE, which at a 100 TB history is the step's whole
   * cost. Both are churn-bounded (batch keys / their history), so the
   * cache is small. The caller's Staging frame owns the release —
   * batch callers run inside a scoped frame; the streaming
   * materializer scopes each micro-batch. History itself is scanned
   * exactly twice (anti + semi) — inherent to the split, and both
   * scans prune to the key columns + touched probe.
   *
   * Skew note: the refold windows partition by key, so one partition
   * is ONE touched key's full version history — a pathological key
   * with millions of versions serializes in one task (inherent to an
   * exact per-key `lead`). Untouched hot keys cost nothing (anti-join
   * pass-through), so the exposure is churn ∩ hot, per batch.
   */
  def scd2Step(history: DataFrame, changes: DataFrame, keyCols: Seq[String],
      opCol: String, seqCol: String): DataFrame = {
    require(Seq("valid_from", "valid_to", "is_current")
        .forall(history.columns.contains),
      "history must be an scd2 output (valid_from, valid_to, is_current)")
    val payload = changes.columns.toSeq
      .filterNot(c => c == opCol || c == seqCol)
    val keys = keyCols.map(col)
    val touched = Staging.barrier(changes.select(keys: _*).distinct())
    val untouched = history.join(touched, keyCols, "left_anti")
    val ht = Staging.barrier(history.join(touched, keyCols, "left_semi"))
    val frontier = ht.groupBy(keys: _*)
      .agg(max(coalesce(col("valid_to"), col("valid_from"))).as("__applied"))
    val fresh = changes.join(frontier, keyCols, "left")
      .filter(col("__applied").isNull || col(seqCol) > col("__applied"))
      .drop("__applied")
      .select((payload.map(col) :+ col(seqCol) :+ col(opCol)): _*)
    // each history version re-emits as the upsert that opened it …
    val reopened = ht.select((payload.map(col) :+
      col("valid_from").as(seqCol) :+ lit("U").as(opCol)): _*)
    // … and every DELETE is recovered from the interval chain: a
    // version closed by anything other than the next version's open
    // (including the key's final close, where there is no next) was
    // closed by a D at its valid_to — interior deletes included
    // (delete-then-reinsert leaves [a,d) [r,…) with d ≠ r). The D left
    // no version, but its seq is the valid_to; payload values on a D
    // are ignored by scd2. Unique per-key seqs assumed (the CDC log's
    // LSN), as everywhere in this family.
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy("valid_from")
    val closers = ht
      .withColumn("__nvf", lead(col("valid_from"), 1).over(wk))
      .filter(col("valid_to").isNotNull &&
        (col("__nvf").isNull || col("valid_to") =!= col("__nvf")))
      .select((payload.map(col) :+ col("valid_to").as(seqCol) :+
        lit("D").as(opCol)): _*)
    val refolded = scd2(
      reopened.unionByName(closers).unionByName(fresh),
      keyCols, opCol, seqCol)
    untouched.unionByName(refolded.select(untouched.columns.map(col): _*))
  }
}
