package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame

/**
 * Lifecycle registry for staging barriers (materialization points that
 * defeat Catalyst's projection-collapse / lambda re-evaluation trap —
 * see [[TextDedup.shingleSets]]).
 *
 * The barriers are load-bearing for performance, but a bare `persist()`
 * with no matching `unpersist()` accumulates: in a long-lived session the
 * shingle/band/token caches pile up, and at 100 TB a persisted shingle
 * table is corpus-scale storage. Operators therefore register every
 * barrier here, and the DRIVER of the consuming action (Verify, Bench, a
 * user application) releases them once the action completes —
 * preferably by building AND executing the query inside [[scoped]].
 *
 * Release must happen strictly AFTER the consuming action: unpersisting
 * early is still correct (Spark recomputes) but silently reintroduces the
 * quadratic re-evaluation the barrier exists to prevent.
 *
 * SCOPING: the registry is a THREAD-LOCAL STACK of frames. [[barrier]]
 * registers into the current thread's innermost frame; [[releaseAll]]
 * releases ONLY that frame; [[scoped]] pushes a fresh frame for its block
 * and releases it on exit. Two driver threads (or two interleaved
 * [[scoped]] blocks on one thread — build A, run-and-release B, execute
 * A) therefore can never drop each other's barriers, which a global
 * registry silently did: results stayed correct (Spark recomputes) but
 * the re-evaluation trap came back. The one contract this imposes is that
 * a query's plan must be BUILT and EXECUTED on the thread (and in the
 * frame) that will release it — true of every call site (Verify, Bench,
 * the specs), and the natural shape of a driver program.
 */
object Staging {
  private val frames = new ThreadLocal[List[ArrayBuffer[() => Unit]]] {
    override def initialValue(): List[ArrayBuffer[() => Unit]] =
      List(ArrayBuffer.empty)
  }

  /** Persist `df` as a staging barrier and register it for release in the
    * current thread's innermost frame. */
  def barrier(df: DataFrame): DataFrame = {
    // NOTE (r22): `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning`
    // stays at its default FALSE deliberately. True lets AQE coalesce
    // tiny cached tables (measured −0.1..−0.3 s on the KN/tokenizer
    // families at 32 cores) BUT makes every cached plan's output
    // partitioning statically unknown, so consumers re-insert the
    // exchanges that barriered-hash-partitioned frames exist to share
    // (the n-gram lattice one-exchange shape in TextAnalysis, the
    // bucketed-index joins) — measured as a NET loss (t97 +0.5 s) and
    // plan-verified (consumer-side Exchanges reappear above
    // InMemoryTableScan when true).
    val p = df.persist()
    frames.get().head += (() => p.unpersist(blocking = false))
    p
  }

  /** PLAN-TRUNCATING barrier for frames whose lineage tree is itself a
    * driver cost (analyzer/optimizer/AQE walk it per consumer — the
    * t33 canonical-hash tree measured 1.3 s/rep of pure driver time
    * under a plain persist barrier). In LOCAL mode this is a
    * `localCheckpoint`: blocks live in the one and only process, so
    * the checkpoint's unreplicated-blocks caveat adds NO failure mode
    * a local persist didn't already have, and the lineage truncates to
    * an RDD leaf. On a CLUSTER a localCheckpoint's unreplicated blocks
    * make ANY executor loss fatal to the query (r21 ADVICE), so there
    * the frame keeps the plain persist barrier — recomputable from
    * lineage, at the documented cost of re-walking the big plan. Both
    * paths release with the current frame. */
  def planBarrier(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.isLocal) adopt(df.localCheckpoint())
    else barrier(df)

  /** Register an ALREADY-materialized frame (a `localCheckpoint`, an
    * externally persisted table) for release with the current frame,
    * without re-persisting it. Checkpointed Datasets also release their
    * underlying RDD blocks, which `Dataset.unpersist` alone leaves to
    * GC-driven cleanup. */
  def adopt(df: DataFrame): DataFrame = {
    val ckptRdd = org.apache.spark.sql.graft.bridge.checkpointedRdd(df)
    frames.get().head += { () =>
      df.unpersist(blocking = false)
      ckptRdd.foreach(_.unpersist(blocking = false))
    }
    df
  }

  /** Unpersist every barrier of the CURRENT frame (non-blocking) and
    * clear it. Call after the consuming action of the query that created
    * the barriers — or use [[scoped]], which does this on block exit. */
  def releaseAll(): Unit = {
    val cur = frames.get().head
    cur.foreach(release => release())
    cur.clear()
  }

  /** Number of currently-registered (not yet released) barriers in the
    * current frame. */
  def registered: Int = frames.get().head.size

  /** Run an action-producing block in a FRESH barrier frame and release
    * exactly the barriers it staged — other frames (outer scopes, other
    * threads) are untouched. `f` must EXECUTE its actions
    * (write/collect/count), not merely build a lazy plan — release
    * happens when the block returns. */
  def scoped[T](f: => T): T = {
    frames.set(ArrayBuffer.empty[() => Unit] :: frames.get())
    try f
    finally {
      releaseAll()
      frames.set(frames.get().tail)
    }
  }
}
