package graft.operators

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
 * user application) calls [[releaseAll]] once the action completes.
 *
 * Release must happen strictly AFTER the consuming action: unpersisting
 * early is still correct (Spark recomputes) but silently reintroduces the
 * quadratic re-evaluation the barrier exists to prevent.
 */
object Staging {
  private val staged = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` as a staging barrier and register it for release. */
  def barrier(df: DataFrame): DataFrame = synchronized {
    val p = df.persist()
    staged += p
    p
  }

  /** Unpersist every registered barrier (non-blocking) and clear the
    * registry. Call after the consuming action of the query that created
    * the barriers. */
  def releaseAll(): Unit = synchronized {
    staged.foreach(_.unpersist(blocking = false))
    staged.clear()
  }

  /** Number of currently-registered (not yet released) barriers. */
  def registered: Int = synchronized(staged.size)

  /** Run an action-producing block and release all barriers it staged.
    * `f` must EXECUTE its actions (write/collect/count), not merely build
    * a lazy plan — release happens when the block returns. */
  def scoped[T](f: => T): T =
    try f finally releaseAll()
}
