package graft

import graft.operators.{Staging, TextDedup}

/** Barrier lifecycle: staged tables are registered while a dedup query
  * runs and fully released (no retained RDD blocks) afterwards. */
class StagingSpec extends SparkSpec {

  test("minhashLshPairs barriers register and releaseAll drops every block") {
    Staging.releaseAll() // isolate from earlier suites
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val pairs = TextDedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, k = 8, bandSize = 4, numBands = 2, threshold = 0.5)
    pairs.count() // consuming action: barriers materialize here
    assert(Staging.registered === 2) // tokens + the fused (id, s, bands) frame
    Staging.releaseAll()
    assert(Staging.registered === 0)
    // non-blocking unpersist: poll briefly for the blocks to drain
    val deadline = System.nanoTime() + 10e9.toLong
    while (spark.sparkContext.getPersistentRDDs.nonEmpty
        && System.nanoTime() < deadline) Thread.sleep(50)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("interleaved scopes are isolated: releasing one never drops another's barriers") {
    Staging.releaseAll()
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    Staging.scoped {
      val outer = Staging.barrier(docs.select("doc_id"))
      outer.count()
      assert(Staging.registered === 1)
      // inner scope: builds, runs, and releases its own barrier — the
      // outer frame must be untouched (the round-3 hazard was exactly
      // this interleaving dropping the outer barrier)
      Staging.scoped {
        assert(Staging.registered === 0) // fresh frame
        Staging.barrier(docs.select("text")).count()
        assert(Staging.registered === 1)
      }
      assert(Staging.registered === 1) // outer barrier survived
      assert(outer.storageLevel.useMemory, "outer barrier was unpersisted by inner scope")
    }
    assert(Staging.registered === 0)
  }

  test("frames are per-thread: another thread's releaseAll cannot drop this thread's barrier") {
    Staging.releaseAll()
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val mine = Staging.barrier(docs.select("doc_id"))
    mine.count()
    assert(Staging.registered === 1)
    val t = new Thread(() => Staging.releaseAll())
    t.start(); t.join()
    assert(Staging.registered === 1)
    assert(mine.storageLevel.useMemory, "cross-thread releaseAll dropped the barrier")
    Staging.releaseAll()
    assert(Staging.registered === 0)
  }

  test("scoped releases barriers even when the block throws") {
    Staging.releaseAll()
    intercept[RuntimeException] {
      Staging.scoped {
        val docs = spark.read.parquet(sf() + "/documents.parquet")
        TextDedup.shingleSets(docs, "doc_id", "text", 3).count()
        assert(Staging.registered === 1)
        throw new RuntimeException("boom")
      }
    }
    assert(Staging.registered === 0)
  }
}
