package graft

import graft.operators.CommitLog

/** Unit contract of the atomic batch-commit protocol, independent of
  * the index machinery (StreamingSpec proves the composed behavior):
  * replay detection, crash-debris invisibility, numeric batch order,
  * empty-batch commits, and log clearing. */
class CommitLogSpec extends SparkSpec {

  import spark.implicits._

  test("commit is exactly-once per id, numeric-ordered, and clears cleanly") {
    val table = "graft_commitlog_unit"
    CommitLog.clear(spark, table)
    def write(n: Int)(dir: String): Unit =
      (1 to n).toDF("x").write.parquet(dir)
    // first commit runs the write and reports true; replay reports
    // false and runs NOTHING (the write fn would throw if invoked)
    assert(CommitLog.commit(spark, table, 7L)(write(3)))
    assert(!CommitLog.commit(spark, table, 7L)(_ =>
      fail("replayed batch id must not re-run the write")))
    assert(CommitLog.isCommitted(spark, table, 7L))
    assert(!CommitLog.isCommitted(spark, table, 8L))
    // batch ids order NUMERICALLY, not lexicographically (10 > 9)
    Seq(10L, 2L, 9L).foreach(id =>
      assert(CommitLog.commit(spark, table, id)(write(1))))
    assert(CommitLog.committedBatches(spark, table) === Seq(2L, 7L, 9L, 10L))
    // side rows see every committed batch exactly once
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.IntegerType)))
    assert(CommitLog.sideRows(spark, table, schema).get.count() === 6L)
    CommitLog.clear(spark, table)
    assert(CommitLog.committedBatches(spark, table).isEmpty)
    assert(CommitLog.sideRows(spark, table, schema).isEmpty)
  }

  test("a crashed attempt leaves nothing visible; the retry rewrites its debris") {
    val table = "graft_commitlog_crash"
    CommitLog.clear(spark, table)
    // crash AFTER the data write, BEFORE the rename — the old ledger
    // protocol's fatal window
    intercept[RuntimeException] {
      CommitLog.commit(spark, table, 0L) { dir =>
        (1 to 100).toDF("x").write.parquet(dir)
        throw new RuntimeException("boom")
      }
    }
    assert(!CommitLog.isCommitted(spark, table, 0L))
    assert(CommitLog.committedBatches(spark, table).isEmpty)
    // retry with DIFFERENT (smaller) content: the stale staging debris
    // must be cleared, not merged — exactly the retried batch commits
    assert(CommitLog.commit(spark, table, 0L) { dir =>
      (1 to 5).toDF("x").write.parquet(dir)
    })
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.IntegerType)))
    assert(CommitLog.sideRows(spark, table, schema).get.count() === 5L)
    // empty batches commit a visible (empty) batch directory
    assert(CommitLog.commit(spark, table, 1L) { dir =>
      spark.emptyDataset[Int].toDF("x").write.parquet(dir)
    })
    assert(CommitLog.committedBatches(spark, table) === Seq(0L, 1L))
    assert(CommitLog.sideRows(spark, table, schema).get.count() === 5L)
    CommitLog.clear(spark, table)
  }
}
