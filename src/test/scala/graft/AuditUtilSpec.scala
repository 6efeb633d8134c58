package graft

import org.scalatest.funsuite.AnyFunSuite

class AuditUtilSpec extends AnyFunSuite with SparkSpec {

  test("groupsByAttr keys on a grouping ATTRIBUTE, not struct fields or plan text") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 20L)).toDF("user_id", "bkt")
    // the bucketed-twin shape: groupBy over a real bkt attribute
    assert(AuditUtil.groupsByAttr(df.groupBy("user_id", "bkt").count()))
    // the round-16 advisor's false-positive risks: a struct FIELD named
    // bkt inside an aggregate (the skip fold's state shape) ...
    assert(!AuditUtil.groupsByAttr(
      Seq((1L, 10L)).toDF("user_id", "b")
        .withColumn("st", org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.col("b").as("bkt")))
        .groupBy("user_id").agg(
          org.apache.spark.sql.functions.collect_list("st"))))
    // ... an attribute merely NAMED like bkt elsewhere in the plan ...
    assert(!AuditUtil.groupsByAttr(
      df.withColumnRenamed("bkt", "xbkt").groupBy("user_id").count()))
    // ... and an ALIAS to bkt in the grouping (not the twins' shape)
    assert(!AuditUtil.groupsByAttr(
      df.groupBy(org.apache.spark.sql.functions.col("user_id").as("bkt"))
        .count()))
  }

  private def withFrame(t: Throwable, cls: String, m: String): Throwable = {
    t.setStackTrace(Array(new StackTraceElement(cls, m, "X.java", 1)))
    t
  }

  test("rowLimitHit matches the BufferHolder.grow frame and Spark's exact message, wrapped at any depth — not a bare mention") {
    // the real shape: UnsupportedOperationException raised IN
    // BufferHolder.grow, wrapped in a driver-side SparkException chain
    val real = withFrame(new UnsupportedOperationException(
      "Cannot grow BufferHolder by size 1060 because the size after " +
        "growing exceeds size limitation 2147483632"),
      "org.apache.spark.sql.catalyst.expressions.codegen.BufferHolder",
      "grow")
    val wrapped = new RuntimeException("job aborted",
      new RuntimeException("task failed", real))
    assert(AuditUtil.rowLimitHit(wrapped))
    // message-only fallback (frames dropped in executor->driver transit)
    val msgOnly = withFrame(new RuntimeException(
      "Cannot grow BufferHolder by size 8 because ..."),
      "some.other.Class", "run")
    assert(AuditUtil.rowLimitHit(msgOnly))
    // the round-15 advisor's false-positive: an unrelated failure that
    // merely MENTIONS BufferHolder must NOT be reported as the 2GB wall
    val mention = withFrame(new RuntimeException(
      "config error: see BufferHolder docs"), "some.other.Class", "run")
    assert(!AuditUtil.rowLimitHit(mention))
    // cycle-safe walk
    val a = new RuntimeException("a")
    val b = new RuntimeException("b", a)
    a.initCause(b)
    assert(!AuditUtil.rowLimitHit(a))
  }
}
