package graft

import org.scalatest.funsuite.AnyFunSuite

class AuditUtilSpec extends AnyFunSuite {

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
