package graft

/**
 * Shared helpers for the audit mains (CrossoverAudit, SkewAudit,
 * SkewAuditR15) — the pieces that must not drift between them.
 */
object AuditUtil {

  /**
   * True iff the failure is the single-UnsafeRow ~2 GB growth wall —
   * one key's whole collected event array exceeding
   * `BufferHolder`'s `Integer.MAX_VALUE - 15` byte limit — which the
   * CEP audits record as the loud `single-exceeded-2GB-row-limit`
   * status (the bucketed twins have no key-sized row and cannot hit
   * it).
   *
   * Detection walks the WHOLE cause chain (the overflow can surface
   * wrapped arbitrarily deep on the driver) and matches the throwing
   * FRAME — `o.a.s.sql.catalyst.expressions.codegen.BufferHolder
   * .grow`, where Spark raises the limit error — rather than a bare
   * message substring, so an unrelated failure that merely MENTIONS
   * BufferHolder is not misreported. A message fallback on Spark's
   * exact wording ("Cannot grow BufferHolder by size") is kept for
   * serialized/re-thrown exceptions whose stack frames were dropped
   * in transit.
   *
   * Version coupling (documented on purpose): both the frame and the
   * wording are Spark 4.x's `BufferHolder.grow`; a Spark upgrade that
   * renames either should fail the SkewAudit spec pinning this
   * helper, not silently change audit statuses.
   */
  def rowLimitHit(e: Throwable): Boolean = {
    var cur = e
    var seen = List.empty[Throwable]
    while (cur != null && !seen.exists(_ eq cur)) {
      val frameHit = cur.getStackTrace.exists(f =>
        f.getClassName.endsWith(".codegen.BufferHolder") &&
          f.getMethodName == "grow")
      val msgHit = Option(cur.getMessage)
        .exists(_.contains("Cannot grow BufferHolder by size"))
      if (frameHit || msgHit) return true
      seen ::= cur
      cur = cur.getCause
    }
    false
  }

  /**
   * True iff the plan behind `df` contains an Aggregate whose
   * GROUPING expressions include an attribute named exactly `name` —
   * the structural signature of the bucketed CEP twins (they all
   * `groupBy(user_id, bkt)` in their segment stage), used by the
   * router audits to report which side an auto-router picked.
   *
   * Structural on purpose: the earlier `toString.contains("bkt#")`
   * sniff could be flipped by any future attribute whose name merely
   * ends in "bkt" or by a plan-printing change; and a bare name match
   * without the Aggregate/grouping context false-positives on struct
   * FIELDS named bkt (the skip fold's state carries one). Attributes
   * only — a grouping expression that merely ALIASES something to
   * `name` is not the twins' shape.
   */
  def groupsByAttr(df: org.apache.spark.sql.DataFrame,
      name: String = "bkt"): Boolean =
    df.queryExecution.analyzed.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.groupingExpressions.exists {
            case att: org.apache.spark.sql.catalyst.expressions.Attribute =>
              att.name == name
            case _ => false
          } => a
    }.nonEmpty
}
