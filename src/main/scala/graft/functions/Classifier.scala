package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

object ClassifierKernel {

  /** Σ weight(f) − 1000·|f| over the unigram+bigram feature bag of a
    * token array, streamed — one thread-local MessageDigest, no feature
    * array, no per-feature string allocation (bigram bytes feed the
    * digest as `left ' ' right`, exactly as `concat_ws(" ", …)` renders
    * them).
    *
    * weight(f) = (first 4 md5 digest bytes as an unsigned 32-bit
    * big-endian integer) % 2001 — bit-identical to the composed
    * `conv(substring(md5(f), 1, 8), 16, 10) % 2001` (the first 8
    * lowercase-hex chars ARE the first 4 digest bytes).
    *
    * NULL semantics mirror the composed aggregate fold: a NULL token
    * array → NULL (`size`/`aggregate` of NULL); a NULL ELEMENT poisons
    * the whole sum (md5(NULL) = NULL, acc + NULL = NULL) → NULL —
    * unreachable from [[GraftTokens]] (containsNull = false) but kept
    * for contract equality with the composed baseline. Returns a boxed
    * java.lang.Long or null.
    */
  def logitMicro(toks: ArrayData): java.lang.Long = {
    if (toks == null) return null
    val digest = HashKernels.mdLocal.get()
    val n = toks.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      val u = toks.getUTF8String(i)
      if (u == null) return null
      digest.reset()
      digest.update(u.getBytes)
      sum += weightMicro(digest.digest())
      i += 1
    }
    i = 0
    while (i < n - 1) {
      digest.reset()
      digest.update(toks.getUTF8String(i).getBytes)
      digest.update(' '.toByte)
      digest.update(toks.getUTF8String(i + 1).getBytes)
      sum += weightMicro(digest.digest())
      i += 1
    }
    val feats = n.toLong + math.max(0, n - 1).toLong
    java.lang.Long.valueOf(sum - 1000L * feats)
  }

  private def weightMicro(d: Array[Byte]): Long =
    (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % 2001L
}

/** Fused hashed-linear-classifier logit — the t68 hot path: replaces
  * `aggregate(concat(t, grams(t, 2)), 0L, (acc, f) -> acc +
  * conv(substring(md5(f), 1, 8), 16, 10) % 2001) - 1000 * size(feats)`,
  * whose interpreted higher-order fold allocates a bigram string and a
  * hex string per feature, with one walk over the token array.
  * CONTRACT-IDENTICAL to the composed form
  * ([[graft.operators.TextAnalysis.classifierLogitMicro]] over
  * [[graft.operators.TextAnalysis.classifierFeatures]]) — spec-asserted
  * byte equality, so the t68 DuckDB gate holds unchanged. */
case class ClassifierLogit(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_classifier_logit"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${child.dataType.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val r = ClassifierKernel.logitMicro(
      child.eval(input).asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val tmp = ctx.freshName("logit")
    ev.copy(code = code"""
      |${childGen.code}
      |java.lang.Long $tmp = graft.functions.ClassifierKernel.logitMicro(
      |  ${childGen.isNull} ? null : ${childGen.value});
      |boolean ${ev.isNull} = $tmp == null;
      |long ${ev.value} = ${ev.isNull} ? -1L : $tmp.longValue();
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ClassifierLogit =
    copy(child = newChild)
}

object ClassifierLogit {
  /** Column-API entry: classifier micro-logit over a token array. */
  def apply(toks: Column): Column =
    bridge.column(ClassifierLogit(bridge.expression(toks)))
}
