package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused language-marker score vector — the t8/t65/t18/p1 hot path:
  * replaces L interpreted `filter(toks, isin(markers))` walks (L
  * languages × M markers of string compares per token) with ONE walk
  * and a hash lookup per token carrying a per-language bitmask.
  *
  * CONTRACT-IDENTICAL to the composed
  * `array(TextAnalysis.langScores(toks).map(_._2): _*)`
  * (KernelPropertySpec byte-equality): element i =
  * `count(tokens ∈ markers_i) * 1.0 / n` with the same int→double
  * conversion and division, `0.0` when the array is empty — and a NULL
  * token array yields all-zero scores, exactly the composed
  * `when(size > 0, …).otherwise(0.0)` fall-through (size(NULL) is
  * NULL, `NULL > 0` is false-ish). NULL ELEMENTS don't count as
  * markers but do count in `n`, mirroring `isin`'s null semantics
  * under `filter` and `size`. */
case class LangMarkerScores(child: Expression, markers: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_lang_scores"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if markers.nonEmpty && markers.length <= 31 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> and 1..31 marker sets, got " +
        s"${child.dataType.simpleString}, ${markers.length} sets")
  }

  override def nullable: Boolean = false

  @transient private lazy val masks: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    markers.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach { w =>
        val u = UTF8String.fromString(w)
        val prev = m.get(u)
        m.put(u, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  def compute(toks: ArrayData): ArrayData = {
    val l = markers.length
    val counts = new Array[Long](l)
    var n = 0
    if (toks != null) {
      n = toks.numElements()
      var i = 0
      while (i < n) {
        val u = toks.getUTF8String(i)
        if (u != null) {
          val mk = masks.get(u)
          if (mk != null) {
            var j = 0
            val mv = mk.intValue()
            while (j < l) {
              if ((mv & (1 << j)) != 0) counts(j) += 1
              j += 1
            }
          }
        }
        i += 1
      }
    }
    val out = new Array[Any](l)
    var j = 0
    while (j < l) {
      out(j) = if (n > 0) counts(j) * 1.0 / n else 0.0
      j += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val self = ctx.addReferenceObj("langScores", this,
      classOf[LangMarkerScores].getName)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen
      .CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      |${childGen.code}
      |$javaType ${ev.value} = $self.compute(
      |  ${childGen.isNull} ? null : ${childGen.value});
      |""".stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LangMarkerScores =
    copy(child = newChild)
}

object LangMarkerScores {
  /** Column-API entry: per-marker-set score vector over a token array. */
  def apply(toks: Column, markers: Seq[Seq[String]]): Column =
    bridge.column(LangMarkerScores(bridge.expression(toks), markers))
}
