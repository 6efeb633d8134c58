package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Multi-keyword DICTIONARY MATCHING via Aho–Corasick (Aho & Corasick,
 * CACM 1975) — the blocklist/taxonomy-tagging primitive of a corpus
 * pipeline (C4's bad-words filter, policy blocklists, keyword
 * taxonomies), built for the regime where the dictionary is LARGE:
 * one automaton pass costs O(|text| + matches) regardless of keyword
 * count, where the naive per-keyword scan is O(|text|·K) and a regex
 * alternation backtracks per position. The automaton is built ONCE on
 * the driver from the keyword list (dictionary-sized metadata, the
 * ANN-centroid class) and broadcast; tagging is one map-only pass over
 * the corpus — no shuffle at all until the caller aggregates.
 *
 * Match semantics: EVERY occurrence of every keyword is reported —
 * overlapping occurrences included, nested keywords included (the
 * output-link closure: "scan" ending at a position also emits "can").
 * This is the textbook AC contract and what the differential oracle
 * replays with a per-position substring probe.
 */
object DictionaryMatch {

  /** Immutable, broadcast-friendly automaton: per-node goto maps,
    * BFS-computed failure links, and output lists flattened through
    * their failure closure (so a scan emits every match at each
    * position without walking the fail chain). */
  final class Automaton private[DictionaryMatch] (
      gotos: Array[Map[Char, Int]], fail: Array[Int],
      outs: Array[Array[Int]], val numKeywords: Int)
      extends Serializable {

    /** All-occurrence scan: returns (total matches, distinct keywords
      * seen). */
    def scan(text: String): (Long, Int) = {
      var s = 0
      var total = 0L
      val seen = new Array[Boolean](numKeywords)
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        var cur = s
        while (cur != 0 && !gotos(cur).contains(c)) cur = fail(cur)
        s = gotos(cur).getOrElse(c, 0)
        val o = outs(s)
        var j = 0
        while (j < o.length) {
          total += 1
          seen(o(j)) = true
          j += 1
        }
        i += 1
      }
      var d = 0
      var k = 0
      while (k < seen.length) { if (seen(k)) d += 1; k += 1 }
      (total, d)
    }

    /** [[scan]] in the expression kernel's shape: one struct row
      * `(n_hits, n_keywords)`. */
    def scanRow(text: UTF8String): GenericInternalRow = {
      val (hits, distinct) = scan(text.toString)
      new GenericInternalRow(Array[Any](hits, distinct.toLong))
    }
  }

  /** Build the automaton: trie insert, BFS failure links, output-list
    * closure (`out(v) ++= out(fail(v))` in BFS order — fail(v) is
    * strictly shallower, so its list is already closed). */
  def build(keywords: Seq[String]): Automaton = {
    require(keywords.nonEmpty && keywords.forall(_.nonEmpty),
      "need at least one non-empty keyword")
    val kws = keywords.toIndexedSeq
    val children = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val out = mutable.ArrayBuffer(mutable.ListBuffer.empty[Int])
    kws.zipWithIndex.foreach { case (w, ki) =>
      var s = 0
      w.foreach { c =>
        s = children(s).getOrElseUpdate(c, {
          children += mutable.Map.empty
          out += mutable.ListBuffer.empty
          children.length - 1
        })
      }
      out(s) += ki
    }
    val n = children.length
    val fail = new Array[Int](n)
    val queue = mutable.Queue.empty[Int]
    children(0).values.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (c, v) =>
        queue += v
        var f = fail(u)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(v) = children(f).getOrElse(c, 0) match {
          case `v` => 0 // only possible through the root self-probe
          case w => w
        }
        out(v) ++= out(fail(v))
      }
    }
    new Automaton(children.map(_.toMap).toArray, fail,
      out.map(_.toArray).toArray, kws.length)
  }

  /**
   * Tag every document against the dictionary: ONE map-only corpus
   * pass through the native expression kernel ([[DictTag]] — the
   * functions-not-UDFs tier: no typed-encoder round trip, the scan
   * inlines into whole-stage codegen via a plan reference object, and
   * the automaton ships once per stage inside the broadcast task
   * binary, not once per row group). Matching is over `lower(text)`
   * with keywords expected lowercase (the corpus-normalization
   * convention of the dedup family); NULL text tags as zero hits (the
   * doc still appears — dropping it would silently shrink the
   * corpus). Output per document:
   * `(doc_id, n_hits, n_keywords, flagged)` — total occurrences,
   * distinct keywords seen, any-hit flag.
   */
  def tag(docs: DataFrame, idCol: String, textCol: String,
      keywords: Seq[String]): DataFrame = {
    val auto = build(keywords)
    // struct unwrap in a SEPARATE projection: CollapseProject refuses
    // to duplicate non-cheap expressions, so the kernel evaluates once
    // per row (the ShingleLshBands layout rule)
    docs.select(col(idCol).as("doc_id"),
        bridge.column(DictTag(bridge.expression(
          lower(coalesce(col(textCol), lit("")))), auto)).as("s"))
      .select(col("doc_id"), col("s.n_hits").as("n_hits"),
        col("s.n_keywords").as("n_keywords"),
        (col("s.n_hits") > 0).as("flagged"))
  }
}

/** The dictionary scan as one fused expression node: input the
  * (already lowercased) text, output `struct(n_hits, n_keywords)`.
  * The automaton is expression STATE, reaching generated code through
  * a plan reference object (`addReferenceObj` — the Catalyst pattern
  * for model-carrying kernels). */
case class DictTag(child: Expression,
    automaton: DictionaryMatch.Automaton) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_hits", LongType, nullable = false),
    StructField("n_keywords", LongType, nullable = false)))
  override def prettyName: String = "graft_dict_tag"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    automaton.scanRow(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val auto = ctx.addReferenceObj("dictAutomaton", automaton,
      classOf[DictionaryMatch.Automaton].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $auto.scanRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DictTag =
    copy(child = newChild)
}
