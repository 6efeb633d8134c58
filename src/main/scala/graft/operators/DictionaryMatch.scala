package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
   * Tag every document against the dictionary: one broadcast automaton,
   * one map-only corpus pass. Matching is over `lower(text)` with
   * keywords expected lowercase (the corpus-normalization convention
   * of the dedup family). Output per document:
   * `(doc_id, n_hits, n_keywords, flagged)` — total occurrences,
   * distinct keywords seen, any-hit flag.
   */
  def tag(docs: DataFrame, idCol: String, textCol: String,
      keywords: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val b = spark.sparkContext.broadcast(build(keywords))
    // NULL text tags as zero hits (the doc still appears — dropping it
    // would silently shrink the corpus), matching the oracle's
    // behavior on an empty string
    docs.select(col(idCol).as("id"),
        lower(coalesce(col(textCol), lit(""))).as("t"))
      .as[(Long, String)]
      .map { case (id, t) =>
        val (hits, distinct) = b.value.scan(t)
        (id, hits, distinct.toLong, hits > 0)
      }
      .toDF("doc_id", "n_hits", "n_keywords", "flagged")
  }
}
