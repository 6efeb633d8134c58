package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/**
 * Tokenizer-model INTERCHANGE in the public text formats — the export
 * half the persisted [[TokenizerStore]] (catalog tables, t107–t110)
 * deliberately does not cover: a model trained here must round-trip
 * OUT of the engine into the formats other tokenizer stacks read, and
 * models trained elsewhere must load. Three formats, one per family:
 *
 *   - BPE: `merges.txt` — the Sennrich/HuggingFace shape: a
 *     `#version:` header line, then one `left right` pair per line in
 *     RANK ORDER (the line index IS the rule's rank). Pair counts are
 *     NOT part of the public format; an imported merge carries
 *     count 0, which is fine because rank-order replay
 *     ([[BpeTrain.encodeWords]]) never reads counts. A companion
 *     `vocab.json` (`{"token": id}`, ids dense in the given order) is
 *     written for stacks that require the pair, from the
 *     caller-supplied symbol list.
 *   - Unigram-LM: SentencePiece-style `piece<TAB>score` TSV, one row
 *     per piece. DOCUMENTED DEPARTURE: SentencePiece scores are
 *     natural-log floats; this engine's scores are INTEGER micro-log10
 *     (the cross-engine fixed-point currency every gate uses), and the
 *     TSV carries them verbatim — exact round-trip, no float parsing.
 *     Usage counts are not part of the format (imported pieces carry
 *     usage 0; encoding reads only scores).
 *   - WordPiece: `vocab.txt` — BERT's format, one piece per line,
 *     `##` continuations included, UTF-8 byte order for determinism.
 *
 * All three are driver-side vocab-sized files (the ANN-centroid
 * metadata class). Pieces never contain whitespace (the tokenizer's
 * own `tokens()` splits on it), enforced loudly at export so a
 * malformed model cannot write an unparseable file. Gates: t113–t115
 * pin export→import→encode equality against the SAME DuckDB replays
 * that gate the directly-trained encodes.
 */
object TokenizerInterchange {

  private def write(path: String, lines: Seq[String]): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, lines.asJava, StandardCharsets.UTF_8)
    ()
  }

  private def readLines(path: String): Seq[String] =
    Files.readAllLines(Paths.get(path), StandardCharsets.UTF_8)
      .asScala.toSeq

  private def requireNoWs(s: String, what: String): Unit =
    require(s.nonEmpty && !s.exists(_.isWhitespace),
      s"$what contains whitespace or is empty — not representable in " +
        s"the line-oriented interchange formats: '$s'")

  // ------------------------------------------------------------------
  // BPE — merges.txt + vocab.json
  // ------------------------------------------------------------------

  val MergesHeader = "#version: 0.2"

  def exportBpeMerges(path: String, merges: Seq[BpeTrain.Merge]): Unit = {
    merges.foreach { m =>
      requireNoWs(m.left, "BPE merge left")
      requireNoWs(m.right, "BPE merge right")
    }
    write(path, MergesHeader +:
      merges.sortBy(_.round).map(m => s"${m.left} ${m.right}"))
  }

  /** Parse `merges.txt`: rank = position among DATA lines (1-based),
    * counts 0 (not in the public format — rank-order replay never
    * reads them). Header lines (`#...`) and blank lines are skipped,
    * as HF's reader does — error messages cite the ACTUAL file line
    * (header and blanks included), not the post-filter index. */
  def importBpeMerges(path: String): Seq[BpeTrain.Merge] =
    readLines(path).zipWithIndex
      .filterNot { case (l, _) => l.isEmpty || l.startsWith("#") }
      .zipWithIndex.map { case ((line, fileIdx), rank) =>
        line.split(' ') match {
          case Array(l, r) => BpeTrain.Merge(rank + 1, l, r, 0L)
          case _ => throw new IllegalArgumentException(
            s"merges.txt line ${fileIdx + 1} is not 'left right': '$line'")
        }
      }

  /** `{"token": id}` with ids dense in the given order — the GPT-2 /
    * HF companion shape. JSON string escaping covers the quote,
    * backslash and control range (tokens are whitespace-free but may
    * contain any other glyph). */
  def exportVocabJson(path: String, vocab: Seq[String]): Unit = {
    vocab.foreach(requireNoWs(_, "vocab token"))
    require(vocab.distinct.length == vocab.length,
      "vocab.json tokens must be unique")
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    write(path, Seq(vocab.zipWithIndex
      .map { case (t, i) => s""""${esc(t)}": $i""" }
      .mkString("{", ", ", "}")))
  }

  // ------------------------------------------------------------------
  // Unigram-LM — SentencePiece-style piece/score TSV
  // ------------------------------------------------------------------

  def exportUnigramTsv(path: String, vocab: Seq[UnigramLm.Piece]): Unit = {
    vocab.foreach(p => requireNoWs(p.piece, "unigram piece"))
    write(path, vocab
      .sortWith((a, b) => BpeTrain.utf8Less(a.piece, b.piece))
      .map(p => s"${p.piece}\t${p.scoreMicro}"))
  }

  /** Parse the piece/score TSV. Imported pieces carry usage 0 — the
    * interchange format, like SentencePiece's, persists only what
    * encoding needs (piece and score). Blank lines are skipped; error
    * messages cite the ACTUAL file line, and a non-integer score
    * fails with the same located loudness as a wrong column count. */
  def importUnigramTsv(path: String): Seq[UnigramLm.Piece] =
    readLines(path).zipWithIndex
      .filter { case (l, _) => l.nonEmpty }
      .map { case (line, i) =>
        line.split('\t') match {
          case Array(p, s) => UnigramLm.Piece(p, 0L,
            s.toLongOption.getOrElse(throw new IllegalArgumentException(
              s"piece TSV line ${i + 1} has a non-integer score '$s' " +
                "(expected a micro-log10 integer)")))
          case _ => throw new IllegalArgumentException(
            s"piece TSV line ${i + 1} is not 'piece<TAB>score': '$line'")
        }
      }

  // ------------------------------------------------------------------
  // WordPiece — vocab.txt
  // ------------------------------------------------------------------

  def exportWordPieceVocab(path: String, vocab: Set[String]): Unit = {
    vocab.foreach(requireNoWs(_, "WordPiece piece"))
    write(path, vocab.toSeq.sortWith(BpeTrain.utf8Less))
  }

  def importWordPieceVocab(path: String): Set[String] =
    readLines(path).filter(_.nonEmpty).toSet
}
