package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) corpus interchange — THE wire format
  * LLM training corpora ship in (one document object per line, gzip per
  * shard). Spark's json source is already distributed, splittable on
  * .jsonl and per-file parallel on .gz shards; this wrapper pins the
  * conventions that make round-trips exact:
  *
  *  - WRITE as `to_json(struct(...))` over an explicit column list into
  *    the `text` sink — field order fixed, so shards are byte-stable
  *    across runs;
  *  - READ with the EXPLICIT target schema, never inference: schema
  *    inference costs an extra full pass at 100 TB and silently widens
  *    types (an all-null shard infers string); `mode=FAILFAST` makes a
  *    malformed line a loud error instead of a silent null row (the
  *    default PERMISSIVE mode is how corpus corruption goes unnoticed).
  *
  * Fidelity is gated end-to-end (`s6_jsonl_roundtrip`): documents →
  * JSONL → read-back must hash-equal the original table in the DuckDB
  * differential, which exercises exactly the hazards that corrupt real
  * corpora — embedded newlines don't split documents (JSON escapes
  * them), unicode survives the escape/unescape cycle, and numeric
  * types come back at declared widths. */
object JsonlCorpus {

  /** Write `df`'s `cols` (in order) as one JSON object per line. */
  def writeJsonl(df: DataFrame, cols: Seq[String], path: String): Unit =
    df.select(to_json(struct(cols.map(col): _*)).as("value"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).text(path)

  /** Read a JSONL corpus with a pinned schema; malformed lines fail
    * loudly rather than degrade to null rows. */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** CSV interchange (RFC 4180 conventions pinned): header on, quote
    * escaping by doubled double-quote (`escape = "` — Spark's default
    * backslash escaping is NOT what spreadsheet/warehouse tooling
    * emits), explicit schema + FAILFAST like [[readJsonl]].
    *
    * Two seams, documented because CSV has them and JSONL does not:
    *   - the EMPTY STRING is indistinguishable from NULL on the wire
    *     (both round-trip to null — JsonlCorpusSpec pins it); ship
    *     JSONL when that distinction matters;
    *   - embedded newlines need `multiLine = true` on read, which
    *     makes a file NON-SPLITTABLE — at 100 TB keep shards bounded
    *     (the writer's per-partition files already are) or strip
    *     newlines upstream. */
  def writeCsv(df: DataFrame, cols: Seq[String], path: String): Unit =
    df.select(cols.map(col): _*)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("header", "true").option("escape", "\"")
      .csv(path)

  def readCsv(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true").option("mode", "FAILFAST")
      .csv(path)
}
