package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query implementations live in [[Queries]]; this object is the stable
  * façade the harness calls. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the full ingest-enrichment
    * projection (lineage envelope + dual canonical hashes) over lineitem.
    * Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.f1_enrich_lineitem.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map { case (name, q) => name -> q.run }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    Queries.all.collect { case (name, q) if q.oracle.isDefined => name -> q.oracle.get }
}
