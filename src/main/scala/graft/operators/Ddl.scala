package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.TypeMapping

/**
 * Generated DDL + partitioned-parquet sink (SURVEY §2 O3–O4, S6).
 *
 * The reference generates `CREATE TABLE IF NOT EXISTS … WITH
 * (format-version=2, partitioning=month(load_dttm), parquet, zstd,
 * target-file-size 512MB)` (FB:884–909) and writes via `INSERT INTO …
 * SELECT` (FB:914–935). Spark-natively: DDL falls out of
 * `StructType.toDDL`; the month(load_dttm) partition transform becomes a
 * derived `load_month` column (plain parquet has no transform
 * partitioning — an Iceberg catalog would accept `PARTITIONED BY
 * (months(load_dttm))` unchanged); zstd + file-size-targeting are writer
 * options.
 *
 * Scale note (100 TB): month(load_dttm) yields one partition per load
 * month — analytic reads prune on it (comment FB:900: "for StarRocks
 * analytical reads"). 512 MB file targeting keeps file counts sane at
 * scale; with AQE enabled Spark coalesces shuffle output to match.
 */
object Ddl {
  val ParquetCompression = "zstd"
  val TargetFileSizeBytes: Long = 512L * 1024 * 1024 // FB:80
  val PartitionColumn = "load_month"

  /** O3: CREATE TABLE statement for the enriched schema (FB:884–909). */
  def buildCreateTableSql(table: String, schema: StructType): String = {
    val cols = schema.fields.map { f =>
      val notNull = if (f.nullable) "" else " NOT NULL"
      s"  `${f.name}` ${TypeMapping.ddlType(f.dataType)}$notNull"
    }.mkString(",\n")
    s"""CREATE TABLE IF NOT EXISTS `$table` (
       |$cols,
       |  `$PartitionColumn` STRING
       |)
       |USING parquet
       |PARTITIONED BY (`$PartitionColumn`)
       |TBLPROPERTIES (
       |  'parquet.compression' = '$ParquetCompression',
       |  'write.target-file-size-bytes' = '$TargetFileSizeBytes'
       |)""".stripMargin
  }

  /** S6 + O4: write the enriched frame as month-partitioned zstd parquet.
    * `replace` drops-and-recreates (SaveMode.Overwrite); `append` is
    * create-if-not-exists (FB:254–259). */
  def writePartitioned(
      df: DataFrame,
      path: String,
      mode: SaveMode = SaveMode.Append,
      loadDttmCol: String = "load_dttm"): Unit = {
    df.withColumn(PartitionColumn, date_format(col(loadDttmCol), "yyyy-MM"))
      .write
      .mode(mode)
      .option("compression", ParquetCompression)
      .partitionBy(PartitionColumn)
      .parquet(path)
  }

  /** Read back a table written by [[writePartitioned]]. */
  def readTable(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop(PartitionColumn)
}
