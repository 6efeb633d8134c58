package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fuzzy string join — edit-distance matching between two relations
 * without a cross join, the entity-resolution / record-linkage
 * primitive a training-data pipeline needs for source reconciliation
 * (the string cousin of the embedding near-dup family).
 *
 * Algorithm: PassJoin-style segment blocking (Li, Deng & Feng,
 * VLDB 2011) with a levenshtein verify:
 *
 *   1. the INDEX side splits each string into `maxDist + 1` balanced
 *      contiguous segments. PIGEONHOLE completeness: `maxDist` edits
 *      cannot touch all `maxDist + 1` segments, so any string within
 *      edit distance `maxDist` contains at least one segment EXACTLY,
 *      and that occurrence's position shifts by at most `maxDist`
 *      from the segment's home position;
 *   2. the PROBE side emits, for every candidate index LENGTH in
 *      `[|q| − d, |q| + d]`, every segment slot, and every shift in
 *      `[−d, +d]`, the corresponding substring of `q` — a CONSTANT
 *      ≤ (2d+1)²·(d+1) keys per row (27 at d = 1, 75 at d = 2),
 *      never a function of corpus size;
 *   3. candidates meet in ONE equi-join on `(index length, segment
 *      slot, segment text)` — the discriminative key is the segment
 *      TEXT, so the join hash-partitions by content (no quadratic
 *      blowup on shared prefixes, the q-gram-blocking failure mode) —
 *      and only candidates pay the `levenshtein` verify (Spark's
 *      builtin, unit costs, identical to DuckDB's, so the t79 gate
 *      compares pairs AND distances integer-exactly).
 *
 * Strings shorter than the segment count route through a dedicated
 * `(slot = −1, length, "")` key (a probe emits it only when the
 * target length is ≤ `maxDist`, which requires `|q| ≤ 2d`), keeping
 * completeness without empty-segment key explosions.
 *
 * Scale shape: index explodes ×(d+1), probe ×≤(2d+1)²(d+1); one
 * shuffle each into the equi-join; `distinct` bounds duplicate
 * candidates (a pair can meet on several segments); verification is
 * map-side on candidates only. AQE absorbs the skew of a
 * pathologically frequent segment.
 */
object FuzzyJoin {

  /** Integer floor division for non-negative length arithmetic. */
  private def divI(a: Column, n: Int): Column =
    (a / lit(n)).cast("int")

  /**
   * Fuzzy join `left` × `right` on `levenshtein(leftStr, rightStr) ≤
   * maxDist`. Returns (left_id, right_id, dist), one row per
   * matching pair, exactly the pairs a length-filtered cross join
   * with the same predicate yields.
   *
   * DEDUPE-BEFORE-VERIFY: blocking, candidate generation and the
   * levenshtein verify all run over the DISTINCT strings of each
   * side; the verified (string, string, dist) pairs expand back to id
   * pairs through two equi-joins at the end. On corpora with heavy
   * value duplication (the t79 part table has 64 distinct names in
   * 20k rows) this collapses the edit-distance work from
   * O(row-pair candidates) to O(distinct-pair candidates) — the
   * output id-pair count is the ANSWER's size and stays whatever the
   * data dictates.
   */
  def fuzzyJoin(left: DataFrame, leftIdCol: String, leftStrCol: String,
      right: DataFrame, rightIdCol: String, rightStrCol: String,
      maxDist: Int): DataFrame = {
    val verified = fuzzyJoinStrings(
      left.select(col(leftStrCol).as("q")),
      right.select(col(rightStrCol).as("s")), maxDist)
    verified
      .join(left.select(col(leftIdCol).as("lid"),
        col(leftStrCol).as("q")), Seq("q"))
      .join(right.select(col(rightIdCol).as("rid"),
        col(rightStrCol).as("s")), Seq("s"))
      .select(col("lid").as("left_id"), col("rid").as("right_id"),
        col("dist"))
  }

  /**
   * The DISTINCT-STRING core of [[fuzzyJoin]]: every (q, s, dist)
   * string pair within `maxDist`, one row per distinct pair. On
   * corpora with heavy value duplication this IS the answer a
   * pipeline should persist — the id-pair expansion is a trivial
   * rejoin whose size is dictated by the data (quadratic in
   * duplication), not by the algorithm: the t79 10× audit measured
   * 207 s for the 209M-row id expansion vs sub-second for this
   * distinct-pair core on the same corpus.
   */
  def fuzzyJoinStrings(left: DataFrame, right: DataFrame,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    val rKeys = indexEntries(right, maxDist)
    val lKeys = probeEntries(left, maxDist)
    // ---- distinct candidates meet on (tl, slot, seg); verify once
    // per distinct string pair ----
    verify(lKeys.join(rKeys, Seq("tl", "slot", "seg")), maxDist)
  }

  private def verify(candidates: DataFrame, maxDist: Int): DataFrame =
    candidates
      .select(col("q"), col("s"))
      .distinct()
      .withColumn("dist", levenshtein(col("q"), col("s")).cast("long"))
      .filter(col("dist") <= maxDist)

  /** The INDEX side's segment entries over the DISTINCT strings of
    * `right`'s first column: one row per (s, slot, tl, seg) blocking
    * key — balanced-split arithmetic (segment i, 0-based, has length
    * base + (i < extra) and 0-based start i*base + min(i, extra)). */
  private def indexEntries(right: DataFrame, maxDist: Int): DataFrame = {
    val k = maxDist + 1
    val r = right.select(col(right.columns.head).as("s")).distinct()
      .withColumn("tl", length(col("s")))
    val rEntries: Seq[Column] = (0 until k).map { i =>
      val b = divI(col("tl"), k)
      val extra = col("tl") % lit(k)
      val li = b + when(lit(i) < extra, 1).otherwise(0)
      val pi = lit(i) * b + least(lit(i), extra)
      when(col("tl") > maxDist,
        struct(lit(i).as("slot"), col("tl").as("tl2"),
          substr(col("s"), pi + 1, li).as("seg")))
    } :+ when(col("tl") <= maxDist,
      struct(lit(-1).as("slot"), col("tl").as("tl2"), lit("").as("seg")))
    r.select(col("s"),
        explode(filter(array(rEntries: _*), e => e.isNotNull)).as("e"))
      .select(col("s"), col("e.slot").as("slot"),
        col("e.tl2").as("tl"), col("e.seg").as("seg"))
  }

  /** The PROBE side's candidate entries over the DISTINCT strings of
    * `left`'s first column: every (index length, slot, shift)
    * substring — a CONSTANT ≤ (2d+1)²(d+1) keys per string. */
  private def probeEntries(left: DataFrame, maxDist: Int): DataFrame = {
    val k = maxDist + 1
    val l = left.select(col(left.columns.head).as("q")).distinct()
      .withColumn("lq", length(col("q")))
    // ONE parametric lambda over a LITERAL (c, slot, shift) combo array
    // instead of (2d+1)²(d+1) inlined struct expressions (r22): the
    // unrolled form was 80 when/struct/substr trees at d = 2, and the
    // analyzer/optimizer/codegen walk of that plan was the dominant
    // cost of the d = 2 query (ProfileQuery: 1.0–1.4 s of driver gap
    // per rep vs ~0.6 s of job time). The lambda computes the
    // IDENTICAL balanced-split arithmetic from the combo fields, so
    // the emitted (slot, tl, seg) entry set — and with it every
    // candidate and verified pair — is unchanged (t79–t82 gates).
    val combos: List[(Int, Int, Int)] = (for {
      c <- -maxDist to maxDist // candidate index length = |q| + c
      i <- 0 until k           // segment slot
      dlt <- -maxDist to maxDist // position shift
    } yield (c, i, dlt)).toList
    val mainEntries = transform(typedLit(combos), t => {
      val c = t.getField("_1"); val i = t.getField("_2")
      val dlt = t.getField("_3")
      val tl = col("lq") + c
      val b = divI(tl, k)
      val extra = tl % lit(k)
      val li = b + when(i < extra, 1).otherwise(0)
      val pi = i * b + least(i, extra) + dlt
      when(tl > maxDist && li >= 1 && pi >= 0 && pi + li <= col("lq"),
        struct(i.as("slot"), tl.as("tl2"),
          substr(col("q"), pi + 1, li).as("seg")))
    })
    val shortEntries = transform(typedLit((-maxDist to maxDist).toList), c => {
      val tl = col("lq") + c
      when(tl >= 0 && tl <= maxDist,
        struct(lit(-1).as("slot"), tl.as("tl2"), lit("").as("seg")))
    })
    l.select(col("q"),
        explode(array_distinct(
          filter(concat(mainEntries, shortEntries), e => e.isNotNull))).as("e"))
      .select(col("q"), col("e.slot").as("slot"),
        col("e.tl2").as("tl"), col("e.seg").as("seg"))
  }

  /** The packed single-column blocking key — `tl#slot#seg` parses
    * bijectively (two numeric fields then the raw segment), so
    * equality on it IS equality on the triple, and ONE key column is
    * what the bucketed table and its sort order index. */
  private def packedKey: Column =
    concat_ws("#", col("tl"), col("slot"), col("seg"))

  /**
   * Persist the fuzzy-join SEGMENT INDEX — the build-once/probe-many
   * form the other retrieval modalities already have (BM25 t46,
   * IVF+SQ8 t40, PQ t45), closing the string modality:
   *   - `table`: (bkey, s) — one row per segment entry of the
   *     DISTINCT index strings, `bkey` the packed `tl#slot#seg` key,
   *     BUCKETED AND SORTED by it ([[Ddl.writeBucketedTable]]) so the
   *     index side of every probe is pre-hash-partitioned: the probe
   *     plan shuffles only the (tiny) probe keys, the index scan is
   *     exchange-free;
   *   - `table_meta`: the build's `max_dist` (the segment count is a
   *     BUILD property — a probe must replay the same split
   *     arithmetic, so it reads the distance from here).
   * Rerunnable: existing tables are dropped first.
   */
  def writeSegmentIndex(right: DataFrame, strCol: String, table: String,
      maxDist: Int, numBuckets: Int = 8): Unit = {
    require(maxDist >= 1, "maxDist must be >= 1")
    val spark = right.sparkSession
    val rKeys = indexEntries(right.select(col(strCol)), maxDist)
      .select(packedKey.as("bkey"), col("s"))
    Ddl.writeBucketedTable(rKeys, table, "bkey", numBuckets)
    Ddl.dropTableAndLocation(spark, s"${table}_meta")
    spark.range(1).select(lit(maxDist).as("max_dist"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(s"${table}_meta")
  }

  /** Probe a persisted [[writeSegmentIndex]] table with `left`'s
    * first column: identical candidate generation and levenshtein
    * verify as the in-query [[fuzzyJoinStrings]] — (q, s, dist), one
    * row per distinct in-distance string pair, equal to the in-query
    * answer on the same corpus by construction (t82 gates it against
    * t80's oracle verbatim). */
  def probeSegmentIndex(spark: org.apache.spark.sql.SparkSession,
      table: String, left: DataFrame): DataFrame = {
    val maxDist = spark.table(s"${table}_meta")
      .collect().head.getInt(0)
    val lKeys = probeEntries(left, maxDist)
      .select(packedKey.as("bkey"), col("q"))
    verify(lKeys.join(spark.table(table), Seq("bkey")), maxDist)
  }
}
