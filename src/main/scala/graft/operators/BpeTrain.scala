package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed BPE merge-rule training (Sennrich, Haddow & Birch, ACL
 * 2016) — the tokenizer-training primitive of an LLM data pipeline,
 * re-expressed for Spark's execution model.
 *
 * The scale insight is the classic one: BPE never needs the corpus
 * after the FIRST pass. One corpus-scale `groupBy(word)` builds the
 * word-frequency table (|vocab| rows — millions, not billions), and
 * every merge round thereafter is a pair-count aggregation plus a
 * map-only rewrite over that table. At 100 TB the corpus is touched
 * once; the R training rounds run on a table that fits in a handful of
 * partitions. The only driver-collected value per round is the argmax
 * pair — one row of index metadata (the watermark-head class).
 *
 * Round semantics (matching the reference algorithm exactly):
 *   - pair counts are ADJACENT-OCCURRENCE counts weighted by word
 *     frequency (overlapping occurrences each count: "aaa" contributes
 *     2 to (a,a));
 *   - the winning pair is (max count, then lexicographically smallest
 *     left, then right) — integer counts + binary string order, so the
 *     choice is deterministic cross-engine;
 *   - the merge applies left-to-right, non-overlapping ("aaaa" + (a,a)
 *     → [aa, aa]), which the fold below gets for free: a merged symbol
 *     `a+b` can never equal `a` (b is non-empty), so it can never seed
 *     a chained merge within the same round.
 *
 * Everything is Catalyst expressions (the apply-merge is an `aggregate`
 * fold over the symbol array — no UDF), and every gated value is an
 * integer or a string, so the DuckDB oracle replays all R rounds
 * bit-exactly (positional window form; see Queries.t66).
 */
object BpeTrain {

  /** One merge rule as learned data. */
  final case class Merge(round: Int, left: String, right: String, count: Long)

  /** Character explosion of `w` as an expression — `transform` over an
    * index sequence with a positional `substring`. Guarded for the
    * empty string (training never sees one — the tokenizer filters
    * empties — but [[encodeWords]] accepts caller words, and Spark's
    * `sequence(0, -1)` counts DOWN instead of yielding []). */
  private def charsOf(w: Column): Column =
    when(length(w) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), length(w) - 1),
        i => substr(w, i + 1, lit(1))))

  /** The GPT-2 `bytes_to_unicode` table (Radford et al. 2019; public
    * in the GPT-2 repo and every byte-level BPE reimplementation):
    * index = byte value, value = the byte's 1-character spelling. The
    * 188 printable non-space bytes (`!`–`~`, `¡`–`¬`, `®`–`ÿ`) spell
    * themselves; the remaining 68 (controls, space, 0x7f, 0xad) shift
    * to code points 256+n in byte order — every byte gets a DISTINCT
    * printable spelling, which is what makes byte-level BPE lossless
    * on arbitrary binary-ish text. */
  val ByteChars: Seq[String] = {
    val keep = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ'))
      .map(_.toInt).toSet
    var n = 0
    (0 until 256).map { b =>
      if (keep(b)) b.toChar.toString
      else { val c = (256 + n).toChar; n += 1; c.toString }
    }
  }

  /** BYTE-level initial segmentation (the GPT-2 alphabet): `w`'s
    * UTF-8 bytes, each spelled via [[ByteChars]] — a multi-byte code
    * point becomes several symbols, so the merge machinery (which is
    * alphabet-agnostic) can learn to reassemble or cross it. Same
    * empty-string guard as [[charsOf]]. */
  private[operators] def byteSymsOf(w: Column): Column = {
    val bin = encode(w, "UTF-8")
    when(length(w) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(bin)),
        i => element_at(typedLit(ByteChars),
          conv(hex(bin.substr(i, lit(1))), 16, 10).cast("int") + 1)))
  }

  /** Greedy left-to-right application of merge rule (a, b) to a symbol
    * array, as a pure expression fold. Non-overlapping by construction:
    * the merged symbol `a+b` differs from `a`, so it never re-merges
    * within the round. */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      lit(Array.empty[String]),
      (res, s) => when(
          size(res) > 0 && element_at(res, -1) === lit(a) && s === lit(b),
          concat(slice(res, lit(1), size(res) - 1), array(lit(a + b))))
        .otherwise(concat(res, array(s))))

  /** Adjacent pair counts over the word table, weighted by `cnt`. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(
        transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("l"),
            element_at(col("syms"), i + 2).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("cnt").as("n"))

  /**
   * Per-document encoding statistics under a trained merge table: the
   * corpus' exploded tokens join the final word table (`w` → encoded
   * symbol list) and aggregate back per document — token count, BPE
   * symbol count, character count. This is the "token counting under
   * the trained tokenizer" step of a data pipeline (sizing a training
   * mix, packing budgets) WITHOUT re-running the merge fold per
   * occurrence: each distinct word is encoded exactly once (in
   * [[train]]'s vocab-sized table) and every occurrence pays one
   * broadcast-hash probe.
   *
   * Scale shape: one corpus pass (explode + probe + per-doc hash-agg,
   * all map-side until the final doc-keyed aggregation); the word
   * table broadcasts only under [[MaxBroadcastWords]] — over it (a
   * web-scale corpus' distinct words) the probe degrades to a plain
   * shuffle join instead of OOMing the driver
   * ([[boundedProbeJoin]]'s discipline, value-identical by spec).
   * A [[train]]-returned word table carries its row count as schema
   * metadata ([[taggedRowCount]]), so the routing decision costs no
   * job; a caller-built table without the tag (and not plan-time
   * local) pays one EAGER count() at construction time, staged so the
   * join reuses the counted work — or passes `knownWords`, an exact
   * count or a safe UPPER BOUND on the word table's rows (routing
   * only, never correctness: an over-estimate routes to the shuffle
   * join, the safe side).
   */
  def encodeStats(df: DataFrame, idCol: String, textCol: String,
      words: DataFrame,
      maxBroadcastWords: Long = MaxBroadcastWords,
      knownWords: Option[Long] = None): DataFrame =
    boundedProbeJoin(
      df.select(col(idCol).as("id"),
        explode(TextDedup.tokens(col(textCol))).as("w")),
      words.select(col("w"), size(col("syms")).as("ns"),
        length(col("w")).as("nc")),
      maxBroadcastWords, stage = false, knownWords)
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"), sum("ns").as("n_syms"),
        sum("nc").as("n_chars"))

  /** Distinct-word-table ceiling for the encode family's broadcast
    * probe — the round-17 verdict's one latent 100-TB seam: at web
    * scale the distinct-word table outgrows comfortable broadcast
    * range, and an unguarded `broadcast()` hint would then OOM the
    * driver rather than degrade. 4M words × ~50 B ≈ 200 MB, the
    * outer edge of sane executor broadcast; the same
    * bounded-fast-path discipline as [[LocalWordBound]]. */
  val MaxBroadcastWords = 4000000L

  /** Schema-metadata key carrying a word table's KNOWN exact row
    * count on its `w` column. Training attaches it ([[train]] already
    * counts the distinct words for the local-fast-path decision), and
    * [[boundedProbeJoin]] reads it back at PLAN time — so the encode
    * hot path's broadcast-vs-shuffle routing costs ZERO extra jobs
    * (round 19, retiring the r18 bound's one local cost: a count()
    * job per encode call). The tag describes the table AS RETURNED by
    * training; metadata rides the `w` attribute through projections,
    * and a downstream FILTER only shrinks the table, so a stale tag
    * over-estimates — which routes to the shuffle join, the safe
    * side. The staleness argument covers ONLY shrinking
    * transformations: a composition that can GROW the table (union —
    * Spark keeps the LEFT child's `w` metadata — or a row-multiplying
    * join) leaves an UNDER-estimating tag that could broadcast an
    * over-bound side. Row-adding compositions must drop the tag
    * ([[dropRowCountTag]]) or pass an honest `knownWords`. */
  private[operators] val RowCountKey = "graft.rowCount"

  /** Strip a [[tagRowCount]] tag — REQUIRED before handing a trained
    * word table through any row-ADDING composition (union with extra
    * words, row-multiplying join): Spark's union keeps the left
    * child's column metadata, so the grown table would otherwise
    * carry an under-estimating count and [[boundedProbeJoin]] could
    * broadcast a side over the bound. No-op when no tag is present. */
  def dropRowCountTag(df: DataFrame): DataFrame =
    if (taggedRowCount(df).isEmpty) df
    else {
      val m = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(df.schema("w").metadata)
        .remove(RowCountKey).build()
      df.withColumn("w", col("w").as("w", m))
    }

  /** Attach a known exact row count to a word table (metadata on its
    * `w` column) — see [[RowCountKey]]. */
  private[operators] def tagRowCount(df: DataFrame, n: Long): DataFrame = {
    val m = new org.apache.spark.sql.types.MetadataBuilder()
      .withMetadata(df.schema("w").metadata)
      .putLong(RowCountKey, n).build()
    df.withColumn("w", col("w").as("w", m))
  }

  /** Read back a [[tagRowCount]] tag, if present. */
  def taggedRowCount(df: DataFrame): Option[Long] =
    df.schema.fields.find(_.name == "w")
      .filter(_.metadata.contains(RowCountKey))
      .map(_.metadata.getLong(RowCountKey))

  /** Plan-time row count of a probe side whose optimized plan is a
    * LOCAL relation (the ≤[[LocalWordBound]] trained word table, an
    * interchange-imported vocabulary): known exactly with no job —
    * Catalyst collapses projections over `LocalRelation`, so the
    * match survives [[encodeStats]]'s column pruning. */
  private def localPlanRowCount(df: DataFrame): Option[Long] =
    df.queryExecution.optimizedPlan match {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        Some(l.data.length.toLong)
      case _ => None
    }

  /** The encode family's word-probe join under the BOUNDED-broadcast
    * discipline: broadcast under `maxWords` distinct words, a plain
    * shuffle join over it — value-identical (spec-pinned), only the
    * PLAN changes. The route decision resolves, in order: the
    * caller's `knownWords`; the [[tagRowCount]] tag a trained word
    * table carries; the plan-time size of a local probe side — all
    * job-free. Only a probe side whose size NOTHING knows pays an
    * eager routing count() (one Spark job at construction time,
    * noted on the public encode entry points); it is staged first
    * ([[Staging.barrier]]) so the count's work is reused by the join
    * rather than computed twice. */
  private[operators] def boundedProbeJoin(exploded: DataFrame,
      probe: DataFrame, maxWords: Long, stage: Boolean,
      knownWords: Option[Long] = None): DataFrame = {
    val side0 = if (stage) Staging.barrier(probe) else probe
    val (side, n) = knownWords.orElse(taggedRowCount(side0))
      .orElse(localPlanRowCount(side0)) match {
      case Some(k) => (side0, k)
      case None =>
        // barrier unless some caller already persisted it (a barrier
        // of its own) — the routing count's work is then reused by
        // the join either way, never computed twice
        val s = if (side0.storageLevel ==
            org.apache.spark.storage.StorageLevel.NONE)
          Staging.barrier(side0) else side0
        (s, s.count())
    }
    exploded.join(if (n <= maxWords) broadcast(side) else side, Seq("w"))
  }

  /**
   * RANK-ORDER BPE ENCODING of arbitrary words — the tokenizer's
   * INFERENCE path. [[encodeStats]] probes the trained word table, so
   * it only covers words seen in training; a deployed tokenizer must
   * encode UNSEEN words too, by replaying the learned merge list in
   * rank order (Sennrich's `apply_bpe`): chars, then each rule's
   * greedy non-overlapping pass, rule 1 first. This is EXACTLY the
   * transformation training applies to its own word table round by
   * round, so for in-vocab words it reproduces the trained `syms`
   * bit-for-bit (spec law) — and it extends to any new word. Rule k's
   * symbols only exist after rules < k ran, so sequential-by-rank
   * needs no priority queue.
   *
   * Shape: one map-only pass over the (distinct-word-sized) input —
   * the merge list rides in the expression tree (R chained folds,
   * interpreted higher-order path, per-row cost R·|word|); no shuffle,
   * no UDF.
   */
  def encodeWords(words: DataFrame, wordCol: String,
      merges: Seq[Merge]): DataFrame =
    words.select(col(wordCol).as("w"),
      merges.foldLeft(charsOf(col(wordCol)))((c, m) =>
        applyMerge(c, m.left, m.right)).as("syms"))

  /** [[encodeWords]] over the BYTE-level alphabet — rank-order replay
    * of [[trainByteLevel]] merges from the [[byteSymsOf]] base. */
  def encodeWordsByteLevel(words: DataFrame, wordCol: String,
      merges: Seq[Merge]): DataFrame =
    words.select(col(wordCol).as("w"),
      merges.foldLeft(byteSymsOf(col(wordCol)))((c, m) =>
        applyMerge(c, m.left, m.right)).as("syms"))

  /** [[encodeStatsWithMerges]] over the BYTE-level alphabet: distinct
    * words replay the byte-level rank order once, every occurrence
    * pays one bounded-broadcast probe; `n_bytes` replaces `n_chars`
    * (the byte alphabet's natural length). Same eager routing count()
    * as [[encodeStatsWithMerges]] — the encode corpus' distinct-word
    * total is not known in advance — unless the caller passes
    * `knownWords` (exact or a safe upper bound; routing only). */
  def encodeStatsByteLevelWithMerges(df: DataFrame, idCol: String,
      textCol: String, merges: Seq[Merge],
      maxBroadcastWords: Long = MaxBroadcastWords,
      knownWords: Option[Long] = None): DataFrame = {
    val words = Staging.barrier(encodeWordsByteLevel(
      df.select(explode(TextDedup.tokens(col(textCol))).as("w")).distinct(),
      "w", merges))
    boundedProbeJoin(
      df.select(col(idCol).as("id"),
        explode(TextDedup.tokens(col(textCol))).as("w")),
      words.select(col("w"), size(col("syms")).as("ns"),
        length(encode(col("w"), "UTF-8")).as("nb")),
      maxBroadcastWords, stage = false, knownWords)
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"), sum("ns").as("n_syms"),
        sum("nb").as("n_bytes"))
  }

  /** [[encodeStats]] for a corpus that may contain words UNSEEN in
    * training: distinct words encode once via [[encodeWords]] (rank-
    * order replay), every occurrence pays one broadcast probe — the
    * same two-pass shape, with the merge-list replay replacing the
    * trained-table lookup. The ENCODE corpus' distinct-word count is
    * not known in advance here, so probe routing runs one EAGER
    * count() job at DataFrame-construction time (the staged replay
    * table's work is reused by the join — never computed twice) —
    * UNLESS the caller passes `knownWords`: an exact count or a safe
    * UPPER BOUND on the corpus' distinct whitespace tokens (routing
    * only, never correctness — an over-estimate merely routes to the
    * shuffle join, the safe side), retiring the last eager job on the
    * encode surface when the caller has corpus statistics. */
  def encodeStatsWithMerges(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge],
      maxBroadcastWords: Long = MaxBroadcastWords,
      knownWords: Option[Long] = None): DataFrame = {
    val words = Staging.barrier(encodeWords(
      df.select(explode(TextDedup.tokens(col(textCol))).as("w")).distinct(),
      "w", merges))
    encodeStats(df, idCol, textCol, words, maxBroadcastWords, knownWords)
  }

  /** Word-table size under which the merge rounds run on the DRIVER.
    * A production tokenizer's ~30k merges would otherwise cost one
    * distributed pair-count barrier + one rewrite per round — ~60k
    * Spark jobs of pure scheduler overhead on a table that, after the
    * single corpus pass, is vocab-sized and usually fits locally. Same
    * bounded-local-fast-path pattern as `kmeansCentroidsLocal` and the
    * ≤2M-edge union-find: 2M words × ~200 B ≈ 400 MB of driver heap,
    * and the distributed loop stays as the over-bound fallback. */
  val LocalWordBound = 2000000L

  /** Unsigned UTF-8 byte-order comparison — Spark/DuckDB's binary
    * string ordering. `String.compareTo` is UTF-16 code-unit order,
    * which DISAGREES above the BMP (a supplementary-plane character
    * sorts below U+E000.. in UTF-16 but above it in UTF-8), so the
    * local argmax tie-break must compare the encoded bytes. */
  private[operators] def utf8Less(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    a.length < b.length
  }

  /** The greedy fold of [[applyMerge]], replayed on the driver —
    * byte-equal by construction (same left-to-right, non-overlapping
    * walk; BpeTrainSpec proves local ≡ distributed end to end). */
  private def applyMergeLocal(syms: Array[String], a: String, b: String)
      : Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (out.nonEmpty && out.last == a && syms(i) == b)
        out(out.length - 1) = a + b
      else out += syms(i)
      i += 1
    }
    out.toArray
  }

  /** All merge rounds on the collected word table. One pair-count map
    * + one argmax + one rewrite per round, all driver-local — the
    * per-round cost is microseconds-per-vocab-row instead of a Spark
    * job barrier. Semantics identical to the distributed loop: counts
    * weighted by word frequency with overlapping adjacents, winner =
    * (max count, UTF-8-smallest left, then right), greedy
    * non-overlapping application. */
  private def trainLocal(collected: Array[(String, Long, Array[String])],
      rounds: Int): (Seq[Merge], Array[(String, Long, Array[String])]) = {
    var words = collected
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var continue = true
    while (r <= rounds && continue) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (_, cnt, syms) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + cnt)
          i += 1
        }
      }
      if (counts.isEmpty) { continue = false }
      else {
        var bl: String = null; var br: String = null; var bn = 0L
        counts.foreach { case ((l0, r0), n) =>
          if (bl == null || n > bn || (n == bn && (utf8Less(l0, bl) ||
              (l0 == bl && utf8Less(r0, br))))) {
            bl = l0; br = r0; bn = n
          }
        }
        merges += Merge(r, bl, br, bn)
        words = words.map { case (w, cnt, syms) =>
          (w, cnt, applyMergeLocal(syms, bl, br))
        }
        r += 1
      }
    }
    (merges.result(), words)
  }

  /**
   * Learn the first `rounds` merge rules. Returns (merges, final word
   * table).
   *
   * The corpus is touched exactly once (the word-frequency groupBy).
   * When the resulting vocab-sized table fits `maxLocalWords`, it is
   * collected and ALL merge rounds run on the driver (see
   * [[LocalWordBound]]) — at a real tokenizer's ~30k merges that turns
   * ~60k distributed barriers into one collect + local loop + one
   * parallelize. Over the bound, the distributed loop runs instead:
   * the word table is re-barriered each round and the per-round driver
   * pull is the single argmax row. Both paths are merge-for-merge
   * identical (spec-gated on a shared prefix, tie-breaks included).
   */
  def train(df: DataFrame, textCol: String, rounds: Int,
      maxLocalWords: Long = LocalWordBound): (Seq[Merge], DataFrame) =
    trainWith(df, textCol, rounds, maxLocalWords, charsOf)

  /** [[train]] over the GPT-2 BYTE-level alphabet ([[byteSymsOf]]) —
    * the Unicode-safe tokenizer family (tiktoken/GPT-2 lineage): the
    * merge machinery is alphabet-agnostic, so byte-level training IS
    * [[train]] with the initial segmentation swapped. Merges learned
    * here spell pieces in [[ByteChars]] symbols; apply them with
    * [[encodeWordsByteLevel]]. */
  def trainByteLevel(df: DataFrame, textCol: String, rounds: Int,
      maxLocalWords: Long = LocalWordBound): (Seq[Merge], DataFrame) =
    trainWith(df, textCol, rounds, maxLocalWords, byteSymsOf)

  private def trainWith(df: DataFrame, textCol: String, rounds: Int,
      maxLocalWords: Long, initSyms: Column => Column)
      : (Seq[Merge], DataFrame) = {
    val base = Staging.barrier(
      df.select(explode(TextDedup.tokens(col(textCol))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .select(col("w"), col("cnt"), initSyms(col("w")).as("syms")))
    // the fast-path decision count doubles as the word table's
    // row-count tag (merges rewrite syms, never add/drop words), so
    // downstream probe-join routing needs no job of its own
    val nWords = base.count()
    if (nWords <= maxLocalWords) {
      val collected = base.collect().map(r =>
        (r.getString(0), r.getLong(1),
          r.getSeq[String](2).toArray))
      val (merges, words) = trainLocal(collected, rounds)
      val spark = df.sparkSession
      import spark.implicits._
      val out = words.toSeq.map { case (w, c, s) => (w, c, s.toSeq) }
        .toDF("w", "cnt", "syms")
      (merges, tagRowCount(out, nWords))
    } else {
      val (merges, words) = trainDistributed(base, rounds)
      (merges, tagRowCount(words, nWords))
    }
  }

  /**
   * The over-bound fallback, with INCREMENTALLY-maintained pair
   * counts. A full recount per round pays a vocab-wide pair explode +
   * shuffle every merge; but merging (a, b) only changes words that
   * CONTAIN that adjacent pair, so each round:
   *
   *   - argmax over the MAINTAINED counts table (TakeOrdered -- no
   *     shuffle, one driver row);
   *   - one map-only pass applies the merge fold, KEEPING the old
   *     symbol array alongside the new one -- "touched" is then the
   *     lambda-free `size(merged) < size(syms)` (the greedy fold
   *     shrinks a word iff it contained the pair), so every
   *     higher-order function in the loop sits alone in its own
   *     operator over cached attributes. (Two lambda-bearing
   *     expressions in one projection corrupt interpreted
   *     evaluation -- repro'd: the second HOF reads the first's
   *     lambda-variable state, index-out-of-bounds on shorter rows;
   *     this layout is the reliable shape.)
   *   - the touched words' old pairs (negated) and new pairs
   *     aggregate into a DELTA -- touched-set-sized, small once the
   *     head pairs are merged away;
   *   - the delta FULL-OUTER-joins the counts state on (l, r): the
   *     state is hash-partitioned by (l, r) from its groupBy birth
   *     (checkpointing preserves the physical partitioning), so only
   *     the delta side shuffles, round after round.
   *
   * The iterated states MUST truncate lineage, not just persist: a
   * persist-only barrier keeps the full logical plan, and round r's
   * counts plan references both the r-deep join chain and the r-deep
   * word chain, so Catalyst re-analyzes a tree that grows without
   * bound -- measured per-round cost exploded from 1.4 s at 4 rounds
   * to a >500 s timeout at 16. Eager `localCheckpoint` pins each
   * generation as a constant-size LogicalRDD (per-round cost flat in
   * round count). Its blocks are executor-local -- an executor loss
   * fails the job instead of recomputing, the standard iterative-
   * algorithm trade (this is the over-2M-word fallback; swap in
   * reliable `checkpoint` on a cluster if that matters). Because
   * checkpointing is eager, a generation retires the moment its
   * successor materializes, keeping live memory at ~2 word tables +
   * 2 counts tables regardless of rounds. NOTE: the returned frame is
   * checkpoint-backed -- valid until the enclosing Staging frame
   * releases, NOT recomputable afterwards (unlike a persist barrier).
   *
   * The algebra is exact -- counts(new) = counts(old) -
   * pairs(touched_old) + pairs(touched_new), and the merged pair
   * itself always zeroes out (the greedy fold leaves no adjacent
   * (a, b)) -- so the merge sequence is bit-identical to a full
   * recount's; BpeTrainSpec gates it merge-for-merge against the
   * local path, ties included.
   */
  private def trainDistributed(base: DataFrame, rounds: Int)
      : (Seq[Merge], DataFrame) = {
    def ckpt(df: DataFrame): DataFrame =
      Staging.adopt(df.localCheckpoint(true))
    def retire(df: DataFrame): Unit = {
      df.unpersist(blocking = false)
      org.apache.spark.sql.graft.bridge.checkpointedRdd(df)
        .foreach(_.unpersist(blocking = false))
    }
    var words = base
    var wordsCk: DataFrame = null // the checkpointed handle to retire
    var counts = ckpt(pairCounts(base))
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var continue = true
    while (r <= rounds && continue) {
      val top = counts.orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) { continue = false }
      else {
        val (a, b, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(r, a, b, n)
        val next = ckpt(words.select(col("w"), col("cnt"),
          col("syms"), applyMerge(col("syms"), a, b).as("merged")))
        if (wordsCk != null) retire(wordsCk) // consumed by next's ckpt
        def touched = next.filter(size(col("merged")) < size(col("syms")))
        val delta = pairCounts(
            touched.select(col("w"), col("cnt"), col("syms")))
            .select(col("l"), col("r"), (-col("n")).as("n"))
          .unionByName(pairCounts(touched.select(col("w"), col("cnt"),
            col("merged").as("syms"))))
          .groupBy("l", "r").agg(sum("n").as("dn"))
        val nextCounts = ckpt(
          counts.join(delta, Seq("l", "r"), "full_outer")
            .select(col("l"), col("r"),
              (coalesce(col("n"), lit(0L)) +
                coalesce(col("dn"), lit(0L))).as("n"))
            .filter(col("n") > 0))
        retire(counts) // consumed by nextCounts' ckpt
        counts = nextCounts
        wordsCk = next
        words = next.select(col("w"), col("cnt"),
          col("merged").as("syms"))
        r += 1
      }
    }
    (merges.result(), words)
  }
}
