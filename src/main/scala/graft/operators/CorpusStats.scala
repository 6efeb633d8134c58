package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Corpus-level statistics and selection operators for training-data
 * curation at 100 TB: KMV (bottom-k) distinct sketches with cross-corpus
 * overlap estimation, integer-exact weighted Bernoulli sampling, and
 * CCNet-style perplexity bucketing.
 *
 * Everything here follows the repo's cross-engine exactness discipline
 * (CountMin.scala / Hll.scala): the portable 64-bit hash is the first 16
 * hex chars of `md5(v)` — compared AS A STRING, where lexicographic order
 * on lowercase hex equals unsigned numeric order — and every gated
 * numeric is integer arithmetic (BIGINT / DECIMAL(38,0) with truncating
 * `div`), never a float that two engines could render differently.
 */
object CorpusStats {

  /** Portable 64-bit hash rendered as 16 lowercase hex chars.
    * Lexicographic string order ≡ unsigned numeric order, so bottom-k
    * selection never needs a (sign-hazardous) integer cast. */
  def hex16(c: Column): Column = substring(md5(c), 1, 16)

  /** `hex16` reinterpreted as its unsigned numeric value — DECIMAL(38,0)
    * because 2^63..2^64-1 overflows BIGINT. `conv` yields the unsigned
    * decimal digits as a string; the cast is exact. */
  def hexUint(h: Column): Column = conv(h, 16, 10).cast(DecimalType(38, 0))

  // -------------------------------------------------------------------
  // KMV (bottom-k) distinct sketch — Bar-Yossef et al., RANDOM 2002
  // -------------------------------------------------------------------

  /**
   * The k smallest DISTINCT `hex16` hashes of `valueCol` per group — the
   * KMV synopsis. Mergeable (union of two sketches re-truncated to the
   * k smallest is the sketch of the union), so shards sketch
   * independently and a coordinator folds k-row tables.
   *
   * Plan shape: NO global pre-distinct. `dense_rank() <= k` gives the
   * k smallest distinct values while letting Spark's
   * InferWindowGroupLimit insert a PARTIAL WindowGroupLimit before the
   * exchange — each map task forwards at most k distinct hashes per
   * group (plus local ties), so the shuffle carries O(partitions · k)
   * rows regardless of corpus size; the residual `.distinct()` runs on
   * that k-bounded set. The alternative (`distinct()` then
   * `row_number()`) shuffles EVERY distinct value twice.
   *
   * Returns (g, h, rn) with rn = 1..n_keys (n_keys ≤ k).
   */
  def kmvSketch(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    val ranked = df
      .select(col(groupCol).as("g"), hex16(col(valueCol)).as("h"))
      .withColumn("rk", dense_rank().over(Window.partitionBy("g").orderBy("h")))
      .filter(col("rk") <= k)
      .select("g", "h")
      .distinct()
    ranked.withColumn("rn",
      row_number().over(Window.partitionBy("g").orderBy("h")))
  }

  /**
   * Per-group distinct-count estimate from a [[kmvSketch]]:
   * `(k-1) / v_k` with `v_k` = kth smallest hash normalized to [0,1) —
   * i.e. `(k-1)·2^64 div h_k` in exact integer arithmetic, scaled to
   * micro-units. A group with fewer than k distinct values IS its own
   * sketch, so the estimate degrades to the exact count.
   *
   * Gated columns are engine-exact: `n_keys` BIGINT, `kth_hash` STRING,
   * `est_e6` BIGINT via truncating integral division (Spark `div` ≡
   * DuckDB `//`, both toward zero; operands positive).
   */
  def kmvDistinct(sketch: DataFrame, k: Int): DataFrame = {
    val numerator = (BigInt(k - 1) * (BigInt(1) << 64) * 1000000).toString
    sketch
      .groupBy("g")
      .agg(count(lit(1)).as("n_keys"), max("h").as("kth_hash"))
      .withColumn("est_e6",
        when(col("n_keys") < k, col("n_keys") * lit(1000000L))
          .otherwise(expr(
            s"CAST(CAST('$numerator' AS DECIMAL(38,0)) div CAST(conv(kth_hash, 16, 10) AS DECIMAL(38,0)) AS BIGINT)")))
      .withColumn("est_e6", col("est_e6").cast(LongType))
  }

  /**
   * KMV cross-corpus overlap: Jaccard and union-cardinality estimates
   * between two sketches WITHOUT touching either corpus again — the
   * "should I even run the dedup join?" probe, and the corpus-level
   * fuzzy-contamination estimate (sketch the benchmark's shingles once;
   * probe every training shard's sketch against it).
   *
   * Union sketch = k smallest of (A ∪ B) (each side already
   * k-truncated, which is exactly why KMV sketches union losslessly);
   * Jaccard ≈ |top-k(A∪B) ∩ A ∩ B| / k_used. Everything after the
   * (k-row) sketches is metadata-scale.
   *
   * Returns ONE row: (k_used, inter_k, jaccard_e6, union_est_e6).
   */
  def kmvOverlap(sketchA: DataFrame, sketchB: DataFrame, k: Int): DataFrame = {
    val flagged = sketchA.select(col("h"), lit(1).as("in_a"), lit(0).as("in_b"))
      .unionByName(sketchB.select(col("h"), lit(0).as("in_a"), lit(1).as("in_b")))
      .groupBy("h")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
    val topk = flagged
      .withColumn("rn", row_number().over(Window.orderBy("h")))
      .filter(col("rn") <= k)
    val numerator = (BigInt(k - 1) * (BigInt(1) << 64) * 1000000).toString
    topk.agg(
        count(lit(1)).as("k_used"),
        sum(col("in_a") * col("in_b")).cast(LongType).as("inter_k"),
        max("h").as("kth_hash"))
      .withColumn("jaccard_e6",
        expr("inter_k * 1000000L div k_used").cast(LongType))
      .withColumn("union_est_e6",
        when(col("k_used") < k, col("k_used") * lit(1000000L))
          .otherwise(expr(
            s"CAST(CAST('$numerator' AS DECIMAL(38,0)) div CAST(conv(kth_hash, 16, 10) AS DECIMAL(38,0)) AS BIGINT)")))
      .select(col("k_used").cast(LongType), col("inter_k"),
        col("jaccard_e6"), col("union_est_e6").cast(LongType))
  }

  // -------------------------------------------------------------------
  // Weighted Bernoulli (Poisson) sampling — integer-exact inclusion
  // -------------------------------------------------------------------

  /**
   * Importance sampling of a corpus with per-row inclusion probability
   * `rate · w/cap` (w = weightCol clamped to [0, cap]) — the
   * quality-weighted selection half of a data mix, as a MAP-ONLY filter
   * (zero shuffles at any scale; each shard samples independently,
   * which is the whole point of Poisson vs reservoir designs).
   *
   * The inclusion test is seedless, reproducible across engines, runs
   * AND retries (the property `DataFrame.sample()` lacks — t18's
   * argument), and integer-EXACT: include row i iff
   *
   *   H(id) · rateDen · cap  <  2^64 · rateNum · min(w_i, cap)
   *
   * with H = [[hexUint]] (uniform on [0, 2^64)). Both sides are
   * DECIMAL(38,0)/HUGEINT products ≤ ~10^24 — no float ever enters the
   * decision, so Spark and the DuckDB oracle select identical rows.
   */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      cap: Long, rateNum: Long, rateDen: Long): DataFrame = {
    require(rateNum > 0 && rateDen > 0 && cap > 0)
    // DECIMAL(38,0) domain, checked in BigInt so the CHECK can't overflow:
    // both comparison sides are ≤ 2^64 · (rate factor) · cap and must fit
    // 38 digits — silently overflowing Long here (rateDen·cap > 2^63)
    // would corrupt the inclusion decision despite the decimal discipline
    val dec38 = BigInt(10).pow(38)
    val h = BigInt(1) << 64
    require(h * BigInt(rateDen) * BigInt(cap) < dec38 &&
      h * BigInt(rateNum) * BigInt(cap) < dec38,
      s"rateDen*cap and rateNum*cap must stay below ${dec38 / h} " +
        "to keep both DECIMAL(38,0) comparison sides exact")
    val w = least(greatest(col(weightCol).cast(LongType), lit(0L)), lit(cap))
    // BigInt product: rateDen * cap can exceed Long even when each factor
    // is valid on its own — the all-decimal discipline must start here
    val lhs = hexUint(hex16(col(idCol).cast(StringType))) *
      lit(new java.math.BigDecimal((BigInt(rateDen) * BigInt(cap)).bigInteger))
    val rhs = lit(new java.math.BigDecimal((BigInt(1) << 64).bigInteger)) *
      lit(new java.math.BigDecimal(rateNum)) * w.cast(DecimalType(38, 0))
    df.filter(lhs < rhs).withColumn("w", w)
  }

  // -------------------------------------------------------------------
  // CCNet-style perplexity bucketing — Wenzek et al., LREC 2020
  // -------------------------------------------------------------------

  /**
   * Head/middle/tail split of a corpus by per-language LM score — the
   * CCNet curation staple (keep "head", drop or down-weight "tail").
   * Reuses [[TextAnalysis.lmQuality]]'s integer micro-logprob scoring
   * (so the transcendental never crosses an engine boundary) and ranks
   * on the integer key
   *
   *   lp_key = (sum_lp_micro + 10^7 · n_tokens) · 10^6 div n_tokens
   *
   * (= avg token logprob in micro-units, offset by +10^7 so the
   * dividend stays positive — truncating division is then floor on
   * both engines). Buckets by per-language rank: the lowest-logprob
   * 30% is `tail`, the top 30% `head`, the rest `middle`; cutoffs are
   * `3n div 10` / `7n div 10` — integer-exact, no percentile floats.
   *
   * Scale shape: scoring is t32's plan (broadcast vocab join, one
   * hash-agg). The per-language rank does NOT use a per-language
   * window — that caps parallelism at |languages| (≈6) whatever the
   * cluster size, measured 11.7× at 10× data. Instead it is t23's
   * bucketed prefix-sum: `lp_key` is coarse-bucketed (order-aligned
   * integer division), per-(lang, bucket) counts prefix-sum in a
   * METADATA-sized broadcast table, and the residual `row_number`
   * runs per (lang, bucket) — parallelism = languages × buckets, and
   * the global rank `cum + local` is exactly the single-window rank
   * because the bucketing is monotone in the sort key and ties share
   * a bucket. The 10× ratio dropped to ~5× (sort n·log n inside 6
   * partitions → hash joins + bounded partition-local sorts).
   */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
      vocab: Int): DataFrame = {
    val scored = TextAnalysis.lmQuality(df, idCol, textCol, vocab)
      .filter(col("n_tokens") > 0)
    val withLang = df.select(col(idCol).as("id"),
      TextAnalysis.langId(col(textCol)).as("lang"))
    // lp_key ∈ [~4e12, 1e13] by construction (avg micro-logprob offset
    // +10^7, ×10^6); step 6e9 → ≤ ~1700 order-aligned buckets
    val keyed = Staging.barrier(scored.join(withLang, Seq("id"))
      .withColumn("lp_key",
        expr("(sum_lp_micro + 10000000L * n_tokens) * 1000000L div n_tokens"))
      .withColumn("kb", expr("lp_key div 6000000000L")))
    val cnts = keyed.groupBy("lang", "kb").agg(count(lit(1)).as("c"))
    val wPre = Window.partitionBy("lang").orderBy("kb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = cnts
      .withColumn("cum", coalesce(sum("c").over(wPre), lit(0L)))
      .withColumn("n", sum("c").over(Window.partitionBy("lang")))
      .select("lang", "kb", "cum", "n")
    keyed.join(broadcast(pre), Seq("lang", "kb"))
      .withColumn("rnl", row_number()
        .over(Window.partitionBy("lang", "kb").orderBy("lp_key", "id"))
        .cast(LongType))
      .withColumn("rn", col("cum") + col("rnl"))
      .withColumn("bucket",
        when(col("rn") <= expr("3 * n div 10"), "tail")
          .when(col("rn") > expr("7 * n div 10"), "head")
          .otherwise("middle"))
      .select(col("id"), col("lang"), col("n_tokens"), col("lp_key"),
        col("bucket"))
  }

  /**
   * Population-stability index between two corpus slices — the
   * standard distribution-drift monitor (credit-scoring lineage, now
   * the default data-drift alarm in ML pipelines): bucket a feature,
   * compare the bucket shares of a reference slice A against a
   * candidate slice B, `PSI = Σ (p_A − p_B)·ln(p_A / p_B)`. Rule of
   * thumb: < 0.1 stable, > 0.25 drifted.
   *
   * Cross-engine exactness (the t70 float discipline): counts are
   * exact integers; each bucket's term is assembled in ONE fixed IEEE
   * op order — `p = (c + 1) / (n + buckets)` add-one smoothed (no
   * zero shares), `(p_A − p_B) · ln(p_A / p_B)` — rounded to BIGINT
   * micro per bucket. The gated rows are the per-bucket ledger
   * (counts + term); the PSI total is their integer sum.
   *
   * Scale shape: ONE corpus aggregate (bucket × slice counts,
   * map-side combined) → a buckets-sized metadata frame; totals ride
   * as literals.
   */
  def driftPsi(df: DataFrame, featureCol: Column, splitCol: Column,
      boundaries: Seq[Long]): DataFrame = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted,
      "boundaries must be non-empty ascending")
    val nb = boundaries.length + 1
    val bucket = boundaries.zipWithIndex.foldRight(lit(boundaries.length)) {
      case ((b, i), acc) => when(featureCol < b, i).otherwise(acc)
    }
    // left-join the observed counts onto a full 0..nb-1 bucket spine:
    // a bucket empty in BOTH slices still owes its add-one-smoothed term
    // whenever the slice totals differ — dropping it understates the PSI
    val spine = df.sparkSession.range(nb.toLong)
      .select(col("id").cast("int").as("bucket"))
    val counts = Staging.barrier(
      spine.join(
        df.select(bucket.cast("int").as("bucket"), splitCol.as("is_b"))
          .groupBy("bucket")
          .agg(sum(when(!col("is_b"), 1L).otherwise(0L)).as("c_a"),
            sum(when(col("is_b"), 1L).otherwise(0L)).as("c_b")),
        Seq("bucket"), "left")
        .select(col("bucket"), coalesce(col("c_a"), lit(0L)).as("c_a"),
          coalesce(col("c_b"), lit(0L)).as("c_b")))
    val Row(na: Long, nbTot: Long) =
      counts.agg(sum("c_a"), sum("c_b")).head
    require(na + nbTot > 0, "driftPsi needs a non-empty input")
    val pa = (col("c_a") + 1) * lit(1.0) / lit(na + nb.toDouble)
    val pb = (col("c_b") + 1) * lit(1.0) / lit(nbTot + nb.toDouble)
    counts.select(col("bucket"), col("c_a"), col("c_b"),
      round((pa - pb) * log(pa / pb) * lit(1e6)).cast("long")
        .as("psi_term_micro"))
  }

  /**
   * Vocabulary-growth curve (the empirical Heaps-law measurement):
   * per ingestion-order decile, how many NEVER-BEFORE-SEEN words the
   * corpus contributed, plus the cumulative vocabulary — the standard
   * corpus-diversity probe (a flattening curve means new data is
   * repeating the old; a straight one means the domain is still
   * yielding novelty; the decile ratios estimate the Heaps exponent).
   *
   * Distributed shape — no corpus-scale window: each word's FIRST
   * occurrence is one `min(doc_id)` aggregate (vocab-sized result);
   * the ingestion rank of those first-occurrence docs uses the
   * bucketed prefix-sum rank (order-aligned `div`-buckets over the id
   * range, per-bucket counts prefix-summed in a ≤1024-row broadcast
   * table, residual `row_number` per bucket — the [[perplexityBuckets]]
   * pattern), and the decile rollup is 10 rows of metadata.
   */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 10): DataFrame = {
    val docs = Staging.barrier(df.select(col(idCol).cast("long").as("doc_id")))
    val n = docs.count()
    require(n > 0, "vocabGrowth needs a non-empty corpus")
    val Row(minId: Long, maxId: Long) =
      docs.agg(min("doc_id"), max("doc_id")).head
    val w = math.max(1L, (maxId - minId + 1) / 1024L)
    val keyed = Staging.barrier(
      docs.withColumn("kb", expr(s"(doc_id - $minId) div $w")))
    val cnts = keyed.groupBy("kb").agg(count(lit(1)).as("c"))
    val pre = cnts
      .withColumn("cum", coalesce(sum("c").over(
        Window.orderBy("kb").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("kb", "cum")
    val ranked = keyed.join(broadcast(pre), Seq("kb"))
      .withColumn("rn", col("cum") + row_number()
        .over(Window.partitionBy("kb").orderBy("doc_id")).cast(LongType))
    val firstDocs = df
      .select(col(idCol).cast("long").as("doc_id"),
        explode(TextDedup.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(min("doc_id").as("fd"))
    firstDocs.join(ranked.select(col("doc_id").as("fd"), col("rn")), Seq("fd"))
      .withColumn("decile", expr(s"CAST((rn - 1) * $buckets div ${n}L AS INT)"))
      .groupBy("decile").agg(count(lit(1)).as("new_words"))
      .withColumn("cum_vocab", sum("new_words")
        .over(Window.orderBy("decile")).cast(LongType))
  }

  /**
   * Top-k PMI collocations — the phrase-mining primitive (word2vec's
   * phrase pass, Mikolov et al. 2013; PMI association per Church &
   * Hanks 1990): adjacent token pairs scored by
   * `log10(p(a,b) / (p(a)·p(b)))`, corpus-wide.
   *
   * Cross-engine exactness: the ratio is assembled in ONE fixed
   * operation order — `(c_ab·N₁·N₁) / (N₂·c_a·c_b)` with every factor
   * an exact-integer-valued double and left-associated IEEE
   * multiplication — then a single log10, ×1e6, round to BIGINT
   * micro-units (the t32 discipline: floats never survive into the
   * gate un-rounded, and the op sequence is identical in DuckDB).
   *
   * Scale shape: two corpus-pass aggregates (unigram and bigram
   * counts, both map-side-combined), totals pulled as two driver
   * scalars (index-metadata class), the unigram table BROADCAST onto
   * the bigram table twice (it is |vocab|-sized), and the top-k cut is
   * `orderBy.limit` = TakeOrderedAndProject (per-partition top-k,
   * never a global sort). The staged token table feeds both exploded
   * aggregates; at 100 TB swap the persist for a Reliable checkpoint
   * or recompute-per-consumer.
   */
  def collocations(df: DataFrame, textCol: String, minCount: Long,
      k: Int): DataFrame = {
    val toks = Staging.barrier(
      df.select(TextDedup.tokens(col(textCol)).as("t")))
    val uni = Staging.barrier(
      toks.select(explode(col("t")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c")))
    val bi = Staging.barrier(
      toks.filter(size(col("t")) >= 2)
        .select(explode(transform(sequence(lit(0), size(col("t")) - 2),
          i => struct(element_at(col("t"), i + 1).as("l"),
            element_at(col("t"), i + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("left_tok"), col("p.r").as("right_tok"))
        .agg(count(lit(1)).as("c_ab")))
    val n1 = uni.agg(sum("c")).head.getLong(0)
    val n2 = bi.agg(sum("c_ab")).head.getLong(0)
    val ratio = (col("c_ab").cast("double") * lit(n1.toDouble) * lit(n1.toDouble)) /
      (lit(n2.toDouble) * col("ca") * col("cb"))
    bi.filter(col("c_ab") >= minCount)
      .join(broadcast(uni.select(col("w").as("left_tok"), col("c").as("ca"))),
        Seq("left_tok"))
      .join(broadcast(uni.select(col("w").as("right_tok"), col("c").as("cb"))),
        Seq("right_tok"))
      .select(col("left_tok"), col("right_tok"), col("c_ab"),
        round(log10(ratio) * lit(1e6)).cast("long").as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("left_tok"), col("right_tok"))
      .limit(k)
  }
}
