package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines: language ID,
 * quality scoring, token counting, document fingerprinting. All pure
 * Column-expression trees (map-side only — no shuffle at any scale).
 */
object TextAnalysis {

  /** Marker stopword sets for the n-gram/stopword language heuristic.
    * Deliberately tiny: the operator contract is deterministic scoring,
    * not model-grade accuracy. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  private def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, x => x.isin(markers.map(lit): _*)))

  /** Per-language marker ratio columns: score = markers / tokens. */
  def langScores(toks: Column): Seq[(String, Column)] = {
    val n = size(toks)
    LangMarkers.map { case (lang, markers) =>
      lang -> when(n > 0, markerCount(toks, markers) * lit(1.0) / n).otherwise(lit(0.0))
    }
  }

  /** Detected language: argmax of marker ratios with declaration-order
    * tie-break; all-zero → "und". CJK codepoints short-circuit to "zh".
    *
    * Both the token array AND the score vector are LET-BOUND
    * ([[ExprUtil.bound]]): the argmax-with-tie-break tree references
    * each score ~3× and the max ~5×, and Catalyst performs no CSE —
    * unbound, the tokenizer kernel re-ran ~30× per row (measured: the
    * t8 column at 10× data cost 24.8 s; bound, 2.5 s). The bound form
    * tokenizes once, computes the 5 ratios once into an array, and the
    * pick tree reads array slots. */
  def langId(text: Column): Column = {
    val pick = ExprUtil.bound(TextDedup.tokens(text)) { toks =>
      // the score vector is the FUSED kernel (one walk, bitmask hash
      // lookup per token) — contract-identical to the composed
      // array(langScores(toks)) it replaced (KernelPropertySpec);
      // measured: the 5 interpreted isin-filter walks were the last
      // linear-constant hot spot at 100× data
      ExprUtil.bound(graft.functions.LangMarkerScores(toks,
          LangMarkers.map(_._2))) { ss =>
        val scores = LangMarkers.map(_._1).zipWithIndex.map {
          case (lang, i) => lang -> element_at(ss, i + 1)
        }
        val maxScore = greatest(scores.map(_._2): _*)
        scores.foldRight(lit("und")) { case ((lang, s), acc) =>
          when(s === maxScore && s > 0, lit(lang)).otherwise(acc)
        }
      }
    }
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh")).otherwise(pick)
  }

  /** Quality components + composite score: length band, mean token
    * length band, punctuation ratio, stopword presence. Each component
    * contributes 0.25. */
  def qualityComponents(text: Column): Seq[(String, Column)] =
    qualityComponentsFrom(text, TextDedup.tokens(text))

  /** Components from a caller-supplied token column — pass a bound
    * lambda variable or a materialized attribute when more than one
    * component lands in a single output column (the langId lesson:
    * lambdas embed their outer token EXPRESSION per reference, and the
    * interpreted higher-order path has no subexpression elimination). */
  def qualityComponentsFrom(text: Column, toks: Column): Seq[(String, Column)] = {
    val nTok = size(toks)
    val nChars = length(text)
    val meanTokLen = when(nTok > 0,
      aggregate(toks, lit(0), (acc, x) => acc + length(x)) * lit(1.0) / nTok)
      .otherwise(lit(0.0))
    val punct = when(nChars > 0,
      length(regexp_replace(text, "[^.,;:!?]", "")) * lit(1.0) / nChars)
      .otherwise(lit(0.0))
    val stopRatio = when(nTok > 0,
      markerCount(toks, LangMarkers.flatMap(_._2)) * lit(1.0) / nTok)
      .otherwise(lit(0.0))
    Seq("n_tokens" -> nTok.cast("bigint"), "mean_token_len" -> meanTokLen,
      "punct_ratio" -> punct, "stopword_ratio" -> stopRatio)
  }

  def qualityScore(text: Column): Column =
    ExprUtil.bound(TextDedup.tokens(text))(qualityScoreFrom(text, _))

  /** The composite score from a caller-supplied token column (bound
    * variable or materialized attribute). */
  def qualityScoreFrom(text: Column, toks: Column): Column = {
    val c = qualityComponentsFrom(text, toks).toMap
    val b = (p: Column) => when(p, lit(0.25)).otherwise(lit(0.0))
    b(c("n_tokens") >= 10 && c("n_tokens") <= 1000) +
      b(c("mean_token_len") >= 3.0 && c("mean_token_len") <= 12.0) +
      b(c("punct_ratio") < 0.1) +
      b(c("stopword_ratio") > 0.01)
  }

  /** Gopher-style document quality RULES (Rae et al. 2021, appendix A —
    * the MassiveText filter set, restated on this corpus's measurable
    * axes): each document gets a named boolean per rule plus the
    * conjunction `keep`, so a pipeline can report WHICH rule killed a
    * document, not just that one did (the reason-tagged form quality
    * pipelines actually operate — t9's scalar score is the ranking twin,
    * this is the filter twin).
    *
    * Every rule is a RATIONAL comparison on integer aggregates (the
    * t24/q11 precedent): `3 ≤ mean_word_len ≤ 10` is spelled
    * `3·n ≤ total_len ∧ total_len ≤ 10·n`, the 80 % alphabetic-word
    * floor is `5·alpha ≥ 4·n` — no float division anywhere, so both
    * engines agree bit-for-bit. Map-only over the staged token
    * attribute: one pass, no shuffles beyond the source scan. */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      stopWords: Seq[String] = Seq("the", "a", "of", "to", "and", "in"),
      minStopWords: Int = 2): DataFrame = {
    val toks = Staging.barrier(
      df.select(col(idCol).as("doc_id"), TextDedup.tokens(col(textCol)).as("t")))
    toks.filter(size(col("t")) > 0)
      .select(col("doc_id"), col("t"),
        size(col("t")).cast("long").as("n_words"),
        aggregate(col("t"), lit(0L), (a, x) => a + length(x)).as("total_len"),
        size(filter(col("t"), x => x.rlike("[a-z]"))).cast("long").as("alpha_words"),
        size(array_intersect(array_distinct(col("t")),
          array(stopWords.map(lit): _*))).cast("long").as("n_stop"))
      .select(col("doc_id"), col("n_words"),
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .as("r_word_count"),
        (lit(3) * col("n_words") <= col("total_len") &&
          col("total_len") <= lit(10) * col("n_words")).as("r_mean_word_len"),
        (lit(5) * col("alpha_words") >= lit(4) * col("n_words"))
          .as("r_alpha_frac"),
        (col("n_stop") >= minStopWords).as("r_stop_words"))
      .withColumn("keep",
        col("r_word_count") && col("r_mean_word_len") &&
          col("r_alpha_frac") && col("r_stop_words"))
  }

  /** Per-group quantile threshold, SKETCH-based (`approx_percentile`):
    * the at-scale form of the t18 stratification threshold — one
    * map-side-combined aggregation, no per-group sort. Returns an actual
    * data value (like percentile_disc), so with `accuracy` ≥ the group
    * cardinality it is EXACT and equals the deterministic row_number
    * formulation (asserted in TextAnalysisSpec); at 100 TB group sizes
    * drop accuracy to the memory budget and accept the ±1/accuracy rank
    * error. Not oracle-gated: the sketch's merge order is not part of
    * any cross-engine contract — the gated t18 uses the deterministic
    * twin. */
  def approxQuantileThresholds(df: DataFrame, groupCol: String,
      valueCol: String, prob: Double, accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCol).agg(
      percentile_approx(col(valueCol), lit(prob), lit(accuracy)).as("thr"))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(TextDedup.tokens(text)).cast("bigint")

  /** BPE-ish subword unit count: alpha runs, digit runs, single
    * non-alnum marks. */
  val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpeishPattern), lit(0))).cast("bigint")

  /** Min-k document fingerprint (winnowing-lite): the k lexicographically
    * smallest md5s of character 5-grams, concatenated. Robust to local
    * edits; portable across engines.
    *
    * PASS A MATERIALIZED ATTRIBUTE (the [[TextDedup.shingles]] rule): the
    * gram lambda references `norm` from OUTSIDE `transform`, and Catalyst
    * re-evaluates an outer EXPRESSION per element — so a `lower(trim(
    * text))` expression fed here costs O(chars) per character gram,
    * O(L²) per document. Stage `(id, lower(trim(text)))` behind a
    * [[Staging.barrier]] first (the t11 call site in Queries does), or
    * use [[fingerprint]] only on columns that are already plain
    * attributes of normalized text. */
  def fingerprintFromNorm(norm: Column, gram: Int = 5, k: Int = 4): Column =
    graft.functions.GramFingerprint(norm, gram, k)

  /** The composed-built-ins formulation — retained as the semantic
    * baseline the fused kernel ([[graft.functions.GramFingerprint]]) is
    * equivalence-tested against (TextAnalysisSpec), and the direct
    * transliteration of the DuckDB oracle's list-comprehension. Subject
    * to the same materialized-attribute rule as above. */
  def fingerprintFromNormComposed(norm: Column, gram: Int = 5, k: Int = 4): Column = {
    val grams = transform(sequence(lit(0), length(norm) - gram),
      i => norm.substr(i + lit(1), lit(gram)))
    val hashes = array_sort(transform(grams, g => md5(g)))
    when(length(norm) >= gram, array_join(slice(hashes, 1, k), ""))
      .otherwise(lit(null).cast("string"))
  }

  /** Convenience form over raw text. Prefer [[fingerprintFromNorm]] over
    * a MATERIALIZED normalized column — this inlines `lower(trim(text))`
    * into the gram lambda, which Catalyst re-evaluates per element
    * (quadratic in document length; see [[fingerprintFromNorm]]). */
  def fingerprint(text: Column, gram: Int = 5, k: Int = 4): Column =
    fingerprintFromNorm(lower(trim(text)), gram, k)

  /** Gopher-style REPETITION filters (Rae et al. 2021 §A1.1 "repetition"
    * signals) — the standard quality gate [[qualityScore]]'s
    * length/punct/stopword ratios do not cover: heavily repetitive docs
    * (boilerplate, keyword stuffing, generation loops) score
    *
    *   - `top_bigram_frac`: occurrences of the MOST FREQUENT word bigram
    *     / total bigram occurrences;
    *   - `dup_trigram_frac`: fraction of trigram occurrences whose
    *     trigram appears more than once.
    *
    * Docs with fewer than n+1 tokens score 0.0 (nothing repeats).
    *
    * Shape (the scale-correct one): gram occurrences are EXPLODED and
    * counted in a two-level aggregation — (id, gram) partial counts,
    * then per-doc max/sum — instead of a per-row mode computation, which
    * would be quadratic in document length inside each row. The shuffle
    * carries (id, gram-occurrence) pairs, the same volume as the
    * dedup family's shingle joins; both aggregations are map-side
    * partial. Token arrays are staged ([[Staging.barrier]]) per the
    * lambda-closure rule. */
  def repetitionScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Staging.barrier(
      df.select(col(idCol).as("id"), TextDedup.tokens(col(textCol)).as("t")))
    def fracOf(n: Int, top: Boolean, name: String): DataFrame =
      toks.select(col("id"),
          explode(TextDedup.gramOccurrences(col("t"), n)).as("g"))
        .groupBy("id", "g").agg(count(lit(1)).as("c"))
        .groupBy("id").agg(
          (if (top) max(col("c")) * lit(1.0) / sum(col("c"))
           else sum(when(col("c") > 1, col("c")).otherwise(lit(0L))) * lit(1.0)
             / sum(col("c"))).as(name))
    df.select(col(idCol).as("id"))
      .join(fracOf(2, top = true, "top_bigram_frac"), Seq("id"), "left")
      .join(fracOf(3, top = false, "dup_trigram_frac"), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"),
        coalesce(col("dup_trigram_frac"), lit(0.0)).as("dup_trigram_frac"))
  }

  // -------------------------------------------------------------------
  // Keyword extraction (rarity-weighted top terms)
  // -------------------------------------------------------------------

  /** Per-document TOP-K TERMS by rarity weight — keyword extraction over
    * the corpus. Score = tf / df (term frequency over document
    * frequency): for a fixed tf it ranks exactly like tf·idf (both
    * strictly decreasing in df) and, unlike `ln`-idf, is a single IEEE
    * division of exact integers — bit-identical across engines, so the
    * DuckDB differential can hash the scores. Production tf·idf is the
    * one-line swap `tf * ln((N+1)/(df+1))` documented here; `ln` is only
    * ~1-ulp reproducible across libm implementations, which is why the
    * GATE uses the rational form (the q10 decimal-moments precedent).
    *
    * Shape: exploded token occurrences → (id, term) counts (map-side
    * partial) → document frequencies from the (id, term) relation →
    * equi-join on term (AQE picks broadcast when the term dictionary is
    * small; shuffle-hash otherwise — at 100 TB the dictionary can exceed
    * broadcast size) → per-doc top-k via a PARTITIONED row_number window
    * (partition-local, no global sort). Ties broken by term. */
  def topTermsByRarity(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val tf = df.select(col(idCol).as("id"),
        explode(TextDedup.tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("score").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .withColumn("score", col("tf") * lit(1.0) / col("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"), col("tf"), col("df"),
        col("score"))
  }

  /** Unigram-LM corpus quality (the CCNet-style filter): train word
    * frequencies over the corpus itself, keep the `vocab` most frequent
    * words (count desc, word asc — deterministic), and score every
    * document by the mean log10 unigram probability of its tokens;
    * out-of-vocab words get a half-count floor `log10(0.5/total)`.
    *
    * Cross-engine exactness: per-word log-probs are fixed-pointed to
    * integer MICRO-units (`round(log10(p)·1e6)` as BIGINT) BEFORE the
    * per-document sum, so the aggregate is integer arithmetic —
    * order-independent and bit-identical across Spark and DuckDB, where
    * a float sum would drift with aggregation order. The emitted
    * `avg_logprob` is then a fixed two-division rendering of the exact
    * integers.
    *
    * Scale shape: one exploded-token aggregate for the LM (map-side
    * partial combine), vocab selection via orderBy+LIMIT
    * (TakeOrderedAndProject — per-partition top-k, never a
    * single-partition global sort), the resulting `vocab`-row table
    * BROADCAST into a map-side scoring join, one hash-agg on doc id.
    * The only driver-collected value is the scalar corpus token count
    * (index metadata, same class as the watermark head()). The word-
    * count table is persisted for its two consumers (total + top-k) —
    * it is |distinct words|, not corpus-scale. */
  def lmQuality(df: DataFrame, idCol: String, textCol: String,
      vocab: Int): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(TextDedup.tokens(col(textCol))).as("w"))
    val counts = Staging.barrier(
      toks.groupBy("w").agg(count(lit(1)).as("cnt")))
    val total = counts.agg(sum("cnt")).head.getLong(0)
    def lpMicro(p: Column): Column =
      round(log10(p) * lit(1e6)).cast("long")
    val lm = counts
      .orderBy(col("cnt").desc, col("w").asc).limit(vocab)
      .select(col("w"), lpMicro(col("cnt") * lit(1.0) / lit(total.toDouble)).as("lp"))
    val oov = lpMicro(lit(0.5) / lit(total.toDouble))
    val scored = toks
      .join(broadcast(lm), Seq("w"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("lp"), oov)).as("sum_lp_micro"))
    df.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("sum_lp_micro"), lit(0L)).as("sum_lp_micro"),
        when(col("n_tokens") > 0,
          col("sum_lp_micro") * lit(1.0) / col("n_tokens") / lit(1e6))
          .as("avg_logprob"))
  }

  /** BM25 top-k keyword retrieval (Okapi BM25, Robertson et al., TREC-3)
    * over the corpus for a SMALL static term set — the classic
    * quality-retrieval primitive (rank documents for a probe query;
    * select domain exemplars for targeted sampling).
    *
    * Scale shape — ZERO corpus shuffles before the top-k cut:
    *   - per-doc term frequencies are array expressions over ONE
    *     let-bound token array ([[ExprUtil.bound]] — |terms| filter
    *     lambdas read the bound slot, the tokenizer runs once per row),
    *     entirely map-side;
    *   - corpus statistics (N, avgdl, per-term document frequencies) are
    *     ONE single-row global aggregate crossJoin-broadcast back (the
    *     q11/q15 scalar pattern);
    *   - the k cut is TakeOrderedAndProject (per-partition top-k, never
    *     a global sort).
    *
    * Cross-engine exactness (the t32 rule): each term's contribution is
    * fixed-pointed to integer MICRO-units before the per-doc sum —
    * `round(1e6·idf·tfnorm)` as BIGINT — so the score is a sum of longs
    * over a STATIC term list (fixed expression order, no float
    * aggregation drift). idf/tfnorm inputs (tf, dl, df, N, avgdl) are
    * identical exact values in both engines, the arithmetic is the same
    * IEEE expression tree, and log10 follows the t32 precedent.
    * avgdl is exact: integer dl sums stay below 2^53.
    *
    * Ties at rank k are impossible to cut ambiguously: the ordering
    * (score desc, id asc) is total. */
  /** One term's Okapi BM25 contribution in integer MICRO-units — the
    * SINGLE float expression tree shared by [[bm25TopK]] (tf columns)
    * and [[Retrieval.bm25TopKFromIndex]] (postings rows), so in-query
    * and index-probe scores are bit-identical and both match the
    * oracle's mirrored parenthesization. A zero tf contributes exactly
    * 0L, which is why summing only PRESENT terms (the postings form)
    * equals summing all terms (the tf-column form). */
  private[operators] def bm25Contrib(tfC: Column, dfC: Column,
      nDocs: Column, avgdl: Column, dl: Column, k1: Double,
      b: Double): Column = {
    val tf = tfC.cast("double")
    val dfT = dfC.cast("double")
    val idf = log10(lit(1.0) +
      (nDocs - dfT + lit(0.5)) / (dfT + lit(0.5)))
    val tfnorm = tf * lit(k1 + 1.0) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / avgdl))
    round(lit(1e6) * idf * tfnorm).cast("long")
  }

  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    val tfCols = terms.indices.map(i => s"tf_$i")
    // STAGED: two consumers (stats + scoring) — the barrier holds the
    // tiny (id, dl, tf…) ints frame, not text, so the tokenizer runs
    // once per row, not once per consumer (the family staging rule)
    val perDoc = Staging.barrier(df.select(col(idCol).as("id"),
      ExprUtil.bound(TextDedup.tokens(col(textCol))) { toks =>
        struct((size(toks).as("dl") +:
          terms.zipWithIndex.map { case (term, i) =>
            size(filter(toks, x => x === lit(term))).as(s"tf_$i")
          }): _*)
      }.as("s"))
      .select(col("id") +: col("s.dl").as("dl") +:
        tfCols.map(c => col(s"s.$c").as(c)): _*))
    val stats = perDoc.agg(
      count(lit(1)).as("n_docs"),
      (avg(col("dl")).as("avgdl") +:
        tfCols.map(c => sum(when(col(c) > 0, 1L).otherwise(0L)).as(s"df_$c"))): _*)
    val contrib = tfCols.map(c =>
      bm25Contrib(col(c), col(s"df_$c"), col("n_docs"), col("avgdl"),
        col("dl"), k1, b))
    perDoc.crossJoin(broadcast(stats))
      .filter(tfCols.map(c => col(c) > 0).reduce(_ || _))
      .select(col("id"), contrib.reduce(_ + _).as("score_micro"))
      .orderBy(col("score_micro").desc, col("id").asc)
      .limit(k)
  }

  /** DSIR-style importance weighting (Xie et al. 2023, arXiv:2302.03169):
    * each doc scores Σ_tokens [log p_target(w) − log p_raw(w)] under two
    * unigram LMs — target = the `targetPred` subset, raw = the whole
    * corpus — and the top `budget` docs by score are kept. The LMs share
    * one vocab (top-`vocab` raw tokens, deterministic cut); a vocab word
    * unseen in the target and any out-of-vocab token fall to the 0.5/total
    * floor on their side. Log-probs use [[lmQuality]]'s integer
    * micro-logprob fixed-pointing, so per-doc sums are exact longs and
    * the differential gate is hash-exact despite the transcendentals.
    *
    * Scale shape: both LMs are vocab-bounded METADATA broadcast onto one
    * staged token stream; totals are scalar aggregates. The top-`budget`
    * cut is NOT a global sort — the cutoff row (score, id) is computed
    * TakeOrdered-style (limit budget → tail 1, driver gets one row) and
    * applied as a map-side predicate, the k3 top-k shape. */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, vocab: Int, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val base = df.select(col(idCol).as("id"), col(textCol).as("txt"),
      targetPred.as("is_target"))
    val toks = Staging.barrier(base.select(col("id"), col("is_target"),
      explode(TextDedup.tokens(col("txt"))).as("w")))
    val rawCounts = Staging.barrier(
      toks.groupBy("w").agg(count(lit(1)).as("rcnt")))
    val tgtCounts = toks.filter(col("is_target"))
      .groupBy("w").agg(count(lit(1)).as("tcnt"))
    val rawTotal = rawCounts.agg(sum("rcnt")).head.getLong(0)
    val tgtTotal = toks.filter(col("is_target")).count()
    require(tgtTotal > 0, "targetPred selects no tokens: target LM is undefined")
    def lpMicro(p: Column): Column = round(log10(p) * lit(1e6)).cast("long")
    val oovRaw = lpMicro(lit(0.5) / lit(rawTotal.toDouble))
    val oovTgt = lpMicro(lit(0.5) / lit(tgtTotal.toDouble))
    val lm = rawCounts.orderBy(col("rcnt").desc, col("w").asc).limit(vocab)
      .join(tgtCounts, Seq("w"), "left")
      .select(col("w"),
        lpMicro(col("rcnt") * lit(1.0) / lit(rawTotal.toDouble)).as("lp_raw"),
        coalesce(lpMicro(col("tcnt") * lit(1.0) / lit(tgtTotal.toDouble)),
          oovTgt).as("lp_tgt"))
    val scored = toks.join(broadcast(lm), Seq("w"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("lp_tgt"), oovTgt) - coalesce(col("lp_raw"), oovRaw))
          .as("dsir_micro"))
    val full = Staging.barrier(base.select("id").join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("dsir_micro"), lit(0L)).as("dsir_micro")))
    // cutoff = the budget-th row in (score desc, id asc) order; applied
    // as a predicate so selection never needs a global window
    val cut = full.orderBy(col("dsir_micro").desc, col("id").asc).limit(budget)
      .orderBy(col("dsir_micro").asc, col("id").desc).limit(1)
      .select("dsir_micro", "id").collect().headOption
    val keep = cut match {
      // the id is read generically (lit(Any)) so non-bigint idCol types
      // (int, string) compare under their own ordering, not a forced long
      case Some(r) =>
        col("dsir_micro") > r.getLong(0) ||
          (col("dsir_micro") === r.getLong(0) && col("id") <= lit(r.get(1)))
      case None => lit(true)
    }
    full.withColumn("keep", keep)
  }

  // -------------------------------------------------------------------
  // PII redaction
  // -------------------------------------------------------------------

  /** Patterns are deliberately RE2-compatible (no backreferences, no
    * lookaround) so the DuckDB oracle evaluates the IDENTICAL regex —
    * Spark compiles them with java.util.regex, DuckDB with RE2; staying
    * in the common subset keeps the differential gate honest. Lowercase
    * char classes: redaction runs on normalized (lowercased) text. */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhonePattern = "\\b\\d{3}[-.]\\d{4}\\b"

  /** PII redaction (map-only): masks emails then phone numbers. Spark's
    * `regexp_replace` replaces ALL occurrences (the DuckDB twin needs
    * the explicit 'g' flag). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<email>"),
      PhonePattern, "<phone>")

  /** Occurrence counts for the two PII classes, for audit columns. */
  def piiEmailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long")
  def piiPhoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhonePattern), lit(0))).cast("long")

  // -------------------------------------------------------------------
  // Sequence packing (GPT-style concatenate-then-chop)
  // -------------------------------------------------------------------

  /** Token-budget SEQUENCE PACKING: documents are concatenated in id
    * order into one token stream and chopped into fixed-`capacity`
    * training sequences; each doc gets its stream `start_offset` and the
    * `seq_id` of the sequence its first token lands in — the standard
    * pretraining packing layout, as a relation.
    *
    * The global prefix sum is computed WITHOUT a global window (a
    * `Window.orderBy` with no partition key executes in ONE partition —
    * the classic scale-killer): docs are bucketed by `floor(id /
    * bucketWidth)` (content-independent, deterministic), the cumsum
    * within each bucket is a partition-local window, and the cross-bucket
    * prefix is a window over the tiny per-bucket-totals table (one row
    * per bucket — metadata-scale, like the IVF centroid table) joined
    * back by broadcast. `start_offset` = bucket prefix + within-bucket
    * prefix, exactly the global cumsum in exact integer arithmetic. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      capacity: Int, bucketWidth: Long = 1000L): DataFrame = {
    val n = df.select(col(idCol).as("id"),
      size(TextDedup.tokens(col(textCol))).cast("long").as("n_tokens"))
    val bucketed = n.withColumn("bucket", floor(col("id") / bucketWidth))
    val bucketTotals = bucketed.groupBy("bucket")
      .agg(sum(col("n_tokens")).as("bucket_total"))
    val bucketPrefix = bucketTotals.withColumn("bucket_prefix",
      coalesce(sum(col("bucket_total")).over(
        org.apache.spark.sql.expressions.Window.orderBy("bucket")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("bucket"), col("bucket_prefix"))
    val withinPrefix = bucketed.withColumn("within_prefix",
      coalesce(sum(col("n_tokens")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("bucket").orderBy("id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
    withinPrefix.join(broadcast(bucketPrefix), Seq("bucket"))
      .select(col("id"), col("n_tokens"),
        (col("bucket_prefix") + col("within_prefix")).as("start_offset"))
      .withColumn("seq_id", floor(col("start_offset") / capacity).cast("long"))
  }

  /** Deterministic corpus SHUFFLE + shard assignment — the "randomize
    * order before sharding for training" step, seeded so a retried job
    * produces byte-identical shards. Order = md5(seed:id); `rank` is the
    * 0-based position in that order and `shard` = rank mod `nShards`
    * (round-robin ⇒ shard sizes within 1 of each other).
    *
    * The global rank uses the [[packSequences]] trick — NO global-order
    * window: the hash's first byte buckets the corpus into 256 hash
    * ranges (a bucket is a PREFIX of the sort key, so bucket-major order
    * IS hash order), within-bucket ranks are partition-local windows,
    * and the cross-bucket offset comes from the 256-row totals table,
    * broadcast back. */
  def shuffleShards(df: DataFrame, idCol: String, seed: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val hashed = df.select(col(idCol).as("id"),
        md5(concat_ws(":", lit(seed), col(idCol))).as("h"))
      .withColumn("bucket", substring(col("h"), 1, 2))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy("h", "id")
    val withRk = hashed.withColumn("wrk", row_number().over(wIn))
    val prefix = withRk.groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .withColumn("bp", coalesce(sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.orderBy("bucket")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("bucket"), col("bp"))
    withRk.join(broadcast(prefix), Seq("bucket"))
      .select(col("id").as(idCol),
        (col("bp") + col("wrk") - 1).as("rank"),
        ((col("bp") + col("wrk") - 1) % nShards).cast("int").as("shard"))
  }

  // -------------------------------------------------------------------
  // Per-group caps + chunking
  // -------------------------------------------------------------------

  /** Cap rows per group (the RefinedWeb-style "at most N documents per
    * domain" quota): keep `cap` rows per `groupCol` value, chosen by a
    * DETERMINISTIC md5 order over (group, id) — a reproducible uniform
    * draw, not head-of-file bias (the t18 hash-mod rationale: a retried
    * job keeps the same rows).
    *
    * The ranking window is PARTITIONED by group. A pathological group
    * (one domain = half the corpus) concentrates in one partition; for
    * heavy-tailed group histograms, pre-filter with the hash-mod
    * fraction `cap / group_count` (map-side, approximate cap) and apply
    * this exact ranking to the survivors — two lines with
    * [[stratified-sample]]-style keep decisions; gated here in the
    * exact form. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
      cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(md5(concat_ws(":", col(groupCol), col(idCol))), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__rk")
  }

  /** Temperature-scaled source mixing (α-sampling, the XLM-R / mT5
    * multilingual recipe): per-group sampling weights w_g ∝ n_g^α with
    * α = 1/2, then a deterministic per-group quota toward a document
    * `budget`. All weight arithmetic is INTEGER-scaled so the contract
    * is engine-portable:
    *
    *   wi_g    = floor(sqrt(n_g) · 1e6)      — IEEE sqrt and multiply
    *             are correctly rounded, so wi is bit-identical across
    *             engines; a general pow(n, α) would not be, which is why
    *             α is fixed at 1/2 rather than a parameter
    *   ppm_g   = wi_g · 1_000_000 div Σ wi   — integer division
    *   quota_g = min(n_g, ppm_g · budget div 1_000_000)
    *
    * Selection within a group is the [[capPerGroup]] md5-rank (uniform,
    * deterministic, retry-stable). Returns one row per input doc:
    * (id, group, n_docs, ppm, quota, keep).
    *
    * Scale shape: group counts and weights are METADATA (one row per
    * group) — one map-side-combined agg, broadcast back onto the corpus;
    * the only corpus-scale work is the per-group rank window, which
    * shares [[capPerGroup]]'s skew caveat (pre-filter with a hash-mod
    * fraction before the exact rank for pathological groups). Quota
    * arithmetic overflows only past ~9e12 budget docs (ppm ≤ 1e6). */
  def mixtureWeights(df: DataFrame, groupCol: String, idCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("n_docs"))
      .withColumn("wi",
        floor(sqrt(col("n_docs").cast("double")) * lit(1000000.0)).cast("long"))
    val total = counts.agg(sum("wi").as("tw"))
    val wts = counts.crossJoin(broadcast(total))
      .withColumn("ppm", expr("wi * 1000000L div tw"))
      .withColumn("quota", least(col("n_docs"), expr(s"ppm * ${budget}L div 1000000L")))
      .select(groupCol, "n_docs", "ppm", "quota")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(md5(concat_ws(":", col(groupCol), col(idCol))), col(idCol))
    df.select(col(idCol), col(groupCol))
      .withColumn("__rk", row_number().over(w))
      .join(broadcast(wts), Seq(groupCol))
      .withColumn("keep", col("__rk") <= col("quota"))
      .drop("__rk")
  }

  /** Split documents into overlapping token-window chunks — embedding /
    * retrieval prep (a chunk is what gets embedded; the overlap keeps
    * sentence fragments from being split blind). Emits one row per
    * chunk: (doc_id, chunk_idx, start_tok, n_tok, chunk_text). Chunk
    * starts march by `chunkTokens − overlap`; the final chunk may be
    * short (included whenever its start is inside the doc). Empty docs
    * emit nothing.
    *
    * Map-only after the staged tokenization (the generate multiplies
    * rows, never shuffles); tokens are a MATERIALIZED attribute per the
    * lambda-closure rule, so per-chunk slicing reads the array, not the
    * tokenizer. */
  /** Non-overlapping chunk structs `array<struct<chunk_idx int,
    * chunk_text string>>` of a MATERIALIZED-or-bound token column — the
    * ONE chunk-boundary spelling shared by the batch paragraph dedup
    * ([[TextDedup.paragraphDedup]]) and its streaming twin
    * ([[graft.streaming.StreamingIngest.streamingParagraphClaims]]), so
    * the twins cannot drift apart on boundary arithmetic. NULL (for the
    * caller's guard/explode to drop) when the doc has no tokens. */
  def chunkStructs(t: Column, chunkTokens: Int): Column =
    when(size(t) > 0,
      transform(
        sequence(lit(0), floor((size(t) - 1) / lit(chunkTokens)).cast("int")),
        ci => struct(ci.as("chunk_idx"),
          concat_ws(" ", slice(t, ci * chunkTokens + 1, lit(chunkTokens)))
            .as("chunk_text"))))

  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap($overlap) < chunkTokens($chunkTokens)")
    val step = chunkTokens - overlap
    val toks = Staging.barrier(
      df.select(col(idCol).as("doc_id"), TextDedup.tokens(col(textCol)).as("t")))
    toks.filter(size(col("t")) > 0)
      .select(col("doc_id"), col("t"),
        posexplode(sequence(lit(0), size(col("t")) - 1, lit(step)))
          .as(Seq("chunk_idx", "start_tok")))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        least(lit(chunkTokens), size(col("t")) - col("start_tok")).as("n_tok"),
        concat_ws(" ", slice(col("t"), col("start_tok") + 1, lit(chunkTokens)))
          .as("chunk_text"))
  }

  /**
   * Bigram-LM coherence scoring — the local-fluency signal the unigram
   * [[lmQuality]] cannot see (a bag of common words scores well
   * unigram-wise however scrambled; the bigram conditional punishes
   * unseen transitions). The production reference is CCNet's 5-gram
   * KenLM; this is the distributed in-engine shape of the same idea,
   * self-trained on the corpus in one extra aggregate.
   *
   * Smoothed conditional in the t32 integer discipline:
   * `lp(w|prev) = round(log10((2·c₂+1) / (2·c₁(prev)+V)) · 1e6)` —
   * add-half smoothing with all-integer numerator/denominator, ONE
   * division, one log10, rounded to BIGINT micro BEFORE the per-doc
   * sum, so the aggregate is order-independent integer arithmetic.
   *
   * Scale shape: two corpus-pass aggregates (unigram + bigram counts,
   * map-side combined), the score table = observed-bigram-sized joined
   * back onto the exploded doc bigrams by (l, r) — the same key both
   * sides, AQE-broadcastable while the bigram table is small; V is one
   * driver scalar. Docs shorter than 2 tokens score (0, 0) via the
   * final left join.
   */
  /** Partition count for an n-gram STREAM barrier: data-derived from
    * the input corpus' optimizer size estimate (file bytes for a fresh
    * parquet read — the n-gram explode's own stats are a multiplied
    * guess), ScanFanout's 64 KB-of-compressed-input-per-partition
    * sizing, capped at the session's width (max of core count and
    * configured shuffle partitions — production sets
    * spark.sql.shuffle.partitions per guide §2.2 and the cap follows
    * it). The EXPLICIT count matters: a by-column repartition with a
    * user-specified N is immune to AQE coalescing, so the cached
    * stream's HashPartitioning survives for every downstream consumer
    * to reuse (the whole point — see the call sites). */
  private def streamPartitions(input: DataFrame): Int = {
    val spark = input.sparkSession
    val bytes = input.queryExecution.optimizedPlan.stats.sizeInBytes
    val target = 64L << 10
    val cap = math.max(spark.sparkContext.defaultParallelism,
      spark.sessionState.conf.numShufflePartitions)
    ((bytes + target - 1) / target).min(BigInt(cap)).max(BigInt(2)).toInt
  }

  def bigramLmQuality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Staging.barrier(
      df.select(col(idCol).as("id"), TextDedup.tokens(col(textCol)).as("t")))
    val uni = Staging.barrier(
      toks.select(explode(col("t")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c1")))
    // V as a broadcast one-row scalar, not a driver count(): the eager
    // count() was a full serial materialization pass before the scoring
    // job could even be planned (guide §5 — the driver should not gate
    // the pipeline); as a crossJoined column the SAME long feeds the
    // SAME expression tree, so the IEEE contract is untouched.
    val v = uni.agg(count(lit(1)).as("v"))
    // one stream exchange shared by the count groupBy and the score
    // probe join (r22, guide §2.4 — see kneserNeyLmQuality's note)
    val bg = Staging.barrier(
      toks.filter(size(col("t")) >= 2)
        .select(col("id"), explode(transform(sequence(lit(0), size(col("t")) - 2),
          i => struct(element_at(col("t"), i + 1).as("l"),
            element_at(col("t"), i + 2).as("r")))).as("p"))
        .select(col("id"), col("p.l").as("l"), col("p.r").as("r"))
        .repartition(streamPartitions(df), col("l"), col("r")))
    val sc = bg.groupBy("l", "r").agg(count(lit(1)).as("c2"))
      .join(uni.withColumnRenamed("w", "l"), Seq("l"))
      .crossJoin(broadcast(v))
      .select(col("l"), col("r"),
        round(log10((col("c2") * 2 + 1) * lit(1.0) / (col("c1") * 2 + col("v")))
          * lit(1e6)).cast("long").as("lp"))
    val scored = bg.join(sc, Seq("l", "r"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp").as("sum_lp_micro"))
    df.select(col(idCol).as("id")).join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_lp_micro"), lit(0L)).as("sum_lp_micro"))
  }

  /**
   * Interpolated Kneser–Ney bigram LM scoring — the industry-standard
   * smoothing ([[bigramLmQuality]]'s add-half is the teaching
   * baseline; KN is what KenLM/CCNet actually run). Discount d = 3/4,
   * kept EXACTLY rational so both engines compute one identical
   * integer fraction per bigram:
   *
   *   P(r|l) = max(c(l,r) − d, 0)/c(l·) + d·N1+(l·)/c(l·) · N1+(·r)/B
   *          = [max(4·c2 − 3, 0)·B + 3·N1l·N1r] / (4·cl·B)
   *
   * where `c(l·)` = occurrences of l as a LEFT context, `N1+(l·)` =
   * distinct continuations of l, `N1+(·r)` = distinct left contexts of
   * r (the continuation count — KN's insight: "Francisco" is frequent
   * but follows only "San", so its continuation probability is tiny),
   * and B = distinct bigram types. The t32/t76 integer discipline:
   * integer numerator and denominator, ONE division, one log10,
   * rounded to BIGINT micro per bigram BEFORE the per-doc sum.
   * Self-trained on the corpus, so every scored bigram is observed
   * (c2 ≥ 1) and the max() never bites — it stays for the backoff
   * form's sake.
   *
   * Scale shape: one corpus pass to bigram-type counts (map-side
   * combined); every KN statistic (cl, N1l, N1r, B) derives from that
   * bigram-TYPE table, not the corpus — three small aggregations and
   * one driver scalar; per-doc scoring joins doc bigrams to the
   * type-sized score table on (l, r), AQE-broadcastable.
   */
  def kneserNeyLmQuality(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // tokens inline via ExprUtil.bound, not a persist barrier (r21):
    // the token table had exactly ONE consumer (this bigram explode),
    // so the persist bought no reuse and cost a serial materialization
    // pass; the bound lambda variable still evaluates the tokenizer
    // once per row (the lambda-closure rule).
    // ONE stream exchange for the whole lattice (r22, guide §2.4
    // "operations keyed the same way share one exchange"): the bigram
    // stream is hash-partitioned by (l, r) ONCE at the barrier, and
    // every stream-scale operation downstream — the bigram-type count
    // bgc (grouping ⊇ partition keys), the score join sc⋈bgc, and the
    // final bg⋈sc probe — reuses that partitioning exchange-free. The
    // vocab-sized stats (cl, nr) still shuffle/broadcast, but they are
    // type-table-sized, not stream-sized. (l, r) is the full bigram —
    // flat under word-frequency skew, unlike a single-word key.
    // Physical placement only: every aggregate is an exact integer
    // count/sum, so results are partitioning-insensitive (oracle-
    // gated).
    val bg = Staging.barrier(
      df.select(col(idCol).as("id"),
          ExprUtil.bound(TextDedup.tokens(col(textCol))) { t =>
            when(size(t) >= 2, transform(sequence(lit(0), size(t) - 2),
              i => struct(element_at(t, i + 1).as("l"),
                element_at(t, i + 2).as("r"))))
          }.as("g"))
        .filter(col("g").isNotNull)
        .select(col("id"), explode(col("g")).as("p"))
        .select(col("id"), col("p.l").as("l"), col("p.r").as("r"))
        .repartition(streamPartitions(df), col("l"), col("r")))
    val bgc = Staging.barrier(
      bg.groupBy("l", "r").agg(count(lit(1)).as("c2")))
    // B as a broadcast one-row scalar (see bigramLmQuality's V note):
    // same long, same integer numerator/denominator, one fewer serial
    // driver-gated materialization pass.
    val b = bgc.agg(count(lit(1)).as("b"))
    val cl = bgc.groupBy("l")
      .agg(sum("c2").as("cl"), count(lit(1)).as("n1l"))
    val nr = bgc.groupBy("r").agg(count(lit(1)).as("n1r"))
    val sc = bgc.join(cl, Seq("l")).join(nr, Seq("r"))
      .crossJoin(broadcast(b))
      .select(col("l"), col("r"),
        round(log10(
          (greatest(col("c2") * 4 - 3, lit(0L)) * col("b") +
            lit(3L) * col("n1l") * col("n1r")) * lit(1.0) /
          (col("cl") * 4 * col("b"))) * lit(1e6)).cast("long").as("lp"))
    val scored = bg.join(sc, Seq("l", "r"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp").as("sum_lp_micro"))
    df.select(col(idCol).as("id")).join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_lp_micro"), lit(0L)).as("sum_lp_micro"))
  }

  /**
   * TRIGRAM interpolated Kneser–Ney — the full KenLM-shape recursion
   * one order up from [[kneserNeyLmQuality]]:
   *
   *   P(w3|w1w2) = max(c123−d,0)/c12 + d·N1+(w1w2·)/c12 · Pc(w3|w2)
   *   Pc(w3|w2)  = max(N1+(·w2w3)−d,0)/N1+(·w2·)
   *                + d·N1+(w2·)/N1+(·w2·) · N1+(·w3)/B2
   *
   * with d = 3/4 and every statistic derived from the TRIGRAM-TYPE
   * table (the standard continuation construction: the lower order is
   * counted over distinct higher-order types, not raw occurrences).
   * The value is assembled in ONE agreed IEEE expression order shared
   * verbatim with the oracle — integer numerators (exact in double),
   * then the fixed division/add/multiply tree, then log10 → BIGINT
   * micro per trigram before the per-doc integer sum. Unlike the
   * bigram case a single common denominator would overflow Long, so
   * cross-engine equality rides IEEE determinism of the IDENTICAL
   * operation tree (the t76/t92 log10 contract, extended to the
   * arithmetic).
   *
   * Scale shape: one corpus pass to trigram-type counts; c12/N1l by
   * (w1,w2), the continuation relation (w2,w3) and its three
   * aggregates all from the type table; B2 one driver scalar. Doc
   * scoring joins the type-sized score table on (w1,w2,w3).
   */
  def kneserNeyTrigramQuality(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // tokens inline (single consumer — see kneserNeyLmQuality's note)
    // ONE stream exchange for the stream-scale half of the lattice
    // (r22, guide §2.4 — see bigramLmQuality's note): hash-partition
    // the trigram stream by (w1, w2) once; the trigram-type count tgc
    // (grouping ⊇ partition keys), the context stats c12, the score
    // join sc = tgc⋈c12, and the final tg⋈sc probe all reuse it
    // exchange-free. The continuation tables (bg23, m2, k2, r3) key on
    // suffixes and still shuffle — but they are TYPE-table-sized, not
    // stream-sized. (w1, w2) is a full bigram key: flat under
    // word-frequency skew. Physical placement only (exact integer
    // aggregates; oracle-gated).
    val tg = Staging.barrier(
      df.select(col(idCol).as("id"),
          ExprUtil.bound(TextDedup.tokens(col(textCol))) { t =>
            when(size(t) >= 3, transform(sequence(lit(0), size(t) - 3),
              i => struct(element_at(t, i + 1).as("w1"),
                element_at(t, i + 2).as("w2"),
                element_at(t, i + 3).as("w3"))))
          }.as("g"))
        .filter(col("g").isNotNull)
        .select(col("id"), explode(col("g")).as("p"))
        .select(col("id"), col("p.w1").as("w1"), col("p.w2").as("w2"),
          col("p.w3").as("w3"))
        .repartition(streamPartitions(df), col("w1"), col("w2")))
    val tgc = Staging.barrier(
      tg.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3")))
    val c12 = tgc.groupBy("w1", "w2")
      .agg(sum("c3").as("c12"), count(lit(1)).as("n1l"))
    // continuation relation: distinct (w2, w3) with its distinct-w1
    // count — the bigram "type of types" level
    val bg23 = Staging.barrier(
      tgc.groupBy("w2", "w3").agg(count(lit(1)).as("cc23")))
    val m2 = tgc.groupBy("w2").agg(count(lit(1)).as("m2"))
    val k2 = bg23.groupBy("w2").agg(count(lit(1)).as("k2"))
    val r3 = bg23.groupBy("w3").agg(count(lit(1)).as("r3"))
    // B2 as a broadcast one-row scalar (see bigramLmQuality's V note):
    // identical long through the identical IEEE tree, minus one serial
    // driver-gated pass.
    val b2 = bg23.agg(count(lit(1)).as("b2"))
    // bottom-up composition (r21): the flat form joined all five stat
    // tables onto the TRIGRAM-TYPE stream — five sequential broadcast
    // joins each widening the big intermediate. The continuation factor
    // Pc(w3|w2) depends only on (w2, w3), so it is assembled first on
    // the bg23-sized table and the big stream pays TWO joins instead of
    // five. `pc` is exactly the original expression's parenthesized
    // inner factor — a named double column evaluates the identical IEEE
    // tree (JVM doubles carry no extended precision across the split).
    val pc23 = bg23.join(m2, Seq("w2")).join(k2, Seq("w2"))
      .join(r3, Seq("w3"))
      .crossJoin(broadcast(b2))
      .select(col("w2"), col("w3"),
        ((greatest(col("cc23") * 4 - 3, lit(0L)) / (col("m2") * lit(4.0))) +
          ((lit(3.0) * col("k2")) / (col("m2") * lit(4.0))) *
          (col("r3") * lit(1.0) / col("b2"))).as("pc"))
    val sc = tgc.join(c12, Seq("w1", "w2")).join(pc23, Seq("w2", "w3"))
      .select(col("w1"), col("w2"), col("w3"),
        round(log10(
          (greatest(col("c3") * 4 - 3, lit(0L)) / (col("c12") * lit(4.0))) +
          ((lit(3.0) * col("n1l")) / (col("c12") * lit(4.0))) * col("pc")
        ) * lit(1e6)).cast("long").as("lp"))
    val scored = tg.join(sc, Seq("w1", "w2", "w3"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_trigrams"), sum("lp").as("sum_lp_micro"))
    df.select(col(idCol).as("id")).join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("sum_lp_micro"), lit(0L)).as("sum_lp_micro"))
  }

  /**
   * 4-GRAM MODIFIED Kneser–Ney — the full KenLM configuration
   * (Chen & Goodman 1999's modified KN): one order above
   * [[kneserNeyTrigramQuality]] and, instead of the single rational
   * discount, THREE count-dependent discounts per order derived from
   * that order's count-of-counts n1..n4:
   *
   *   Y    = n1/(n1 + 2·n2)
   *   D1   = Y                      (applies to types with count 1)
   *   D2   = 2 − 3·Y·n3/n2          (count 2)
   *   D3+  = 3 − 4·Y·n4/n3          (count ≥ 3)
   *   γ(ctx) = (D1·N1(ctx·) + D2·N2(ctx·) + D3+·N3+(ctx·)) / c(ctx)
   *
   * applied at every level of the continuation recursion (4-gram raw
   * counts → trigram continuation types → bigram continuation types →
   * the unigram continuation tail r4/B3, the t93 shape one order up).
   * All n_i are exact integer aggregates of the level's TYPE table, so
   * each discount is one IEEE division/multiply chain over exact-in-
   * double integers, embedded as the IDENTICAL expression tree in both
   * engines (the t93 contract: basic double arithmetic is IEEE-
   * deterministic; only libm beyond log10 is off-limits). Discount
   * denominators require n2 > 0 and n3 > 0 at every level — true for
   * any natural corpus; enforced LOUDLY. n1 = 0 (a level with no
   * singleton types — dense corpora) is fine: Y = 0 zeroes the
   * singleton discount, which is exactly right.
   *
   * Scale shape: one corpus pass to 4-gram-type counts; every other
   * statistic (context sums, N-class counts, continuation tables,
   * count-of-counts) derives from type tables that grow far slower
   * than rows; the three count-of-counts rows are driver scalars.
   * Doc scoring joins the type-sized score table on (w1..w4).
   */
  def kneserNeyModified4gramQuality(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // tokens inline (single consumer — see kneserNeyLmQuality's note)
    // ONE stream exchange for the whole lattice (r22, guide §2.4 —
    // see bigramLmQuality's note): hash-partition the 4-gram stream by
    // (w2, w3) once. (w2, w3) is a subset of EVERY stream-scale
    // grouping and join key here — fgc (w1..w4), cc234 (w2,w3,w4),
    // ctx123 (w1,w2,w3), ctx23 (w2,w3), the p3t assembly
    // cc234⋈ctx23⋈p2t, the score joins sc = fgc⋈ctx123⋈p3t, and the
    // final fg⋈sc probe — so all of them co-partition off this one
    // exchange (HashPartitioning by a subset of the grouping/join keys
    // satisfies the required clustering). Only the LEVEL-2 tables
    // (cc34, ctx3, r4, p2t) re-shuffle, and they are bigram-type-
    // sized. The r21 profile charged ~40 MB of shuffle to this
    // lattice's repeated stream-keyed exchanges; this removes all but
    // the first. (w2, w3) is a full bigram key: flat under word-
    // frequency skew. Physical placement only (exact integer
    // aggregates; oracle-gated).
    val fg = Staging.barrier(
      df.select(col(idCol).as("id"),
          ExprUtil.bound(TextDedup.tokens(col(textCol))) { t =>
            when(size(t) >= 4, transform(sequence(lit(0), size(t) - 4),
              i => struct(element_at(t, i + 1).as("w1"),
                element_at(t, i + 2).as("w2"),
                element_at(t, i + 3).as("w3"),
                element_at(t, i + 4).as("w4"))))
          }.as("g"))
        .filter(col("g").isNotNull)
        .select(col("id"), explode(col("g")).as("p"))
        .select(col("id"), col("p.w1").as("w1"), col("p.w2").as("w2"),
          col("p.w3").as("w3"), col("p.w4").as("w4"))
        .repartition(streamPartitions(df), col("w2"), col("w3")))
    val fgc = Staging.barrier(
      fg.groupBy("w1", "w2", "w3", "w4").agg(count(lit(1)).as("c4")))
    val cc234 = Staging.barrier(
      fgc.groupBy("w2", "w3", "w4").agg(count(lit(1)).as("cc234")))
    val cc34 = Staging.barrier(
      cc234.groupBy("w3", "w4").agg(count(lit(1)).as("cc34")))
    // modified discounts per level, from the level's count-of-counts —
    // ALL THREE levels (plus the unigram-tail total B3) in ONE driver
    // job: the per-level `.head()` form was four serial driver-gated
    // materialization passes before the scoring plan could be built
    // (guide §5/§1.2); a union-aggregate returns the same exact longs
    // in one round-trip, and the cc234/cc34 barriers still materialize
    // exactly once inside it.
    val ccLevels = fgc.select(lit(4).as("lvl"), col("c4").as("c"))
      .unionByName(cc234.select(lit(3).as("lvl"), col("cc234").as("c")))
      .unionByName(cc34.select(lit(2).as("lvl"), col("cc34").as("c")))
      .groupBy("lvl").agg(
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"),
        sum(when(col("c") === 3, 1L).otherwise(0L)).as("n3"),
        sum(when(col("c") === 4, 1L).otherwise(0L)).as("n4"),
        count(lit(1)).as("total"))
      .collect().map(r => r.getInt(0) -> r).toMap
    def discounts(lvl: Int, cCol: String): (Double, Double, Double) = {
      // a level with ZERO rows (no document reaches 4 tokens) must fail
      // with the intended n2/n3 diagnostic, not a bare
      // NoSuchElementException from the fused-union lookup (r21 ADVICE)
      require(ccLevels.contains(lvl),
        s"modified KN needs n2 > 0 and n3 > 0 at every level; level " +
          s"$lvl ($cCol) has zero n-gram types in this corpus")
      val r = ccLevels(lvl)
      val (n1, n2, n3, n4) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
      // only n2 and n3 sit in denominators (and Y's n1+2n2); n1 = 0
      // (no singleton types at a level — dense corpora) gives Y = 0,
      // a zero singleton discount, which is exactly right
      require(n1 + 2 * n2 > 0 && n2 > 0 && n3 > 0,
        s"modified KN needs n2 > 0 and n3 > 0 at every level; got " +
          s"($n1, $n2, $n3, $n4) for $cCol")
      val y = n1.toDouble / (n1 + 2 * n2)
      (y, 2.0 - 3.0 * y * n3 / n2, 3.0 - 4.0 * y * n4 / n3)
    }
    val (d41, d42, d43) = discounts(4, "c4")
    val (d31, d32, d33) = discounts(3, "cc234")
    val (d21, d22, d23) = discounts(2, "cc34")
    def dOf(c: Column, d1: Double, d2: Double, d3: Double): Column =
      when(c === 1, lit(d1)).when(c === 2, lit(d2)).otherwise(lit(d3))
    def classes(g: org.apache.spark.sql.RelationalGroupedDataset,
        cCol: String, pfx: String) = g.agg(
      sum(cCol).as(s"${pfx}m"),
      sum(when(col(cCol) === 1, 1L).otherwise(0L)).as(s"${pfx}1"),
      sum(when(col(cCol) === 2, 1L).otherwise(0L)).as(s"${pfx}2"),
      sum(when(col(cCol) >= 3, 1L).otherwise(0L)).as(s"${pfx}3"))
    val ctx123 = classes(fgc.groupBy("w1", "w2", "w3"), "c4", "a")
    val ctx23 = classes(cc234.groupBy("w2", "w3"), "cc234", "b")
    val ctx3 = classes(cc34.groupBy("w3"), "cc34", "g")
    val r4 = cc34.groupBy("w4").agg(count(lit(1)).as("r4"))
    // B3 = |cc34| rode along in the fused count-of-counts job
    val b3Total = ccLevels(2).getLong(5)
    // bottom-up composition (r21, the kneserNeyTrigramQuality shape):
    // the flat form joined all six stat tables onto the 4-GRAM-TYPE
    // stream. Each continuation level depends only on its own suffix
    // keys, so level 2 assembles on the cc34-sized table, level 3 on
    // the cc234-sized table, and the big stream pays TWO joins instead
    // of six. p2/p3 are exactly the original parenthesized inner
    // factors — named double columns evaluate the identical IEEE tree.
    val p2t = cc34.join(ctx3, Seq("w3")).join(r4, Seq("w4"))
      .select(col("w3"), col("w4"),
        (((col("cc34") - dOf(col("cc34"), d21, d22, d23)) / col("gm")) +
          ((lit(d21) * col("g1") + lit(d22) * col("g2") +
            lit(d23) * col("g3")) / col("gm")) *
          (col("r4") * lit(1.0) / lit(b3Total))).as("p2"))
    val p3t = cc234.join(ctx23, Seq("w2", "w3"))
      .join(p2t, Seq("w3", "w4"))
      .select(col("w2"), col("w3"), col("w4"),
        (((col("cc234") - dOf(col("cc234"), d31, d32, d33)) / col("bm")) +
          ((lit(d31) * col("b1") + lit(d32) * col("b2") +
            lit(d33) * col("b3")) / col("bm")) * col("p2")).as("p3"))
    val sc = fgc.join(ctx123, Seq("w1", "w2", "w3"))
      .join(p3t, Seq("w2", "w3", "w4"))
      .select(col("w1"), col("w2"), col("w3"), col("w4"),
        round(log10(
          ((col("c4") - dOf(col("c4"), d41, d42, d43)) / col("am")) +
          ((lit(d41) * col("a1") + lit(d42) * col("a2") +
            lit(d43) * col("a3")) / col("am")) * col("p3")
        ) * lit(1e6)).cast("long").as("lp"))
    val scored = fg.join(sc, Seq("w1", "w2", "w3", "w4"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_4grams"), sum("lp").as("sum_lp_micro"))
    df.select(col(idCol).as("id")).join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_4grams"), lit(0L)).as("n_4grams"),
        coalesce(col("sum_lp_micro"), lit(0L)).as("sum_lp_micro"))
  }

  // -------------------------------------------------------------------
  // Hashed linear quality classifier (fastText-shaped inference)
  // -------------------------------------------------------------------

  /** Classifier feature bag: unigram occurrences plus bigram
    * occurrences (the fastText word-n-gram recipe, Joulin et al. 2017
    * — bags, not sets: a repeated n-gram votes repeatedly). Pass a
    * MATERIALIZED token attribute (the lambda-closure rule). */
  def classifierFeatures(toks: Column): Column =
    concat(toks, TextDedup.gramOccurrences(toks, 2))

  /** Feature → 32-bit hash bucket in the repo's cross-engine hash
    * currency (md5 prefix; Spark `conv` ↔ DuckDB `CAST('0x'||…)`). */
  private def featureBucket(f: Column): Column =
    conv(substring(md5(f), 1, 8), 16, 10).cast("long")

  /** Bucket → weight in micro-units, range [0, 2000]. THE MODEL SEAM:
    * this hash-derived stand-in makes the operator self-contained and
    * bit-exactly oracle-checkable; production swaps it for a lookup
    * into a broadcast bucket→weight table distilled from a trained
    * linear model — every other part of the operator (feature
    * extraction, bag scoring, integer logit, banding) is unchanged.
    * Non-negative by construction so the `%` agrees cross-engine. */
  private def featureWeightMicro(f: Column): Column =
    featureBucket(f) % lit(2001L)

  /** Integer micro-logit of the feature bag: Σ weight(f) − 1000·|f|
    * (centering by subtraction, NOT an average — no division, so the
    * gated value is integer-exact in both engines; an empty bag scores
    * exactly 0). Map-side only: one md5 per feature, one fold. */
  def classifierLogitMicro(feats: Column): Column =
    aggregate(feats, lit(0L), (acc, f) => acc + featureWeightMicro(f)) -
      lit(1000L) * size(feats)

  /** Per-document classifier verdicts: `n_feats`, `logit_micro`,
    * `keep` (logit > 0) and a three-way `band` at `bandHiMicro`.
    * One map-only pass: the logit is the fused
    * [[graft.functions.ClassifierLogit]] kernel (one walk, no feature
    * array — contract-identical to the composed
    * [[classifierLogitMicro]]∘[[classifierFeatures]] baseline), and
    * `n_feats` is arithmetic on the token count (|bag| = n + max(n−1,
    * 0)). All references live in ONE collapsed projection, where
    * whole-stage codegen's subexpression elimination evaluates the
    * tokenizer and the kernel once per row (CSE reaches ordinary
    * projections — it is only LAMBDA bodies it cannot see into; the
    * langId lesson). */
  def classifyQuality(df: DataFrame, idCol: String, textCol: String,
      bandHiMicro: Long): DataFrame =
    df.select(col(idCol).as("id"), TextDedup.tokens(col(textCol)).as("t"))
      .select(col("id"),
        (size(col("t")) + greatest(size(col("t")) - 1, lit(0)))
          .cast("long").as("n_feats"),
        graft.functions.ClassifierLogit(col("t")).as("logit_micro"))
      .withColumn("keep", col("logit_micro") > 0)
      .withColumn("band",
        when(col("logit_micro") > bandHiMicro, "high")
          .when(col("logit_micro") > 0, "mid")
          .otherwise("low"))
}
