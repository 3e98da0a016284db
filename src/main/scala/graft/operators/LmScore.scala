package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style language-model quality filtering: train an n-gram LM on a
  * REFERENCE corpus (the "clean" distribution — Wikipedia in CCNet,
  * reference: the pipeline pattern of Wenzek et al. 2020, arXiv:1911.00359),
  * score every candidate document by its per-token log-probability under
  * that LM, and let the pipeline keep/bucket documents by score. The
  * production systems use KenLM 5-grams; this is the same statistic over a
  * bigram LM with STUPID BACKOFF (Brants et al. 2007, "Large Language
  * Models in Machine Translation" — the web-scale smoothing: no
  * discounting, one backoff multiplier), which keeps every stage a pure
  * Spark aggregation/join and the score deterministic enough for an exact
  * SQL oracle.
  *
  * 100 TB design:
  *  - Training is two groupBy-count aggregations over exploded grams —
  *    map-side partial aggregation does the heavy lifting; the LM lives as
  *    DataFrames (persist to any table for reuse), NEVER collected to the
  *    driver. Only two O(1) scalars (total tokens, vocabulary size) are
  *    collected.
  *  - Scoring is three equi-joins keyed on gram columns — Catalyst
  *    hash-partitions both sides on the gram key, so work is
  *    ∝ corpus grams + LM size; a small LM auto-broadcasts. No UDFs: the
  *    probability arithmetic is codegen'd column expressions.
  *
  * Tokenization is the engine's standard lowercase-whitespace split (the
  * same contract as BM25 / the text stats), mirrored exactly by
  * `regexp_split_to_array(lower(trim(text)), '\s+')` on the oracle side.
  */
object LmScore {

  /** A trained bigram LM: unigram counts `(w, cnt)`, bigram counts
    * (w1, w2, cnt)`, total reference token count and vocabulary size.
    * The count frames come back PERSISTED (memory-and-disk — an LM is
    * vocabulary-sized, far smaller than the corpus it summarizes, and
    * spills rather than OOMs): the scoring joins reference the unigram
    * table twice (history side, backoff side) and must not re-tokenize
    * the reference per use. Call [[BigramLm.unpersist]] when done, or
    * write the frames to tables for cross-job reuse.
    */
  final case class BigramLm(unigrams: DataFrame, bigrams: DataFrame,
      totalTokens: Long, vocabSize: Long) {
    def unpersist(): Unit = {
      unigrams.unpersist(blocking = false)
      bigrams.unpersist(blocking = false)
      ()
    }
  }

  private def toks(text: Column): Column =
    graft.functions.TextFunctions.tokens(lower(text))

  /** Bigram structs of a token array (empty when fewer than 2 tokens).
    * `zip_with(slice, slice)`, not `transform(sequence, element_at)`: the
    * element_at form duplicates the token expression into every index
    * access, and when the caller inlines the tokenizer that re-runs the
    * regex split PER TOKEN — O(len²) (measured 11.1 s vs 0.7 s on the
    * sf0.1 documents, PLANS.md r14; same trap `bindOnce` documents for
    * shingles). Callers must still bind the tokenizer to a column first.
    */
  private def bigramsOf(t: Column): Column =
    when(size(t) < 2, array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))

  private val cacheLvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  private def tokenized(ref: DataFrame, textCol: String): DataFrame =
    ref.select(toks(col(textCol)).as("__t")).filter(size(col("__t")) > 0)

  /** Uni/bigram counts over an (ideally cached) token-array frame. Lazy:
    * `uni` materializes through the totals collect; callers must force
    * `bigrams` before dropping `t`'s cache or the bigram aggregation
    * re-tokenizes the corpus.
    */
  private def countsFrom(t: DataFrame): BigramLm = {
    val uni = t.select(explode(col("__t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt")).persist(cacheLvl)
    val bi = t.select(explode(bigramsOf(col("__t"))).as("__g"))
      .select(col("__g.w1").as("w1"), col("__g.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt")).persist(cacheLvl)
    // the totals pass doubles as the cache materialization for `uni`
    val totals = uni.agg(sum("cnt"), count(lit(1))).collect()(0)
    BigramLm(uni, bi, totals.getLong(0), totals.getLong(1))
  }

  /** Train the stupid-backoff bigram LM on `ref` (the clean reference
    * corpus). The corpus is TOKENIZED ONCE — the token-array frame is
    * cached for the duration of training (memory-and-disk: tokens spill
    * rather than OOM) and both gram aggregations read it, so the corpus
    * text is scanned and regex-split exactly one time. Both count
    * shuffles are gram-keyed with map-side combine.
    */
  def trainBigramLm(ref: DataFrame, textCol: String): BigramLm = {
    val t = tokenized(ref, textCol).persist(cacheLvl)
    try {
      val lm = countsFrom(t)
      lm.bigrams.count() // materialize off the token cache before it drops
      lm
    } finally { t.unpersist(blocking = false); () }
  }

  /** A trained trigram LM: the bigram LM plus trigram counts
    * `(w1, w2, w3, cnt)` — one more aggregation order, the step toward
    * the 5-gram KenLMs the production pipelines run. Same persistence
    * contract as [[BigramLm]].
    */
  final case class TrigramLm(bigramLm: BigramLm, trigrams: DataFrame) {
    def unpersist(): Unit = {
      bigramLm.unpersist()
      trigrams.unpersist(blocking = false)
      ()
    }
  }

  /** Trigram structs of a token array (empty when fewer than 3 tokens);
    * nested zip_with for the same no-expression-duplication reason as
    * [[bigramsOf]].
    */
  private def trigramsOf(t: Column): Column =
    when(size(t) < 3, array().cast("array<struct<w1:string,w2:string,w3:string>>"))
      .otherwise(zip_with(
        zip_with(slice(t, lit(1), size(t) - 2), slice(t, lit(2), size(t) - 2),
          (a, b) => struct(a.as("w1"), b.as("w2"))),
        slice(t, lit(3), size(t) - 2),
        (p, c) => struct(p.getField("w1").as("w1"), p.getField("w2").as("w2"),
          c.as("w3"))))

  /** Train the order-3 stupid-backoff LM. The corpus is TOKENIZED ONCE
    * (r14 advice: the previous layering re-ran the tokenizer for each
    * gram order — at the 100 TB design point each re-run is a full extra
    * corpus pass): the token-array frame is cached once and all three
    * count aggregations (uni, bi, tri) are materialized off it before it
    * is dropped.
    */
  def trainTrigramLm(ref: DataFrame, textCol: String): TrigramLm = {
    val t = tokenized(ref, textCol).persist(cacheLvl)
    try {
      val base = countsFrom(t)
      val tri = t.select(explode(trigramsOf(col("__t"))).as("__g"))
        .select(col("__g.w1").as("w1"), col("__g.w2").as("w2"), col("__g.w3").as("w3"))
        .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("cnt")).persist(cacheLvl)
      base.bigrams.count(); tri.count() // force both off the token cache
      TrigramLm(base, tri)
    } finally { t.unpersist(blocking = false); () }
  }

  /** Trigram scoring with RECURSIVE stupid backoff (Brants et al. 2007):
    *
    *  - seen trigram:  P = c(w1,w2,w3) / c(w1,w2)
    *  - else, seen bigram (w2,w3):  P = alpha * c(w2,w3) / c(w2)
    *  - else:  P = alpha^2 * (c(w3) + 1) / (N + V)
    *
    * One row per document: `(idCol, n_trigrams, avg_logp)` — mean log10
    * trigram probability rounded to 4, null under 3 tokens. Five
    * gram-keyed left joins, all column arithmetic.
    */
  def perplexityScoreTrigram(docs: DataFrame, textCol: String, idCol: String,
      lm: TrigramLm, alpha: Double = 0.4): DataFrame = {
    val grams = docs
      .select(col(idCol).as("__id"), toks(col(textCol)).as("__t")) // bind ONCE
      .select(col("__id"), explode(trigramsOf(col("__t"))).as("__g"))
      .select(col("__id"), col("__g.w1").as("w1"), col("__g.w2").as("w2"),
        col("__g.w3").as("w3"))
    val tri = lm.trigrams.select(col("w1"), col("w2"), col("w3"), col("cnt").as("__ct"))
    val b = lm.bigramLm
    val bi12 = b.bigrams.select(col("w1"), col("w2"), col("cnt").as("__c12"))
    val bi23 = b.bigrams.select(col("w1").as("w2"), col("w2").as("w3"),
      col("cnt").as("__c23"))
    val u2 = b.unigrams.select(col("w").as("w2"), col("cnt").as("__cu2"))
    val u3 = b.unigrams.select(col("w").as("w3"), col("cnt").as("__cu3"))
    val floorDen = lit(b.totalTokens.toDouble + b.vocabSize.toDouble)
    val p = when(col("__ct").isNotNull,
        col("__ct").cast("double") / col("__c12").cast("double"))
      .when(col("__c23").isNotNull,
        lit(alpha) * col("__c23").cast("double") / col("__cu2").cast("double"))
      .otherwise(lit(alpha * alpha) *
        (coalesce(col("__cu3"), lit(0L)).cast("double") + 1.0) / floorDen)
    val scored = grams
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(bi12, Seq("w1", "w2"), "left")
      .join(bi23, Seq("w2", "w3"), "left")
      .join(u2, Seq("w2"), "left")
      .join(u3, Seq("w3"), "left")
      .select(col("__id"), log10(p).as("__logp"))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_trigrams"), round(avg(col("__logp")), 4).as("avg_logp"))
    docs.select(col(idCol).as("__id"))
      .join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"), col("avg_logp"))
  }

  /** Score every document in `docs` under `lm`:
    *
    *  - seen bigram:    P(w2|w1) = c(w1,w2) / c(w1)
    *  - unseen bigram:  P(w2|w1) = alpha * (c(w2) + 1) / (N + V)
    *    (stupid backoff to an add-one unigram, so out-of-vocabulary words
    *    carry a deterministic nonzero floor)
    *
    * Returns one row per input document:
    * `(idCol, n_bigrams, avg_logp)` where `avg_logp` is the mean log10
    * bigram probability rounded to 4 (null when the doc has fewer than 2
    * tokens — emit-and-let-the-caller-filter, like the other quality
    * scores). Lower (more negative) = less like the reference corpus;
    * CCNet keeps the best-scoring fraction per language bucket.
    */
  // ---------------------------------------------- order-n LM, hashed keys

  /** A trained order-n stupid-backoff LM with HASHED gram keys: for each
    * order k in 1..n, a count frame `(h long, cnt long)` where `h` is
    * `xxhash64` of the k-token gram array. Text keys don't ride along:
    * at order 5 a string-struct key is 5 strings wide through every
    * train shuffle and scoring join, while the hash is 8 bytes — at the
    * 100 TB design point the key bytes ARE the shuffle. Collisions merge
    * gram counts at 2^-64 per pair — vanishing against the corpus sizes
    * involved, and LmScoreSpec proves hash-keyed scores match the
    * text-keyed scorer exactly on real data. Same persistence contract
    * as [[BigramLm]].
    */
  final case class NgramLm(order: Int, counts: Map[Int, DataFrame],
      totalTokens: Long, vocabSize: Long) {
    def unpersist(): Unit = {
      counts.values.foreach(_.unpersist(blocking = false))
      ()
    }
  }

  /** k-gram ARRAYS of a bound token-array column (empty when fewer than k
    * tokens): one slice per position. `t` must be a bound attribute (the
    * [[bigramsOf]] contract) so the lambda doesn't re-evaluate the
    * tokenizer per element.
    */
  private def gramArraysOf(t: Column, k: Int): Column =
    when(size(t) < k, array().cast("array<array<string>>"))
      .otherwise(transform(sequence(lit(1), size(t) - k + 1),
        i => slice(t, i, lit(k))))

  /** Train the order-n stupid-backoff LM: the corpus is tokenized ONCE
    * (cached token frame), then one gram-keyed count aggregation per
    * order 1..n, each keyed by `xxhash64(gram array)` — map-side combine
    * does the heavy lifting and the shuffled key is 8 bytes regardless
    * of order.
    */
  def trainNgramLm(ref: DataFrame, textCol: String, order: Int): NgramLm = {
    require(order >= 2, s"order must be >= 2 (got $order)")
    val t = tokenized(ref, textCol).persist(cacheLvl)
    try {
      val counts = (1 to order).map { k =>
        k -> t.select(explode(gramArraysOf(col("__t"), k)).as("__g"))
          .groupBy(xxhash64(col("__g")).as("h"))
          .agg(count(lit(1)).as("cnt")).persist(cacheLvl)
      }.toMap
      // totals from the unigram counts (materializes order 1)
      val totals = counts(1).agg(sum("cnt"), count(lit(1))).collect()(0)
      // materialize the rest off the token cache before it drops
      counts.foreach { case (k, c) => if (k > 1) { c.count(); () } }
      NgramLm(order, counts, totals.getLong(0), totals.getLong(1))
    } finally { t.unpersist(blocking = false); () }
  }

  /** Score every document under an order-n LM with RECURSIVE stupid
    * backoff (Brants et al. 2007), generalized from
    * [[perplexityScoreTrigram]]:
    *
    *  - seen n-gram: P = c(w1..wn) / c(w1..w(n-1))
    *  - else, level k = n-1..2: P = alpha^(n-k) * c(w(n-k+1)..wn) /
    *    c(w(n-k+1)..w(n-1))
    *  - floor: P = alpha^(n-1) * (c(wn) + 1) / (N + V)
    *
    * One row per document: `(idCol, n_ngrams, avg_logp)` — mean log10
    * n-gram probability rounded to 4, null under n tokens. 2n-1
    * gram-keyed left joins, every key an 8-byte `xxhash64` of the
    * relevant sub-gram slice; probability arithmetic is codegen'd
    * column expressions, no UDFs.
    */
  def perplexityScoreNgram(docs: DataFrame, textCol: String, idCol: String,
      lm: NgramLm, alpha: Double = 0.4): DataFrame = {
    val n = lm.order
    var cur = docs
      .select(col(idCol).as("__id"), toks(col(textCol)).as("__t")) // bind ONCE
      .select(col("__id"), explode(gramArraysOf(col("__t"), n)).as("__g"))
      .withColumn("__hfloor", xxhash64(slice(col("__g"), n, 1)))
    for (k <- n to 2 by -1) {
      // level k numerator: the k-gram ending at wn; denominator: its
      // (k-1)-token prefix
      cur = cur
        .withColumn(s"__hn$k", xxhash64(slice(col("__g"), n - k + 1, k)))
        .withColumn(s"__hd$k", xxhash64(slice(col("__g"), n - k + 1, k - 1)))
    }
    var j = cur.drop("__g")
    for (k <- n to 2 by -1) {
      j = j.join(lm.counts(k).select(col("h").as(s"__hn$k"), col("cnt").as(s"__cn$k")),
          Seq(s"__hn$k"), "left")
        .join(lm.counts(k - 1).select(col("h").as(s"__hd$k"), col("cnt").as(s"__cd$k")),
          Seq(s"__hd$k"), "left")
    }
    j = j.join(lm.counts(1).select(col("h").as("__hfloor"), col("cnt").as("__cu")),
      Seq("__hfloor"), "left")
    val floorDen = lit(lm.totalTokens.toDouble + lm.vocabSize.toDouble)
    // build the backoff chain floor-first, wrapping upward so the highest
    // order is the outermost when (a seen k-gram implies its (k-1)-prefix
    // was seen, so __cdk is never null where __cnk isn't)
    var p: Column = lit(math.pow(alpha, n - 1)) *
      (coalesce(col("__cu"), lit(0L)).cast("double") + 1.0) / floorDen
    for (k <- 2 to n) {
      p = when(col(s"__cn$k").isNotNull,
        lit(math.pow(alpha, n - k)) *
          col(s"__cn$k").cast("double") / col(s"__cd$k").cast("double"))
        .otherwise(p)
    }
    val scored = j.select(col("__id"), log10(p).as("__logp"))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_ngrams"), round(avg(col("__logp")), 4).as("avg_logp"))
    docs.select(col(idCol).as("__id"))
      .join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"), col("avg_logp"))
  }

  /** CCNet's SELECTION step (Wenzek et al. 2020 §4.3), first-class: bucket
    * documents by language, rank each language's documents by their LM
    * score under `lm`, and label each document `head` / `middle` / `tail`
    * by score quantile — CCNet trains on the head (and sometimes middle)
    * fraction per language, so the keep-decision is `bucket != 'tail'` or
    * `bucket == 'head'` at the caller's choice.
    *
    * Returns one row per document:
    * `(idCol, langCol, n_bigrams, avg_logp, pr, bucket)` where `pr` is
    * `percent_rank()` within the language partition ordered by
    * `(avg_logp DESC NULLS LAST, idCol)` — best-scoring first, ties and
    * ranks fully deterministic — and `bucket` is `head` when
    * `pr <= headFrac`, `tail` when `pr > 1 - tailFrac` or the document is
    * unscorable (`avg_logp` null: fewer than 2 tokens), `middle`
    * otherwise. Both boundaries are INCLUSIVE on the better side, pinned
    * by LmScoreSpec and replayed exactly by the SQL oracle (percent_rank
    * is pure rank arithmetic — `(rank-1)/(n-1)` — so the doubles are
    * bit-identical across engines).
    *
    * 100 TB: scoring is [[perplexityScore]] (gram-keyed joins); the
    * selection itself is ONE hash-partitioned window — no collect, no
    * driver-side quantiles. Parallelism is bounded by the number of
    * languages (each language is one sort partition; Spark's window sort
    * spills rather than OOMs). If one language dominates at extreme
    * scale, the drop-in alternative is a two-pass cutoff — per-language
    * `approx_percentile` on `avg_logp`, broadcast the per-language
    * thresholds, filter — which trades the exact per-document rank this
    * operator emits for full within-language parallelism.
    */
  def ccnetSelect(docs: DataFrame, textCol: String, idCol: String,
      langCol: String, lm: BigramLm, headFrac: Double = 1.0 / 3,
      tailFrac: Double = 1.0 / 3, alpha: Double = 0.4): DataFrame = {
    require(headFrac >= 0 && tailFrac >= 0 && headFrac + tailFrac <= 1,
      s"head/tail fractions must be non-negative and sum to <= 1 " +
        s"(got head=$headFrac tail=$tailFrac)")
    val scored = perplexityScore(docs, textCol, idCol, lm, alpha)
    val w = Window.partitionBy(col(langCol))
      .orderBy(col("avg_logp").desc_nulls_last, col(idCol))
    docs.select(col(idCol), col(langCol))
      .join(scored, Seq(idCol))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("bucket",
        when(col("avg_logp").isNull, lit("tail"))
          .when(col("pr") <= headFrac, lit("head"))
          .when(col("pr") <= 1.0 - tailFrac, lit("middle"))
          .otherwise(lit("tail")))
      .select(col(idCol), col(langCol), col("n_bigrams"), col("avg_logp"),
        col("pr"), col("bucket"))
  }

  /** The CUTOFF flavor of [[ccnetSelect]] — the scale path its scaladoc
    * promises for the dominant-language regime: instead of a total
    * per-language sort (window percent_rank), compute each language's
    * keep-score THRESHOLD with one percentile aggregation, broadcast the
    * per-language cutoffs (one row per language), and filter. Work is two
    * map-side-combined aggregations + a broadcast join — within-language
    * parallelism is unlimited, no partition ever holds a whole language.
    *
    * Returns one row per document:
    * `(idCol, langCol, n_bigrams, avg_logp, kept)` where `kept` is
    * `avg_logp >= cutoff` against the language's `(1 - keepFrac)` score
    * quantile over scorable docs (unscorable docs and null-language docs
    * are never kept). The raw cutoff stays internal: it is an
    * INTERPOLATED float whose last ulp is formula-dependent, while the
    * kept decision is robust — scores live on a 4-decimal grid and an
    * interpolated cutoff lies strictly between grid neighbors (or exactly
    * on one), so an ulp of cutoff wobble can never flip a comparison.
    * Unlike [[ccnetSelect]] this emits no per-document ranks; ties AT the
    * cutoff are all kept, so the kept fraction can exceed `keepFrac` by
    * the tie mass.
    *
    * `exact = false` (default) uses `approx_percentile` — the t-digest
    * sketch is mergeable with bounded memory, the correct choice at
    * 100 TB where a language's score list does not fit one aggregation
    * buffer. `exact = true` uses the exact interpolating `percentile`
    * (buffers each language's values: test/oracle scale only).
    */
  def ccnetSelectByCutoff(docs: DataFrame, textCol: String, idCol: String,
      langCol: String, lm: BigramLm, keepFrac: Double = 1.0 / 3,
      alpha: Double = 0.4, exact: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1, s"keepFrac must be in (0, 1] (got $keepFrac)")
    val scored = perplexityScore(docs, textCol, idCol, lm, alpha)
    val withLang = docs.select(col(idCol), col(langCol)).join(scored, Seq(idCol))
    val q = lit(1.0 - keepFrac)
    val cutoffAgg =
      if (exact) percentile(col("avg_logp"), q)
      else percentile_approx(col("avg_logp"), q, lit(accuracy))
    val cutoffs = withLang
      .filter(col("avg_logp").isNotNull && col(langCol).isNotNull)
      .groupBy(langCol).agg(cutoffAgg.as("cutoff"))
    withLang.join(broadcast(cutoffs), Seq(langCol), "left")
      .withColumn("kept",
        when(col("avg_logp").isNotNull && col("cutoff").isNotNull &&
          col("avg_logp") >= col("cutoff"), lit(true)).otherwise(lit(false)))
      .select(col(idCol), col(langCol), col("n_bigrams"), col("avg_logp"),
        col("kept"))
  }

  def perplexityScore(docs: DataFrame, textCol: String, idCol: String,
      lm: BigramLm, alpha: Double = 0.4): DataFrame = {
    val grams = docs
      .select(col(idCol).as("__id"), toks(col(textCol)).as("__t")) // bind ONCE
      .select(col("__id"), explode(bigramsOf(col("__t"))).as("__g"))
      .select(col("__id"), col("__g.w1").as("w1"), col("__g.w2").as("w2"))
    val bi = lm.bigrams.select(col("w1"), col("w2"), col("cnt").as("__cbi"))
    val u1 = lm.unigrams.select(col("w").as("w1"), col("cnt").as("__cu1"))
    val u2 = lm.unigrams.select(col("w").as("w2"), col("cnt").as("__cu2"))
    val floorDen = lit(lm.totalTokens.toDouble + lm.vocabSize.toDouble)
    val p = when(col("__cbi").isNotNull,
        col("__cbi").cast("double") / col("__cu1").cast("double"))
      .otherwise(lit(alpha) * (coalesce(col("__cu2"), lit(0L)).cast("double") + 1.0) / floorDen)
    val scored = grams
      .join(bi, Seq("w1", "w2"), "left")
      .join(u1, Seq("w1"), "left")
      .join(u2, Seq("w2"), "left")
      .select(col("__id"), log10(p).as("__logp"))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("__logp")), 4).as("avg_logp"))
    docs.select(col(idCol).as("__id"))
      .join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("avg_logp"))
  }
}
