package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training-data pipelines: drop (or flag)
  * corpus documents that share any `n`-token shingle with a benchmark /
  * eval set — the standard guard against test-set leakage into training
  * data (the n-gram-overlap method used by GPT-3/PaLM/Llama data cards,
  * typically with n in [8, 13]).
  *
  * 100 TB design: the BENCHMARK side is small by nature (eval sets are
  * MBs), so its distinct shingles are '''broadcast''' — the corpus side
  * explodes to one row per token position but meets the benchmark in a
  * broadcast semi-join, never a shuffle of the corpus; only the matched
  * doc-id set (tiny) aggregates. Corpus documents shorter than `n` tokens
  * produce no shingles and are never flagged, mirroring the oracle.
  *
  * Tokenization is lowercase + whitespace-split (ANSI-expressible so the
  * DuckDB oracle can mirror it exactly); punctuation-insensitive variants
  * can pre-normalize the text column.
  */
object Decontaminate {

  /** Distinct `(id, gram)` token n-grams of `textCol` — one row per
    * distinct n-gram per document.
    */
  def ngrams(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    df.select(col(idCol).as("__id"), toks.as("__ts"))
      .filter(size(col("__ts")) >= n)
      .select(col("__id"), explode(array_distinct(transform(
        sequence(lit(1), size(col("__ts")) - (n - 1)),
        i => array_join(slice(col("__ts"), i, lit(n)), " ")))).as("gram"))
  }

  /** Distinct n-grams of a text column (no per-document attribution). */
  def gramSet(df: DataFrame, textCol: String, n: Int): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    df.select(toks.as("__ts"))
      .filter(size(col("__ts")) >= n)
      .select(explode(array_distinct(transform(
        sequence(lit(1), size(col("__ts")) - (n - 1)),
        i => array_join(slice(col("__ts"), i, lit(n)), " ")))).as("gram"))
      .distinct()
  }

  /** The distinct doc ids of `docs` sharing at least one n-gram with
    * `bench` (broadcast).
    */
  def contaminatedIds(docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8): DataFrame = {
    val benchGrams = gramSet(bench, benchTextCol, n)
    ngrams(docs, textCol, idCol, n)
      .join(broadcast(benchGrams), "gram", "left_semi")
      .select(col("__id").as(idCol)).distinct()
  }

  /** `docs` plus a `contaminated` boolean column. */
  def flag(docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8): DataFrame = {
    val bad = contaminatedIds(docs, textCol, idCol, bench, benchTextCol, n)
      .withColumnRenamed(idCol, "__cid")
    docs.join(bad, docs(idCol) === col("__cid"), "left")
      .withColumn("contaminated", col("__cid").isNotNull)
      .drop("__cid")
  }

  /** `docs` with contaminated documents removed. */
  def clean(docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8): DataFrame = {
    val bad = contaminatedIds(docs, textCol, idCol, bench, benchTextCol, n)
      .withColumnRenamed(idCol, "__cid")
    docs.join(bad, docs(idCol) === col("__cid"), "left_anti")
  }

  /** SPAN-SCRUBBING decontamination: instead of DROPPING a contaminated
    * document (the [[clean]] policy — wasteful when one quoted benchmark
    * line taints a long useful document), remove exactly the tokens
    * covered by some benchmark n-gram occurrence and keep the rest — the
    * surgical flavor production pipelines pair with doc-level drops.
    * Output: `(idCol, text, n_scrubbed)` where `text` is the surviving
    * NORMALIZED (lowercased, single-spaced) tokens in order and
    * `n_scrubbed` counts removed tokens (0 for untouched docs, the whole
    * doc for verbatim benchmark members).
    *
    * 100 TB shape: the bench gram set broadcasts (eval sets are small by
    * nature); the corpus's positional grams meet it in one broadcast
    * SEMI-join and only the MATCHED positions aggregate — a tiny
    * (contaminated-docs-only) frame that broadcasts back, so the corpus
    * itself never shuffles; the rebuild is one array expression per row
    * (`exists` over the doc's own match positions, O(tokens × matches)).
    */
  def scrub(docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8): DataFrame = {
    val benchGrams = gramSet(bench, benchTextCol, n)
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val withPos = docs.select(col(idCol).as("__id"), toks.as("__ts"))
      .filter(size(col("__ts")) >= n)
      .select(col("__id"), posexplode(transform(
        sequence(lit(1), size(col("__ts")) - (n - 1)),
        i => array_join(slice(col("__ts"), i, lit(n)), " "))))
      .toDF("__id", "__p0", "gram") // __p0 is 0-based start
    val matches = withPos
      .join(broadcast(benchGrams), "gram", "left_semi")
      .groupBy(col("__id")).agg(collect_set(col("__p0")).as("__ps"))
      .withColumnRenamed("__id", "__mid")
    docs
      .join(broadcast(matches), col(idCol) === col("__mid"), "left")
      .select(col(idCol), tokens(toksOf(textCol)).as("__t"), col("__ps"))
      .select(col(idCol),
        when(col("__ps").isNull, col("__t")).otherwise(
          filter(zip_with(col("__t"),
              sequence(lit(0), greatest(size(col("__t")) - 1, lit(0))),
              (w, i) => when(!exists(col("__ps"),
                p => p <= i && i <= p + (n - 1)), w)),
            w => w.isNotNull)).as("__keep"),
        size(col("__t")).as("__n0"))
      .select(col(idCol), array_join(col("__keep"), " ").as("text"),
        (col("__n0") - size(col("__keep"))).cast("long").as("n_scrubbed"))
  }

  // the normalized token array the gram positions index into
  private def toksOf(textCol: String): Column = lower(trim(col(textCol)))
  private def tokens(norm: Column): Column =
    when(length(norm) === 0, array().cast("array<string>"))
      .otherwise(split(norm, "\\s+"))

  // ------------------------------------------- semantic (embedding-level)

  /** SEMANTIC decontamination: corpus documents whose EMBEDDING is a
    * near-duplicate (cosine >= `threshold`) of any eval-set embedding —
    * the guard n-gram overlap cannot give against paraphrased or
    * re-formatted test-set leakage (the reason recent data cards report
    * embedding-level decontamination alongside n-gram overlap).
    *
    * Same 100 TB shape as the n-gram flavor: the EVAL side is small by
    * nature, so its vectors are '''broadcast'''; candidacy is hyperplane
    * signature-bucket collision across `bands` INDEPENDENT signatures
    * (identical vectors always collide in every band — the
    * [[Dedup.embeddingNearDup]] contract). A single `planes`-bit
    * signature misses borderline pairs badly for a leakage guard: at
    * cosine 0.99 one 8-plane band collides with probability
    * `(1 − acos(0.99)/π)^8 ≈ 0.69` — ~30% of paraphrase-level leaks
    * silently pass. OR-ing `bands` independent bands (the
    * [[Dedup.minHashCandidates]] recipe) lifts recall to
    * `1 − (1 − 0.69)^bands ≈ 0.99` at the default 4, still zero corpus
    * shuffle: the per-band signatures `posexplode` into `(band, sig)`
    * rows (a narrow Generate — no exchange) on both sides of the same
    * broadcast-hash join, the cosine verify touches candidates only, and
    * the flagged-id set anti-joins back broadcast.
    */
  def semanticContaminatedIds(corpus: DataFrame, vecCol: String, idCol: String,
      eval: DataFrame, evalVecCol: String, dim: Int, threshold: Double = 0.99,
      planes: Int = 8, seed: Long = 42L, bands: Int = 4): DataFrame = {
    require(bands >= 1, s"bands must be >= 1 (got $bands)")
    val spark = corpus.sparkSession
    def bandSigs(vec: Column): Column = array((0 until bands).map { b =>
      Similarity.hyperplaneSignatureFast(spark, vec, dim, planes, seed + 7919L * b)
    }: _*)
    val c = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"),
        posexplode(bandSigs(col(vecCol))).as(Seq("__band", "__sig")))
    val e = broadcast(eval.select(col(evalVecCol).as("__ev"),
        posexplode(bandSigs(col(evalVecCol))).as(Seq("__band", "__sig"))))
    c.join(e, Seq("__band", "__sig"))
      .filter(graft.functions.VectorExpressions.cosine(spark,
        col("__v"), col("__ev")) >= threshold)
      .select(col("__id").as(idCol)).distinct()
  }

  /** `corpus` plus a `contaminated` boolean column (embedding flavor).
    * The flagged-id set is bounded by the eval-match volume (tiny next to
    * the corpus), so it joins back BROADCAST — without the hint Catalyst
    * cannot size the post-distinct set and falls back to a full
    * sort-merge join of the corpus (audited in PLANS.md r15).
    */
  def semanticFlag(corpus: DataFrame, vecCol: String, idCol: String,
      eval: DataFrame, evalVecCol: String, dim: Int, threshold: Double = 0.99,
      planes: Int = 8, seed: Long = 42L, bands: Int = 4): DataFrame = {
    val bad = broadcast(semanticContaminatedIds(corpus, vecCol, idCol, eval, evalVecCol,
      dim, threshold, planes, seed, bands).withColumnRenamed(idCol, "__cid"))
    corpus.join(bad, corpus(idCol) === col("__cid"), "left")
      .withColumn("contaminated", col("__cid").isNotNull)
      .drop("__cid")
  }

  /** `corpus` with semantically contaminated documents removed (the
    * flagged-id set broadcast, as in [[semanticFlag]]).
    */
  def semanticClean(corpus: DataFrame, vecCol: String, idCol: String,
      eval: DataFrame, evalVecCol: String, dim: Int, threshold: Double = 0.99,
      planes: Int = 8, seed: Long = 42L, bands: Int = 4): DataFrame = {
    val bad = broadcast(semanticContaminatedIds(corpus, vecCol, idCol, eval, evalVecCol,
      dim, threshold, planes, seed, bands).withColumnRenamed(idCol, "__cid"))
    corpus.join(bad, corpus(idCol) === col("__cid"), "left_anti")
  }
}
