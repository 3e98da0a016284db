package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every raw-corpus
  * document by how much more likely its HASHED N-GRAM features are under
  * a small target distribution (the high-quality sample you want more of)
  * than under the raw corpus itself, then keep the top-weighted documents.
  *
  * Features are word unigrams + bigrams hashed into `buckets` counts —
  * the paper's move that makes the two distributions estimable from ONE
  * aggregation each, independent of vocabulary size. The per-document
  * log importance weight is
  *
  * {{{ w(d) = Σ_{g ∈ grams(d)} ln p_target(b(g)) − ln p_raw(b(g)) }}}
  *
  * with Laplace-smoothed bucket probabilities
  * `p(b) = (count(b) + α) / (N + α·B)` so unseen buckets stay finite.
  * The hash is the first 15 hex chars of md5 mod `buckets` — chosen over
  * xxhash64 because the SAME arithmetic is expressible in the DuckDB
  * oracle, keeping the operator end-to-end verifiable.
  *
  * 100 TB shape: ONE map-side-combined aggregation per distribution (the
  * bucket tables are ≤ `buckets` rows — collected, then broadcast as the
  * ratio table), a broadcast join of corpus gram occurrences to their
  * bucket ratios, and a per-document sum. The corpus gram explode runs
  * twice (counts pass + join pass) by design: recomputing a linear
  * tokenization beats caching an L×-corpus-bytes gram table, and the
  * call holds NO persisted state after it returns. No all-pairs, no
  * driver state beyond the ≤2·buckets-row maps; the target sample is
  * small by definition.
  */
object Dsir {

  /** md5-based feature bucket — deterministic, partitioning-independent,
    * and replicable in SQL oracles (`('0x' || substring(md5(g),1,15))`).
    */
  private[operators] def bucketOf(g: Column, buckets: Int): Column =
    pmod(conv(substring(md5(g.cast("binary")), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** One row per gram OCCURRENCE: (`idCol`, bucket). Unigrams + bigrams
    * over whitespace words; docs with no words emit nothing.
    */
  private def gramBuckets(df: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame = {
    // materialize the split ONCE per row in its own projection: the word
    // array is referenced four times below, and inlining the split into
    // each use (what a single fused expression would do) re-tokenizes the
    // document per bigram index — O(words²) per doc. CollapseProject keeps
    // the projection because the reference is non-cheap and multi-use.
    val withWords = df.select(col(idCol),
      split(trim(col(textCol)), "\\s+").as("__w"))
    val bigrams = when(size(col("__w")) >= 2,
      expr("transform(sequence(1, size(__w) - 1), " +
        "i -> concat_ws(' ', __w[i-1], __w[i]))"))
      .otherwise(array().cast("array<string>"))
    withWords.select(col(idCol), explode(concat(
        filter(col("__w"), w => w =!= ""), bigrams)).as("__g"))
      .select(col(idCol), bucketOf(col("__g"), buckets).as("__b"))
  }

  /** Per-document DSIR log importance weights of `corpus` against
    * `target` (any DataFrame with the same text column — typically a
    * filtered high-quality sample). Output: (`idCol`, `n_feats`,
    * `weight`), weight rounded to 6 decimals for stable comparison.
    */
  def importanceWeights(corpus: DataFrame, target: DataFrame, textCol: String,
      idCol: String, buckets: Int = 8192, alpha: Double = 1.0): DataFrame = {
    require(buckets > 0 && alpha > 0, s"need buckets>0, alpha>0 (got $buckets, $alpha)")
    // The per-bucket count tables are ≤ `buckets` rows — COLLECT them to
    // the driver and rebuild the ratio table as a local DataFrame instead
    // of persisting the gram explode. The explode therefore runs twice
    // (once for the corpus counts here, once in the final join), which is
    // the right trade at scale: an L×-corpus-bytes gram table cached
    // MEMORY_AND_DISK is itself a spill hazard at 100 TB, and the old
    // persists were never released (they outlived the call — a
    // session-lifetime leak under repeated invocation). The ratio
    // arithmetic stays in Column form over the same (__b,__cr,__ct)
    // shape, so the doubles are bit-identical to the pre-collect plan.
    val spark = corpus.sparkSession
    def bucketCounts(df: DataFrame): Map[Long, Long] =
      gramBuckets(df, textCol, idCol, buckets)
        .groupBy(col("__b")).agg(count(lit(1)).as("__c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rawMap = bucketCounts(corpus)
    val tgtMap = bucketCounts(target)
    val nRaw = rawMap.values.sum.toDouble
    val nTgt = tgtMap.values.sum.toDouble
    // full-outer merge of the two local maps (a bucket seen on either side
    // — or neither: smoothing — gets a finite ratio)
    val mergedRows = (rawMap.keySet ++ tgtMap.keySet).toSeq.sorted.map { b =>
      (b, rawMap.get(b), tgtMap.get(b))
    }
    import spark.implicits._
    val ratios = mergedRows.toDF("__b", "__cr", "__ct")
      .select(col("__b"),
        (log((coalesce(col("__ct"), lit(0L)) + alpha) / (nTgt + alpha * buckets)) -
         log((coalesce(col("__cr"), lit(0L)) + alpha) / (nRaw + alpha * buckets)))
          .as("__ratio"))
    gramBuckets(corpus, textCol, idCol, buckets).join(broadcast(ratios), Seq("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        round(sum(col("__ratio")), 6).as("weight"))
  }

  /** Keep the `k` highest-weighted documents (ties broken by `idCol` —
    * fully deterministic). Returns the input rows that survive, plus the
    * weight column.
    */
  def selectTop(corpus: DataFrame, target: DataFrame, textCol: String,
      idCol: String, k: Int, buckets: Int = 8192, alpha: Double = 1.0): DataFrame = {
    val w = importanceWeights(corpus, target, textCol, idCol, buckets, alpha)
      .orderBy(col("weight").desc, col(idCol)).limit(k)
    corpus.join(w.select(col(idCol), col("weight")), Seq(idCol))
  }

  /** Importance RESAMPLING (the paper's selection step proper, vs the
    * [[selectTop]] rank cutoff): accept each document independently with
    * probability `min(1, scale · exp(weight))` — documents that look more
    * target-like than raw-like (positive log weight) are kept
    * proportionally more often. The acceptance uniform is CONTENT-KEYED
    * ([[Sampling.weightedSample]]), so the sample is deterministic and
    * partitioning-independent; `scale` tunes the expected kept fraction.
    * The weight is the 6-decimal-rounded value [[importanceWeights]]
    * emits, so the acceptance arithmetic is replicable externally.
    */
  def resample(corpus: DataFrame, target: DataFrame, textCol: String,
      idCol: String, scale: Double, buckets: Int = 8192, alpha: Double = 1.0,
      seed: String = ""): DataFrame = {
    require(scale > 0, s"scale must be > 0, got $scale")
    val w = importanceWeights(corpus, target, textCol, idCol, buckets, alpha)
    val withW = corpus.join(w.select(col(idCol), col("weight")), Seq(idCol))
    Sampling.weightedSample(withW, col(idCol), exp(col("weight")) * scale, seed)
  }
}
