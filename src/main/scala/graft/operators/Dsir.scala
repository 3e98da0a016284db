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
  * 100 TB shape: one gram explode + ONE map-side-combined aggregation per
  * distribution (the bucket tables are ≤ `buckets` rows — broadcast), a
  * broadcast join of corpus gram occurrences to their bucket ratios, and
  * a per-document sum. No all-pairs, no driver state beyond the broadcast
  * bucket table; the target sample is small by definition.
  */
object Dsir {

  /** md5-based feature bucket — deterministic, partitioning-independent,
    * and replicable in SQL oracles (`('0x' || substring(md5(g),1,15))`).
    */
  private def bucketOf(g: Column, buckets: Int): Column =
    pmod(conv(substring(md5(g.cast("binary")), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** One row per gram OCCURRENCE: (`idCol`, bucket). Unigrams + bigrams
    * over whitespace words; docs with no words emit nothing.
    */
  private def gramBuckets(df: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame = {
    val words = split(trim(col(textCol)), "\\s+")
    val bigrams = when(size(words) >= 2,
      expr(s"""transform(sequence(1, size(split(trim($textCol), '\\\\s+')) - 1),
        i -> concat_ws(' ', split(trim($textCol), '\\\\s+')[i-1],
                            split(trim($textCol), '\\\\s+')[i]))"""))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol), explode(concat(
        filter(words, w => w =!= ""), bigrams)).as("__g"))
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
    // the raw gram table feeds two consumers (bucket counts + the ratio
    // join) — persist so the explode runs once. Totals derive from the
    // tiny (≤ buckets rows) persisted count tables, not extra gram scans;
    // the two sum() actions make this call EAGER.
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val rawG = gramBuckets(corpus, textCol, idCol, buckets).persist(lvl)
    val rawCnt = rawG.groupBy(col("__b")).agg(count(lit(1)).as("__cr")).persist(lvl)
    val tgtCnt = gramBuckets(target, textCol, idCol, buckets)
      .groupBy(col("__b")).agg(count(lit(1)).as("__ct")).persist(lvl)
    // bucket ratio table: ≤ `buckets` rows, outer-joined so a bucket seen
    // on either side (or neither — smoothing) gets a finite ratio
    def total(df: DataFrame, c: String): Double = {
      val r = df.agg(sum(col(c))).head()
      if (r.isNullAt(0)) 0.0 else r.getLong(0).toDouble // empty side: pure smoothing
    }
    val nRaw = total(rawCnt, "__cr")
    val nTgt = total(tgtCnt, "__ct")
    val ratios = rawCnt.join(tgtCnt, Seq("__b"), "full_outer")
      .select(col("__b"),
        (log((coalesce(col("__ct"), lit(0L)) + alpha) / (nTgt + alpha * buckets)) -
         log((coalesce(col("__cr"), lit(0L)) + alpha) / (nRaw + alpha * buckets)))
          .as("__ratio"))
    rawG.join(broadcast(ratios), Seq("__b"))
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
}
