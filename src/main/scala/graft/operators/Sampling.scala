package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, content-stable sampling for training-data pipelines.
  *
  * Unlike `df.sample()` (seeded per-partition RNG — resampling changes
  * when partitioning changes), these operators key each row's fate on a
  * HASH OF THE ROW'S OWN KEY: the same row is kept or dropped on every
  * run, every engine, every partitioning, and any executor count — the
  * property source-mixing pipelines need so a re-run reproduces the exact
  * training mix (and so an oracle on another engine can verify the
  * sample).
  *
  * Mechanism: a row is kept iff the first 8 hex chars of
  * `md5(seed || key)` are lexicographically below `thresholdHex(rate)`
  * (fixed-width lowercase hex compares numerically). md5 is uniform, so
  * the kept fraction converges to `rate`; thresholds nest, so
  * `sample(r1) ⊆ sample(r2)` whenever `r1 <= r2` — shrinking a corpus
  * keeps a subset, never a reshuffle.
  *
  * 100 TB: pure narrow projection+filter (codegen'd md5), no shuffle, no
  * RNG state; weighted mixing is one CASE expression over the source
  * column.
  */
object Sampling {

  /** 8-hex-char keep-threshold for `rate` ∈ [0,1]: the prefix value is a
    * uniform 32-bit draw, kept when below `rate * 2^32`. `"g"` sorts above
    * every hex string (keep all); `"00000000"` sorts at/below none (drop
    * all).
    */
  def thresholdHex(rate: Double): String =
    if (rate >= 1.0) "g"
    else if (rate <= 0.0) "00000000"
    else f"${(rate * 4294967296L).toLong}%08x"

  private def prefix(keyCol: Column, seed: String): Column =
    substring(md5(concat(lit(seed), keyCol.cast("string"))), 1, 8)

  /** Keep ~`rate` of rows, decided by `md5(seed || key)` — deterministic
    * and partitioning-independent. `keyCol` should be a stable identifier
    * (string or integer; avoid floats, whose string forms vary).
    */
  def hashSample(df: DataFrame, keyCol: Column, rate: Double,
      seed: String = ""): DataFrame =
    df.filter(prefix(keyCol, seed) < lit(thresholdHex(rate)))

  /** The content-keyed uniform in [0,1): first 8 hex chars of
    * `md5(seed || key)` over 2³². Same arithmetic is expressible in SQL
    * oracles (`('0x' || substring(md5(...),1,8))::BIGINT / 4294967296.0`).
    */
  def uniform01(keyCol: Column, seed: String = ""): Column =
    conv(prefix(keyCol, seed), 16, 10).cast("double") / lit(4294967296.0)

  /** WEIGHTED sampling: keep each row independently with its OWN
    * probability (`probCol`, clamped to [0,1]) — importance resampling's
    * acceptance step, quality-proportional downsampling, per-source decay.
    * Deterministic and partitioning-independent like [[hashSample]] (which
    * is the constant-probability special case): the decision is
    * `uniform01(key) < p`, so re-running, re-partitioning, or re-ordering
    * the corpus keeps exactly the same rows. No RNG state, no seed
    * plumbing across executors — at 100 TB the sample is reproducible
    * from content alone.
    */
  def weightedSample(df: DataFrame, keyCol: Column, probCol: Column,
      seed: String = ""): DataFrame =
    df.filter(uniform01(keyCol, seed) <
      least(lit(1.0), greatest(lit(0.0), coalesce(probCol.cast("double"), lit(0.0)))))

  /** Deterministic per-key quota: keep the `n` rows of each `keyCol` group
    * with the smallest `md5(seed || id)` — a reproducible "at most N docs
    * per source" cap (the hash order is a fixed uniform permutation, so
    * this is an unbiased N-sample per group, stable across runs and
    * engines). One hash-shuffle window with rank-limit pushdown
    * (`WindowGroupLimit` prunes to ≤ n per group map-side before the
    * exchange); ties break on the id.
    */
  def takePerKey(df: DataFrame, keyCol: String, idCol: Column, n: Int,
      seed: String = ""): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(md5(concat(lit(seed), idCol.cast("string"))), idCol)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Deterministic TOKEN-BUDGET corpus assembly: per source, admit docs
    * in `md5(seed || id)` order (a fixed uniform permutation — an
    * unbiased sample, stable across runs/engines/partitionings) while the
    * running token total BEFORE each doc stays under that source's
    * budget — the "N tokens of web, M tokens of books" training-mix
    * shape. Greedy prefix semantics: the last admitted doc may overshoot
    * its budget by less than its own length (the standard corpus-assembly
    * convention); a SMALLER budget admits a prefix of a larger one's
    * selection, so shrinking a mix never reshuffles it. One hash-shuffle
    * window (per-source cumulative sum) — no collect, no iteration.
    */
  def takeTokenBudget(df: DataFrame, sourceCol: String, idCol: Column,
      tokensCol: Column, budgets: Map[String, Long],
      defaultBudget: Long = Long.MaxValue, seed: String = ""): DataFrame = {
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(concat(lit(seed), idCol.cast("string"))), idCol)
    val before = sum(tokensCol).over(w) - tokensCol // admitted before this doc
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
      case (acc, (src, b)) => when(col(sourceCol) === src, lit(b)).otherwise(acc)
    }
    df.withColumn("__tb", before).filter(col("__tb") < budget).drop("__tb")
  }

  /** Weighted source mixing: per-row keep-rate looked up from
    * `weights(sourceCol value)`, `defaultRate` for unlisted sources — the
    * "20% web, 100% books, 5% logs" training-mix shape, reproducible
    * because each row's fate is content-keyed.
    */
  def mixSources(df: DataFrame, sourceCol: String, weights: Map[String, Double],
      keyCol: Column, defaultRate: Double = 1.0, seed: String = ""): DataFrame = {
    val threshold = weights.toSeq.sortBy(_._1).foldLeft(lit(thresholdHex(defaultRate))) {
      case (acc, (src, rate)) =>
        when(col(sourceCol) === src, lit(thresholdHex(rate))).otherwise(acc)
    }
    df.filter(prefix(keyCol, seed) < threshold)
  }

  /** TEMPERATURE-tempered source mixing (the multilingual/multi-domain LM
    * recipe — e.g. mBERT/XLM-R's exponent-smoothed sampling): source s is
    * sampled with probability ∝ n_s^(1/T), so T = 1 keeps natural
    * proportions and larger T flattens toward uniform over sources,
    * up-weighting small sources without hand-tuned per-source rates.
    * Targets realize a total budget of `totalFrac · N` rows in
    * expectation: `target_s = totalFrac · N · q_s` with
    * `q_s = n_s^(1/T) / Σ n_t^(1/T)`, per-source keep rate
    * `min(1, target_s / n_s)` rounded to 6 decimals (replayable
    * arithmetic — with T = 2 the tempering is `sqrt`, IEEE-exact on every
    * engine). Rows keep/drop by the same content-keyed uniform as
    * [[hashSample]]: deterministic, partitioning-independent, nesting.
    *
    * 100 TB: one count aggregation (sources are FEW — the counts are plan
    * constants, like IVF centroids), then one narrow filtered scan with a
    * per-source CASE threshold. No shuffle of the corpus, no RNG state.
    */
  def temperatureMix(df: DataFrame, sourceCol: String, keyCol: Column,
      temperature: Double, totalFrac: Double, seed: String = ""): DataFrame = {
    require(temperature > 0, s"temperature must be positive (got $temperature)")
    require(totalFrac > 0 && totalFrac <= 1, s"totalFrac must be in (0, 1] (got $totalFrac)")
    // null sources get their own explicit bucket: without it the null
    // group's key NPEs the driver-side sort, and even sorted, null-source
    // rows would never match any CASE arm (silently dropped) while their
    // count still inflated z/total, skewing every other source's rate.
    // Real values are prefixed so NO string value can collide with the
    // null bucket ("v:__null__" ≠ "n") — the keys are internal only
    val bucket = coalesce(concat(lit("v:"), col(sourceCol).cast("string")), lit("n"))
    val counts: Seq[(String, Long)] = df.groupBy(bucket.as("__src"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val total = counts.map(_._2).sum.toDouble
    val z = counts.map { case (_, n) => math.pow(n.toDouble, 1.0 / temperature) }.sum
    val rates: Seq[(String, Double)] = counts.map { case (s, n) =>
      val q = math.pow(n.toDouble, 1.0 / temperature) / z
      s -> math.round(math.min(1.0, totalFrac * total * q / n) * 1e6) / 1e6
    }
    val rate = rates.sortBy(_._1).foldLeft(lit(0.0)) { case (acc, (src, r)) =>
      when(bucket === src, lit(r)).otherwise(acc)
    }
    df.filter(uniform01(keyCol, seed) < rate)
  }
}
