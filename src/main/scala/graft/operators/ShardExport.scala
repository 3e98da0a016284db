package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-shard export — the last step of the data path:
  * lay the WHOLE corpus in a content-keyed global order and cut it into
  * token-bounded shards, so the byte layout of an exported dataset is a
  * pure function of its content — independent of partitioning, cluster
  * size, or run — and a re-export is verifiable by hash.
  *
  * Order is `(md5(seed || id), id)` — the same fixed uniform permutation
  * [[Sampling.takeTokenBudget]] admits by (stable across runs, engines,
  * partitionings; no RNG state). A document belongs to the shard its
  * FIRST token falls in (`⌊prefix/tokensPerShard⌋`, the greedy
  * corpus-assembly convention — a shard may overshoot by less than its
  * last doc).
  *
  * Scale design — a GLOBAL prefix sum without a global window: the md5
  * key's FIXED-WIDTH HEX PREFIX buckets the order into 16^`bucketChars`
  * contiguous ranges (fixed-width lowercase hex sorts lexicographically
  * exactly like its numeric value, and md5 is uniform, so ranges are
  * balanced AND deterministic — no sampled range boundaries, no pinned
  * partitioning). Per-range token totals are ONE small aggregation
  * (16^bucketChars rows — plan constants, like IVF centroids); each range
  * then prefix-sums independently under one hash-shuffle window with its
  * cumulative offset fused into the plan as a CASE literal. No task ever
  * serializes more than its range; nothing driver-side scales with the
  * corpus.
  */
object ShardExport {

  /** Adds `shard_id` (0-based) to `df`. Deterministic for fixed
    * `(content, tokensPerShard, seed)`; invariant under input
    * repartitioning. `bucketChars` (1-4) sizes the parallel ranges —
    * 2 (256 ranges) suits local runs, 3-4 (4096/65536) a large cluster.
    */
  def assignShards(df: DataFrame, idCol: Column, tokensCol: Column,
      tokensPerShard: Long, seed: String = "", bucketChars: Int = 2): DataFrame = {
    require(tokensPerShard > 0, s"tokensPerShard must be positive (got $tokensPerShard)")
    require(bucketChars >= 1 && bucketChars <= 4,
      s"bucketChars must be in [1, 4] (got $bucketChars)")
    val nBuckets = 1 << (4 * bucketChars)
    val key = md5(concat(lit(seed), idCol.cast("string")))
    val keyed = df
      .withColumn("__k", key)
      .withColumn("__n", tokensCol.cast("long"))
      .withColumn("__b", conv(substring(col("__k"), 1, bucketChars), 16, 10)
        .cast("int"))
    // per-bucket totals: one agg, 16^bucketChars rows — plan constants
    val sums = keyed.groupBy("__b").agg(sum("__n").as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var acc = 0L
    val offsets = (0 until nBuckets).flatMap { b =>
      val o = if (sums.contains(b)) Some(b -> acc) else None
      acc += sums.getOrElse(b, 0L)
      o
    }
    val offCol = offsets.foldLeft(lit(0L)) { case (e, (b, off)) =>
      when(col("__b") === b, lit(off)).otherwise(e)
    }
    val w = Window.partitionBy(col("__b")).orderBy(col("__k"), idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = sum(col("__n")).over(w) - col("__n") + offCol
    keyed.withColumn("shard_id", floor(start / tokensPerShard))
      .drop("__k", "__n", "__b")
  }

  /** The export MANIFEST: one row per shard with `(shard_id, doc_count,
    * token_count, content_sha)` — `content_sha` is the md5 of the shard's
    * `id:tokens` pairs joined in content order, so two exports are
    * byte-comparable without reading a data byte. Pure arithmetic over
    * the same order [[assignShards]] cuts by; an oracle can replay it.
    */
  def shardManifest(df: DataFrame, idCol: Column, tokensCol: Column,
      tokensPerShard: Long, seed: String = "", bucketChars: Int = 2): DataFrame = {
    val assigned = assignShards(df, idCol, tokensCol, tokensPerShard, seed, bucketChars)
      .withColumn("__k", md5(concat(lit(seed), idCol.cast("string"))))
      .withColumn("__n", tokensCol.cast("long"))
    assigned.groupBy("shard_id").agg(
      count(lit(1)).as("doc_count"),
      sum("__n").as("token_count"),
      md5(array_join(transform(
        array_sort(collect_list(struct(col("__k"), idCol.cast("long").as("__id"),
          col("__n")))),
        x => concat_ws(":", x("__id"), x("__n"))), ",")).as("content_sha"))
  }
}
