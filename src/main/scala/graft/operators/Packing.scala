package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: assign each document a position in a stream
  * of fixed-token-budget sequences — the concatenate-then-chunk packing
  * most LLM training pipelines use (docs are laid end to end in a
  * deterministic order; sequence `k` covers token offsets
  * `[k*budget, (k+1)*budget)`; a document straddling a boundary belongs to
  * the sequence its FIRST token falls in, exactly like slicing the
  * concatenated token stream).
  *
  * Scale design: packing is per-SHARD (`shardCol` — a source, a bucket, a
  * date), so each shard's running total is an independent window and the
  * whole operator is one hash-shuffle + window sum, no global ordering.
  * At 100 TB you pack within shards in parallel; a global single stream
  * would serialize the window into one task and is deliberately not
  * offered. Deterministic: order within a shard is `idCol`, so re-runs
  * (and other engines) produce identical layouts.
  */
object Packing {

  /** Adds `seq_id` (which budget-sized sequence the doc STARTS in, 0-based
    * per shard) and `seq_offset` (token offset within that sequence).
    * `tokensCol` is the document's token count.
    */
  def packSequences(df: DataFrame, idCol: Column, tokensCol: Column,
      budget: Int, shardCol: String): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = sum(tokensCol).over(w) - tokensCol // tokens before this doc
    df.withColumn("seq_id", floor(start / budget))
      .withColumn("seq_offset", start % budget)
  }

  /** MATERIALIZED token-id packing — the tokenize→pack shape trainers
    * consume: documents' id arrays (`idsCol`, `array<long>`, e.g.
    * [[graft.functions.BpeExpressions.encode]]'s output) are laid end to
    * end per shard in `idCol` order, each doc followed by the `docSep`
    * boundary marker (EOT/EOS id), and the stream is cut into sequences of
    * exactly `budget` ids (the final, possibly-partial sequence is kept —
    * callers drop it with `size < budget` if their trainer requires full
    * sequences). Output: `(<shardCol>, seq_id, token_ids)`.
    *
    * Scale design: the same per-shard independence as [[packSequences]] —
    * one window prefix-sum per shard assigns byte-exact offsets, then each
    * doc EXPLODES into only the sequences it overlaps (a doc touches
    * `⌈len/budget⌉+1` sequences, almost always 1-2, so the explode is
    * ~O(docs)), and one hash-shuffle by `(shard, seq_id)` assembles each
    * sequence from its slices. The token stream crosses exactly ONE
    * shuffle — the minimum for materializing sequences — and no shard ever
    * serializes into a single task beyond its own window.
    */
  def packTokenIds(df: DataFrame, idCol: Column, idsCol: Column,
      budget: Int, shardCol: String, docSep: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withSep = df
      .withColumn("__ids", concat(idsCol, array(lit(docSep))))
      .withColumn("__len", size(col("__ids")).cast("long"))
    val placed = withSep
      .withColumn("__start", sum(col("__len")).over(w) - col("__len"))
      // every sequence this doc overlaps: floor(start/b) .. floor((end-1)/b)
      .withColumn("seq_id", explode(sequence(
        floor(col("__start") / budget),
        floor((col("__start") + col("__len") - 1) / budget))))
      // the slice of __ids that lands in seq_id (0-based within the doc)
      .withColumn("__from", greatest(lit(0L), col("seq_id") * budget - col("__start")))
      .withColumn("__until", least(col("__len"), (col("seq_id") + 1) * budget - col("__start")))
      .select(col(shardCol), col("seq_id"),
        col("__start").as("__at"),
        slice(col("__ids"), (col("__from") + 1).cast("int"),
          (col("__until") - col("__from")).cast("int")).as("__piece"))
    placed.groupBy(col(shardCol), col("seq_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__at"), col("__piece")))),
        x => x("__piece"))).as("token_ids"))
  }
}
