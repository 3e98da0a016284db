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
}
