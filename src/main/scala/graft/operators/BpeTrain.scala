package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge-list TRAINING — the learning side of
  * [[graft.functions.BpeExpressions]] (which only APPLIES merges): the
  * standard greedy procedure (Sennrich et al. 2016; GPT-2's vocabulary was
  * built the same way): start from characters, repeatedly merge the
  * highest-frequency adjacent token pair, `k` rounds; ties break lexically
  * on the pair string so training is deterministic across partitionings
  * and engines.
  *
  * Scale design (the pqTrain bounded pattern): the corpus first compresses
  * to its DISTINCT WORD frequencies — one shuffle, after which every round
  * is an aggregation over the word table, never the corpus. Each round
  * re-tokenizes words under the merges-so-far with the shared native
  * kernel (`graft_bpe_split`, merge list as a plan literal — per-task
  * parse, per-word memo), explodes adjacent pairs, and takes ONE
  * map-side-combined weighted count; the driver holds only the argmax row
  * and the growing merge list (`k` strings). Nothing driver-side scales
  * with the corpus.
  */
object BpeTrain {

  /** Learn `k` merges from whitespace words of `df.textCol`. Returns the
    * merge list in rank order ("left right" strings — exactly the format
    * [[graft.functions.BpeExpressions.tokenCount]] consumes). Stops early
    * when no pair reaches `minPairCount` (weighted occurrences).
    */
  def trainBpeMerges(df: DataFrame, textCol: String, k: Int,
      minPairCount: Long = 1L): Seq[String] = {
    require(k >= 0 && k <= 4096,
      s"k must be in [0, 4096] (got $k) — the merge list is driver-held")
    require(minPairCount >= 1, s"minPairCount must be >= 1 (got $minPairCount)")
    val spark = df.sparkSession
    val words = df
      .select(explode(split(trim(coalesce(col(textCol), lit(""))), "\\s+")).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy("__w").agg(count(lit(1)).as("__f"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val merges = scala.collection.mutable.ArrayBuffer[String]()
      var round = 0
      var exhausted = false
      while (round < k && !exhausted) {
        val toks = graft.functions.BpeExpressions
          .splitWord(spark, col("__w"), typedLit(merges.toSeq))
        val top = words
          .select(col("__f"), toks.as("__t"))
          .filter(size(col("__t")) >= 2)
          .select(col("__f"), explode(transform(
            sequence(lit(0), size(col("__t")) - 2),
            i => concat(element_at(col("__t"), i + 1), lit(" "),
              element_at(col("__t"), i + 2)))).as("__p"))
          .groupBy("__p").agg(sum("__f").as("__c"))
          .orderBy(desc("__c"), asc("__p"))
          .head(1)
        top.headOption match {
          case Some(r) if r.getLong(1) >= minPairCount =>
            merges += r.getString(0)
            round += 1
          case _ => exhausted = true
        }
      }
      merges.toSeq
    } finally words.unpersist(blocking = false)
  }
}
