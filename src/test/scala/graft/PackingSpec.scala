package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences lays docs end to end, sequences advance at the budget") {
    val docs = Seq(
      (1L, "a", 300L), (2L, "a", 300L), (3L, "a", 300L), // stream a: 0, 300, 600
      (10L, "b", 600L), (11L, "b", 100L)                 // stream b: 0, 600
    ).toDF("id", "shard", "n")
    val out = Packing.packSequences(docs, $"id", $"n", 512, "shard")
      .select("id", "seq_id", "seq_offset").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    out(1L) shouldBe ((0L, 0L))    // starts at offset 0 of seq 0
    out(2L) shouldBe ((0L, 300L))  // straddles the boundary, starts in seq 0
    out(3L) shouldBe ((1L, 88L))   // starts at stream offset 600 = seq 1 + 88
    out(10L) shouldBe ((0L, 0L))   // shard b packs independently
    out(11L) shouldBe ((1L, 88L))
  }

  test("every sequence start offset is in [0, budget)") {
    val docs = (1L to 500L).map(i => (i, s"s${i % 3}", (i % 97) + 1)).toDF("id", "shard", "n")
    val bad = Packing.packSequences(docs, $"id", $"n", 64, "shard")
      .filter($"seq_offset" < 0 || $"seq_offset" >= 64).count()
    bad shouldBe 0L
  }

  test("offsets reconstruct the concatenated stream exactly") {
    val docs = (1L to 200L).map(i => (i, "one", (i % 37) + 1)).toDF("id", "shard", "n")
    val rows = Packing.packSequences(docs, $"id", $"n", 128, "shard")
      .select($"id", $"n".cast("long"), $"seq_id", $"seq_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    var stream = 0L
    rows.foreach { case (_, n, seqId, off) =>
      seqId shouldBe stream / 128
      off shouldBe stream % 128
      stream += n
    }
  }

  test("packSequences with the BPE counter: layout follows tokenizer tokens, not words") {
    // "the table scan" = 3 words but 4 BPE tokens under the reference
    // merges — a packer budgeting by words would place doc starts at
    // multiples of 3 and OVERFLOW real sequence buffers by a third
    val merges = typedLit(Seq("t h", "th e", "e r", "a b", "ab l", "abl e",
      "q u", "er y", "s c", "sc a", "sca n", "o r"))
    val docs = (0L until 6L).map(i => (i, "one", "the table scan")).toDF("id", "shard", "text")
    val bpe = graft.functions.BpeExpressions.tokenCount(spark, $"text", merges)
    val out = Packing.packSequences(docs, $"id", bpe, budget = 10, "shard")
      .select("id", "seq_id", "seq_offset").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // stream offsets advance by 4 per doc: 0,4,8,12,16,20 -> seq floor(x/10)
    for (i <- 0L until 6L) out(i) shouldBe ((i * 4 / 10, i * 4 % 10))
    // whitespace counting would have started doc 3 at offset 9 of seq 0 —
    // provably a different layout
    val ws = Packing.packSequences(docs, $"id",
      graft.functions.TextFunctions.tokenCount($"text").cast("long"),
      budget = 10, "shard")
      .select("id", "seq_id", "seq_offset").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    ws(3L) shouldBe ((0L, 9L))
    out(3L) shouldBe ((1L, 2L))
  }
}
