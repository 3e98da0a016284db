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

  test("packTokenIds: flattened sequences reconstruct doc ids + separators exactly") {
    val SEP = 1000L
    val rnd = new scala.util.Random(11)
    val docs = (1L to 80L).map { i =>
      (i, s"s${i % 3}", (0 until rnd.nextInt(40)).map(_ => rnd.nextInt(100).toLong))
    }.toDF("id", "shard", "ids")
    val packed = Packing.packTokenIds(docs, $"id", $"ids", budget = 16,
      shardCol = "shard", docSep = SEP)
      .select($"shard", $"seq_id", $"token_ids")
      .as[(String, Long, Seq[Long])].collect()
    val byShard = packed.groupBy(_._1)
    val expected = docs.select($"shard", $"id", $"ids").as[(String, Long, Seq[Long])]
      .collect().groupBy(_._1)
      .map { case (s, ds) => s -> ds.sortBy(_._2).flatMap(d => d._3 :+ SEP).toSeq }
    expected.keySet shouldBe byShard.keySet
    for ((s, stream) <- expected) {
      val seqs = byShard(s).sortBy(_._2)
      // seq ids are dense from 0
      seqs.map(_._2).toSeq shouldBe (0L until seqs.length.toLong)
      // every sequence is exactly the budget except possibly the last
      seqs.dropRight(1).foreach(_._3.size shouldBe 16)
      seqs.last._3.size should be <= 16
      // and the concatenation IS the doc stream, boundaries included
      seqs.flatMap(_._3).toSeq shouldBe stream
    }
  }

  test("packTokenIds layout is invariant under input repartitioning") {
    val docs = (1L to 60L).map(i =>
      (i, "one", (0L until (i % 7) + 1).toSeq)).toDF("id", "shard", "ids")
    def run(d: org.apache.spark.sql.DataFrame) =
      Packing.packTokenIds(d, $"id", $"ids", budget = 8, shardCol = "shard", docSep = 99L)
        .select($"seq_id", $"token_ids").as[(Long, Seq[Long])]
        .collect().sortBy(_._1).toSeq
    run(docs) shouldBe run(docs.repartition(13))
    run(docs) shouldBe run(docs.coalesce(1))
  }

  test("packTokenIds: empty docs contribute just their separator") {
    val docs = Seq((1L, "a", Seq(7L, 8L)), (2L, "a", Seq.empty[Long]),
      (3L, "a", Seq(9L))).toDF("id", "shard", "ids")
    val out = Packing.packTokenIds(docs, $"id", $"ids", budget = 100,
      shardCol = "shard", docSep = 0L)
      .select($"token_ids").as[Seq[Long]].collect()
    out should have length 1
    out.head shouldBe Seq(7L, 8L, 0L, 0L, 9L, 0L)
  }
}
