package graft

import graft.operators.PassageDedup

/** ExactSubstr-style duplicated-span removal: cut every corpus-repeated
  * span of >= minWords words except its global first occurrence.
  */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], l: Int) =
    PassageDedup.removeDuplicateSpans(docs.toDF("id", "text"), "text", "id", l)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

  test("cross-document span: keeper doc intact, later doc loses exactly the span") {
    val span = "a b c d e" // 5 words, L=4
    val out = run(Seq(
      0L -> s"x1 x2 $span x3",
      1L -> s"y1 $span y2 y3 y4"), l = 4)
    out(0L) shouldBe (("x1 x2 a b c d e x3", 0L, 8L))
    // doc 1: windows at the 5-word repeat cover exactly those 5 words
    out(1L) shouldBe (("y1 y2 y3 y4", 5L, 9L))
  }

  test("self-duplication inside one document: second copy cut") {
    val out = run(Seq(0L -> "p q r s p q r s tail"), l = 4)
    out(0L) shouldBe (("p q r s tail", 4L, 9L))
  }

  test("overlapping windows merge into one span (no double counting)") {
    // doc1 repeats a 6-word span; L=4 yields 3 overlapping duplicated
    // windows that must merge to ONE 6-word cut
    val span = "m n o p q r"
    val out = run(Seq(0L -> s"$span z1", 1L -> s"z2 $span z3"), l = 4)
    out(1L) shouldBe (("z2 z3", 6L, 8L))
  }

  test("three-way repeat keeps only the global first; short docs untouched") {
    val span = "k1 k2 k3 k4"
    val out = run(Seq(
      2L -> s"$span a2",
      0L -> s"$span a0",
      1L -> s"$span a1",
      3L -> "tiny doc"), l = 4)
    out(0L)._1 shouldBe s"$span a0" // lowest id is the keeper
    out(1L) shouldBe (("a1", 4L, 5L))
    out(2L) shouldBe (("a2", 4L, 5L))
    out(3L) shouldBe (("tiny doc", 0L, 2L))
  }

  test("no duplication: output is the whitespace-canonical original") {
    val out = run(Seq(0L -> "  one   two\tthree  ", 1L -> "four five six"), l = 2)
    out(0L) shouldBe (("one two three", 0L, 3L))
    out(1L) shouldBe (("four five six", 0L, 3L))
  }

  test("adjacent distinct duplicated spans both cut; word totals add up") {
    // two separate duplicated 4-spans in one doc with a unique word between
    val out = run(Seq(
      0L -> "s1 s2 s3 s4 mid t1 t2 t3 t4",
      1L -> "s1 s2 s3 s4 gap t1 t2 t3 t4"), l = 4)
    out(1L) shouldBe (("gap", 8L, 9L))
    out(0L)._2 shouldBe 0L
  }

  test("hot boilerplate gram folds map-side: one row per partition reaches the shuffle") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // 200 docs × 1989 windows of the SAME 12-gram ≈ 400k occurrences of one
    // distinct gram — the boilerplate-skew shape. The per-gram (first,
    // count) state must collapse in the partial aggregate, so the agg
    // shuffle carries ~#partitions rows, never ~#occurrences.
    val words = Seq.fill(2000)("boiler").mkString(" ")
    val docs = (1L to 200L).map(i => (i, words)).toDF("id", "text").repartition(8)
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = PassageDedup.removeDuplicateSpans(docs, "text", "id", minWords = 12)
      out.write.format("noop").mode("overwrite").save()
      val aggExchanges = out.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.child match {
          // min(struct) buffers aren't fixed-width, so the partial agg may
          // plan as ObjectHashAggregate — match any aggregate exec
          case h: BaseAggregateExec
              if h.groupingExpressions.exists(_.toString.contains("__gram")) &&
                h.aggregateExpressions.forall(_.mode == org.apache.spark.sql
                  .catalyst.expressions.aggregate.Partial) => Some(e)
          case _ => None
        }
      }.flatten
      aggExchanges should not be empty
      val records = aggExchanges.map(_.metrics("shuffleRecordsWritten").value).sum
      withClue(s"partial agg shuffled $records records for ~400k occurrences of 1 gram:") {
        records should be <= 16L // ≤ #map partitions × #distinct grams, with margin
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }
}
