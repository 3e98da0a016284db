package graft

import graft.operators.Decontaminate

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"), // contains bench 8-gram
    (2L, "a completely different document about query engines"),
    (3L, "short doc"),                                           // < 8 tokens: never flagged
    (4L, "THE Quick BROWN fox JUMPS over THE lazy cat today")    // case-insensitive: 8-gram differs at pos 8
  ).toDF("doc_id", "text")

  private val bench = Seq(
    (100L, "exam question: the quick brown fox jumps over the lazy dog")
  ).toDF("bid", "btext")

  test("flag marks docs sharing an 8-token shingle with the benchmark") {
    val out = Decontaminate.flag(corpus, "text", "doc_id", bench, "btext")
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    out(1L) shouldBe true   // "the quick brown fox jumps over the lazy" shared
    out(2L) shouldBe false
    out(3L) shouldBe false
    out(4L) shouldBe true   // lowercased tokens match the same shingle
  }

  test("clean drops exactly the flagged docs") {
    val kept = Decontaminate.clean(corpus, "text", "doc_id", bench, "btext")
      .select("doc_id").as[Long].collect().toSet
    kept shouldBe Set(2L, 3L)
  }

  test("n larger than every doc flags nothing") {
    Decontaminate.flag(corpus, "text", "doc_id", bench, "btext", n = 40)
      .filter("contaminated").count() shouldBe 0L
  }

  test("the corpus meets the benchmark in a broadcast join, not a shuffle") {
    val plan = Decontaminate.contaminatedIds(corpus, "text", "doc_id", bench, "btext")
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("semantic flavor: identical eval vectors always flag; orthogonal never do") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (4L, Array(0.98f, 0.01f, 0.0f, 0.0f)) // cosine ~0.9999 to vec 1
    ).toDF("vec_id", "embedding")
    // eval holds an exact copy of vec 1 and an unrelated direction
    val eval = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (101L, Array(0.0f, 0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Decontaminate.semanticFlag(vecs, "embedding", "vec_id",
      eval, "embedding", dim = 4, threshold = 0.99)
      .select("vec_id", "contaminated").as[(Long, Boolean)].collect().toMap
    out(1L) shouldBe true // bit-identical: always shares every plane bucket
    out(2L) shouldBe false
    out(3L) shouldBe false
    // vec 4 is a true near-dup of eval vector 100 at this threshold; with
    // 4 planes in 4-dim its bucket almost surely matches — assert only the
    // LSH guarantee (if it IS a candidate, the verify keeps it)
    val clean = Decontaminate.semanticClean(vecs, "embedding", "vec_id",
      eval, "embedding", dim = 4, threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    clean should contain allOf (2L, 3L)
    clean should not contain 1L
    // the eval side broadcasts: the corpus never shuffles
    val plan = Decontaminate.semanticContaminatedIds(vecs, "embedding", "vec_id",
      eval, "embedding", dim = 4).queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("scrub removes exactly the benchmark-covered spans, keeps the rest") {
    val bench = Seq((0L, "a b c d e f g h")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "x1 x2 x3 a b c d e f g h y1 y2 y3"), // span at tokens 3..10
      (2L, "p q r s t u v w p q"),               // untouched
      (3L, "a b c d e f g h"),                   // verbatim member: all gone
      (4L, "a b c d e f g h a b c d e f g h"),   // two occurrences
      (5L, "a b c d e f g")                      // shorter than n: untouched
    ).toDF("doc_id", "text")
    val out = Decontaminate.scrub(docs, "text", "doc_id", bench, "text", n = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    out(1L) shouldBe (("x1 x2 x3 y1 y2 y3", 8L))
    out(2L) shouldBe (("p q r s t u v w p q", 0L))
    out(3L) shouldBe (("", 8L))
    out(4L) shouldBe (("", 16L))
    out(5L) shouldBe (("a b c d e f g", 0L))
    // partial overlap: the covering intervals union, not double-count
    val d2 = Seq((9L, "z a b c d e f g h b c d e f g h i z")).toDF("doc_id", "text")
    val b2 = Seq((0L, "a b c d e f g h"), (1L, "h b c d e f g h")).toDF("doc_id", "text")
    // matches at p0=1 (a..h) and p0=8 (h b c d e f g h) -> covers 1..15
    Decontaminate.scrub(d2, "text", "doc_id", b2, "text", n = 8)
      .collect().head.getString(1) shouldBe "z i z"
  }
}
