package graft

import org.apache.spark.sql.functions._
import graft.functions.BpeExpressions
import graft.operators.Sampling

/** Greedy-BPE token counting: reference merges applied rank-greedy,
  * left-to-right within a rank, run under codegen.fallback=false so a
  * codegen regression fails loud (the PqExpressionsSpec contract).
  */
class BpeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val merges = Seq("t h", "th e", "e r", "a b", "ab l", "abl e",
    "q u", "er y", "s c", "sc a", "sca n", "o r")

  private def count(texts: String*): Seq[Long] = {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
      .select(col("id"),
        BpeExpressions.tokenCount(spark, col("text"), typedLit(merges)).as("n"))
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("rank-greedy merges: chains, cross-rank ordering, unmergeable chars") {
    // the = t,h,e -> th(r1) -> the(r2): 1 token
    // table = t,a,b,l,e -> ab(r4) -> abl(r5) -> able(r6) -> [t, able]: 2
    // query = q,u,e,r,y: LOWEST rank first (e,r r3 before q,u r7), then
    //   qu(r7), then ery(r8) -> [qu, ery]: 2 — rank order, not left-to-right
    // scan -> sc, sca, scan: 1;  sort -> [s, or, t]: 3;  order -> [or, d, er]: 3
    // xyz: no merges apply: 3
    count("the", "table", "query", "scan", "sort", "order", "xyz") shouldBe
      Seq(1L, 2L, 2L, 1L, 3L, 3L, 3L)
    // documents sum over words; repeated words hit the memo
    count("the table the table scan") shouldBe Seq(1L + 2 + 1 + 2 + 1)
    count("", "   ") shouldBe Seq(0L, 0L)
  }

  test("adjacent occurrences of one rank merge left-to-right, then re-scan") {
    val m = Seq("a a", "aa aa")
    val got = Seq((0, "aaaa"), (1, "aaa"), (2, "aaaaa")).toDF("id", "text")
      .select(col("id"), BpeExpressions.tokenCount(spark, col("text"), typedLit(m)).as("n"))
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    // aaaa: [aa, aa] -> rank2 -> [aaaa]: 1.  aaa: [aa, a]: 2.
    // aaaaa: [aa, aa, a] -> [aaaa, a]: 2.
    got shouldBe Seq(1L, 2L, 2L)
  }

  test("chunksByBudget splits on BPE prefix sums: boundaries, gaps, no empty chunks") {
    import graft.functions.TextFunctions
    def chunksOf(text: String, budget: Int): Seq[(Int, String)] =
      Seq((1, text)).toDF("id", "text")
        .select(explode(TextFunctions.chunksByBudget(spark, col("text"),
          typedLit(merges), budget)).as("c"))
        .select(col("c.chunk_id"), col("c.chunk"))
        .collect().map(r => (r.getInt(0), r.getString(1))).toSeq.sortBy(_._1)
    // counts: the=1 table=2 scan=1 sort=3 order=3 -> prefixes 0,1,3,4,7
    chunksOf("the table scan sort order", 4) shouldBe
      Seq((0, "the table scan"), (1, "sort order"))
    // everything fits one chunk; last word's START decides the count
    chunksOf("the table scan", 4) shouldBe Seq((0, "the table scan"))
    // a word counting past the budget jumps chunk ids: skipped, not empty
    // (xyzxyz = 6 unmergeable chars; prefixes 0,6 with budget 3 -> ids 0, 2)
    chunksOf("xyzxyz the", 3) shouldBe Seq((0, "xyzxyz"), (2, "the"))
    chunksOf("   ", 4) shouldBe Seq.empty
  }

  test("takeTokenBudget with the BPE counter admits by tokenizer tokens, not words") {
    // "the table scan": 3 words but 4 BPE tokens (the=1, table=2, scan=1);
    // the budget arithmetic must follow the BPE column
    val docs = (0L until 10L).map(i => (i, "src", "the table scan")).toDF("id", "src", "text")
    val bpe = BpeExpressions.tokenCount(spark, col("text"), typedLit(merges)) // 4 per doc
    val admitted = Sampling.takeTokenBudget(docs, "src", col("id"), bpe,
      Map("src" -> 17L))
    // greedy prefix under the content-keyed order: budget 17 admits 5 docs
    // at 4 BPE tokens each (cum 0,4,8,12,16 < 17; the 6th would start at 20)
    admitted.count() shouldBe 5L
    // whitespace counting would have admitted 6 (3 words: 0,3,..,15 < 17)
    Sampling.takeTokenBudget(docs, "src", col("id"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long"),
      Map("src" -> 17L)).count() shouldBe 6L
  }

  test("encode emits positional vocab ids per merged token; unknown tokens are -1") {
    val vocab = Seq("t", "h", "e", "a", "b", "l", "q", "u", "r", "y", "s", "c",
      "n", "o", "d", "x", "th", "the", "er", "ab", "abl", "able", "qu", "ery",
      "sc", "sca", "scan", "or")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      def enc(texts: String*): Seq[Seq[Long]] =
        texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
          .select(col("id"), BpeExpressions.encode(spark, col("text"),
            typedLit(merges), typedLit(vocab)).as("ids"))
          .orderBy("id").collect().map(_.getSeq[Long](1).toSeq).toSeq
      // the -> [the]=17; table -> [t, able]=[0,21]; query -> [qu, ery]=[22,23]
      enc("the", "table", "query") shouldBe
        Seq(Seq(17L), Seq(0L, 21L), Seq(22L, 23L))
      // words concatenate in order; count and encode agree on length
      enc("the table scan") shouldBe Seq(Seq(17L, 0L, 21L, 26L))
      // z is not in the vocabulary -> -1 (out-of-alphabet marker)
      enc("xz") shouldBe Seq(Seq(15L, -1L))
      enc("", "   ") shouldBe Seq(Seq.empty, Seq.empty)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("splitWord exposes the raw merge walk (training's pair-count input)") {
    val got = Seq((0, "query"), (1, "table"), (2, "xyz")).toDF("id", "w")
      .select(col("id"), BpeExpressions.splitWord(spark, col("w"),
        typedLit(merges)).as("t"))
      .orderBy("id").collect().map(_.getSeq[String](1).toSeq).toSeq
    got shouldBe Seq(Seq("qu", "ery"), Seq("t", "able"), Seq("x", "y", "z"))
    // encode(text) is the concatenation of splitWord over its words, mapped
    // through the vocab — the two paths share one kernel by construction
  }
}
