package graft

import org.apache.spark.sql.functions._
import graft.operators.LmScore

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  // uni: the=2 cat=2 sat=1 ran=1  (N=6, V=4)
  // bi:  (the,cat)=2 (cat,sat)=1 (cat,ran)=1
  private def ref = Seq((1L, "the cat sat"), (2L, "the cat ran"))
    .toDF("doc_id", "text")

  test("trainBigramLm counts grams and totals exactly") {
    val lm = LmScore.trainBigramLm(ref, "text")
    lm.totalTokens shouldBe 6L
    lm.vocabSize shouldBe 4L
    lm.unigrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("the" -> 2L, "cat" -> 2L, "sat" -> 1L, "ran" -> 1L)
    lm.bigrams.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap shouldBe
      Map(("the", "cat") -> 2L, ("cat", "sat") -> 1L, ("cat", "ran") -> 1L)
  }

  test("perplexityScore: seen bigrams use c(w1,w2)/c(w1), unseen back off to add-one unigrams") {
    val lm = LmScore.trainBigramLm(ref, "text")
    val docs = Seq(
      (10L, "the cat sat"), // (the,cat): 2/2=1 -> 0; (cat,sat): 1/2 -> log10(0.5)
      (11L, "dog the"), // unseen: 0.4*(c(the)+1)/(6+4) = 0.12
      (12L, "dog zebra"), // unseen, OOV w2: 0.4*(0+1)/10 = 0.04
      (13L, "single"), // 1 token -> no bigrams, null score
      (14L, "") // empty -> no bigrams
    ).toDF("doc_id", "text")
    val out = LmScore.perplexityScore(docs, "text", "doc_id", lm)
      .orderBy("doc_id").collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(10L, 11L, 12L, 13L, 14L)
    out.map(_.getLong(1)).toSeq shouldBe Seq(2L, 1L, 1L, 0L, 0L)
    out(0).getDouble(2) shouldBe math.log10(0.5) / 2 +- 5e-5 // (0 + log10(.5))/2 = -0.1505
    out(1).getDouble(2) shouldBe math.log10(0.12) +- 5e-5
    out(2).getDouble(2) shouldBe math.log10(0.04) +- 5e-5
    out(3).isNullAt(2) shouldBe true
    out(4).isNullAt(2) shouldBe true
  }

  test("tokenization is lowercase-whitespace: case folds into the same gram") {
    val lm = LmScore.trainBigramLm(ref, "text")
    val out = LmScore.perplexityScore(
      Seq((1L, "The CAT sat")).toDF("doc_id", "text"), "text", "doc_id", lm)
      .collect()(0)
    out.getLong(1) shouldBe 2L
    out.getDouble(2) shouldBe math.log10(0.5) / 2 +- 5e-5
  }

  test("ccnetSelect: percent_rank boundaries are inclusive on the better side") {
    val lm = LmScore.trainBigramLm(ref, "text")
    val docs = Seq(
      (1L, "the cat sat", "en"), // -0.1505, best
      (2L, "cat sat", "en"), // -0.3010
      (3L, "dog the", "en"), // -0.9208
      (4L, "dog zebra", "en"), // -1.3979, worst
      (5L, "the cat ran", "de"), // scorable -> pr 0 in its language
      (6L, "single", "de") // unscorable (1 token) -> forced tail
    ).toDF("doc_id", "text", "lang")
    val out = LmScore.ccnetSelect(docs, "text", "doc_id", "lang", lm)
      .orderBy("doc_id").collect()
    // en has 4 scorable docs: pr = 0, 1/3, 2/3, 1 — the head boundary
    // (pr == headFrac) and the middle boundary (pr == 1 - tailFrac) land
    // EXACTLY on documents, pinning the inclusive-on-the-better-side rule
    out(0).getDouble(4) shouldBe 0.0
    out(1).getDouble(4) shouldBe (1.0 / 3) +- 1e-15
    out(2).getDouble(4) shouldBe (2.0 / 3) +- 1e-15
    out(3).getDouble(4) shouldBe 1.0
    out.take(4).map(_.getString(5)).toSeq shouldBe Seq("head", "head", "middle", "tail")
    // de: the scorable doc ranks first; the unscorable one is tail by rule
    out(4).getString(5) shouldBe "head"
    out(5).isNullAt(3) shouldBe true
    out(5).getString(5) shouldBe "tail"
  }

  test("ccnetSelectByCutoff: kept set is score-downward-closed; ties at the cutoff all keep") {
    val lm = LmScore.trainBigramLm(ref, "text")
    val docs = Seq(
      (1L, "the cat sat", "en"), // -0.1505, best
      (2L, "cat sat", "en"), // -0.3010
      (3L, "dog the", "en"), // -0.9208
      (4L, "dog zebra", "en"), // -1.3979, worst
      (5L, "single", "en"), // unscorable -> never kept
      (6L, "the cat sat", null) // null language -> never kept
    ).toDF("doc_id", "text", "lang")
    // keepFrac 0.25 over 4 scorable docs: cutoff = p75, interpolated
    // strictly above the #2 score -> exactly the top doc survives
    val out = LmScore.ccnetSelectByCutoff(docs, "text", "doc_id", "lang", lm,
      keepFrac = 0.25, exact = true).orderBy("doc_id").collect()
    out.map(_.getBoolean(4)).toSeq shouldBe Seq(true, false, false, false, false, false)
    // the defining property: every kept doc outscores every dropped scorable doc
    // the defining property: within the language, every kept doc scores at
    // least every dropped scorable doc (null-language docs are dropped by
    // language, not score — excluded from the comparison)
    val kept = out.filter(_.getBoolean(4)).map(_.getDouble(3))
    val dropped = out.filter(r =>
      !r.getBoolean(4) && !r.isNullAt(3) && !r.isNullAt(1)).map(_.getDouble(3))
    kept.min should be >= dropped.max
    // ties AT the cutoff: identical scores all keep (fraction overshoots)
    val tied = Seq((1L, "the cat sat", "en"), (2L, "the cat sat", "en"),
      (3L, "the cat sat", "en")).toDF("doc_id", "text", "lang")
    LmScore.ccnetSelectByCutoff(tied, "text", "doc_id", "lang", lm,
      keepFrac = 1.0 / 3, exact = true)
      .filter(col("kept")).count() shouldBe 3L
    // the approx path (the 100 TB default): approx_percentile returns a
    // MEMBER value rather than interpolating, so the >= cutoff comparison
    // includes that member — the kept set can only grow vs exact, stays
    // downward-closed on scores, and still contains the top doc
    val approx = LmScore.ccnetSelectByCutoff(docs, "text", "doc_id", "lang", lm,
      keepFrac = 0.25).orderBy("doc_id").collect()
    val aKeptIds = approx.filter(_.getBoolean(4)).map(_.getLong(0)).toSet
    aKeptIds should contain(1L)
    out.filter(_.getBoolean(4)).map(_.getLong(0)).toSet.subsetOf(aKeptIds) shouldBe true
    val aKept = approx.filter(_.getBoolean(4)).map(_.getDouble(3))
    val aDropped = approx.filter(r =>
      !r.getBoolean(4) && !r.isNullAt(3) && !r.isNullAt(1)).map(_.getDouble(3))
    aKept.min should be >= aDropped.max
  }

  test("ccnetSelect rejects impossible fractions") {
    val lm = LmScore.trainBigramLm(ref, "text")
    val docs = Seq((1L, "the cat", "en")).toDF("doc_id", "text", "lang")
    an[IllegalArgumentException] should be thrownBy
      LmScore.ccnetSelect(docs, "text", "doc_id", "lang", lm,
        headFrac = 0.7, tailFrac = 0.7)
  }

  test("order-5 scoring: recursive stupid backoff through every level, hand-checked") {
    // ref: "a b c d e" x2 -> every k-gram along the sentence has count 2;
    // N=10 tokens, V=5 vocab
    val lm = LmScore.trainNgramLm(
      Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("doc_id", "text"), "text", 5)
    lm.order shouldBe 5
    lm.totalTokens shouldBe 10L
    lm.vocabSize shouldBe 5L
    lm.counts(5).count() shouldBe 1L // only (a,b,c,d,e)
    lm.counts(4).count() shouldBe 2L // (a,b,c,d), (b,c,d,e)
    val docs = Seq(
      (10L, "a b c d e"), // seen 5-gram: 2/2 = 1 -> logp 0
      (11L, "x b c d e"), // level 4: 0.4 * c(b,c,d,e)/c(b,c,d) = 0.4
      (12L, "x y z w e"), // floor: 0.4^4 * (c(e)+1)/(N+V) = 0.0256*3/15
      (13L, "a b c d") // 4 tokens -> no 5-grams, null
    ).toDF("doc_id", "text")
    val out = LmScore.perplexityScoreNgram(docs, "text", "doc_id", lm)
      .orderBy("doc_id").collect()
    out.map(_.getLong(1)).toSeq shouldBe Seq(1L, 1L, 1L, 0L)
    out(0).getDouble(2) shouldBe 0.0 +- 5e-5
    out(1).getDouble(2) shouldBe math.log10(0.4) +- 5e-5
    out(2).getDouble(2) shouldBe math.log10(0.0256 * 3 / 15) +- 5e-5
    out(3).isNullAt(2) shouldBe true
  }

  test("hash-keyed scorer matches the text-keyed scorers on the test corpus") {
    // the hashed-gram-key path (8-byte join keys) must be a pure
    // representation change: orders 2 and 3 have text-keyed counterparts,
    // and every document's (count, rounded score) must agree exactly
    val d = graft.sources.Testdata.table(spark, "/root/testdata/sf0.001", "documents")
    val ref = d.filter(col("doc_id") % 5 === 0)
    val byText2 = LmScore.perplexityScore(d, "text", "doc_id",
      LmScore.trainBigramLm(ref, "text"))
      .withColumnRenamed("n_bigrams", "n_ngrams")
    val byHash2 = LmScore.perplexityScoreNgram(d, "text", "doc_id",
      LmScore.trainNgramLm(ref, "text", 2))
    byText2.exceptAll(byHash2).count() shouldBe 0L
    byHash2.exceptAll(byText2).count() shouldBe 0L
    val byText3 = LmScore.perplexityScoreTrigram(d, "text", "doc_id",
      LmScore.trainTrigramLm(ref, "text"))
      .withColumnRenamed("n_trigrams", "n_ngrams")
    val byHash3 = LmScore.perplexityScoreNgram(d, "text", "doc_id",
      LmScore.trainNgramLm(ref, "text", 3))
    byText3.exceptAll(byHash3).count() shouldBe 0L
    byHash3.exceptAll(byText3).count() shouldBe 0L
  }

  test("trigram scoring: recursive stupid backoff through tri -> bi -> add-one uni") {
    // uni: a2 b2 c2 d1 e1 (N=8 V=5); bi: (a,b)2 (b,c)2 (c,d)1 (c,e)1
    // tri: (a,b,c)2 (b,c,d)1 (b,c,e)1
    val lm = LmScore.trainTrigramLm(
      Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text"), "text")
    lm.bigramLm.totalTokens shouldBe 8L
    lm.bigramLm.vocabSize shouldBe 5L
    lm.trigrams.count() shouldBe 3L
    val docs = Seq(
      (10L, "a b c d"), // (a,b,c): 2/2=1; (b,c,d): 1/2 -> avg log10 = -0.1505
      (11L, "x b c z"), // (x,b,c): backoff bi (b,c): 0.4*2/2=0.4
                        // (b,c,z): backoff uni z: 0.16*(0+1)/13
      (12L, "a b") // < 3 tokens -> null
    ).toDF("doc_id", "text")
    val out = LmScore.perplexityScoreTrigram(docs, "text", "doc_id", lm)
      .orderBy("doc_id").collect()
    out.map(_.getLong(1)).toSeq shouldBe Seq(2L, 2L, 0L)
    out(0).getDouble(2) shouldBe math.log10(0.5) / 2 +- 5e-5
    out(1).getDouble(2) shouldBe
      (math.log10(0.4) + math.log10(0.16 / 13.0)) / 2 +- 5e-5
    out(2).isNullAt(2) shouldBe true
  }

  test("reference-like docs outscore random-word docs (the filter's discriminating power)") {
    val rnd = new scala.util.Random(5)
    val cleanRef = (0 until 200).map { i =>
      (i.toLong, Seq.fill(30)(Seq("data", "spark", "table", "scan", "join",
        "query", "plan", "read")(rnd.nextInt(8))).mkString(" "))
    }.toDF("doc_id", "text")
    val lm = LmScore.trainBigramLm(cleanRef, "text")
    val probe = Seq(
      (1000L, "data spark table scan join query plan read data spark"),
      (1001L, (0 until 10).map(_ => (0 until 6).map(_ =>
        ('a' + rnd.nextInt(26)).toChar).mkString).mkString(" "))
    ).toDF("doc_id", "text")
    val s = LmScore.perplexityScore(probe, "text", "doc_id", lm)
      .orderBy("doc_id").collect()
    s(0).getDouble(2) should be > (s(1).getDouble(2) + 1.0) // >=1 order of magnitude apart
  }
}
