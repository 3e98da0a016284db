package graft

import graft.operators.BpeTrain

/** Greedy BPE merge-list training, checked against an INDEPENDENT
  * brute-force reference implementation (rank-order merge application —
  * equivalent to lowest-rank-first for trained lists, which are
  * topologically ordered by construction) and a hand-computed corpus.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  // ---- brute-force reference (no shared code with the kernel) ----
  private def refApply(word: String, merges: Seq[String]): Vector[String] = {
    var toks = word.map(_.toString).toVector
    for (m <- merges) {
      val Array(a, b) = m.split(" ", 2)
      var changed = true
      while (changed) {
        changed = false
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i < toks.length - 1 && toks(i) == a && toks(i + 1) == b) {
            out += a + b; i += 2; changed = true
          } else { out += toks(i); i += 1 }
        }
        toks = out.result()
      }
    }
    toks
  }

  private def refTrain(wordFreq: Map[String, Long], k: Int): Seq[String] = {
    val merges = scala.collection.mutable.ArrayBuffer[String]()
    var done = false
    while (merges.length < k && !done) {
      val counts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for ((w, f) <- wordFreq) {
        val t = refApply(w, merges.toSeq)
        for (i <- 0 until t.length - 1) counts(t(i) + " " + t(i + 1)) += f
      }
      if (counts.isEmpty) done = true
      else merges += counts.toSeq.sortBy { case (p, c) => (-c, p) }.head._1
    }
    merges.toSeq
  }

  test("learned merges reproduce the hand-computed banana vocabulary") {
    // per doc: banana x2, bandana, ban. Round arithmetic (freq-weighted):
    //   r1: an=7 na=5 ba=4 nd=1 da=1            -> "a n"
    //   r2: "b an"=4 "an a"=3 "an an"=2 ...     -> "b an"
    //   r3: "an a"=3 "ban an"=2 ...             -> "an a"
    //   r4: "ban ana"=2 "ban d"=1 "d ana"=1     -> "ban ana"
    val docs = (1 to 5).map(i => (i, "banana banana bandana ban")).toDF("id", "text")
    val learned = BpeTrain.trainBpeMerges(docs, "text", k = 4)
    learned shouldBe Seq("a n", "b an", "an a", "ban ana")
    // the corpus-size invariance the arithmetic relies on: same template
    // per doc, so doubling docs scales every count equally
    val more = (1 to 17).map(i => (i, "banana banana bandana ban")).toDF("id", "text")
    BpeTrain.trainBpeMerges(more, "text", k = 4) shouldBe learned
  }

  test("training matches the brute-force reference on a mixed corpus") {
    val rnd = new scala.util.Random(5)
    val vocabWords = (0 until 25).map(_ =>
      (0 until 2 + rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString)
    val rows = (0 until 200).map(i => (i, vocabWords(rnd.nextInt(vocabWords.size)) +
      " " + vocabWords(rnd.nextInt(vocabWords.size))))
    val df = rows.toDF("id", "text")
    val wordFreq = rows.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val k = 6
    BpeTrain.trainBpeMerges(df, "text", k) shouldBe refTrain(wordFreq, k)
  }

  test("pair counts weight by word FREQUENCY, not distinct words") {
    // weighted: "x y"=3 beats "a b"=1/"a c"=1; distinct-word counting
    // would tie everything at 1 and pick "a b" lexically
    val df = Seq((1, "xy xy xy ab ac")).toDF("id", "text")
    BpeTrain.trainBpeMerges(df, "text", k = 1) shouldBe Seq("x y")
  }

  test("ties break lexically; exhaustion stops early; learned merges drive the counter") {
    // all pairs count 1 -> lexical smallest wins each round
    val df = Seq((1, "ab cd")).toDF("id", "text")
    BpeTrain.trainBpeMerges(df, "text", k = 1) shouldBe Seq("a b")
    // single-char words: nothing to merge, k is an upper bound
    BpeTrain.trainBpeMerges(Seq((1, "a b c")).toDF("id", "text"), "text", k = 8) shouldBe Nil
    // end to end: learned merges plug into graft_bpe_count
    val learned = BpeTrain.trainBpeMerges(
      Seq((1, "banana banana bandana ban")).toDF("id", "text"), "text", k = 4)
    val n = Seq((1, "banana bandana")).toDF("id", "text")
      .select(graft.functions.BpeExpressions.tokenCount(spark,
        org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.typedLit(learned)).as("n"))
      .head().getLong(0)
    // banana -> ban+ana -> [banana] = 1 (merge 4 fires); bandana -> [ban, d, ana] = 3
    n shouldBe 4L
  }
}
