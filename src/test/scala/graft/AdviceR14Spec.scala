package graft

import graft.operators.{LmScore, Multimodal}

/** Round-15 hardening from the round-14 advice: the media sniffs gate
  * exactly what they claim (AIFF form type checked, the video sniff
  * actually wired), LM training reads the reference corpus ONCE, and the
  * bench canary's anchor/fallback arithmetic is robust to single-reading
  * flukes and degraded-only histories (the latter two pinned in depth by
  * BenchSpec; thin guards here for traceability).
  */
class AdviceR14Spec extends SparkSpec {
  import spark.implicits._

  private def iff(magic: String, formType: String): Array[Byte] = {
    val b = new Array[Byte](16)
    magic.getBytes("US-ASCII").copyToArray(b, 0)
    b(4) = 8 // chunk size, little-endian — irrelevant to the sniffs
    formType.getBytes("US-ASCII").copyToArray(b, 8)
    b
  }

  test("AIFF sniff requires the form type at bytes 8-11, not just 'FORM'") {
    // real audio containers pass
    Multimodal.looksLikeAudio(iff("FORM", "AIFF")) shouldBe true
    Multimodal.looksLikeAudio(iff("FORM", "AIFC")) shouldBe true
    Multimodal.looksLikeAudio(iff("RIFF", "WAVE")) shouldBe true
    // other IFF containers (ILBM images, 8SVX audio-for-Amiga, ...) must
    // NOT reach the provider registry the sniff exists to protect
    Multimodal.looksLikeAudio(iff("FORM", "ILBM")) shouldBe false
    Multimodal.looksLikeAudio(iff("FORM", "8SVX")) shouldBe false
    Multimodal.decodeAudio(iff("FORM", "ILBM")) shouldBe None
  }

  test("the video sniff is the decode gate: RIFF non-AVI refuses through it") {
    Multimodal.looksLikeVideo(iff("RIFF", "AVI ")) shouldBe true
    Multimodal.looksLikeVideo(iff("RIFF", "WAVE")) shouldBe false
    Multimodal.looksLikeVideo(iff("FORM", "AVI ")) shouldBe false
    Multimodal.decodeVideo(iff("RIFF", "WAVE") ++ new Array[Byte](16)) shouldBe None
    Multimodal.decodeVideo(iff("FORM", "AVI ") ++ new Array[Byte](16)) shouldBe None
  }

  test("trainTrigramLm reads the reference corpus exactly once (accumulator-counted)") {
    val acc = spark.sparkContext.longAccumulator("adv14-ref-reads")
    val rows = (0 until 60).map(i => (i.toLong, s"the cat sat on mat $i and then ran"))
    val rdd = spark.sparkContext.parallelize(rows, 4).map { r => acc.add(1); r }
    val ref = rdd.toDF("doc_id", "text")
    val lm = LmScore.trainTrigramLm(ref, "text")
    // training materializes uni, bi AND tri counts — before the fix that
    // was three tokenization passes over the source (one per gram order);
    // the cached token frame must hold it to exactly one
    acc.value shouldBe 60L
    lm.trigrams.count() should be > 0L
    lm.unpersist()
  }

  test("bench anchor and degraded-only fallback stay pinned (depth in BenchSpec)") {
    // one anomalously fast reading can't halve the threshold...
    Bench.anchor(Seq(3.0, 6.0, 6.1, 6.2)) shouldBe 4.0 +- 1e-9
    // ...while an honest floor anchors as itself
    Bench.anchor(Seq(6.0, 6.05, 9.0)) shouldBe 6.0
    // a query whose only history sits in degraded runs still gets an anchor
    val lines = Seq(
      """{"ts":0,"sf":"sf0.1","degraded":false,"queries":{"q_a":1.0}}""",
      """{"ts":0,"sf":"sf0.1","degraded":true,"queries":{"q_new":2.0}}""")
    Bench.parseHistory(lines, "sf0.1") shouldBe
      Map("q_a" -> Seq(1.0), "q_new" -> Seq(2.0))
  }
}
