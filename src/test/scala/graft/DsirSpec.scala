package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR importance weighting: target-like documents must outscore
  * off-target ones, weights are partitioning-independent, and top-k
  * selection is deterministic.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies: "science" target-like vs "spam" off-target
  private def corpus = Seq(
    (1L, "the experiment measured the quantum state of the electron"),
    (2L, "buy cheap pills now click here buy now cheap"),
    (3L, "the theory predicts the observed energy of the electron"),
    (4L, "click here now for cheap pills buy here now"),
    (5L, "the quantum theory of the electron energy state"),
    (6L, "the experiment and the theory agree on the energy")).toDF("id", "text")

  private def target = Seq(
    (100L, "the quantum theory of the electron"),
    (101L, "the experiment measured the energy state")).toDF("id", "text")

  test("target-like documents outscore off-target documents") {
    val w = Dsir.importanceWeights(corpus, target, "text", "id", buckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    w.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L, 6L)
    val science = Seq(1L, 3L, 5L, 6L).map(w)
    val spam = Seq(2L, 4L).map(w)
    science.min should be > spam.max
  }

  test("weights are partitioning-independent (deterministic hashing + rounding)") {
    val a = Dsir.importanceWeights(corpus.repartition(7), target, "text", "id",
      buckets = 1024)
    val b = Dsir.importanceWeights(corpus.coalesce(1), target.repartition(3),
      "text", "id", buckets = 1024)
    assertSameRows(a, b)
  }

  test("selectTop keeps exactly k highest-weighted rows with deterministic ties") {
    val top = Dsir.selectTop(corpus, target, "text", "id", k = 3, buckets = 1024)
    top.count() shouldBe 3L
    top.select("id").as[Long].collect().toSet
      .intersect(Set(2L, 4L)) shouldBe Set.empty // spam never selected at k=3
  }

  test("empty target degrades to pure smoothing (finite weights, no crash)") {
    val w = Dsir.importanceWeights(corpus, target.filter($"id" < 0), "text", "id",
      buckets = 256).collect()
    w.length shouldBe 6
    w.foreach(r => assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
  }

  test("resample keeps target-like docs proportionally more often; deterministic") {
    // corpus big enough for acceptance statistics: half the docs look like
    // the target distribution, half do not
    val docs = (1L to 400L).map { i =>
      val text = if (i % 2 == 0) s"alpha beta gamma delta common phrase $i"
                 else s"zz$i yy$i xx$i ww$i vv$i uu$i"
      (i, text)
    }.toDF("id", "text")
    val tgt = (1L to 40L).map(i => (i, s"alpha beta gamma delta common phrase t$i"))
      .toDF("id", "text")
    val kept = Dsir.resample(docs, tgt, "text", "id", scale = 0.5, buckets = 512)
    assertSameRows(kept, Dsir.resample(docs.repartition(5), tgt, "text", "id",
      scale = 0.5, buckets = 512))
    val keptEven = kept.filter($"id" % 2 === 0).count().toDouble
    val keptOdd = kept.filter($"id" % 2 =!= 0).count().toDouble
    keptEven should be > (keptOdd * 2) // target-like docs dominate the sample
    kept.columns should contain("weight")
  }
}
