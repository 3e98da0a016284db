package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier

/** Trained quality classifier: driver-side bounded logistic fit over
  * hashed n-gram features, map-only scoring, deterministic end to end.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // reference-like docs: natural small vocabulary, word reuse
  private val vocabGood = Seq("the", "quick", "query", "scans", "a", "table",
    "and", "joins", "rows", "with", "filters", "then", "sorts", "results")
  // junk docs: a disjoint fixed pool (md5-ish opaque tokens)
  private val vocabBad = (0 until 40).map(i => f"zz$i%02dxq")

  private def doc(vocab: Seq[String], seed: Int, len: Int): String =
    (0 until len).map(i => vocab((seed * 31 + i * 7) % vocab.size)).mkString(" ")

  private def labeled(n: Int) = (0 until n).flatMap { i =>
    Seq((i.toLong * 2, doc(vocabGood, i, 20), 1),
      (i.toLong * 2 + 1, doc(vocabBad, i, 20), 0))
  }.toDF("doc_id", "text", "label")

  test("separates reference-like from junk docs on held-out content; deterministic") {
    val m = QualityClassifier.train(labeled(40), "text", "label", "doc_id")
    // held-out docs: same vocabularies, UNSEEN seeds
    val test = (100 until 140).flatMap { i =>
      Seq((i.toLong * 2, doc(vocabGood, i, 25)), (i.toLong * 2 + 1, doc(vocabBad, i, 25)))
    }.toDF("doc_id", "text")
    val out = QualityClassifier.score(test, "text", "doc_id", m)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    for (id <- out.keys) out(id) shouldBe (id % 2 == 0)
    // deterministic: same sample -> same weights, bit for bit
    val m2 = QualityClassifier.train(labeled(40), "text", "label", "doc_id")
    m2.bias shouldBe m.bias
    m2.weights.toSeq shouldBe m.weights.toSeq
  }

  test("scoring is a narrow projection: no exchange, no join in the plan") {
    val m = QualityClassifier.train(labeled(10), "text", "label", "doc_id")
    val plan = QualityClassifier.score(labeled(10), "text", "doc_id", m)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should not include "Join"
  }

  test("n_feats counts unigrams+bigrams; gramless docs score the bias alone") {
    val m = QualityClassifier.train(labeled(10), "text", "label", "doc_id")
    val df = Seq((1L, "a b c"), (2L, "  "), (3L, "single")).toDF("doc_id", "text")
    val r = QualityClassifier.score(df, "text", "doc_id", m)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2))).toMap
    r(1L)._1 shouldBe 5L // 3 unigrams + 2 bigrams
    r(2L)._1 shouldBe 0L
    r(3L)._1 shouldBe 1L
    r(2L)._2 shouldBe (m.bias > 0)
  }

  test("bounded-sample guard and class requirements fail loud") {
    intercept[IllegalArgumentException] {
      QualityClassifier.train(labeled(30), "text", "label", "doc_id", maxTrainDocs = 10)
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.train(labeled(10).filter($"label" === 1),
        "text", "label", "doc_id")
    }
  }

  test("model round-trips through the (bucket, weight) persistence frame") {
    val m = QualityClassifier.train(labeled(20), "text", "label", "doc_id")
    val df = QualityClassifier.modelToDF(spark, m)
    val back = QualityClassifier.modelFromDF(df, m.buckets)
    back.bias shouldBe m.bias
    back.weights.toSeq shouldBe m.weights.toSeq
    // driver-side bucket arithmetic == the Spark column arithmetic
    val grams = Seq("alpha", "beta gamma", "the", "zz07xq")
    val sparkBuckets = grams.toDF("g")
      .select(QualityClassifier.bucketColumn(col("g"), 8192).as("b"))
      .collect().map(_.getLong(0).toInt).toSeq
    sparkBuckets shouldBe grams.map(g => QualityClassifier.bucketOfLocal(g, 8192))
  }
}
