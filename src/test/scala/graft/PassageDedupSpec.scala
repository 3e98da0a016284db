package graft

import graft.operators.PassageDedup
import org.apache.spark.sql.functions._

class PassageDedupSpec extends SparkSpec {
  import spark.implicits._

  test("paragraphDedup keeps each paragraph only at its first corpus occurrence") {
    val docs = Seq(
      (1L, "SHARED HEADER\n\nunique body one\n\nshared footer"),
      (2L, "shared header\n\nunique body two\n\nShared Footer"),
      (3L, "shared header\n\nshared footer")
    ).toDF("doc_id", "text")
    val out = PassageDedup.paragraphDedup(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    // doc 1 keeps everything (first occurrence of header+footer, case-folded)
    out(0).getString(1) shouldBe "SHARED HEADER\n\nunique body one\n\nshared footer"
    out(0).getLong(2) shouldBe 3L
    out(0).getLong(3) shouldBe 0L
    // doc 2 keeps only its unique body
    out(1).getString(1) shouldBe "unique body two"
    out(1).getLong(2) shouldBe 1L
    out(1).getLong(3) shouldBe 2L
    // doc 3 is all boilerplate -> dropped entirely
    out.length shouldBe 2
  }

  test("paragraphDedup restores document order and dedups within a doc") {
    val docs = Seq(
      (5L, "b\n\na\n\nb\n\nc")   // repeated paragraph inside one doc
    ).toDF("doc_id", "text")
    val out = PassageDedup.paragraphDedup(docs, "text", "doc_id").collect()
    out.head.getString(1) shouldBe "b\n\na\n\nc"
    out.head.getLong(3) shouldBe 1L
  }

  test("paragraphDedup drops empty paragraphs and empty-after-dedup docs") {
    val docs = Seq(
      (1L, "x\n\n\n\n  \n\ny"),
      (2L, "   \n\n ")
    ).toDF("doc_id", "text")
    val out = PassageDedup.paragraphDedup(docs, "text", "doc_id").collect()
    out.length shouldBe 1
    out.head.getString(1) shouldBe "x\n\ny"
  }

  test("duplicatedNgramStats counts occurrences of corpus-hot n-grams") {
    val docs = Seq(
      (1L, "a b c d e"),        // 2-grams: ab bc cd de
      (2L, "a b c x y"),        // ab bc cx xy
      (3L, "a b q r s"),        // ab bq qr rs
      (4L, "z")                 // shorter than n -> 0 ngrams
    ).toDF("doc_id", "text")
    // minDf=2: hot 2-grams are "a b" (df 3) and "b c" (df 2)
    val st = PassageDedup.duplicatedNgramStats(docs, "text", "doc_id", 2, 1L)
      .orderBy("doc_id").collect()
    st.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) shouldBe Array(
      (1L, 4L, 2L), (2L, 4L, 2L), (3L, 4L, 1L), (4L, 0L, 0L))
    st(3).getDouble(3) shouldBe 0.0
    st(0).getDouble(3) shouldBe 0.5
  }

  test("duplicatedNgramStats counts repeated occurrences within one doc") {
    val docs = Seq(
      (1L, "a b a b"),          // 2-grams: ab ba ab -> ab occurs twice here
      (2L, "a b")
    ).toDF("doc_id", "text")
    val st = PassageDedup.duplicatedNgramStats(docs, "text", "doc_id", 2, 1L)
      .orderBy("doc_id").collect()
    // "a b" df=2 > 1 -> hot; doc 1 has 2 occurrences of it out of 3 grams
    st(0).getLong(2) shouldBe 2L
    st(1).getLong(2) shouldBe 1L
  }

  test("duplicatedNgramFilter drops mostly-duplicated documents") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),  // full dup of 1
      (3L, "a b c unique tail words here now")
    ).toDF("doc_id", "text")
    val kept = PassageDedup.duplicatedNgramFilter(docs, "text", "doc_id",
        n = 2, minDf = 1L, maxDupFraction = 0.5)
      .select("doc_id").as[Long].collect().sorted
    // docs 1,2 are 100% duplicated 2-grams of each other; doc 3 only 2/7
    kept shouldBe Array(3L)
  }

  test("paragraphDedup plans one shuffle for selection keyed by paragraph") {
    val docs = Seq((1L, "p\n\nq")).toDF("doc_id", "text")
    val plan = PassageDedup.paragraphDedup(docs, "text", "doc_id")
      .queryExecution.optimizedPlan.toString
    // window over the normalized paragraph key, not a self-join
    plan should include ("row_number")
    plan.toLowerCase should not include "cartesian"
  }
}
