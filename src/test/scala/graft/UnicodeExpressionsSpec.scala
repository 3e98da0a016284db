package graft

import graft.functions.UnicodeExpressions
import org.apache.spark.sql.functions._

class UnicodeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("NFC composes combining sequences; NFKC folds compatibility forms") {
    val combining = "cafe" + "\u0301"          // e + combining acute
    val composed = "caf" + "\u00e9"            // precomposed e-acute
    val ligature = "\ufb01le"                  // fi ligature
    val df = Seq(combining, ligature, "plain ascii").toDF("s")
    val out = df.select(
      UnicodeExpressions.normalize(spark, col("s")).as("nfc"),
      UnicodeExpressions.normalize(spark, col("s"), "NFKC").as("nfkc"))
      .collect()
    out(0).getString(0) shouldBe composed
    out(0).getString(1) shouldBe composed
    out(1).getString(0) shouldBe ligature       // NFC keeps the ligature
    out(1).getString(1) shouldBe "file"         // NFKC folds it
    out(2).getString(0) shouldBe "plain ascii"
  }

  test("clean strips C0/C1 controls and zero-width chars, keeps tab/newline") {
    val dirty = "ab" + "\u200b" + "c" + "\u200d" + "d" + "\ufeff" +
      "e\tf" + "\u0007" + "\ngh" + "\u0085"
    val out = Seq(dirty).toDF("s")
      .select(UnicodeExpressions.clean(spark, col("s")))
      .head().getString(0)
    out shouldBe "abcde\tf\ngh"
  }

  test("ASCII fast path is identity") {
    val texts = Seq("already clean", "tabs\tand\nnewlines ok", "")
    val out = texts.toDF("s")
      .select(UnicodeExpressions.clean(spark,
        UnicodeExpressions.normalize(spark, col("s"))).as("c"))
      .as[String].collect()
    out shouldBe texts
  }

  test("null propagates; invalid form rejected at analysis") {
    Seq[Option[String]](None).toDF("s")
      .select(UnicodeExpressions.normalize(spark, col("s")))
      .head().isNullAt(0) shouldBe true
    UnicodeExpressions.register(spark)
    an[Exception] should be thrownBy
      spark.sql("SELECT graft_unicode_normalize('x', 'NFX')").collect()
  }

  test("expressions run inside whole-stage codegen") {
    // spark.range keeps the projection in an executed stage (a local Seq
    // constant-folds to LocalTableScan before codegen)
    val df = spark.range(100)
      .select(concat(lit("row"), col("id").cast("string")).as("s"))
      .select(UnicodeExpressions.clean(spark,
        UnicodeExpressions.normalize(spark, col("s"))).as("c"))
    // the "*(1)" star marks operators inside a WholeStageCodegen stage
    df.queryExecution.executedPlan.toString should include ("*(1) Project")
    df.count() shouldBe 100L
  }

  test("normalization makes cross-encoding dedup hashes agree") {
    // same visible text, two encodings: dedup only works after NFC
    val df = Seq((1L, "caf" + "\u00e9" + " menu"), (2L, "cafe" + "\u0301" + " menu"))
      .toDF("id", "text")
    val normed = df.withColumn("text",
      UnicodeExpressions.normalize(spark, col("text")))
    graft.operators.Dedup.exact(df, "text", "id").count() shouldBe 2L
    graft.operators.Dedup.exact(normed, "text", "id").count() shouldBe 1L
  }
}
