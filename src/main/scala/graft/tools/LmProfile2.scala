package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Testdata

/** Scratch: micro-breakdown of the LmScore pipeline stages at sf0.1. */
object LmProfile2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = Testdata.table(spark, "/root/testdata/sf0.1", "documents")
    d.count()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    def toks = graft.functions.TextFunctions.tokens(lower(col("text")))
    time("tokenize + explode + groupBy count") {
      d.select(explode(toks).as("w")).groupBy("w").count()
        .write.format("noop").mode("overwrite").save()
    }
    def bigrams1(t: org.apache.spark.sql.Column) =
      when(size(t) < 2, array().cast("array<struct<w1:string,w2:string>>"))
        .otherwise(transform(sequence(lit(1), size(t) - 1),
          i => struct(element_at(t, i).as("w1"), element_at(t, i + 1).as("w2"))))
    time("bigrams via sequence+element_at") {
      d.select(explode(bigrams1(toks)).as("g")).groupBy("g.w1", "g.w2").count()
        .write.format("noop").mode("overwrite").save()
    }
    time("bigrams, tokens bound once") {
      d.select(toks.as("t"))
        .select(explode(bigrams1(col("t"))).as("g")).groupBy("g.w1", "g.w2").count()
        .write.format("noop").mode("overwrite").save()
    }
    def bigrams2(t: org.apache.spark.sql.Column) =
      when(size(t) < 2, array().cast("array<struct<w1:string,w2:string>>"))
        .otherwise(zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2"))))
    time("bigrams via zip_with(slice,slice)") {
      d.select(toks.as("t"))
        .select(explode(bigrams2(col("t"))).as("g")).groupBy("g.w1", "g.w2").count()
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
