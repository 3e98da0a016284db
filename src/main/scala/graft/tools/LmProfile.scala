package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.LmScore
import graft.sources.Testdata

/** Scratch: stage breakdown of q_lm_perplexity at sf0.1. */
object LmProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val d = Testdata.table(spark, dir, "documents")
    d.count() // warm
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val lm = time("train (incl totals collect)") {
      LmScore.trainBigramLm(d.filter(col("doc_id") % 5 === 0), "text")
    }
    println(s"  N=${lm.totalTokens} V=${lm.vocabSize}")
    time("bi materialize (count)") { println("  bi rows=" + lm.bigrams.count()) }
    val out = LmScore.perplexityScore(d, "text", "doc_id", lm)
    time("score run 1") { out.write.format("noop").mode("overwrite").save() }
    time("score run 2") { out.write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
