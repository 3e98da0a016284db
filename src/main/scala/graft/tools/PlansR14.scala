package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: round-14 plan audit — exchange/scan counts for the new
  * LmScore scoring plan at sf0.1. Evidence lands in PLANS.md.
  */
object PlansR14 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q_lm_perplexity")(spark, "/root/testdata/sf0.1")
    val plan = df.queryExecution.executedPlan
    def count(needle: String): Int =
      plan.toString.linesIterator.count(_.contains(needle))
    println(s"exchanges=${count("Exchange")} " +
      s"scans=${count("Scan parquet")} " +
      s"broadcasts=${count("BroadcastExchange")} " +
      s"sorts=${count("Sort ")}")
    df.explain("formatted")
  }
}
