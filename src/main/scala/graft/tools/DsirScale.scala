package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Evidence: round-13 brief #7 — DSIR importance weights at sf1 (10x
  * corpus bytes) after the r12 honest-cost rewrite (split-once bigram
  * tokenization, driver-collected <=buckets-row count tables, zero
  * retained cache state). Runs the q_dsir_weights shape at sf0.1 and sf1
  * in ONE session, warm (2nd of 2 runs per SF), prints walls + exchange
  * counts. Expectation: ~linear in corpus bytes (three tokenize passes).
  * PLANS.md r13 records the output.
  */
object DsirScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(sfDir: String): (Double, Long, Int) = {
      var wall = 0.0; var rows = 0L; var exch = 0
      for (i <- 1 to 2) { // 2nd run is the warm reading
        val docs = graft.sources.Testdata.table(spark, sfDir, "documents")
        val w = graft.operators.Dsir.importanceWeights(docs,
          docs.filter(col("lang") === "en" && col("source") === "src0"),
          "text", "doc_id", buckets = 4096)
        val t0 = System.nanoTime()
        rows = w.count()
        wall = (System.nanoTime() - t0) / 1e9
        if (i == 2) exch = w.queryExecution.executedPlan.toString
          .linesIterator.count(_.contains("Exchange"))
      }
      (wall, rows, exch)
    }
    val (w01, r01, e01) = run("/root/testdata/sf0.1")
    val (w1, r1, e1) = run("/tmp/graft_sf1_full")
    println(f"sf0.1: $w01%6.2f s  rows=$r01  exchanges=$e01")
    println(f"sf1:   $w1%6.2f s  rows=$r1  exchanges=$e1")
    println(f"wall ratio at 10x bytes: ${w1 / w01}%.2f")
    spark.stop()
  }
}
