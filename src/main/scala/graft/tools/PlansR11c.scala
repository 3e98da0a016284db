package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Round-11c plan audits: shuffle/pruning shape of the round's new
  * operators (token-budget assembly, Gopher rules, incremental corpus
  * dedup) — evidence for PLANS.md.
  */
object PlansR11c {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def audit(name: String): Unit = {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val exchanges = "Exchange".r.findAllIn(plan).size
      val wsc = plan.linesIterator.count(_.contains("WholeStageCodegen"))
      println(s"== $name: $exchanges Exchange(s), $wsc WholeStageCodegen span(s)")
      plan.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("PushedFilters") ||
          l.contains("Window") || l.contains("Scan"))
        .take(12).foreach(l => println("   " + l.trim.take(150)))
    }
    audit("q_gopher_quality")
    audit("q_token_budget")
    spark.stop()
  }
}
