package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Round-11f plan audit: shuffle shape of the resample/gap-fill
  * operator — evidence for PLANS.md.
  */
object PlansR11f {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = graft.SparkEntry.queries("q_resample")(spark, sfDir)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val exchanges = "Exchange".r.findAllIn(plan).size
    val partialAgg = plan.linesIterator.count(_.contains("HashAggregate"))
    println(s"== q_resample: $exchanges Exchange(s), $partialAgg HashAggregate(s)")
    plan.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Window") ||
        l.contains("Generate") || l.contains("HashAggregate") || l.contains("Scan parquet"))
      .foreach(l => println("   " + l.trim.take(150)))
    spark.stop()
  }
}
