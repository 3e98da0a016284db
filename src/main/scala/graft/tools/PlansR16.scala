package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: round-16 plan audit — exchange/broadcast/codegen shape of the
  * new operators at sf0.1. Evidence lands in PLANS.md.
  */
object PlansR16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_image_neardup", "q_quality_classifier", "q_bpe_tokens",
        "q_ccnet_pipeline", "q_ann_ivfpq_reassign", "q_decon_semantic")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      df.write.format("noop").mode("overwrite").save() // AQE-final plan
      val plan = df.queryExecution.executedPlan.toString
      def count(needle: String): Int = plan.linesIterator.count(_.contains(needle))
      println(s"[plans16] $name exchanges=${count("Exchange hashpartitioning") +
          count("Exchange rangepartitioning")} " +
        s"broadcasts=${count("BroadcastExchange")} " +
        s"bhj=${count("BroadcastHashJoin")} smj=${count("SortMergeJoin")} " +
        s"shj=${count("ShuffledHashJoin")} " +
        s"scans=${count("Scan parquet")} sorts=${count("+- Sort ")} " +
        s"wsc=${count("WholeStageCodegen")} " +
        s"codegenFallback=${count("CodegenFallback")}")
    }
    spark.stop()
  }
}
