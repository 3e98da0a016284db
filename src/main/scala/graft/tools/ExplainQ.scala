package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch (r17): dump .explain("formatted") for named queries into
  * plans/r17/<name>_<suffix>.txt. Usage:
  *   runMain graft.tools.ExplainQ <suffix> q_a q_b ...
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val suffix = args.head
    val names = args.tail
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("plans/r17"))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"plans/r17/${name}_$suffix.txt"), txt)
      println(s"[explainq] wrote plans/r17/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
