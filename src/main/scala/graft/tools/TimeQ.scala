package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: time named SparkEntry queries at a given sf dir (best of 2). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.SparkEntry.queries("q_count")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    names.foreach { n =>
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEQ $n ${math.min(once(), once())}%.2f s")
    }
    spark.stop()
  }
}
