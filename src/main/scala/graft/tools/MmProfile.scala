package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.table.Icebox
object MmProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tmp() = java.nio.file.Files.createTempDirectory("mmp").toString
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
    }
    (1 to 2).foreach { round =>
      println(s"--- pass $round")
      val src = Icebox(tmp())
      val li = graft.sources.Testdata.table(spark, "/root/testdata/sf0.1", "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity").cast("decimal(12,2)").as("l_quantity"),
          col("l_extendedprice").cast("decimal(12,2)").as("l_extendedprice"))
      timed("append even")(src.append(li.filter(col("l_orderkey") % 2 === 0)))
      val mv = Icebox(tmp())
      timed("full build")(graft.operators.MaterializedView.refresh(spark, src, mv, "mm",
        Seq("l_returnflag"), Seq("l_quantity"), None, Seq("l_extendedprice")))
      timed("append odd")(src.append(li.filter(col("l_orderkey") % 2 === 1)))
      timed("deleteByKeys")(src.deleteByKeys(li.filter(col("l_orderkey") % 10 === 3)
        .select("l_orderkey").distinct()))
      timed("incremental refresh")(graft.operators.MaterializedView.refresh(spark, src, mv, "mm",
        Seq("l_returnflag"), Seq("l_quantity"), None, Seq("l_extendedprice")))
      timed("read view")(mv.read(spark).collect())
    }
    spark.stop()
  }
}
