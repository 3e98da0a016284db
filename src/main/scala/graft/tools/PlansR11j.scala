package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.MaterializedView
import graft.operators.MaterializedView.StarDim
import graft.table.Icebox

/** Round-11j: star-view refresh cost vs fact size — same small change
  * batch against a 1x and a 10x fact (constant file size, so file COUNT
  * grows 10x), refresh wall time should stay roughly flat (O(delta),
  * key-pruned non-delta reads), not grow 10x.
  */
object PlansR11j {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def timeMs[T](body: => T): Long = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1000000
    }

    def run(scale: Int): (Long, Int) = {
      val fact = Icebox(java.nio.file.Files.createTempDirectory(s"star$scale-f").toString)
      val cust = Icebox(java.nio.file.Files.createTempDirectory(s"star$scale-c").toString)
      val prod = Icebox(java.nio.file.Files.createTempDirectory(s"star$scale-p").toString)
      val mv = Icebox(java.nio.file.Files.createTempDirectory(s"star$scale-t").toString)
      val n = 100000 * scale
      // constant ~12.5k rows/file -> file count grows with scale
      (0 until 8 * scale).foreach { part =>
        fact.append(spark.range(part * n / (8 * scale), (part + 1) * n / (8 * scale))
          .select(col("id"), (col("id") % 1000).cast("int").as("ck"),
            (col("id") % 500).cast("int").as("pk2"), (col("id") * 10).as("v")),
          collectStats = Seq("ck", "pk2"))
      }
      cust.append((0 until 1000).map(k => (k, s"seg${k % 13}")).toDF("c_id", "seg"),
        collectStats = Seq("c_id"))
      prod.append((0 until 500).map(k => (k, s"cat${k % 7}")).toDF("p_id", "cat"),
        collectStats = Seq("p_id"))
      val dims = Seq(StarDim(cust, Seq("ck" -> "c_id")), StarDim(prod, Seq("pk2" -> "p_id")))
      MaterializedView.refreshStar(spark, fact, dims, mv, "sj",
        Seq("seg", "cat"), Seq("v"))
      // the SAME small change batch at every scale: 500 new facts + one
      // dim row moved
      fact.append(spark.range(n, n + 500)
        .select(col("id"), (col("id") % 1000).cast("int").as("ck"),
          (col("id") % 500).cast("int").as("pk2"), (col("id") * 10).as("v")),
        collectStats = Seq("ck", "pk2"))
      cust.deleteByKeys(Seq(7).toDF("c_id"))
      cust.append(Seq((7, "segX")).toDF("c_id", "seg"))
      val ms = timeMs {
        val m = MaterializedView.refreshStar(spark, fact, dims, mv, "sj",
          Seq("seg", "cat"), Seq("v"))
        require(m == MaterializedView.Incremental, s"expected Incremental, got $m")
      }
      (ms, fact.currentSnapshot.get.files.size)
    }
    val (ms1, f1) = run(1)
    val (ms10, f10) = run(10)
    println(s"== star refresh: 1x fact ($f1 files) ${ms1}ms; " +
      s"10x fact ($f10 files) ${ms10}ms; ratio ${"%.2f".format(ms10.toDouble / ms1)}x")
    spark.stop()
  }
}
