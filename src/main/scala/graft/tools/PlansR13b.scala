package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.table.Icebox

/** PLANS.md round-13 evidence: runtime bloom-join file pruning at sf0.1 —
  * files scanned and wall time, bloom-pruned vs full read.
  */
object PlansR13b {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val fact = Icebox(tmp("p13b_f"))
    fact.setProperties(Map(
      "manifest.bloom.columns" -> "l_orderkey", "manifest.bloom.fpp" -> "0.001"))
    fact.append(graft.sources.Testdata.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount").repartition(64))
    val dim = graft.sources.Testdata.table(spark, sf, "orders")
      .filter(col("o_custkey") === 7L).select("o_orderkey", "o_custkey")
    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body; (r, (System.nanoTime() - t0) / 1e9)
    }
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.join(dim, df("l_orderkey") === dim("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), sum("l_extendedprice").as("s"))
        .collect().length
    // warm both paths once, then measure
    val pruned = graft.operators.RuntimeFilterJoin.prunedFactRead(spark, fact, dim,
      Seq("l_orderkey" -> "o_orderkey"))
    agg(pruned); agg(fact.read(spark))
    val (n1, tPruned) = time(agg(graft.operators.RuntimeFilterJoin.prunedFactRead(
      spark, fact, dim, Seq("l_orderkey" -> "o_orderkey"))))
    val (n2, tFull) = time(agg(fact.read(spark)))
    println(f"files total=${fact.currentSnapshot.get.files.size} " +
      f"scanned=${pruned.inputFiles.length} rows=$n1/$n2 " +
      f"wall pruned=$tPruned%.2f s full=$tFull%.2f s")
    spark.stop()
  }
}
