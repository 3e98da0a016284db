package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.table.Icebox

/** Evidence for PLANS.md round-13: the q_cbo_join flip — the same 3-table
  * join planned with the manifest stats bridge on vs off.
  */
object PlansR13 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(e => new graft.GraftExtensions().apply(e))
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    def t(n: String) = graft.sources.Testdata.table(spark, sf, n)
    val lt = Icebox(tmp("p13_l")); val ot = Icebox(tmp("p13_o")); val ct = Icebox(tmp("p13_c"))
    lt.append(t("lineitem").select("l_orderkey", "l_extendedprice", "l_quantity")
      .repartition(4), collectStats = Seq("l_orderkey"))
    ot.append(t("orders").select("o_orderkey", "o_custkey", "o_totalprice")
      .repartition(2), collectStats = Seq("o_orderkey", "o_custkey", "o_totalprice"))
    ct.append(t("customer").select("c_custkey", "c_mktsegment")
      .repartition(2), collectStats = Seq("c_custkey"))
    lt.analyze(spark, Seq("l_orderkey"))
    ot.analyze(spark, Seq("o_orderkey", "o_custkey", "o_totalprice"))
    ct.analyze(spark, Seq("c_custkey"))
    def q = lt.read(spark)
      .join(ot.read(spark).filter(col("o_totalprice") <= 2000.0),
        col("l_orderkey") === col("o_orderkey"))
      .join(ct.read(spark), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("revenue"))
    graft.plans.IceboxStats.invalidate()
    println("=== STATS ON (manifest rowCount/min-max/NDV via pre-CBO rule) ===")
    println(q.queryExecution.optimizedPlan.stats)
    println(q.queryExecution.executedPlan.treeString.take(4000))
    spark.conf.set("spark.graft.stats.enabled", "false")
    println("=== STATS OFF (byte heuristic only) ===")
    println(q.queryExecution.optimizedPlan.stats)
    println(q.queryExecution.executedPlan.treeString.take(4000))
    spark.stop()
  }
}
