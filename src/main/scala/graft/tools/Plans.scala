package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{FileSource, Testdata}
import graft.table.Icebox
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    println("=== q_scan_filter_project (want PushedFilters + pruned ReadSchema) ===")
    FileSource.table(dir, "lineitem").select(spark,
      Seq("l_orderkey", "l_quantity", "l_extendedprice"),
      Some("l_quantity > 30 AND l_discount < 0.05")).explain("formatted")
    println("=== q_join_broadcast (want BroadcastHashJoin) ===")
    Testdata.table(spark, dir, "orders")
      .join(broadcast(Testdata.table(spark, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(sum("o_totalprice")).explain("formatted")
    println("=== icebox partitioned read with filter (want partition pruning) ===")
    val t = Icebox(java.nio.file.Files.createTempDirectory("plans").toString)
    t.append(Testdata.table(spark, dir, "orders"), partitionBy = Seq("o_orderstatus"))
    t.read(spark).filter(col("o_orderstatus") === "F").explain("formatted")
    println("=== q1_agg (want partial/final HashAggregate, WSCG) ===")
    Testdata.table(spark, dir, "lineitem").groupBy("l_suppkey")
      .agg(round(sum("l_extendedprice"), 2)).explain("formatted")
    spark.stop()
  }
}
