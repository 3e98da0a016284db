package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Testdata
import graft.table.Icebox

/** Round-8b plan capture: a mixed-generation (partition-evolved) table
  * reads as a UNION of per-generation manifest-backed relations, each with
  * its own partition pruning — a filter on the evolved partition column
  * prunes the partitioned generation in the planner while the legacy
  * unpartitioned generation still scans (conservative).
  */
object PlansR8b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = Testdata.table(spark, "/root/testdata/sf0.001", "orders")
    val t = Icebox(java.nio.file.Files.createTempDirectory("plans-r8b").toString)
    t.append(orders.filter(col("o_orderkey") % 2 === 0))            // gen 1: unpartitioned
    t.setPartitionSpec(Seq("o_orderstatus"))
    t.append(orders.filter(col("o_orderkey") % 2 === 1))            // gen 2: partitioned
    println("=== mixed-generation read + partition filter (want Union of 2 scans, PartitionFilters on gen 2) ===")
    t.readIndexed(spark).filter(col("o_orderstatus") === "F").explain("formatted")
    spark.stop()
  }
}
