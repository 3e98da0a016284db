package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Testdata
import graft.table.Icebox

/** Round-8 plan/metadata captures for PLANS.md (run: sbt "runMain
  * graft.tools.PlansR8"). Evidence for this round's load-bearing claims:
  *   1. Column-mapping rename is free at scan time — a filter on the
  *      RENAMED logical name pushes down onto the physical column at the
  *      FileScan (DataFilters + pruned ReadSchema both show the physical
  *      name; no extra exchange, one WholeStageCodegen span);
  *   2. Equality-delete reads are broadcast-join-shaped — the key file and
  *      the attached-file list each arrive via BroadcastExchange, never a
  *      shuffle of the data side, and a no-delete snapshot plans with ZERO
  *      join overhead;
  *   3. Merge-on-read upsert writes O(batch) — the commit adds exactly the
  *      batch's files plus one tiny eq-delete dir; pre-existing data files
  *      carry over by reference (paths identical).
  */
object PlansR8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val orders = Testdata.table(spark, dir, "orders")

    println("=== renamed-column pushdown (want DataFilters on the PHYSICAL name) ===")
    val t = Icebox(java.nio.file.Files.createTempDirectory("plans-r8").toString)
    t.append(orders.repartitionByRange(4, col("o_orderkey")))
    t.renameColumn("o_totalprice", "price")
    t.readIndexed(spark).filter(col("price") > 500000.0).select("o_orderkey", "price")
      .explain("formatted")

    println("=== equality-delete read (want BroadcastHashJoin x2, no data shuffle) ===")
    t.deleteByKeys(spark.range(1, 50).selectExpr("id * 7 AS o_orderkey"))
    t.read(spark).explain("formatted")

    println("=== merge-on-read upsert write footprint ===")
    val before = t.currentSnapshot.get.files.map(_.path).toSet
    t.setProperties(Map("write.upsert.mode" -> "merge-on-read"))
    val batch = t.read(spark).filter(col("o_orderkey") % 100 === 1)
      .withColumn("price", lit(0.0))
    graft.operators.Upsert.intoTable(t, batch, Seq("o_orderkey"))
    val after = t.currentSnapshot.get.files
    println(s"[mor-upsert] pre-existing files carried by reference: " +
      s"${before.subsetOf(after.map(_.path).toSet)}; " +
      s"new files: ${after.count(f => !before(f.path))}; " +
      s"eq-delete attached to ${after.count(_.eqDeletes.nonEmpty)} of ${after.size} files")
    spark.stop()
  }
}
