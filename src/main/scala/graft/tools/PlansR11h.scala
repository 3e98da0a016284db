package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.sources.Testdata
import graft.table.Icebox

/** Round-11 evidence capture (output in PLANS.md): the two scan-side
  * exchange eliminations landed this round.
  *
  *  1. CO-BUCKETED JOIN: two tables bucket(32) on the join key read with a
  *     V1 BucketSpec — the join plans with zero ShuffleExchange; the same
  *     join over plain tables shuffles both sides. Timed at sf0.1.
  *  2. DYNAMIC PARTITION PRUNING: a dim-filtered star join reads only the
  *     fact partitions the filter names — file counts from the scan's own
  *     metrics after execution.
  */
object PlansR11h {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $label%-44s $s%8.2f s")
      s
    }
    def shuffles(df: DataFrame): Int =
      df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }.size

    // ---- 1. co-bucketed join vs shuffle join, sf0.1 ×8 ----
    // lineitem replicated ×8 (4.8M rows) so the join's shuffle moves real
    // bytes; the structural claim (exchange count, shuffle bytes) is what
    // scales to 100 TB — wall-clock at laptop scale is warm-cache noise.
    println("== co-bucketed join vs shuffle join (lineitem x8 ⋈ orders on orderkey, sf0.1) ==")
    val li = Testdata.table(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .crossJoin(spark.range(8).select($"id".as("rep")))
    val ord = Testdata.table(spark, sf, "orders")
      .select($"o_orderkey", $"o_orderstatus")

    val bli = Icebox(java.nio.file.Files.createTempDirectory("p11h-bli").toString)
    val bord = Icebox(java.nio.file.Files.createTempDirectory("p11h-bord").toString)
    timed("build: bucket(32) lineitem") {
      bli.appendTransformed(li.repartition(32), "bucket(32, l_orderkey)")
    }
    timed("build: bucket(32) orders") {
      bord.appendTransformed(ord.repartition(32), "bucket(32, o_orderkey)")
    }
    def agg(j: DataFrame): DataFrame =
      j.groupBy("o_orderstatus").agg(sum("l_quantity").as("sq"),
        sum("l_extendedprice").as("se"))

    def bucketed = agg(bli.readIndexed(spark)
      .join(bord.readIndexed(spark).hint("shuffle_merge"),
        $"l_orderkey" === $"o_orderkey"))
    def plain = agg(li.join(ord.hint("shuffle_merge"), $"l_orderkey" === $"o_orderkey"))
    println(s"  exchanges: bucketed=${shuffles(bucketed)} plain=${shuffles(plain)}")
    // a FRESH DataFrame per run: Spark keeps shuffle map outputs alive per
    // RDD lineage, so re-collecting the same instance measures only the
    // final stage (and collect() resets metrics first — a reused instance
    // reads back zeros)
    def shuffleBytes(df: DataFrame): Long =
      df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec =>
        e.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)
      }.sum
    bucketed.collect(); plain.collect() // warm file/footer caches
    def best3(mk: => DataFrame): (Double, Long) = (1 to 3).map { _ =>
      val df = mk
      val t0 = System.nanoTime(); df.collect()
      ((System.nanoTime() - t0) / 1e9, shuffleBytes(df))
    }.minBy(_._1)
    val (tb, bb) = best3(bucketed)
    val (tp, bp) = best3(plain)
    println(f"  co-bucketed join+agg  $tb%8.3f s   shuffle join+agg  $tp%8.3f s" +
      f"   ratio ${tb / tp}%.2fx")
    println(f"  shuffle bytes moved: bucketed=${bb / 1e6}%.1f MB " +
      f"plain=${bp / 1e6}%.1f MB — the bytes ARE the 100 TB cost")

    // ---- 2. DPP file counts, sf0.1 ----
    println("== dynamic partition pruning (orders partitioned by status, sf0.1) ==")
    val fact = Icebox(java.nio.file.Files.createTempDirectory("p11h-f").toString)
    fact.append(Testdata.table(spark, sf, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority", $"o_totalprice")
      .repartition(8), partitionBy = Seq("o_orderstatus"))
    val total = fact.currentSnapshot.get.files.size
    val dimT = Icebox(java.nio.file.Files.createTempDirectory("p11h-d").toString)
    dimT.append(Seq(("F", "archive"), ("O", "live"), ("P", "live")).toDF("status", "tier"))
    val q = fact.readIndexed(spark)
      .join(broadcast(dimT.readIndexed(spark)), $"o_orderstatus" === $"status")
      .filter($"tier" === "archive")
      .agg(count(lit(1)))
    q.collect()
    val scan = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec if s.relation.partitionSchema.nonEmpty => s
    }.head
    println(s"  fact files total=$total, read=${scan.metrics("numFiles").value} " +
      s"(runtime-pruned to the single 'F' partition)")
    spark.stop()
  }
}
