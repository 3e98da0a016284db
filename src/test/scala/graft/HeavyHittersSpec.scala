package graft

import graft.functions.HeavyHitters
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def itemsDf(items: Seq[String], parts: Int = 8) =
    items.toDF("w").repartition(parts)

  test("exact when capacity >= distinct items, sorted by (count desc, item)") {
    val items = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d")
    val out = itemsDf(items)
      .agg(HeavyHitters.summary(spark, col("w"), 16).as("hh"))
      .head().getSeq[Row](0)
    out.map(r => (r.getString(0), r.getLong(1))) shouldBe
      Seq(("a", 5L), ("b", 3L), ("c", 3L), ("d", 1L))
  }

  test("MG lower-bound guarantee under tight capacity across partitions") {
    // 600 a, 300 b, 100 distinct noise items; N=1000, capacity 9 ->
    // undercount <= N/(cap+1) = 100
    val noise = (0 until 100).map(i => s"n$i")
    val items = Seq.fill(600)("a") ++ Seq.fill(300)("b") ++ noise
    val out = itemsDf(items, parts = 16)
      .agg(HeavyHitters.summary(spark, col("w"), 9).as("hh"))
      .head().getSeq[Row](0)
    val m = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    out.length should be <= 9
    // every reported count is a lower bound within N/(cap+1)
    m("a") should be <= 600L
    m("a") should be >= 500L
    m("b") should be <= 300L
    m("b") should be >= 200L
  }

  test("merge trims to capacity and survives serialization round-trips") {
    // force many partial buffers with disjoint keys so merges must trim
    val items = (0 until 2000).map(i => s"k${i % 40}")
    val out = itemsDf(items, parts = 32)
      .agg(HeavyHitters.summary(spark, col("w"), 10).as("hh"))
      .head().getSeq[Row](0)
    out.length should be <= 10
    // uniform 50-count keys under capacity 10: all reports <= true count
    out.foreach(r => r.getLong(1) should be <= 50L)
  }

  test("groupBy heavy hitters and topK slice") {
    val df = Seq(("en", "x"), ("en", "x"), ("en", "y"), ("fr", "z"))
      .toDF("lang", "w")
    val out = df.groupBy("lang")
      .agg(HeavyHitters.topK(spark, col("w"), 1, 8).as("hh"))
      .orderBy("lang").collect()
    out(0).getSeq[Row](1).map(r => (r.getString(0), r.getLong(1))) shouldBe Seq(("x", 2L))
    out(1).getSeq[Row](1).map(r => (r.getString(0), r.getLong(1))) shouldBe Seq(("z", 1L))
  }

  test("nulls are ignored; SQL surface works") {
    HeavyHitters.register(spark)
    Seq(Some("a"), None, Some("a"), Some("b")).toDF("w")
      .createOrReplaceTempView("hh_in")
    val out = spark.sql(
      "SELECT graft_heavy_hitters(w, 4) AS hh FROM hh_in")
      .head().getSeq[Row](0)
    out.map(r => (r.getString(0), r.getLong(1))) shouldBe Seq(("a", 2L), ("b", 1L))
  }

  test("plan shows partial aggregation before the shuffle") {
    val df = itemsDf(Seq("a", "b", "a"), parts = 4)
      .agg(HeavyHitters.summary(spark, col("w"), 4).as("hh"))
    val physical = df.queryExecution.executedPlan.toString
    // ObjectHashAggregate partial_ + final pair: summary merges map-side
    physical should include ("partial_graft_heavy_hitters")
  }
}
