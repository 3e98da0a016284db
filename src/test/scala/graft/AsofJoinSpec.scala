package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, RangeJoin}

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks the latest right row at or before each left timestamp") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:30:00"), 200.0)
    ).toDF("key", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00"), "t1"),  // matches 10:00 quote
      (1L, ts("2024-01-01 11:00:00"), "t2"),  // equal ts → matches 11:00 (<= semantics)
      (2L, ts("2024-01-01 10:00:00"), "t3"),  // before any quote → null
      (3L, ts("2024-01-01 12:00:00"), "t4")   // no quotes for key → null
    ).toDF("key", "tts", "trade")
    val out = AsofJoin.asof(trades, quotes.withColumn("qid", monotonically_increasing_id()),
      "key", "tts", "qts", "qid", Seq("price"))
      .orderBy("trade").collect()
    out.map(r => (r.getString(2), if (r.isNullAt(3)) null else r.getDouble(3))).toSeq shouldBe
      Seq(("t1", 100.0), ("t2", 110.0), ("t3", null), ("t4", null))
  }

  test("asof ties on right timestamp resolve to the greatest tie-break value") {
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 5L, "low"),
      (1L, ts("2024-01-01 10:00:00"), 9L, "high")).toDF("key", "rts", "rid", "v")
    val left = Seq((1L, ts("2024-01-01 10:01:00"), "x")).toDF("key", "lts", "name")
    val out = AsofJoin.asof(left, right, "key", "lts", "rts", "rid", Seq("v"))
    out.select("v").as[String].collect() shouldBe Array("high")
  }

  test("asof payload rides as a typed struct — no JSON codec in the plan") {
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 1L, "v", 2.5)).toDF("key", "rts", "rid", "s", "d")
    val left = Seq((1L, ts("2024-01-01 10:01:00"))).toDF("key", "lts")
    val out = AsofJoin.asof(left, right, "key", "lts", "rts", "rid", Seq("s", "d"))
    val plan = out.queryExecution.optimizedPlan.toString.toLowerCase
    plan should not include "to_json"
    plan should not include "from_json"
    // payload columns keep their original types (string round-trip would widen/stringify)
    out.schema("d").dataType.typeName shouldBe "double"
    out.collect().map(r => (r.getString(2), r.getDouble(3))).toSeq shouldBe Seq(("v", 2.5))
  }

  test("range join equals the naive non-equi join") {
    val points = Seq((1L, 5.0), (2L, 15.0), (3L, 25.0), (4L, 250.0)).toDF("pid", "x")
    val intervals = Seq((10L, 0.0, 10.0), (20L, 10.0, 20.0), (30L, 14.0, 30.0)).toDF("iid", "lo", "hi")
    val naive = points.join(intervals, $"x" >= $"lo" && $"x" <= $"hi")
    val binned = RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi", binSize = 7.0)
    canon(binned) shouldBe canon(naive)
    binned.count() shouldBe 4 // 5∈[0,10], 15∈[10,20], 15∈[14,30], 25∈[14,30]
  }
}
