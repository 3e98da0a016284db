package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Resample

/** Resample + gap fill: bucket aggregation, grid densification between
  * each key's first and last bucket, zero-count gap rows, forward fill
  * across gaps, and the linear-interpolation variant.
  */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    // key "a": observations on hours 0, 1, 4 (gap at 2, 3)
    ("a", ts("2024-01-01 00:10:00"), 10.0),
    ("a", ts("2024-01-01 00:50:00"), 30.0),
    ("a", ts("2024-01-01 01:15:00"), 20.0),
    ("a", ts("2024-01-01 04:05:00"), 50.0),
    // key "b": single bucket
    ("b", ts("2024-01-01 02:30:00"), 7.0)
  ).toDF("k", "t", "v")

  test("buckets aggregate, gaps densify with zero counts, forward fill carries the last value") {
    val out = Resample.resample(events, "t", "k", "v", "hour")
      .orderBy("k", "bucket_ts").collect()
    val a = out.filter(_.getString(0) == "a")
    a.length shouldBe 5 // hours 0..4 inclusive — gap hours materialized
    a.map(_.getLong(2)).toSeq shouldBe Seq(2L, 1L, 0L, 0L, 1L)
    // bucket 0: min 10 max 30; gap rows carry null min but filled=last seen
    a(0).getDouble(4) shouldBe 10.0 // min_v
    a(0).getDouble(5) shouldBe 30.0 // max_v
    assert(a(2).isNullAt(4) && a(3).isNullAt(4))
    a.map(_.getDouble(6)).toSeq shouldBe Seq(10.0, 20.0, 20.0, 20.0, 50.0)
    out.filter(_.getString(0) == "b").length shouldBe 1
  }

  test("linear interpolation fills gaps proportionally; edges fall back to nearest") {
    val out = Resample.resampleFilled(events, "t", "k", "v", "hour", "linear")
      .orderBy("k", "bucket_ts").collect()
    val a = out.filter(_.getString(0) == "a")
    // observed mins: h0=10, h1=20, h4=50; gaps h2,h3 interpolate 20→50
    a.map(_.getDouble(6)).toSeq shouldBe Seq(10.0, 20.0, 30.0, 40.0, 50.0)
  }

  test("day unit matches an independent recompute on real events") {
    val ev = graft.sources.Testdata.table(spark, "/root/testdata/sf0.001", "events")
    val out = Resample.resample(ev, "ts", "user_id", "value", "day")
    // grid is dense: per user, count(buckets) == span(days)+1, monotone steps
    val spans = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        (datediff(max($"bucket_ts"), min($"bucket_ts")) + 1).as("expect"))
    spans.filter($"n" =!= $"expect").count() shouldBe 0L
    // observed buckets agree with a direct aggregate
    val direct = ev.groupBy($"user_id", date_trunc("day", $"ts").as("bucket_ts"))
      .agg(count(lit(1)).as("row_count"), min($"value").as("min_value"),
        max($"value").as("max_value"))
    assertSameRows(
      out.filter($"row_count" > 0)
        .select($"user_id", $"bucket_ts", $"row_count", $"min_value", $"max_value"),
      direct)
  }
}
