package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some(2.0), Some("b")),
    (2L, Some(4.0), Some("a")),
    (3L, None, Some("a")),
    (4L, Some(6.0), None)
  ).toDF("id", "x", "s")

  test("exact profile: counts, nulls, distincts, min/max/mean per column") {
    val p = Profile.profile(df, exact = true).orderBy("column").collect()
    val byCol = p.map(r => r.getString(0) -> r).toMap
    val id = byCol("id")
    (id.getLong(1), id.getLong(2), id.getLong(3)) shouldBe ((4L, 0L, 4L))
    id.getDouble(4) shouldBe 1.0
    id.getDouble(5) shouldBe 4.0
    id.getDouble(6) shouldBe 2.5
    id.isNullAt(7) shouldBe true
    val x = byCol("x")
    (x.getLong(1), x.getLong(2), x.getLong(3)) shouldBe ((4L, 1L, 3L))
    x.getDouble(6) shouldBe 4.0
    val s = byCol("s")
    (s.getLong(2), s.getLong(3)) shouldBe ((1L, 2L))
    s.isNullAt(4) shouldBe true
    (s.getString(7), s.getString(8)) shouldBe (("a", "b"))
  }

  test("column subset and unknown-column error") {
    Profile.profile(df, Seq("id")).collect().map(_.getString(0)) shouldBe Array("id")
    an[IllegalArgumentException] should be thrownBy
      Profile.profile(df, Seq("nope")).collect()
  }

  test("mean is deterministic under repartitioning (decimal sum)") {
    val big = (1 to 10000).map(i => i.toDouble / 3.0).toDF("v")
    val a = Profile.profile(big.repartition(1), exact = true).head().getDouble(6)
    val b = Profile.profile(big.repartition(32), exact = true).head().getDouble(6)
    a shouldBe b
  }

  test("one pass: a single aggregate over the scan, pivot inside the plan") {
    val p = Profile.profile(df, exact = false)
    val physical = p.queryExecution.executedPlan.toString
    // approx mode: no Expand, exactly one aggregate pair over one scan
    physical should not include "Expand"
    "HashAggregate|ObjectHashAggregate".r.findAllIn(physical).size should be <= 4
    p.count() shouldBe 3L
  }

  test("profileAuto: exact at/below threshold, HLL above, manifest count is free") {
    val big = (1 to 500).map(i => (i.toLong, s"s$i")).toDF("id", "s")
    // below threshold: exact distincts — plan carries the Expand of the
    // exact-distinct rewrite over >1 profiled column
    val exactPlan = Profile.profileAuto(big, threshold = 1000)
      .queryExecution.executedPlan.toString
    exactPlan should include ("Expand")
    // above threshold: HLL — no Expand, and distincts are approximate
    val hll = Profile.profileAuto(big, threshold = 100)
    hll.queryExecution.executedPlan.toString should not include "Expand"
    // a supplied row count skips the df.count() pre-pass and decides alone
    val known = Profile.profileAuto(big, threshold = 1000, knownRows = Some(10_000_000L))
    known.queryExecution.executedPlan.toString should not include "Expand"
    // Icebox overload: the manifest row count decides with zero I/O
    val t = graft.table.Icebox(tmpDir("prof-auto"))
    t.append(big)
    Profile.profileAuto(spark, t, Seq("id"), threshold = 1000)
      .head().getLong(3) shouldBe 500L // exact regime: precise distinct
    Profile.profileAuto(spark, t, Seq("id"), threshold = 10)
      .queryExecution.executedPlan.toString should not include "Expand"
  }

  test("timestamp columns render min/max through str_min/str_max") {
    val t = Seq("2024-01-02 03:04:05", "2024-06-07 08:09:10")
      .toDF("ts_s").select(to_timestamp(col("ts_s")).as("ts"))
    val p = Profile.profile(t, exact = true).head()
    p.getString(7) should startWith ("2024-01-02 03:04:05")
    p.getString(8) should startWith ("2024-06-07 08:09:10")
  }
}
