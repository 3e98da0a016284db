package graft

import graft.table.{Icebox, TableService}
import org.apache.spark.sql.functions._

class TableServiceSpec extends SparkSpec {
  import spark.implicits._

  test("tick compacts an unpartitioned table over the file threshold, data intact") {
    val t = Icebox(tmpDir("svc-compact"))
    (1 to 6).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("id", "s")))
    t.setProperties(Map("maintenance.compact.min-files" -> "4"))
    t.currentSnapshot.get.files.size should be > 4
    val r = TableService.tick(spark, t)
    r.compactedWholeTable shouldBe true
    t.currentSnapshot.get.files.size should be <= 4
    t.read(spark).select("id").as[Long].collect().sorted shouldBe (1L to 6L).toArray
    // second tick: under threshold now, touches nothing
    TableService.tick(spark, t).actedOnData shouldBe false
  }

  test("tick compacts only hot partitions of a partitioned table") {
    val t = Icebox(tmpDir("svc-parts"))
    // partition a: 5 single-row files; partition b: 1 file
    (1 to 5).foreach(i =>
      t.append(Seq((i.toLong, "a")).toDF("id", "p"), Seq("p")))
    t.append(Seq((100L, "b")).toDF("id", "p"), Seq("p"))
    t.setProperties(Map("maintenance.compact.min-files" -> "3"))
    val bFiles = t.currentSnapshot.get.files.filter(_.partition("p") == "b").map(_.path)
    val r = TableService.tick(spark, t)
    r.compactedPartitions.flatMap(_.get("p")) should contain ("a")
    // cold partition files untouched byte-for-byte (same paths)
    t.currentSnapshot.get.files.filter(_.partition("p") == "b")
      .map(_.path) shouldBe bFiles
    t.read(spark).count() shouldBe 6L
  }

  test("tick expires old snapshots per policy, honoring retain-last") {
    val t = Icebox(tmpDir("svc-expire"))
    (1 to 6).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("id", "s")))
    t.setProperties(Map(
      "maintenance.compact.min-files" -> "100",   // no compaction
      "maintenance.expire.max-age-ms" -> "0",     // everything is too old
      "maintenance.expire.retain-last" -> "2"))
    val r = TableService.tick(spark, t, nowMs = System.currentTimeMillis() + 10000)
    r.expiredSnapshots.size shouldBe 4
    t.read(spark).count() shouldBe 6L
  }

  test("tick refreshes a materialized-view target from its persisted definition") {
    import graft.sql.DmlSql
    val wh = tmpDir("svc-mv-wh")
    DmlSql.setWarehouse(wh)
    val src = Icebox(tmpDir("svc-mv-src"))
    src.append((1 to 60).map(i => (i.toLong, i % 3, i * 2L)).toDF("id", "g", "v"))
    src.registerView(spark, "svc_mv_src")
    DmlSql.run(spark,
      "CREATE MATERIALIZED VIEW svc_mv AS SELECT g, sum(v) FROM svc_mv_src GROUP BY g")
    val mv = Icebox.table(wh, "_mv", "svc_mv")
    // source moves; a maintenance tick on the TARGET refreshes incrementally
    src.append(Seq((61L, 0, 500L)).toDF("id", "g", "v"))
    TableService.tick(spark, mv).mvRefresh shouldBe Some("Incremental")
    assertSameRows(mv.read(spark),
      src.read(spark).groupBy("g").agg(count(lit(1)).as("row_count"),
        sum($"v").as("sum_v"), count($"v").as("nn_v")))
    // source unchanged: the tick is cursor-exact, no new commit
    val snaps = mv.allSnapshots.size
    TableService.tick(spark, mv).mvRefresh shouldBe Some("NoOp")
    mv.allSnapshots.size shouldBe snaps
  }

  test("maintenance.enabled=false and absent tables are no-ops") {
    val t = Icebox(tmpDir("svc-disabled"))
    TableService.tick(spark, t) shouldBe TableService.Noop   // absent
    (1 to 6).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("id", "s")))
    t.setProperties(Map(
      "maintenance.enabled" -> "false",
      "maintenance.compact.min-files" -> "1"))
    TableService.tick(spark, t) shouldBe TableService.Noop
    t.currentSnapshot.get.files.size should be > 1
  }

  test("auto-stats tick keeps the NDV index and histograms fresh for the CBO bridge") {
    val t = Icebox(tmpDir("svc-stats"))
    t.append((1L to 4000L).map(i => (i, (i % 500).toDouble)).toDF("id", "v"),
      collectStats = Seq("v"))
    t.setProperties(Map(
      "maintenance.analyze.columns" -> "v",
      "maintenance.analyze.histogram" -> "true",
      "maintenance.analyze.histogram.buckets" -> "8"))
    val r1 = TableService.tick(spark, t)
    r1.analyzedColumns shouldBe Seq("v")
    r1.histogramColumns shouldBe Seq("v")
    val ndv1 = t.approxCountDistinctMeta("v").get
    math.abs(ndv1 - 500).toDouble / 500 should be < 0.05
    t.histogramMeta("v").get._3.sum shouldBe 4000L
    // an append stales both; the NEXT tick refreshes them — O(delta) for
    // the sketches (the append sketched its own files inline), one scan
    // for the opted-in histogram
    t.append((4001L to 5000L).map(i => (i, (i % 800).toDouble)).toDF("id", "v"))
    t.histogramMeta("v") shouldBe None // stale, loudly absent
    val r2 = TableService.tick(spark, t)
    r2.histogramColumns shouldBe Seq("v")
    t.histogramMeta("v").get._3.sum shouldBe 5000L
    val ndv2 = t.approxCountDistinctMeta("v").get
    math.abs(ndv2 - 800).toDouble / 800 should be < 0.05
    // a fresh histogram short-circuits: nothing rebuilt on an idle tick
    val r3 = TableService.tick(spark, t)
    r3.histogramColumns shouldBe Nil
    r3.analyzedColumns shouldBe Seq("v") // metadata-only re-fold, 0 files
  }
}
