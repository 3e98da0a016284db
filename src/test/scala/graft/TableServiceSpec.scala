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

  test("auto-freshness: stats serve again after commit -> tick, no manual config") {
    val t = Icebox(tmpDir("svc-auto"))
    t.append((1L to 3000L).map(i => (i, (i % 400).toDouble)).toDF("id", "v"),
      collectStats = Seq("v"))
    // one-time ANALYZE + histogram — and NO maintenance.analyze.* config
    t.analyze(spark, Seq("v"))
    t.analyzeHistogram(spark, "v", buckets = 16)
    t.approxCountDistinctMeta("v").isDefined shouldBe true
    t.histogramMeta("v").isDefined shouldBe true
    // head moves: snapshot-keyed stats stop serving
    t.append((3001L to 3600L).map(i => (i, (i % 400).toDouble)).toDF("id", "v"))
    t.histogramMeta("v") shouldBe None
    val snapsBefore = t.allSnapshots.size
    val r = TableService.tick(spark, t)
    // ...and one tick brings them back: the sticky sketch set re-analyzes,
    // the ever-built histogram rebuilds at its own 16-bucket resolution
    r.analyzedColumns shouldBe Seq("v")
    r.histogramColumns shouldBe Seq("v")
    t.approxCountDistinctMeta("v").isDefined shouldBe true
    val (_, _, counts) = t.histogramMeta("v").get
    counts.length shouldBe 16
    counts.sum shouldBe 3600L
    // bounded work: the NDV path was metadata-only (the append sketched
    // its own files inline — no analyze commit beyond the tick's own work)
    (t.allSnapshots.size - snapsBefore) should be <= 1
    // fresh stats: the next tick re-analyzes nothing
    val r2 = TableService.tick(spark, t)
    r2.analyzedColumns shouldBe Nil
    r2.histogramColumns shouldBe Nil
    // opt-out honored
    t.append((3601L to 3700L).map(i => (i, 1.0)).toDF("id", "v"))
    t.setProperties(Map("maintenance.analyze.auto" -> "false"))
    val r3 = TableService.tick(spark, t)
    r3.analyzedColumns shouldBe Nil
    r3.histogramColumns shouldBe Nil
    t.histogramMeta("v") shouldBe None // stale and (by policy) left alone
    t.removeProperties(Seq("maintenance.analyze.auto"))
    TableService.tick(spark, t).histogramColumns shouldBe Seq("v")
  }

  test("auto-freshness lag gate: below lag-commits the tick leaves stats alone") {
    val t = Icebox(tmpDir("svc-lag"))
    t.append((1L to 1000L).map(i => (i, (i % 100).toDouble)).toDF("id", "v"),
      collectStats = Seq("v"))
    t.analyze(spark, Seq("v"))
    t.setProperties(Map("maintenance.analyze.lag-commits" -> "3"))
    t.append((1001L to 1100L).map(i => (i, 1.0)).toDF("id", "v")) // 1 behind
    TableService.tick(spark, t).analyzedColumns shouldBe Nil
    t.append((1101L to 1200L).map(i => (i, 2.0)).toDF("id", "v")) // 2 behind
    TableService.tick(spark, t).analyzedColumns shouldBe Nil
    t.append((1201L to 1300L).map(i => (i, 3.0)).toDF("id", "v")) // 3 behind: trip
    TableService.tick(spark, t).analyzedColumns shouldBe Seq("v")
    t.approxCountDistinctMeta("v").isDefined shouldBe true
  }
}
