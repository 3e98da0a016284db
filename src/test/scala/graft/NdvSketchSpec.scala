package graft

import org.apache.spark.sql.functions._
import graft.functions.Hll
import graft.table.Icebox

/** Manifest NDV index: per-file HyperLogLog sketches (ANALYZE TABLE),
  * table-level rollups, metadata-only approximate COUNT(DISTINCT), and the
  * soundness refusals (uncovered files, pending merge-on-read deletes).
  */
class NdvSketchSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- Hll core

  test("Hll estimates within 3 sigma across magnitudes; deterministic bytes") {
    for (n <- Seq(100, 10000, 500000)) {
      val s = Hll.empty(12)
      var i = 0
      while (i < n) {
        // scramble: distinct longs through a 64-bit finalizer so register
        // indices are uniform (raw sequential longs are not a hash)
        var h = i.toLong * -7046029254386353131L
        h ^= h >>> 32; h *= -4417276706812531889L; h ^= h >>> 29
        Hll.add(s, h); i += 1
      }
      val est = Hll.estimate(s)
      val sigma = 1.04 / math.sqrt(4096) * n
      math.abs(est - n).toDouble should be <= math.max(3 * sigma, 3.0)
      // same values again -> byte-identical sketch (content addressing)
      val s2 = Hll.empty(12)
      i = 0
      while (i < n) {
        var h = i.toLong * -7046029254386353131L
        h ^= h >>> 32; h *= -4417276706812531889L; h ^= h >>> 29
        Hll.add(s2, h); i += 1
      }
      s2 shouldBe s
    }
  }

  test("Hll merge equals union; merge is associative-commutative on registers") {
    def filled(range: Range): Array[Byte] = {
      val s = Hll.empty(12)
      range.foreach { i =>
        var h = i.toLong * -7046029254386353131L
        h ^= h >>> 32; h *= -4417276706812531889L; h ^= h >>> 29
        Hll.add(s, h)
      }
      s
    }
    val a = filled(0 until 3000)
    val b = filled(2000 until 6000) // overlaps a
    val union = filled(0 until 6000)
    val merged = Hll.merge(a.clone(), b)
    merged shouldBe union // register-exact, not just estimate-close
    Hll.merge(b.clone(), filled(0 until 3000)) shouldBe union
  }

  // ------------------------------------------------- ANALYZE + estimates

  private def docsDf(n: Int, keyMod: Int, off: Int = 0) =
    (0 until n).map(i => ((i + off).toLong, ((i + off) % keyMod).toLong, s"s${(i + off) % 7}"))
      .toDF("id", "k", "src").repartition(4, col("id"))

  test("analyze sketches every live file; approxCountDistinctMeta lands within 5%") {
    val t = Icebox(tmpDir("ndv1"))
    t.append(docsDf(20000, 1000))
    t.analyze(spark, Seq("id", "k", "src"))
    val fs = t.currentSnapshot.get.files
    fs.foreach { f =>
      f.sketches.keySet shouldBe Set("id", "k", "src")
    }
    val id = t.approxCountDistinctMeta("id").get
    math.abs(id - 20000).toDouble / 20000 should be < 0.05
    val k = t.approxCountDistinctMeta("k").get
    math.abs(k - 1000).toDouble / 1000 should be < 0.05
    t.approxCountDistinctMeta("src").get shouldBe 7 // linear-counting regime: near-exact
    // un-analyzed column refuses
    t.approxCountDistinctMeta("nope") shouldBe None
  }

  test("sticky: commits after ANALYZE sketch their own files; estimate tracks appends") {
    val t = Icebox(tmpDir("ndv2"))
    t.append(docsDf(5000, 400))
    t.analyze(spark, Seq("k"))
    val analyzedAt = t.currentSnapshotId
    t.append(docsDf(5000, 400, off = 5000)) // k values 0..399 again + same mod
    // the append's files carry sketches WITHOUT a second analyze
    val newFiles = t.currentSnapshot.get.files.filterNot(
      t.snapshot(analyzedAt).files.map(_.path).toSet contains _.path)
    newFiles should not be empty
    newFiles.foreach(f => f.sketches.keySet should contain("k"))
    // fold over per-file sketches still answers (rollup is stale, fold path)
    val est = t.approxCountDistinctMeta("k").get
    math.abs(est - 400).toDouble / 400 should be < 0.05
  }

  test("rollup refresh is incremental under appends and survives compaction") {
    val t = Icebox(tmpDir("ndv3"))
    t.append(docsDf(8000, 2000))
    t.analyze(spark, Seq("id"))
    t.properties.keys.exists(_.startsWith("sketch.ndv.rollup.")) shouldBe true
    t.append(docsDf(8000, 2000, off = 8000))
    t.analyze(spark, Seq("id")) // re-fold: old rollup + new files only
    val est = t.approxCountDistinctMeta("id").get
    math.abs(est - 16000).toDouble / 16000 should be < 0.05
    // compaction rewrites files (row content unchanged): sticky columns
    // re-sketch the compacted files, analyze re-folds, estimate holds
    t.compact(spark)
    t.currentSnapshot.get.files.foreach(f => f.sketches.keySet should contain("id"))
    t.analyze(spark, Seq("id"))
    val est2 = t.approxCountDistinctMeta("id").get
    math.abs(est2 - 16000).toDouble / 16000 should be < 0.05
  }

  test("pending merge-on-read deletes refuse the metadata answer; CoW rewrite re-enables") {
    val t = Icebox(tmpDir("ndv4"))
    t.setProperties(Map("write.delete.mode" -> "merge-on-read"))
    t.append(docsDf(4000, 4000))
    t.analyze(spark, Seq("id"))
    t.approxCountDistinctMeta("id") should not be None
    graft.sql.MergeSql.register("ndv4t", t)
    graft.sql.DmlSql.delete(spark, "DELETE FROM ndv4t WHERE id < 1000")
    t.currentSnapshot.get.files.exists(f =>
      f.deletes.nonEmpty || f.eqDeletes.nonEmpty) shouldBe true
    t.approxCountDistinctMeta("id") shouldBe None // removed values would still count
    // compaction materializes the deletes -> new sketch-covered files
    t.compact(spark)
    t.analyze(spark, Seq("id"))
    val est = t.approxCountDistinctMeta("id").get
    math.abs(est - 3000).toDouble / 3000 should be < 0.05
  }

  test("histogram: exact fixed-bound bucket counts; stale after commit; re-analyze refreshes") {
    val t = Icebox(tmpDir("hist1"))
    t.append((1 to 1000).map(i => (i.toLong, (i % 97).toDouble)).toDF("id", "v"),
      collectStats = Seq("v"))
    t.analyzeHistogram(spark, "v", buckets = 8)
    val (lo, hi, cnts) = t.histogramMeta("v").get
    lo shouldBe 0.0; hi shouldBe 96.0
    cnts.sum shouldBe 1000L
    // exact: recompute the same buckets directly
    val w = (hi - lo) / 8
    val direct = t.read(spark).groupBy(
      greatest(least(floor((col("v") - lo) / w), lit(7L)), lit(0L)).as("b"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cnts.zipWithIndex.foreach { case (c, b) => c shouldBe direct.getOrElse(b.toLong, 0L) }
    // staleness: a commit invalidates; re-analyze serves again
    t.append(Seq((2000L, 5.0)).toDF("id", "v"))
    t.histogramMeta("v") shouldBe None
    t.analyzeHistogram(spark, "v", buckets = 8)
    t.histogramMeta("v").get._3.sum shouldBe 1001L
    // constant column: one bucket holds everything
    val c = Icebox(tmpDir("hist2"))
    c.append((1 to 50).map(i => (i.toLong, 7.0)).toDF("id", "v"), collectStats = Seq("v"))
    c.analyzeHistogram(spark, "v", buckets = 4)
    c.histogramMeta("v").get._3.head shouldBe 50L
    // no stats -> loud refusal
    val n = Icebox(tmpDir("hist3"))
    n.append((1 to 10).map(i => (i.toLong, s"x$i")).toDF("id", "s"))
    intercept[RuntimeException](n.analyzeHistogram(spark, "s", 4))
  }

  test("SQL verbs: ANALYZE TABLE + SHOW STATS FOR; expiry GCs dead sketch files") {
    val dir = tmpDir("ndv5")
    val t = Icebox(dir)
    t.append(docsDf(3000, 300))
    graft.sql.MergeSql.register("ndv5t", t)
    graft.sql.DmlSql.run(spark, "ANALYZE TABLE ndv5t COMPUTE STATISTICS FOR COLUMNS id, k")
    val rows = graft.sql.DmlSql.run(spark, "SHOW STATS FOR ndv5t").collect()
      .map(r => r.getString(0) -> r).toMap
    // every stats-covered column lists; un-sketched ones carry null ndv
    rows.keySet shouldBe Set("id", "k", "src")
    val ndv = rows.view.mapValues(r =>
      if (r.isNullAt(1)) None else Some(r.getLong(1))).toMap
    math.abs(ndv("id").get - 3000).toDouble / 3000 should be < 0.05
    math.abs(ndv("k").get - 300).toDouble / 300 should be < 0.05
    ndv("src") shouldBe None // footer stats only — no sketch, loud null
    // the bridge's full surface: exact null counts, min/max, histogram flag
    rows("id").getLong(2) shouldBe 0L                   // null_count
    rows("id").getString(3) shouldBe "0"                // min
    rows("id").getString(4) shouldBe "2999"             // max
    rows("id").getBoolean(5) shouldBe false             // no histogram yet
    rows("src").getString(3) shouldBe "s0"              // UTF8 string fold
    rows("src").getString(4) shouldBe "s6"
    // overwrite drops the old files; expiry with no retention should GC
    // their sketch side files but keep live ones
    t.overwrite(docsDf(1000, 100))
    t.analyze(spark, Seq("id", "k"))
    val live = t.currentSnapshot.get.files.flatMap(_.sketches.values).toSet ++
      t.properties.collect { case (k0, v) if k0.startsWith("sketch.ndv.rollup.") =>
        v.split(':')(1) }
    t.expireSnapshots(System.currentTimeMillis() + 1000, retainLast = 1)
    val onDisk = new java.io.File(s"$dir/_snapshots/sketches").listFiles()
      .map(_.getName).filter(_.endsWith(".hll")).map(_.stripSuffix(".hll")).toSet
    live.subsetOf(onDisk) shouldBe true // live shas survive
    (onDisk -- live) shouldBe empty     // dead shas gone
  }

  test("ANALYZE builds histograms under the conf, Spark's own semantics") {
    val t = Icebox(tmpDir("ndv6"))
    t.append(docsDf(2000, 200), collectStats = Seq("id"))
    graft.sql.MergeSql.register("ndv6t", t)
    // off by default: no histogram property lands
    graft.sql.DmlSql.run(spark, "ANALYZE TABLE ndv6t COMPUTE STATISTICS FOR COLUMNS id")
    t.histogramMeta("id") shouldBe None
    // the spark.sql.statistics.histogram.enabled analog
    spark.conf.set("spark.graft.stats.histogram.enabled", "true")
    spark.conf.set("spark.graft.stats.histogram.numBins", "16")
    try {
      graft.sql.DmlSql.run(spark, "ANALYZE TABLE ndv6t COMPUTE STATISTICS FOR COLUMNS id, src")
      val (lo, hi, counts) = t.histogramMeta("id").get
      counts.length shouldBe 16
      counts.sum shouldBe 2000L
      lo should be <= 1.0
      hi should be >= 1999.0
      // `src` is a string column — no numeric min/max anchor, silently
      // skipped (Spark skips unsupported types the same way)
      t.histogramMeta("src") shouldBe None
    } finally {
      spark.conf.unset("spark.graft.stats.histogram.enabled")
      spark.conf.unset("spark.graft.stats.histogram.numBins")
    }
  }
}
