package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.table.{Icebox, Snapshot}

class IceboxSpec extends SparkSpec {
  import spark.implicits._

  private def sampleDf = Seq(
    (1L, "a", "2024-01-01", 10.5),
    (2L, "b", "2024-01-01", 20.0),
    (3L, "c", "2024-01-02", 30.25),
    (4L, "d", "2024-01-02", 40.0)
  ).toDF("id", "name", "dt", "amount")

  test("append then read round-trips rows") {
    val t = Icebox(tmpDir("icebox"))
    t.append(sampleDf)
    assertSameRows(t.read(spark), sampleDf)
    t.append(sampleDf.filter($"id" === 1))
    t.read(spark).count() shouldBe 5
  }

  test("repeated appends to an uppercase partition column are accepted") {
    val t = Icebox(tmpDir("icebox-ucase"))
    val df = Seq((1L, "x", "d1"), (2L, "y", "d2")).toDF("id", "v", "Dt")
    t.append(df, partitionBy = Seq("Dt"))
    t.append(df.withColumn("id", $"id" + 10), partitionBy = Seq("Dt"))
    t.read(spark).count() shouldBe 4
  }

  test("multi-commit table reads through ONE scan relation (no per-commit union)") {
    val t = Icebox(tmpDir("icebox"))
    (1 to 5).foreach(i => t.append(sampleDf.withColumn("id", $"id" + i * 10)))
    val plan = t.read(spark).queryExecution.optimizedPlan.toString
    plan should not include "Union"
    t.read(spark).count() shouldBe 20
  }

  test("partitioned append preserves string partition values verbatim (no type re-inference)") {
    val df = Seq((1L, "01"), (2L, "2024-01-01"), (3L, "01")).toDF("id", "code")
    val t = Icebox(tmpDir("icebox"))
    t.append(df, partitionBy = Seq("code"))
    val back = t.read(spark)
    back.schema("code").dataType.typeName shouldBe "string"
    back.filter($"code" === "01").count() shouldBe 2
    assertSameRows(back, df)
  }

  test("overwrite replaces content") {
    val t = Icebox(tmpDir("icebox"))
    t.append(sampleDf)
    t.overwrite(sampleDf.filter($"id" <= 2))
    t.read(spark).count() shouldBe 2
  }

  test("overwritePartitions replaces only touched partitions") {
    val t = Icebox(tmpDir("icebox"))
    t.append(sampleDf, partitionBy = Seq("dt"))
    val replacement = Seq((9L, "z", "2024-01-02", 99.0)).toDF("id", "name", "dt", "amount")
    t.overwritePartitions(replacement, Seq("dt"))
    val back = t.read(spark)
    back.count() shouldBe 3 // 2 untouched + 1 replacement
    back.filter($"dt" === "2024-01-02").select("id").as[Long].collect().toSet shouldBe Set(9L)
  }

  test("file-skipping stats prune files whose [min,max] misses the predicate range") {
    val t = Icebox(tmpDir("icebox-stats"))
    // three appends with disjoint id ranges → three files with disjoint stats
    t.append(sampleDf.filter($"id" <= 2), collectStats = Seq("id", "amount"))
    t.append(sampleDf.filter($"id" === 3), collectStats = Seq("id", "amount"))
    t.append(sampleDf.filter($"id" === 4), collectStats = Seq("id", "amount"))
    val all = t.currentSnapshot.get.files
    all.foreach(f => f.stats.keySet should contain allOf ("id", "amount"))
    // id in [3,3] must keep only the middle file
    val hit = t.prunedFilesByStats("id", Some(3.0), Some(3.0))
    hit.size shouldBe 1
    hit.head.stats("id") shouldBe ("3", "3")
    // reading through the pruned set + exact filter is correct
    t.readWhereStats(spark, "id", Some(3.0), Some(3.0))
      .filter($"id" === 3).count() shouldBe 1
    // half-open range: id >= 4
    t.prunedFilesByStats("id", Some(4.0), None).size shouldBe 1
    // stats survive the JSON round-trip (fresh handle re-reads the manifest);
    // amount <= 25 admits the two files holding amounts 10.5 and 20.0
    Icebox(t.tableDir).prunedFilesByStats("amount", None, Some(25.0)).size shouldBe 2
  }

  test("plain append records min/max for every footer-decodable column by default") {
    val t = Icebox(tmpDir("icebox-default-stats"))
    t.append(sampleDf) // no collectStats, no writer opt-in
    val files = t.currentSnapshot.get.files
    files should not be empty
    // id (long), name (string), dt (string), amount (double) are all footer-decodable
    files.foreach(_.stats.keySet should contain allOf ("id", "name", "dt", "amount"))
    val idStats = files.flatMap(_.stats.get("id"))
    idStats.map(_._1.toLong).min shouldBe 1L
    idStats.map(_._2.toLong).max shouldBe 4L
    val nameStats = files.flatMap(_.stats.get("name"))
    nameStats.map(_._1).min shouldBe "a"
    nameStats.map(_._2).max shouldBe "d"
  }

  test("footer-undecodable stat columns (timestamp) fall back to the data scan") {
    val t = Icebox(tmpDir("icebox-stats-ts"))
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-03-05 09:30:00"))
    ).toDF("id", "ts")
    t.append(df, collectStats = Seq("id", "ts"))
    val f = t.currentSnapshot.get.files
    f.foreach(_.stats.keySet shouldBe Set("id", "ts"))
    f.flatMap(_.stats.get("id")).map(_._1).min shouldBe "1"
    // timestamp stats come from the scan fallback: java value toString
    val tsStats = f.flatMap(_.stats.get("ts"))
    tsStats.map(_._1).min should startWith("2024-01-01")
    tsStats.map(_._2).max should startWith("2024-03-05")
  }

  test("compactSorted clusters files into disjoint ranges, enabling effective skipping") {
    val t = Icebox(tmpDir("icebox-sorted"))
    val big = spark.range(0, 400).selectExpr("id", "cast(id * 1.5 as double) as score")
    (0 until 4).foreach(i => t.append(big.filter($"id" % 4 === i)))
    t.compactSorted(spark, Seq("score"), numFiles = Some(4))
    val files = t.currentSnapshot.get.files
    files.foreach(_.stats.keySet should contain("score"))
    // ranges are (near-)disjoint: a narrow predicate prunes to a small subset
    val hit = t.prunedFilesByStats("score", Some(10.0), Some(20.0))
    hit.size should be < files.size
    assertSameRows(
      t.readWhereStats(spark, "score", Some(10.0), Some(20.0))
        .filter($"score".between(10.0, 20.0)),
      big.filter($"score".between(10.0, 20.0)))
  }

  test("compactSorted z-orders (numeric, string) pairs; string-only predicates skip files") {
    val t = Icebox(tmpDir("icebox-zstr"))
    val fruits = Seq("apple", "banana", "cherry", "date", "elder", "fig", "grape", "kiwi")
    val big = spark.range(0, 800).selectExpr("id",
      s"element_at(array(${fruits.map("'" + _ + "'").mkString(",")}), cast(id % 8 + 1 as int)) as fruit")
    (0 until 4).foreach(i => t.append(big.filter($"id" % 4 === i)))
    t.compactSorted(spark, Seq("id", "fruit"), numFiles = Some(8))
    val files = t.currentSnapshot.get.files
    files.foreach(_.stats.keySet shouldBe Set("id", "fruit"))
    // a string-only equality predicate skips files the interleave isolated
    val hit = t.prunedFilesByStatsString("fruit", Some("banana"), Some("banana"))
    hit.size should be < files.size
    // and the numeric column keeps its own locality too
    t.prunedFilesByStats("id", Some(10.0), Some(20.0)).size should be < files.size
    assertSameRows(t.readIndexed(spark).filter($"fruit" === "banana"),
      big.filter($"fruit" === "banana"))
  }

  test("changesSince reads only the delta files added after a snapshot") {
    val t = Icebox(tmpDir("icebox"))
    val s0 = t.append(sampleDf.filter($"id" <= 2))
    t.append(sampleDf.filter($"id" > 2))
    val delta = t.changesSince(spark, s0.id)
    assertSameRows(delta, sampleDf.filter($"id" > 2))
    // delta read only lists the added files, not the whole table
    t.changesSince(spark, t.currentSnapshotId).count() shouldBe 0
    t.changesSinceTime(spark, s0.timestampMs).count() shouldBe 2
  }

  test("time travel by snapshot id and rollback") {
    val t = Icebox(tmpDir("icebox"))
    val s0 = t.append(sampleDf.filter($"id" <= 2))
    t.append(sampleDf.filter($"id" > 2))
    t.read(spark).count() shouldBe 4
    t.readSnapshotId(spark, s0.id).count() shouldBe 2
    t.rollbackTo(s0.id)
    t.read(spark).count() shouldBe 2
    // history is append-only: rollback is its own snapshot
    t.currentSnapshot.get.operation shouldBe "rollback"
  }

  test("readAsOf returns the state at a timestamp") {
    val t = Icebox(tmpDir("icebox"))
    val s0 = t.append(sampleDf.filter($"id" <= 2))
    Thread.sleep(5)
    t.append(sampleDf.filter($"id" > 2))
    t.readAsOf(spark, s0.timestampMs).count() shouldBe 2
    t.readAsOf(spark, System.currentTimeMillis()).count() shouldBe 4
    t.readAsOf(spark, s0.timestampMs - 1000).count() shouldBe 0
  }

  test("cherry-pick re-applies an append's delta") {
    val t = Icebox(tmpDir("icebox"))
    t.append(sampleDf.filter($"id" === 1))
    val s1 = t.append(sampleDf.filter($"id" === 2))
    t.rollbackTo(0L)
    t.read(spark).count() shouldBe 1
    t.cherrypick(s1.id)
    assertSameRows(t.read(spark), sampleDf.filter($"id" <= 2))
  }

  test("compact preserves the row multiset and reduces file count") {
    val t = Icebox(tmpDir("icebox"))
    (1 to 6).foreach(_ => t.append(sampleDf))
    val before = t.currentSnapshot.get.files.size
    t.compact(spark, targetFileMb = 512)
    val after = t.currentSnapshot.get.files.size
    after should be < before
    t.read(spark).count() shouldBe 24
  }

  test("compact on a partitioned table keeps partition pruning alive") {
    val t = Icebox(tmpDir("icebox"))
    (1 to 3).foreach(_ => t.append(sampleDf, partitionBy = Seq("dt")))
    t.compact(spark)
    t.prunedFiles("dt", Set("2024-01-01")) should not be empty
    t.readPartitions(spark, "dt", Set("2024-01-01")).count() shouldBe 6
  }

  test("crash between manifest write and pointer flip leaves orphan invisible") {
    val t = Icebox(tmpDir("icebox"))
    t.append(sampleDf)
    // simulate a crashed commit: manifest written, _current NOT flipped
    val dir = Paths.get(t.tableDir, "_snapshots")
    val orphan = Snapshot(99L, 0L, System.currentTimeMillis(), "append", Nil, sampleDf.schema.json)
    Files.write(dir.resolve("99.json"),
      """{"id":99,"parentId":0,"timestampMs":9999999999999,"operation":"append","schemaJson":"{}","files":[]}"""
        .getBytes("UTF-8"))
    t.currentSnapshotId shouldBe 0L
    t.allSnapshots.map(_.id) shouldBe Seq(0L)       // orphan unreachable
    t.readAsOf(spark, Long.MaxValue).count() shouldBe 4 // time travel never sees it
  }

  test("crash between data write and manifest write: stray commit dir is invisible and GC'd") {
    val t = Icebox(tmpDir("icebox"))
    t.append(sampleDf)
    // simulate a crash mid-commit: data files written, NO manifest, no pointer
    val stray = Paths.get(t.tableDir, "data", "graft_commit=deadbeef", "part-crash.parquet")
    Files.createDirectories(stray.getParent)
    Files.write(stray, Array.fill[Byte](128)(1))
    t.read(spark).count() shouldBe 4                  // reads are manifest-driven: stray invisible
    Thread.sleep(10)
    t.expireSnapshots(olderThanMs = System.currentTimeMillis(), retainLast = 10)
    Files.exists(stray) shouldBe false                // orphan data GC'd
    t.read(spark).count() shouldBe 4                  // live data untouched
  }

  test("expireSnapshots deletes old snapshots' unreferenced files but keeps live ones") {
    val t = Icebox(tmpDir("icebox"))
    t.append(sampleDf)
    t.overwrite(sampleDf.filter($"id" === 1)) // snapshot 0's files now unreferenced
    Thread.sleep(10)
    val expired = t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000, retainLast = 1)
    expired shouldBe Seq(0L)
    t.read(spark).count() shouldBe 1
    // snapshot 0's manifest is gone
    Files.exists(Paths.get(t.tableDir, "_snapshots", "0.json")) shouldBe false
  }

  test("schema evolution: an append may DROP a column; old files' extra data is ignored") {
    val t = Icebox(tmpDir("icebox"))
    t.append(Seq((1L, "a", 5.0)).toDF("id", "name", "score"))
    t.append(Seq((2L, "b")).toDF("id", "name"))
    val back = t.read(spark)
    back.columns.toSeq shouldBe Seq("id", "name")
    back.count() shouldBe 2L
    // time travel to the pre-drop snapshot still sees the old schema
    t.readSnapshotId(spark, 0L).columns.toSeq shouldBe Seq("id", "name", "score")
  }

  test("removeOrphans deletes stale unreferenced files, keeps referenced and young ones") {
    val t = Icebox(tmpDir("icebox"))
    t.append(Seq((1L, "a")).toDF("id", "name"))
    t.overwrite(Seq((2L, "b")).toDF("id", "name")) // snapshot 0's file now historical but LIVE
    val dataDir = java.nio.file.Paths.get(t.tableDir, "data")
    val staleOrphan = dataDir.resolve("graft_commit=deadbeef0000/part-orphan.parquet")
    java.nio.file.Files.createDirectories(staleOrphan.getParent)
    java.nio.file.Files.write(staleOrphan, Array[Byte](1, 2, 3))
    java.nio.file.Files.setLastModifiedTime(staleOrphan,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 7200 * 1000))
    val youngOrphan = dataDir.resolve("graft_commit=deadbeef0001/part-young.parquet")
    java.nio.file.Files.createDirectories(youngOrphan.getParent)
    java.nio.file.Files.write(youngOrphan, Array[Byte](4, 5, 6))
    val deleted = t.removeOrphans(graceMs = 3600 * 1000)
    deleted shouldBe Seq(staleOrphan.toString)
    java.nio.file.Files.exists(staleOrphan) shouldBe false
    java.nio.file.Files.exists(staleOrphan.getParent) shouldBe false // empty dir swept
    java.nio.file.Files.exists(youngOrphan) shouldBe true
    // BOTH snapshots still read intact (history untouched, unlike expire)
    t.read(spark).count() shouldBe 1L
    t.readSnapshotId(spark, 0L).count() shouldBe 1L
  }

  test("rowCount answers COUNT(*) from the manifest alone, tracking DML") {
    val t = Icebox(tmpDir("icebox"))
    t.append((1L to 100L).map(i => (i, s"v$i")).toDF("id", "s"))
    t.append((101L to 130L).map(i => (i, s"v$i")).toDF("id", "s"))
    t.rowCount shouldBe Some(130L)
    graft.sql.MergeSql.register("rc_t", t)
    graft.sql.DmlSql.delete(spark, "DELETE FROM rc_t WHERE id > 120")
    t.rowCount shouldBe Some(120L)
    t.rowCount.get shouldBe t.read(spark).count()
  }

  test("columnMinMaxMeta answers MIN/MAX from manifest stats alone; refuses under deletes") {
    val t = Icebox(tmpDir("icebox"))
    t.append((1L to 100L).map(i => (i, s"v${100 + i}", i * 1.5)).toDF("id", "s", "x"),
      collectStats = Seq("id", "x", "s"))
    t.append((101L to 130L).map(i => (i, s"v${100 + i}", i * 1.5)).toDF("id", "s", "x"),
      collectStats = Seq("id", "x", "s"))
    t.columnMinMaxMeta("id") shouldBe Some((1.0, 130.0))
    t.columnMinMaxMeta("x") shouldBe Some((1.5, 195.0))
    t.columnMinMaxMetaString("s") shouldBe Some(("v101", "v230"))
    // a column never collected -> None (a stats-less file could hide extrema)
    t.columnMinMaxMeta("nope") shouldBe None
    // merge-on-read delete: the extremum may be gone -> refuse, scan fallback
    t.setProperties(Map("write.upsert.mode" -> "merge-on-read"))
    t.deleteByKeys(Seq(130L).toDF("id"))
    t.columnMinMaxMeta("id") shouldBe None
    t.read(spark).agg(org.apache.spark.sql.functions.max($"id")).head.getLong(0) shouldBe 129L
  }

  test("rowCount is None when a manifest predates row counts (scan fallback contract)") {
    val t = Icebox(tmpDir("icebox"))
    t.append(Seq((1L, "a")).toDF("id", "s"))
    // simulate an old manifest: strip the rows field from the snapshot json
    val mf = java.nio.file.Paths.get(t.tableDir, "_snapshots", "0.json")
    val stripped = new String(java.nio.file.Files.readAllBytes(mf))
      .replaceAll("\"rows\"\\s*:\\s*\\d+,?", "")
    java.nio.file.Files.write(mf, stripped.getBytes)
    Icebox(t.tableDir).rowCount shouldBe None // fresh handle, no cache
  }

  test("table properties round-trip and merge") {
    val t = Icebox(tmpDir("icebox"))
    t.properties shouldBe Map.empty
    t.setProperties(Map("write.bloom.columns" -> "id", "a" -> "1"))
    t.setProperties(Map("a" -> "2", "b" -> "3"))
    t.properties shouldBe Map("write.bloom.columns" -> "id", "a" -> "2", "b" -> "3")
  }

  test("write.bloom.columns records a parquet bloom filter in every data file") {
    import scala.jdk.CollectionConverters._
    val t = Icebox(tmpDir("icebox"))
    t.setProperties(Map("write.bloom.columns" -> "id"))
    t.append((1L to 5000L).map(i => (i, s"name$i")).toDF("id", "name"))
    val file = t.currentSnapshot.get.files.head.path
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file), new org.apache.hadoop.conf.Configuration()))
    try {
      val block = reader.getRowGroups.get(0)
      val byName = block.getColumns.asScala.map(c => c.getPath.toDotString -> c).toMap
      val bloomReader = reader.getBloomFilterDataReader(block)
      bloomReader.readBloomFilter(byName("id")) should not be null
      bloomReader.readBloomFilter(byName("name")) shouldBe null // only opted-in columns
    } finally reader.close()
  }

  test("partition values containing '+' and '%' survive the path round-trip") {
    val df = Seq((1L, "a+b"), (2L, "c d"), (3L, "a+b")).toDF("id", "tag")
    val t = Icebox(tmpDir("icebox"))
    t.append(df, partitionBy = Seq("tag"))
    t.prunedFiles("tag", Set("a+b")) should not be empty
    assertSameRows(t.read(spark), df)
    t.readPartitions(spark, "tag", Set("a+b")).count() shouldBe 2
  }

  test("schema evolution: files missing a later-added column read as nulls") {
    val t = Icebox(tmpDir("icebox"))
    t.append(Seq((1L, "a")).toDF("id", "name"))
    t.append(Seq((2L, "b", 5.0)).toDF("id", "name", "score"))
    val back = t.read(spark)
    back.columns.toSeq shouldBe Seq("id", "name", "score")
    back.filter($"id" === 1).select("score").collect()(0).isNullAt(0) shouldBe true
  }

  test("concurrent appends from SEPARATE handles lose no commits (optimistic concurrency)") {
    val dir = tmpDir("icebox-occ")
    val handles = (0 until 4).map(_ => Icebox(dir))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = handles.zipWithIndex.map { case (h, i) =>
      Future { (0 until 3).foreach(j => h.append(Seq((i * 10L + j, s"h$i-$j")).toDF("id", "v"))) }
    }
    Await.result(Future.sequence(futures), 120.seconds)
    pool.shutdown()
    val t = Icebox(dir)
    t.read(spark).count() shouldBe 12          // 4 handles × 3 appends × 1 row — nothing lost
    // 12 commits chained head-to-root; ids may have gaps (a CAS loser
    // releases its claimed id and rebuilds on the new head — snapshot ids
    // are identifiers, not a dense sequence, as in Iceberg)
    t.allSnapshots.size shouldBe 12
    t.currentSnapshotId should be >= 11L
  }

  test("snapshot manifests are O(delta): append manifests don't grow with table size") {
    val t = Icebox(tmpDir("icebox-delta"))
    val one = Seq((1L, "x")).toDF("id", "v").coalesce(1)
    (0 until 12).foreach(_ => t.append(one))
    val dir = Paths.get(t.tableDir, "_snapshots")
    val sizes = (0L until 12L).map(id => Files.size(dir.resolve(s"$id.json")))
    // v1 wrote the FULL file list per commit → linear growth; a delta
    // manifest records just the one added file, so append #11 is no larger
    // than append #1 (both are one-file deltas)
    sizes(11) should be <= (sizes(1) + 64)
    // text form: deltas carry "added", not "files"
    new String(Files.readAllBytes(dir.resolve("11.json")), "UTF-8") should include("\"added\"")
    // a fresh handle reconstructs the same state by replaying the chain
    val t2 = Icebox(t.tableDir)
    t2.read(spark).count() shouldBe 12
    t2.currentSnapshot.get.files.map(_.path) shouldBe t.currentSnapshot.get.files.map(_.path)
    t2.snapshotsDf(spark).count() shouldBe 12
  }

  test("delta chains checkpoint to a full manifest at MaxDeltaChain commits") {
    val t = Icebox(tmpDir("icebox-ckpt"))
    val one = Seq((1L, "x")).toDF("id", "v").coalesce(1)
    (0 until 18).foreach(_ => t.append(one))
    val dir = Paths.get(t.tableDir, "_snapshots")
    def isFull(id: Long) =
      new String(Files.readAllBytes(dir.resolve(s"$id.json")), "UTF-8").contains("\"files\"")
    isFull(0) shouldBe true                      // root is always full
    (1L to 15L).count(isFull) shouldBe 0         // pure-append deltas in between
    isFull(16L) shouldBe true                    // depth 16 forces a checkpoint
    isFull(17L) shouldBe false                   // and the chain restarts
    Icebox(t.tableDir).read(spark).count() shouldBe 18
  }

  test("expiry rebases the oldest kept delta snapshot to full before deleting ancestors") {
    val t = Icebox(tmpDir("icebox-rebase"))
    val one = Seq((1L, "x")).toDF("id", "v").coalesce(1)
    (0 until 8).foreach(_ => t.append(one))
    Thread.sleep(10)
    val expired = t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000, retainLast = 3)
    expired.sorted shouldBe Seq(0L, 1L, 2L, 3L, 4L)
    // oldest kept (5) was a delta whose chain ran through the expired range;
    // it must now be self-contained — a FRESH handle (no caches) reads it
    val t2 = Icebox(t.tableDir)
    t2.allSnapshots.map(_.id) shouldBe Seq(7L, 6L, 5L)
    t2.readSnapshotId(spark, 5L).count() shouldBe 6
    t2.read(spark).count() shouldBe 8
    t2.changesSince(spark, 5L).count() shouldBe 2
  }

  test("unescapePathSegment decodes %XX but leaves '+' alone") {
    Icebox.unescapePathSegment("a%2Fb") shouldBe "a/b"
    Icebox.unescapePathSegment("a+b") shouldBe "a+b"
    Icebox.unescapePathSegment("100%") shouldBe "100%"
    Icebox.unescapePathSegment("%3A%3D") shouldBe ":="
  }
}
