package graft

import org.apache.spark.sql.functions._
import graft.operators.Upsert
import graft.table.Icebox

/** Equality-delete merge-on-read (Iceberg v2's second delete type): a CDC
  * upsert or key-delete writes one small key file instead of reading or
  * rewriting ANY data; readers anti-join matched keys away from exactly the
  * files that pre-existed the delete (attach-list sequence semantics).
  */
class EqualityDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(prefix: String, n: Int = 60): Icebox = {
    val t = Icebox(tmpDir(prefix))
    val df = (1 to n).map(i => (i.toLong, s"v$i", i % 4)).toDF("id", "s", "grp")
    t.append(df.repartitionByRange(4, col("id")))
    t
  }

  test("deleteByKeys removes matched rows without touching any data file") {
    val t = freshTable("eqdel-basic")
    val before = t.currentSnapshot.get.files.map(_.path).toSet
    t.deleteByKeys(Seq(3L, 17L, 42L).toDF("id"))
    val after = t.currentSnapshot.get.files
    after.map(_.path).toSet shouldBe before // no rewrite, no new data files
    after.count(_.eqDeletes.nonEmpty) should be > 0
    t.read(spark).count() shouldBe 57L
    t.read(spark).filter($"id".isin(3L, 17L, 42L)).count() shouldBe 0L
    t.readIndexed(spark).count() shouldBe 57L // planner-indexed path applies them too
    t.rowCount shouldBe None // manifest counts are upper bounds now
  }

  test("merge-on-read upsert: new images win, unmatched rows survive, zero rewrite") {
    val t = freshTable("eqdel-upsert")
    val before = t.currentSnapshot.get.files.map(_.path).toSet
    t.setProperties(Map("write.upsert.mode" -> "merge-on-read"))
    val batch = Seq((5L, "NEW5", 99), (61L, "NEW61", 99)).toDF("id", "s", "grp")
    Upsert.intoTable(t, batch, Seq("id"))
    val files = t.currentSnapshot.get.files
    // pre-existing files intact; exactly the batch's files added on top
    before.subsetOf(files.map(_.path).toSet) shouldBe true
    val got = t.read(spark).orderBy("id").as[(Long, String, Int)].collect()
    got.length shouldBe 61
    got.find(_._1 == 5L).map(_._2) shouldBe Some("NEW5") // matched key -> new image
    got.find(_._1 == 61L).map(_._2) shouldBe Some("NEW61") // unmatched key inserted
    got.find(_._1 == 6L).map(_._2) shouldBe Some("v6") // untouched rows survive
  }

  test("sequence semantics: a re-inserted key is NOT hit by an older equality delete") {
    val t = freshTable("eqdel-seq")
    t.deleteByKeys(Seq(10L).toDF("id"))
    t.read(spark).filter($"id" === 10L).count() shouldBe 0L
    t.append(Seq((10L, "reborn", 0)).toDF("id", "s", "grp"))
    // the new file postdates the delete and never carries its attach
    t.read(spark).filter($"id" === 10L).select("s").as[String].collect() shouldBe Array("reborn")
    // and a SECOND delete of the same key kills the reborn row too
    t.deleteByKeys(Seq(10L).toDF("id"))
    t.read(spark).filter($"id" === 10L).count() shouldBe 0L
  }

  test("stacked deletes on different key columns compose") {
    val t = freshTable("eqdel-stack")
    t.deleteByKeys(Seq(1L, 2L).toDF("id"))
    t.deleteByKeys(Seq("v7", "v8").toDF("s")) // different equality columns
    t.read(spark).count() shouldBe 56L
    t.read(spark).filter($"id".isin(1L, 2L) || $"s".isin("v7", "v8")).count() shouldBe 0L
  }

  test("compaction materializes equality deletes and drops the attach lists") {
    val t = freshTable("eqdel-compact")
    t.deleteByKeys(Seq(4L, 44L).toDF("id"))
    t.compact(spark)
    val files = t.currentSnapshot.get.files
    files.forall(_.eqDeletes.isEmpty) shouldBe true
    t.read(spark).count() shouldBe 58L
    t.rowCount shouldBe Some(58L) // metadata COUNT(*) exact again
  }

  test("snapshot expiry keeps referenced eq-delete dirs, drops unreferenced ones") {
    val t = freshTable("eqdel-expire")
    t.deleteByKeys(Seq(9L).toDF("id"))
    val dir = t.currentSnapshot.get.files.flatMap(_.eqDeletes).head
    t.compact(spark) // live snapshot no longer references the eq dir
    t.read(spark).count() shouldBe 59L
    t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000, retainLast = 1)
    java.nio.file.Files.exists(java.nio.file.Paths.get(dir)) shouldBe false
    t.read(spark).count() shouldBe 59L // reads unaffected by the cleanup
  }

  test("stats-pruned attach: disjoint files never carry the delete") {
    val t = Icebox(tmpDir("eqdel-prune"))
    // two range-disjoint files with id stats (footer defaults record them)
    t.append((1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .repartitionByRange(2, col("id")))
    t.deleteByKeys(Seq(2L, 3L).toDF("id")) // keys live entirely in the low file
    val files = t.currentSnapshot.get.files
    files.count(_.eqDeletes.nonEmpty) shouldBe 1 // high-range file pruned from attach
    t.read(spark).count() shouldBe 48L
  }

  test("stats-pruned attach works for STRING keys (UTF8 order)") {
    val t = Icebox(tmpDir("eqdel-prune-str"))
    // two range-disjoint files clustered on the string key (footer stats
    // record string min/max by default)
    t.append((1 to 50).map(i => (f"k$i%03d", i)).toDF("k", "v")
      .repartitionByRange(2, col("k")))
    t.currentSnapshot.get.files.size shouldBe 2
    t.deleteByKeys(Seq("k002", "k003").toDF("k")) // entirely in the low file
    val files = t.currentSnapshot.get.files
    files.count(_.eqDeletes.nonEmpty) shouldBe 1 // high-range file pruned
    t.read(spark).count() shouldBe 48L
    // and a batch spanning both ranges attaches to both (no over-pruning)
    t.deleteByKeys(Seq("k001", "k050").toDF("k"))
    t.read(spark).count() shouldBe 46L
  }

  test("attach depth is bounded: over-threshold files rewrite copy-on-write") {
    val t = Icebox(tmpDir("eqdel-depth"))
    t.append((1 to 40).map(i => (i.toLong, s"v$i")).toDF("id", "s"))
    t.setProperties(Map("write.merge-on-read.max-delete-files" -> "3"))
    (1 to 3).foreach(i => t.deleteByKeys(Seq(i.toLong).toDF("id")))
    val stacked = t.currentSnapshot.get.files
    stacked.map(_.eqDeletes.size).max shouldBe 3
    // only the file(s) carrying the stack get rewritten; disjoint
    // (stats-pruned) files keep their paths
    val stackedPaths = stacked.filter(_.eqDeletes.nonEmpty).map(_.path).toSet
    // 4th delete on the same file exceeds the bound -> hybrid copy-on-write
    t.deleteByKeys(Seq(4L).toDF("id"))
    val after = t.currentSnapshot.get.files
    after.map(_.eqDeletes.size).max shouldBe 0 // depth reset by the rewrite
    after.map(_.path).toSet.intersect(stackedPaths) shouldBe Set.empty
    t.read(spark).count() shouldBe 36L
    t.read(spark).filter($"id" <= 4).count() shouldBe 0L
    // partitioned table: the rewrite lands in the partition layout
    val p = Icebox(tmpDir("eqdel-depth-part"))
    p.append((1 to 40).map(i => (i.toLong, s"g${i % 2}")).toDF("id", "g"), Seq("g"))
    p.setProperties(Map("write.merge-on-read.max-delete-files" -> "1"))
    p.deleteByKeys(Seq(1L).toDF("id"))
    p.deleteByKeys(Seq(2L).toDF("id")) // triggers rewrite
    p.read(spark).count() shouldBe 38L
    p.partitionColumns shouldBe Seq("g")
    p.read(spark).filter($"g" === "g1").count() shouldBe 19L
  }

  test("changeDiff across an equality-delete commit emits the deleted rows as CDF deletes") {
    val t = freshTable("eqdel-cdf")
    val from = t.currentSnapshotId
    t.deleteByKeys(Seq(7L, 13L).toDF("id"))
    val diff = t.changeDiff(spark, from, t.currentSnapshotId)
    diff.filter($"_change_type" === "delete").select("id").as[Long].collect().sorted shouldBe
      Array(7L, 13L)
    diff.filter($"_change_type" === "insert").count() shouldBe 0L
  }

  test("time travel: the pre-delete snapshot still shows deleted rows") {
    val t = freshTable("eqdel-tt")
    val preId = t.currentSnapshotId
    t.deleteByKeys(Seq(30L).toDF("id"))
    t.readSnapshotId(spark, preId).filter($"id" === 30L).count() shouldBe 1L
    t.read(spark).filter($"id" === 30L).count() shouldBe 0L
    t.rollbackTo(preId)
    t.read(spark).filter($"id" === 30L).count() shouldBe 1L
  }

  test("copy-on-write DML over a table with eq deletes never resurrects dead rows") {
    val t = freshTable("eqdel-dml")
    t.deleteByKeys(Seq(20L, 21L).toDF("id"))
    import graft.sql.{DmlSql, MergeSql}
    MergeSql.register("eqdel_dml_t", t)
    DmlSql.delete(spark, "DELETE FROM eqdel_dml_t WHERE grp = 1")
    val ids = t.read(spark).select("id").as[Long].collect().toSet
    ids.contains(20L) shouldBe false
    ids.contains(21L) shouldBe false
    ids.count(_ % 4 == 1) shouldBe 0
    t.read(spark).count() shouldBe 44L // 60 - 15 (grp=1 incl. 21) - {20}
  }
}
