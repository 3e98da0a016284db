package graft

import org.apache.spark.sql.functions._
import graft.table.Icebox

/** Partition-spec evolution: change a table's identity partitioning for
  * future writes; old- and new-layout file generations coexist and read as
  * one table; compaction migrates everything to the current spec.
  */
class PartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("unpartitioned -> partitioned: generations coexist and read together") {
    val t = Icebox(tmpDir("pevo-up"))
    t.append((1 to 30).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp"))
    t.setPartitionSpec(Seq("grp"))
    t.append((31 to 60).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp")) // auto-partitions
    val files = t.currentSnapshot.get.files
    files.map(_.partition.keys.toSet).distinct.size shouldBe 2 // two layouts live
    t.read(spark).count() shouldBe 60L
    t.readIndexed(spark).count() shouldBe 60L
    t.read(spark).filter($"grp" === "g1").count() shouldBe 20L
    t.readIndexed(spark).filter($"grp" === "g1").count() shouldBe 20L
    // manifest pruning: new-generation non-matching files pruned, old
    // (unpartitioned) generation kept conservatively
    val pruned = t.prunedFiles("grp", Set("g1"))
    pruned.size should be < files.size
    pruned.count(_.partition.isEmpty) shouldBe files.count(_.partition.isEmpty)
  }

  test("partitioned -> repartitioned: appends follow the new spec") {
    val t = Icebox(tmpDir("pevo-re"))
    t.append((1 to 30).map(i => (i.toLong, s"g${i % 3}", s"h${i % 2}")).toDF("id", "g", "h"),
      Seq("g"))
    t.setPartitionSpec(Seq("h"))
    t.append((31 to 60).map(i => (i.toLong, s"g${i % 3}", s"h${i % 2}")).toDF("id", "g", "h"))
    t.read(spark).count() shouldBe 60L
    t.read(spark).filter($"h" === "h1").count() shouldBe 30L
    // an append matching NEITHER the parent layout nor the spec errors
    an[Exception] should be thrownBy
      t.append(Seq((99L, "gx", "hx")).toDF("id", "g", "h"), Seq("id"))
  }

  test("compaction migrates every generation to the current spec") {
    val t = Icebox(tmpDir("pevo-compact"))
    t.append((1 to 40).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "grp"))
    t.setPartitionSpec(Seq("grp"))
    t.append((41 to 80).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "grp"))
    t.compact(spark)
    val files = t.currentSnapshot.get.files
    files.map(_.partition.keys.toSet).distinct.size shouldBe 1 // one layout again
    files.forall(_.partition.keySet == Set("grp")) shouldBe true
    t.read(spark).count() shouldBe 80L
    t.read(spark).filter($"grp" === "g2").count() shouldBe 20L
  }

  test("evolution to unpartitioned and DML across generations") {
    val t = Icebox(tmpDir("pevo-dml"))
    t.append((1 to 30).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp"), Seq("grp"))
    t.setPartitionSpec(Nil)
    t.append((31 to 40).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp"))
    t.read(spark).count() shouldBe 40L
    import graft.sql.{DmlSql, MergeSql}
    MergeSql.register("pevo_dml", t)
    DmlSql.delete(spark, "DELETE FROM pevo_dml WHERE id <= 5 OR id > 35")
    t.read(spark).count() shouldBe 30L
    t.read(spark).agg(min("id"), max("id")).as[(Long, Long)].head() shouldBe ((6L, 35L))
  }

  test("time travel reads pre-evolution snapshots with their own layout") {
    val t = Icebox(tmpDir("pevo-tt"))
    t.append((1 to 20).map(i => (i.toLong, s"g${i % 2}")).toDF("id", "grp"), Seq("grp"))
    val preId = t.currentSnapshotId
    t.setPartitionSpec(Nil)
    t.append((21 to 30).map(i => (i.toLong, s"g${i % 2}")).toDF("id", "grp"))
    t.readSnapshotId(spark, preId).count() shouldBe 20L
    t.read(spark).count() shouldBe 30L
  }
}
