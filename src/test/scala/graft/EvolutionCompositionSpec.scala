package graft

import org.apache.spark.sql.functions._
import graft.table.Icebox

/** Cross-feature composition: schema/partition evolution interacting with
  * rollback, branches, and the change feed. Each case pins semantics a
  * single-feature spec can't see.
  */
class EvolutionCompositionSpec extends SparkSpec {
  import spark.implicits._

  test("rename then rollback: the old snapshot's names win and appends resume on them") {
    val t = Icebox(tmpDir("comp-rn-rb"))
    t.append((1 to 10).map(i => (i.toLong, i * 10)).toDF("id", "amount"))
    val pre = t.currentSnapshotId
    t.renameColumn("amount", "price")
    t.read(spark).columns should contain("price")
    t.rollbackTo(pre)
    t.read(spark).columns should contain("amount")
    t.append(Seq((11L, 110)).toDF("id", "amount"))
    t.read(spark).agg(sum("amount")).as[Long].head() shouldBe 660L
  }

  test("branch forked before a rename keeps the old names; main takes the new") {
    val t = Icebox(tmpDir("comp-br-rn"))
    t.append((1 to 10).map(i => (i.toLong, i * 10)).toDF("id", "amount"))
    t.createBranch("legacy")
    t.renameColumn("amount", "price")
    t.appendToBranch("legacy", Seq((11L, 110)).toDF("id", "amount"))
    t.readRef(spark, "legacy").columns should contain("amount")
    t.readRef(spark, "legacy").agg(sum("amount")).as[Long].head() shouldBe 660L
    t.read(spark).columns should contain("price")
    t.read(spark).count() shouldBe 10L // main never saw the branch append
    // the rename commit DIVERGED main from the branch lineage, so a linear
    // fast-forward must refuse (publish would need a merge, not a pointer
    // move) — exactly Iceberg's fast_forward contract
    an[Exception] should be thrownBy t.fastForward("legacy")
  }

  test("partition evolution survives rollback: the spec property keeps driving appends") {
    val t = Icebox(tmpDir("comp-pe-rb"))
    t.append((1 to 20).map(i => (i.toLong, s"g${i % 2}")).toDF("id", "grp"))
    val pre = t.currentSnapshotId
    t.setPartitionSpec(Seq("grp"))
    t.append((21 to 30).map(i => (i.toLong, s"g${i % 2}")).toDF("id", "grp"))
    t.rollbackTo(pre) // file set back to unpartitioned generation only
    t.read(spark).count() shouldBe 20L
    t.append((31 to 40).map(i => (i.toLong, s"g${i % 2}")).toDF("id", "grp"))
    // the evolved spec is a TABLE property, not snapshot state: it survives
    // the rollback and keeps partitioning new writes
    t.currentSnapshot.get.files.exists(_.partition.contains("grp")) shouldBe true
    t.read(spark).count() shouldBe 30L
    t.read(spark).filter($"grp" === "g1").count() shouldBe 15L
  }

  test("drop then rollback resurrects the column WITH its values") {
    val t = Icebox(tmpDir("comp-dr-rb"))
    t.append((1 to 10).map(i => (i.toLong, s"n$i")).toDF("id", "name"))
    val pre = t.currentSnapshotId
    t.dropColumn("name")
    t.read(spark).columns should not contain "name"
    t.rollbackTo(pre) // metadata-only drop: the bytes never left the files
    t.read(spark).filter($"name".isNotNull).count() shouldBe 10L
  }

  test("changeDiff across a rename boundary reads both sides under the new names") {
    val t = Icebox(tmpDir("comp-cd-rn"))
    t.append((1 to 10).map(i => (i.toLong, i * 10)).toDF("id", "amount"))
    val from = t.currentSnapshotId
    t.renameColumn("amount", "price")
    t.append(Seq((11L, 110)).toDF("id", "price"))
    val diff = t.changeDiff(spark, from, t.currentSnapshotId)
    diff.columns should contain("price")
    diff.filter($"_change_type" === "insert").select("id").as[Long].collect() shouldBe Array(11L)
    diff.filter($"_change_type" === "delete").count() shouldBe 0L
  }

  test("cold-handle reopen: evolution metadata, deletes, and refs all survive the JSON round-trip") {
    val dir = tmpDir("comp-reopen")
    val t = Icebox(dir)
    t.append((1 to 20).map(i => (i.toLong, i * 10, s"g${i % 2}")).toDF("id", "amount", "grp"),
      Seq("grp"))
    t.renameColumn("amount", "price")
    t.createTag("v1")
    t.createBranch("wip")
    t.deleteByKeys(Seq(3L).toDF("id"))
    t.setPartitionSpec(Seq("grp"))
    // a FRESH handle reconstructs everything from disk alone
    val cold = Icebox(dir)
    cold.read(spark).columns.toSeq should contain("price")
    cold.read(spark).count() shouldBe 19L // eq delete survives reopen
    cold.read(spark).agg(sum("price")).as[Long].head() shouldBe ((1 to 20).map(_ * 10).sum - 30L)
    cold.refs.keySet shouldBe Set("v1", "wip")
    cold.readRef(spark, "v1").count() shouldBe 20L // tag predates the delete
    cold.partitionColumns shouldBe Seq("grp")
    cold.currentPartitionSpec shouldBe Seq("grp")
    // stats pruning under the renamed logical name, from the cold handle
    cold.prunedFilesByStats("price", Some(190.0), None)
      .size should be < cold.currentSnapshot.get.files.size
    // and the cold handle can keep writing
    cold.append(Seq((21L, 210, "g1")).toDF("id", "price", "grp"))
    cold.read(spark).count() shouldBe 20L
  }

  test("equality delete on a branch is isolated from main") {
    val t = Icebox(tmpDir("comp-eq-br"))
    t.append((1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "s"))
    t.createBranch("wip")
    // delete runs against MAIN; the branch (sharing the same file entries
    // captured at fork time) must keep seeing the pre-delete rows
    t.deleteByKeys(Seq(3L).toDF("id"))
    t.read(spark).count() shouldBe 9L
    t.readRef(spark, "wip").count() shouldBe 10L
  }
}
