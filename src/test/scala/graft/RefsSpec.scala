package graft

import org.apache.spark.sql.functions._
import graft.table.Icebox

/** Snapshot refs (Iceberg branches/tags analog): tags are immutable
  * bookmarks, branches take appends on a divergent lineage (write-audit-
  * publish), fastForward promotes a branch linearly, and expiry treats
  * every ref-rooted chain as live.
  */
class RefsSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(prefix: String): Icebox = {
    val t = Icebox(tmpDir(prefix))
    t.append((1 to 20).map(i => (i.toLong, s"v$i")).toDF("id", "s"))
    t
  }

  test("tag pins a snapshot; main moves on; expiry keeps the tagged files") {
    val t = fresh("refs-tag")
    t.createTag("v1")
    t.overwrite((100 to 105).map(i => (i.toLong, s"w$i")).toDF("id", "s"))
    t.read(spark).count() shouldBe 6L
    t.readRef(spark, "v1").count() shouldBe 20L // tag still reads the old state
    // expire aggressively: the tagged snapshot + its files must survive
    t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000, retainLast = 1)
    t.readRef(spark, "v1").count() shouldBe 20L
    t.dropRef("v1")
    t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000, retainLast = 1)
    t.read(spark).count() shouldBe 6L // main unaffected; tag state now expirable
  }

  test("branch appends advance the branch only; fastForward publishes them") {
    val t = fresh("refs-branch")
    t.createBranch("audit")
    t.appendToBranch("audit", Seq((21L, "b21")).toDF("id", "s"))
    t.appendToBranch("audit", Seq((22L, "b22")).toDF("id", "s"))
    t.read(spark).count() shouldBe 20L // main untouched
    t.readRef(spark, "audit").count() shouldBe 22L
    // branch lineage: head's parent chain reaches the fork point
    t.isAncestor(t.currentSnapshotId, t.refs("audit").snapshotId) shouldBe true
    t.fastForward("audit")
    t.read(spark).count() shouldBe 22L
    t.read(spark).filter($"s".isin("b21", "b22")).count() shouldBe 2L
  }

  test("interleaved main and branch commits keep globally unique snapshot ids") {
    val t = fresh("refs-interleave")
    t.createBranch("b")
    t.appendToBranch("b", Seq((50L, "x")).toDF("id", "s"))
    t.append(Seq((60L, "m")).toDF("id", "s")) // main commit after branch took an id
    t.appendToBranch("b", Seq((51L, "y")).toDF("id", "s"))
    t.append(Seq((61L, "m2")).toDF("id", "s"))
    t.read(spark).count() shouldBe 22L // 20 + 2 main appends
    t.readRef(spark, "b").count() shouldBe 22L // 20 + 2 branch appends
    val ids = Seq(t.currentSnapshotId, t.refs("b").snapshotId)
    ids.distinct.size shouldBe 2
    // fastForward must REFUSE: main diverged from the branch lineage
    an[Exception] should be thrownBy t.fastForward("b")
  }

  test("tags are immutable and ref names are unique") {
    val t = fresh("refs-guards")
    t.createTag("pin")
    an[Exception] should be thrownBy t.appendToBranch("pin", Seq((9L, "x")).toDF("id", "s"))
    an[Exception] should be thrownBy t.createBranch("pin")
    an[Exception] should be thrownBy t.createTag("pin")
    an[Exception] should be thrownBy t.readRef(spark, "ghost")
  }

  test("SQL-text ref verbs: CREATE/DROP BRANCH|TAG, FAST FORWARD") {
    val t = fresh("refs-sql")
    t.registerView(spark, "refs_sql_t")
    import graft.sql.DmlSql
    DmlSql.run(spark, "ALTER TABLE refs_sql_t CREATE TAG v1")
    DmlSql.run(spark, "ALTER TABLE refs_sql_t CREATE BRANCH audit")
    t.refs.keySet shouldBe Set("v1", "audit")
    t.appendToBranch("audit", Seq((21L, "b")).toDF("id", "s"))
    DmlSql.run(spark, "ALTER TABLE refs_sql_t FAST FORWARD TO audit")
    spark.sql("SELECT count(*) FROM refs_sql_t").as[Long].head() shouldBe 21L
    // refs metadata view
    t.registerView(spark, "refs_sql_t")
    spark.sql("SELECT name, kind FROM refs_sql_t_refs ORDER BY name")
      .collect().map(r => (r.getString(0), r.getString(1))) shouldBe
      Array(("audit", "branch"), ("v1", "tag"))
    DmlSql.run(spark, "ALTER TABLE refs_sql_t DROP BRANCH audit")
    DmlSql.run(spark, "ALTER TABLE refs_sql_t DROP TAG v1")
    t.refs shouldBe empty
  }

  test("expiry keeps the fork point a live branch still replays through") {
    val t = fresh("refs-fork")
    t.createBranch("wip") // fork at snapshot 0
    t.appendToBranch("wip", Seq((30L, "w")).toDF("id", "s"))
    // advance main far enough that the fork point leaves the retain window
    (1 to 5).foreach(i => t.append(Seq((100L + i, s"m$i")).toDF("id", "s")))
    t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000, retainLast = 2)
    t.readRef(spark, "wip").count() shouldBe 21L // branch replay intact
    t.read(spark).count() shouldBe 25L
  }
}
