package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}
import graft.sql.{DmlSql, MergeSql}
import graft.table.Icebox

/** Column-mapping schema evolution: rename / drop / add / widen are
  * METADATA-ONLY commits. Files keep the physical name a column was created
  * with; the snapshot schema carries logical→physical, so old files, new
  * files, time travel, stats pruning, and delete files all stay coherent.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(prefix: String): Icebox = {
    val t = Icebox(tmpDir(prefix))
    t.append((1 to 40).map(i => (i.toLong, i * 10, s"n$i")).toDF("id", "amount", "name")
      .repartitionByRange(2, col("id")))
    t
  }

  test("rename is metadata-only; old and new files read under the new name") {
    val t = fresh("evo-rename")
    val beforePaths = t.currentSnapshot.get.files.map(_.path).toSet
    t.renameColumn("amount", "price")
    t.currentSnapshot.get.files.map(_.path).toSet shouldBe beforePaths
    t.read(spark).columns.toSeq shouldBe Seq("id", "price", "name")
    t.read(spark).agg(sum("price")).as[Long].head() shouldBe (1 to 40).map(_ * 10).sum.toLong
    // appends after the rename land in the SAME physical column
    t.append(Seq((41L, 999, "n41")).toDF("id", "price", "name"))
    t.read(spark).filter($"price" === 999).count() shouldBe 1L
    t.read(spark).count() shouldBe 41L
    // stats pruning works under the logical name across old+new files
    val kept = t.prunedFilesByStats("price", Some(990.0), None)
    kept.size should be < t.currentSnapshot.get.files.size
  }

  test("time travel reads each snapshot with its own column names") {
    val t = fresh("evo-tt")
    val preId = t.currentSnapshotId
    t.renameColumn("amount", "price")
    t.readSnapshotId(spark, preId).columns should contain("amount")
    t.read(spark).columns should contain("price")
  }

  test("drop + re-add: the old column's bytes stay dead") {
    val t = fresh("evo-drop")
    t.dropColumn("name")
    t.read(spark).columns.toSeq shouldBe Seq("id", "amount")
    t.addColumn("name", StringType)
    // re-added column must NOT resurrect the dropped values
    t.read(spark).filter($"name".isNotNull).count() shouldBe 0L
    t.append(Seq((99L, 1, "fresh")).toDF("id", "amount", "name"))
    t.read(spark).filter($"name".isNotNull).count() shouldBe 1L
  }

  test("widen int to bigint and float-family to double; old files up-cast at scan") {
    val t = Icebox(tmpDir("evo-widen"))
    t.append((1 to 20).map(i => (i, i.toFloat / 2)).toDF("n", "x"))
    t.widenColumn("n", LongType)
    t.widenColumn("x", DoubleType)
    val schema = t.read(spark).schema
    schema("n").dataType shouldBe LongType
    schema("x").dataType shouldBe DoubleType
    t.read(spark).agg(sum("n")).as[Long].head() shouldBe 210L
    // appends write the widened type; both generations read together
    t.append(Seq((5000000000L, 2.5)).toDF("n", "x"))
    t.read(spark).agg(max("n")).as[Long].head() shouldBe 5000000000L
    an[Exception] should be thrownBy t.widenColumn("n", IntegerType) // narrowing rejected
  }

  test("renamed partition column: dirs keep the physical name, callers see logical") {
    val t = Icebox(tmpDir("evo-part"))
    t.append((1 to 30).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp"), Seq("grp"))
    t.renameColumn("grp", "segment")
    t.partitionColumns shouldBe Seq("segment")
    t.read(spark).filter($"segment" === "g1").count() shouldBe 10L
    // manifest partition pruning under the logical name
    t.prunedFiles("segment", Set("g1")).size should be < t.currentSnapshot.get.files.size
    // appends keep the (physical) partition layout consistent
    t.append(Seq((31L, "g1")).toDF("id", "segment"), Seq("segment"))
    t.read(spark).filter($"segment" === "g1").count() shouldBe 11L
    t.readIndexed(spark).filter($"segment" === "g1").count() shouldBe 11L
  }

  test("evolution guards: partition drops, duplicate renames, missing columns") {
    val t = Icebox(tmpDir("evo-guard"))
    t.append((1 to 10).map(i => (i, s"g${i % 2}", s"v$i")).toDF("id", "grp", "v"), Seq("grp"))
    an[Exception] should be thrownBy t.dropColumn("grp") // partition column
    an[Exception] should be thrownBy t.renameColumn("id", "v") // name collision
    an[Exception] should be thrownBy t.renameColumn("nope", "x")
    an[Exception] should be thrownBy t.addColumn("id", LongType) // already exists
  }

  test("SQL-text ALTER TABLE: all four verbs through run()") {
    val t = fresh("evo-sql")
    t.registerView(spark, "evo_sql_t")
    DmlSql.run(spark, "ALTER TABLE evo_sql_t RENAME COLUMN amount TO price")
    DmlSql.run(spark, "ALTER TABLE evo_sql_t ADD COLUMN score DOUBLE")
    DmlSql.run(spark, "ALTER TABLE evo_sql_t DROP COLUMN name")
    DmlSql.run(spark, "ALTER TABLE evo_sql_t ALTER COLUMN id TYPE BIGINT") // id already long: no-op widen
    val cols = spark.sql("SELECT * FROM evo_sql_t").columns.toSeq
    cols shouldBe Seq("id", "price", "score")
    // DML through the renamed column still prunes and rewrites correctly
    DmlSql.run(spark, "UPDATE evo_sql_t SET price = 0 WHERE price > 350")
    spark.sql("SELECT count(*) FROM evo_sql_t WHERE price = 0").as[Long].head() shouldBe 5L
  }

  test("equality deletes survive renames in both directions") {
    val t = fresh("evo-eqdel")
    t.deleteByKeys(Seq(1L, 2L).toDF("id")) // delete written pre-rename
    t.renameColumn("id", "pk")
    t.read(spark).count() shouldBe 38L // old delete still applies
    t.deleteByKeys(Seq(3L).toDF("pk")) // delete keyed on the NEW logical name
    t.read(spark).count() shouldBe 37L
    t.read(spark).filter($"pk" <= 3).count() shouldBe 0L
  }
}
