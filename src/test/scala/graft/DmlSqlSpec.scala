package graft

import org.apache.spark.sql.functions._
import graft.sql.{DmlSql, MergeSql}
import graft.table.Icebox

class DmlSqlSpec extends SparkSpec {
  import spark.implicits._

  test("DELETE removes matching rows; predicate-false and null rows survive") {
    val t = Icebox(tmpDir("dml-del"))
    t.overwrite(Seq[(Long, java.lang.Double)](
      (1L, 5.0), (2L, 50.0), (3L, null), (4L, 45.0)
    ).toDF("id", "v"))
    MergeSql.register("del_null", t)
    DmlSql.delete(spark, "DELETE FROM del_null WHERE v > 40")
    t.read(spark).select("id").as[Long].collect().sorted shouldBe Array(1L, 3L)
  }

  test("DELETE without WHERE empties the table") {
    val t = Icebox(tmpDir("dml-delall"))
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    MergeSql.register("del_all", t)
    DmlSql.delete(spark, "DELETE FROM del_all")
    t.read(spark).count() shouldBe 0L
  }

  test("DELETE rewrites only files whose stats admit the predicate") {
    val t = Icebox(tmpDir("dml-prune"))
    val df = (1 to 80).map(i => (i.toLong, i % 8)).toDF("id", "bucket")
    // range layout + id stats: files carry disjoint [min,max] id ranges
    t.append(df.repartitionByRange(8, col("id")), collectStats = Seq("id"))
    MergeSql.register("del_prune", t)
    val total = t.currentSnapshot.get.files.size
    total should be > 1
    val r = DmlSql.delete(spark, "DELETE FROM del_prune WHERE id > 75")
    r.keptFiles should be > 0
    (r.rewrittenFiles + r.keptFiles) shouldBe total
    t.read(spark).agg(max("id")).as[Long].head() shouldBe 75L
    t.read(spark).count() shouldBe 75L
  }

  test("UPDATE assigns where the predicate is true, preserves elsewhere, keeps types") {
    val t = Icebox(tmpDir("dml-upd"))
    t.overwrite(Seq((1L, 10, "x"), (2L, 20, "y"), (3L, 30, "z")).toDF("id", "n", "s"))
    MergeSql.register("upd_t", t)
    DmlSql.update(spark, "UPDATE upd_t SET n = n + 1, s = 'hit' WHERE id >= 2")
    val out = t.read(spark).as[(Long, Int, String)].collect().sortBy(_._1)
    out shouldBe Array((1L, 10, "x"), (2L, 21, "hit"), (3L, 31, "hit"))
    t.read(spark).schema("n").dataType.typeName shouldBe "integer"
  }

  test("UPDATE with target alias and qualified references") {
    val t = Icebox(tmpDir("dml-alias"))
    t.overwrite(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    MergeSql.register("upd_alias", t)
    DmlSql.update(spark, "UPDATE upd_alias AS x SET v = x.v * 2 WHERE x.id = 2")
    t.read(spark).as[(Long, Double)].collect().sortBy(_._1) shouldBe
      Array((1L, 1.0), (2L, 4.0))
  }

  test("UPDATE with a typo'd SET column fails loudly") {
    val t = Icebox(tmpDir("dml-typo"))
    t.overwrite(Seq((1L, 1.0)).toDF("id", "v"))
    MergeSql.register("upd_typo", t)
    val e = intercept[IllegalArgumentException] {
      DmlSql.update(spark, "UPDATE upd_typo SET nope = 5")
    }
    e.getMessage should include("nope")
  }

  test("partitioned DELETE carries untouched partitions by reference") {
    val t = Icebox(tmpDir("dml-part"))
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "b", 4.0))
      .toDF("id", "part", "v")
    t.overwrite(df, partitionBy = Seq("part"))
    val before = t.currentSnapshot.get.files.filter(_.partition.get("part").contains("b"))
      .map(_.path).toSet
    MergeSql.register("del_part", t)
    val r = DmlSql.delete(spark, "DELETE FROM del_part WHERE part = 'a' AND v < 2")
    r.keptFiles should be > 0
    // partition-b files survive as the SAME files (no rewrite)
    val after = t.currentSnapshot.get.files.filter(_.partition.get("part").contains("b"))
      .map(_.path).toSet
    after shouldBe before
    t.read(spark).select("id").as[Long].collect().sorted shouldBe Array(2L, 3L, 4L)
  }

  test("INSERT INTO SELECT appends with position mapping and casts") {
    val t = Icebox(tmpDir("dml-ins"))
    t.overwrite(Seq((1L, "a", 1.5)).toDF("id", "s", "v"))
    MergeSql.register("ins_t", t)
    Seq((2, "b", "2.5")).toDF("x", "y", "z").createOrReplaceTempView("ins_src")
    DmlSql.insert(spark, "INSERT INTO ins_t SELECT * FROM ins_src")
    t.read(spark).as[(Long, String, Double)].collect().sortBy(_._1) shouldBe
      Array((1L, "a", 1.5), (2L, "b", 2.5))
  }

  test("INSERT with a column list null-fills unlisted columns") {
    val t = Icebox(tmpDir("dml-inscols"))
    t.overwrite(Seq((1L, "a", 1.5)).toDF("id", "s", "v"))
    MergeSql.register("inscols_t", t)
    DmlSql.insert(spark, "INSERT INTO inscols_t (id, v) VALUES (7, 9.0)")
    val row = t.read(spark).filter($"id" === 7L).as[(Long, Option[String], Double)].head()
    row shouldBe ((7L, None, 9.0))
  }

  test("INSERT OVERWRITE on a partitioned table rewrites only touched partitions") {
    val t = Icebox(tmpDir("dml-insow"))
    t.overwrite(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "part", "v"),
      partitionBy = Seq("part"))
    val bFiles = t.currentSnapshot.get.files
      .filter(_.partition.get("part").contains("b")).map(_.path).toSet
    MergeSql.register("insow_t", t)
    DmlSql.insert(spark, "INSERT OVERWRITE insow_t VALUES (9, 'a', 9.0)")
    t.read(spark).as[(Long, String, Double)].collect().sortBy(_._1) shouldBe
      Array((2L, "b", 2.0), (9L, "a", 9.0))
    t.currentSnapshot.get.files.filter(_.partition.get("part").contains("b"))
      .map(_.path).toSet shouldBe bFiles // partition b untouched, by reference
  }

  test("INSERT with a static PARTITION spec adds the literal column") {
    val t = Icebox(tmpDir("dml-insstatic"))
    t.overwrite(Seq((1L, "a", 1.0)).toDF("id", "part", "v"), partitionBy = Seq("part"))
    MergeSql.register("insstatic_t", t)
    DmlSql.insert(spark, "INSERT INTO insstatic_t PARTITION (part = 'c') VALUES (3, 3.0)")
    t.read(spark).filter($"part" === "c").as[(Long, String, Double)].collect() shouldBe
      Array((3L, "c", 3.0))
  }

  test("CTAS creates, registers, and composes with the rest of the SQL surface") {
    val wh = tmpDir("dml-ctas-wh")
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "part", "v").createOrReplaceTempView("ctas_src")
    val t = DmlSql.createTable(spark,
      "CREATE TABLE ctas_t PARTITIONED BY (part) AS SELECT * FROM ctas_src WHERE v > 15", wh)
    t.partitionColumns shouldBe Seq("part")
    spark.sql("SELECT id FROM ctas_t").as[Long].collect().sorted shouldBe Array(2L, 3L)
    // plain CREATE on an existing table errors; OR REPLACE replaces
    intercept[RuntimeException] {
      DmlSql.createTable(spark, "CREATE TABLE ctas_t AS SELECT * FROM ctas_src", wh)
    }
    DmlSql.createTable(spark,
      "CREATE OR REPLACE TABLE ctas_t AS SELECT * FROM ctas_src WHERE v < 15", wh)
    spark.sql("SELECT id FROM ctas_t").as[Long].collect() shouldBe Array(1L)
    // IF NOT EXISTS no-ops onto the existing table
    DmlSql.createTable(spark,
      "CREATE TABLE IF NOT EXISTS ctas_t AS SELECT * FROM ctas_src", wh)
    spark.sql("SELECT count(*) FROM ctas_t").as[Long].head() shouldBe 1L
    // the created table is a first-class DML target
    DmlSql.sql(spark, "INSERT INTO ctas_t VALUES (9, 'z', 90.0)")
    DmlSql.sql(spark, "UPDATE ctas_t SET v = 0.0 WHERE id = 9")
    spark.sql("SELECT v FROM ctas_t WHERE id = 9").as[Double].head() shouldBe 0.0
  }

  test("run() is one entry point: SELECT passthrough, write summaries, CTAS") {
    DmlSql.setWarehouse(tmpDir("dml-run-wh"))
    Seq((1L, 5.0), (2L, 50.0)).toDF("id", "v").createOrReplaceTempView("run_src")
    val created = DmlSql.run(spark, "CREATE TABLE run_t AS SELECT * FROM run_src")
    created.columns.toSeq shouldBe Seq("operation", "snapshot_id")
    DmlSql.run(spark, "UPDATE run_t SET v = 0.0 WHERE id = 2")
      .select("operation").as[String].head() shouldBe "update"
    // passthrough SELECT sees the post-update view
    DmlSql.run(spark, "SELECT v FROM run_t WHERE id = 2").as[Double].head() shouldBe 0.0
  }

  test("DELETE WHERE id IN (SELECT ...) runs the subquery through the analyzer") {
    val t = Icebox(tmpDir("dml-subq-in"))
    t.overwrite((1L to 10L).map(i => (i, i * 1.0)).toDF("id", "v"))
    MergeSql.register("subq_in_t", t)
    Seq(2L, 4L, 6L).toDF("id").createOrReplaceTempView("subq_in_src")
    DmlSql.delete(spark, "DELETE FROM subq_in_t WHERE id IN (SELECT id FROM subq_in_src)")
    t.read(spark).select("id").as[Long].collect().sorted shouldBe
      Array(1L, 3L, 5L, 7L, 8L, 9L, 10L)
  }

  test("DELETE WHERE NOT IN keeps SQL null semantics (null in subquery → no rows delete)") {
    val t = Icebox(tmpDir("dml-subq-notin"))
    t.overwrite(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
    MergeSql.register("subq_ni_t", t)
    Seq[java.lang.Long](2L, null).toDF("id").createOrReplaceTempView("subq_ni_src")
    // NOT IN over a set containing NULL is never TRUE → nothing deletes
    DmlSql.delete(spark, "DELETE FROM subq_ni_t WHERE id NOT IN (SELECT id FROM subq_ni_src)")
    t.read(spark).count() shouldBe 3L
    // without the null, NOT IN deletes the complement
    Seq[java.lang.Long](2L).toDF("id").createOrReplaceTempView("subq_ni_src2")
    DmlSql.delete(spark, "DELETE FROM subq_ni_t WHERE id NOT IN (SELECT id FROM subq_ni_src2)")
    t.read(spark).select("id").as[Long].collect() shouldBe Array(2L)
  }

  test("DELETE with correlated EXISTS correlates to the target alias") {
    val t = Icebox(tmpDir("dml-subq-exists"))
    t.overwrite(Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "s"))
    MergeSql.register("subq_ex_t", t)
    Seq((2L, "keep"), (3L, "keep")).toDF("ref_id", "tag")
      .createOrReplaceTempView("subq_ex_src")
    DmlSql.delete(spark,
      "DELETE FROM subq_ex_t t WHERE EXISTS (SELECT 1 FROM subq_ex_src s WHERE s.ref_id = t.id)")
    t.read(spark).select("id").as[Long].collect() shouldBe Array(1L)
  }

  test("UPDATE with a subquery condition assigns only matched rows") {
    val t = Icebox(tmpDir("dml-subq-upd"))
    t.overwrite(Seq((1L, 10, "x"), (2L, 20, "y"), (3L, 30, "z")).toDF("id", "n", "s"))
    MergeSql.register("subq_upd_t", t)
    Seq(2L, 3L).toDF("id").createOrReplaceTempView("subq_upd_src")
    DmlSql.update(spark,
      "UPDATE subq_upd_t SET n = n + 1, s = 'hit' WHERE id IN (SELECT id FROM subq_upd_src)")
    val out = t.read(spark).as[(Long, Int, String)].collect().sortBy(_._1)
    out shouldBe Array((1L, 10, "x"), (2L, 21, "hit"), (3L, 31, "hit"))
    t.read(spark).schema("n").dataType.typeName shouldBe "integer"
  }

  test("subquery DELETE still prunes files on the subquery-free conjuncts") {
    val t = Icebox(tmpDir("dml-subq-prune"))
    val df = (1 to 80).map(i => (i.toLong, i % 8)).toDF("id", "bucket")
    t.append(df.repartitionByRange(8, col("id")), collectStats = Seq("id"))
    MergeSql.register("subq_prune_t", t)
    val total = t.currentSnapshot.get.files.size
    total should be > 1
    Seq(77L, 78L, 200L).toDF("id").createOrReplaceTempView("subq_prune_src")
    val r = DmlSql.delete(spark,
      "DELETE FROM subq_prune_t WHERE id > 75 AND id IN (SELECT id FROM subq_prune_src)")
    r.keptFiles should be > 0 // id > 75 pruned files despite the subquery conjunct
    (r.rewrittenFiles + r.keptFiles) shouldBe total
    t.read(spark).count() shouldBe 78L
    t.read(spark).filter(col("id").isin(77L, 78L)).count() shouldBe 0L
  }

  test("subquery referencing the TARGET table sees the pre-delete state") {
    val t = Icebox(tmpDir("dml-subq-self"))
    t.overwrite((1L to 5L).map(i => (i, i * 1.0)).toDF("id", "v"))
    t.registerView(spark, "subq_self_t")
    DmlSql.delete(spark, "DELETE FROM subq_self_t WHERE id IN (SELECT max(id) FROM subq_self_t)")
    t.read(spark).select("id").as[Long].collect().sorted shouldBe Array(1L, 2L, 3L, 4L)
  }

  test("UPDATE SET values with subqueries still fail with an actionable message") {
    val t = Icebox(tmpDir("dml-subq-set"))
    t.overwrite(Seq((1L, 1.0)).toDF("id", "v"))
    MergeSql.register("subq_set_t", t)
    val e = intercept[IllegalArgumentException] {
      DmlSql.update(spark, "UPDATE subq_set_t SET v = (SELECT max(v) FROM subq_set_t)")
    }
    e.getMessage should include("MERGE INTO")
  }

  test("changeDiff reports an UPDATE as delete+insert pairs and reads only changed files") {
    val t = Icebox(tmpDir("dml-cdf"))
    t.append((1L to 80L).map(i => (i, i.toDouble)).toDF("id", "v")
      .repartitionByRange(8, col("id")), collectStats = Seq("id"))
    MergeSql.register("cdf_t", t)
    DmlSql.update(spark, "UPDATE cdf_t SET v = 0.0 WHERE id > 75")
    val diff = t.changeDiff(spark, 0L, 1L)
    val rows = diff.as[(Long, Double, String)].collect().sortBy(r => (r._1, r._3))
    rows.length shouldBe 10 // 5 updated ids x (delete + insert)
    rows.map(_._1).distinct.sorted shouldBe Array(76L, 77L, 78L, 79L, 80L)
    rows.filter(_._3 == "insert").forall(_._2 == 0.0) shouldBe true
    // pruned: only the rewritten file pair is read, not all 8+ files
    diff.inputFiles.length should be < t.currentSnapshot.get.files.size + 8
    diff.inputFiles.length should be <= 4
  }

  test("table_changes('t', from[, to]) reads the change feed through SQL text") {
    val t = Icebox(tmpDir("dml-tcf"))
    t.append((1L to 40L).map(i => (i, i.toDouble)).toDF("id", "v"))
    MergeSql.register("tcf_t", t)
    DmlSql.update(spark, "UPDATE tcf_t SET v = -1.0 WHERE id <= 3")
    // explicit (from, to) — composes with aggregation
    val counts = DmlSql.run(spark,
      "SELECT _change_type, count(*) AS n FROM table_changes('tcf_t', 0, 1) " +
      "GROUP BY _change_type ORDER BY _change_type")
      .as[(String, Long)].collect()
    counts shouldBe Array(("delete", 3L), ("insert", 3L))
    // `to` defaults to the current snapshot; joins compose
    t.append(Seq((100L, 5.0)).toDF("id", "v"))
    DmlSql.run(spark,
      "SELECT count(*) FROM table_changes('tcf_t', 1) WHERE _change_type = 'insert'")
      .head.getLong(0) shouldBe 1L
    // unregistered names pass through to Spark's own resolution error
    intercept[Exception](DmlSql.run(spark,
      "SELECT * FROM table_changes('nope_t', 0, 1)"))
  }

  test("filesDf exposes the manifest: paths, sizes, rows, stats") {
    val t = Icebox(tmpDir("dml-filesdf"))
    t.append((1L to 50L).map(i => (i, s"p${i % 2}")).toDF("id", "p"),
      collectStats = Seq("id"))
    val rows = t.filesDf(spark).collect()
    rows.length shouldBe t.currentSnapshot.get.files.size
    rows.map(_.getAs[Long]("rows")).sum shouldBe 50L
    rows.forall(_.getAs[Map[String, String]]("stats").contains("id")) shouldBe true
  }

  test("OPTIMIZE compacts; OPTIMIZE ZORDER BY clusters; VACUUM expires old snapshots") {
    val t = Icebox(tmpDir("dml-maint"))
    (0 until 6).foreach(i => t.append((1 to 50).map(j => (i * 50L + j, j % 5)).toDF("id", "g")))
    t.registerView(spark, "maint_t")
    val before = t.currentSnapshot.get.files.size
    DmlSql.run(spark, "OPTIMIZE maint_t ZORDER BY (id, g)")
    t.currentSnapshot.get.files.size should be < before
    t.read(spark).count() shouldBe 300L
    DmlSql.run(spark, "VACUUM maint_t RETAIN 0 HOURS")
    // history trimmed; current state intact
    t.read(spark).count() shouldBe 300L
    spark.sql("SELECT count(*) FROM maint_t").as[Long].head() shouldBe 300L
  }

  test("registerView exposes metadata views: <name>_snapshots and <name>_files") {
    val t = Icebox(tmpDir("dml-meta"))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    t.append(Seq((3L, "c")).toDF("id", "s"))
    t.registerView(spark, "meta_t")
    spark.sql("SELECT count(*) FROM meta_t_snapshots").as[Long].head() shouldBe 2L
    spark.sql("SELECT sum(rows) FROM meta_t_files").as[Long].head() shouldBe 3L
  }

  test("sql() dispatches DELETE, UPDATE, and MERGE") {
    val t = Icebox(tmpDir("dml-sql"))
    t.overwrite(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "v"))
    t.registerView(spark, "disp_t")
    DmlSql.sql(spark, "DELETE FROM disp_t WHERE id = 3")
    DmlSql.sql(spark, "UPDATE disp_t SET v = 9.0 WHERE id = 1")
    Seq((2L, 20.0)).toDF("id", "v").createOrReplaceTempView("disp_src")
    DmlSql.sql(spark,
      "MERGE INTO disp_t t USING disp_src s ON t.id = s.id WHEN MATCHED THEN UPDATE SET *")
    t.read(spark).as[(Long, Double)].collect().sortBy(_._1) shouldBe
      Array((1L, 9.0), (2L, 20.0))
    // the registered view repointed after each commit
    spark.sql("SELECT v FROM disp_t WHERE id = 1").as[Double].head() shouldBe 9.0
  }

  test("VERSION AS OF / TIMESTAMP AS OF read pinned snapshots through SQL text") {
    val t = Icebox(tmpDir("dml-tt"))
    val s0 = t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    Thread.sleep(10)
    val afterFirst = System.currentTimeMillis()
    Thread.sleep(10)
    t.append(Seq((3L, "c")).toDF("id", "s"))
    t.registerView(spark, "tt_t")
    DmlSql.run(spark, s"SELECT * FROM tt_t VERSION AS OF ${s0.id}").count() shouldBe 2L
    DmlSql.run(spark, s"SELECT * FROM tt_t FOR SYSTEM_VERSION AS OF ${s0.id}")
      .count() shouldBe 2L
    DmlSql.run(spark, s"SELECT * FROM tt_t TIMESTAMP AS OF $afterFirst").count() shouldBe 2L
    // composes with aggregation and with the CURRENT-state view in one query
    DmlSql.run(spark,
      s"SELECT count(*) AS c FROM tt_t VERSION AS OF ${s0.id}").as[Long].head() shouldBe 2L
    DmlSql.run(spark,
      s"""SELECT cur.id FROM tt_t cur LEFT ANTI JOIN tt_t VERSION AS OF ${s0.id} old
          ON cur.id = old.id""").as[Long].collect() shouldBe Array(3L)
    // quoted timestamp literal (session zone = UTC in specs)
    val iso = java.time.Instant.ofEpochMilli(afterFirst).toString
    DmlSql.run(spark, s"SELECT * FROM tt_t TIMESTAMP AS OF '$iso'").count() shouldBe 2L
    // a time-travel clause over an UNREGISTERED name passes through to Spark
    an[Exception] should be thrownBy
      DmlSql.run(spark, "SELECT * FROM no_such_tt VERSION AS OF 0").collect()
    // VERSION AS OF 'ref' reads a branch/tag by name (Iceberg's spelling)
    t.createTag("v1", s0.id)
    t.createBranch("wip")
    t.appendToBranch("wip", Seq((9L, "w")).toDF("id", "s"))
    DmlSql.run(spark, "SELECT * FROM tt_t VERSION AS OF 'v1'").count() shouldBe 2L
    DmlSql.run(spark, "SELECT * FROM tt_t VERSION AS OF 'wip'").count() shouldBe 4L
  }

  test("SHOW PARTITIONS answers from the manifest, no data scan") {
    val t = Icebox(tmpDir("dml-showparts"))
    t.append(Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "p"), Seq("p"))
    t.append(Seq((4L, "b")).toDF("id", "p"), Seq("p"))
    t.registerView(spark, "showparts_t")
    val rows = DmlSql.run(spark, "SHOW PARTITIONS showparts_t")
      .orderBy("partition").collect()
    rows.map(_.getString(0)) shouldBe Array("p=a", "p=b")
    rows.map(_.getLong(2)) shouldBe Array(2L, 2L)     // row counts from manifest
    rows(1).getLong(1) shouldBe 2L                    // two files in p=b
    // merge-on-read deletes poison exact counts: -1, never an overcount
    t.deleteByKeys(Seq(3L).toDF("id"))
    val after = DmlSql.run(spark, "SHOW PARTITIONS showparts_t")
      .orderBy("partition").collect()
    after.map(_.getLong(2)).toSet should contain (-1L)
  }

  test("DESCRIBE HISTORY and SHOW TBLPROPERTIES answer from metadata") {
    val t = Icebox(tmpDir("dml-hist"))
    t.append(Seq((1L, "a")).toDF("id", "s"))
    t.append(Seq((2L, "b")).toDF("id", "s"))
    t.setProperties(Map("write.compression" -> "zstd"))
    t.registerView(spark, "hist_t")
    val h = DmlSql.run(spark, "DESCRIBE HISTORY hist_t")
    h.columns should contain allOf ("snapshot_id", "operation", "timestamp_ms")
    h.count() shouldBe 2L
    val p = DmlSql.run(spark, "SHOW TBLPROPERTIES hist_t")
      .as[(String, String)].collect().toMap
    p("write.compression") shouldBe "zstd"
    // SET / UNSET round-trip through SQL; the MoR write modes are the
    // config a user actually sets this way
    DmlSql.run(spark,
      "ALTER TABLE hist_t SET TBLPROPERTIES ('write.upsert.mode'='merge-on-read', 'write.bloom.columns'='id')")
    val p2 = DmlSql.run(spark, "SHOW TBLPROPERTIES hist_t")
      .as[(String, String)].collect().toMap
    p2("write.upsert.mode") shouldBe "merge-on-read"
    p2("write.bloom.columns") shouldBe "id"
    DmlSql.run(spark, "ALTER TABLE hist_t UNSET TBLPROPERTIES ('write.bloom.columns')")
    DmlSql.run(spark, "SHOW TBLPROPERTIES hist_t")
      .as[(String, String)].collect().toMap.get("write.bloom.columns") shouldBe None
  }
}
