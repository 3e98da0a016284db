package graft

import org.apache.spark.sql.functions._
import graft.sql.{DmlSql, MergeSql, MvRewrite}
import graft.table.{Icebox, TableService}

/** Round-13 hardening from the round-12 advice: table_changes eviction
  * can't cross table-name prefixes, in-process MV DDL invalidates the
  * discovery registry inside the mtime granule, a stale analyze column
  * no longer blocks snapshot expiry, and out-of-sync star-view
  * properties fail loudly instead of silently dropping dims.
  */
class AdviceR12Spec extends SparkSpec {
  import spark.implicits._

  test("table_changes eviction never drops views of a prefix-extending table name") {
    val t1 = Icebox(tmpDir("adv12-tc1"))
    val t2 = Icebox(tmpDir("adv12-tc2"))
    Seq(t1, t2).foreach { t =>
      t.append((1L to 10L).map(i => (i, i.toDouble)).toDF("id", "v"))
      t.append(Seq((100L, 1.0)).toDF("id", "v"))
    }
    // `adv12_t` is a strict prefix of `adv12_t_archive` + underscore —
    // the old raw-prefix eviction filter matched BOTH tables' views
    MergeSql.register("adv12_t", t1)
    MergeSql.register("adv12_t_archive", t2)
    DmlSql.run(spark,
      "SELECT count(*) FROM table_changes('adv12_t_archive', 0, 1)").collect()
    // rewriting table_changes on the SHORT name must not evict the long
    // name's live view; a statement referencing both must keep working
    val both = DmlSql.run(spark,
      "SELECT (SELECT count(*) FROM table_changes('adv12_t', 0, 1)) AS a, " +
      "(SELECT count(*) FROM table_changes('adv12_t_archive', 0, 1)) AS b")
      .head
    both.getLong(0) shouldBe 1L
    both.getLong(1) shouldBe 1L
    val views = spark.sessionState.catalog
      .listLocalTempViews("__tc_adv12_t*").map(_.table)
    views should contain allOf ("__tc_adv12_t_0_1", "__tc_adv12_t_archive_0_1")
  }

  test("in-process CREATE/DROP MATERIALIZED VIEW invalidates the discovery registry") {
    MvRewrite.install(spark)
    val wh = tmpDir("adv12-mvwh")
    DmlSql.setWarehouse(wh)
    val srcA = Icebox(tmpDir("adv12-mvsrcA"))
    srcA.append((1 to 30).map(i => (i.toLong, i % 3, i * 2L)).toDF("id", "g", "v"))
    srcA.registerView(spark, "adv12_mvsrc_a")
    val srcB = Icebox(tmpDir("adv12-mvsrcB"))
    srcB.append((1 to 20).map(i => (i.toLong, i % 2, i * 3L)).toDF("id", "k", "w"))
    srcB.registerView(spark, "adv12_mvsrc_b")
    DmlSql.run(spark, "CREATE MATERIALIZED VIEW adv12_mv_a AS " +
      "SELECT g, count(*), sum(v) FROM adv12_mvsrc_a GROUP BY g")
    // warm the registry so a listing is cached against _mv's current mtime
    val qa = "SELECT g, sum(v) AS sv FROM adv12_mvsrc_a GROUP BY g"
    spark.sql(qa).inputFiles.exists(_.contains("_mv/adv12_mv_a")) shouldBe true
    val mvPath = new org.apache.hadoop.fs.Path(wh, "_mv")
    val fs = mvPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cachedMtime = fs.getFileStatus(mvPath).getModificationTime
    // CREATE a second view, then pin _mv's mtime BACK to the cached value,
    // simulating a coarse-granularity filesystem where the DDL lands in
    // the same granule as the cached listing: the mtime probe alone can
    // never notice — only the explicit in-process invalidation can
    DmlSql.run(spark, "CREATE MATERIALIZED VIEW adv12_mv_b AS " +
      "SELECT k, count(*), sum(w) FROM adv12_mvsrc_b GROUP BY k")
    fs.setTimes(mvPath, cachedMtime, -1)
    val served = spark.sql("SELECT k, sum(w) AS sw FROM adv12_mvsrc_b GROUP BY k")
    served.inputFiles.exists(_.contains("_mv/adv12_mv_b")) shouldBe true
    // DROP under a pinned mtime stops the rewrite immediately too
    DmlSql.run(spark, "DROP MATERIALIZED VIEW adv12_mv_b")
    fs.setTimes(mvPath, cachedMtime, -1)
    val after = spark.sql("SELECT k, sum(w) AS sw FROM adv12_mvsrc_b GROUP BY k")
    after.inputFiles.exists(_.contains("_mv/adv12_mv_b")) shouldBe false
  }

  test("a throwing auto-stats ANALYZE never blocks snapshot expiry") {
    val t = Icebox(tmpDir("adv12-svc"))
    t.append((1L to 50L).map(i => (i, i % 5)).toDF("id", "v"))
    t.append((51L to 60L).map(i => (i, i % 5)).toDF("id", "v"))
    t.append((61L to 70L).map(i => (i, i % 5)).toDF("id", "v"))
    // a corrupt sketch precision makes analyze() throw on every tick — the
    // stale-config shape the advice flagged (a dropped column is silently
    // skipped by the sketch build, so use the property that genuinely throws)
    t.setProperties(Map(
      "maintenance.analyze.columns" -> "v",
      "sketch.ndv.precision" -> "not_a_number",
      "maintenance.expire.max-age-ms" -> "1",
      "maintenance.expire.retain-last" -> "1"))
    val r = TableService.tick(spark, t,
      nowMs = System.currentTimeMillis() + 60000)
    // the bad column is reported, not thrown — and expiry still ran
    r.analyzeError.isDefined shouldBe true
    r.analyzedColumns shouldBe empty
    r.expiredSnapshots should not be empty
    // data untouched
    t.read(spark).count() shouldBe 70L
  }

  test("star view with out-of-sync mv.star.parents fails loudly, not wrong") {
    val fact = Icebox(tmpDir("adv12-fact"))
    fact.append((1 to 20).map(i => (i.toLong, (i % 4).toLong, i * 1L))
      .toDF("id", "dim_id", "v"))
    val dim = Icebox(tmpDir("adv12-dim"))
    dim.append((0 to 3).map(i => (i.toLong, s"seg$i")).toDF("d_id", "seg"))
    val dim2 = Icebox(tmpDir("adv12-dim2"))
    dim2.append((0 to 3).map(i => (i.toLong, s"reg$i")).toDF("e_id", "reg"))
    val target = Icebox(tmpDir("adv12-star"))
    import graft.operators.MaterializedView
    MaterializedView.refreshStar(spark, fact,
      Seq(MaterializedView.StarDim(dim, Seq("dim_id" -> "d_id"), -1),
          MaterializedView.StarDim(dim2, Seq("dim_id" -> "e_id"), -1)),
      target, "adv12star", Seq("seg", "reg"), Seq("v"), None)
    // persist a definition whose parents list is SHORTER than the dims
    // list (corrupt / hand-edited properties)
    target.setProperties(Map(
      "mv.id" -> "adv12star",
      "mv.source.dir" -> fact.tableDir,
      "mv.keys" -> "seg,reg",
      "mv.sums" -> "v",
      "mv.star.dims" -> s"${dim.tableDir};${dim2.tableDir}",
      "mv.star.names" -> "d;e",
      "mv.star.on" -> "dim_id=d_id;dim_id=e_id",
      "mv.star.parents" -> "-1")) // 1 parent for 2 dims
    fact.append(Seq((21L, 0L, 5L)).toDF("id", "dim_id", "v"))
    val e = intercept[IllegalArgumentException](
      MaterializedView.refreshFromProperties(spark, target))
    e.getMessage should include("out of sync")
  }
}
