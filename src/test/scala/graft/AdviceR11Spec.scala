package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir
import graft.sql.{DmlSql, MergeSql}
import graft.table.Icebox

/** Round-12 hardening from the round-11 advice: Dsir holds no persisted
  * state after a call, mixed-precision NDV sketches refuse instead of
  * crash, table_changes temp views are reused/evicted (bounded catalog),
  * and graft_hll_build rejects wrong arity with a clear message.
  */
class AdviceR11Spec extends SparkSpec {
  import spark.implicits._

  test("Dsir.importanceWeights leaves no persisted RDDs behind (leak fix)") {
    val corpus = (1L to 60L).map(i => (i, s"alpha beta gamma doc$i token${i % 7}"))
      .toDF("id", "text")
    val target = (1L to 10L).map(i => (i, s"alpha beta quality$i")).toDF("id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val w = Dsir.importanceWeights(corpus, target, "text", "id", buckets = 512)
    w.count() shouldBe 60L
    // the old implementation cached rawG/rawCnt/tgtCnt MEMORY_AND_DISK and
    // never released them — repeated calls accumulated blocks for the
    // session lifetime
    val after = spark.sparkContext.getPersistentRDDs.keySet
    (after -- before) shouldBe empty
    // and the weights are still deterministic, finite doubles
    w.agg(sum(when(isnan(col("weight")), 1).otherwise(0))).head.getLong(0) shouldBe 0L
  }

  test("mixed sketch.ndv.precision refuses with None, never throws") {
    val t = Icebox(tmpDir("adv11-ndv"))
    t.append((1L to 200L).map(i => (i, i % 37)).toDF("id", "v"))
    t.analyze(spark, Seq("v"))
    t.approxCountDistinctMeta("v").isDefined shouldBe true
    // change the precision property, then append — the new file sketches
    // inline at the NEW precision, making the coverage mixed
    t.setProperties(Map("sketch.ndv.precision" -> "8"))
    t.append((201L to 260L).map(i => (i, i % 37)).toDF("id", "v"))
    noException should be thrownBy t.approxCountDistinctMeta("v")
    t.approxCountDistinctMeta("v") shouldBe None
    // re-ANALYZE under the new precision doesn't crash either (the rollup
    // fold sees mixed per-file precisions and declines); a consistent
    // answer needs a fresh table or uniform re-sketch — refusal is the
    // contract, same as a missing sketch
    noException should be thrownBy t.analyze(spark, Seq("v"))
  }

  test("table_changes temp views are reused and per-table ranges evicted") {
    val t = Icebox(tmpDir("adv11-tc"))
    t.append((1L to 20L).map(i => (i, i.toDouble)).toDF("id", "v"))
    t.append(Seq((100L, 1.0)).toDF("id", "v"))
    t.append(Seq((200L, 2.0)).toDF("id", "v"))
    MergeSql.register("adv11_tc", t)
    def tcViews(): Seq[String] =
      spark.sessionState.catalog.listLocalTempViews("__tc_adv11_tc_*").map(_.table)
    DmlSql.run(spark, "SELECT count(*) FROM table_changes('adv11_tc', 0, 1)").collect()
    tcViews().length shouldBe 1
    // same range again: REUSED, not re-registered
    DmlSql.run(spark, "SELECT count(*) FROM table_changes('adv11_tc', 0, 1)").collect()
    tcViews().length shouldBe 1
    // a different range evicts the old one — bounded catalog footprint
    DmlSql.run(spark, "SELECT count(*) FROM table_changes('adv11_tc', 1, 2)").collect()
    val vs = tcViews()
    vs.length shouldBe 1
    vs.head should include("_1_2")
  }

  test("graft_hll_build rejects wrong arity with a clear message") {
    graft.functions.HllBuild.register(spark)
    Seq(1L, 2L).toDF("x").createOrReplaceTempView("adv11_hll")
    val e = intercept[Exception](
      spark.sql("SELECT graft_hll_build(xxhash64(x)) FROM adv11_hll").collect())
    e.getMessage should include("expects (hashCol, precision)")
  }
}
