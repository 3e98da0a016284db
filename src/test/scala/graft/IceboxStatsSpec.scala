package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.functions._
import graft.table.Icebox

/** The CBO stats bridge: manifest rowCount / min-max / NDV reach
  * Catalyst's optimizer through [[graft.plans.IceboxStatsRule]], and a
  * broadcast decision actually FLIPS when the stats are present — the dim
  * side is identified as small by estimated rows-after-filter, not by
  * on-disk byte heuristics.
  */
class IceboxStatsSpec extends SparkSpec {

  /** A second session on the SAME SparkContext with the graft extensions
    * (pre-CBO stats rule) and CBO enabled — the shared test session has
    * neither, which doubles as the control group.
    */
  private lazy val cboSpark: SparkSession = {
    val base = spark // force shared session init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(e => new GraftExtensions().apply(e))
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  /** Stats visitors read `SQLConf.get` from the THREAD-LOCAL active
    * session — calling `.stats` from the test thread with the control
    * session active would silently gate CBO off. Scope the active session
    * to the block (execution itself wraps withActive, but plan-level
    * assertions here run on the test thread).
    */
  private def withCbo[T](body: => T): T = {
    val prev = SparkSession.getActiveSession
    SparkSession.setActiveSession(cboSpark)
    try body finally prev match {
      case Some(p) => SparkSession.setActiveSession(p)
      case None => SparkSession.clearActiveSession()
    }
  }

  private def collectPlan(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => collectPlan(a.executedPlan)
    case other => other +: other.children.flatMap(collectPlan)
  }

  test("optimizedPlan carries manifest rowCount, min/max, and NDV") { withCbo {
    import cboSpark.implicits._
    val t = Icebox(tmpDir("stats-basic"))
    t.append((1L to 1000L).map(i => (i, i % 50)).toDF("id", "grp"),
      collectStats = Seq("id", "grp"))
    t.analyze(cboSpark, Seq("grp"))
    val st = t.read(cboSpark).queryExecution.optimizedPlan.stats
    st.rowCount shouldBe Some(BigInt(1000))
    val byName = st.attributeStats.map { case (a, cs) => a.name -> cs }
    byName("id").min.map(_.toString) shouldBe Some("1")
    byName("id").max.map(_.toString) shouldBe Some("1000")
    val ndv = byName("grp").distinctCount.get.toLong
    ndv should be >= 45L // HLL ≈ 50 within error budget
    ndv should be <= 55L

    // the control session (no extensions / no CBO) plans from bytes only
    SparkSession.setActiveSession(spark) // control: stats read under the plain session
    try t.read(spark).queryExecution.optimizedPlan.stats.rowCount shouldBe None
    finally SparkSession.setActiveSession(cboSpark)
  } }

  test("broadcast decision flips when min/max selectivity is visible") { withCbo {
    import cboSpark.implicits._
    val dim = Icebox(tmpDir("stats-dim"))
    val fact = Icebox(tmpDir("stats-fact"))
    // dim: 20k rows, on-disk well above the broadcast threshold set below;
    // random-ish values so parquet can't compress it away
    dim.append((1L to 20000L).map(i => (i, i * 2654435761L % 1000003L))
      .toDF("id", "payload"), collectStats = Seq("id"))
    dim.analyze(cboSpark, Seq("id")) // NDV sketch: FilterEstimation needs distinctCount too
    fact.append((1L to 50000L).map(i => (i % 20000L + 1L, i.toDouble))
      .toDF("fk", "v"), collectStats = Seq("fk"))
    val dimBytes = dim.currentSnapshot.get.files.map(_.sizeBytes).sum
    val threshold = 10 * 1024
    assert(dimBytes > threshold, s"test setup: dim on disk $dimBytes must exceed $threshold")

    def joined(s: SparkSession) = {
      // filter keeps 10 of 20k dim rows — CBO with min/max estimates this
      // to a tiny relation; the byte heuristic still sees the full file size
      val d = dim.read(s).filter(col("id") <= 10L)
      fact.read(s).join(d, col("fk") === col("id")).agg(sum("v").as("s"), count(lit(1)).as("n"))
    }

    def withThreshold[T](s: SparkSession)(body: => T): T = {
      val old = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
      try body finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    }

    val (cboHasBroadcast, cboRows) = withThreshold(cboSpark) {
      val df = joined(cboSpark)
      (collectPlan(df.queryExecution.executedPlan)
        .exists(_.isInstanceOf[BroadcastExchangeExec]), canon(df))
    }
    val (plainHasBroadcast, plainRows) = withThreshold(spark) {
      val df = joined(spark)
      (collectPlan(df.queryExecution.executedPlan)
        .exists(_.isInstanceOf[BroadcastExchangeExec]), canon(df))
    }
    withClue("stats session must broadcast the filtered dim:") {
      cboHasBroadcast shouldBe true
    }
    withClue("byte-heuristic session must NOT broadcast (file exceeds threshold):") {
      plainHasBroadcast shouldBe false
    }
    cboRows shouldBe plainRows // the plan changed; the answer did not
  } }

  test("refusal: MoR deletes drop the stats, plans fall back to bytes") { withCbo {
    import cboSpark.implicits._
    val t = Icebox(tmpDir("stats-mor"))
    t.append((1L to 500L).map(i => (i, i.toDouble)).toDF("id", "v"),
      collectStats = Seq("id"))
    t.read(cboSpark).queryExecution.optimizedPlan.stats.rowCount shouldBe Some(BigInt(500))
    t.setProperties(Map("write.delete.mode" -> "merge-on-read"))
    graft.sql.MergeSql.register("stats_mor_t", t)
    graft.sql.DmlSql.delete(cboSpark, "DELETE FROM stats_mor_t WHERE id IN (1, 2, 3)")
    t.currentSnapshot.get.files.count(_.deletes.nonEmpty) should be > 0
    // row counts would overstate under merge-on-read deletes — refuse
    graft.plans.IceboxStats.invalidate()
    t.read(cboSpark).queryExecution.optimizedPlan.stats.rowCount shouldBe None
  } }
}
