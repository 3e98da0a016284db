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

  test("histogram consumer: skew-aware selectivity flips a broadcast min/max alone gets wrong") { withCbo {
    import cboSpark.implicits._
    val dim = Icebox(tmpDir("stats-skewdim"))
    val fact = Icebox(tmpDir("stats-skewfact"))
    // SKEWED dim: 99% of 30k rows in [0,10], 1% spread over (10,10000].
    // A predicate on the sparse tail is where uniform density lies:
    // min/max estimates `v >= 200` at ~98% of rows (the tail's WIDTH
    // share), the histogram knows it's ~1% (the tail's MASS share). The
    // literal sits past the first equi-width bucket boundary (~156), so
    // the skewed head mass is fully outside the covered bins — within-
    // bucket uniformity can't smear it into the estimate.
    val lowRows = (1L to 29700L).map(i => (i, (i % 11).toDouble))
    val tailRows = (29701L to 30000L).map(i => (i, 10.0 + (i % 999) * 10.0))
    dim.append((lowRows ++ tailRows).toDF("id", "v"), collectStats = Seq("id", "v"))
    dim.analyze(cboSpark, Seq("id", "v"))
    dim.analyzeHistogram(cboSpark, "v", buckets = 64)
    fact.append((1L to 60000L).map(i => (i % 30000L + 1L, i.toDouble))
      .toDF("fk", "w"), collectStats = Seq("fk"))

    def joined(withHist: Boolean) = {
      graft.plans.IceboxStats.invalidate()
      // histogram absence is simulated by blanking the property (the
      // bridge's parse refuses it); presence by a fresh ANALYZE HISTOGRAM
      if (!withHist) dim.setProperties(Map("hist.v" -> ""))
      else dim.analyzeHistogram(cboSpark, "v", buckets = 64)
      val d = dim.read(cboSpark).filter(col("v") >= 200.0)
      fact.read(cboSpark).join(d, col("fk") === col("id")).agg(sum("w").as("s"))
    }
    val threshold = 64 * 1024 // between the ~1% and ~99% row estimates
    val old = cboSpark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    cboSpark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
    try {
      // force each plan INSIDE its histogram state — planning is lazy, so
      // interleaving the two builds would plan both under the second state
      val noHist = joined(withHist = false)
      val bcNo = collectPlan(noHist.queryExecution.executedPlan)
        .exists(_.isInstanceOf[BroadcastExchangeExec])
      val rowsNo = canon(noHist)
      val withH = joined(withHist = true)
      val bcYes = collectPlan(withH.queryExecution.executedPlan)
        .exists(_.isInstanceOf[BroadcastExchangeExec])
      withClue("uniform min/max estimate must refuse the broadcast (~29.7k-row estimate):") {
        bcNo shouldBe false
      }
      withClue("histogram estimate must take the broadcast (~300-row estimate):") {
        bcYes shouldBe true
      }
      rowsNo shouldBe canon(withH) // the decision changed; the answer did not
    } finally cboSpark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  } }

  test("3-table join ORDER flips: CBO pairs the fact with the tiny dim first") { withCbo {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import cboSpark.implicits._
    val fact = Icebox(tmpDir("ro-fact"))
    val tiny = Icebox(tmpDir("ro-tiny"))
    val mid = Icebox(tmpDir("ro-mid"))
    fact.append((1L to 50000L).map(i => (i, i % 5L + 1L, i % 5000L + 1L, i.toDouble))
      .toDF("id", "bk", "ck", "v"), collectStats = Seq("bk", "ck"))
    tiny.append((1L to 5L).map(k => (k, s"t$k")).toDF("b_id", "b_name"))
    mid.append((1L to 5000L).map(k => (k, s"m$k")).toDF("c_id", "c_name"))
    // NDV on every join key: JoinEstimation sizes an equi-join from the
    // key distinct counts, and CostBasedJoinReorder only reorders items
    // whose estimates it trusts
    fact.analyze(cboSpark, Seq("bk", "ck"))
    tiny.analyze(cboSpark, Seq("b_id"))
    mid.analyze(cboSpark, Seq("c_id"))

    // written order joins the 5000-row mid FIRST — the expensive shape;
    // the 5-row tiny dim is declared last
    def query(s: SparkSession) =
      fact.read(s)
        .join(mid.read(s), col("ck") === col("c_id"))
        .join(tiny.read(s), col("bk") === col("b_id"))
        .agg(count(lit(1)).as("n"), sum("v").as("s"))

    /** Table dirs under the INNERMOST join (both children join-free). */
    def firstJoinDirs(plan: LogicalPlan): Set[String] = {
      def dirs(p: LogicalPlan): Set[String] = p.collect {
        case LogicalRelation(r: HadoopFsRelation, _, _, _, _)
            if r.location.isInstanceOf[graft.plans.IceboxFileIndex] =>
          r.location.asInstanceOf[graft.plans.IceboxFileIndex].tableDirString
      }.toSet
      plan.collect {
        case j: Join if !j.left.exists(_.isInstanceOf[Join]) &&
          !j.right.exists(_.isInstanceOf[Join]) => dirs(j)
      }.headOption.getOrElse(Set.empty)
    }

    val cboFirst = firstJoinDirs(query(cboSpark).queryExecution.optimizedPlan)
    withClue("CBO must pair the fact with the TINY dim first (reorder):") {
      cboFirst shouldBe Set(fact.tableDir, tiny.tableDir)
    }
    // the control session keeps the written (expensive) order
    SparkSession.setActiveSession(spark)
    val plainFirst = try firstJoinDirs(query(spark).queryExecution.optimizedPlan)
    finally SparkSession.setActiveSession(cboSpark)
    plainFirst shouldBe Set(fact.tableDir, mid.tableDir)
    // and the answer is order-independent
    canon(query(cboSpark)) shouldBe canon(query(spark))
  } }

  test("rule is a strict no-op when CBO is off (no planning overhead for non-CBO users)") {
    import spark.implicits._
    val t = Icebox(tmpDir("stats-noop"))
    t.append((1L to 100L).map(i => (i, i * 2)).toDF("id", "v"), collectStats = Seq("id"))
    val plan = t.read(spark).queryExecution.analyzed
    // the control session has cbo/planStats off → the rule must return the
    // SAME plan object without touching manifests or the cache
    val rule = new graft.plans.IceboxStatsRule(spark)
    graft.plans.IceboxStats.invalidate()
    rule(plan) should be theSameInstanceAs plan
    // and the kill switch overrides even a CBO session
    cboSpark.conf.set("spark.graft.stats.enabled", "false")
    try new graft.plans.IceboxStatsRule(cboSpark)(plan) should be theSameInstanceAs plan
    finally cboSpark.conf.set("spark.graft.stats.enabled", "true")
  }

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
