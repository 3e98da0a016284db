package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger
import graft.table.Icebox

/** Scratch (r17 VERDICT item 7): phase-level profile of q_mv_join to pin
  * its two-round creep (4.3 s r13 band → 5.01 s r15 → 6.23 s driver r16):
  * setup appends vs CREATE MV vs post-DML REFRESH vs the final SELECT.
  */
object MvJoinProfileR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var logJobs = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val site = js.stageInfos.map(si => s"${si.name}(${si.numTasks})").mkString(" | ").take(150)
        jobStart.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = jobStart.remove(je.jobId)
        if (logJobs && s != null)
          println(f"  JOB ${je.jobId}%3d ${(System.nanoTime() - s._1) / 1e9}%6.2f s  ${s._2}")
      }
    })
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toFile.getAbsolutePath
    def phase[T](name: String)(f: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PHASE $name%-24s ${dt}%6.2f s  jobs=${jobs.get() - j0}")
      r
    }
    val t = (name: String) => graft.sources.Testdata.table(spark, sfDir, name)
    def runOnce(tag: String): Unit = {
      println(s"== iteration $tag ==")
      val t0 = System.nanoTime()
      graft.sql.DmlSql.setWarehouse(tmp("mvjp_wh"))
      val fact = Icebox(tmp("mvjp_orders"))
      val o = t("orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(12,2)").as("o_totalprice"))
      phase("setup:fact-append") {
        fact.append(o.filter(col("o_orderkey") % 3 =!= 0))
        fact.registerView(spark, "mvjp_orders")
      }
      val dim = Icebox(tmp("mvjp_customer"))
      phase("setup:dim-append") {
        dim.append(t("customer").select(col("c_custkey"), col("c_mktsegment")))
        dim.registerView(spark, "mvjp_customer")
      }
      phase("create-mv") {
        graft.sql.DmlSql.run(spark,
          """CREATE MATERIALIZED VIEW mvjp AS
            |SELECT c_mktsegment, count(*), sum(o_totalprice)
            |FROM mvjp_orders JOIN mvjp_customer
            |  ON mvjp_orders.o_custkey = mvjp_customer.c_custkey
            |GROUP BY c_mktsegment""".stripMargin)
      }
      phase("dml:fact-append") {
        fact.append(o.filter(col("o_orderkey") % 3 === 0))
      }
      phase("dml:fact-delete") {
        fact.deleteByKeys(o.filter(col("o_orderkey") % 7 === 2)
          .select("o_orderkey").distinct())
      }
      phase("dml:dim-delete") {
        dim.deleteByKeys(t("customer")
          .filter(col("c_custkey") % 10 === 6).select("c_custkey").distinct())
      }
      phase("refresh") {
        logJobs = tag == "steady-2"
        val op = graft.sql.DmlSql.run(spark, "REFRESH MATERIALIZED VIEW mvjp")
          .head.getString(0)
        logJobs = false
        require(op == "refresh-mv:Incremental", op)
      }
      phase("final-select") {
        spark.sql("SELECT * FROM mvjp").select(col("c_mktsegment"), col("row_count"),
          round(col("sum_o_totalprice").cast("double"), 2).as("sum_o_totalprice"),
          col("nn_o_totalprice")).collect()
      }
      println(f"TOTAL $tag ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    runOnce("warm-up (JIT)")
    runOnce("steady-1")
    runOnce("steady-2")
    spark.stop()
  }
}
