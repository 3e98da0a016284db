package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger
import graft.table.Icebox

/** Scratch: phase-level profile of the q_mv_distinct workload shape (SQL
  * surface + COUNT DISTINCT touched-group recompute).
  */
object MvProfile2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(e => new graft.GraftExtensions().apply(e))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var logJobs = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val site = js.stageInfos.map(si => s"${si.name.takeWhile(_ != '(')}(${si.numTasks})")
          .mkString("|").take(120)
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
      println(f"PHASE $name%-28s ${dt}%6.2f s  jobs=${jobs.get() - j0}")
      r
    }
    def runOnce(tag: String): Unit = {
      println(s"== iteration $tag ==")
      graft.sql.DmlSql.setWarehouse(tmp("mvp2_wh"))
      val src = Icebox(tmp("mvp2_src"))
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_suppkey"))
      phase("append-even")(src.append(li.filter(col("l_orderkey") % 2 === 0)))
      phase("registerView")(src.registerView(spark, s"mvp2_lineitem_$tag"))
      phase("create-mv")(graft.sql.DmlSql.run(spark,
        s"""CREATE MATERIALIZED VIEW mvp2_$tag AS
          |SELECT l_returnflag, count(*), count(DISTINCT l_suppkey)
          |FROM mvp2_lineitem_$tag GROUP BY l_returnflag""".stripMargin))
      phase("append-odd")(src.append(li.filter(col("l_orderkey") % 2 === 1)))
      phase("deleteByKeys")(src.deleteByKeys(li.filter(col("l_orderkey") % 10 === 3)
        .select("l_orderkey").distinct()))
      logJobs = tag == "warm2"
      phase("refresh-mv")(graft.sql.DmlSql.run(spark,
        s"REFRESH MATERIALIZED VIEW mvp2_$tag"))
      logJobs = false
      phase("final-read")(spark.sql(s"SELECT * FROM mvp2_$tag")
        .write.format("noop").mode("overwrite").save())
    }
    runOnce("cold")
    runOnce("warm")
    runOnce("warm2")
    spark.stop()
  }
}
