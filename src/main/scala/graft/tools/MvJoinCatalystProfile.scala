package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for q_mv_join_catalyst's cold-draw cost (VERDICT r14,
  * Next #6): the bench's first two draws of this query have read 4-5.5 s
  * for three rounds while the end-of-suite rerun and committed history sit
  * at 1.0-1.4 s. Replays the query body with per-phase timers, N times in
  * one JVM, to attribute the first-draw delta (setup/append vs CREATE MV
  * refresh vs rule install + rewrite + collect). Run at the bench SF:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt -batch "runMain graft.tools.MvJoinCatalystProfile"
  */
object MvJoinCatalystProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the bench warms the session with q_count before any timed query
    graft.SparkEntry.queries("q_count")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    def ms(t0: Long): Long = (System.nanoTime() - t0) / 1000000

    def once(iter: Int): Unit = {
      def phase[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[profile] iter=$iter $name%-22s ${ms(t0)}%6d ms")
        r
      }
      val wh = java.nio.file.Files.createTempDirectory("qmvjc_wh").toString
      graft.sql.DmlSql.setWarehouse(wh)
      val fact = graft.table.Icebox(
        java.nio.file.Files.createTempDirectory("qmvjc_f").toString)
      val dim = graft.table.Icebox(
        java.nio.file.Files.createTempDirectory("qmvjc_d").toString)
      phase("append-fact") {
        fact.append(graft.sources.Testdata.table(spark, sfDir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority")))
      }
      phase("append-dim") {
        dim.append(graft.sources.Testdata.table(spark, sfDir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")))
      }
      phase("register-views") {
        fact.registerView(spark, "qmvjc_orders")
        dim.registerView(spark, "qmvjc_customer")
      }
      phase("create-mv") {
        graft.sql.DmlSql.run(spark,
          """CREATE MATERIALIZED VIEW qmvjc AS
            |SELECT c_mktsegment, o_orderpriority, count(*)
            |FROM qmvjc_orders JOIN qmvjc_customer
            |  ON qmvjc_orders.o_custkey = qmvjc_customer.c_custkey
            |GROUP BY c_mktsegment, o_orderpriority""".stripMargin)
      }
      graft.sql.MvRewrite.install(spark)
      try {
        val served = phase("sql-plan+inputFiles") {
          val df = spark.sql(
            """SELECT c_mktsegment, count(*) AS order_count
              |FROM qmvjc_orders JOIN qmvjc_customer ON o_custkey = c_custkey
              |GROUP BY c_mktsegment""".stripMargin)
          require(df.inputFiles.nonEmpty && df.inputFiles.forall(_.contains("/_mv/")))
          df
        }
        phase("collect") { served.collect() }
      } finally graft.sql.MvRewrite.uninstall(spark)
    }

    val n = args.headOption.map(_.toInt).getOrElse(4)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      once(i)
      println(f"[profile] iter=$i TOTAL ${ms(t0)}%6d ms")
    }
    spark.stop()
  }
}
