package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.table.Icebox

/** Scratch: phase-level wall breakdown of the q_mv_distinct shape (sf0.1). */
object MvDistinctProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toFile.getAbsolutePath
    def phase[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    (1 to 2).foreach { it =>
      println(s"== iteration $it ==")
      graft.sql.DmlSql.setWarehouse(tmp("qmvd_wh"))
      val src = Icebox(tmp("qmvd_src"))
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_suppkey"))
      phase("append-even")(src.append(li.filter(col("l_orderkey") % 2 === 0)))
      src.registerView(spark, "qmvd_lineitem")
      phase("create-mv")(graft.sql.DmlSql.run(spark,
        """CREATE MATERIALIZED VIEW qmvd AS
          |SELECT l_returnflag, count(*), count(DISTINCT l_suppkey)
          |FROM qmvd_lineitem GROUP BY l_returnflag""".stripMargin))
      phase("append-odd")(src.append(li.filter(col("l_orderkey") % 2 === 1)))
      phase("delete-keys")(src.deleteByKeys(li.filter(col("l_orderkey") % 10 === 3)
        .select("l_orderkey").distinct()))
      phase("refresh")(graft.sql.DmlSql.run(spark, "REFRESH MATERIALIZED VIEW qmvd"))
      phase("final-select")(spark.sql("SELECT * FROM qmvd").collect())
    }
    spark.stop()
  }
}
