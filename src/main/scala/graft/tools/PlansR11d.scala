package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.MaterializedView
import graft.sources.Testdata
import graft.table.Icebox

/** Round-11 evidence capture (output in PLANS.md): JOIN materialized
  * views refresh in time proportional to the CHANGE BATCH, not the fact
  * table's size. The bilinear delta rule's two non-delta reads — the dim
  * at its new snapshot joined to the fact diff, and the fact at its OLD
  * snapshot joined to the dim diff — both go through readForKeysAt, so
  * a fact table clustered on the join key admits only the files holding
  * the diff's join-key values however large the table grows.
  */
object PlansR11d {
  def main(args: Array[String]): Unit = {
    val sf01 = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $label%-40s $s%8.2f s")
      s
    }

    // ---- join-MV refresh: O(delta), not O(fact) ----
    // fact lineitem (join key l_suppkey) x dim supplier, grouped by the
    // dim's s_nationkey. Fact is range-clustered on the join key with
    // per-file stats and CONSTANT ~7.5k rows/file (bigger table = MORE
    // files — the 100 TB shape). The SAME change cycle runs at both
    // scales: a 5-suppkey fact append plus a 3-supplier dim delete. An
    // O(fact) refresh would make the second run ~10x slower.
    println("== join-MV refresh vs fact size (same change batch; expect ~1x) ==")
    val li = Testdata.table(spark, sf01, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_suppkey",
        $"l_quantity".cast("decimal(12,2)").as("l_quantity"))
    val dimAll = Testdata.table(spark, sf01, "supplier")
      .select($"s_suppkey", $"s_nationkey")
    val touched = Seq(7L, 77L, 177L, 277L, 377L)
    val times = Seq(("warmup", li.filter($"l_orderkey" % 100 === 0), 4),
      ("60k", li.filter($"l_orderkey" % 10 === 0), 8), ("600k", li, 80)).map {
      case (tag, fact0, nFiles) =>
        val fact = Icebox(java.nio.file.Files.createTempDirectory(s"jmv-f-$tag").toString)
        val dim = Icebox(java.nio.file.Files.createTempDirectory(s"jmv-d-$tag").toString)
        val batch = fact0.filter($"l_suppkey".isin(touched: _*) &&
          $"l_orderkey" % 7 === 0)
        fact.append(fact0.except(batch).repartitionByRange(nFiles, $"l_suppkey"),
          collectStats = Seq("l_suppkey"))
        dim.append(dimAll)
        val mv = Icebox(java.nio.file.Files.createTempDirectory(s"jmv-t-$tag").toString)
        timed(s"full_build@$tag") {
          require(MaterializedView.refreshJoin(spark, fact, dim, mv, "j",
            Seq("l_suppkey" -> "s_suppkey"), Seq("s_nationkey"),
            Seq("l_quantity")) == MaterializedView.FullBuild)
        }
        fact.append(batch) // touches exactly 5 suppkey groups
        dim.deleteByKeys(Seq(911L, 912L, 913L).toDF("s_suppkey"))
        tag -> timed(s"incremental_join_refresh@$tag") {
          require(MaterializedView.refreshJoin(spark, fact, dim, mv, "j",
            Seq("l_suppkey" -> "s_suppkey"), Seq("s_nationkey"),
            Seq("l_quantity")) == MaterializedView.Incremental)
        }
    }
    println(f"  join refresh ratio (600k/60k fact)     ${times(2)._2 / times(1)._2}%6.1fx (data 10x)")
    spark.stop()
  }
}
