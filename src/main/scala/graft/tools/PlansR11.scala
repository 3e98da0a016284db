package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.MaterializedView
import graft.sources.Testdata
import graft.table.Icebox

/** Round-11 evidence capture (output in PLANS.md): MIN/MAX materialized
  * views refresh in time proportional to the TOUCHED GROUPS, not the
  * source size — the touched-group recompute reads only the
  * stats-pruned source files that might hold the changed group keys.
  */
object PlansR11 {
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

    // ---- MIN/MAX MV refresh: O(touched groups), not O(source) ----
    // Source clustered by the group key (range partitioning + per-file
    // min/max stats on l_suppkey), so readForKeys prunes to the files
    // holding the touched groups. The SAME 5-group change batch runs
    // against a 60k-row and a 600k-row source; an O(source) recompute
    // would make the second refresh ~10x slower.
    println("== MIN/MAX MV refresh vs source size (same 5-group batch; expect ~1x) ==")
    val li = Testdata.table(spark, sf01, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_suppkey",
        $"l_quantity".cast("decimal(12,2)").as("l_quantity"),
        $"l_extendedprice".cast("decimal(12,2)").as("l_extendedprice"))
    val touchedGroups = Seq(7L, 77L, 177L, 277L, 377L)
    // constant ~7.5k rows per file (the 100 TB shape: bigger table = MORE
    // files, not bigger ones), so touched-group pruning admits the same
    // bytes at every scale
    val times = Seq(("warmup", li.filter($"l_orderkey" % 100 === 0), 4),
      ("60k", li.filter($"l_orderkey" % 10 === 0), 8), ("600k", li, 80)).map {
      case (tag, src0, nFiles) =>
        val src = Icebox(java.nio.file.Files.createTempDirectory(s"mm-src-$tag").toString)
        val batch = src0.filter($"l_suppkey".isin(touchedGroups: _*) &&
          $"l_orderkey" % 7 === 0)
        src.append(src0.except(batch).repartitionByRange(nFiles, $"l_suppkey"),
          collectStats = Seq("l_suppkey"))
        val mv = Icebox(java.nio.file.Files.createTempDirectory(s"mm-tgt-$tag").toString)
        timed(s"full_build@$tag") {
          require(MaterializedView.refresh(spark, src, mv, "m", Seq("l_suppkey"),
            Seq("l_quantity"), None, Seq("l_extendedprice")) == MaterializedView.FullBuild)
        }
        src.append(batch) // touches exactly 5 of ~1000 suppkey groups
        tag -> timed(s"incremental_minmax_refresh@$tag") {
          require(MaterializedView.refresh(spark, src, mv, "m", Seq("l_suppkey"),
            Seq("l_quantity"), None, Seq("l_extendedprice")) == MaterializedView.Incremental)
        }
    }
    println(f"  minmax refresh ratio (600k/60k source) ${times(2)._2 / times(1)._2}%6.1fx (data 10x)")
    spark.stop()
  }
}
