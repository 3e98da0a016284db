package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.MaterializedView
import graft.sources.Testdata
import graft.table.Icebox

/** Round-10b evidence capture (output in PLANS.md): (1) materialized-view
  * refresh cost scales with the CHANGE BATCH, not the source size; (2) the
  * manifest bloom index's commit-time overhead and planning-time pruning
  * effect at a file count where min/max stats are provably useless.
  */
object PlansR10b {
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
      println(f"  $label%-34s $s%8.2f s")
      s
    }

    // ---- 1. MV refresh: O(batch), not O(source) ----
    // same 600-row change batch against a 60k-row and a 600k-row source;
    // if refresh were O(source) the second refresh would be ~10x slower
    println("== MV refresh vs source size (same 600-row batch; expect ~1x) ==")
    val li = Testdata.table(spark, sf01, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        $"l_quantity".cast("decimal(12,2)").as("l_quantity"))
    val ratios = Seq(("warmup", li.filter($"l_orderkey" % 100 === 0)),
      ("60k", li.filter($"l_orderkey" % 10 === 0)), ("600k", li)).map {
      case (tag, src0) =>
        val src = Icebox(java.nio.file.Files.createTempDirectory(s"mv-src-$tag").toString)
        src.append(src0.filter($"l_orderkey" % 1000 =!= 0))
        val mv = Icebox(java.nio.file.Files.createTempDirectory(s"mv-tgt-$tag").toString)
        timed(s"full_build@$tag") {
          require(MaterializedView.refresh(spark, src, mv, "m",
            Seq("l_returnflag"), Seq("l_quantity")) == MaterializedView.FullBuild)
        }
        src.append(src0.filter($"l_orderkey" % 1000 === 0)) // ~0.1% batch
        tag -> timed(s"incremental_refresh@$tag") {
          require(MaterializedView.refresh(spark, src, mv, "m",
            Seq("l_returnflag"), Seq("l_quantity")) == MaterializedView.Incremental)
        }
    }
    println(f"  refresh ratio (600k/60k source) ${ratios(2)._2 / ratios(1)._2}%6.1fx (data 10x)")

    // ---- 2. Bloom index: commit overhead + pruning effect ----
    // interleaved keys across commits: every file's [min,max] spans the
    // domain, so min/max prunes NOTHING and only blooms tell files apart
    println("== bloom index: commit overhead and point-lookup pruning ==")
    val orders = Testdata.table(spark, sf01, "orders")
    def build(bloom: Boolean): Icebox = {
      val t = Icebox(java.nio.file.Files.createTempDirectory(s"bloom-$bloom").toString)
      if (bloom) t.setProperties(Map(
        "manifest.bloom.columns" -> "o_orderkey", "manifest.bloom.fpp" -> "0.01"))
      (0 until 4).foreach(i =>
        t.append(orders.filter($"o_orderkey" % 4 === i).repartition(16)))
      t
    }
    build(bloom = false) // warmup: absorb write-path JVM warmup
    val off = timed("4_commits_blooms_off")(build(bloom = false))
    var tb: Icebox = null
    val on = timed("4_commits_blooms_on") { tb = build(bloom = true) }
    println(f"  bloom commit overhead ${on / off}%6.2fx")
    val snap = tb.currentSnapshot.get
    val total = snap.files.size
    // probe a MEDIAN key: at the domain edge min/max would prune for free;
    // mid-domain, round-robin-scattered files all span it
    val med = orders.selectExpr("CAST(percentile_approx(o_orderkey, 0.5) AS LONG) AS m")
      .head.getLong(0)
    val probe = orders.filter($"o_orderkey" >= med).agg(min($"o_orderkey")).head.getLong(0)
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
    import org.apache.spark.sql.types.{LongType, StructType}
    val k = AttributeReference("o_orderkey", LongType)()
    val idx = new graft.plans.IceboxFileIndex(spark, tb.tableDir, snap, StructType(Nil))
    var kept = -1
    timed("point_lookup_plan_cold") {
      kept = idx.listFiles(Nil, Seq(EqualTo(k, Literal(probe)))).map(_.files.size).sum
    }
    timed("point_lookup_plan_warm") {
      idx.listFiles(Nil, Seq(EqualTo(k, Literal(probe)))).map(_.files.size).sum
    }
    val inRange = snap.files.count(_.stats.get("o_orderkey").exists {
      case (mn, mx) => mn.toLong <= probe && mx.toLong >= probe })
    println(s"  files: $total total, $inRange admitted by min/max, $kept by bloom")
    var absent = -1
    timed("absent_key_plan") {
      absent = idx.listFiles(Nil, Seq(EqualTo(k, Literal(-1L)))).map(_.files.size).sum
    }
    println(s"  absent key admits $absent files (no false negatives -> exact 0)")
    // eq-delete attach bound: one existing key deletes; bloom must bound
    // the attach list below the min/max-admitted count
    tb.setProperties(Map("write.upsert.mode" -> "merge-on-read"))
    timed("delete_by_key_bloom_attach") {
      tb.deleteByKeys(Seq(probe).toDF("o_orderkey"))
    }
    val attached = tb.currentSnapshot.get.files.count(_.eqDeletes.nonEmpty)
    println(s"  eq-delete attached to $attached of $total files (min/max admits $inRange)")
    spark.stop()
  }
}
