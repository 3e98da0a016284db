package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Testdata
import graft.table.Icebox

/** Scale-up validation for the TABLE-FORMAT paths (round-9 brief item 5):
  * the O(delta) manifest claims, eq-delete attach lists, and compaction
  * curves have only ever been measured at sf0.1 — this runs the same
  * operation set at sf0.1 and at a 10× synthetic sf1 and prints per-op
  * timings, so superlinear surprises show up as a ratio far above 10×
  * (per-op expectations in PLANS.md).
  *
  * sf1 inputs are derived (driver-side, once, under /tmp — /root/testdata
  * is read-only): lineitem/orders from sf0.1 unioned 10× with shifted keys,
  * preserving key distributions and row widths. Ops timed per scale:
  * full append (write path + footer-stats pass), metadata COUNT(*),
  * incremental changesSince, merge-on-read upsert batch (eq-delete commit),
  * deleteByKeys, readIndexed filter (manifest-pruned scan), compact,
  * snapshot listing over the accumulated history.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val sf01 = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val sf1Dir = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    // phases: "all" | "data" (sf0.1-vs-sf1 + deep history) | "wide"
    val mode = if (args.length > 2) args(2) else "all"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- derive sf1 once (10x key-shifted copies of sf0.1 lineitem) ----
    val liPath = s"$sf1Dir/lineitem.parquet"
    if (!new java.io.File(liPath).exists()) {
      val li01 = Testdata.table(spark, sf01, "lineitem")
      val maxKey = li01.agg(max("l_orderkey")).head().getLong(0) + 1
      (0 until 10).map(i => li01.withColumn("l_orderkey", col("l_orderkey") + lit(i * maxKey)))
        .reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(liPath)
    }

    def timed(label: String)(body: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $label%-22s $s%8.2f s")
      label -> s
    }

    def runScale(tag: String, li: DataFrame): Seq[(String, Double)] = {
      println(s"== $tag: ${li.count()} lineitem rows ==")
      val dir = java.nio.file.Files.createTempDirectory(s"scale-$tag").toString
      val table = Icebox(dir)
      table.setProperties(Map("write.upsert.mode" -> "merge-on-read"))
      val out = Seq.newBuilder[(String, Double)]
      out += timed("append_full") {
        table.append(li, collectStats = Seq("l_orderkey"))
      }
      val s0 = table.currentSnapshotId
      out += timed("count_meta") {
        require(table.rowCount.isDefined && table.rowCount.get == li.count())
      }
      out += timed("append_batch") { // the 5-minute CDC commit shape
        table.append(li.filter(col("l_orderkey") % 1000 === 0))
      }
      out += timed("changes_since") {
        require(table.changesSince(spark, s0).count() > 0)
      }
      out += timed("upsert_mor_batch") { // eq-delete + append, one commit
        val batch = li.filter(col("l_orderkey") % 500 === 3)
          .withColumn("l_quantity", col("l_quantity") + 1)
        graft.operators.Upsert.intoTableMor(table, batch,
          Seq("l_orderkey", "l_linenumber"), None)
      }
      out += timed("delete_mor_keys") {
        import spark.implicits._
        table.deleteByKeys((1L to 50L).map(_ * 997).toDF("l_orderkey"))
      }
      out += timed("indexed_filter_read") {
        table.readIndexed(spark).filter(col("l_orderkey") < 1000)
          .write.format("noop").mode("overwrite").save()
      }
      out += timed("full_read") {
        table.read(spark).write.format("noop").mode("overwrite").save()
      }
      out += timed("compact") { table.compact(spark) }
      out += timed("snapshots_list") {
        require(table.allSnapshots.size >= 5)
      }
      out.result()
    }

    import spark.implicits._
    if (mode != "wide") {
      // warmup pass (untimed in the comparison): absorbs codegen/committer
      // JVM warmup so the sf0.1-vs-sf1 ratios compare steady-state costs
      runScale("warmup", Testdata.table(spark, sf01, "lineitem")
        .filter(col("l_orderkey") % 10 === 0))
      val r01 = runScale("sf0.1", Testdata.table(spark, sf01, "lineitem"))
      val r1 = runScale("sf1", spark.read.parquet(liPath))
      println("== ratios (sf1 / sf0.1; data is 10x) ==")
      r01.zip(r1).foreach { case ((k, a), (_, b)) =>
        println(f"  $k%-22s ${b / math.max(a, 1e-9)}%6.1fx")
      }

      // ---- commit-COUNT scaling: the O(delta)+checkpoint manifest claim ----
      // a fresh handle's head resolve must replay at most MaxDeltaChain (16)
      // delta manifests regardless of history depth; listing never resolves
      println("== deep history (60 vs 240 commits; cost must NOT scale with depth) ==")
      val tiny = (1 to 50).map(i => (i.toLong, s"r$i")).toDF("id", "s").coalesce(1)
      Seq(60, 240).foreach { depth =>
        val hd = Icebox(java.nio.file.Files.createTempDirectory(s"scale-hist$depth").toString)
        (1 to depth).foreach(_ => hd.append(tiny))
        timed(s"resolve_head@$depth") {
          require(Icebox(hd.tableDir).currentSnapshot.get.files.size == depth)
        }
        timed(s"list_snapshots@$depth") {
          require(Icebox(hd.tableDir).allSnapshots.size == depth)
        }
      }
    }
    if (mode == "data") { spark.stop(); return }

    // ---- wide table: sharded checkpoints (round-10 brief item 5) ----
    // ≥10k files across two spec generations. The claims under test:
    // (a) a checkpoint after a single-partition commit writes O(touched)
    //     shard bytes (content-addressed reuse), so its commit time is
    //     ~flat in table WIDTH;
    // (b) a cold partition-scoped read resolves O(matching shards), so
    //     its time is also ~flat in width (vs cold FULL resolve, which
    //     must touch every shard and may scale).
    println("== wide table: sharded checkpoints (cost ~ touched partitions, not width) ==")
    Seq(1000, 10000).foreach { width =>
      val wd = Icebox(java.nio.file.Files.createTempDirectory(s"scale-wide$width").toString)
      wd.setProperties(Map(
        "checkpoint.interval" -> "4",
        "checkpoint.max.shards" -> "20000")) // per-partition shards at 10k width
      val df = spark.range(width * 2L).select(col("id"),
        (col("id") % width).cast("string").as("pk"),
        (col("id") % 16).cast("string").as("pk2"))
        .repartition(col("pk"))
      timed(s"initial_write@$width") { wd.append(df, partitionBy = Seq("pk")) }
      val files0 = wd.currentSnapshot.get.fileCount
      require(files0 >= width, s"expected >= $width files, got $files0")
      // second spec generation: old layout stays live, new batches land by pk2
      wd.setPartitionSpec(Seq("pk2"))
      def onePart(i: Int) =
        Seq((100000L + i, "42", (i % 16).toString)).toDF("id", "pk", "pk2")
      wd.append(onePart(1)) // gen-2 delta (depth 1)
      (2 to 3).foreach(i => wd.append(onePart(i)))
      val shardDir = java.nio.file.Paths.get(wd.tableDir, "_snapshots", "shards")
      val before = java.nio.file.Files.list(shardDir).count()
      timed(s"checkpoint_commit@$width") { wd.append(onePart(4)) } // depth 4 -> checkpoint
      val after = java.nio.file.Files.list(shardDir).count()
      println(s"  checkpoint@$width rewrote ${after - before} of $after shards")
      timed(s"cold_resolve_full@$width") {
        require(Icebox(wd.tableDir).currentSnapshot.get.files.size >= width)
      }
      timed(s"cold_resolve_pruned@$width") {
        require(Icebox(wd.tableDir).prunedFiles("pk", Set("7")).nonEmpty)
      }
      // pruned read correctness at width (exact filter over mixed gens)
      val got = wd.readPartitions(spark, "pk", Set("42")).count()
      val want = wd.read(spark).filter(col("pk") === "42").count()
      require(got == want, s"pruned read $got != $want")
    }
    spark.stop()
  }
}
