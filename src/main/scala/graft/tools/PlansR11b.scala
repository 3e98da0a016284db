package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.table.Icebox

/** Round-11b ScaleCheck (output in PLANS.md): deep-history + wide-table
  * COMPOSITION stress. Sharded content-addressed checkpoints (r10) and
  * O(delta) manifests (r8) are each proven in isolation; this composes
  * them on one table: ~10k data files accumulated over 250 commits,
  * with interleaved merge-on-read equality deletes, branch refs, and a
  * mid-history partition-spec change (two coexisting layout
  * generations). At waypoints it measures, from a FRESH handle (the
  * per-handle shard/manifest caches are cold):
  *
  *  - cold head resolution (currentSnapshot.files materialized)
  *  - single-partition plan time (prunedFiles)
  *  - a 1-partition append's commit wall time
  *
  * All three must stay roughly flat as history deepens and the file
  * count grows — resolution is bounded by checkpoint.interval delta
  * manifests + touched shards, planning by the pruned partition's
  * shards, commit by the touched partition — none by total history.
  */
object PlansR11b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timedMs(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
    }

    val dir = java.nio.file.Files.createTempDirectory("scalecheck").toString
    val table = Icebox(dir)
    table.setProperties(Map(
      "checkpoint.shard.threshold" -> "64",
      "write.upsert.mode" -> "merge-on-read"))
    table.setPartitionSpec(Seq("p"))

    val nCommits = 250
    val waypoints = Set(10, 50, 100, 150, 200, 250)
    // each commit: ~40 tiny files over 4 partitions (of 100) -> ~10k files
    def batch(i: Int) = {
      val base = (i * 13) % 100
      spark.range(200).select(
        ($"id" + i * 1000).as("id"),
        (($"id" % 4 + base) % 100).cast("string").as("p"),
        ($"id" % 10).cast("string").as("q"),
        ($"id" * 3).as("v"))
        .repartition(40)
    }

    println("== deep-history x wide-table composition (250 commits, ~10k files, MoR deletes, branches, 2 spec generations) ==")
    println(f"${"commits"}%8s ${"files"}%7s ${"coldResolve_ms"}%15s ${"planPrune_ms"}%13s ${"commit1p_ms"}%12s")
    (1 to nCommits).foreach { i =>
      table.append(batch(i))
      if (i % 10 == 0) // merge-on-read delete: eq-delete files attach, no rewrite
        table.deleteByKeys(Seq.tabulate(20)(k => i * 1000L + k * 7L).toDF("id"))
      if (i % 50 == 0) table.createBranch(s"audit-$i")
      if (i == 125) table.setPartitionSpec(Seq("p", "q")) // generation 2
      if (waypoints(i)) {
        val cold = Icebox(dir)
        var files = 0
        val rMs = timedMs { files = cold.currentSnapshot.get.files.size }
        val cold2 = Icebox(dir)
        val pMs = timedMs { cold2.prunedFiles("p", Set("7")) }
        val cMs = timedMs {
          table.append(Seq((9000000L + i, "7", "0", 1L)).toDF("id", "p", "q", "v"))
        }
        println(f"$i%8d $files%7d $rMs%15.0f $pMs%13.0f $cMs%12.0f")
      }
    }
    // composed correctness: the accumulated state still answers exactly —
    // per-partition read equals a filter of the full read, branches still
    // resolve, both layout generations union
    val full = table.read(spark)
    val p7full = full.filter($"p" === "7").count()
    val p7pruned = table.readPartitions(spark, "p", Set("7")).count()
    require(p7full == p7pruned, s"pruned read drifted: $p7full vs $p7pruned")
    val gens = table.currentSnapshot.get.files.map(_.partition.keys.toSet).distinct
    require(gens.size == 2, s"expected 2 layout generations, got $gens")
    require(table.branchSnapshot("audit-50").id != table.currentSnapshotId,
      "branch ref must pin its snapshot")
    println(s"  correctness: pruned-read parity ($p7pruned rows), 2 generations, branch pinned: OK")
    spark.stop()
  }
}
