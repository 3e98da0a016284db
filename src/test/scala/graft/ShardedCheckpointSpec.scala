package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.table.Icebox

/** Sharded, content-addressed full checkpoints: above
  * `checkpoint.shard.threshold` live files, a checkpoint manifest stores
  * per-partition shard REFERENCES (`_snapshots/shards/<sha256>.json`)
  * instead of an inline file list. Untouched partitions serialize to the
  * same bytes → same sha → the existing shard file is reused, so
  * checkpoint IO is O(touched partitions); partition-scoped cold reads
  * load only matching shards. These specs drive the whole lifecycle:
  * write, round-trip, reuse, pruned reads, mixed generations, and
  * expiry's shared-shard-safe GC.
  */
class ShardedCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def wideDf(n: Int, parts: Int) =
    spark.range(n).select($"id", ($"id" % parts).cast("string").as("p"))

  private def manifestFiles(dir: String): Seq[java.nio.file.Path] =
    Files.list(Paths.get(dir, "_snapshots")).iterator().asScala.toSeq
      .filter(p => p.getFileName.toString.endsWith(".json"))

  private def shardFiles(dir: String): Seq[java.nio.file.Path] = {
    val d = Paths.get(dir, "_snapshots", "shards")
    if (!Files.exists(d)) Nil
    else Files.list(d).iterator().asScala.toSeq.filter(_.toString.endsWith(".json"))
  }

  private def manifestText(dir: String, id: Long): String =
    new String(Files.readAllBytes(Paths.get(dir, "_snapshots", s"$id.json")), "UTF-8")

  private def shasOf(manifestJson: String): Set[String] =
    "\"sha\"\\s*:\\s*\"([0-9a-f]{64})\"".r.findAllMatchIn(manifestJson).map(_.group(1)).toSet

  test("wide partitioned checkpoint shards, round-trips, and prunes") {
    val dir = tmpDir("shardckpt")
    val t = Icebox(dir)
    t.setProperties(Map("checkpoint.shard.threshold" -> "8"))
    val df = wideDf(200, 20)
    val snap = t.append(df, partitionBy = Seq("p"))

    val text = manifestText(dir, snap.id)
    text should include("\"shards\"")
    text should not include "\"files\""
    shardFiles(dir).size shouldBe 20 // one shard per partition
    shasOf(text).size shouldBe 20    // distinct content per partition

    // fresh handle: full resolution and pruned resolution both correct
    val fresh = Icebox(dir)
    assertSameRows(fresh.read(spark), df)
    assertSameRows(fresh.readPartitions(spark, "p", Set("7")), df.filter($"p" === "7"))
    fresh.prunedFiles("p", Set("7")).map(_.path) shouldBe
      fresh.currentSnapshot.get.files.filter(_.partition.get("p").contains("7")).map(_.path)
    // canonical order: in-memory commit state equals a fresh replay from disk
    fresh.currentSnapshot.get.files.map(_.path) shouldBe
      t.currentSnapshot.get.files.map(_.path)
  }

  test("a checkpoint after touching one partition reuses every other shard") {
    val dir = tmpDir("shardreuse")
    val t = Icebox(dir)
    t.setProperties(Map(
      "checkpoint.shard.threshold" -> "8",
      "checkpoint.interval" -> "4"))
    val first = t.append(wideDf(200, 20), partitionBy = Seq("p"))
    val firstShas = shasOf(manifestText(dir, first.id))

    // four single-partition appends force the next checkpoint (interval 4)
    var last = first
    (1 to 4).foreach { i =>
      last = t.append(Seq((1000L + i, "5")).toDF("id", "p"), partitionBy = Seq("p"))
    }
    val lastText = manifestText(dir, last.id)
    lastText should include("\"shards\"") // it IS a checkpoint
    val lastShas = shasOf(lastText)
    // 19 untouched partitions reference the SAME shard files; only p=5 differs
    (firstShas intersect lastShas).size shouldBe 19
    (lastShas diff firstShas).size shouldBe 1

    val fresh = Icebox(dir)
    fresh.read(spark).count() shouldBe 204
    assertSameRows(fresh.readPartitions(spark, "p", Set("5")),
      fresh.read(spark).filter($"p" === "5"))
  }

  test("unpartitioned wide tables hash-bucket their shards") {
    val dir = tmpDir("shardbucket")
    val t = Icebox(dir)
    t.setProperties(Map("checkpoint.shard.threshold" -> "8"))
    val df = spark.range(120).toDF("id").repartition(12)
    val snap = t.append(df)
    val text = manifestText(dir, snap.id)
    text should include("\"shards\"")
    shardFiles(dir).size should be <= 8
    val fresh = Icebox(dir)
    assertSameRows(fresh.read(spark), df)
    fresh.currentSnapshot.get.files.map(_.path) shouldBe
      t.currentSnapshot.get.files.map(_.path)
  }

  test("mixed-generation pruned reads stay exact through sharded checkpoints") {
    val dir = tmpDir("shardevolve")
    val t = Icebox(dir)
    t.setProperties(Map("checkpoint.shard.threshold" -> "8"))
    def df(lo: Int) = spark.range(lo, lo + 100)
      .select($"id", ($"id" % 7).cast("string").as("p"), ($"id" % 10).cast("string").as("q"))
    // generation 1: partitioned by q — these files carry no `p` value and
    // must be KEPT by `p` pruning (conservative) with the exact filter on top
    t.append(df(0), partitionBy = Seq("q"))
    t.setPartitionSpec(Seq("p"))
    t.append(df(100)) // generation 2: follows the evolved spec
    val full = t.read(spark)
    full.count() shouldBe 200
    val pruned = t.readPartitions(spark, "p", Set("3"))
    assertSameRows(pruned, full.filter($"p" === "3"))
    // fresh-handle cold path resolves the same
    assertSameRows(Icebox(dir).readPartitions(spark, "p", Set("3")), pruned)
  }

  test("expiry GC keeps shards shared with live checkpoints, drops dead ones") {
    val dir = tmpDir("shardgc")
    val t = Icebox(dir)
    t.setProperties(Map(
      "checkpoint.shard.threshold" -> "8",
      "checkpoint.interval" -> "2"))
    t.append(wideDf(200, 20), partitionBy = Seq("p")) // checkpoint A
    (1 to 2).foreach { i =>                           // deltas then checkpoint B
      t.append(Seq((2000L + i, "5")).toDF("id", "p"), partitionBy = Seq("p"))
    }
    val head = t.currentSnapshot.get
    manifestText(dir, head.id) should include("\"shards\"")
    val before = shardFiles(dir).size

    val expired = t.expireSnapshots(System.currentTimeMillis() + 1000, retainLast = 1)
    expired should not be empty
    // live = exactly the shas referenced by surviving manifests; A's stale
    // p=5 shard (and any losing-attempt debris) is gone
    val liveShas = manifestFiles(dir)
      .filter(_.getFileName.toString.stripSuffix(".json").forall(_.isDigit))
      .flatMap(p => shasOf(new String(Files.readAllBytes(p), "UTF-8"))).toSet
    shardFiles(dir).map(_.getFileName.toString.stripSuffix(".json")).toSet shouldBe liveShas
    shardFiles(dir).size should be < before

    val fresh = Icebox(dir)
    fresh.read(spark).count() shouldBe 202
    assertSameRows(fresh.readPartitions(spark, "p", Set("5")),
      fresh.read(spark).filter($"p" === "5"))
  }
}
