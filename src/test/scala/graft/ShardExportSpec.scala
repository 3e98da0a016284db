package graft

import org.apache.spark.sql.functions._
import graft.operators.ShardExport

/** Deterministic shard export: assignment equals a driver-side replay of
  * the md5 global order, is invariant under input repartitioning, and the
  * manifest reconstructs counts/sums/content hashes exactly.
  */
class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def docs = (0L until 300L).map(i => (i, (i % 50) + 1)).toDF("id", "n")

  private def refAssign(seed: String, perShard: Long): Map[Long, Long] = {
    val ordered = (0L until 300L).map(i => (i, (i % 50) + 1, md5hex(seed + i)))
      .sortBy(t => (t._3, t._1))
    var acc = 0L
    ordered.map { case (id, n, _) =>
      val shard = acc / perShard
      acc += n
      id -> shard
    }.toMap
  }

  test("assignment equals the driver-side md5-order replay") {
    val got = ShardExport.assignShards(docs, $"id", $"n", 1000L, seed = "s")
      .select($"id", $"shard_id").as[(Long, Long)].collect().toMap
    got shouldBe refAssign("s", 1000L)
  }

  test("assignment is invariant under input repartitioning and re-runs") {
    def run(d: org.apache.spark.sql.DataFrame) =
      ShardExport.assignShards(d, $"id", $"n", 700L, seed = "x")
        .select($"id", $"shard_id").as[(Long, Long)].collect().toMap
    val base = run(docs)
    run(docs.repartition(17)) shouldBe base
    run(docs.coalesce(1)) shouldBe base
    run(docs.orderBy(desc("n"))) shouldBe base
    run(docs) shouldBe base // re-run identity
    // different seed = a different (but still deterministic) permutation
    ShardExport.assignShards(docs, $"id", $"n", 700L, seed = "y")
      .select($"id", $"shard_id").as[(Long, Long)].collect().toMap should not be base
  }

  test("shards are contiguous in the order, dense from 0, and budget-bounded") {
    val perShard = 800L
    val assigned = ShardExport.assignShards(docs, $"id", $"n", perShard, seed = "s")
      .select($"id", $"n", $"shard_id").as[(Long, Long, Long)].collect()
    val ordered = assigned.map { case (id, n, sh) => (md5hex("s" + id), id, n, sh) }
      .sortBy(t => (t._1, t._2))
    // shard ids never decrease along the order and are dense from 0
    ordered.map(_._4).foldLeft(0L) { (prev, sh) =>
      sh should (be(prev) or be(prev + 1)); sh
    }
    ordered.head._4 shouldBe 0L
    // every doc STARTS inside its shard (greedy convention)
    var acc = 0L
    ordered.foreach { case (_, _, n, sh) => (acc / perShard) shouldBe sh; acc += n }
  }

  test("manifest reconstructs counts, token sums, and the content hash") {
    val perShard = 900L
    val m = ShardExport.shardManifest(docs, $"id", $"n", perShard, seed = "s")
      .select($"shard_id", $"doc_count", $"token_count", $"content_sha")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // reference manifest from the same driver-side replay
    val byShard = (0L until 300L).map(i => (i, (i % 50) + 1, md5hex("s" + i)))
      .sortBy(t => (t._3, t._1))
      .foldLeft((0L, Vector.empty[(Long, Long, Long)])) { case ((acc, out), (id, n, _)) =>
        (acc + n, out :+ ((acc / perShard, id, n)))
      }._2.groupBy(_._1)
    m.keySet shouldBe byShard.keySet
    for ((sh, members) <- byShard) {
      val (_, dc, tc, sha) = m(sh)
      dc shouldBe members.size.toLong
      tc shouldBe members.map(_._3).sum
      val expectSha = md5hex(members
        .map { case (_, id, n) => (md5hex("s" + id), id, n) }
        .sortBy(t => (t._1, t._2))
        .map { case (_, id, n) => s"$id:$n" }.mkString(","))
      sha shouldBe expectSha
    }
  }
}
