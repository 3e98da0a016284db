package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.9f, 0.1f)),
    (4L, Array(0.0f, 0.0f, 1.0f)),
    (5L, Array(0.5f, 0.5f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosine expression computes exact values") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 1.0f), Array(1.0f, 1.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 0.0f), 0.0) // zero norm guard
    ).toDF("a", "b", "expect")
    val got = df.select(Similarity.cosine($"a", $"b").as("c"), $"expect").collect()
    got.foreach(r => r.getDouble(0) shouldBe r.getDouble(1) +- 1e-9)
  }

  test("bruteForceTopK returns ranked nearest neighbors per query") {
    val queries = vecs.filter($"vec_id" === 0L)
    val out = Similarity.bruteForceTopK(vecs, queries, k = 2)
    val rows = out.orderBy("rank").collect()
    rows.map(_.getLong(1)).toSeq shouldBe Seq(1L, 5L) // 0.9-vec first, diagonal second
    rows(0).getInt(3) shouldBe 1
  }

  test("lshTopK finds the same top neighbor for clustered vectors") {
    val queries = vecs.filter($"vec_id" === 0L)
    val out = Similarity.lshTopK(vecs, queries, k = 1, dim = 3, planes = 2)
    // bucket must contain the obvious near neighbor (same orthant)
    val ids = out.select("neighbor_id").as[Long].collect().toSet
    ids should contain(1L)
  }

  test("ivfTopK probes nearest centroid lists and ranks by cosine") {
    val queries = vecs.filter($"vec_id" === 0L)
    val out = Similarity.ivfTopK(vecs, queries, k = 2, nlist = 3, nprobe = 3)
    val rows = out.orderBy("rank").collect()
    rows.map(_.getLong(1)).headOption shouldBe Some(1L)
  }

  test("ivfTopKKmeans uses trained centroids and finds the exact top neighbor") {
    val queries = vecs.filter($"vec_id" === 0L)
    val out = Similarity.ivfTopKKmeans(vecs, queries, k = 2, nlist = 3, nprobe = 3)
      .orderBy("rank").collect()
    out.map(_.getLong(1)).headOption shouldBe Some(1L)
    // deterministic across runs (seeded KMeans)
    val again = Similarity.ivfTopKKmeans(vecs, queries, k = 2, nlist = 3, nprobe = 3)
      .orderBy("rank").collect()
    out.map(_.toString).toSeq shouldBe again.map(_.toString).toSeq
  }

  test("ivfTrain centroids persist through a table round-trip and reproduce ivfTopKKmeans") {
    val queries = vecs.filter($"vec_id" === 0L)
    val centroids = Similarity.ivfTrain(vecs, nlist = 3)
    // persist → reload (the 100 TB shape: train once, reuse per batch)
    val dir = tmpDir("ivf-centroids")
    centroids.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val direct = Similarity.ivfTopKKmeans(vecs, queries, k = 2, nlist = 3, nprobe = 3)
      .collect().map(_.toString).sorted.toSeq
    val replayed = Similarity.ivfTopKWith(vecs, queries, reloaded, k = 2, nprobe = 3)
      .collect().map(_.toString).sorted.toSeq
    replayed shouldBe direct
  }

  test("brute force plan broadcasts the query side (no corpus shuffle)") {
    val queries = vecs.filter($"vec_id" < 2)
    val plan = Similarity.bruteForceTopK(vecs, queries, k = 2)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastNestedLoopJoin")
  }

  test("persisted IVF index: incremental inserts + search == one-shot ivfTopKWith") {
    val index = graft.table.Icebox(tmpDir("ivf-index"))
    val centroids = Similarity.ivfTrain(vecs, nlist = 3)
    // two ingest waves accrete the index
    Similarity.ivfInsert(index, centroids, vecs.filter($"vec_id" % 2 === 0)) shouldBe 3L
    Similarity.ivfInsert(index, centroids, vecs.filter($"vec_id" % 2 =!= 0)) shouldBe 3L
    val queries = vecs.filter($"vec_id" < 2)
    val viaIndex = Similarity.ivfSearch(index, centroids, queries, k = 2, nprobe = 3)
      .collect().map(_.toString).sorted.toSeq
    val oneShot = Similarity.ivfTopKWith(vecs, queries, centroids, k = 2, nprobe = 3)
      .collect().map(_.toString).sorted.toSeq
    viaIndex shouldBe oneShot
    // posting lists ARE partitions: every index file lives under a list= dir
    all(index.currentSnapshot.get.files.map(_.path)) should include("list=")
  }

  test("ivfSearch opens only probed posting-list partitions") {
    val index = graft.table.Icebox(tmpDir("ivf-prune"))
    val centroids = Similarity.ivfTrain(vecs, nlist = 3)
    Similarity.ivfInsert(index, centroids, vecs)
    val queries = vecs.filter($"vec_id" === 0L)
    val idxDir = index.tableDir.toString
    val pruned = Similarity.ivfSearch(index, centroids, queries, k = 2, nprobe = 1)
      .inputFiles.count(_.contains(idxDir))
    val full = index.read(spark).inputFiles.length
    pruned should be < full
    pruned should be >= 1
    // hash-distributed partitioned write: no per-task sliver explosion —
    // at most one file per posting list per commit
    index.currentSnapshot.get.files.size should be <= 3
  }
}
