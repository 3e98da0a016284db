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

  test("ivfRetrain recovers balance and nprobe-1 recall after distribution drift") {
    val rnd = new scala.util.Random(3)
    def around(cx: Float, cy: Float, cz: Float, sd: Float, n: Int, base: Long) =
      (0 until n).map { i =>
        (base + i, Array(cx + rnd.nextGaussian().toFloat * sd,
          cy + rnd.nextGaussian().toFloat * sd,
          cz + rnd.nextGaussian().toFloat * sd))
      }
    // wave 1: two tight clusters; trained centroids land on them
    val wave1 = (around(10f, 0f, 0f, 0.3f, 100, 0L) ++
      around(0f, 10f, 0f, 0.3f, 100, 100L)).toDF("vec_id", "embedding")
    val index = graft.table.Icebox(tmpDir("ivf-drift"))
    val frozen = Similarity.ivfTrain(wave1, nlist = 2, seed = 5L)
    Similarity.ivfInsert(index, frozen, wave1)
    // wave 2 DRIFTS into a z-dominant cluster equidistant from the frozen
    // x/y centroids: each vector's list is decided by its x-vs-y noise,
    // but its cosine NEIGHBORS are decided by the (x, y) offsets around
    // the drift center — the neighborhood straddles the frozen x=y
    // boundary, so nprobe-1 probes see only one side of it
    val wave2 = around(3f, 3f, 10f, 0.5f, 200, 1000L).toDF("vec_id", "embedding")
    Similarity.ivfInsert(index, frozen, wave2)
    val queries = wave2.filter($"vec_id" < 1010L)
    val corpus = index.read(spark).drop("list")
    def recall(centroids: org.apache.spark.sql.DataFrame): Double = {
      val got = Similarity.ivfSearch(index, centroids, queries, k = 5, nprobe = 1)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = Similarity.bruteForceTopK(corpus, queries, k = 5,
        vecCol = "embedding", idCol = "vec_id")
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    def driftListCount(): Long = index.read(spark)
      .filter($"vec_id" >= 1000L).select("list").distinct().count()
    val recallBefore = recall(frozen)
    driftListCount() shouldBe 2L // the drift cluster is torn across frozen lists
    // refit on the index contents and migrate the posting lists
    val retrained = Similarity.ivfRetrain(spark, index, nlist = 3, seed = 5L)
    index.rowCount shouldBe Some(400L) // migration loses nothing
    val recallAfter = recall(retrained)
    recallBefore should be < 0.85 // boundary split: neighbors straddle lists
    recallAfter should be > 0.95 // a retrained centroid owns the new cluster
    driftListCount() shouldBe 1L // one retrained list owns the whole cluster
    // migrated layout still partition-prunes
    val pruned = Similarity.ivfSearch(index, retrained, queries, k = 5, nprobe = 1)
      .inputFiles.count(_.contains(index.tableDir.toString))
    pruned should be < index.read(spark).inputFiles.length
  }

  // shared fixture for the O(moved) reassign contracts: clusters A/B/C far
  // apart plus a bimodal D (D1 at w=10, D2 at w=10/z=2) initially covered
  // by ONE centroid; the retrain splits D in two while A/B/C's centroids
  // are bit-identical — so exactly D2's rows move and A/B/C must carry
  private def movedFixture(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val corpus = (around4(rnd, 10f, 0f, 0f, 0f, 0.2f, 50, 0L) ++
      around4(rnd, 0f, 10f, 0f, 0f, 0.2f, 50, 100L) ++
      around4(rnd, 0f, 0f, 10f, 0f, 0.2f, 50, 200L) ++
      around4(rnd, 0f, 0f, 0f, 10f, 0.2f, 50, 300L) ++
      around4(rnd, 0f, 0f, 2f, 10f, 0.2f, 50, 400L)).toDF("vec_id", "embedding")
    val oldC = Seq(
      (0L, Array(10f, 0f, 0f, 0f)), (1L, Array(0f, 10f, 0f, 0f)),
      (2L, Array(0f, 0f, 10f, 0f)), (3L, Array(0f, 0f, 1f, 10f))
    ).toDF("cluster_id", "centroid")
    val newC = Seq(
      (0L, Array(10f, 0f, 0f, 0f)), (1L, Array(0f, 10f, 0f, 0f)),
      (2L, Array(0f, 0f, 10f, 0f)), (3L, Array(0f, 0f, 0f, 10f)),
      (4L, Array(0f, 0f, 2f, 10f))
    ).toDF("cluster_id", "centroid")
    (corpus, oldC, newC)
  }

  private def listPaths(index: graft.table.Icebox): Map[String, Set[String]] =
    index.currentSnapshot.get.files.groupBy(_.partition("list"))
      .map { case (l, fs) => l -> fs.map(_.path).toSet }

  test("ivfReassign is O(moved): untouched posting lists carry by reference") {
    val (corpus, oldC, newC) = movedFixture(21)
    val index = graft.table.Icebox(tmpDir("ivf-moved"))
    Similarity.ivfInsert(index, oldC, corpus)
    val before = listPaths(index)
    before.keySet shouldBe Set("0", "1", "2", "3")
    val moved = Similarity.ivfReassign(spark, index, newC)
    moved shouldBe 50L // exactly D2
    val after = listPaths(index)
    after.keySet shouldBe Set("0", "1", "2", "3", "4")
    // A/B/C: neither gained nor lost a vector -> files carried BY REFERENCE
    for (l <- Seq("0", "1", "2")) after(l) shouldBe before(l)
    // the split pair was rewritten
    after("3") should not be before("3")
    // rebuild equivalence: contents equal an index built fresh under newC
    val rebuilt = graft.table.Icebox(tmpDir("ivf-moved-rebuild"))
    Similarity.ivfInsert(rebuilt, newC, corpus)
    assertSameRows(index.read(spark), rebuilt.read(spark))
    // idempotence: a second reassign moves nothing and COMMITS nothing
    val head = index.currentSnapshotId
    Similarity.ivfReassign(spark, index, newC) shouldBe 0L
    index.currentSnapshotId shouldBe head
  }

  test("ivfPqReassign is O(moved + changed-ref): carry, re-encode, byte-identity, loud drops") {
    val (corpus, oldC, newC) = movedFixture(22)
    val cb = Similarity.pqTrainResidual(corpus, oldC, m = 2, codes = 8, seed = 9L)
    val index = graft.table.Icebox(tmpDir("pq-moved"))
    Similarity.ivfPqInsert(index, oldC, cb, corpus)
    // the residual references are recorded per list
    index.properties.keySet.count(_.startsWith("pq.ref.")) shouldBe 4
    val refs3Before = index.properties("pq.ref.3")
    // a second insert under DIFFERENT centroids would corrupt the codes
    intercept[IllegalArgumentException] {
      Similarity.ivfPqInsert(index, newC, cb, corpus.limit(1))
    }
    val before = listPaths(index)
    val moved = Similarity.ivfPqReassign(spark, index, corpus, newC, cb)
    moved shouldBe 50L // exactly D2 changed lists
    val after = listPaths(index)
    // A/B/C: no movement AND bit-identical references -> carried
    for (l <- Seq("0", "1", "2")) after(l) shouldBe before(l)
    // list 3 kept its rows (D1) but its REFERENCE moved: residual codes
    // are reference-relative, so it must have been re-encoded (rewritten)
    after("3") should not be before("3")
    // byte-identity against a from-scratch build under newC + same cb —
    // including D1's re-encoded residuals
    val rebuilt = graft.table.Icebox(tmpDir("pq-moved-rebuild"))
    Similarity.ivfPqInsert(rebuilt, newC, cb, corpus)
    val a = index.read(spark).collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = rebuilt.read(spark).collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    a shouldBe b
    // the recorded references now describe newC
    index.properties.keySet.count(_.startsWith("pq.ref.")) shouldBe 5
    index.properties("pq.ref.3") should not be refs3Before
    // idempotence: nothing moved, nothing re-referenced -> no commit
    val head = index.currentSnapshotId
    Similarity.ivfPqReassign(spark, index, corpus, newC, cb) shouldBe 0L
    index.currentSnapshotId shouldBe head
    // indexed ids missing from the corpus fail LOUD, not silently shrink
    intercept[IllegalArgumentException] {
      Similarity.ivfPqReassign(spark, index,
        corpus.filter($"vec_id" =!= 0L), oldC, cb)
    }
  }

  private def around4(rnd: scala.util.Random, cx: Float, cy: Float, cz: Float,
      cw: Float, sd: Float, n: Int, base: Long): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      (base + i, Array(cx + rnd.nextGaussian().toFloat * sd,
        cy + rnd.nextGaussian().toFloat * sd,
        cz + rnd.nextGaussian().toFloat * sd,
        cw + rnd.nextGaussian().toFloat * sd))
    }

  test("ivfPqSearch: full refine == float ivfSearch exactly; partial refine keeps recall") {
    val rnd = new scala.util.Random(11)
    val corpus = (around4(rnd, 10f, 0f, 0f, 1f, 0.5f, 100, 0L) ++
      around4(rnd, 0f, 10f, 0f, 1f, 0.5f, 100, 100L) ++
      around4(rnd, 0f, 0f, 10f, 1f, 0.5f, 100, 200L)).toDF("vec_id", "embedding")
    val centroids = Similarity.ivfTrain(corpus, nlist = 3, seed = 7L)
    val cb = Similarity.pqTrainResidual(corpus, centroids, m = 4, codes = 32, seed = 7L)
    cb.count() shouldBe 128L // 4 subspaces x 32 codes
    val floatIdx = graft.table.Icebox(tmpDir("pq-float"))
    Similarity.ivfInsert(floatIdx, centroids, corpus)
    val pqIdx = graft.table.Icebox(tmpDir("pq-codes"))
    Similarity.ivfPqInsert(pqIdx, centroids, cb, corpus, "embedding", "vec_id") shouldBe 300L
    pqIdx.read(spark).columns.toSet shouldBe Set("vec_id", "codes", "list") // no vectors stored
    val queries = corpus.filter($"vec_id" < 10L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val exact = rows(Similarity.ivfSearch(floatIdx, centroids, queries, k = 5, nprobe = 2))
    // refineK >= every probed list: the ADC cut passes everything through,
    // so the codes-only index must reproduce the float index EXACTLY
    val full = rows(Similarity.ivfPqSearch(pqIdx, centroids, cb, corpus, queries,
      k = 5, nprobe = 2, refineK = 1000000))
    full shouldBe exact
    // realistic refineK: ADC ordering (stale nothing here — codebooks fit
    // this corpus) must keep most of the true neighbors
    val got = rows(Similarity.ivfPqSearch(pqIdx, centroids, cb, corpus, queries,
      k = 5, nprobe = 2, refineK = 10)).map(t => (t._1, t._2))
    val truth = exact.map(t => (t._1, t._2))
    got.intersect(truth).size.toDouble / truth.size should be > 0.8
  }

  test("IVF-PQ drift + retrain composition: reassign joins the corpus, codes migrate unchanged") {
    val rnd = new scala.util.Random(3)
    val wave1 = (around4(rnd, 10f, 0f, 0f, 1f, 0.3f, 100, 0L) ++
      around4(rnd, 0f, 10f, 0f, 1f, 0.3f, 100, 100L)).toDF("vec_id", "embedding")
    val index = graft.table.Icebox(tmpDir("pq-drift"))
    val frozen = Similarity.ivfTrain(wave1, nlist = 2, seed = 5L)
    val cb = Similarity.pqTrainResidual(wave1, frozen, m = 2, codes = 8, seed = 5L)
    Similarity.ivfPqInsert(index, frozen, cb, wave1)
    // drift into a z-dominant cluster straddling the frozen x/y boundary
    val wave2 = around4(rnd, 3f, 3f, 10f, 1f, 0.5f, 200, 1000L).toDF("vec_id", "embedding")
    Similarity.ivfPqInsert(index, frozen, cb, wave2)
    val corpus = wave1.unionByName(wave2)
    val queries = wave2.filter($"vec_id" < 1010L)
    def recall(centroids: org.apache.spark.sql.DataFrame): Double = {
      // generous refineK isolates the IVF-list effect from PQ precision
      val got = Similarity.ivfPqSearch(index, centroids, cb, corpus, queries,
        k = 5, nprobe = 1, refineK = 1000000)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = Similarity.bruteForceTopK(corpus, queries, k = 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val recallBefore = recall(frozen)
    val before = index.read(spark).select("vec_id", "codes", "list").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // refit on the corpus and migrate: the index has no vectors, so the
    // reassign reads them from the corpus table by id; residual codes
    // re-encode where the assignment moved
    val retrained = Similarity.ivfTrain(corpus, nlist = 3, seed = 5L)
    val movedN = Similarity.ivfPqReassign(spark, index, corpus, retrained, cb)
    val recallAfter = recall(retrained)
    recallBefore should be < 0.85
    recallAfter should be > 0.95
    // residual codes are (vector, reference)-relative, so the migration
    // contract is REBUILD EQUIVALENCE: the reassigned index must be
    // byte-identical to an index built from scratch under the retrained
    // centroids with the same codebooks
    val after = index.read(spark).select("vec_id", "codes", "list").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rebuilt = graft.table.Icebox(tmpDir("pq-drift-rebuild"))
    Similarity.ivfPqInsert(rebuilt, retrained, cb, corpus)
    val fresh = rebuilt.read(spark).select("vec_id", "codes", "list").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    after shouldBe fresh
    // and the retrain genuinely moved assignments (the drift cluster);
    // the return value is the MOVED count, not the table size
    val expectMoved = before.keys.count(id => before(id)._2 != after(id)._2).toLong
    movedN shouldBe expectMoved
    movedN should be > 0L
    // migrated layout still partition-prunes
    val pruned = Similarity.ivfPqSearch(index, retrained, cb, corpus, queries,
      k = 5, nprobe = 1, refineK = 100)
      .inputFiles.count(_.contains(index.tableDir.toString))
    pruned should be < index.read(spark).inputFiles.length
  }

  test("ivfPqReassign preserves rows from non-partitioned legacy index generations") {
    val (corpus, oldC, newC) = movedFixture(24)
    val cb = Similarity.pqTrainResidual(corpus, oldC, m = 2, codes = 8, seed = 9L)
    val index = graft.table.Icebox(tmpDir("pq-legacy"))
    Similarity.ivfPqInsert(index, oldC, cb, corpus.filter($"vec_id" =!= 0L))
    // simulate a legacy generation: vec 0's row appended UNPARTITIONED —
    // its file's rows could belong to any list, so the delta rewrite must
    // fall back to rewriting every occupied partition, not drop them
    val one = graft.table.Icebox(tmpDir("pq-legacy-one"))
    Similarity.ivfPqInsert(one, oldC, cb, corpus.filter($"vec_id" === 0L))
    index.append(one.read(spark))
    val total = corpus.count()
    index.read(spark).count() shouldBe total
    Similarity.ivfPqReassign(spark, index, corpus, newC, cb)
    index.read(spark).count() shouldBe total
    val rebuilt = graft.table.Icebox(tmpDir("pq-legacy-rebuild"))
    Similarity.ivfPqInsert(rebuilt, newC, cb, corpus)
    val a = index.read(spark).collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = rebuilt.read(spark).collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    a shouldBe b
  }

  test("codebook refit invalidates EVERY stored code: reassign re-encodes even unmoved lists") {
    val (corpus, oldC, _) = movedFixture(23)
    val cb = Similarity.pqTrainResidual(corpus, oldC, m = 2, codes = 8, seed = 9L)
    val index = graft.table.Icebox(tmpDir("pq-cbref"))
    Similarity.ivfPqInsert(index, oldC, cb, corpus)
    val before = listPaths(index)
    // same centroids, REFIT codebooks: zero rows move, but codes are
    // (vector, reference, codebook)-relative — every occupied list must
    // rewrite or searches would ADC stale codes against the new LUTs
    val cb2 = Similarity.pqTrainResidual(corpus, oldC, m = 2, codes = 8, seed = 77L)
    Similarity.ivfPqReassign(spark, index, corpus, oldC, cb2) shouldBe 0L
    val after = listPaths(index)
    for (l <- before.keySet) after(l) should not be before(l)
    val rebuilt = graft.table.Icebox(tmpDir("pq-cbref-rebuild"))
    Similarity.ivfPqInsert(rebuilt, oldC, cb2, corpus)
    val a = index.read(spark).collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = rebuilt.read(spark).collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    a shouldBe b
    // stale-codebook inserts refuse; the refit frames are accepted
    intercept[IllegalArgumentException] {
      Similarity.ivfPqInsert(index, oldC, cb, corpus.limit(1))
    }
    Similarity.ivfPqInsert(index, oldC, cb2, corpus.limit(0)) shouldBe 0L
  }

  test("ivfPqRetrain: one call refits centroids + codebooks and migrates consistently") {
    val rnd = new scala.util.Random(31)
    val wave1 = (around4(rnd, 10f, 0f, 0f, 1f, 0.3f, 100, 0L) ++
      around4(rnd, 0f, 10f, 0f, 1f, 0.3f, 100, 100L)).toDF("vec_id", "embedding")
    val index = graft.table.Icebox(tmpDir("pq-retrain"))
    val frozen = Similarity.ivfTrain(wave1, nlist = 2, seed = 5L)
    val cb = Similarity.pqTrainResidual(wave1, frozen, m = 2, codes = 8, seed = 5L)
    Similarity.ivfPqInsert(index, frozen, cb, wave1)
    val wave2 = around4(rnd, 3f, 3f, 10f, 1f, 0.5f, 200, 1000L).toDF("vec_id", "embedding")
    Similarity.ivfPqInsert(index, frozen, cb, wave2)
    val corpus = wave1.unionByName(wave2)
    val (newC, newCb) = Similarity.ivfPqRetrain(spark, index, corpus,
      nlist = 3, m = 2, codes = 8, seed = 5L)
    // byte-identity to a from-scratch build under the RETURNED frames
    val rebuilt = graft.table.Icebox(tmpDir("pq-retrain-rebuild"))
    Similarity.ivfPqInsert(rebuilt, newC, newCb, corpus)
    val a = index.read(spark).collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = rebuilt.read(spark).collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    a shouldBe b
    // the retrained index searches exactly like the rebuilt one
    val queries = wave2.filter($"vec_id" < 1005L)
    assertSameRows(
      Similarity.ivfPqSearch(index, newC, newCb, corpus, queries, k = 3, nprobe = 2),
      Similarity.ivfPqSearch(rebuilt, newC, newCb, corpus, queries, k = 3, nprobe = 2))
    // the superseded frames refuse further inserts
    intercept[IllegalArgumentException] {
      Similarity.ivfPqInsert(index, frozen, cb, corpus.limit(1))
    }
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
