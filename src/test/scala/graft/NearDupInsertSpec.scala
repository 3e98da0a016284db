package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.table.Icebox

/** [[Dedup.nearDupInsert]]: incremental MinHash-LSH dedup against an
  * accumulated corpus through a persisted band-index table — near-dups of
  * corpus content drop, novel content admits, in-batch near-dups collapse,
  * the index probe is file-pruned, and the crash gap (corpus committed,
  * index not) repairs idempotently.
  */
class NearDupInsertSpec extends SparkSpec {
  import spark.implicits._

  // 60 seeded-random 8-letter words: distinct seeds give char-shingle-
  // disjoint docs; `nearDocOf` flips 3 words so Jaccard vs the base stays
  // high (≈0.9, a near-dup at threshold 0.8) but below 1.0
  private def doc(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    (0 until 60).map(_ =>
      (0 until 8).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString).mkString(" ")
  }
  private def nearDocOf(seed: Int): String = {
    val words = doc(seed).split(" ")
    words.updated(3, "changedxx").updated(29, "alsochanged").updated(47, "thirdedit")
      .mkString(" ")
  }

  private def fresh(prefix: String) =
    (Icebox(tmpDir(s"$prefix-corpus")), Icebox(tmpDir(s"$prefix-index")))

  test("near-dups of corpus content drop; novel content admits; exact recall on re-offers") {
    val (corpus, index) = fresh("ndi-basic")
    val w1 = (1 to 20).map(i => (i.toLong, doc(i))).toDF("id", "text")
    Dedup.nearDupInsert(corpus, index, w1, "text", "id", threshold = 0.8) shouldBe 20L
    corpus.read(spark).count() shouldBe 20L
    // wave 2: 5 verbatim re-offers (new ids), 5 near-dups, 5 novel
    val w2 = ((101 to 105).map(i => (i.toLong, doc(i - 100))) ++
      (111 to 115).map(i => (i.toLong, nearDocOf(i - 110))) ++
      (121 to 125).map(i => (i.toLong, doc(i)))).toDF("id", "text")
    Dedup.nearDupInsert(corpus, index, w2, "text", "id", threshold = 0.8) shouldBe 5L
    val ids = corpus.read(spark).select("id").as[Long].collect().sorted
    ids shouldBe ((1 to 20).map(_.toLong) ++ (121 to 125).map(_.toLong)).toArray
    // the admitted docs' bands landed in the index
    index.read(spark).select("id").distinct().count() shouldBe 25L
  }

  test("in-batch near-dups collapse to the min-id survivor before any probe") {
    val (corpus, index) = fresh("ndi-intra")
    val w = Seq((5L, doc(1)), (9L, nearDocOf(1)), (2L, doc(2))).toDF("id", "text")
    Dedup.nearDupInsert(corpus, index, w, "text", "id", threshold = 0.8) shouldBe 2L
    corpus.read(spark).select("id").as[Long].collect().sorted shouldBe Array(2L, 5L)
  }

  test("index probe is bloom/stats file-pruned: a batch touches a fraction of index files") {
    val (corpus, index) = fresh("ndi-prune")
    // 8 inserts -> 8 index files, each with blooms on `key`
    (0 until 8).foreach { k =>
      val w = (1 to 10).map(i => ((k * 100 + i).toLong, doc(k * 100 + i))).toDF("id", "text")
      Dedup.nearDupInsert(corpus, index, w, "text", "id", threshold = 0.8) shouldBe 10L
    }
    val total = index.currentSnapshot.get.files.size
    total should be >= 8
    // probe with ONE doc's band keys: blooms must exclude most files
    val oneDoc = Seq((301L, doc(301))).toDF("id", "text")
    val keys = bandKeysOf(oneDoc, "text", "id")
    val scanned = index.readForKeys(spark, keys).inputFiles.length
    scanned should be < total
  }

  /** Recompute (band, key) probe frame exactly as nearDupInsert does
    * (default numHashes=64, threshold 0.8 -> autoBands, shingle 5).
    */
  private def bandKeysOf(df: org.apache.spark.sql.DataFrame, textCol: String,
      idCol: String) = {
    val numHashes = 64
    val b = 16 // autoBands(64, 0.8) resolves to 16 (threshold (1/16)^(1/4) ≈ 0.5)
    val r = numHashes / b
    val exploded = df.select(col(idCol).as("__id"),
      explode(graft.functions.ShingleExpressions.shingleHashesFast(
        df.sparkSession, col(textCol), 5)).as("__h"))
    val sigs = exploded.groupBy("__id")
      .agg(graft.functions.MinHashAgg.signature(df.sparkSession, col("__h"), numHashes).as("__sig"))
    val bandKeys = array((0 until b).map(i =>
      xxhash64(slice(col("__sig"), i * r + 1, r), lit(i))): _*)
    sigs.select(posexplode(bandKeys)).toDF("band", "key")
  }

  test("crash gap repairs: corpus doc missing from index is backfilled, then blocks its dups") {
    val (corpus, index) = fresh("ndi-repair")
    val w1 = (1 to 5).map(i => (i.toLong, doc(i))).toDF("id", "text")
    Dedup.nearDupInsert(corpus, index, w1, "text", "id", threshold = 0.8) shouldBe 5L
    // simulate the crash window: a doc lands in the corpus with no index entry
    corpus.append(Seq((99L, doc(99))).toDF("id", "text"), collectStats = Seq("id"))
    // its near-dup is WRONGLY admitted (recall loss, the documented gap)...
    val dup1 = Seq((201L, nearDocOf(99))).toDF("id", "text")
    Dedup.nearDupInsert(corpus, index, dup1, "text", "id", threshold = 0.8) shouldBe 1L
    // ...repair backfills exactly the missing docs (99 and 201's entries exist now)
    Dedup.rebuildNearDupIndex(corpus, index, "text", "id") shouldBe 1L
    Dedup.rebuildNearDupIndex(corpus, index, "text", "id") shouldBe 0L // idempotent
    // and the next near-dup of 99 is blocked
    val dup2 = Seq((301L, nearDocOf(99))).toDF("id", "text")
    Dedup.nearDupInsert(corpus, index, dup2, "text", "id", threshold = 0.8) shouldBe 0L
  }

  test("index compaction keeps blooms + stats: probes stay file-pruned and recall holds") {
    val (corpus, index) = fresh("ndi-compact")
    // 6 inserts -> 6 small index files, then maintenance compacts them
    (0 until 6).foreach { k =>
      val w = (1 to 10).map(i => ((k * 100 + i).toLong, doc(k * 100 + i))).toDF("id", "text")
      Dedup.nearDupInsert(corpus, index, w, "text", "id", threshold = 0.8) shouldBe 10L
    }
    index.compact(spark, targetFileMb = 512)
    val files = index.currentSnapshot.get.files
    files.size should be < 6 // actually compacted
    // the bloom column is sticky through the rewrite — losing it would
    // silently turn every future probe into an O(corpus) index scan
    all(files.map(_.blooms.keySet)) should contain("key")
    // recall through the compacted index: a verbatim re-offer still drops
    val reoffer = Seq((9001L, doc(101))).toDF("id", "text")
    Dedup.nearDupInsert(corpus, index, reoffer, "text", "id", threshold = 0.8) shouldBe 0L
    // and novel content still admits (no false drops from stale entries)
    val novel = Seq((9002L, doc(9002))).toDF("id", "text")
    Dedup.nearDupInsert(corpus, index, novel, "text", "id", threshold = 0.8) shouldBe 1L
  }

  // ---- embeddingNearDupInsert: the vector-space sibling ----

  private def vec(seed: Int, dim: Int = 16): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(dim)(rnd.nextGaussian().toFloat)
  }
  // tiny perturbation: cosine vs the base stays > 0.99
  private def nearVecOf(seed: Int, dim: Int = 16): Array[Float] =
    vec(seed, dim).map(x => x + 0.001f)

  test("embedding insert: corpus near-dups drop, novel vectors admit, in-batch collapses") {
    val (corpus, index) = fresh("endi-basic")
    val w1 = (1 to 10).map(i => (i.toLong, vec(i))).toDF("id", "v")
    Dedup.embeddingNearDupInsert(corpus, index, w1, "v", "id",
      dim = 16, threshold = 0.95, planes = 4) shouldBe 10L
    // wave 2: 3 verbatim re-offers, 2 perturbed near-dups, 2 novel, plus an
    // in-batch near-dup pair (ids 121/122) that must collapse to 121
    val w2 = ((101 to 103).map(i => (i.toLong, vec(i - 100))) ++
      Seq((111L, nearVecOf(1)), (112L, nearVecOf(2)),
        (121L, vec(121)), (122L, nearVecOf(121)), (123L, vec(123)))).toDF("id", "v")
    Dedup.embeddingNearDupInsert(corpus, index, w2, "v", "id",
      dim = 16, threshold = 0.95, planes = 4) shouldBe 2L
    corpus.read(spark).select("id").as[Long].collect().sorted shouldBe
      ((1 to 10).map(_.toLong) ++ Seq(121L, 123L)).toArray
    index.read(spark).select("id").distinct().count() shouldBe 12L
  }

  test("embedding index crash gap repairs idempotently and restores recall") {
    val (corpus, index) = fresh("endi-repair")
    val w1 = (1 to 5).map(i => (i.toLong, vec(i))).toDF("id", "v")
    Dedup.embeddingNearDupInsert(corpus, index, w1, "v", "id",
      dim = 16, threshold = 0.95, planes = 4) shouldBe 5L
    corpus.append(Seq((99L, vec(99))).toDF("id", "v"), collectStats = Seq("id"))
    Dedup.rebuildEmbeddingNearDupIndex(corpus, index, "v", "id",
      dim = 16, planes = 4) shouldBe 1L
    Dedup.rebuildEmbeddingNearDupIndex(corpus, index, "v", "id",
      dim = 16, planes = 4) shouldBe 0L // idempotent
    val dup = Seq((301L, nearVecOf(99))).toDF("id", "v")
    Dedup.embeddingNearDupInsert(corpus, index, dup, "v", "id",
      dim = 16, threshold = 0.95, planes = 4) shouldBe 0L
  }

  test("docs shorter than one shingle never pair (admitted, consistent with minHashDedup)") {
    val (corpus, index) = fresh("ndi-short")
    val w1 = Seq((1L, "abc"), (2L, "abc")).toDF("id", "text") // < 5 chars: no shingles
    Dedup.nearDupInsert(corpus, index, w1, "text", "id", threshold = 0.8) shouldBe 2L
    val w2 = Seq((3L, "abc")).toDF("id", "text")
    Dedup.nearDupInsert(corpus, index, w2, "text", "id", threshold = 0.8) shouldBe 1L
  }

  test("commit budget: every wave is at most 2 fsync-bearing commits (marker+init ride the append)") {
    // serializable mode — the heaviest commit path: corpus appendIfHead,
    // index append, covered-marker advance, and (wave 1) the bloom/sort
    // property init. The marker and init must RIDE the index append.
    val (corpus, index) = fresh("ndi-budget")
    def deltas[T](body: => T): (T, Long, Long) = {
      val (c0, i0) = (corpus.commitEvents.get(), index.commitEvents.get())
      val r = body
      (r, corpus.commitEvents.get() - c0, index.commitEvents.get() - i0)
    }
    val w1 = (1 to 12).map(i => (i.toLong, doc(i))).toDF("id", "text")
    val (n1, c1, i1) = deltas(Dedup.nearDupInsert(corpus, index, w1, "text", "id",
      threshold = 0.8, serializable = true))
    n1 shouldBe 12L
    c1 shouldBe 1L // the corpus append, nothing else
    i1 shouldBe 1L // ONE index commit carrying bands + init props + marker
    // ... and the riders landed: init props AND the covered marker
    index.properties("manifest.bloom.columns") shouldBe "key"
    index.properties("write.sort.columns") shouldBe "key"
    index.properties(Dedup.CoveredProp).toLong shouldBe corpus.currentSnapshotId
    // wave 2 (steady state): re-offers drop, fresh docs admit — still 1+1
    val w2 = ((101 to 106).map(i => (i.toLong, doc(i - 100))) ++
      (121 to 126).map(i => (i.toLong, doc(i)))).toDF("id", "text")
    val (n2, c2, i2) = deltas(Dedup.nearDupInsert(corpus, index, w2, "text", "id",
      threshold = 0.8, serializable = true))
    n2 shouldBe 6L
    c2 shouldBe 1L
    i2 shouldBe 1L
    index.properties(Dedup.CoveredProp).toLong shouldBe corpus.currentSnapshotId
    // all-duplicate wave: NO commit on either table (the zero-work path)
    val w3 = (201 to 205).map(i => (i.toLong, doc(i - 200))).toDF("id", "text")
    val (n3, c3, i3) = deltas(Dedup.nearDupInsert(corpus, index, w3, "text", "id",
      threshold = 0.8, serializable = true))
    n3 shouldBe 0L
    c3 shouldBe 0L
    i3 shouldBe 0L
    // the embedding sibling holds the same budget
    val (vc, vi) = fresh("ndi-budget-vec")
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed); Array.fill(16)(r.nextGaussian().toFloat)
    }
    val ew1 = (1 to 10).map(i => (i.toLong, vec(i))).toDF("id", "v")
    val (_, ec1, ei1) = deltas2(vc, vi)(Dedup.embeddingNearDupInsert(vc, vi, ew1, "v", "id",
      dim = 16, threshold = 0.95, planes = 4, serializable = true))
    ec1 shouldBe 1L
    ei1 shouldBe 1L
    vi.properties(Dedup.CoveredProp).toLong shouldBe vc.currentSnapshotId
  }

  private def deltas2[T](c: Icebox, i: Icebox)(body: => T): (T, Long, Long) = {
    val (c0, i0) = (c.commitEvents.get(), i.commitEvents.get())
    val r = body
    (r, c.commitEvents.get() - c0, i.commitEvents.get() - i0)
  }
}
