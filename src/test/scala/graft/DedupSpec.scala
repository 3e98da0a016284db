package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "The Quick  Brown Fox jumps over the lazy dog"),  // case/space dup of 1
    (4L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (5L, "completely different content about spark engines and parquet files"),
    (6L, "another unrelated document mentioning database query optimization")
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per identical text") {
    val out = Dedup.exact(docs, "text", "doc_id")
    out.select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 3L, 4L, 5L, 6L)
  }

  test("normalized dedup also drops case/whitespace variants") {
    val out = Dedup.exactNormalized(docs, "text", "doc_id")
    out.select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 4L, 5L, 6L)
  }

  test("minhash LSH finds near-dup candidates without all-pairs") {
    val cands = Dedup.minHashCandidates(docs, "text", "doc_id", numHashes = 64, bands = 32)
    val pairs = cands.as[(Long, Long)].collect().toSet
    pairs should contain(1L -> 2L)  // exact dups always collide
    // near-dup 1~4 shares most shingles — should be a candidate at 32 bands
    pairs should contain(1L -> 4L)
    // unrelated docs must not pair with everything (not all-pairs)
    pairs.size should be < 15
  }

  test("jaccard verify scores candidates exactly") {
    val cands = Seq((1L, 2L), (1L, 4L), (1L, 5L)).toDF("idA", "idB")
    val scored = Dedup.jaccardVerify(docs, cands, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    scored(1L -> 2L) shouldBe 1.0
    scored(1L -> 4L) should be > 0.5
    scored(1L -> 5L) should be < 0.2
  }

  test("minHashDedup drops verified near-dups, keeps distinct docs") {
    val out = Dedup.minHashDedup(docs, "text", "doc_id", threshold = 0.8)
    val kept = out.select("doc_id").as[Long].collect().toSet
    kept should contain(1L)
    kept should not contain 2L   // exact dup dropped
    kept should contain(5L)
    kept should contain(6L)
  }

  test("connectedComponents resolves transitive chains to the min-id representative") {
    // chain 10-20-30-40 plus the Z<X<W shape where the single pass differs:
    // pairs (1,9) and (5,9) — min-id-per-pair keeps {1,5}, CC keeps {1}
    val pairs = Seq((10L, 20L), (20L, 30L), (30L, 40L), (1L, 9L), (5L, 9L))
      .toDF("idA", "idB")
    val reps = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    Seq(10L, 20L, 30L, 40L).map(reps) shouldBe Seq(10L, 10L, 10L, 10L)
    Seq(1L, 5L, 9L).map(reps) shouldBe Seq(1L, 1L, 1L)
  }

  test("connectedComponents equals driver-side union-find on random pair sets") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 40
      val pairList = Seq.fill(30)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2).map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      // reference: naive union-find over the same pairs
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r } }
      pairList.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
      val expected = pairList.flatMap(p => Seq(p._1, p._2)).distinct
        .map(x => x -> find(x)).toMap
      val got = Dedup.connectedComponents(pairList.toDF("idA", "idB"))
        .as[(Long, Long)].collect().toMap
      got shouldBe expected
      // force the distributed min-label fallback (threshold 0) — both sides
      // of the driver/distributed cutoff must agree with the reference
      val gotDistributed = Dedup.connectedComponents(
          pairList.toDF("idA", "idB"), maxDriverNodes = 0L)
        .as[(Long, Long)].collect().toMap
      gotDistributed shouldBe expected
    }
  }

  test("minHashDedup exactGroups keeps ONE survivor per transitive near-dup chain") {
    // char-5-gram arithmetic: base has 32 distinct shingles; each 10-char
    // suffix adds 10 → jaccard(suffixed, base) = 32/42 ≈ 0.76 ≥ 0.7, but
    // jaccard(sufA, sufB) = 32/52 ≈ 0.62 < 0.7. The shared doc has the
    // HIGHEST id, so verified pairs are (1,9) and (5,9): the single pass
    // only drops idB=9 and keeps BOTH 1 and 5; exact components resolve
    // {1,5,9} to the single min-id survivor 1.
    val base = "abcdefghijklmnopqrstuvwxyz0123456789"
    val chain = Seq(
      (1L, base + " purplecar"),
      (5L, base + " orangedog"),
      (9L, base),
      (7L, "entirely different text about distributed query engines at scale")
    ).toDF("doc_id", "text")
    val loose = Dedup.minHashDedup(chain, "text", "doc_id", threshold = 0.7, bands = 32)
      .select("doc_id").as[Long].collect().sorted
    val strict = Dedup.minHashDedup(chain, "text", "doc_id", threshold = 0.7, bands = 32,
      exactGroups = true).select("doc_id").as[Long].collect().sorted
    loose shouldBe Array(1L, 5L, 7L)
    strict shouldBe Array(1L, 7L)
  }

  test("simhash: identical texts share hash; near-dups are close in hamming") {
    val sh = docs.select($"doc_id", Dedup.simhash($"text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sh(1L) shouldBe sh(2L)
    java.lang.Long.bitCount(sh(1L) ^ sh(4L)) should be < 16
    java.lang.Long.bitCount(sh(1L) ^ sh(5L)) should be > 10
  }

  test("simHashCandidates returns only low-hamming pairs") {
    val out = Dedup.simHashCandidates(docs, "text", "doc_id", maxHamming = 3)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    out should contain(1L -> 2L)
    out should not contain (1L -> 5L)
  }

  test("simHashCandidates emits each colliding pair exactly once (first-band attribution)") {
    // identical texts share ALL 4 band slices — without the first-colliding-
    // band rule the pair would be generated once per band and need a
    // distinct() shuffle to collapse; the rows themselves must be unique
    val out = Dedup.simHashCandidates(docs, "text", "doc_id", maxHamming = 64)
      .select("idA", "idB").as[(Long, Long)].collect()
    out.length shouldBe out.toSet.size
    out.toSet should contain(1L -> 2L)
  }

  test("simHashDedupVerified drops token-multiset dups only (hash collisions verified away)") {
    val permuted = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"),   // permutation of 1: same multiset
      (3L, "alpha beta gamma delta"),   // exact dup of 1
      (4L, "alpha beta gamma epsilon")  // different multiset
    ).toDF("doc_id", "text")
    val kept = Dedup.simHashDedupVerified(permuted, "text", "doc_id", maxHamming = 3)
      .select("doc_id").as[Long].collect().toSet
    kept shouldBe Set(1L, 4L)
  }

  test("embeddingNearDup buckets by hyperplane and finds high-cosine pairs") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.01f, 0.0f, 0.0f)),  // near-dup of 1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDup(vecs, "embedding", "vec_id", dim = 4,
      threshold = 0.95, planes = 4)
    val pairs = out.select("idA", "idB").as[(Long, Long)].collect().toSet
    pairs shouldBe Set(1L -> 2L)
  }

  test("streaming exact dedup drops in-horizon duplicates, expires state past the watermark") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[(Timestamp, String)]
    val deduped = Dedup.streamingExact(
      input.toDF().toDF("ts", "text"), "text", "ts", watermarkDelay = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()

    input.addData(
      (ts("2024-01-01 10:00:00"), "alpha"),
      (ts("2024-01-01 10:01:00"), "alpha"),   // in-batch duplicate
      (ts("2024-01-01 10:02:00"), "beta"))
    q.processAllAvailable()
    input.addData((ts("2024-01-01 10:05:00"), "alpha")) // cross-batch, in-horizon
    q.processAllAvailable()
    spark.table("sdedup").select("text").as[String].collect().sorted shouldBe
      Array("alpha", "beta")

    // far-future sighting: watermark passed old state, "alpha" re-emits —
    // the documented horizon contract (bounded state, not global dedup)
    input.addData((ts("2024-01-01 12:00:00"), "advance"))
    q.processAllAvailable()
    input.addData((ts("2024-01-01 12:01:00"), "alpha"))
    q.processAllAvailable()
    spark.table("sdedup").filter($"text" === "alpha").count() shouldBe 2
    q.stop()
  }

  test("dedupInsert appends only unseen fingerprints; in-batch dups collapse to min id") {
    val corpus = graft.table.Icebox(tmpDir("dedup-insert"))
    corpus.setProperties(Map("manifest.bloom.columns" -> "fingerprint"))
    // ids 1 and 3 normalize to the SAME fingerprint (case/whitespace)
    val b1 = Seq((1L, "alpha beta"), (2L, "gamma"), (3L, "ALPHA   beta"))
      .toDF("id", "text")
    Dedup.dedupInsert(corpus, b1, "text", "id") shouldBe 2L
    // batch 2: one re-offer of known content (id 4), one NEW doc twice
    val b2 = Seq((6L, "delta"), (4L, "alpha beta"), (5L, "delta")).toDF("id", "text")
    Dedup.dedupInsert(corpus, b2, "text", "id") shouldBe 1L
    corpus.read(spark).select("id").as[Long].collect().sorted shouldBe Array(1L, 2L, 5L)
    // idempotent: a full replay appends nothing
    Dedup.dedupInsert(corpus, b1.unionByName(b2), "text", "id") shouldBe 0L
    // null text fingerprints as empty text: ingested once, then every
    // re-offer drops (a raw null key would never match the anti-join and
    // re-append forever)
    Dedup.dedupInsert(corpus,
      Seq((7L, null: String), (8L, "")).toDF("id", "text"), "text", "id") shouldBe 1L
    Dedup.dedupInsert(corpus,
      Seq((9L, null: String)).toDF("id", "text"), "text", "id") shouldBe 0L
  }

  test("candidate-pair growth tracks the duplication rate, not corpus size") {
    import graft.tools.MinhashScale
    def pairs(df: org.apache.spark.sql.DataFrame): Long =
      Dedup.minHashCandidates(df, "text", "doc_id").count()
    // CONSTANT duplication rate (the realistic regime): 10% of docs carry
    // one near-dup partner — tripling the corpus triples the pairs
    val p1 = pairs(MinhashScale.constantRate(spark, 1000))
    val p3 = pairs(MinhashScale.constantRate(spark, 3000))
    p1 should (be >= 95L and be <= 110L) // ~the 100 planted partners
    p3 should (be >= 285L and be <= 330L)
    p3.toDouble / p1 shouldBe 3.0 +- 0.5 // linear in corpus size
    // the GenSf1 shape: family SIZE grows with scale, so pairs grow
    // quadratically per family — C(2,2)=1 vs C(6,2)=15 per base doc. This
    // is the corpus property behind q_minhash_dedup's 9.95x sf1 wall
    // (PLANS.md r15), not a plan regression.
    val f1 = pairs(MinhashScale.growingFamilies(spark, 400, 2)) // 800 docs
    val f3 = pairs(MinhashScale.growingFamilies(spark, 400, 6)) // 2400 docs
    f1 should (be >= 380L and be <= 420L)
    f3 should (be >= 5700L and be <= 6300L)
    f3.toDouble / f1 should be > 10.0 // 3x the docs, ~15x the pairs
  }
}
