package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.concurrent.TimeLimits._
import org.scalatest.time.SpanSugar._
import graft.functions.BpeExpressions
import graft.operators.{Multimodal, Sampling, Similarity}
import graft.table.Icebox

/** Round-17 hardening from the round-16 advice: the BPE per-word memo is
  * bound to the merge list it was computed under (two vocabularies in one
  * thread/query can never cross-serve counts), the RIFF/AVI chunk walks
  * reject negative chunk sizes (no infinite loop, no failed task — corrupt
  * containers hash to None per the imageHashMeta null contract),
  * ivfPqReassign re-records residual references in ONE atomic property
  * swap and ivfPqInsert refuses to bless unverifiable codes when an index
  * has rows but no recorded references, and temperatureMix's null bucket
  * cannot collide with a real source value.
  */
class AdviceR16Spec extends SparkSpec {
  import spark.implicits._

  private def utf8(s: String) = UTF8String.fromString(s)
  private def mergesOf(ps: String*) =
    new GenericArrayData(ps.map(p => utf8(p): Any).toArray)

  test("BPE memo is merge-list-scoped: two vocabularies on one thread never cross-serve") {
    val a = mergesOf("a a", "aa aa") // "aaaa" -> 1 token
    val b = mergesOf()               // "aaaa" -> 4 tokens
    BpeExpressions.countTokens(utf8("aaaa"), a) shouldBe 1L
    // pre-fix this served the stale memo entry (1) computed under `a`
    BpeExpressions.countTokens(utf8("aaaa"), b) shouldBe 4L
    BpeExpressions.countTokens(utf8("aaaa"), a) shouldBe 1L
    // and alternating does not thrash: both states stay cached
    BpeExpressions.countTokens(utf8("aaaa aaaa"), b) shouldBe 8L
  }

  test("BPE: two token columns with different merges in ONE query are both right") {
    val df = (0 until 64).map(i => s"aaaa ab$i").toDF("text")
      .withColumn("ca", BpeExpressions.tokenCount(spark, $"text",
        typedLit(Seq("a a", "aa aa"))))
      .withColumn("cb", BpeExpressions.tokenCount(spark, $"text",
        typedLit(Seq("b 0", "b 1"))))
    val rows = df.collect()
    // under merges A: aaaa -> 1; "ab<i>" has no A-merge -> 2 + digits
    // under merges B: aaaa -> 4; one "b <digit>" merge fires for i<2 or
    //   a leading digit of 0/1... keep it simple: check exact totals
    rows.foreach { r =>
      val suffix = r.getString(0).drop(7) // digits after "aaaa ab"
      r.getLong(1) shouldBe (1L + 2L + suffix.length) // A: merged aaaa + 'a','b' + digits
      val bMerge = if (suffix.head == '0' || suffix.head == '1') 1L else 0L
      r.getLong(2) shouldBe (4L + 2L + suffix.length - bMerge)
    }
  }

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  test("videoDHash/sampleFrameMeans reject negative chunk sizes: no hang, no throw") {
    // RIFF/AVI container whose first movi chunk declares size -8: the
    // pre-fix walk advanced o by size+8 = 0 forever (infinite loop), or
    // for other negative sizes threw from Arrays.copyOfRange
    val bo = new java.io.ByteArrayOutputStream()
    bo.write("RIFF".getBytes("US-ASCII")); bo.write(le32(64))
    bo.write("AVI ".getBytes("US-ASCII"))
    bo.write("00dc".getBytes("US-ASCII")); bo.write(le32(0xFFFFFFF8L))
    bo.write(new Array[Byte](48))
    val corrupt = bo.toByteArray
    failAfter(30.seconds) {
      Multimodal.videoDHash(corrupt) shouldBe None
      Multimodal.sampleFrameMeans(corrupt, 1) shouldBe Nil
    }
    // a size of -1 (passes the old dataStart+size bound, negative copy)
    val bo2 = new java.io.ByteArrayOutputStream()
    bo2.write("RIFF".getBytes("US-ASCII")); bo2.write(le32(64))
    bo2.write("AVI ".getBytes("US-ASCII"))
    bo2.write("01db".getBytes("US-ASCII")); bo2.write(le32(0xFFFFFFFFL))
    bo2.write(new Array[Byte](48))
    failAfter(30.seconds) {
      Multimodal.videoDHash(bo2.toByteArray) shouldBe None
      Multimodal.sampleFrameMeans(bo2.toByteArray, 1) shouldBe Nil
    }
  }

  test("replaceProperties swaps a key set in one locked write") {
    val t = Icebox(tmpDir("props-swap"))
    t.setProperties(Map("pq.ref.0" -> "h0", "pq.ref.1" -> "h1", "keep" -> "x"))
    t.replaceProperties(Seq("pq.ref.0", "pq.ref.1"),
      Map("pq.ref.7" -> "h7", "pq.cb" -> "c"))
    val p = t.properties
    p.get("pq.ref.0") shouldBe None
    p.get("pq.ref.1") shouldBe None
    p("pq.ref.7") shouldBe "h7"
    p("pq.cb") shouldBe "c"
    p("keep") shouldBe "x" // unrelated keys survive the swap
  }

  test("ivfPqInsert refuses an index with rows but no recorded references") {
    val rnd = new scala.util.Random(3)
    val corpus = (0 until 40).map { i =>
      (i.toLong, Array(
        (if (i % 2 == 0) 10f else 0f) + rnd.nextGaussian().toFloat * 0.2f,
        (if (i % 2 == 0) 0f else 10f) + rnd.nextGaussian().toFloat * 0.2f))
    }.toDF("vec_id", "embedding")
    val centroids = Seq((0L, Array(10f, 0f)), (1L, Array(0f, 10f)))
      .toDF("cluster_id", "centroid")
    val cb = Similarity.pqTrainResidual(corpus, centroids, m = 2, codes = 4, seed = 5L)
    val index = Icebox(tmpDir("pq-norefs"))
    Similarity.ivfPqInsert(index, centroids, cb, corpus) shouldBe 40L
    // simulate the half-written crash state the old two-commit swap could
    // leave: rows present, pq.* identity gone
    index.removeProperties(
      index.properties.keys.filter(k => k.startsWith("pq.ref.") || k == "pq.cb").toSeq)
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfPqInsert(index, centroids, cb, corpus.limit(1))
    }
    e.getMessage should include("unknown provenance")
    // an EMPTY index still takes the fresh-record branch normally
    val fresh = Icebox(tmpDir("pq-fresh"))
    Similarity.ivfPqInsert(fresh, centroids, cb, corpus.limit(4)) shouldBe 4L
  }

  test("temperatureMix: a literal \"__null__\" source stays distinct from null sources") {
    // 100 literal-"__null__" rows, 2900 null rows, 1000 "x" rows: under
    // the old shared sentinel the literal rows were rated as a
    // 3000-row group; fixed, they rate as their own 100-row group
    val rows = (0L until 4000L).map { i =>
      val src = if (i < 100) "__null__" else if (i < 3000) null else "x"
      (i, src)
    }.toDF("id", "src")
    val mixed = Sampling.temperatureMix(rows, "src", $"id",
      temperature = 2.0, totalFrac = 0.3, seed = "s")
    // rename nulls to a value that cannot collide: the literal-"__null__"
    // keep SET must be identical (same per-group rate, same uniform keys)
    val renamed = rows.withColumn("src", coalesce($"src", lit("zz")))
    val mixedRenamed = Sampling.temperatureMix(renamed, "src", $"id",
      temperature = 2.0, totalFrac = 0.3, seed = "s")
    assertSameRows(
      mixed.filter($"src" === "__null__"),
      mixedRenamed.filter($"src" === "__null__"))
    // null rows are still their own sampled bucket
    mixed.filter($"src".isNull).count() should be > 0L
    assertSameRows(
      mixed.filter($"src".isNull).select($"id"),
      mixedRenamed.filter($"src" === "zz").select($"id"))
  }
}
