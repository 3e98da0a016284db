package graft

import org.apache.spark.sql.functions._
import graft.operators.RuntimeFilterJoin
import graft.table.Icebox

/** Runtime bloom-join file pruning (DPP for non-partition keys): the dim
  * side's runtime key values prune fact FILES through the manifest bloom
  * index, with min/max provably unable to help (hash-scattered layout),
  * and every degraded configuration falling back to a full — still
  * correct — read.
  */
class RuntimeFilterJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Fact with keys interleaved across files: every file's [min,max]
    * spans nearly the whole domain, so only blooms can tell files apart.
    */
  private def mkFact(name: String, bloom: Boolean): Icebox = {
    val t = Icebox(tmpDir(name))
    if (bloom) t.setProperties(Map(
      "manifest.bloom.columns" -> "k", "manifest.bloom.fpp" -> "0.001"))
    (0 to 3).foreach { off =>
      t.append((1 to 800).map(i => ((i * 13 + off * 3) % 4000L, s"p$off-$i", i * 1.0))
        .toDF("k", "payload", "v").repartition(4, col("payload")))
    }
    t
  }

  private val dimRows = Seq((26L, "a"), (339L, "b"), (3900L, "c"))

  test("dim runtime keys prune fact files via blooms; min/max admits everything") {
    val fact = mkFact("rfj-bloom", bloom = true)
    val dim = dimRows.toDF("d_k", "d_tag")
    val files = fact.currentSnapshot.get.files
    files.size shouldBe 16
    // setup check: no file is range-disjoint from the probe keys
    val (klo, khi) = (dimRows.map(_._1).min, dimRows.map(_._1).max)
    files.count(_.stats.get("k").exists { case (mn, mx) =>
      mx.toLong < klo || mn.toLong > khi }) shouldBe 0
    val pruned = RuntimeFilterJoin.prunedFactRead(spark, fact, dim, Seq("k" -> "d_k"))
    pruned.inputFiles.length should be < files.size
    // and the join result equals the unpruned join exactly
    val fast = RuntimeFilterJoin.join(spark, fact, dim, Seq("k" -> "d_k"))
    val full = fact.read(spark)
    val slow = full.join(dim, full("k") === dim("d_k"))
    assertSameRows(fast, slow)
  }

  test("conservative fallback: no blooms → full read, identical join result") {
    val fact = mkFact("rfj-nobloom", bloom = false)
    val dim = dimRows.toDF("d_k", "d_tag")
    val pruned = RuntimeFilterJoin.prunedFactRead(spark, fact, dim, Seq("k" -> "d_k"))
    // nothing to prune with (interleaved ranges + no blooms): every file reads
    pruned.inputFiles.length shouldBe fact.currentSnapshot.get.files.size
    val fast = RuntimeFilterJoin.join(spark, fact, dim, Seq("k" -> "d_k"))
    val full = fact.read(spark)
    assertSameRows(fast, full.join(dim, full("k") === dim("d_k")))
  }

  test("conservative fallback: key set over bloom.attach.max-keys → full read") {
    val fact = mkFact("rfj-maxkeys", bloom = true)
    fact.setProperties(Map("bloom.attach.max-keys" -> "2"))
    val dim = dimRows.toDF("d_k", "d_tag") // 3 distinct keys > 2
    val pruned = RuntimeFilterJoin.prunedFactRead(spark, fact, dim, Seq("k" -> "d_k"))
    pruned.inputFiles.length shouldBe fact.currentSnapshot.get.files.size
    val fast = RuntimeFilterJoin.join(spark, fact, dim, Seq("k" -> "d_k"))
    val full = fact.read(spark)
    assertSameRows(fast, full.join(dim, full("k") === dim("d_k")))
  }

  test("left joins keep dim rows whose keys match nothing (pruning is fact-side only)") {
    val fact = mkFact("rfj-left", bloom = true)
    val dim = (dimRows :+ (99999L, "nohit")).toDF("d_k", "d_tag")
    val fast = RuntimeFilterJoin.join(spark, fact, dim, Seq("k" -> "d_k"), "right")
    val full = fact.read(spark)
    assertSameRows(fast, full.join(dim, full("k") === dim("d_k"), "right"))
    fast.filter(col("d_tag") === "nohit").count() shouldBe 1L
  }
}
