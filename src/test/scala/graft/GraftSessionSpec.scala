package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class GraftSessionSpec extends AnyFunSuite with Matchers {

  test("builder carries the reference storage conventions and scale defaults") {
    // inspect the builder's config without starting a second SparkContext:
    // apply it onto the shared test session's conf surface via a fresh builder
    val spark = SparkSpec.spark // ensure one session exists
    val s2 = GraftSession.builder(master = "local[2]", shufflePartitions = 7).getOrCreate()
    // getOrCreate returns the existing session but applies new options
    s2.conf.get("spark.sql.parquet.compression.codec") shouldBe "zstd"
    s2.conf.get("spark.sql.adaptive.enabled") shouldBe "true"
    s2.conf.get("spark.sql.sources.partitionOverwriteMode") shouldBe "dynamic"
    s2.conf.get("spark.sql.session.timeZone") shouldBe "UTC"
  }

  test("create pre-registers the graft native functions") {
    val s = GraftSession.create(master = "local[2]")
    s.sql("SELECT graft_cosine(array(cast(1.0 as float)), array(cast(1.0 as float)))")
      .collect()(0).getDouble(0) shouldBe 1.0
    s.sql("SELECT graft_l2sq(array(cast(1.0 as float), cast(0.0 as float)), array(cast(0.0 as float), cast(0.0 as float)))")
      .collect()(0).getDouble(0) shouldBe 1.0
  }
}
