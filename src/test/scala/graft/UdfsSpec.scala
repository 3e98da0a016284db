package graft

import org.apache.spark.sql.functions._
import graft.functions.Udfs

class UdfsSpec extends SparkSpec {
  import spark.implicits._

  test("registerScalar exposes a named scalar UDF to SQL and the DSL") {
    Udfs.registerScalar[String, Int](spark, "graft_strlen")(s => if (s == null) 0 else s.length)
    val out = Seq("abc", "").toDF("s")
      .select(call_udf("graft_strlen", $"s").as("n")).as[Int].collect()
    out.sorted shouldBe Array(0, 3)
    spark.sql("SELECT graft_strlen('hello')").collect()(0).getInt(0) shouldBe 5
  }

  test("GeometricMean aggregator computes exp(mean(log)) with partial merge") {
    val ds = Seq(1.0, 10.0, 100.0).toDS()
    val gm = ds.select(Udfs.GeometricMean.column).collect()(0)
    gm shouldBe 10.0 +- 1e-9
    // zeros/negatives are ignored, empty → 0
    Seq(-1.0, 0.0).toDS().select(Udfs.GeometricMean.column).collect()(0) shouldBe 0.0
  }

  test("hash-method file CDC detects content rewrites that keep size") {
    import java.nio.file.{Files, Paths}
    val dir = tmpDir("hash-cdc")
    val f = Paths.get(dir, "a.txt")
    Files.write(f, "aaaa".getBytes)
    val info = graft.cdc.FileCdc.FileInfo(f.toString, 4L, 0L, None)
    val cp0 = graft.cdc.FileCdc.Checkpoint.initial
    val changed0 = graft.cdc.FileCdc.detectChanges(Seq(info), cp0, "hash", "dt")
    changed0.size shouldBe 1
    val cp1 = graft.cdc.FileCdc.advanceCheckpoint(cp0, changed0, Seq(info), "hash", "dt", 1L)
    // same content → unchanged
    graft.cdc.FileCdc.detectChanges(Seq(info), cp1, "hash", "dt") shouldBe empty
    // same SIZE, different content → detected (size/mtime methods would miss this)
    Files.write(f, "bbbb".getBytes)
    graft.cdc.FileCdc.detectChanges(Seq(info), cp1, "hash", "dt").size shouldBe 1
  }
}
