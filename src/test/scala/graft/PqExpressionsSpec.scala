package graft

import org.apache.spark.sql.functions._
import graft.functions.PqExpressions

/** Native PQ kernels: bit-exact vs a reference implementation, ties to the
  * lowest code, and — the reason they exist — they COMPILE at the
  * production shape (m=8, codes=64, dim=64) where the composed-builtin
  * expression tree exceeded janino's method limit and silently degraded to
  * interpreted execution. `spark.sql.codegen.fallback=false` makes any
  * compile failure throw instead of falling back, so these tests fail loud
  * if the kernels ever regress past the codegen limit.
  */
class PqExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def refEncode(v: Array[Float], cb: Array[Float], m: Int, k: Int): Long = {
    val sub = cb.length / (m * k)
    var out = 0L
    for (s <- 0 until m) {
      var best = 0
      var bestD = Double.MaxValue
      for (c <- 0 until k) {
        var d = 0.0
        val base = (s * k + c) * sub
        for (j <- 0 until sub) {
          val t = v(s * sub + j).toDouble - cb(base + j).toDouble
          d += t * t
        }
        if (d < bestD) { bestD = d; best = c }
      }
      out |= best.toLong << (8 * s)
    }
    out
  }

  private def refLut(v: Array[Float], cb: Array[Float], m: Int, k: Int): Array[Double] = {
    val sub = cb.length / (m * k)
    val out = new Array[Double](m * k)
    for (s <- 0 until m; c <- 0 until k) {
      var d = 0.0
      val base = (s * k + c) * sub
      for (j <- 0 until sub) {
        val t = v(s * sub + j).toDouble - cb(base + j).toDouble
        d += t * t
      }
      out(s * k + c) = d
    }
    out
  }

  test("encode/lut are bit-exact at the production shape with codegen enforced") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val (m, k, dim) = (8, 64, 64) // the shape that previously failed to compile
      val rnd = new scala.util.Random(7)
      val cb = Array.fill(m * k * (dim / m))(rnd.nextGaussian().toFloat)
      val vecs = (0 until 50).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      val df = vecs.toDF("id", "v")
        .select(col("id"), col("v"),
          PqExpressions.encode(spark, col("v"), lit(cb), lit(m), lit(k)).as("codes"),
          PqExpressions.lut(spark, col("v"), lit(cb), lit(m), lit(k)).as("lut"))
      val got = df.collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray, r.getLong(2), r.getSeq[Double](3).toArray))
      got.foreach { case (_, v, codes, lut) =>
        codes shouldBe refEncode(v, cb, m, k)
        lut shouldBe refLut(v, cb, m, k)
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("argmin ties go to the lowest code (duplicate centroids)") {
    val m = 1
    val k = 3
    // codes 1 and 2 are the SAME centroid and both beat code 0
    val cb = Array(9f, 9f, 1f, 1f, 1f, 1f)
    val out = Seq((1L, Array(1f, 1f))).toDF("id", "v")
      .select(PqExpressions.encode(spark, col("v"), lit(cb), lit(m), lit(k)))
      .head().getLong(0)
    out shouldBe 1L
  }

  test("null vector yields null codes") {
    val cb = Array(0f, 0f)
    val out = Seq(Tuple1(null: Array[Float])).toDF("v")
      .select(PqExpressions.encode(spark, col("v"), lit(cb), lit(1), lit(1)))
      .head()
    out.isNullAt(0) shouldBe true
  }
}
