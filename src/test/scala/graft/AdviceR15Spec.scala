package graft

import org.apache.spark.sql.functions._
import graft.operators.{Decontaminate, Sampling}
import graft.sql.{DmlSql, MvRewrite}
import graft.table.Icebox

/** Round-16 hardening from the round-15 advice: temperature mixing
  * buckets null sources instead of NPE-ing (and without skewing every
  * other source's rate), semantic decontamination's candidacy is BANDED
  * (several independent hyperplane signatures OR-ed — single-band recall
  * at cosine 0.99 is only ~0.69), the star-view rewrite refuses
  * self-referential/cyclic `mv.star.parents` graphs up front, and the
  * bench headline's length bound holds unconditionally. The fifth item
  * (ivfPqReassign return value / dropped-id signal) is pinned in
  * SimilaritySpec alongside the O(moved) reassign contract.
  */
class AdviceR15Spec extends SparkSpec {
  import spark.implicits._

  override def afterAll(): Unit = {
    MvRewrite.uninstall(spark)
    spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    super.afterAll()
  }

  test("temperatureMix buckets null sources: no NPE, nulls sampled, others unskewed") {
    val rows = (0L until 3000L).map { i =>
      (i, if (i % 10 == 9) null else (i % 10).min(2).toString)
    }.toDF("id", "src") // 300/300/2100 named + 300 null-source rows
    val mixed = Sampling.temperatureMix(rows, "src", $"id",
      temperature = 2.0, totalFrac = 0.5, seed = "t")
    val bySrc = mixed.groupBy("src").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("<null>") -> r.getLong(1)).toMap
    // null-source rows are a first-class bucket, not silently dropped
    bySrc.getOrElse("<null>", 0L).toDouble should be > 0.0
    // and the named sources' rates equal the run where nulls are a real
    // string bucket — i.e. the null group neither skews z/total nor leaks
    val named = Sampling.temperatureMix(
      rows.withColumn("src", coalesce($"src", lit("__null__"))), "src", $"id",
      temperature = 2.0, totalFrac = 0.5, seed = "t")
    assertSameRows(mixed.filter($"src".isNotNull),
      named.filter($"src" =!= "__null__"))
    mixed.count() shouldBe named.count()
  }

  test("semantic decon banding: bands=4 catches ~all borderline leaks a single band misses") {
    val dim = 64
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val cosT = 0.99
    val sinT = math.sqrt(1 - cosT * cosT)
    val pairs = (0 until 120).map { i =>
      val v = Array.fill(dim)(rnd.nextGaussian())
      val nv = math.sqrt(v.map(x => x * x).sum)
      val vu = v.map(_ / nv)
      val w0 = Array.fill(dim)(rnd.nextGaussian())
      val d = w0.zip(vu).map { case (a, b) => a * b }.sum
      val w = w0.zip(vu).map { case (a, b) => a - d * b } // ⟂ v
      val nw = math.sqrt(w.map(x => x * x).sum)
      val e = vu.zip(w).map { case (a, b) => cosT * a + sinT * b / nw }
      (i.toLong, unit(v.map(identity)), unit(e))
    }
    val corpus = pairs.map(p => (p._1, p._2)).toDF("vec_id", "embedding")
    val eval = pairs.map(p => (p._1 + 10000L, p._3)).toDF("vec_id", "embedding")
    def recall(bands: Int): Double =
      Decontaminate.semanticContaminatedIds(corpus, "embedding", "vec_id",
        eval, "embedding", dim, threshold = 0.985, bands = bands)
        .count().toDouble / pairs.size
    val one = recall(1)
    val four = recall(4)
    // single 8-plane band: ~(1-acos(.99)/pi)^8 ≈ 0.69 of borderline pairs
    one should be < 0.9
    four should be > one
    four should be >= 0.9 // ≈ 1-(1-0.69)^4 ≈ 0.99 in expectation
    // the identical-vector contract survives banding: exact copies always
    // collide in EVERY band
    Decontaminate.semanticContaminatedIds(corpus, "embedding", "vec_id",
      corpus.withColumn("vec_id", $"vec_id" + 10000L), "embedding", dim,
      threshold = 0.99, bands = 4).count() shouldBe pairs.size.toLong
  }

  test("star rewrite refuses self-referential / cyclic mv.star.parents up front") {
    MvRewrite.install(spark)
    val wh = tmpDir("adv15_wh")
    DmlSql.setWarehouse(wh)
    val fact = Icebox(tmpDir("adv15_f"))
    fact.append((1 to 60).map(i => (i.toLong, (i % 10).toLong, i * 2L))
      .toDF("id", "ck", "v"))
    val dCust = Icebox(tmpDir("adv15_c"))
    dCust.append((0 until 10).map(i => (i.toLong, (i % 3).toLong)).toDF("c_id", "nk"))
    val dNat = Icebox(tmpDir("adv15_n"))
    dNat.append((0 until 3).map(i => (i.toLong, s"nation$i")).toDF("n_id", "n_name"))
    fact.registerView(spark, "adv15f")
    dCust.registerView(spark, "adv15c")
    dNat.registerView(spark, "adv15n")
    DmlSql.run(spark,
      """CREATE MATERIALIZED VIEW adv15_view AS
        |SELECT n_name, nk, count(*), sum(v) FROM adv15f
        |JOIN adv15c ON adv15f.ck = adv15c.c_id
        |JOIN adv15n ON adv15c.nk = adv15n.n_id
        |GROUP BY n_name, nk""".stripMargin)
    def servedFromView(df: org.apache.spark.sql.DataFrame): Boolean =
      df.inputFiles.nonEmpty && df.inputFiles.forall(_.contains("/_mv/"))
    val q =
      """SELECT n_name, count(*) AS cnt, sum(v) AS sv FROM adv15f
        |JOIN adv15c ON adv15f.ck = adv15c.c_id
        |JOIN adv15n ON adv15c.nk = adv15n.n_id
        |GROUP BY n_name""".stripMargin
    assert(servedFromView(spark.sql(q)))
    val mvDir = new java.io.File(wh, "_mv").listFiles().head.toString
    val target = Icebox(mvDir)
    target.properties("mv.star.parents") shouldBe "-1;0" // the written convention
    // self-referential (p == d) and cyclic (later-dim parent) graphs are
    // non-trees a refresh can never have written — refuse, don't serve
    for (corrupt <- Seq("0;0", "1;0", "-1;1")) {
      target.setProperties(Map("mv.star.parents" -> corrupt))
      MvRewrite.invalidateRegistry()
      assert(!servedFromView(spark.sql(q)), s"served under parents=$corrupt")
    }
    target.setProperties(Map("mv.star.parents" -> "-1;0"))
    MvRewrite.invalidateRegistry()
    assert(servedFromView(spark.sql(q)))
  }

  test("bench headline length bound holds even with every query dropped") {
    val longSf = "/very/long/testdata/path/" + ("x" * 3000) + "/sf9.9"
    val line = Bench.encodeHeadline(
      Seq("q1" -> 1.0, "q2" -> 2.0), total = 3.0, sfDir = longSf,
      cpus = "32", nQueries = 2, degraded = false, nSuspect = 0)
    line.length should be <= 1900
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    node.get("metric").asText() shouldBe "total"
    node.get("value").asDouble() shouldBe 3.0 +- 1e-9
    // normal-shaped inputs are untouched by the fallback
    val normal = Bench.encodeHeadline(Seq("q1" -> 1.0), 1.0, "/root/testdata/sf0.1",
      "32", 1, degraded = false, nSuspect = 0)
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(normal)
      .get("queries").get("q1").asDouble() shouldBe 1.0 +- 1e-9
  }
}
