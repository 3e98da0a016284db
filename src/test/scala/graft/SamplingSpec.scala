package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1L to 2000L).map(i => (i, s"src${i % 4}")).toDF("id", "source")

  test("hashSample is deterministic and partitioning-independent") {
    val a = Sampling.hashSample(rows, col("id"), 0.3).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(rows.repartition(13), col("id"), 0.3)
      .select("id").as[Long].collect().toSet
    a shouldBe b
  }

  test("hashSample rate is approximately honored") {
    val n = Sampling.hashSample(rows, col("id"), 0.3).count()
    n.toDouble / 2000 shouldBe 0.3 +- 0.05
  }

  test("samples nest: rate r1 <= r2 implies sample(r1) is a subset of sample(r2)") {
    val small = Sampling.hashSample(rows, col("id"), 0.2).select("id").as[Long].collect().toSet
    val big = Sampling.hashSample(rows, col("id"), 0.6).select("id").as[Long].collect().toSet
    small.subsetOf(big) shouldBe true
  }

  test("rate bounds: 1.0 keeps everything, 0.0 keeps nothing") {
    Sampling.hashSample(rows, col("id"), 1.0).count() shouldBe 2000L
    Sampling.hashSample(rows, col("id"), 0.0).count() shouldBe 0L
  }

  test("different seeds draw different samples") {
    val a = Sampling.hashSample(rows, col("id"), 0.5, seed = "a")
      .select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(rows, col("id"), 0.5, seed = "b")
      .select("id").as[Long].collect().toSet
    a should not be b
  }

  test("takePerKey caps each group at n, deterministically across partitionings") {
    val a = Sampling.takePerKey(rows, "source", col("id"), 7)
      .select("id").as[Long].collect().toSet
    val b = Sampling.takePerKey(rows.repartition(17), "source", col("id"), 7)
      .select("id").as[Long].collect().toSet
    a shouldBe b
    Sampling.takePerKey(rows, "source", col("id"), 7)
      .groupBy("source").count().select("count").as[Long].collect()
      .forall(_ == 7L) shouldBe true
    // groups smaller than n survive whole
    Sampling.takePerKey(rows.filter($"id" <= 2), "source", col("id"), 7).count() shouldBe 2L
  }

  test("takePerKey plans a rank-limit pushdown below the exchange") {
    val plan = Sampling.takePerKey(rows, "source", col("id"), 7)
      .queryExecution.executedPlan.toString
    plan should include("WindowGroupLimit")
  }

  test("mixSources honors per-source weights and the default") {
    val out = Sampling.mixSources(rows, "source",
        Map("src0" -> 0.0, "src1" -> 1.0, "src2" -> 0.5), col("id"), defaultRate = 0.1)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    out.getOrElse("src0", 0L) shouldBe 0L
    out("src1") shouldBe 500L
    out("src2").toDouble / 500 shouldBe 0.5 +- 0.1
    out("src3").toDouble / 500 shouldBe 0.1 +- 0.07
  }

  test("takeTokenBudget: greedy prefix per source, nested budgets, partitioning-stable") {
    val docs = (1 to 99).map(i => (i.toLong, s"s${i % 3}", 10L + i % 7))
      .toDF("id", "src", "tok")
    val small = Sampling.takeTokenBudget(docs, "src", col("id"), col("tok"),
      Map.empty, defaultBudget = 100L)
    val large = Sampling.takeTokenBudget(docs, "src", col("id"), col("tok"),
      Map.empty, defaultBudget = 300L)
    // budget monotonicity: the smaller budget admits a SUBSET
    small.select("id").except(large.select("id")).count() shouldBe 0L
    large.count() should be > small.count()
    // budget respected up to a one-doc overshoot per source
    small.groupBy("src").agg(sum($"tok").as("s"), max($"tok").as("m"))
      .collect().foreach { r =>
        r.getAs[Long]("s") should be < (100L + r.getAs[Long]("m"))
      }
    // deterministic: the same selection at any partitioning
    assertSameRows(
      Sampling.takeTokenBudget(docs.repartition(13), "src", col("id"), col("tok"),
        Map.empty, defaultBudget = 100L),
      small)
    // per-source budgets override the default
    val mixed = Sampling.takeTokenBudget(docs, "src", col("id"), col("tok"),
      Map("s0" -> 40L), defaultBudget = 10000L)
    val bySrc = mixed.groupBy("src").agg(sum($"tok").as("s"))
      .as[(String, Long)].collect().toMap
    bySrc("s0") should be < 60L    // capped
    bySrc("s1") should be > 400L   // default admits everything
  }

  test("weightedSample: per-row probabilities, deterministic, clamped, monotone") {
    val rows = (1L to 4000L).map(i => (i, (i % 100).toDouble / 100.0)).toDF("id", "p")
    val kept = Sampling.weightedSample(rows, $"id", $"p", seed = "ws")
    // determinism under repartitioning
    assertSameRows(kept,
      Sampling.weightedSample(rows.repartition(7), $"id", $"p", seed = "ws"))
    // p=0 rows never survive; p≈1 rows (p=0.99) nearly all do
    kept.filter($"p" === 0.0).count() shouldBe 0L
    kept.filter($"p" === 0.99).count().toDouble should be > 30.0 // of 40
    // aggregate keep fraction tracks the mean probability (±5 points)
    val frac = kept.count().toDouble / 4000.0
    math.abs(frac - 0.495) should be < 0.05
    // clamping: probabilities beyond [0,1] behave as 0/1
    val wild = Seq((1L, 5.0), (2L, -3.0)).toDF("id", "p")
    Sampling.weightedSample(wild, $"id", $"p").collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
    // constant probability degenerates to hashSample's decision exactly
    val const = rows.withColumn("p", lit(0.35))
    assertSameRows(
      Sampling.weightedSample(const, $"id", $"p", seed = "s"),
      Sampling.hashSample(const, $"id", 0.35, seed = "s"))
  }

  test("temperatureMix flattens skewed sources toward uniform; T=1 keeps proportions") {
    // 4 sources: 300/300/300/2100 rows — an 70% bulk source
    val rows = (0L until 3000L).map(i => (i, (i % 10).min(3).toString))
      .toDF("id", "src")
    val mixed = Sampling.temperatureMix(rows, "src", $"id",
      temperature = 2.0, totalFrac = 0.5, seed = "t")
    val bySrc = mixed.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected shares q_s = sqrt(n_s)/Z: small sources ~0.207 each, bulk
    // ~0.379 — the bulk's kept count flattens toward the small sources'
    // (natural proportions would keep 7x more bulk than each slice)
    val bulk = bySrc("3").toDouble
    val slice = bySrc("0").toDouble
    bulk / slice should be < 3.0 // vs 7.0 at natural proportions
    bulk / slice should be > 1.2 // but not fully uniform at T=2
    // total budget honored in expectation (±15%)
    mixed.count().toDouble / 3000.0 shouldBe 0.5 +- 0.075
    // T=1 is natural proportions: every source keeps ~totalFrac of itself
    val t1 = Sampling.temperatureMix(rows, "src", $"id",
      temperature = 1.0, totalFrac = 0.5, seed = "t")
    val t1BySrc = t1.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (t1BySrc("3").toDouble / 2100.0) shouldBe 0.5 +- 0.08
    (t1BySrc("0").toDouble / 300.0) shouldBe 0.5 +- 0.12
    // deterministic: the same call keeps exactly the same rows
    assertSameRows(mixed, Sampling.temperatureMix(rows, "src", $"id",
      temperature = 2.0, totalFrac = 0.5, seed = "t"))
  }
}
