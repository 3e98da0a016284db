package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.table.Icebox

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg matches plain groupBy-agg, incl. multiple aggs on one column") {
    val df = (1 to 500).map(i => (if (i % 10 == 0) "cold" + i else "hot", i.toDouble)).toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("sum_v"), count("v").as("count_v"),
      min("v").as("min_v"), max("v").as("max_v"))
    val salted = Skew.saltedAgg(df, Seq("k"), salts = 8)(
      Seq("v" -> "sum", "v" -> "count", "v" -> "min", "v" -> "max"))
    canon(salted) shouldBe canon(plain)
  }

  test("saltedAgg on distinct agg columns equals unsalted aggregation") {
    val df = (1 to 500).map(i => ("hot", i.toDouble, i.toLong)).toDF("k", "v", "w")
    val plain = df.groupBy("k").agg(sum("v").as("sum_v"), max("w").as("max_w"))
    val salted = Skew.saltedAgg(df, Seq("k"), salts = 8)(Seq("v" -> "sum", "w" -> "max"))
      .withColumnRenamed("sum_v", "sum_v").withColumnRenamed("max_w", "max_w")
    canon(salted) shouldBe canon(plain)
  }

  test("saltedJoin equals plain join, with the right side replicated per salt") {
    val left = (1 to 300).map(i => (if (i % 3 == 0) "a" else "b", i)).toDF("k", "v")
    val right = Seq(("a", "alpha"), ("b", "beta"), ("c", "gamma")).toDF("k", "name")
    val plain = left.join(right, Seq("k"))
    val salted = Skew.saltedJoin(left, right, "k", salts = 4)
    canon(salted) shouldBe canon(plain)
    salted.count() shouldBe 300
  }

  test("compactPartitions rewrites only hot partitions, carries cold files by reference") {
    val t = Icebox(tmpDir("cpart"))
    val mk = (dt: String, n: Int) => (1 to n).map(i => (i.toLong, dt)).toDF("id", "dt")
    // hot partition: 6 commits → 6+ files; cold partition: 1 commit
    t.append(mk("cold", 3), partitionBy = Seq("dt"))
    (1 to 6).foreach(_ => t.append(mk("hot", 2), partitionBy = Seq("dt")))
    val coldFiles = t.currentSnapshot.get.files.filter(_.partition("dt") == "cold").map(_.path).toSet
    val hotBefore = t.currentSnapshot.get.files.count(_.partition("dt") == "hot")
    val rewritten = t.compactPartitions(spark, minFiles = 4)
    rewritten shouldBe Seq(Map("dt" -> "hot"))
    val after = t.currentSnapshot.get
    after.files.filter(_.partition("dt") == "cold").map(_.path).toSet shouldBe coldFiles
    after.files.count(_.partition("dt") == "hot") should be < hotBefore
    t.read(spark).count() shouldBe (3 + 12)
  }
}
