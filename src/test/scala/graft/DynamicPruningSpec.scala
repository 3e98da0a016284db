package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.table.Icebox

/** Spark's DYNAMIC PARTITION PRUNING must fire through the manifest-backed
  * index: a star-join whose dim-side filter selects few partition keys
  * plants a runtime subquery on the fact scan's partition filters, and
  * `IceboxFileIndex.listFiles` then prunes with the runtime values — the
  * fact side reads only the surviving partitions' files. At 100 TB this is
  * the difference between scanning the whole fact table and scanning the
  * handful of partitions the dim filter actually names.
  */
class DynamicPruningSpec extends SparkSpec {
  import spark.implicits._

  private def factScan(df: DataFrame): FileSourceScanExec = {
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec if s.relation.partitionSchema.nonEmpty => s
    }
    scans should have size 1
    scans.head
  }

  private def noAqe[A](body: => A): A = {
    val k = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(k)
    spark.conf.set(k, "false")
    try body finally spark.conf.set(k, prev)
  }

  test("dim-filtered join prunes fact partitions at runtime") {
    noAqe {
      val fact = Icebox(tmpDir("dpp-fact"))
      // 8 identity partitions, several files each
      val rows = (1L to 20000L).map(i => (i % 8, i, i * 3))
      fact.append(rows.toDF("r", "id", "v").repartition(4), partitionBy = Seq("r"))
      val totalFiles = fact.currentSnapshot.get.files.size
      totalFiles should be > 8

      // dim must be FILE-backed: a local Seq would constant-fold to a
      // LocalRelation, leaving no selective Filter for DPP to detect
      val dimT = Icebox(tmpDir("dpp-dim"))
      dimT.append(Seq((0L, "keep"), (1L, "drop"), (2L, "drop"), (3L, "drop"),
        (4L, "drop"), (5L, "drop"), (6L, "drop"), (7L, "drop")).toDF("r", "tag"))
      val dim = dimT.readIndexed(spark)

      val q = fact.readIndexed(spark)
        .join(broadcast(dim), "r")
        .filter(col("tag") === "keep")
        .agg(sum("v").as("sv"))

      // plan carries the runtime pruning subquery on the fact scan
      val scan = factScan(q)
      scan.partitionFilters.exists(e =>
        e.exists(_.isInstanceOf[DynamicPruningExpression])) shouldBe true

      // execute: only partition r=0 survives
      val expected = rows.filter(_._1 == 0L).map(_._3).sum
      q.collect().head.getLong(0) shouldBe expected

      // post-execution metrics: the scan touched a fraction of the files
      val numFiles = scan.metrics("numFiles").value
      assert(numFiles > 0 && numFiles < totalFiles,
        s"DPP had no effect: read $numFiles of $totalFiles files")
    }
  }

  test("runtime pruning composes with static stats skipping") {
    noAqe {
      val fact = Icebox(tmpDir("dpp-mixed"))
      val rows = (1L to 20000L).map(i => (i % 4, i, i % 100))
      fact.append(rows.toDF("r", "id", "v").repartitionByRange(8, col("id")),
        partitionBy = Seq("r"))
      val totalFiles = fact.currentSnapshot.get.files.size

      val dimT = Icebox(tmpDir("dpp-dim2"))
      dimT.append(Seq((0L, "keep"), (1L, "drop"), (2L, "keep"), (3L, "drop"))
        .toDF("r", "tag"))
      val dim = dimT.readIndexed(spark)
      val q = fact.readIndexed(spark)
        .join(broadcast(dim), "r")
        .filter(col("tag") === "keep" && col("id") <= 1000L)
        .agg(count(lit(1)).as("n"))

      val expected = rows.count(t => (t._1 == 0L || t._1 == 2L) && t._2 <= 1000L)
      q.collect().head.getLong(0) shouldBe expected
      val numFiles = factScan(q).metrics("numFiles").value
      // static range filter prunes files inside each partition; DPP prunes
      // whole partitions — together the scan reads a small slice
      assert(numFiles < totalFiles / 2,
        s"combined pruning too weak: read $numFiles of $totalFiles files")
    }
  }
}
