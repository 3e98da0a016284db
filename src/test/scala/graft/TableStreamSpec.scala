package graft

import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Streaming
import graft.table.Icebox

class TableStreamSpec extends SparkSpec {
  import spark.implicits._

  test("tableStream surfaces each commit's rows incrementally via the file stream") {
    val table = Icebox(tmpDir("tstream"))
    table.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val ckpt = tmpDir("tstream-ckpt")

    def drain(): Long = {
      val counter = new java.util.concurrent.atomic.AtomicLong(0)
      val q = Streaming.tableStream(spark, table)
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          counter.addAndGet(batch.count()); ()
        }
        .start()
      q.awaitTermination(60000)
      counter.get()
    }

    drain() shouldBe 2L          // initial backlog
    table.append(Seq((3L, "c")).toDF("id", "v"))
    drain() shouldBe 1L          // only the new commit's file
    drain() shouldBe 0L          // nothing new
  }

  test("changeFeed delivers exactly the committed delta per cycle, cursor survives restarts") {
    val table = Icebox(tmpDir("cfeed"))
    val cursor = tmpDir("cfeed-cur") + "/cursor"
    table.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))

    def drain(): Seq[Long] = {
      val seen = scala.collection.mutable.ArrayBuffer[Long]()
      Streaming.changeFeed(spark, table, cursor) { (batch, _) =>
        seen ++= batch.select("id").as[Long].collect()
      }
      seen.toSeq.sorted
    }

    drain() shouldBe Seq(1L, 2L)       // initial backlog = full table
    drain() shouldBe Seq()             // no new commit -> no delivery
    table.append(Seq((3L, "c")).toDF("id", "v"))
    table.append(Seq((4L, "d")).toDF("id", "v"))
    drain() shouldBe Seq(3L, 4L)       // both commits since the cursor, once
    drain() shouldBe Seq()
  }

  test("changeFeed never surfaces uncommitted files (manifest-driven)") {
    val table = Icebox(tmpDir("cfeed2"))
    table.append(Seq((1L, "a")).toDF("id", "v"))
    val cursor = tmpDir("cfeed2-cur") + "/cursor"
    Streaming.changeFeed(spark, table, cursor) { (_, _) => () }
    // simulate a crashed commit: orphan parquet under data/ never committed
    val orphanDir = java.nio.file.Paths.get(table.tableDir, "data", "graft_commit=deadbeef")
    Seq((99L, "orphan")).toDF("id", "v").write.parquet(orphanDir.toString)
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    Streaming.changeFeed(spark, table, cursor) { (batch, _) =>
      seen ++= batch.select("id").as[Long].collect()
    }
    seen shouldBe empty                // the orphan is invisible to the feed
  }

  test("tableStream on a partitioned table reconstructs partition columns") {
    val table = Icebox(tmpDir("tstream2"))
    table.append(Seq((1L, "x", "d1"), (2L, "y", "d2")).toDF("id", "v", "dt"), Seq("dt"))
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
    val q = Streaming.tableStream(spark, table)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("tstream2-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        out ++= batch.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))); ()
      }.start()
    q.awaitTermination(60000)
    out.sorted.toSeq shouldBe Seq((1L, "x", "d1"), (2L, "y", "d2"))
  }
}
