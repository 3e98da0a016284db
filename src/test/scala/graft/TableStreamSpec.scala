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
