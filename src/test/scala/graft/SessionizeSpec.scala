package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Sessionize
import graft.operators.Sessionize.{Event, Session}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("batch sessionization splits on the inactivity gap") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0, 1L),
      (1L, ts("2024-01-01 10:10:00"), 2.0, 2L),   // same session (10 min)
      (1L, ts("2024-01-01 11:00:00"), 3.0, 3L),   // new session (50 min gap)
      (2L, ts("2024-01-01 10:00:00"), 4.0, 4L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = Sessionize.batch(events, "user_id", "ts", "value", "event_id", gapMinutes = 30)
      .orderBy("user_id", "session_id").collect()
    out.length shouldBe 3
    out(0).getAs[Long]("n_events") shouldBe 2
    out(0).getAs[Double]("total_value") shouldBe 3.0
    out(1).getAs[Long]("n_events") shouldBe 1
    out(2).getAs[Long]("user_id") shouldBe 2L
  }

  test("streaming sessionization closes sessions across micro-batches via state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.streaming(input.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()

    input.addData(
      Event(1L, ts("2024-01-01 10:00:00"), 1.0),
      Event(1L, ts("2024-01-01 10:10:00"), 2.0))
    q.processAllAvailable()
    spark.table("sess_out").count() shouldBe 0 // session still open in state

    // next batch: an event far beyond the gap closes the first session
    input.addData(Event(1L, ts("2024-01-01 12:00:00"), 5.0))
    q.processAllAvailable()
    val out = spark.table("sess_out").as[Session].collect()
    out.length shouldBe 1
    out(0).nEvents shouldBe 2
    out(0).totalValue shouldBe 3.0
    out(0).sessionEnd shouldBe ts("2024-01-01 10:10:00")
    q.stop()
  }
}
