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

  test("event-time sessionization merges late events and flushes on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.streamingEventTime(input.toDS(),
      gapMinutes = 30, watermarkDelay = "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess_et")
      .outputMode("append").start()

    input.addData(
      Event(1L, ts("2024-01-01 10:00:00"), 1.0),
      Event(1L, ts("2024-01-01 10:10:00"), 2.0))
    q.processAllAvailable()
    spark.table("sess_et").count() shouldBe 0 // open, watermark at 10:00

    // LATE event (10:05 < max seen 10:10) but within the watermark: merges
    input.addData(Event(1L, ts("2024-01-01 10:05:00"), 4.0))
    q.processAllAvailable()
    spark.table("sess_et").count() shouldBe 0

    // another user's far-future event advances the watermark past
    // user 1's (end + gap); the NEXT trigger fires the event-time timeout
    input.addData(Event(2L, ts("2024-01-01 13:00:00"), 9.0))
    q.processAllAvailable()
    input.addData(Event(2L, ts("2024-01-01 13:00:01"), 1.0))
    q.processAllAvailable()

    val out = spark.table("sess_et").as[Session].collect()
    out.length shouldBe 1 // user 1 flushed WITHOUT any closing event
    out(0).userId shouldBe 1L
    out(0).nEvents shouldBe 3 // the late event merged
    out(0).totalValue shouldBe 7.0
    out(0).sessionStart shouldBe ts("2024-01-01 10:00:00")
    out(0).sessionEnd shouldBe ts("2024-01-01 10:10:00")
    q.stop()
  }

  test("event-time: gap-closed session is NOT emitted until the watermark seals it, " +
      "so a late in-watermark event can still bridge it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.streamingEventTime(input.toDS(),
      gapMinutes = 30, watermarkDelay = "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess_bridge")
      .outputMode("append").start()

    input.addData(Event(1L, ts("2024-01-01 10:00:00"), 1.0))
    q.processAllAvailable()
    // 10:35 is beyond the 30-min gap: the [10:00] session is gap-closed but
    // must stay in state — a late event <= 10:30 is still in-watermark
    input.addData(Event(1L, ts("2024-01-01 10:35:00"), 2.0))
    q.processAllAvailable()
    spark.table("sess_bridge").count() shouldBe 0 // nothing emitted early

    // late event 10:28 (>= watermark 10:25) is within gap of BOTH sessions:
    // bridges them back into one
    input.addData(Event(1L, ts("2024-01-01 10:28:00"), 4.0))
    q.processAllAvailable()
    spark.table("sess_bridge").count() shouldBe 0

    // advance the watermark past 10:35 + gap via another user, then trigger
    input.addData(Event(2L, ts("2024-01-01 11:20:00"), 9.0))
    q.processAllAvailable()
    input.addData(Event(2L, ts("2024-01-01 11:20:01"), 1.0))
    q.processAllAvailable()

    val out = spark.table("sess_bridge").as[Session].collect()
    out.length shouldBe 1
    out(0).userId shouldBe 1L
    out(0).nEvents shouldBe 3 // one merged session, not a split pair
    out(0).totalValue shouldBe 7.0
    out(0).sessionStart shouldBe ts("2024-01-01 10:00:00")
    out(0).sessionEnd shouldBe ts("2024-01-01 10:35:00")
    q.stop()
  }
}
