package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization: group per-user event streams into sessions separated by
  * an inactivity gap.
  *
  * Two faces of one semantics:
  *  - `batch` — the classic lag/cumsum window shape: one shuffle on the
  *    user key, sessions derived by a running sum of gap-breaks. Fully
  *    SQL-expressible (DuckDB-oracle-checked as q_sessionize).
  *  - `streaming` — `flatMapGroupsWithState` with per-user session state:
  *    the Structured Streaming custom-state surface
  *    (`KeyValueGroupedDataset`), emitting a session whenever a new event
  *    arrives after the gap. State per key is O(1) (one open session).
  */
object Sessionize {

  /** Batch sessionization. Output: one row per (user, session) with start,
    * end, event count, and value sum. Deterministic tie-break on `idCol`.
    */
  def batch(events: DataFrame, userCol: String, tsCol: String, valueCol: String,
      idCol: String, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val runup = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val micros = (c: org.apache.spark.sql.Column) => unix_micros(c.cast("timestamp"))
    events
      .withColumn("__brk",
        when(micros(col(tsCol)) - micros(lag(col(tsCol), 1).over(byUser))
          > gapMinutes * 60L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum("__brk").over(runup))
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        round(sum(col(valueCol)), 2).as("total_value"))
  }

  // ------------------------------------------------------------- streaming

  final case class Event(userId: Long, ts: Timestamp, value: Double)
  final case class OpenSession(start: Long, end: Long, n: Long, total: Double)
  final case class Session(userId: Long, sessionStart: Timestamp, sessionEnd: Timestamp,
      nEvents: Long, totalValue: Double)
  /** Event-time state: ALL sessions not yet safe to emit (pairwise > gap
    * apart, sorted by start). A session leaves the buffer only when the
    * watermark passes its `end + gap`, so Append-mode output is final.
    * Size is bounded by `watermarkDelay / gap + 2` entries, not by data.
    */
  final case class SessionBuf(sessions: List[OpenSession])

  /** Streaming sessionization over a typed event stream. Sessions are
    * emitted when CLOSED by a later event beyond the gap (the final open
    * session per key stays in state — flush by sending a sentinel, or use
    * `streamingEventTime` for watermark-driven emission). Events within a
    * micro-batch are sorted per key; cross-batch ordering relies on
    * upstream watermarking. Processing-time semantics.
    */
  def streaming(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000L
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          val closed = Seq.newBuilder[Session]
          var cur = state.getOption
          batch.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.end > gapMs =>
                closed += Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total)
                cur = Some(OpenSession(t, t, 1, e.value))
              case Some(s) =>
                cur = Some(OpenSession(s.start, math.max(s.end, t), s.n + 1, s.total + e.value))
              case None =>
                cur = Some(OpenSession(t, t, 1, e.value))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  /** Event-time streaming sessionization: watermark + `EventTimeTimeout`.
    *
    * Semantics the processing-time face can't give:
    *  - '''late-event merge''': an event arriving out of order but within
    *    the watermark joins its session — even one already closed by a
    *    beyond-gap successor, and even when it BRIDGES two sessions into
    *    one (events beyond the watermark are dropped by the engine,
    *    bounding state);
    *  - '''watermark-driven flush''': a session is EMITTED only once the
    *    event-time watermark passes `session end + gap`, i.e. exactly when
    *    no in-watermark event can still belong to it — so Append output is
    *    final and never split/overlapping, with no sentinel event needed.
    *
    * State per key is a buffer of undecided sessions, bounded by
    * `watermarkDelay / gap + 2` entries (a gap-closed session is retained
    * at most one watermark delay). The timeout is re-armed to the earliest
    * `end + gap` still in the buffer.
    */
  def streamingEventTime(events: Dataset[Event], gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000L

    // Emit every session the watermark has sealed; re-arm for the rest.
    // STRICT end+gap < wm: the engine admits events with ts == watermark,
    // so a session is only final once no admissible ts can extend it.
    def flush(userId: Long, buf: List[OpenSession],
        state: GroupState[SessionBuf]): Iterator[Session] = {
      val wm = state.getCurrentWatermarkMs()
      val (done, pending) = buf.partition(_.end + gapMs < wm)
      if (pending.nonEmpty) {
        state.update(SessionBuf(pending))
        state.setTimeoutTimestamp(math.max(pending.map(_.end).min + gapMs, wm + 1))
      } else state.remove()
      done.sortBy(_.start).iterator.map(s =>
        Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total))
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionBuf]) =>
          if (state.hasTimedOut) {
            flush(userId, state.get.sessions, state)
          } else {
            var buf = state.getOption.map(_.sessions).getOrElse(Nil)
            batch.foreach { e =>
              val t = e.ts.getTime
              // An in-watermark event joins every session within `gap` of its
              // span — possibly bridging the two adjacent ones into one.
              val (near, far) = buf.partition(s => t >= s.start - gapMs && t <= s.end + gapMs)
              val merged = near.foldLeft(OpenSession(t, t, 1, e.value)) { (a, s) =>
                OpenSession(math.min(a.start, s.start), math.max(a.end, s.end),
                  a.n + s.n, a.total + s.total)
              }
              buf = merged :: far
            }
            flush(userId, buf, state)
          }
      }
  }
}
