package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming inactivity-gap sessionization via flatMapGroupsWithState —
  * the custom-state path of Structured Streaming (per-user open-session
  * state, closed and emitted on timeout). State is one small record per
  * active user; timeouts bound state size at any scale.
  */
object StreamingSessionize {

  case class Evt(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  case class SessionState(start: Long, end: Long, n: Long)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long)

  def byUser(events: DataFrame, gapMillis: Long,
             watermark: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("user_id", "ts", "event_id")
      .withWatermark("ts", watermark) // EventTimeTimeout requires a watermark
      .as[Evt]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, evts: Iterator[Evt], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user,
              new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n))
          } else {
            // fold this micro-batch's events into (possibly several) sessions
            val sorted = evts.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMillis =>
                  cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  closed ::= Session(user,
                    new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMillis)
            }
            closed.reverseIterator
          }
        })
  }
}
