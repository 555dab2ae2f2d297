package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stream-stream forward interval join — live attribution: for each left
  * event, every right event with the same key and right.ts in
  * (left.ts, left.ts + window]. The forward complement of StreamingAsof.
  *
  * Completeness: a left row finalizes once the watermark passes
  * left.ts + window — any right that could still join it would carry
  * right.ts <= watermark and be dropped as late. State per key is
  * bounded: pending lefts satisfy left.ts > watermark - window, and only
  * rights with right.ts > watermark - window can match a pending left,
  * so everything older is pruned each invocation.
  */
object StreamingInterval {

  case class Tagged(user_id: Long, ts: java.sql.Timestamp, side: Int,
                    event_id: Long, value: Double)
  case class Buf(lefts: List[(Long, Long, Double)], // (tsMs, event_id, value)
                 rights: List[(Long, Double)])      // (tsMs, value)
  case class Joined(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
                    value: Double, r_ts: java.sql.Timestamp, r_value: Double)

  def forward(left: DataFrame, right: DataFrame, windowMillis: Long,
              watermark: String = "10 minutes"): Dataset[Joined] = {
    val spark = left.sparkSession
    import spark.implicits._
    val l = left.selectExpr("user_id", "ts", "CAST(1 AS INT) AS side",
        "event_id", "value").withWatermark("ts", watermark)
    val r = right.selectExpr("user_id", "ts", "CAST(0 AS INT) AS side",
        "CAST(-1 AS BIGINT) AS event_id", "value").withWatermark("ts", watermark)

    l.unionByName(r).as[Tagged]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, evts: Iterator[Tagged], state: GroupState[Buf]) => {
          val wm = state.getCurrentWatermarkMs()
          var st = state.getOption.getOrElse(Buf(Nil, Nil))
          if (!state.hasTimedOut) {
            evts.foreach { t =>
              if (t.side == 1)
                st = st.copy(lefts = (t.ts.getTime, t.event_id, t.value) :: st.lefts)
              else
                st = st.copy(rights = (t.ts.getTime, t.value) :: st.rights)
            }
          }
          val (ready, pending) = st.lefts.partition(_._1 + windowMillis <= wm)
          val rightsSorted = st.rights.sortBy(identity)
          val out = ready.sortBy(l0 => (l0._1, l0._2)).flatMap {
            case (lts, eid, lv) =>
              rightsSorted
                .filter(r0 => r0._1 > lts && r0._1 <= lts + windowMillis)
                .map { case (rts, rv) =>
                  Joined(eid, user, new java.sql.Timestamp(lts), lv,
                    new java.sql.Timestamp(rts), rv)
                }
          }
          val keptRights = rightsSorted.filter(_._1 > wm - windowMillis)
          if (pending.isEmpty && keptRights.isEmpty) state.remove()
          else {
            state.update(Buf(pending, keptRights))
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(pending.map(_._1).min + windowMillis + 1)
          }
          out.iterator
        })
  }
}
