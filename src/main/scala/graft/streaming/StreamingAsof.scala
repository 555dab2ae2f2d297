package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stream-stream backward as-of join — an operator Structured Streaming
  * lacks natively (it offers equality and interval joins, not "latest
  * right at-or-before"). For each left event, emits the latest right
  * event with the same key and right.ts <= left.ts.
  *
  * Correctness under out-of-order arrival: a left row is finalized only
  * once the watermark passes its event time. Any right row that could
  * still arrive for it would carry right.ts <= left.ts <= watermark and
  * would therefore be dropped as late by the watermark itself — so the
  * match set of a finalized left row is provably complete (same
  * completeness argument as append-mode windows).
  *
  * State per key is bounded: the pending (post-watermark) left rows, the
  * post-watermark right rows, and ONE representative right row at-or-
  * before the watermark (the only pre-watermark right any future left can
  * ever match). Event-time timeouts flush pending lefts for quiet keys.
  */
object StreamingAsof {

  case class LeftEvt(user_id: Long, ts: java.sql.Timestamp, event_id: Long, value: Double)
  case class RightEvt(user_id: Long, ts: java.sql.Timestamp, value: Double)
  // encoder-visible (Spark codegen can't instantiate private classes)
  case class Tagged(user_id: Long, ts: java.sql.Timestamp, side: Int,
                    event_id: Long, value: Double)
  case class Buf(lefts: List[(Long, Long, Double)], // (tsMs, event_id, value)
                 rights: List[(Long, Double)])      // (tsMs, value)
  case class Joined(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
                    value: Double, r_ts: java.sql.Timestamp, r_value: Double)

  /** `left`/`right`: streaming frames with (user_id, ts, [event_id,] value).
    * Emits Append-mode joined rows once finalizable. Right rows tied on
    * (key, ts) resolve to the greatest value — deterministic, mirroring
    * the batch operator's struct-greatest tiebreak.
    */
  def join(left: DataFrame, right: DataFrame,
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
          val (ready, pending) = st.lefts.partition(_._1 <= wm)
          val rightsSorted = st.rights.sortBy(identity) // (ts, value) asc
          val out = ready.sortBy(l0 => (l0._1, l0._2)).flatMap {
            case (lts, eid, lv) =>
              rightsSorted.takeWhile(_._1 <= lts).lastOption.map {
                case (rts, rv) =>
                  Joined(eid, user, new java.sql.Timestamp(lts), lv,
                    new java.sql.Timestamp(rts), rv)
              }
          }
          // prune rights: one representative at-or-before the watermark,
          // everything after it stays
          val (old, fresh) = rightsSorted.partition(_._1 <= wm)
          val kept = old.lastOption.toList ++ fresh
          state.update(Buf(pending, kept))
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(pending.map(_._1).min + 1)
          out.iterator
        })
  }
}
