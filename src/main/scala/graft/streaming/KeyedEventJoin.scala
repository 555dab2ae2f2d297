package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Shared engine for event-time stream-stream joins (as-of, interval):
  * tag-union both streams, group by key, buffer per key, finalize a left
  * row once the watermark passes its `finalizeAt` threshold — at which
  * point every right that could still match it would be dropped as late,
  * so emissions are provably complete. Specializations supply only the
  * finalize threshold, the match predicate, the right-buffer pruning
  * policy, and the emit shape (inner joins emit per match; left-outer
  * emits a null-right row for finalized-unmatched lefts); the state
  * machine (buffering, watermark bookkeeping, timeouts, state removal)
  * lives here once.
  */
object KeyedEventJoin {

  // encoder-visible (Spark codegen can't instantiate private classes)
  case class Tagged(user_id: Long, ts: java.sql.Timestamp, side: Int,
                    event_id: Long, value: Double)
  case class Buf(lefts: List[(Long, Long, Double)], // (tsMs, event_id, value)
                 rights: List[(Long, Double)])      // (tsMs, value)
  case class Joined(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
                    value: Double, r_ts: java.sql.Timestamp, r_value: Double)
  /** Left-outer output: right side absent for unmatched lefts. */
  case class JoinedOpt(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
                       value: Double, r_ts: Option[java.sql.Timestamp],
                       r_value: Option[Double])

  /** @param finalizeAt   watermark threshold for a left row's event time
    * @param matches      rights (ts-sorted asc) matched to a finalized left
    * @param rightHorizon rights at-or-before this are no longer matchable
    * @param keepLatestOldRight retain the newest pre-horizon right (the
    *                     as-of representative a future left may match)
    * @param emit         output rows for one finalized left given its
    *                     (possibly empty) match list
    */
  private[streaming] def runCore[O <: Product : scala.reflect.runtime.universe.TypeTag](
      left: DataFrame, right: DataFrame, watermark: String,
      finalizeAt: Long => Long,
      matches: (Long, List[(Long, Double)]) => List[(Long, Double)],
      rightHorizon: Long => Long,
      keepLatestOldRight: Boolean)(
      emit: (Long, (Long, Long, Double), List[(Long, Double)]) => List[O]): Dataset[O] = {
    val spark = left.sparkSession
    import spark.implicits._
    implicit val outEnc: Encoder[O] = Encoders.product[O]
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
          val (ready, pending) = st.lefts.partition(l0 => finalizeAt(l0._1) <= wm)
          val rightsSorted = st.rights.sortBy(identity)
          val out = ready.sortBy(l0 => (l0._1, l0._2)).flatMap { l0 =>
            emit(user, l0, matches(l0._1, rightsSorted))
          }
          val horizon = rightHorizon(wm)
          val (old, fresh) = rightsSorted.partition(_._1 <= horizon)
          val kept = (if (keepLatestOldRight) old.lastOption.toList else Nil) ++ fresh
          if (pending.isEmpty && kept.isEmpty) state.remove()
          else {
            state.update(Buf(pending, kept))
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(pending.map(l0 => finalizeAt(l0._1)).min + 1)
          }
          out.iterator
        })
  }

  def run(left: DataFrame, right: DataFrame, watermark: String,
          finalizeAt: Long => Long,
          matches: (Long, List[(Long, Double)]) => List[(Long, Double)],
          rightHorizon: Long => Long,
          keepLatestOldRight: Boolean): Dataset[Joined] =
    runCore[Joined](left, right, watermark, finalizeAt, matches, rightHorizon,
      keepLatestOldRight) { case (user, (lts, eid, lv), ms) =>
      ms.map { case (rts, rv) =>
        Joined(eid, user, new java.sql.Timestamp(lts), lv,
          new java.sql.Timestamp(rts), rv)
      }
    }
}
