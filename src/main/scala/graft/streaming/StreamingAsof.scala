package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}

/** Stream-stream backward as-of join — an operator Structured Streaming
  * lacks natively (it offers equality and interval joins, not "latest
  * right at-or-before"). For each left event, emits the latest right
  * event with the same key and right.ts <= left.ts.
  *
  * Correctness under out-of-order arrival: a left row is finalized only
  * once the watermark passes its event time; any right that could still
  * affect it would be dropped as late (see KeyedEventJoin). State per key
  * is bounded: pending lefts, post-watermark rights, and ONE
  * representative right at-or-before the watermark — the only old row a
  * future left can ever match; a key with a right therefore retains one
  * state row indefinitely (inherent to as-of semantics — bound it with an
  * application-level retention policy if keys are unbounded). Right rows
  * tied on (key, ts) resolve to the greatest value, mirroring the batch
  * operator's struct-greatest tiebreak.
  */
object StreamingAsof {

  def join(left: DataFrame, right: DataFrame,
           watermark: String = "10 minutes"): Dataset[KeyedEventJoin.Joined] =
    KeyedEventJoin.run(left, right, watermark,
      finalizeAt = identity,
      matches = (lts, rights) => rights.takeWhile(_._1 <= lts).lastOption.toList,
      rightHorizon = identity,
      keepLatestOldRight = true)

  /** Left-outer variant, mirroring the batch operator's `leftOuter`:
    * every left is emitted exactly once at finalization — with its
    * at-or-before match, or with null right columns when no such right
    * exists. Completeness is the same watermark argument as the inner
    * form (a right that could still match a finalized left would be
    * late), so "null right" is a PROVEN no-match, not a timing artifact.
    */
  def joinLeftOuter(left: DataFrame, right: DataFrame,
                    watermark: String = "10 minutes"): Dataset[KeyedEventJoin.JoinedOpt] =
    KeyedEventJoin.runCore[KeyedEventJoin.JoinedOpt](left, right, watermark,
      finalizeAt = identity,
      matches = (lts, rights) => rights.takeWhile(_._1 <= lts).lastOption.toList,
      rightHorizon = identity,
      keepLatestOldRight = true) { case (user, (lts, eid, lv), ms) =>
      if (ms.isEmpty)
        List(KeyedEventJoin.JoinedOpt(eid, user, new java.sql.Timestamp(lts),
          lv, None, None))
      else ms.map { case (rts, rv) =>
        KeyedEventJoin.JoinedOpt(eid, user, new java.sql.Timestamp(lts), lv,
          Some(new java.sql.Timestamp(rts)), Some(rv))
      }
    }
}
