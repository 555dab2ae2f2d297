package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}

/** Stream-stream forward interval join — live attribution: for each left
  * event, every right event with the same key and right.ts in
  * (left.ts, left.ts + window]. The forward complement of StreamingAsof.
  *
  * Completeness: a left finalizes once the watermark passes
  * left.ts + window (see KeyedEventJoin). State per key is bounded to the
  * live window: pending lefts satisfy left.ts > watermark - window, only
  * rights newer than watermark - window can match one, and a key with
  * nothing live drops its state entirely.
  */
object StreamingInterval {

  def forward(left: DataFrame, right: DataFrame, windowMillis: Long,
              watermark: String = "10 minutes"): Dataset[KeyedEventJoin.Joined] =
    KeyedEventJoin.run(left, right, watermark,
      finalizeAt = _ + windowMillis,
      matches = (lts, rights) =>
        rights.filter(r => r._1 > lts && r._1 <= lts + windowMillis),
      rightHorizon = _ - windowMillis,
      keepLatestOldRight = false)
}
