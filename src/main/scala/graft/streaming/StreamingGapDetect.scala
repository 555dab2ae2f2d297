package graft.streaming

import graft.core.Timeframe
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live missing-candle detection — the streaming counterpart of
  * Candles.gaps, for monitoring an ingest loop as it runs (the
  * reference's fetch loop stalls exactly this way: an exchange outage
  * leaves a hole the operator should flag immediately, not at the next
  * batch audit).
  *
  * Output rows match the batch operator: (symbol, gap_start = last
  * present bucket, gap_end = next present bucket, missing = bucket count
  * in between). State is ONE long per symbol (the last seen bucket);
  * symbols are dim-scale, so state is bounded without a TTL. Candles
  * process in bucket order within a batch, so replays emit identically.
  * Out-of-order candles older than the last seen bucket are ignored
  * (the batch operator, re-run over the store, remains the authority).
  */
object StreamingGapDetect {

  case class CandleAt(symbol: String, bucket_ts: java.sql.Timestamp)
  case class Gap(symbol: String, gap_start: java.sql.Timestamp,
                 gap_end: java.sql.Timestamp, missing: Long)

  def run(candles: DataFrame, tf: Timeframe,
          watermark: String = "10 minutes"): Dataset[Gap] = {
    val spark = candles.sparkSession
    import spark.implicits._
    val widthMs = tf.micros / 1000L
    candles.withWatermark("bucket_ts", watermark)
      .select(col("symbol"), col("bucket_ts"))
      .as[CandleAt]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (sym: String, rows: Iterator[CandleAt], state: GroupState[Long]) => {
          var last = state.getOption.getOrElse(Long.MinValue)
          val out = List.newBuilder[Gap]
          rows.toSeq.map(_.bucket_ts.getTime).sorted.foreach { t =>
            if (last != Long.MinValue && t > last + widthMs)
              out += Gap(sym, new java.sql.Timestamp(last),
                new java.sql.Timestamp(t), (t - last) / widthMs - 1L)
            if (t > last) last = t
          }
          state.update(last)
          out.result().iterator
        })
  }
}
