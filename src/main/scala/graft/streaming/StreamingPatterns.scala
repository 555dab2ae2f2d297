package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live candlestick-pattern flags — the streaming counterpart of
  * Analytics.candlePatterns: each arriving candle is flagged against its
  * symbol's previous candle the moment it lands (alerting use; the batch
  * operator over the store remains the audit authority).
  *
  * State is the previous candle's (open, close) per symbol — two doubles,
  * dim-scale total. Candles process in bucket order within a batch, so
  * replays emit identically; flags use the exact same double comparisons
  * as batch (including the 3VL null engulfing flags on first candles,
  * here surfaced as Option-typed booleans encoded nullable).
  */
object StreamingPatterns {

  case class CandleRow(symbol: String, bucket_ts: java.sql.Timestamp,
                       open: Double, high: Double, low: Double, close: Double)
  case class Flagged(symbol: String, bucket_ts: java.sql.Timestamp,
                     open: Double, high: Double, low: Double, close: Double,
                     doji: Boolean, bull_engulf: Option[Boolean],
                     bear_engulf: Option[Boolean])

  def run(candles: DataFrame, watermark: String = "10 minutes"): Dataset[Flagged] = {
    val spark = candles.sparkSession
    import spark.implicits._
    candles.withWatermark("bucket_ts", watermark)
      .select(col("symbol"), col("bucket_ts"), col("open"), col("high"),
        col("low"), col("close"))
      .as[CandleRow]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (sym: String, rows: Iterator[CandleRow], state: GroupState[(Double, Double)]) => {
          var prev = state.getOption
          val out = List.newBuilder[Flagged]
          rows.toSeq.sortBy(_.bucket_ts.getTime).foreach { c =>
            val doji = c.high - c.low > 0 &&
              math.abs(c.close - c.open) <= 0.1 * (c.high - c.low)
            // 3VL like the batch operator: a conjunct that is already
            // false without the previous candle forces false, not null
            def engulf(cur: Boolean, prevTest: ((Double, Double)) => Boolean,
                       lo: ((Double, Double)) => Boolean): Option[Boolean] =
              if (!cur) Some(false)
              else prev match {
                case None => None
                case Some(p) => Some(prevTest(p) && lo(p))
              }
            val bull = engulf(c.close > c.open,
              p => p._2 < p._1, p => c.open <= p._2 && c.close >= p._1)
            val bear = engulf(c.close < c.open,
              p => p._2 > p._1, p => c.open >= p._2 && c.close <= p._1)
            out += Flagged(sym, c.bucket_ts, c.open, c.high, c.low, c.close,
              doji, bull, bear)
            prev = Some((c.open, c.close))
          }
          prev.foreach(state.update)
          out.result().iterator
        })
  }
}
