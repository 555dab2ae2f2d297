package graft.ohlcv

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed candle row — the engine's version of the reference's ORM model
  * (ccxt-ohlcv-fetch.py:35-51; timestamp PK + OHLCV as TEXT there, typed
  * here).
  */
final case class Candle(
    symbol: String,
    bucket_ts: java.sql.Timestamp,
    open: Double,
    high: Double,
    low: Double,
    close: Double,
    volume: Double,
    trades: Long)

object Candle {
  /** Typed view of a candle DataFrame (compile-time field access). */
  def typed(candles: DataFrame): Dataset[Candle] = {
    val spark = candles.sparkSession
    import spark.implicits._
    candles.as[Candle]
  }
}
