package graft.streaming

import graft.core.Timeframe
import graft.ohlcv.Candles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming candles — the live tail of the reference's fetch
  * loop (ccxt-ohlcv-fetch.py:110-130). A watermarked tumbling-window
  * aggregation in append mode emits a candle only once its window cannot
  * receive more trades: the reference's "drop the incomplete last candle"
  * (:122-129) falls out of watermark semantics instead of wall-clock
  * arithmetic.
  */
object StreamingCandles {

  /** trades (streaming DF with symbol/ts/price/qty) → OHLCV candles.
    * Same aggregation shape as the batch path (Candles.fromTrades):
    * partial aggregation runs per micro-batch map-side; state is one
    * candle per open (symbol, window).
    */
  def fromTrades(trades: DataFrame, tf: Timeframe,
                 watermark: String = "10 minutes"): DataFrame = {
    require(!tf.isCalendar, "streaming candles need a fixed-width timeframe")
    trades
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), s"${tf.micros / 1000000} seconds"), col("symbol"))
      .agg(
        min_by(col("price"), col("ts")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("ts")).as("close"),
        sum(col("qty").cast(DecimalType(18, 2))).cast("double").as("volume"),
        count(lit(1)).as("trades"))
      .select(col("window.start").as("bucket_ts"), col("symbol"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("trades"))
  }
}
