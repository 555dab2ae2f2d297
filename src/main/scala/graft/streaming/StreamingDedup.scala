package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming dedup of re-delivered trades — the live analog of the
  * reference's "ignoring already fetched data" PK-conflict handling
  * (ccxt-ohlcv-fetch.py:71-75). State is bounded by the watermark: a
  * duplicate arriving within the watermark window is dropped; older
  * duplicates are already beyond the store's append frontier.
  */
object StreamingDedup {
  def dropDuplicateTrades(trades: DataFrame, watermark: String = "10 minutes"): DataFrame =
    trades
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("symbol", "ts")
}
