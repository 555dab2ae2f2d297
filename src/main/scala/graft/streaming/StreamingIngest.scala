package graft.streaming

import graft.core.Timeframe
import graft.ohlcv.CandleStore
import org.apache.spark.sql.{DataFrame, Row, Dataset}
import org.apache.spark.sql.streaming.StreamingQuery

/** The reference fetcher's full loop, live: streaming trades → candles →
  * store (ccxt-ohlcv-fetch.py:110-130 + persist :55-83). Append-mode
  * windows emit each closed candle once (post-watermark); the incomplete
  * tail never reaches the store, and restart resumes from the checkpoint
  * (the streaming analog of `get_last_candle_timestamp` resume). The sink
  * itself is replay-safe: foreachBatch delivery is at-least-once, so each
  * micro-batch is written batch-addressed (CandleStore.appendBatch) and a
  * replayed batch overwrites its own output instead of duplicating it —
  * end-to-end effectively-once.
  */
object StreamingIngest {

  def run(trades: DataFrame, tf: Timeframe, store: CandleStore,
          exchange: String, watermark: String = "10 minutes",
          checkpoint: Option[String] = None): StreamingQuery = {
    val sink: (Dataset[Row], Long) => Unit =
      (batch, batchId) => store.appendBatch(batch, exchange, tf, batchId)
    val w = StreamingCandles.fromTrades(trades, tf, watermark)
      .writeStream.outputMode("append").foreachBatch(sink)
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** LSM-style exact ingest: each micro-batch is reduced to MERGEABLE
    * partial candles (Candles.fromTradesMergeable) and appended
    * batch-addressed; `CandleStore.readMerged` folds partials on read.
    * Unlike the watermark path above, arbitrarily LATE trades are
    * absorbed exactly — a late batch just adds another partial for its
    * bucket, and the fold reproduces the batch-recompute answer
    * bit-for-bit (the mergeable monoid, spec-asserted). No watermark, no
    * dropped data, replay-idempotent; compaction bounds fold depth.
    */
  def runMergeable(trades: DataFrame, tf: Timeframe, store: CandleStore,
                   exchange: String,
                   checkpoint: Option[String] = None): StreamingQuery = {
    val sink: (Dataset[Row], Long) => Unit = (batch, batchId) =>
      store.appendBatch(
        graft.ohlcv.Candles.fromTradesMergeable(batch, tf), exchange, tf, batchId)
    val w = trades.writeStream.outputMode("append").foreachBatch(sink)
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }
}
