package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live VOLUME BARS — the streaming face of Microstructure.volumeBars.
  * The batch rule is prefix-stable by construction (a trade's bar id
  * depends only on the volume traded BEFORE it), so the stream can emit
  * every bar the moment the volume clock ticks past its boundary and the
  * emitted rows are BIT-IDENTICAL to the batch operator's completed bars
  * on in-order input: the state carried per symbol is the exact BIGINT
  * cumulative volume plus the open bar's OHLCV accumulator — O(1) per
  * symbol, no trade buffering. The still-filling bar stays in state and
  * is never emitted (mirroring vpin's drop-the-partial-bucket
  * convention); Append mode, no TTL.
  */
object StreamingVolumeBars {

  case class Trade(symbol: String, ts: java.sql.Timestamp, price: Double, qty: Double)
  // vol is the bar's exact volume in CENTS (scale-2 long) — the same
  // value the batch face's sum(qty.cast(DECIMAL(18,2))) carries, so the
  // emitted double is bit-identical even for fractional qty
  case class BarState(cum: Long, barId: Long,
                      startTs: java.sql.Timestamp, endTs: java.sql.Timestamp,
                      open: Double, high: Double, low: Double, close: Double,
                      vol: Long, n: Long)
  case class Bar(symbol: String, bar_id: Long,
                 start_ts: java.sql.Timestamp, end_ts: java.sql.Timestamp,
                 open: Double, high: Double, low: Double, close: Double,
                 volume: Double, n_trades: Long)

  def run(trades: DataFrame, threshold: Long = 500L): Dataset[Bar] = {
    require(threshold > 0, "threshold > 0")
    val spark = trades.sparkSession
    import spark.implicits._
    trades.select(col("symbol"), col("ts"), col("price"), col("qty"))
      .as[Trade]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (sym: String, rows: Iterator[Trade], state: GroupState[BarState]) => {
          var st = state.getOption.orNull
          val out = List.newBuilder[Bar]
          rows.toSeq.sortBy(_.ts.getTime).foreach { t =>
            // bar clock: truncation, mirroring the batch qty.cast("long");
            // volume: exact scale-2 cents, mirroring qty.cast(DECIMAL(18,2))
            val q = t.qty.toLong
            val qc = java.math.BigDecimal.valueOf(t.qty)
              .setScale(2, java.math.RoundingMode.HALF_UP)
              .movePointRight(2).longValueExact()
            val pre = if (st == null) 0L else st.cum
            val bar = pre / threshold
            if (st != null && bar != st.barId) {
              out += Bar(sym, st.barId, st.startTs, st.endTs,
                st.open, st.high, st.low, st.close, st.vol / 100.0, st.n)
              st = null
            }
            st =
              if (st == null)
                BarState(pre + q, bar, t.ts, t.ts, t.price, t.price, t.price,
                  t.price, qc, 1L)
              else
                BarState(pre + q, bar, st.startTs, t.ts, st.open,
                  math.max(st.high, t.price), math.min(st.low, t.price),
                  t.price, st.vol + qc, st.n + 1)
          }
          if (st != null) state.update(st)
          out.result().iterator
        })
  }
}
