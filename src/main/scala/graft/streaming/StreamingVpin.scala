package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live VPIN volume buckets — the streaming face of Microstructure.vpin's
  * bucket stage: tick-rule signing (StreamingTickRule's state) and the
  * volume clock (StreamingVolumeBars' prefix-stable bucketing) fused into
  * ONE GroupState per symbol, emitting each bucket's classified volumes
  * the moment the clock passes its boundary. Emitted rows match the batch
  * operator's per-bucket (buy, sell, vol) frame BIT-IDENTICALLY on
  * in-order input: the bar clock truncates qty (the batch cast-to-long),
  * while the classified sums carry exact scale-2 CENTS — the same values
  * the batch DECIMAL(18,2) sums hold, so the doubles match even for
  * fractional qty; the still-filling bucket stays in
  * state — exactly the partial bucket batch vpin drops. The downstream
  * |B−S|/V average is a stateless aggregation the caller owns (the
  * StreamingTickRule minimal-stateful-stage convention). O(1) state,
  * Append mode, no TTL.
  */
object StreamingVpin {

  case class Trade(symbol: String, ts: java.sql.Timestamp, price: Double, qty: Double)
  case class VpinState(prevPrice: Double, havePrev: Boolean, side: Int,
                       cum: Long, barId: Long, haveBar: Boolean,
                       buy: Long, sell: Long, vol: Long)
  case class Bucket(symbol: String, bar_id: Long,
                    buy: Double, sell: Double, vol: Double)

  def run(trades: DataFrame, threshold: Long = 500L): Dataset[Bucket] = {
    require(threshold > 0, "threshold > 0")
    val spark = trades.sparkSession
    import spark.implicits._
    trades.select(col("symbol"), col("ts"), col("price"), col("qty"))
      .as[Trade]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (sym: String, rows: Iterator[Trade], state: GroupState[VpinState]) => {
          var st = state.getOption.getOrElse(
            VpinState(0.0, havePrev = false, 0, 0L, 0L, haveBar = false, 0L, 0L, 0L))
          val out = List.newBuilder[Bucket]
          rows.toSeq.sortBy(_.ts.getTime).foreach { t =>
            // bar clock: truncation, mirroring the batch qty.cast("long");
            // classified sums: exact cents, mirroring qty.cast(DECIMAL(18,2))
            val q = t.qty.toLong
            val qc = java.math.BigDecimal.valueOf(t.qty)
              .setScale(2, java.math.RoundingMode.HALF_UP)
              .movePointRight(2).longValueExact()
            // the tick rule: current trade's own tick updates the side
            // BEFORE classification (batch `last(tick) OVER run` includes
            // the current row)
            val side =
              if (st.havePrev && t.price > st.prevPrice) 1
              else if (st.havePrev && t.price < st.prevPrice) -1
              else st.side
            val bar = st.cum / threshold
            if (st.haveBar && bar != st.barId) {
              out += Bucket(sym, st.barId, st.buy / 100.0, st.sell / 100.0,
                st.vol / 100.0)
              st = st.copy(buy = 0L, sell = 0L, vol = 0L)
            }
            st = st.copy(
              prevPrice = t.price, havePrev = true, side = side,
              cum = st.cum + q, barId = bar, haveBar = true,
              buy = st.buy + (if (side == 1) qc else 0L),
              sell = st.sell + (if (side == -1) qc else 0L),
              vol = st.vol + qc)
          }
          state.update(st)
          out.result().iterator
        })
  }
}
