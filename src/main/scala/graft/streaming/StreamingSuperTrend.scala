package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live SUPERTREND — the streaming face of Studies.superTrend. The batch
  * operator is a per-symbol sequential sweep whose entire memory is six
  * scalars (prev close, RMA ATR, both final bands, trend direction, seed
  * flag) — exactly a GroupState, so the stream emits BIT-IDENTICALLY to
  * the batch sweep on in-order input across micro-batch boundaries. Same
  * conventions verbatim: Wilder ATR seeded at the first true range, seed
  * trend DOWN, band ratchets with prev-close escapes, flips against the
  * post-ratchet bands. Append mode; O(1) state per symbol, no TTL.
  */
object StreamingSuperTrend {

  case class Candle(symbol: String, bucket_ts: java.sql.Timestamp,
                    high: Double, low: Double, close: Double)
  case class StState(prevClose: Double, atr: Double, fu: Double, fl: Double,
                     up: Boolean, seeded: Boolean)
  case class StRow(symbol: String, bucket_ts: java.sql.Timestamp,
                   atr: Double, supertrend: Double, trend_up: Boolean)

  def run(candles: DataFrame, n: Int = 3, mult: Double = 1.0): Dataset[StRow] = {
    require(n >= 1 && mult > 0, "n >= 1 and mult > 0")
    val spark = candles.sparkSession
    import spark.implicits._
    val rd = (v: Double) => BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    candles.select(col("symbol"), col("bucket_ts"), col("high"), col("low"), col("close"))
      .as[Candle]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (sym: String, rows: Iterator[Candle], state: GroupState[StState]) => {
          var st = state.getOption.getOrElse(
            StState(0.0, 0.0, 0.0, 0.0, up = false, seeded = false))
          val out = List.newBuilder[StRow]
          rows.toSeq.sortBy(c => (c.bucket_ts.getTime, c.close)).foreach { c =>
            val first = !st.seeded
            val tr =
              if (first) c.high - c.low
              else math.max(c.high - c.low,
                math.max(math.abs(c.high - st.prevClose), math.abs(c.low - st.prevClose)))
            val atr = if (first) tr else (st.atr * (n - 1) + tr) / n
            val mid = (c.high + c.low) / 2
            val bu = mid + mult * atr
            val bl = mid - mult * atr
            var fu = st.fu; var fl = st.fl; var up = st.up
            if (first) { fu = bu; fl = bl; up = false }
            else {
              fu = if (bu < fu || st.prevClose > fu) bu else fu
              fl = if (bl > fl || st.prevClose < fl) bl else fl
              if (!up && c.close > fu) up = true
              else if (up && c.close < fl) up = false
            }
            st = StState(c.close, atr, fu, fl, up, seeded = true)
            out += StRow(sym, c.bucket_ts, rd(atr), rd(if (up) fl else fu), up)
          }
          state.update(st)
          out.result().iterator
        })
  }
}
