package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live RiskMetrics EWMA volatility — the streaming face of
  * Analytics.ewmaVol. State per symbol is (prev close, σ², seeded):
  * O(1), no TTL; the recursion is the same fixed-order double fold as
  * batch, so on in-order input the stream emits bit-identically.
  * Within a micro-batch candles process in bucket_ts order.
  */
object StreamingEwmaVol {

  case class CandleClose(symbol: String, bucket_ts: java.sql.Timestamp, close: Double)
  case class VolState(prevClose: Double, hasPrev: Boolean, s2: Double, seeded: Boolean)
  case class Vol(symbol: String, bucket_ts: java.sql.Timestamp,
                 ret: Double, ewma_vol: Double)

  def run(candles: DataFrame, lambda: Double = 0.94): Dataset[Vol] = {
    val lam = lambda; val oneMl = 1 - lambda
    val spark = candles.sparkSession
    import spark.implicits._
    def rd(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    candles.select(col("symbol"), col("bucket_ts"), col("close"))
      .as[CandleClose]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (sym: String, rows: Iterator[CandleClose], state: GroupState[VolState]) => {
          var st = state.getOption.getOrElse(
            VolState(0.0, hasPrev = false, 0.0, seeded = false))
          val out = List.newBuilder[Vol]
          rows.toSeq.sortBy(_.bucket_ts.getTime).foreach { c =>
            if (st.hasPrev && st.prevClose != 0.0) {
              val r = (c.close - st.prevClose) / st.prevClose
              val s2 = if (!st.seeded) r * r else lam * st.s2 + oneMl * (r * r)
              st = st.copy(s2 = s2, seeded = true)
              out += Vol(sym, c.bucket_ts, rd(r), rd(math.sqrt(s2)))
            }
            st = st.copy(prevClose = c.close, hasPrev = true)
          }
          state.update(st)
          out.result().iterator
        })
  }
}
