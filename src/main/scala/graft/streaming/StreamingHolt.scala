package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live Holt level/trend forecasting — the streaming face of
  * Analytics.holt. The recursion's entire memory is (level, trend), so
  * the GroupState carries exactly that per symbol: O(1), no TTL, and the
  * stream emits bit-identically to the batch sweep on in-order input
  * (same fixed-order double recursion, same α/γ defaults with exact
  * complements, rounding at emission only). Within a micro-batch candles
  * process in bucket_ts order (the StreamingCusum convention).
  */
object StreamingHolt {

  case class CandleClose(symbol: String, bucket_ts: java.sql.Timestamp, close: Double)
  case class HoltState(level: Double, trend: Double, seeded: Boolean)
  case class Forecast(symbol: String, bucket_ts: java.sql.Timestamp, close: Double,
                      level: Double, trend: Double, forecast: Double)

  def run(candles: DataFrame, alpha: Double = 0.5,
          gamma: Double = 0.3): Dataset[Forecast] = {
    val a = alpha; val oneA = 1 - alpha
    val g = gamma; val oneG = 1 - gamma
    val spark = candles.sparkSession
    import spark.implicits._
    def rd(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    candles.select(col("symbol"), col("bucket_ts"), col("close"))
      .as[CandleClose]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (sym: String, rows: Iterator[CandleClose], state: GroupState[HoltState]) => {
          var st = state.getOption.getOrElse(HoltState(0.0, 0.0, seeded = false))
          val out = List.newBuilder[Forecast]
          rows.toSeq.sortBy(_.bucket_ts.getTime).foreach { c =>
            if (!st.seeded) st = HoltState(c.close, 0.0, seeded = true)
            else {
              val nl = a * c.close + oneA * (st.level + st.trend)
              val nb = g * (nl - st.level) + oneG * st.trend
              st = HoltState(nl, nb, seeded = true)
            }
            out += Forecast(sym, c.bucket_ts, c.close,
              rd(st.level), rd(st.trend), rd(st.level + st.trend))
          }
          state.update(st)
          out.result().iterator
        })
  }
}
