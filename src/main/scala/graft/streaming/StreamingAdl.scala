package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live ACCUMULATION/DISTRIBUTION line — the streaming face of
  * Analytics.adl. The batch operator is an exact-decimal running sum of
  * per-candle money-flow volume; the state carried here IS that exact
  * decimal (a BigDecimal at the same scale-8 the batch DECIMAL(28,8) sum
  * uses, with the same HALF_UP roundings for CLV and volume), so the
  * stream emits BIT-IDENTICALLY to the batch line on in-order input —
  * not a floating approximation that drifts after enough candles. O(1)
  * state per symbol, Append mode, no TTL.
  */
object StreamingAdl {

  case class Candle(symbol: String, bucket_ts: java.sql.Timestamp,
                    high: Double, low: Double, close: Double, volume: Double)
  case class AdlState(sum: java.math.BigDecimal)
  case class AdlRow(symbol: String, bucket_ts: java.sql.Timestamp, adl: Double)

  def run(candles: DataFrame): Dataset[AdlRow] = {
    val spark = candles.sparkSession
    import spark.implicits._
    candles.select(col("symbol"), col("bucket_ts"), col("high"), col("low"),
      col("close"), col("volume"))
      .as[Candle]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (sym: String, rows: Iterator[Candle], state: GroupState[AdlState]) => {
          var sum = state.getOption.map(s => BigDecimal(s.sum))
            .getOrElse(BigDecimal(0).setScale(8))
          val out = List.newBuilder[AdlRow]
          rows.toSeq.sortBy(c => (c.bucket_ts.getTime, c.close)).foreach { c =>
            val clv =
              if (c.high != c.low)
                BigDecimal(((c.close - c.low) - (c.high - c.close)) / (c.high - c.low))
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP)
              else BigDecimal(0).setScale(6)
            val vol = BigDecimal(c.volume).setScale(2, BigDecimal.RoundingMode.HALF_UP)
            sum = (sum + clv * vol).setScale(8)
            out += AdlRow(sym, c.bucket_ts, sum.toDouble)
          }
          state.update(AdlState(sum.underlying))
          out.result().iterator
        })
  }
}
