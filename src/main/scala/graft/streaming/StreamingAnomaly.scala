package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live volume-anomaly detection — the streaming counterpart of
  * Analytics.volumeAnomaly: each arriving candle is scored against the
  * running moments of its symbol's PRIOR candles and emitted when its
  * z-score clears the threshold.
  *
  * Scale design: state is three integers per symbol (count + exact
  * integer-cent sums — volumes are 2-decimal, so sums are EXACT and the
  * result is independent of batch boundaries and shuffle order, matching
  * the engine's decimal-exact batch rule). Symbols are dim-scale, so
  * total state is bounded without a TTL. Within a micro-batch, candles
  * process in (bucket_ts, volume) order, so replays of the same batch
  * emit identically.
  */
object StreamingAnomaly {

  case class CandleVol(symbol: String, bucket_ts: java.sql.Timestamp, volume: Double)
  case class Moments(n: Long, centSum: Long, centSqSum: Long)
  case class Anomaly(symbol: String, bucket_ts: java.sql.Timestamp,
                     volume: Double, zscore: Double, n_prior: Long)

  /** `candles`: streaming (symbol, bucket_ts, volume, ...) rows. A candle
    * scores only when >= `minPrior` prior candles exist and their variance
    * is positive.
    */
  def run(candles: DataFrame, z: Double = 2.0, minPrior: Int = 2,
          watermark: String = "10 minutes"): Dataset[Anomaly] = {
    val spark = candles.sparkSession
    import spark.implicits._
    candles.withWatermark("bucket_ts", watermark)
      .select(col("symbol"), col("bucket_ts"), col("volume"))
      .as[CandleVol]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (sym: String, rows: Iterator[CandleVol], state: GroupState[Moments]) => {
          var m = state.getOption.getOrElse(Moments(0L, 0L, 0L))
          val out = List.newBuilder[Anomaly]
          rows.toSeq.sortBy(c => (c.bucket_ts.getTime, c.volume)).foreach { c =>
            if (m.n >= minPrior) {
              val mu = m.centSum / 100.0 / m.n
              val variance = (m.centSqSum / 10000.0 - m.n * mu * mu) / (m.n - 1)
              if (variance > 0) {
                val score = BigDecimal((c.volume - mu) / math.sqrt(variance))
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                if (math.abs(score) >= z)
                  out += Anomaly(sym, c.bucket_ts, c.volume, score, m.n)
              }
            }
            val cents = math.round(c.volume * 100)
            m = Moments(m.n + 1, m.centSum + cents, m.centSqSum + cents * cents)
          }
          state.update(m)
          out.result().iterator
        })
  }
}
