package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live CUSUM drift detection — the streaming counterpart of
  * Analytics.cusum. The batch operator standardizes against the corpus's
  * FULL per-symbol moments (an offline quantity); the live variant scores
  * each return against the RUNNING moments of its symbol's PRIOR returns
  * (the streaming_anomaly convention) and carries the two one-sided CUSUM
  * sums across micro-batches.
  *
  * State per symbol: previous close + three running-moment scalars + the
  * two CUSUM sums — O(1), symbols are dim-scale, no TTL needed. Within a
  * micro-batch candles process in bucket_ts order, so replays emit
  * identically.
  */
object StreamingCusum {

  case class CandleClose(symbol: String, bucket_ts: java.sql.Timestamp, close: Double)
  case class CusumState(prevClose: Double, hasPrev: Boolean,
                        n: Long, sumR: Double, sumR2: Double,
                        sp: Double, sn: Double)
  case class Drift(symbol: String, bucket_ts: java.sql.Timestamp,
                   zscore: Double, cusum_pos: Double, cusum_neg: Double,
                   breach: Boolean, n_prior: Long)

  def run(candles: DataFrame, slack: Double = 0.5, h: Double = 4.0,
          minPrior: Int = 2): Dataset[Drift] = {
    val spark = candles.sparkSession
    import spark.implicits._
    candles.select(col("symbol"), col("bucket_ts"), col("close"))
      .as[CandleClose]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (sym: String, rows: Iterator[CandleClose], state: GroupState[CusumState]) => {
          var st = state.getOption.getOrElse(
            CusumState(0.0, hasPrev = false, 0L, 0.0, 0.0, 0.0, 0.0))
          val out = List.newBuilder[Drift]
          rows.toSeq.sortBy(c => (c.bucket_ts.getTime, c.close)).foreach { c =>
            if (st.hasPrev && st.prevClose != 0.0) {
              val r = (c.close - st.prevClose) / st.prevClose
              if (st.n >= minPrior) {
                val mu = st.sumR / st.n
                val variance = (st.sumR2 - st.n * mu * mu) / (st.n - 1)
                if (variance > 0) {
                  val z = (r - mu) / math.sqrt(variance)
                  val sp = math.max(0.0, st.sp + z - slack)
                  val sn = math.min(0.0, st.sn + z + slack)
                  val rd = (v: Double) => BigDecimal(v)
                    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                  out += Drift(sym, c.bucket_ts, rd(z), rd(sp), rd(sn),
                    sp > h || sn < -h, st.n)
                  st = st.copy(sp = sp, sn = sn)
                }
              }
              st = st.copy(n = st.n + 1, sumR = st.sumR + r,
                sumR2 = st.sumR2 + r * r)
            }
            st = st.copy(prevClose = c.close, hasPrev = true)
          }
          state.update(st)
          out.result().iterator
        })
  }
}
