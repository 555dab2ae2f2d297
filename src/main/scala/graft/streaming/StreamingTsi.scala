package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live TRUE STRENGTH INDEX — the streaming face of Analytics.tsi. The
  * batch operator is a pure left-to-right fold (four chained EMA scalars
  * over 2-decimal momentum terms), which is exactly the shape GroupState
  * carries across micro-batches for free: state = previous close + the
  * four fold scalars, O(1) per symbol, no TTL (symbols are dim-scale).
  * On in-order input the stream is BIT-IDENTICAL to the batch sweep —
  * same momentum rounding, same α spelling (2.0/(n+1), complement
  * 1.0 − α), same unrounded fold, same 6-rounded emission, same
  * flat-prefix null (zero |momentum| EMA) — pinned by the spec across a
  * mid-series micro-batch split.
  */
object StreamingTsi {

  case class CandleClose(symbol: String, bucket_ts: java.sql.Timestamp, close: Double)
  case class TsiState(prevClose: Double, hasPrev: Boolean, seeded: Boolean,
                      emi: Double, emo: Double, eai: Double, eao: Double)
  case class Tsi(symbol: String, bucket_ts: java.sql.Timestamp,
                 tsi: Option[Double])

  def run(candles: DataFrame, n1: Int = 25, n2: Int = 13): Dataset[Tsi] = {
    val a1 = 2.0 / (n1 + 1); val b1 = 1.0 - a1
    val a2 = 2.0 / (n2 + 1); val b2 = 1.0 - a2
    val rd2 = (v: Double) => BigDecimal(v)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rd6 = (v: Double) => BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val spark = candles.sparkSession
    import spark.implicits._
    candles.select(col("symbol"), col("bucket_ts"), col("close"))
      .as[CandleClose]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (sym: String, rows: Iterator[CandleClose], state: GroupState[TsiState]) => {
          var st = state.getOption.getOrElse(
            TsiState(0.0, hasPrev = false, seeded = false, 0.0, 0.0, 0.0, 0.0))
          val out = List.newBuilder[Tsi]
          rows.toSeq.sortBy(c => (c.bucket_ts.getTime, c.close)).foreach { c =>
            if (!st.hasPrev) {
              st = st.copy(prevClose = c.close, hasPrev = true)
            } else {
              val m = rd2(c.close - st.prevClose)
              st =
                if (!st.seeded)
                  st.copy(prevClose = c.close, seeded = true,
                    emi = m, emo = m, eai = math.abs(m), eao = math.abs(m))
                else {
                  val emi = a1 * m + b1 * st.emi
                  val eai = a1 * math.abs(m) + b1 * st.eai
                  st.copy(prevClose = c.close,
                    emi = emi, emo = a2 * emi + b2 * st.emo,
                    eai = eai, eao = a2 * eai + b2 * st.eao)
                }
              out += Tsi(sym, c.bucket_ts,
                if (st.eao != 0.0) Some(rd6(100.0 * (st.emo / st.eao))) else None)
            }
          }
          state.update(st)
          out.result().iterator
        })
  }
}
