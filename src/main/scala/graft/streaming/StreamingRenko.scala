package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live RENKO brick construction — the streaming face of Analytics.renko.
  * The batch operator is a per-symbol sequential sweep with O(1) state
  * (the current grid anchor and the brick counter), which is exactly a
  * GroupState: the stream emits BIT-IDENTICALLY to the batch sweep on
  * in-order input, because the state carried across micro-batches is the
  * sweep's entire memory — no approximation, no TTL (symbols are
  * dim-scale). Grid semantics match batch verbatim: anchor seeds at the
  * first close, each full ±brickSize step emits one brick and advances
  * the anchor (gap candles emit several), reversals need a full opposite
  * step; levels are exact multiples of brickSize off the seed, rounded
  * at emission. Append mode: bricks are immutable once emitted.
  */
object StreamingRenko {

  case class CandleClose(symbol: String, bucket_ts: java.sql.Timestamp, close: Double)
  case class RenkoState(anchor: Double, hasAnchor: Boolean, brickIdx: Long)
  case class Brick(symbol: String, bucket_ts: java.sql.Timestamp, brick_idx: Long,
                   direction: Int, open_level: Double, close_level: Double)

  def run(candles: DataFrame, brickSize: Double): Dataset[Brick] = {
    require(brickSize > 0, "brickSize must be positive")
    val spark = candles.sparkSession
    import spark.implicits._
    val rd = (v: Double) => BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    candles.select(col("symbol"), col("bucket_ts"), col("close"))
      .as[CandleClose]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (sym: String, rows: Iterator[CandleClose], state: GroupState[RenkoState]) => {
          var st = state.getOption.getOrElse(RenkoState(0.0, hasAnchor = false, 0L))
          val out = List.newBuilder[Brick]
          rows.toSeq.sortBy(c => (c.bucket_ts.getTime, c.close)).foreach { c =>
            if (!st.hasAnchor) st = RenkoState(c.close, hasAnchor = true, 0L)
            else {
              var anchor = st.anchor
              var idx = st.brickIdx
              while (c.close >= anchor + brickSize) {
                idx += 1
                out += Brick(sym, c.bucket_ts, idx, 1, rd(anchor), rd(anchor + brickSize))
                anchor += brickSize
              }
              while (c.close <= anchor - brickSize) {
                idx += 1
                out += Brick(sym, c.bucket_ts, idx, -1, rd(anchor), rd(anchor - brickSize))
                anchor -= brickSize
              }
              st = RenkoState(anchor, hasAnchor = true, idx)
            }
          }
          state.update(st)
          out.result().iterator
        })
  }
}
