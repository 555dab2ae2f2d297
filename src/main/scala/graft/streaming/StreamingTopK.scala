package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live top-n volume leaderboard — the streaming counterpart of
  * Analytics.topVolume: each symbol keeps its current n highest-volume
  * buckets; a micro-batch emits the symbol's refreshed leaderboard
  * whenever it CHANGES (update-style output over flatMapGroupsWithState,
  * so downstream sees complete replacement sets keyed by symbol).
  *
  * Scale design: state is a bounded n-element list per symbol (the same
  * O(k) contract as the batch TopKByScore aggregate — never the full
  * history), symbols are dim-scale, and ordering ties break on
  * (volume desc, bucket_ts asc) exactly like the batch operator, so at
  * stream end the final leaderboards equal the batch answer regardless
  * of batch boundaries (spec-pinned).
  */
object StreamingTopK {

  case class CandleVol(symbol: String, bucket_ts: java.sql.Timestamp, volume: Double)
  case class Board(rows: List[(Long, Double)]) // (bucket_ts micros, volume)
  case class Leader(symbol: String, bucket_ts: java.sql.Timestamp,
                    volume: Double, rn: Long)

  private def insert(board: List[(Long, Double)], ts: Long, vol: Double,
                     n: Int): List[(Long, Double)] =
    // (volume desc, bucket_ts asc) — the batch topVolume ordering
    ((ts, vol) :: board)
      .sortBy { case (t, v) => (-v, t) }
      .take(n)

  def run(candles: DataFrame, n: Int = 3): Dataset[Leader] = {
    val spark = candles.sparkSession
    import spark.implicits._
    candles
      .select(col("symbol"), col("bucket_ts"), col("volume"))
      .as[CandleVol]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (sym: String, rows: Iterator[CandleVol], state: GroupState[Board]) => {
          val before = state.getOption.getOrElse(Board(Nil))
          var board = before.rows
          // full micros (fromJavaTimestamp keeps the Timestamp's nanos
          // field, where getTime*1000 truncated to milliseconds) —
          // sub-millisecond buckets now round-trip exactly
          def micros(t: java.sql.Timestamp): Long =
            org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)
          // deterministic intra-batch order (replay-stable)
          rows.toSeq.sortBy(c => (micros(c.bucket_ts), c.volume)).foreach { c =>
            board = insert(board, micros(c.bucket_ts), c.volume, n)
          }
          state.update(Board(board))
          if (board == before.rows) Iterator.empty
          else board.iterator.zipWithIndex.map { case ((t, v), i) =>
            Leader(sym,
              org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp(t),
              v, i + 1L)
          }
        })
  }
}
