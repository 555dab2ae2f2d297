package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live tick-rule trade classification — the streaming face of
  * Microstructure.tickRuleImbalance's per-trade stage. The batch operator
  * carries the last non-zero tick with an ignore-nulls running window;
  * the stream carries exactly that state (previous price + last side)
  * across micro-batches in a GroupState — O(1) per symbol, symbols are
  * dim-scale, no TTL needed.
  *
  * Emits the per-trade classification (side = +1 buy / −1 sell / null
  * not-yet-classifiable); the bucketed imbalance is a downstream
  * stateless aggregation of this stream (compose with a windowed agg or
  * the candle path), so the stateful stage stays minimal. Within a
  * micro-batch trades process in ts order (the StreamingCusum
  * convention); replays emit identically.
  */
object StreamingTickRule {

  case class Trade(symbol: String, ts: java.sql.Timestamp, price: Double, qty: Double)
  case class TickState(prevPrice: Double, hasPrev: Boolean, lastSide: Int)
  case class Classified(symbol: String, ts: java.sql.Timestamp,
                        price: Double, qty: Double, side: Option[Int])

  def run(trades: DataFrame): Dataset[Classified] = {
    val spark = trades.sparkSession
    import spark.implicits._
    trades.select(col("symbol"), col("ts"), col("price"), col("qty"))
      .as[Trade]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (sym: String, rows: Iterator[Trade], state: GroupState[TickState]) => {
          var st = state.getOption.getOrElse(TickState(0.0, hasPrev = false, 0))
          val out = List.newBuilder[Classified]
          rows.toSeq.sortBy(_.ts.getTime).foreach { t =>
            val side =
              if (!st.hasPrev) st.lastSide // 0 until a first tick exists
              else if (t.price > st.prevPrice) 1
              else if (t.price < st.prevPrice) -1
              else st.lastSide
            out += Classified(sym, t.ts, t.price, t.qty,
              if (side == 0) None else Some(side))
            st = TickState(t.price, hasPrev = true, side)
          }
          state.update(st)
          out.result().iterator
        })
  }
}
