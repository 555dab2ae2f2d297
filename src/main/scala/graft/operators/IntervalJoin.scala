package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Forward interval join: every (left, right) pair with the same key and
  * right.ts in (left.ts, left.ts + window] — the attribution primitive
  * ("purchases within an hour of a click"), complementing the backward
  * as-of join.
  *
  * Scale shape: this is an equi-join on the key with the interval as a
  * join residual — a plain shuffled hash join, NOT a nested-loop range
  * join; per-key fan-out is naturally bounded by activity within the
  * window. Skewed keys fall under AQE skew-join handling like any other
  * hash join.
  */
object IntervalJoin {

  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTs: String, rightTs: String, windowMicros: Long,
              prefix: String = "r_"): DataFrame = {
    val r = right.columns.foldLeft(right)((d, c) =>
      d.withColumnRenamed(c, prefix + c))
    left.join(r,
      left(key) === r(prefix + key) &&
        r(prefix + rightTs) > left(leftTs) &&
        unix_micros(r(prefix + rightTs)) <= unix_micros(left(leftTs)) + windowMicros)
  }
}
