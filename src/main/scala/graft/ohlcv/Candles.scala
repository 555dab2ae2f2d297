package graft.ohlcv

import graft.core.Timeframe
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core OHLCV operators — the engine-side generalization of the reference
  * fetcher (ccxt-ohlcv-fetch.py). The reference receives exchange-computed
  * candles; a standalone engine computes them: resample a trade stream into
  * candles at any timeframe, then apply the reference's persistence
  * semantics (PK dedup/upsert :71-75, resume :86-91, incomplete-tail drop
  * :141-166, gap awareness).
  *
  * Scale notes: `fromTrades` is a single hash aggregation on
  * (symbol, bucket) — partial aggregation runs map-side, so the shuffle
  * carries one row per candle, not per trade. No window functions in the
  * hot path. At 100 TB this is the minimal-shuffle shape.
  */
object Candles {

  /** Exact money/qty summation: decimal(18,2) partial sums (associative,
    * order-insensitive) surfaced as double.
    */
  private[graft] def exactSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Resample trades (symbol, ts, price, qty) → OHLCV candles. */
  def fromTrades(trades: DataFrame, tf: Timeframe): DataFrame =
    trades
      .groupBy(col("symbol"), tf.bucketStart(col("ts")).as("bucket_ts"))
      .agg(
        min_by(col("price"), col("ts")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("ts")).as("close"),
        exactSum(col("qty")).as("volume"),
        count(lit(1)).as("trades"))

  /** Mergeable candles: like `fromTrades` but carrying first/last trade
    * timestamps, which makes candles a commutative monoid under `merge` —
    * the storage-layer analog of partial aggregation. An incremental
    * pipeline stores these and folds in late or out-of-order trade
    * batches exactly, without re-reading the trade log.
    */
  def fromTradesMergeable(trades: DataFrame, tf: Timeframe): DataFrame =
    trades
      .groupBy(col("symbol"), tf.bucketStart(col("ts")).as("bucket_ts"))
      .agg(
        min_by(col("price"), col("ts")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("ts")).as("close"),
        exactSum(col("qty")).as("volume"),
        count(lit(1)).as("trades"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))

  /** Fold ANY number of mergeable partials per group into one — the
    * monoid's n-ary reduction (merge-on-read for an LSM-style candle
    * store: each ingest appends partials, readers fold). `groupCols`
    * lets store readers keep their partition columns in the key.
    */
  def mergePartials(partials: DataFrame,
                    groupCols: Seq[String] = Seq("symbol", "bucket_ts")): DataFrame =
    partials
      .groupBy(groupCols.map(col): _*)
      .agg(
        // value is part of the pick key: if inputs violate the disjoint
        // unique-ts precondition (e.g. contradictory same-ts candles),
        // the pick is still deterministic instead of order-dependent
        min_by(col("open"), struct(col("first_ts"), col("open"))).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), struct(col("last_ts"), col("close"))).as("close"),
        exactSum(col("volume")).as("volume"),
        sum(col("trades")).as("trades"),
        min(col("first_ts")).as("first_ts"),
        max(col("last_ts")).as("last_ts"))

  /** Exact merge of two mergeable-candle sets (same timeframe): per
    * (symbol, bucket), open follows the earliest first_ts, close the
    * latest last_ts, extremes/volumes combine. Equal to recomputing from
    * the union of the underlying trades (spec-asserted).
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    mergePartials(a.unionByName(b))

  /** Skew-resistant resample: two-phase salted aggregation for hot keys.
    * A viral symbol that would funnel its entire bucket through one reducer
    * is first aggregated into `salts` partial candles (random salt from the
    * unique trade ts), then merged. Partial candles carry first/last trade
    * ts so open/close picks stay exact. Output is identical to
    * `fromTrades` (spec-asserted).
    */
  def fromTradesSalted(trades: DataFrame, tf: Timeframe, salts: Int = 16): DataFrame =
    trades
      .groupBy(col("symbol"), tf.bucketStart(col("ts")).as("bucket_ts"),
        pmod(hash(col("ts")), lit(salts)).as("_salt"))
      .agg(
        min_by(col("price"), col("ts")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("ts")).as("close"),
        min(col("ts")).as("_first_ts"),
        max(col("ts")).as("_last_ts"),
        sum(col("qty").cast(DecimalType(18, 2))).as("_vol_dec"),
        count(lit(1)).as("trades"))
      .groupBy(col("symbol"), col("bucket_ts"))
      .agg(
        min_by(col("open"), col("_first_ts")).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col("_last_ts")).as("close"),
        sum(col("_vol_dec")).cast("double").as("volume"),
        sum(col("trades")).as("trades"))
      .select(col("symbol"), col("bucket_ts"), col("open"), col("high"),
        col("low"), col("close"), col("volume"), col("trades"))

  /** Cascade resample: coarse candles from fine candles (1m → 1h → 1d)
    * without touching raw trades. At 100 TB this is the difference between
    * re-scanning the trade log and aggregating an already-thousandfold-
    * smaller candle table; correctness holds because OHLCV is
    * hierarchically composable (open = open of earliest sub-bucket, etc.).
    */
  def resample(candles: DataFrame, to: Timeframe): DataFrame =
    candles
      .groupBy(col("symbol"), to.bucketStart(col("bucket_ts")).as("bucket_ts"))
      .agg(
        min_by(col("open"), col("bucket_ts")).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col("bucket_ts")).as("close"),
        exactSum(col("volume")).as("volume"),
        sum(col("trades")).as("trades"))

  /** Last persisted bucket per symbol — the resume point the reference
    * reads back via `get_last_candle_timestamp` (ccxt-ohlcv-fetch.py:86-91).
    */
  def resumeSince(candles: DataFrame): DataFrame =
    candles.groupBy(col("symbol")).agg(max(col("bucket_ts")).as("last_ts"))

  /** Drop the trailing incomplete candle: a bucket is complete iff its end
    * is at or before `now` (ccxt-ohlcv-fetch.py:122-129, 141-166).
    */
  def dropIncomplete(candles: DataFrame, tf: Timeframe, now: Column): DataFrame =
    // complete ⇔ bucket_ts + width <= now
    candles.where(timestamp_micros(unix_micros(col("bucket_ts")) + lit(tf.micros)) <= now)

  /** Idempotent upsert: later batch wins per (symbol, bucket_ts) — the
    * distributed form of the reference's PK-conflict handling
    * (ccxt-ohlcv-fetch.py:71-75). Anti-join keeps only non-overlapping old
    * rows; at scale both sides shuffle once on the key (or the incoming
    * delta broadcasts when small).
    */
  def upsert(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val keys = Seq("symbol", "bucket_ts")
    existing.join(incoming.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(incoming)
  }

  /** Missing-candle intervals per symbol: consecutive buckets further apart
    * than one width. Output: (symbol, gap_start = last present bucket,
    * gap_end = next present bucket, missing = bucket count in between).
    */
  def gaps(candles: DataFrame, tf: Timeframe): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("bucket_ts"))
    val width = tf.micros
    candles
      .select(col("symbol"), col("bucket_ts"))
      .withColumn("next_ts", lead(col("bucket_ts"), 1).over(w))
      .where(col("next_ts").isNotNull &&
        unix_micros(col("next_ts")) - unix_micros(col("bucket_ts")) > width)
      .select(
        col("symbol"),
        col("bucket_ts").as("gap_start"),
        col("next_ts").as("gap_end"),
        ((unix_micros(col("next_ts")) - unix_micros(col("bucket_ts"))) / width - 1L)
          .cast("long").as("missing"))
  }
}
