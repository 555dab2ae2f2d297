package graft.ohlcv

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Market-microstructure estimators over the trade stream / candle frame —
  * the classic inference family that recovers order-flow and liquidity
  * signal from exactly the data the reference persists (trades and OHLCV
  * rows, ccxt-ohlcv-fetch.py:35-51): no book, no trade-direction flags.
  *
  * Shared determinism recipe (returnMoments/rangeVolatility precedent):
  * per-row terms round to 6 decimals and sum in exact DECIMAL partials
  * (order-insensitive across shuffles and engines); only the final scalar
  * formulas are double, with identical operation order replayed by the
  * DuckDB oracles, rounded at emission.
  */
object Microstructure {

  private val D = DecimalType(18, 2)

  /** Tick-rule trade classification (the Lee–Ready tick test) bucketed to
    * order-flow imbalance: each trade is a buy if it printed above the
    * previous price, a sell below, and inherits the last non-zero tick
    * when unchanged (the carry-forward that makes the rule usable on real
    * feeds where most prints are zero-ticks). Aggregated per (symbol,
    * bucket): classified buy/sell volume plus the normalized imbalance
    * (B−S)/(B+S) — the standard order-flow pressure signal.
    *
    * Scale shape: ONE shuffle (per-symbol window for lag + carry-forward —
    * `last(_, ignoreNulls)` over an unbounded-preceding frame is O(1)
    * running state, not an O(n) frame re-scan), then the bucket
    * aggregation reuses the same symbol-hashed exchange (map-side
    * combined). Volumes are exact DECIMAL(18,2) sums; the imbalance ratio
    * is one double division on those exact sums. Leading trades with no
    * tick yet stay unclassified (counted, not guessed).
    */
  def tickRuleImbalance(trades: DataFrame, widthMicros: Long): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("ts"))
    val run = Window.partitionBy(col("symbol")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tick = when(col("price") > col("prev_price"), lit(1))
      .when(col("price") < col("prev_price"), lit(-1))
    val bucket = timestamp_micros(
      unix_micros(col("ts")) - pmod(unix_micros(col("ts")), lit(widthMicros)))
    val dq = col("qty").cast(D)
    val zero = lit(0).cast(D)
    trades
      .withColumn("prev_price", lag(col("price"), 1).over(w))
      .withColumn("side", last(tick, ignoreNulls = true).over(run))
      .groupBy(col("symbol"), bucket.as("bucket_ts"))
      .agg(
        sum(when(col("side") === 1, dq).otherwise(zero)).cast("double").as("buy_qty"),
        sum(when(col("side") === -1, dq).otherwise(zero)).cast("double").as("sell_qty"),
        sum(when(col("side").isNull, dq).otherwise(zero)).cast("double").as("unclassified_qty"),
        count(lit(1)).as("n_trades"))
      .withColumn("imbalance",
        round((col("buy_qty") - col("sell_qty")) /
          when(col("buy_qty") + col("sell_qty") =!= 0.0,
            col("buy_qty") + col("sell_qty")), 6))
  }

  /** Roll's effective-spread estimator per symbol: bid–ask bounce makes
    * consecutive price CHANGES negatively autocovariant, and Roll (1984)
    * inverts that into spread = 2·√(−cov(Δp_t, Δp_{t−1})) — liquidity
    * measured from a candle store alone. Price changes are exact
    * DECIMAL(18,2) close-to-close diffs; the lag-1 co-moment runs through
    * exact decimal partial sums (Σxy, Σx, Σy in one aggregation), and only
    * the final cov = (Σxy − Σx·Σy/n)/n is double (oracle-identical op
    * order). A positive autocovariance (trending sample) clamps to spread
    * 0, the standard convention. Two per-symbol windows fold into ONE
    * shuffle; the aggregation map-side combines.
    */
  def rollSpread(candles: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("bucket_ts"))
    val dxy = DecimalType(38, 4)
    val d = candles
      .select(col("symbol"), col("bucket_ts"),
        (col("close").cast(D) - lag(col("close"), 1).over(w).cast(D)).as("dp"))
      .withColumn("dp_prev", lag(col("dp"), 1).over(w))
      .where(col("dp").isNotNull && col("dp_prev").isNotNull)
    d.groupBy(col("symbol"))
      .agg(count(lit(1)).as("n"),
        sum((col("dp") * col("dp_prev")).cast(dxy)).cast("double").as("sxy"),
        sum(col("dp")).cast("double").as("sx"),
        sum(col("dp_prev")).cast("double").as("sy"))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("autocov",
        (col("sxy") - col("sx") * col("sy") / col("nd")) / col("nd"))
      .select(col("symbol"), col("n"),
        round(col("autocov"), 6).as("autocov_dp"),
        round(lit(2.0) * sqrt(greatest(-col("autocov"), lit(0.0))), 6)
          .as("roll_spread"))
  }

  /** Amihud (2002) illiquidity per symbol: mean of |return| per unit of
    * traded dollar volume over daily candles, ×10⁶ — the price-impact
    * proxy that needs nothing but OHLCV history, and the standard
    * cross-sectional liquidity ranking. Per-day terms |ret|/(close·volume)
    * round to 12 decimals and sum in exact DECIMAL(28,12) (scale-exact
    * across shuffles); zero-volume / zero-price days are excluded (no
    * impact observation), returns come from the shared `returns` lag.
    * ONE per-symbol window + one map-side-combined aggregation.
    */
  def amihud(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("bucket_ts"))
    val term = round(
      abs(col("ret")) / (col("close") * col("volume")) * lit(1000000.0), 12)
      .cast(DecimalType(28, 12))
    daily.select(col("symbol"), col("bucket_ts"), col("close"), col("volume"))
      .withColumn("prev_close", lag(col("close"), 1).over(w))
      .where(col("prev_close").isNotNull && col("prev_close") =!= 0 &&
        col("volume") > 0 && col("close") > 0)
      .withColumn("ret", (col("close") - col("prev_close")) / col("prev_close"))
      .select(col("symbol"), term.as("t"))
      .groupBy(col("symbol"))
      .agg(count(col("t")).as("n_days"),
        (sum(col("t")).cast("double") / count(col("t")).cast("double")).as("a"))
      .select(col("symbol"), col("n_days"), round(col("a"), 6).as("amihud"))
  }

  /** Kyle (1985) price-impact lambda per symbol: the OLS slope of the
    * bucket's price change on its signed NET order flow (buy volume −
    * sell volume, signed by the tick rule) — the canonical "how many
    * dollars does it cost to move the price" estimator, and the
    * regression face of what Amihud proxies with a ratio. Completing the
    * microstructure set: tick_rule (flow), roll_spread (spread), amihud
    * (impact proxy), rolling_beta (exposure), kyle_lambda (impact slope).
    *
    * ONE trade scan end-to-end: the per-trade tick classification reuses
    * the tickRuleImbalance window (one symbol shuffle), and the SAME
    * bucket aggregation that nets the signed flow also picks the bucket's
    * open/close (min_by/max_by on the unique trade ts) — flow and price
    * change never touch a second scan or a join. Co-moments follow the
    * trend_ols recipe: x = net flow and y = close−open are exact
    * DECIMAL(18,2), their products sum in exact DECIMAL(38,4), and only
    * the closed-form slope is double (oracle-identical op order), scaled
    * ×1e6 (impact per million units of flow) and rounded at emission.
    * Zero-variance flow (den = 0) yields null via the guarded divisor.
    */
  def kyleLambda(trades: DataFrame, widthMicros: Long): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("ts"))
    val run = Window.partitionBy(col("symbol")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tick = when(col("price") > col("prev_price"), lit(1))
      .when(col("price") < col("prev_price"), lit(-1))
    val bucket = timestamp_micros(
      unix_micros(col("ts")) - pmod(unix_micros(col("ts")), lit(widthMicros)))
    val dq = col("qty").cast(D)
    val zero = lit(0).cast(D)
    val dxy = DecimalType(38, 4)
    val g = trades
      .withColumn("prev_price", lag(col("price"), 1).over(w))
      .withColumn("side", last(tick, ignoreNulls = true).over(run))
      .groupBy(col("symbol"), bucket.as("bucket_ts"))
      .agg(
        (sum(when(col("side") === 1, dq).otherwise(zero)) -
          sum(when(col("side") === -1, dq).otherwise(zero))).cast(D).as("x"),
        (max_by(col("price"), col("ts")).cast(D) -
          min_by(col("price"), col("ts")).cast(D)).cast(D).as("y"))
    g.groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum((col("x") * col("x")).cast(dxy)).cast("double").as("sxx"),
        sum((col("x") * col("y")).cast(dxy)).cast("double").as("sxy"))
      .withColumn("nd", col("n_buckets").cast("double"))
      .withColumn("den", col("nd") * col("sxx") - col("sx") * col("sx"))
      .select(col("symbol"), col("n_buckets"),
        round((col("nd") * col("sxy") - col("sx") * col("sy")) /
          when(col("den") =!= 0, col("den")) * lit(1000000.0), 6)
          .as("kyle_lambda"))
  }

  /** VOLUME BARS per symbol (the "volume clock"): resample the trade
    * stream into bars that each carry (about) `threshold` units of traded
    * volume instead of a fixed wall-clock width — the López de Prado
    * sampling that equalizes information per bar (busy hours produce many
    * bars, quiet ones few) and is the standard pre-step for
    * activity-synchronized estimators (VPIN below). A trade belongs to
    * bar k when the volume traded BEFORE it is in [k·T, (k+1)·T): the
    * pre-trade cumulative keeps the rule prefix-stable (a new trade never
    * relabels an old one — the property the streaming face relies on).
    *
    * Scale shape: ONE per-symbol window shuffle (the running volume sum —
    * an unbounded-preceding frame is O(1) running state per row), and the
    * bar aggregation REUSES that symbol hash partitioning (bar keys are a
    * superset), map-side combined — the tick_rule shape. Determinism: qty
    * is integral (the reference's trade size), so the cumulative is an
    * exact BIGINT and the bar id an exact integer division; open/close
    * key on the unique per-symbol trade ts; volume sums in exact
    * DECIMAL(18,2).
    */
  def volumeBars(trades: DataFrame, threshold: Long = 500L): DataFrame = {
    require(threshold > 0, "threshold > 0")
    val before = Window.partitionBy(col("symbol")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, -1)
    trades
      .withColumn("cum_prev",
        coalesce(sum(col("qty").cast("long")).over(before), lit(0L)))
      .withColumn("bar_id", expr(s"cum_prev div $threshold"))
      .groupBy(col("symbol"), col("bar_id"))
      .agg(
        min(col("ts")).as("start_ts"),
        max(col("ts")).as("end_ts"),
        min_by(col("price"), col("ts")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("ts")).as("close"),
        sum(col("qty").cast(D)).cast("double").as("volume"),
        count(lit(1)).as("n_trades"))
  }

  /** VPIN per symbol — Volume-synchronized Probability of INformed
    * trading (Easley/López de Prado/O'Hara): average over VOLUME buckets
    * of |buy − sell| / bucket volume, with trades signed by the tick rule
    * and buckets cut by the volume clock above. The flow-toxicity gauge
    * that flagged the 2010 flash crash; composes this module's two
    * primitives (tickRuleImbalance's classification, volumeBars'
    * bucketing) in ONE pass. The final bucket per symbol is still
    * filling and is dropped (the standard convention — a partial bucket
    * biases |B−S|/V toward its early trades).
    *
    * Scale shape: the lag, the carry-forward and the running volume sum
    * are three frames over the SAME per-symbol window — ONE shuffle; the
    * bucket aggregation reuses the partitioning; the last-bucket screen
    * is a dim-scale (one row per symbol) broadcast join. Determinism:
    * classified volumes sum in exact DECIMAL(18,2); each bucket's ratio
    * is one double division rounded to 12 and averaged through exact
    * DECIMAL(28,12) partial sums; unclassified leading volume counts in
    * V (observed volume, not guessed sides).
    */
  def vpin(trades: DataFrame, threshold: Long = 500L): DataFrame = {
    require(threshold > 0, "threshold > 0")
    val w = Window.partitionBy(col("symbol")).orderBy(col("ts"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    val tick = when(col("price") > col("prev_price"), lit(1))
      .when(col("price") < col("prev_price"), lit(-1))
    val dq = col("qty").cast(D)
    val zero = lit(0).cast(D)
    // the bucket frame feeds TWO consumers (the last-bar screen and the
    // probe) — cut it so the fact-scale window chain runs ONCE and both
    // branches read the bar-scale (~fact/threshold rows) checkpoint
    // (the q15/seasonal_decompose precedent)
    val buckets = graft.core.Materialize.once(trades
      .withColumn("prev_price", lag(col("price"), 1).over(w))
      .withColumn("side", last(tick, ignoreNulls = true).over(run))
      .withColumn("cum_prev",
        coalesce(sum(col("qty").cast("long")).over(before), lit(0L)))
      .withColumn("bar_id", expr(s"cum_prev div $threshold"))
      .groupBy(col("symbol"), col("bar_id"))
      .agg(
        sum(when(col("side") === 1, dq).otherwise(zero)).as("buy"),
        sum(when(col("side") === -1, dq).otherwise(zero)).as("sell"),
        sum(dq).as("vol")))
    val lastBar = buckets.groupBy(col("symbol"))
      .agg(max(col("bar_id")).as("last_bar"))
    buckets.join(broadcast(lastBar), Seq("symbol"))
      .where(col("bar_id") < col("last_bar") && col("vol") > 0)
      .select(col("symbol"),
        round(abs(col("buy").cast("double") - col("sell").cast("double")) /
          col("vol").cast("double"), 12).cast(DecimalType(28, 12)).as("t"))
      .groupBy(col("symbol"))
      .agg(count(col("t")).as("n_buckets"),
        (sum(col("t")).cast("double") / count(col("t")).cast("double")).as("v"))
      .select(col("symbol"), col("n_buckets"), round(col("v"), 6).as("vpin"))
  }

  /** Rolling market beta per symbol: 24-bucket trailing covariance of the
    * symbol's return with the EQUAL-WEIGHT market return, over the market
    * return's variance — the exposure series behind hedging and
    * risk-factor screens. The market return per bucket is a dim-scale
    * aggregate (rounded returns in exact DECIMAL sums / symbol count)
    * computed once and joined back on bucket_ts — at any corpus scale the
    * time dimension is small relative to the fact, so the join side
    * broadcasts (AQE sizes it). Beta itself follows the rolling_corr
    * precedent: one bounded per-symbol window, co-moments via the
    * engine's covar_pop/var_pop on identical inputs in both engines,
    * rounded to 6; full 24-bucket frames only.
    */
  def rollingBeta(candles: DataFrame, n: Int = 24): DataFrame = {
    val r = Analytics.returns(candles)
      .select(col("symbol"), col("bucket_ts"),
        round(col("ret"), 6).as("ret"))
      .where(col("ret").isNotNull)
    val mkt = r.groupBy(col("bucket_ts"))
      .agg((sum(col("ret").cast(DecimalType(18, 6))).cast("double") /
        count(lit(1)).cast("double")).as("mkt_ret"))
    val w = Window.partitionBy(col("symbol")).orderBy(col("bucket_ts"))
      .rowsBetween(-(n - 1), 0)
    r.join(broadcast(mkt), Seq("bucket_ts"))
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("cov_rm", covar_pop(col("ret"), col("mkt_ret")).over(w))
      .withColumn("var_m", var_pop(col("mkt_ret")).over(w))
      .where(col("cnt") === n)
      // null-guarded divisor (the `returns` convention): a zero-variance
      // market frame yields null beta, not a divide-by-zero
      .select(col("symbol"), col("bucket_ts"),
        round(col("cov_rm") / when(col("var_m") =!= 0, col("var_m")), 6)
          .as("beta"))
  }
}
