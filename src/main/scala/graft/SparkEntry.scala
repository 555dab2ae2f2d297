package graft

import graft.core.{Tables, Timeframe}
import graft.ohlcv.{Analytics, Candles, Microstructure, Studies}
import graft.operators.AsofJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory; every [SQL] operator has a `queries` entry and a matching
  * DuckDB oracle in `oracleSql` with identical column names.
  *
  * Determinism rules shared by both sides:
  *  - money/qty sums go through exact DECIMAL(18,2) partial sums, then
  *    surface as DOUBLE (associative ⇒ shuffle-order-insensitive, and
  *    bit-identical across engines);
  *  - time bucketing is integer epoch-microsecond arithmetic
  *    (ts - ts % width), never float division;
  *  - first/last picks (open/close) key on the unique trade timestamp.
  */
object SparkEntry {

  private val Tf1m = Timeframe.parse("1m")
  private val Tf5m = Timeframe.parse("5m")
  private val Tf1h = Timeframe.parse("1h")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Candles.fromTrades(Tables.trades(spark, "/root/testdata/sf0.001"), Tf1h)

  // ---- shared SQL fragments for the DuckDB oracles -------------------------

  /** events → trade stream (SURVEY §1 domain mapping). The WHERE mirrors
    * Tables.trades' ingest boundary: malformed rows (null symbol/ts/
    * price/size) drop — a no-op on well-formed feeds.
    */
  private val TradesSql =
    "SELECT * FROM (SELECT event_type AS symbol, ts, value AS price, " +
      "CAST(regexp_extract(props, '([0-9]+)', 1) AS DOUBLE) AS qty FROM events) " +
      "WHERE symbol IS NOT NULL AND ts IS NOT NULL " +
      "AND price IS NOT NULL AND qty IS NOT NULL"

  /** OHLCV resample at a fixed width, mirroring Candles.fromTrades. */
  private def candlesSql(widthUs: Long, src: String = "t"): String =
    s"SELECT symbol, make_timestamp(epoch_us(ts) - epoch_us(ts) % $widthUs) AS bucket_ts, " +
      "min_by(price, ts) AS open, max(price) AS high, min(price) AS low, " +
      "max_by(price, ts) AS close, " +
      "CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS volume, " +
      s"count(*) AS trades FROM $src GROUP BY 1, 2"

  private def withTrades(body: String): String = s"WITH t AS ($TradesSql) $body"

  /** The deterministic IVF-cell kNN graph (cell-bounded candidates,
    * rounded-cosine/neighbor-id tiebreak, k=5) as a CTE chain ending in
    * `g(src, dst)` — shared by the graph-analytics oracles
    * (knn_pagerank, knn_communities).
    */
  private val KnnGraphSql: String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS cvec " +
      "FROM e ORDER BY vec_id LIMIT 16), " +
      "assigned AS (SELECT vec_id, v, cid FROM (" +
      "SELECT e.vec_id, e.v, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
      "ORDER BY round(list_cosine_similarity(e.v, c.cvec), 6) DESC, c.cid) AS arn " +
      "FROM e CROSS JOIN cents c) WHERE arn = 1), " +
      "p AS (SELECT a.vec_id, b.vec_id AS neighbor_id, " +
      "round(list_cosine_similarity(a.v, b.v), 6) AS cos " +
      "FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id <> b.vec_id), " +
      "g AS (SELECT vec_id AS src, neighbor_id AS dst FROM (" +
      "SELECT vec_id, neighbor_id, row_number() OVER (" +
      "PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rn " +
      "FROM p) WHERE rn <= 5), "

  /** Synchronous LPA rounds as chained CTEs (l0 → l`n`): per round, the
    * neighbor-label vote count and the (cnt DESC, label ASC) argmax —
    * the SQL replay of Graph.labelPropagation's max(struct(cnt, −label)).
    */
  private def lpaRoundsSql(n: Int): String =
    (1 to n).map { i =>
      s"v$i AS (SELECT sym.dst AS nv, l.label, count(*) AS cnt FROM sym " +
        s"JOIN l${i - 1} l ON l.nv = sym.src GROUP BY 1, 2), " +
        s"a$i AS (SELECT nv, label AS new_label FROM (SELECT nv, label, " +
        s"row_number() OVER (PARTITION BY nv ORDER BY cnt DESC, label ASC) AS rn FROM v$i) WHERE rn = 1), " +
        s"l$i AS (SELECT l${i - 1}.nv, COALESCE(a$i.new_label, l${i - 1}.label) AS label " +
        s"FROM l${i - 1} LEFT JOIN a$i ON a$i.nv = l${i - 1}.nv)"
    }.mkString(", ")

  /** Inactivity-gap sessionization CTE chain shared by the four session
    * queries (sessionize / session_stats / session_percentiles /
    * bounce_rate): `sess` = one row per (user, session) with bounds and
    * event count.
    */
  private val sessionCtes: String =
    "x AS (SELECT user_id, ts, event_id, " +
      "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events), " +
      "y AS (SELECT user_id, ts, event_id, CASE WHEN prev_ts IS NULL OR " +
      "epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS brk FROM x), " +
      "s AS (SELECT user_id, ts, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM y), " +
      "sess AS (SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end, " +
      "count(*) AS n_events FROM s GROUP BY 1, 2)"

  /** Shared by contamination_check (the report) and decontaminate (the
    * transform): per-corpus-doc benchmark shingle containment.
    */
  private val contaminationSql: String =
    "WITH dw AS (SELECT doc_id, source, string_split_regex(text, '\\s+') AS ws FROM documents), " +
      "shg AS (SELECT doc_id, source, list_distinct(list_transform(" +
      "generate_series(1, len(ws)-2), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS sh FROM dw), " +
      "bsh AS (SELECT DISTINCT unnest(sh) AS s FROM shg WHERE source = 'src0'), " +
      "corpus AS (SELECT doc_id, sh FROM shg WHERE source <> 'src0'), " +
      "ex AS (SELECT doc_id, unnest(sh) AS s FROM corpus), " +
      "hits AS (SELECT e.doc_id, count(*) AS n_hit FROM ex e JOIN bsh b ON e.s = b.s GROUP BY 1), " +
      "base AS (SELECT c.doc_id, CAST(len(c.sh) AS BIGINT) AS n_shingles, " +
      "COALESCE(h.n_hit, 0) AS n_hit FROM corpus c LEFT JOIN hits h ON h.doc_id = c.doc_id) " +
      "SELECT doc_id, n_shingles, n_hit, containment, containment >= 0.5 AS contaminated " +
      "FROM (SELECT base.*, CASE WHEN n_shingles > 0 THEN " +
      "round(CAST(n_hit AS DOUBLE) / n_shingles, 6) END AS containment FROM base) b2"

  /** Blocked symbol-pair generation shared by symbol_correlations and
    * rolling_corr. Keying the self-join on bucket_ts alone expands
    * |symbols|² rows under every time key; instead the right side is
    * tagged blk = hash(sym2) mod B and the left replicated over all B
    * blocks, so (bucket_ts, blk) spreads each bucket's pair work across B
    * reducer keys — per-reducer fan-out drops from |s|² to |s|·(|s|/B) at
    * the cost of B× left-side shuffle volume. B is DERIVED from the
    * symbol-universe size (B ≈ √|s| balances replication against
    * fan-out; one cheap distinct-count job on the already-materialized
    * returns frame — which also fronts its materialization for the join
    * that follows). Output values are identical to the plain bucket_ts
    * join at any B — the oracle replays the unblocked form.
    */
  private def blockedPairJoin(r: DataFrame): DataFrame = {
    val n = r.agg(countDistinct(col("symbol"))).head().getLong(0)
    val B = math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
    val left = r.select(col("symbol").as("sym1"), col("bucket_ts"), col("ret").as("ret1"))
      .withColumn("blk", explode(array((0 until B).map(lit(_)): _*)))
    val right = r.select(col("symbol").as("sym2"), col("bucket_ts"), col("ret").as("ret2"))
      .withColumn("blk", pmod(hash(col("sym2")), lit(B)))
    left.join(right, Seq("bucket_ts", "blk"))
      .where(col("sym1") < col("sym2"))
      .select(col("sym1"), col("sym2"), col("bucket_ts"), col("ret1"), col("ret2"))
  }

  // ---- queries -------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A. reference surface ---------------------------------------------------
    "ohlcv_1m" -> ((s, dir) => Candles.fromTrades(Tables.trades(s, dir), Tf1m)),
    "ohlcv_5m" -> ((s, dir) => Candles.fromTrades(Tables.trades(s, dir), Tf5m)),
    "ohlcv_1d" -> ((s, dir) =>
      Candles.fromTrades(Tables.trades(s, dir), Timeframe.parse("1d"))),
    "ohlcv_1M" -> ((s, dir) =>
      Candles.fromTrades(Tables.trades(s, dir), Timeframe.parse("1M"))),
    "resume_since" -> ((s, dir) =>
      Candles.resumeSince(Candles.fromTrades(Tables.trades(s, dir), Tf1m))),
    "incremental_fetch" -> ((s, dir) => {
      // fetch-loop predicate: recompute candles only from trades after each
      // symbol's resume point (here: 3 days before its last trade). The
      // per-symbol resume table is tiny ⇒ broadcast, no extra shuffle.
      val t = Tables.trades(s, dir)
      val resume = t.groupBy("symbol")
        .agg((max(unix_micros(col("ts"))) - lit(3L * 86400000000L)).as("since_us"))
      val fresh = t.join(broadcast(resume), Seq("symbol"))
        .where(unix_micros(col("ts")) > col("since_us"))
        .select("symbol", "ts", "price", "qty")
      Candles.fromTrades(fresh, Tf1h)
    }),
    "candle_upsert" -> ((s, dir) => {
      // two overlapping ingest batches; later batch wins per (symbol,bucket)
      val t = Tables.trades(s, dir)
      val cut1 = to_timestamp(lit("2024-01-20 00:00:00"))
      val cut2 = to_timestamp(lit("2024-01-12 00:00:00"))
      val c1 = Candles.fromTrades(t.where(col("ts") < cut1), Tf1h)
      val c2 = Candles.fromTrades(t.where(col("ts") >= cut2), Tf1h)
      Candles.upsert(c1, c2)
    }),
    "incomplete_drop" -> ((s, dir) => {
      val now = to_timestamp(lit("2024-01-30 23:00:00"))
      Candles.dropIncomplete(
        Candles.fromTrades(Tables.trades(s, dir), Tf1h), Tf1h, now)
    }),
    "gap_detect" -> ((s, dir) =>
      Candles.gaps(Candles.fromTrades(Tables.trades(s, dir), Tf1h), Tf1h)),
    "ohlcv_1h_from_1m" -> ((s, dir) =>
      // cascade resample: 1h candles from 1m candles, never re-reading trades
      Candles.resample(Candles.fromTrades(Tables.trades(s, dir), Tf1m), Tf1h)),
    "sessionize" -> ((s, dir) =>
      graft.ops.Sessionize.byUser(Tables.events(s, dir), 1800000000L)),
    "session_stats" -> ((s, dir) =>
      // daily engagement rollup over the sessionized stream: all-integer
      // arithmetic (microsecond duration sums), so exact in any engine
      graft.ops.Sessionize.byUser(Tables.events(s, dir), 1800000000L)
        .groupBy(date_trunc("day", col("session_start")).as("day"))
        .agg(count(lit(1)).as("n_sessions"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("n_events")).as("n_events"),
          sum(unix_micros(col("session_end")) - unix_micros(col("session_start")))
            .as("total_duration_us"),
          max(col("n_events")).as("max_session_events"))),

    "session_percentiles" -> ((s, dir) =>
      // session-duration distribution per day: exact interpolated
      // percentiles over integer microsecond durations, surfaced as
      // WHOLE microseconds — durations are ~1e9 µs, where a 6-decimal
      // round cannot absorb the interpolation's last-ulp engine
      // difference, but integer µs rounding trivially does
      graft.ops.Sessionize.byUser(Tables.events(s, dir), 1800000000L)
        .select(date_trunc("day", col("session_start")).as("day"),
          (unix_micros(col("session_end")) - unix_micros(col("session_start")))
            .as("dur_us"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_sessions"),
          round(expr("percentile(dur_us, 0.5)"), 0).cast("long").as("p50_us"),
          round(expr("percentile(dur_us, 0.9)"), 0).cast("long").as("p90_us"),
          round(expr("percentile(dur_us, 0.99)"), 0).cast("long").as("p99_us"))),

    // B. market analytics ----------------------------------------------------
    "vwap" -> ((s, dir) => Analytics.vwap(Tables.trades(s, dir))),
    "sma" -> ((s, dir) =>
      Analytics.sma(Candles.fromTrades(Tables.trades(s, dir), Tf1h), 20)),
    "returns" -> ((s, dir) =>
      Analytics.returns(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "rolling_vol" -> ((s, dir) =>
      Analytics.rollingVol(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "return_moments" -> ((s, dir) =>
      Analytics.returnMoments(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "candle_validate" -> ((s, dir) =>
      Analytics.validate(Candles.fromTrades(Tables.trades(s, dir), Tf1h), Tf1h.micros)),
    "mtf_context" -> ((s, dir) => {
      // multi-timeframe context: each 1h candle enriched with its day's
      // OHLCV and the hour's position in the daily range. The daily frame
      // DERIVES from the hourly candles (candle aggregation is a monoid)
      // — one trades scan, one extra dim-scale agg, broadcast-size join
      // side at any corpus scale
      val h = graft.core.Materialize.once(
        Candles.fromTrades(Tables.trades(s, dir), Tf1h))
      val d = h.groupBy(col("symbol"), date_trunc("day", col("bucket_ts")).as("day"))
        .agg(min_by(col("open"), col("bucket_ts")).as("d_open"),
          max(col("high")).as("d_high"), min(col("low")).as("d_low"),
          max_by(col("close"), col("bucket_ts")).as("d_close"),
          sum(col("volume").cast(DecimalType(18, 2))).cast("double").as("d_volume"))
      h.withColumn("day", date_trunc("day", col("bucket_ts")))
        .join(d, Seq("symbol", "day"))
        .select(col("symbol"), col("bucket_ts"), col("close"),
          col("d_open"), col("d_high"), col("d_low"), col("d_close"), col("d_volume"),
          round((col("close") - col("d_low")) /
            when(col("d_high") =!= col("d_low"), col("d_high") - col("d_low")), 6)
            .as("day_range_pos"))
    }),
    "ema" -> ((s, dir) =>
      // rounded so the oracle's list_reduce (same op order) compares safely
      Analytics.ema(Candles.fromTrades(Tables.trades(s, dir), Tf1h), 20)
        .withColumn("ema", round(col("ema"), 6))),
    "atr" -> ((s, dir) =>
      Analytics.atr(Candles.fromTrades(Tables.trades(s, dir), Tf1h), 14)),
    "symbol_correlations" -> ((s, dir) => {
      // pairwise return correlation across symbols via blockedPairJoin
      // (B derived from the symbol universe — see the helper's scaladoc).
      // The corr/count aggregate partial-aggregates map-side
      // (CentralMomentAgg is declarative), so the second shuffle carries
      // |pairs| partial rows, never the joined rows.
      //
      // the returns frame feeds both join sides: materialize it once so
      // the resample + lag window upstream runs a single time
      val r = graft.core.Materialize.once(
        Analytics.returns(Candles.fromTrades(Tables.trades(s, dir), Tf1h))
          .select(col("symbol"), col("bucket_ts"), col("ret")))
      blockedPairJoin(r)
        .groupBy(col("sym1"), col("sym2"))
        .agg(round(corr(col("ret1"), col("ret2")), 6).as("corr_ret"),
          count(lit(1)).as("n_overlap"))
    }),
    "lead_lag" -> ((s, dir) =>
      // pairwise lead-lag cross-correlation at k in {-2..2}: one window
      // makes all shifted columns, one blocked pair join, one aggregation
      Studies.leadLag(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "pair_spread" -> ((s, dir) =>
      // Engle-Granger first stage: per-pair OLS hedge ratio + residual
      // spread z-score; pair frame cut once, stats broadcast back
      Studies.pairSpread(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "rolling_corr" -> ((s, dir) => {
      // 24-bucket rolling correlation per symbol pair: the same blocked
      // pair generation as symbol_correlations, then one bounded window
      // per pair (frame-ordered sequential aggregation — deterministic,
      // rounded for cross-engine stability). Full frames only.
      val r = graft.core.Materialize.once(
        Analytics.returns(Candles.fromTrades(Tables.trades(s, dir), Tf1h))
          .select(col("symbol"), col("bucket_ts"), col("ret")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("sym1"), col("sym2")).orderBy(col("bucket_ts"))
        .rowsBetween(-23, 0)
      blockedPairJoin(r)
        .withColumn("cnt", count(lit(1)).over(w))
        .withColumn("rolling_corr", round(corr(col("ret1"), col("ret2")).over(w), 6))
        .where(col("cnt") === 24)
        .select(col("sym1"), col("sym2"), col("bucket_ts"), col("rolling_corr"))
    }),
    "heikin_ashi" -> ((s, dir) =>
      Analytics.heikinAshi(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "max_drawdown" -> ((s, dir) =>
      Analytics.maxDrawdown(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "drawdown_curve" -> ((s, dir) =>
      Analytics.drawdownCurve(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "volume_profile" -> ((s, dir) =>
      Analytics.volumeProfile(Tables.trades(s, dir))),
    "range_vol" -> ((s, dir) =>
      // Parkinson + Garman–Klass range volatility per symbol: the
      // OHLC-native sigma estimates (5-7x more efficient than
      // close-to-close stddev); exact decimal partial sums
      Analytics.rangeVolatility(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "tick_rule" -> ((s, dir) =>
      // Lee-Ready tick-test trade classification -> hourly order-flow
      // imbalance: one per-symbol window shuffle reused by the bucket agg
      Microstructure.tickRuleImbalance(Tables.trades(s, dir), Tf1h.micros)),
    "roll_spread" -> ((s, dir) =>
      // Roll (1984) effective spread from close-change autocovariance:
      // exact decimal co-moment sums, clamped at 0 for trending samples
      Microstructure.rollSpread(
        Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "amihud" -> ((s, dir) =>
      // Amihud (2002) illiquidity: mean |ret| per dollar volume over daily
      // candles, x1e6; exact DECIMAL(28,12) partial sums
      Microstructure.amihud(
        Candles.fromTrades(Tables.trades(s, dir), Timeframe.parse("1d")))),
    "rolling_beta" -> ((s, dir) =>
      // 24h trailing beta vs the equal-weight market return (dim-scale
      // aggregate broadcast back); full frames only
      Microstructure.rollingBeta(
        Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "volume_bars" -> ((s, dir) =>
      // Lopez de Prado volume clock: ~500-unit bars; one window shuffle,
      // the bar aggregation reuses the symbol partitioning
      Microstructure.volumeBars(Tables.trades(s, dir))),
    "vpin" -> ((s, dir) =>
      // flow toxicity: tick-rule signing x volume buckets in ONE pass;
      // partial final bucket dropped via a dim-scale broadcast screen
      Microstructure.vpin(Tables.trades(s, dir))),
    "risk_ratios" -> ((s, dir) =>
      // per-bar Sharpe/Sortino/Calmar per symbol: one window shuffle +
      // one map-side-combined aggregation, exact-decimal co-moments
      Studies.riskRatios(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "ulcer_index" -> ((s, dir) =>
      // RMS percentage drawdown + Martin ratio: the duration-aware
      // drawdown statistic; same one-shuffle shape as risk_ratios
      Studies.ulcerIndex(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "vortex" -> ((s, dir) =>
      // VI+/VI- trend-change indicator: three lags + three 14-bar decimal
      // window sums over ONE per-symbol window
      Analytics.vortex(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "kama" -> ((s, dir) =>
      // Kaufman adaptive MA: variable-alpha recursion (no window form) —
      // the ema/holt sequential sweep with exact-cent ER state; the
      // oracle replays the fold via a recursive CTE
      Analytics.kama(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "holt_forecast" -> ((s, dir) =>
      // Holt level+trend smoothing with one-step-ahead forecast: the
      // ema/macd sequential-sweep recipe, oracle replays the recursion
      // via a recursive CTE over per-symbol ordered close arrays
      Analytics.holt(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "trend_ols" -> ((s, dir) =>
      // per-symbol OLS time trend (slope/intercept/R2): one index window
      // + one exact co-moment aggregation
      Analytics.trendOls(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "ewma_vol" -> ((s, dir) =>
      // RiskMetrics lambda=0.94 EWMA volatility: the ema-family
      // sequential sweep over squared returns
      Analytics.ewmaVol(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "var_es" -> ((s, dir) =>
      // 5% historical VaR + expected shortfall in integer micro-units
      // (engine-stable percentile), tail mean on exact integer sums
      Analytics.varEs(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "hurst" -> ((s, dir) =>
      // aggregated-variance Hurst exponent: one lag window computes all
      // five k-step returns, exact-decimal co-moments, literal-ln2 axis
      Analytics.hurst(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "seasonal_decompose" -> ((s, dir) =>
      // additive decomposition: centered-24h-MA trend, hour-of-day
      // seasonal means, residual; one window + dim-scale broadcast join
      Analytics.seasonalDecompose(
        Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "kyle_lambda" -> ((s, dir) =>
      // Kyle (1985) price impact: OLS of bucket price change on tick-rule
      // signed net flow; one trade scan, flow+open/close in the same agg
      Microstructure.kyleLambda(Tables.trades(s, dir), Tf1h.micros)),
    "variance_ratio" -> ((s, dir) =>
      // Lo-MacKinlay VR(q) for q in {2,4,8}: one lag window computes all
      // k-step returns, exact-decimal variance co-moments
      Studies.varianceRatio(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "realized_jump" -> ((s, dir) =>
      // bipower-variation jump detection per (symbol, day): RV vs
      // jump-robust BV on exact decimal sums, literal pi/2
      Studies.realizedJump(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "calendar_effects" -> ((s, dir) =>
      // day-of-week return seasonality: mean/vol per (symbol, dow) from
      // exact decimal co-moments
      Studies.calendarEffects(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "aroon" -> ((s, dir) =>
      // Aroon up/down via the packed-BIGINT windowed argmax (cents*1e9 +
      // idx); one window shuffle, full frames only
      Studies.aroon(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "event_study" -> ((s, dir) =>
      // CAR around volume shocks: broadcast exploded event offsets into
      // an index equi-join; abnormal returns vs symbol mean
      Studies.eventStudy(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "kaplan_meier" -> ((s, dir) =>
      // right-censoring-aware user-retention survival curve; user-dim
      // shrink first, then lifetime-cardinality windows
      graft.ops.Events.kaplanMeier(Tables.events(s, dir))),
    "obv" -> ((s, dir) =>
      Analytics.obv(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "adl" -> ((s, dir) =>
      // accumulation/distribution line: range-weighted money flow in an
      // exact-decimal running sum; one window shuffle
      Analytics.adl(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "chaikin_osc" -> ((s, dir) =>
      // EMA(3)-EMA(10) of the ADL: both recursions in one per-symbol
      // sweep; oracle folds the same literal-alpha doubles
      Analytics.chaikinOsc(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "asof_join" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val p = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val c = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      AsofJoin.joinNative(p, c, "user_id", "ts", "ts", "click_")
    }),
    "asof_join_sql" -> ((s, dir) => {
      // the SQL surface itself: the SAME statement the DuckDB oracle runs,
      // parsed by GraftSqlParser and planned onto the native AsofJoinExec
      // (requires a GraftExtensions session — Verify/Bench/GraftSession
      // all build one)
      Graft.registerViews(s, dir)
      s.sql(
        "WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'), " +
          "c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click') " +
          "SELECT p.event_id, p.user_id, p.ts, p.value, " +
          "c.user_id AS click_user_id, c.ts AS click_ts, c.value AS click_value " +
          "FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts")
    }),
    "asof_join_left" -> ((s, dir) => {
      // ASOF LEFT JOIN: purchases with no prior click stay visible with
      // null click columns (the attribution shape where "no touchpoint
      // yet" is itself the signal) — same native single-sweep operator
      val e = Tables.events(s, dir)
      val p = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val c = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      AsofJoin.joinNative(p, c, "user_id", "ts", "ts", "click_", leftOuter = true)
    }),
    "asof_join_fwd" -> ((s, dir) => {
      // forward as-of: each purchase matched to the EARLIEST click
      // at-or-after it (next touchpoint after conversion) — same native
      // operator, direction flipped
      val e = Tables.events(s, dir)
      val p = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val c = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      AsofJoin.joinNative(p, c, "user_id", "ts", "ts", "click_", forward = true)
    }),
    "asof_join_near" -> ((s, dir) => {
      // nearest as-of: the click closest in time on EITHER side of each
      // purchase (ties go backward) — sensor-alignment semantics, same
      // native single-sweep operator
      val e = Tables.events(s, dir)
      val p = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val c = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      AsofJoin.joinNative(p, c, "user_id", "ts", "ts", "click_", nearest = true)
    }),
    "asof_join_multikey" -> ((s, dir) => {
      // COMPOSITE-key as-of: latest prior click by the same user on the
      // SAME CALENDAR DAY (within-day attribution) — the operator clusters
      // on the (user_id, day) tuple and sweeps tuples lexicographically;
      // exercised through the SQL surface so the multi-key condition walks
      // GraftSqlParser → ResolveAsofJoin → AsofJoinExec
      Graft.registerViews(s, dir)
      s.sql(
        "WITH p AS (SELECT event_id, user_id, CAST(date_trunc('day', ts) AS DATE) AS day, ts, value " +
          "FROM events WHERE event_type = 'purchase'), " +
          "c AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, ts, value " +
          "FROM events WHERE event_type = 'click') " +
          "SELECT p.event_id, p.user_id, p.ts, p.value, " +
          "c.ts AS click_ts, c.value AS click_value " +
          "FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.day = c.day AND p.ts >= c.ts")
    }),
    "asof_join_near_sql" -> ((s, dir) => {
      // the NEAREST SQL surface: same native single-sweep operator as
      // asof_join_near, reached through GraftSqlParser's `ASOF NEAREST
      // JOIN` extension syntax (the inequality only names the two ts
      // columns; NEAREST overrides the direction)
      Graft.registerViews(s, dir)
      s.sql(
        "WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'), " +
          "c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click') " +
          "SELECT p.event_id, p.user_id, p.ts, p.value, " +
          "c.user_id AS click_user_id, c.ts AS click_ts, c.value AS click_value " +
          "FROM p ASOF NEAREST JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts")
    }),
    "gap_fill" -> ((s, dir) =>
      Analytics.gapFill(Candles.fromTrades(Tables.trades(s, dir), Tf1h), Tf1h.micros)),
    "gap_fill_linear" -> ((s, dir) =>
      Analytics.gapFillLinear(Candles.fromTrades(Tables.trades(s, dir), Tf1h), Tf1h.micros)),
    "funnel_1h" -> ((s, dir) => {
      // click→purchase attribution within 1h: forward interval join
      // (equi-join on user + interval residual — a hash join, never a
      // nested loop), then one aggregate per day
      val e = Tables.events(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.IntervalJoin
        .forward(clicks, purchases, "user_id", "ts", "ts", 3600000000L, "p_")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(countDistinct(col("event_id")).as("n_converting_clicks"),
          count(lit(1)).as("n_attributed_purchases"),
          sum(col("p_value").cast(DecimalType(18, 2))).cast("double").as("attributed_value"))
    }),
    "funnel_3stage" -> ((s, dir) => {
      // view → click (≤24h) → purchase (≤24h after the click): two chained
      // forward interval joins — both plain equi hash joins with interval
      // residuals — then one distinct-count rollup per day. The classic
      // multi-stage conversion funnel.
      val e = graft.core.Materialize.once(Tables.events(s, dir)
        .select(col("event_type"), col("user_id"), col("ts"), col("event_id")))
      val views = e.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val vc = graft.operators.IntervalJoin
        .forward(views, clicks, "user_id", "ts", "ts", 86400000000L, "c_")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("c_ts"), col("c_event_id"))
      val vcp = graft.operators.IntervalJoin
        .forward(vc, purchases, "user_id", "c_ts", "ts", 86400000000L, "p_")
      vcp.groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(countDistinct(col("event_id")).as("n_converting_views"),
          countDistinct(col("c_event_id")).as("n_converting_clicks"),
          countDistinct(col("p_event_id")).as("n_purchases"))
    }),
    "attribution_linear" -> ((s, dir) =>
      // linear multi-touch attribution: IntervalJoin pairing, one
      // per-purchase count window, exact DECIMAL(18,6) credit sums
      graft.ops.Events.linearAttribution(Tables.events(s, dir))),
    "retention_cohorts" -> ((s, dir) => {
      // classic cohort retention: users grouped by first-active day,
      // counted per day-offset they return. Two shuffles total (cohort
      // agg + the final rollup); the activity join is a broadcast of the
      // per-user cohort table at dim scale, a shuffle join at 100 TB.
      val e = Tables.events(s, dir)
      // activity feeds the cohort aggregation AND the join probe side:
      // one materialized distinct instead of two events scans
      val activity = graft.core.Materialize.once(e.select(col("user_id"),
        date_trunc("day", col("ts")).as("day")).distinct())
      val cohort = activity.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      activity.join(cohort, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),
    "ltv_cohorts" -> ((s, dir) =>
      // cumulative purchase revenue per signup cohort by account age:
      // user-dim shrink + broadcast sizes, dim-scale cumulative window
      graft.ops.Events.ltvCohorts(Tables.events(s, dir))),
    "bollinger" -> ((s, dir) =>
      Analytics.bollinger(Candles.fromTrades(Tables.trades(s, dir), Tf1h), 20)),
    "rsi" -> ((s, dir) =>
      Analytics.rsi(Candles.fromTrades(Tables.trades(s, dir), Tf1h), 14)),
    "top_volume" -> ((s, dir) =>
      Analytics.topVolume(Candles.fromTrades(Tables.trades(s, dir), Tf1h), 3)),
    "candle_stats" -> ((s, dir) =>
      Analytics.stats(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "macd" -> ((s, dir) =>
      Analytics.macd(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "stochastic" -> ((s, dir) =>
      Analytics.stochastic(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "williams_r" -> ((s, dir) =>
      Analytics.williamsR(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "adx" -> ((s, dir) =>
      // double Wilder smoothing in one sequential per-symbol sweep;
      // recursion bit-identical to the list_reduce prefix replay
      Analytics.adx(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "anchored_vwap" -> ((s, dir) =>
      Analytics.anchoredVwap(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "cci" -> ((s, dir) =>
      // window tp list folded in frame order for BOTH sma and mean
      // deviation (window-end sma in every term) — engine-reassociation-
      // proof, the sliding-window version of the EMA fold oracle
      Analytics.cci(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "mfi" -> ((s, dir) =>
      Analytics.mfi(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "donchian" -> ((s, dir) =>
      Analytics.donchian(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "keltner" -> ((s, dir) =>
      Analytics.keltner(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "acf" -> ((s, dir) =>
      Analytics.autocorrelation(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "hourly_profile" -> ((s, dir) =>
      Analytics.hourlyProfile(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "pivot_points" -> ((s, dir) =>
      Analytics.pivotPoints(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "cusum" -> ((s, dir) =>
      Analytics.cusum(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "ichimoku" -> ((s, dir) =>
      Analytics.ichimoku(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "stickiness" -> ((s, dir) =>
      graft.ops.Events.stickiness(Tables.events(s, dir))),
    "lang_confusion" -> ((s, dir) =>
      graft.ops.TextAnalysis.langId(Tables.table(s, dir, "documents"))
        .groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n"))),
    "market_breadth" -> ((s, dir) =>
      Analytics.marketBreadth(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "session_paths" -> ((s, dir) =>
      graft.ops.Events.sessionPaths(Tables.events(s, dir))),
    "event_transitions" -> ((s, dir) =>
      graft.ops.Events.transitions(Tables.events(s, dir))),
    "active_users_7d" -> ((s, dir) =>
      graft.ops.Events.rollingActiveUsers(Tables.events(s, dir))),
    "inter_event_times" -> ((s, dir) =>
      graft.ops.Events.interEventTimes(Tables.events(s, dir))),
    "bounce_rate" -> ((s, dir) =>
      graft.ops.Events.bounceRate(Tables.events(s, dir))),

    // C. general OLAP --------------------------------------------------------
    "q1_pricing" -> ((s, dir) => {
      val d = DecimalType(18, 2)
      Tables.table(s, dir, "lineitem")
        .where(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(d)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(d)).cast("double").as("sum_base"),
          sum(col("l_extendedprice").cast(d) *
            (lit(1).cast(d) - col("l_discount").cast(d))).cast("double").as("sum_disc"),
          count(lit(1)).as("n"))
    }),
    "q3_revenue" -> ((s, dir) => {
      // fact-fact join shuffles on the key (AQE decides broadcast at small
      // SF); the customer dim is explicitly broadcast — no shuffle for it
      // even at 100 TB fact scale.
      val li = Tables.table(s, dir, "lineitem")
      val o = Tables.table(s, dir, "orders")
      val c = Tables.table(s, dir, "customer")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(revenue.as("revenue"), count(lit(1)).as("n"))
    }),
    "q5_region" -> ((s, dir) => {
      // broadcast the whole dim chain region->nation->customer, shuffle only
      // the two facts.
      val li = Tables.table(s, dir, "lineitem")
      val o = Tables.table(s, dir, "orders")
      val dims = Tables.table(s, dir, "customer")
        .join(broadcast(Tables.table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.table(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(revenue.as("revenue"), count(lit(1)).as("n"))
    }),
    "q7_nation_trade" -> ((s, dir) => {
      // cross-border revenue flows by ship year: ONE fact-fact shuffle on
      // the order key; both nation dim chains broadcast (supplier side and
      // customer side resolve independently — never a second fact shuffle)
      val li = Tables.table(s, dir, "lineitem")
      val o = Tables.table(s, dir, "orders")
      val n = Tables.table(s, dir, "nation")
      val suppN = Tables.table(s, dir, "supplier")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val custN = Tables.table(s, dir, "customer")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(custN), col("o_custkey") === col("c_custkey"))
        .where(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(revenue.as("revenue"), count(lit(1)).as("n"))
    }),
    "q8_market_share" -> ((s, dir) => {
      // one supplier nation's share of a region's import revenue per
      // order year: decimal-exact numerator/denominator in ONE aggregation
      // pass (never two scans), region filter pushed into the broadcast
      // customer chain
      val d = DecimalType(18, 2)
      val rev = col("l_extendedprice").cast(d) *
        (lit(1).cast(d) - col("l_discount").cast(d))
      val li = Tables.table(s, dir, "lineitem")
      val o = Tables.table(s, dir, "orders")
      val suppN = Tables.table(s, dir, "supplier")
        .join(broadcast(Tables.table(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val custAsia = Tables.table(s, dir, "customer")
        .join(broadcast(Tables.table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.table(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .select(col("c_custkey"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custAsia), col("o_custkey") === col("c_custkey"))
        .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          round(sum(when(col("supp_nation") === "NATION_0", rev)
              .otherwise(lit(0).cast(d))).cast("double") /
            sum(rev).cast("double"), 6).as("mkt_share"),
          sum(rev).cast("double").as("revenue"),
          count(lit(1)).as("n"))
    }),
    "q10_returned" -> ((s, dir) => {
      // returned-item revenue per customer: selective returnflag filter
      // pushed to the fact scan, customer->nation chain broadcast
      val li = Tables.table(s, dir, "lineitem")
      val o = Tables.table(s, dir, "orders")
      val custN = Tables.table(s, dir, "customer")
        .join(broadcast(Tables.table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"))
      li.where(col("l_returnflag") === "R")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custN), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(revenue.as("revenue"), count(lit(1)).as("n"))
    }),
    "q2_min_cost" -> ((s, dir) => {
      // q2-style correlated scalar subquery, decorrelated: cheapest
      // supplier(s) per part within a region (no partsupp table in this
      // data model — lineitem prices play the supply-cost role). The
      // per-part minimum is a window over the partkey partition (bounded:
      // lineitems-per-part is a data-model constant at any SF — ONE fact
      // shuffle; a min-agg + join-back would shuffle the fact twice, and
      // the per-part min frame outgrows broadcast at scale), supplier and
      // part dim chains broadcast. All min-achieving ties emitted, like
      // TPC-H q2; decimal price equality is exact, so the row set is
      // engine-stable.
      val eur = Tables.table(s, dir, "supplier")
        .join(broadcast(Tables.table(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.table(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "EUROPE")
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
      val offers = Tables.table(s, dir, "lineitem")
        .join(broadcast(eur), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey"), col("s_name"), col("n_name"),
          col("l_extendedprice"))
      val w = Window.partitionBy(col("l_partkey"))
      offers
        .withColumn("min_price", min(col("l_extendedprice")).over(w))
        .where(col("l_extendedprice") === col("min_price"))
        .join(broadcast(Tables.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_brand"), col("s_name"), col("n_name"),
          col("min_price").cast("double").as("min_price"))
    }),
    "q13_order_dist" -> ((s, dir) => {
      // q13-style left-outer count distribution: orders-per-customer
      // histogram INCLUDING zero-order customers. Orders pre-aggregate to
      // one skinny row per custkey BEFORE the outer join (never join raw
      // facts), the join co-partitions on the same key, and the closing
      // histogram aggregation is count-of-counts scale.
      val oc = Tables.table(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      Tables.table(s, dir, "customer").select(col("c_custkey"))
        .join(oc, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
        .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
    }),
    "q4_order_priority" -> ((s, dir) => {
      // q4-style EXISTS correlated subquery, decorrelated to a LEFT SEMI
      // join: orders with at least one returned line, counted by priority
      // (no commit/receipt dates in this data model — the returnflag
      // plays the late-line predicate's role). The semi join carries NO
      // payload from the inner side and deduplicates by construction —
      // one orderkey shuffle each side, then a 5-key count
      val li = Tables.table(s, dir, "lineitem")
      Tables.table(s, dir, "orders")
        .join(li.where(col("l_returnflag") === "R").select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    }),
    "q18_large_orders" -> ((s, dir) => {
      // q18-style HAVING-subquery shape: orders whose total line quantity
      // exceeds the threshold, with their customer. The lineitem
      // aggregation runs FIRST (one orderkey shuffle, map-side combined,
      // exact decimal sums) and its selective result drives the joins —
      // never a join of raw facts filtered afterwards; customer dim
      // broadcast
      val d = DecimalType(18, 2)
      val big = Tables.table(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast(d)).as("qty"))
        .where(col("qty") > lit(150).cast(d))
      Tables.table(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.table(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("qty").cast("double").as("total_qty"))
    }),
    "q17_small_quantity" -> ((s, dir) => {
      // q17-style correlated-AVG shape: revenue locked in line items
      // below 20% of their part's average quantity, rolled up by brand.
      // The correlated avg decorrelates to a partkey-partitioned window
      // (ONE fact shuffle, bounded partitions — q2's plan argument);
      // the mean goes through an exact DECIMAL sum / count so the window
      // value is identical under any row order, and the 0.2× threshold
      // compare replays bit-for-bit in the oracle's correlated form
      val d = DecimalType(18, 2)
      val w = Window.partitionBy(col("l_partkey"))
      Tables.table(s, dir, "lineitem")
        .withColumn("avg_qty",
          sum(col("l_quantity").cast(d)).over(w).cast("double") /
            count(lit(1)).over(w))
        .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .join(broadcast(Tables.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_extendedprice").cast(d)).cast("double") / 7.0, 2)
          .as("avg_yearly"), count(lit(1)).as("n"))
    }),
    "q22_dormant_value" -> ((s, dir) => {
      // q22-style anti-join + scalar-subquery shape: above-average-
      // balance customers with NO orders since the cutoff (high-value
      // dormant accounts) by nation. The global average is a 1-row
      // broadcast (exact decimal sum / count), NOT EXISTS is a LEFT ANTI
      // join against the date-filtered orders (filter scan-pushed),
      // nation broadcast
      val d = DecimalType(18, 2)
      val c = Tables.table(s, dir, "customer")
      val avgBal = c.where(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast(d)).cast("double") /
          count(lit(1))).as("avg_bal"))
      c.crossJoin(broadcast(avgBal))
        .where(col("c_acctbal") > col("avg_bal"))
        .join(Tables.table(s, dir, "orders")
          .where(col("o_orderdate") >= lit("2001-01-01").cast("date"))
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(Tables.table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_custs"),
          sum(col("c_acctbal").cast(d)).cast("double").as("total_bal"))
    }),
    "q21_waiting_suppliers" -> ((s, dir) => {
      // q21-style MULTI-EXISTS self-join shape — the last classic
      // correlated pattern: EXISTS + NOT EXISTS against the SAME fact
      // under two aliases. Adapted like q4 (returnflag plays the
      // late-delivery predicate): suppliers who were the SOLE returned-
      // line supplier on a finished multi-supplier order. Decorrelation:
      // EXISTS(other supplier's line) is a LEFT SEMI and NOT EXISTS
      // (other supplier's RETURNED line) a LEFT ANTI on the same fact —
      // both equi on orderkey with the suppkey inequality as the join
      // residual, both sides projected to skinny (orderkey, suppkey)
      // rows BEFORE the shuffle. The fact shuffles once per side at
      // most; l1 arrives at the anti join already hash-partitioned on
      // orderkey from the semi join, so the probe side reuses its
      // partitioning. The orders status filter is a LEFT SEMI with NO
      // broadcast hint: ~50% of orders survive o_orderstatus='F', so a
      // hint would force a fact-scale broadcast (driver hazard at
      // 100 TB) — unhinted, AQE broadcasts only if the filtered side is
      // actually small, else it shuffles on the orderkey partitioning
      // l1 already has. Supplier dim broadcasts after the self-joins
      // have shrunk l1.
      val li = Tables.table(s, dir, "lineitem")
      val l1 = li.where(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"))
      val l2 = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val l3 = li.where(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
      l1.join(l2, col("l_orderkey") === col("o2") &&
          col("l_suppkey") =!= col("s2"), "left_semi")
        .join(l3, col("l_orderkey") === col("o3") &&
          col("l_suppkey") =!= col("s3"), "left_anti")
        .join(Tables.table(s, dir, "orders")
          .where(col("o_orderstatus") === "F").select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(broadcast(Tables.table(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
    }),
    "q15_top_supplier" -> ((s, dir) => {
      // q15-style AGGREGATE-OVER-AGGREGATE scalar: supplier(s) whose
      // revenue equals the max over the grouped revenue view. The view is
      // ONE fact shuffle (suppkey, map-side combined, exact decimal
      // sums); the second aggregate runs over the DIM-SCALE view (one
      // row per supplier) and its 1-row max broadcasts back via
      // crossJoin. `rev` feeds TWO branches (the equality probe and the
      // max) — ReuseExchange does NOT dedupe them (measured: the probe
      // branch gets an isnotnull(l_suppkey) filter pushed by the join
      // that de-canonicalizes its subtree vs the max branch — exactly
      // the case Materialize.once exists for), so the view is cut:
      // lineitem is scanned+shuffled once, both branches read the
      // dim-scale checkpoint. PlanAuditSpec pins exactly one lineitem
      // scan. Revenue equality compares DECIMALs (exact, engine-stable)
      // — only the output casts to double. All max-achieving ties
      // emitted, like TPC-H q15.
      val d = DecimalType(18, 2)
      val rev = graft.core.Materialize.once(
        Tables.table(s, dir, "lineitem")
          .groupBy(col("l_suppkey"))
          .agg(sum(col("l_extendedprice").cast(d) *
            (lit(1).cast(d) - col("l_discount").cast(d))).as("rev")))
      val maxRev = rev.agg(max(col("rev")).as("max_rev"))
      rev.crossJoin(broadcast(maxRev))
        .where(col("rev") === col("max_rev"))
        .join(broadcast(Tables.table(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev").cast("double").as("total_revenue"))
    }),
    "q14_promo_share" -> ((s, dir) => {
      // q14 pattern — the CONDITIONAL-RATIO shape: promo revenue share of
      // one ship-month; numerator and denominator computed in ONE
      // aggregation pass (conditional sum, never two scans); the month
      // range is a plain timestamp range pushed to the fact scan
      // (plan-pinned), part dim broadcast
      val d = DecimalType(18, 2)
      val rev = col("l_extendedprice").cast(d) *
        (lit(1).cast(d) - col("l_discount").cast(d))
      Tables.table(s, dir, "lineitem")
        .where(col("l_shipdate") >= to_timestamp(lit("1997-03-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-04-01 00:00:00")))
        .join(broadcast(Tables.table(s, dir, "part")
          .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          round(sum(when(col("p_type") === "PROMO", rev)
              .otherwise(lit(0).cast(d))).cast("double") * 100.0 /
            sum(rev).cast("double"), 6).as("promo_share"),
          sum(rev).cast("double").as("revenue"),
          count(lit(1)).as("n"))
    }),
    "q19_disjunctive" -> ((s, dir) => {
      // q19 pattern — the DISJUNCTIVE-PREDICATE shape: revenue from an OR
      // of three (brand, quantity-range, size-range) conjunctions. The
      // shared p_partkey equi-key keeps this a broadcast HASH join with
      // the disjunction as the residual condition (never a nested loop),
      // and the quantity bound common to every branch is hoisted so it
      // pushes to the parquet scan — the classic OR-factoring test
      val d = DecimalType(18, 2)
      val rev = col("l_extendedprice").cast(d) *
        (lit(1).cast(d) - col("l_discount").cast(d))
      val li = Tables.table(s, dir, "lineitem")
        .where(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      val p = broadcast(Tables.table(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size")))
      li.join(p, col("l_partkey") === col("p_partkey") && (
          (col("p_brand") === "Brand#1" &&
            col("l_quantity") <= 11 && col("p_size").between(1, 5)) ||
          (col("p_brand") === "Brand#2" &&
            col("l_quantity").between(10, 20) && col("p_size").between(1, 10)) ||
          (col("p_brand") === "Brand#3" &&
            col("l_quantity") >= 20 && col("p_size").between(1, 15))))
        .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n"))
    }),
    "q12_late_lines" -> ((s, dir) => {
      // q12 pattern — the FACT-FACT CONDITIONAL-COUNT shape: shipping
      // delay classes (days from order date to ship date — this data
      // model's commit/receipt stand-in) × order-priority mix; both sides
      // project skinny BEFORE the one orderkey shuffle, the priority
      // split is a conditional sum in a single pass (no second scan)
      val li = Tables.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      val o = Tables.table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val delay = datediff(col("l_shipdate"), col("o_orderdate"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(when(delay <= 30, "fast").when(delay <= 90, "normal")
            .otherwise("slow").as("ship_class"),
          col("o_orderpriority"))
        .groupBy(col("ship_class"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
    }),
    "q9_profit" -> ((s, dir) => {
      // q9 pattern — the PROFIT ROLLUP shape: amount = revenue − cost
      // proxy (p_retailprice·l_quantity plays partsupp supplycost's role
      // in this data model) by supplier nation × order year; ONE
      // fact-fact orderkey shuffle with both sides skinny-projected,
      // supplier→nation chain and the name-filtered part dim broadcast
      val d = DecimalType(18, 2)
      val amount = col("l_extendedprice").cast(d) *
        (lit(1).cast(d) - col("l_discount").cast(d)) -
        col("p_retailprice").cast(d) * col("l_quantity").cast(d)
      val li = Tables.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      val o = Tables.table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
      val suppN = Tables.table(s, dir, "supplier")
        .join(broadcast(Tables.table(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      val pWidget = Tables.table(s, dir, "part")
        .where(col("p_name").contains("widget"))
        .select(col("p_partkey"), col("p_retailprice"))
      li.join(broadcast(pWidget), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(amount).cast("double").as("profit"), count(lit(1)).as("n"))
    }),
    "q16_supplier_parts" -> ((s, dir) => {
      // q16 pattern — the NOT-IN + COUNT-DISTINCT shape: distinct
      // suppliers serving each (brand, size) part segment, excluding one
      // brand and excluding "complaint" suppliers (negative account
      // balance — the supplier-table predicate playing q16's
      // '%Customer%Complaints%' comment regex). NOT IN decorrelates to a
      // LEFT ANTI against the dim-scale offender set, which BROADCASTS —
      // the fact never shuffles for the exclusion; the distinct supplier
      // count shuffles once on the group keys
      val li = Tables.table(s, dir, "lineitem")
      val complaints = Tables.table(s, dir, "supplier")
        .where(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("l_suppkey"))
      val p = Tables.table(s, dir, "part")
        .where(col("p_brand") =!= "Brand#1")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      li.select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(complaints), Seq("l_suppkey"), "left_anti")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
    }),
    "q20_dominant_suppliers" -> ((s, dir) => {
      // q20 pattern — the NESTED-AGGREGATE SEMI-CHAIN shape: suppliers
      // that DOMINATE (>50% of shipped 1997 quantity) at least one widget
      // part (availqty-vs-half-demand's role in this data model). The
      // per-(part,supplier) aggregate is ONE fact shuffle; the per-part
      // total rides a partkey-partitioned window over that dim-scale
      // frame (bounded partitions — suppliers-per-part is a data-model
      // constant; the q2/q17 argument), dominance compares exact
      // DECIMALs, supplier names broadcast at the end
      val d = DecimalType(18, 2)
      val li = Tables.table(s, dir, "lineitem")
        .where(year(col("l_shipdate")) === 1997)
        .join(broadcast(Tables.table(s, dir, "part")
          .where(col("p_name").contains("widget")).select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
      val ps = li.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast(d)).as("qty"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
      ps.withColumn("total", sum(col("qty")).over(w))
        .where(col("qty") * 2 > col("total"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_dominated"))
        .join(broadcast(Tables.table(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_dominated"))
    }),
    "q11_value_concentration" -> ((s, dir) => {
      // q11 pattern — the HAVING-ABOVE-GLOBAL-FRACTION shape (the last
      // classic TPC-H plan family not yet covered): per-part value within
      // one trade bloc's supplier flow, keeping parts whose value exceeds
      // a fixed fraction of the bloc total. Adapted to this star (no
      // partsupp table): value = extendedprice·(1−discount) over lines
      // supplied by bloc suppliers (nationkey ≡ 0 mod 5 — a deterministic
      // 5-of-25-nation slice that survives any testdata regeneration,
      // where a single literal nation can be supplier-empty at tiny SF).
      // Decorrelation: the bloc restriction is a BROADCAST SEMI on the
      // supplier dim (the fact never shuffles for it); per-part value is
      // ONE fact shuffle on partkey; the scalar bloc total aggregates the
      // DIM-SCALE per-part view and broadcasts back as a 1-row crossJoin
      // (q15's idiom). HAVING compares exact DECIMALs; only output casts.
      val d = DecimalType(18, 2)
      val bloc = Tables.table(s, dir, "supplier")
        .join(broadcast(Tables.table(s, dir, "nation")
          .where(col("n_nationkey") % 5 === 0).select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"), "left_semi")
        .select(col("s_suppkey").as("l_suppkey"))
      // perPart feeds BOTH the probe branch and the scalar total — cut it
      // (q15's lesson: ReuseExchange measurably does not dedupe the two
      // branches, so without the cut the fact is scanned+shuffled twice;
      // plan-pinned to one lineitem scan)
      val perPart = graft.core.Materialize.once(
        Tables.table(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"),
            (col("l_extendedprice").cast(d) *
              (lit(1).cast(d) - col("l_discount").cast(d))).as("v"))
          .join(broadcast(bloc), Seq("l_suppkey"), "left_semi")
          .groupBy(col("l_partkey"))
          .agg(sum(col("v")).as("value")))
      val total = perPart.agg(sum(col("value")).as("bloc_total"),
        count(lit(1)).as("n_parts"))
      // SCALE-INVARIANT concentration bar — "above 2× the mean part
      // value", compared as value·n > 2·total: decimal×integer is exact
      // in every engine (a fixed fraction like q11's 0.0001/SF empties
      // at larger part counts; a double fraction rounds differently per
      // engine at the boundary)
      perPart.crossJoin(broadcast(total))
        .where(col("value") * col("n_parts") > col("bloc_total") * lit(2))
        .select(col("l_partkey").as("p_partkey"),
          col("value").cast("double").as("value"))
    }),
    "supplier_nation_revenue" -> ((s, dir) => {
      // supplier-side dim chain (supplier→nation) broadcast, fact shuffles
      // only for the final aggregation — q5's sibling covering the two
      // otherwise-unused dimension tables
      val li = Tables.table(s, dir, "lineitem")
      li.join(broadcast(Tables.table(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.table(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(revenue.as("revenue"), count(lit(1)).as("n"),
          countDistinct(col("s_suppkey")).as("n_suppliers"))
    }),
    "brand_revenue" -> ((s, dir) => {
      val d = DecimalType(18, 2)
      Tables.table(s, dir, "lineitem")
        .join(broadcast(Tables.table(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(revenue.as("revenue"),
          sum(col("l_quantity").cast(d)).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
    }),
    "rollup_sales" -> ((s, dir) => {
      val d = DecimalType(18, 2)
      Tables.table(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(d)).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
    }),
    "cube_sales" -> ((s, dir) => {
      // full CUBE: all four grouping-set combinations in one Expand-based
      // aggregation pass (the rollup's lattice-complete sibling)
      val d = DecimalType(18, 2)
      Tables.table(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(d)).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
    }),
    "pivot_events" -> ((s, dir) => {
      val d = DecimalType(18, 2)
      val e = Tables.events(s, dir)
      def cnt(t: String) = count(when(col("event_type") === t, 1)).as(s"n_$t")
      e.groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"), cnt("error"),
          sum(when(col("event_type") === "purchase", col("value"))
            .otherwise(lit(0)).cast(d)).cast("double").as("purchase_value"))
    }),
    "distinct_users" -> ((s, dir) =>
      Tables.events(s, dir).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n"))),
    "spend_quartiles" -> ((s, dir) => {
      // exact global NTILE without the single-partition window trap:
      // range-partitioned rank + arithmetic bucketing (ops.Rank scaladoc)
      val d = DecimalType(18, 2)
      val spend = Tables.table(s, dir, "orders")
        .groupBy(col("o_custkey").as("custkey"))
        .agg(sum(col("o_totalprice").cast(d)).cast("double").as("spend"))
      graft.ops.Rank.withNtile(spend, 4,
          Seq(col("spend").desc, col("custkey")), "quartile")
        .withColumnRenamed("rank", "spend_rank")
    }),
    "rfm_segments" -> ((s, dir) => {
      // classic RFM segmentation: recency/frequency/monetary quartiles per
      // customer — three exact global NTILEs via ops.Rank (range-partition
      // sort + zipWithIndex each; no single-partition window anywhere)
      val d = DecimalType(18, 2)
      val b0 = graft.core.Materialize.once(Tables.table(s, dir, "orders")
        .groupBy(col("o_custkey").as("custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("frequency"),
          sum(col("o_totalprice").cast(d)).cast("double").as("monetary")))
      val mx = b0.agg(max(col("last_order")).as("max_date"))
      val base = b0.crossJoin(broadcast(mx))
        .withColumn("recency_days",
          datediff(col("max_date"), col("last_order")).cast("long"))
        .select(col("custkey"), col("recency_days"), col("frequency"), col("monetary"))
      val withR = graft.ops.Rank.withNtile(base, 4,
        Seq(col("recency_days"), col("custkey")), "r_q").drop("rank")
      val withF = graft.ops.Rank.withNtile(withR, 4,
        Seq(col("frequency").desc, col("custkey")), "f_q").drop("rank")
      graft.ops.Rank.withNtile(withF, 4,
          Seq(col("monetary").desc, col("custkey")), "m_q").drop("rank")
        .withColumn("rfm", col("r_q") * 100 + col("f_q") * 10 + col("m_q"))
    }),
    "gini_by_nation" -> ((s, dir) => {
      // revenue-concentration (Gini) per nation over customer spend. The
      // rank-weighted sum Σ(rank·spend) stays EXACT: rank as DECIMAL(10,0)
      // × DECIMAL(18,2) spend sums without float drift, so the only
      // doubles are the final closed-form ratio (one fixed association
      // order, rounded). Per-nation row_number windows stream with O(1)
      // state — the single-partition trap only applies to GLOBAL windows.
      val d = DecimalType(18, 2)
      val spend = Tables.table(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(sum(col("o_totalprice").cast(d)).as("spend"))
      val cust = Tables.table(s, dir, "customer")
        .join(broadcast(Tables.table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name"))
      val w = Window.partitionBy(col("n_name")).orderBy(col("spend"), col("c_custkey"))
      spend.join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("n_name"), col("c_custkey"), col("spend"))
        .withColumn("rk", row_number().over(w).cast(DecimalType(10, 0)))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("spend")).cast("double").as("total_spend"),
          // per-customer spend re-narrowed to DECIMAL(18,2) so the product
          // stays inside exact decimal range on both engines
          sum(col("rk") * col("spend").cast(d)).cast("double").as("s_ix"))
        .select(col("n_name"), col("n_customers"),
          col("total_spend"),
          round(lit(2.0) * col("s_ix") / (col("n_customers") * col("total_spend")) -
            (col("n_customers") + 1).cast("double") / col("n_customers"), 6)
            .as("gini"))
    }),
    "q6_selective" -> ((s, dir) => {
      // range-predicate showcase: every filter reaches the parquet scan
      val d = DecimalType(18, 2)
      Tables.table(s, dir, "lineitem")
        .where(col("l_shipdate") >= to_timestamp(lit("1994-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast(d) * col("l_discount").cast(d))
          .cast("double").as("revenue"), count(lit(1)).as("n"))
    }),
    "customers_no_orders" -> ((s, dir) =>
      // anti join: customers with NO high-value order (NOT EXISTS)
      Tables.table(s, dir, "customer")
        .join(Tables.table(s, dir, "orders").where(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))),
    "big_spender_segments" -> ((s, dir) =>
      // semi join: EXISTS with a pushed-down predicate on the inner side
      Tables.table(s, dir, "customer")
        .join(Tables.table(s, dir, "orders").where(col("o_totalprice") > 200000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))),
    "value_percentiles" -> ((s, dir) =>
      // exact percentiles (linear interpolation both engines); rounded so
      // co-moment accumulation order can't flip the last ulp
      Tables.events(s, dir).groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"))),
    "clip_outliers" -> ((s, dir) => {
      // winsorization — the value-normalization pass a training pipeline
      // runs before feature export: exact per-group p01/p99 bounds
      // (linear interpolation, rounded), broadcast back, values clipped.
      // One percentile aggregation + a map-only clip; no window.
      val e = Tables.events(s, dir)
      val bounds = e.groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.01)"), 6).as("lo"),
          round(expr("percentile(value, 0.99)"), 6).as("hi"))
      e.join(broadcast(bounds), "event_type")
        .select(col("event_id"), col("event_type"), col("value"),
          least(greatest(col("value"), col("lo")), col("hi")).as("clipped"),
          (col("value") < col("lo") || col("value") > col("hi")).as("was_clipped"))
    }),
    "trimmed_mean" -> ((s, dir) => {
      // robust per-group mean: drop values outside exact p01/p99 bounds,
      // then a decimal-exact mean over the survivors — clip_outliers'
      // sibling for when outliers should be EXCLUDED, not clamped. One
      // percentile aggregation + broadcast + one exact aggregation.
      val e = Tables.events(s, dir)
      val bounds = e.groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.01)"), 6).as("lo"),
          round(expr("percentile(value, 0.99)"), 6).as("hi"))
      e.join(broadcast(bounds), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") < col("lo") || col("value") > col("hi"), 1L)
            .otherwise(0L)).as("n_trimmed"),
          round(sum(when(col("value") >= col("lo") && col("value") <= col("hi"),
            col("value").cast(DecimalType(18, 6)))).cast("double") /
            sum(when(col("value") >= col("lo") && col("value") <= col("hi"), 1L)
              .otherwise(0L)), 6).as("trimmed_mean"))
    }),
    "value_histogram" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"), floor(col("value") / 50).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))),
    "value_corr" -> ((s, dir) =>
      Tables.events(s, dir).groupBy(col("event_type"))
        .agg(round(corr(col("value"), col("user_id").cast("double")), 6).as("corr_value_user"))),
    "approx_percentiles" -> ((s, dir) =>
      // GK-sketch percentiles surfaced as their accuracy contract. The
      // sketch guarantees RANK error, not value error, so the check is
      // rank-windowed: each approx percentile must lie between the exact
      // percentiles at q ± 0.01 (a 100× slack over the 1e-4 rank error of
      // accuracy=10000, robust at any scale — a value-relative bound
      // breaks on small groups where adjacent order stats differ a lot).
      Tables.events(s, dir).groupBy(col("event_type"))
        .agg(expr("percentile(value, array(0.5, 0.9, 0.99))").as("exact"),
          expr("percentile(value, array(0.49, 0.89, 0.98))").as("lo"),
          expr("percentile(value, array(0.51, 0.91, 1.0))").as("hi"),
          expr("percentile_approx(value, array(0.5, 0.9, 0.99), 10000)").as("approx"))
        .select(col("event_type"),
          round(element_at(col("exact"), 1), 6).as("p50"),
          round(element_at(col("exact"), 2), 6).as("p90"),
          round(element_at(col("exact"), 3), 6).as("p99"),
          (element_at(col("approx"), 1).between(element_at(col("lo"), 1), element_at(col("hi"), 1)) &&
            element_at(col("approx"), 2).between(element_at(col("lo"), 2), element_at(col("hi"), 2)) &&
            element_at(col("approx"), 3).between(element_at(col("lo"), 3), element_at(col("hi"), 3)))
            .as("approx_ok"))),
    "approx_distinct" -> ((s, dir) =>
      // HLL sketch surfaced as a checkable contract: the estimate must land
      // within 5% of the exact count — deterministic given the data, so the
      // oracle (exact count + literal true) hash-matches iff the sketch
      // honors its accuracy bound. rsd=0.01 makes 5% a ~5σ bound (the
      // default rsd=0.05 is 1σ and actually misses 5% at sf0.1).
      Tables.events(s, dir).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"),
          approx_count_distinct(col("user_id"), 0.01).as("n_approx"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact")).cast("double") <=
            lit(0.05) * col("n_exact")).as("approx_ok"))),

    // D. LLM-training-data pipeline ------------------------------------------
    "dedup_exact" -> ((s, dir) =>
      graft.ops.Dedup.exact(Tables.table(s, dir, "documents"))),
    "dedup_substring" -> ((s, dir) =>
      graft.ops.Dedup.substringDedup(Tables.table(s, dir, "documents"))),
    "dedup_minhash" -> ((s, dir) =>
      graft.ops.Dedup.minhashLsh(Tables.table(s, dir, "documents"))),
    "dedup_simhash" -> ((s, dir) =>
      graft.ops.Dedup.simhashNearDup(Tables.table(s, dir, "documents"))),
    "ngram_jaccard" -> ((s, dir) =>
      graft.ops.Dedup.ngramJaccard(Tables.table(s, dir, "documents"))),
    "containment_pairs" -> ((s, dir) =>
      graft.ops.Dedup.containmentPairs(Tables.table(s, dir, "documents"))),
    "corpus_dedup" -> ((s, dir) =>
      graft.ops.Dedup.corpusDedup(Tables.table(s, dir, "documents"))),
    "corpus_dedup_stable" -> ((s, dir) => {
      // nightly stable-id replay: prior labels from the even-doc_id half
      // (yesterday's batch), today over the full corpus — surviving
      // clusters keep yesterday's ids via the claim/award relabel
      // signatures computed ONCE over the full corpus (corpusBase); the
      // prior batch derives by FILTERING the cut frame — per-doc map-only
      // signatures make the filtered base identical to a base over the
      // filtered corpus, and the replay skips a second full text scan
      val base = graft.ops.Dedup.corpusBase(Tables.table(s, dir, "documents"))
      val prior = graft.ops.Dedup
        .corpusDedupFromBase(base.where(col("doc_id") % 2 === 0))
        .select(col("doc_id"), col("cluster_id"))
      graft.ops.Dedup.corpusDedupStableFromBase(base, prior)
    }),
    "dedup_incremental" -> ((s, dir) => {
      // nightly-crawl screening: the src0 batch against the rest of the
      // corpus — (new, corpus) candidates only, oversized corpus buckets
      // contribute their representative
      val d = Tables.table(s, dir, "documents")
      graft.ops.Dedup.incrementalDedup(
        d.where(col("source") === "src0"), d.where(col("source") =!= "src0"))
    }),
    "dedup_bloom" -> ((s, dir) => {
      // Bloom-screened exact incremental dedup: the src0 batch vs the
      // rest — bounded-bits screen (no key collect), exact verify join
      // for positives only; result is exact (no false negatives)
      val d = Tables.table(s, dir, "documents")
      graft.ops.Dedup.bloomScreenDedup(
        d.where(col("source") === "src0"), d.where(col("source") =!= "src0"))
        .drop("screened") // screened is filter-seed-dependent; spec-pinned
    }),
    "corpus_shuffle" -> ((s, dir) =>
      // deterministic global training order: two-pass distributed global
      // rank over the portable epoch hash — no single-task window
      graft.ops.TextAnalysis.corpusShuffle(Tables.table(s, dir, "documents"))),
    "corpus_diff" -> ((s, dir) => {
      // nightly snapshot diff: prior = the even-doc_id half (the
      // incremental-replay convention), today drops doc_id % 7 == 3
      // (deletions) and re-renders doc_id % 10 == 0 (edits) — per
      // (source, status) added/removed/changed/unchanged counts
      val d = Tables.table(s, dir, "documents")
      val prior = d.where(col("doc_id") % 2 === 0)
      val today = d.where(col("doc_id") % 7 =!= 3)
        .withColumn("text", when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" rev2"))).otherwise(col("text")))
      graft.ops.TextAnalysis.corpusDiff(prior, today)
    }),
    "contamination_check" -> ((s, dir) =>
      graft.ops.TextAnalysis.contaminationCheck(Tables.table(s, dir, "documents"))),
    "tfidf_topterms" -> ((s, dir) =>
      graft.ops.TextAnalysis.tfidfTopTerms(Tables.table(s, dir, "documents"))),
    "bigram_pmi" -> ((s, dir) =>
      // PMI collocations: two hash aggs + dim-scale vocab joins, 1-row
      // broadcast totals; never a corpus pair join
      graft.ops.TextAnalysis.bigramPmi(Tables.table(s, dir, "documents"))),
    "volume_anomaly" -> ((s, dir) =>
      Analytics.volumeAnomaly(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "candle_patterns" -> ((s, dir) =>
      Analytics.candlePatterns(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "bigram_surprisal" -> ((s, dir) =>
      graft.ops.TextAnalysis.bigramSurprisal(Tables.table(s, dir, "documents"))),
    "repetition_score" -> ((s, dir) =>
      graft.ops.TextAnalysis.repetitionScore(Tables.table(s, dir, "documents"))),
    "char_entropy" -> ((s, dir) =>
      graft.ops.TextAnalysis.charEntropy(Tables.table(s, dir, "documents"))),
    "zipf_fit" -> ((s, dir) =>
      graft.ops.TextAnalysis.zipfFit(Tables.table(s, dir, "documents"))),
    "heavy_hitters" -> ((s, dir) =>
      graft.ops.TextAnalysis.heavyHitters(Tables.table(s, dir, "documents"))),
    "decontaminate" -> ((s, dir) =>
      graft.ops.TextAnalysis.decontaminate(Tables.table(s, dir, "documents"))),
    "lang_id" -> ((s, dir) =>
      graft.ops.TextAnalysis.langId(Tables.table(s, dir, "documents"))),
    "quality_score" -> ((s, dir) =>
      graft.ops.TextAnalysis.qualityScore(Tables.table(s, dir, "documents"))),
    "token_count" -> ((s, dir) =>
      graft.ops.TextAnalysis.tokenCount(Tables.table(s, dir, "documents"))),
    "lexical_diversity" -> ((s, dir) =>
      // type/token ratio + Guiraud index: the templated-text screen;
      // pure map over the text scan, no shuffle
      graft.ops.TextAnalysis.lexicalDiversity(Tables.table(s, dir, "documents"))),
    "tokenizer_fertility" -> ((s, dir) =>
      // subword tokens per word + chars per token by language: the
      // context-budget report; one map-side-combined aggregation
      graft.ops.TextAnalysis.tokenizerFertility(Tables.table(s, dir, "documents"))),
    "dataset_card" -> ((s, dir) =>
      // per-source release card: volume/length percentiles, language mix
      // + entropy, exact-dup rate; one scan, dim-scale joins after
      graft.ops.TextAnalysis.datasetCard(Tables.table(s, dir, "documents"))),
    "packing_stats" -> ((s, dir) =>
      graft.ops.TextAnalysis.packingStats(Tables.table(s, dir, "documents"))),
    "mix_report" -> ((s, dir) => {
      // training-mix dashboard: docs/tokens/mean quality per (lang,
      // source) cell. Mean goes through exact decimal partial sums (the
      // Profile trick) so it is shuffle-order-independent; one map pass +
      // one low-cardinality aggregation.
      val d = Tables.table(s, dir, "documents")
      d.select(col("lang"), col("source"),
          graft.ops.TextAnalysis.tokens(col("text")).as("t"),
          graft.ops.TextAnalysis.scoreColumn(col("text")).as("score"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("t")).as("total_tokens"),
          round(sum(col("score").cast(DecimalType(18, 12))).cast("double") /
            count(col("score")), 6).as("mean_score"))
    }),
    "doc_fingerprint" -> ((s, dir) =>
      graft.ops.TextAnalysis.fingerprint(Tables.table(s, dir, "documents"))),
    "ngram_freq" -> ((s, dir) =>
      graft.ops.TextAnalysis.ngramFreq(Tables.table(s, dir, "documents"))),
    "text_normalize" -> ((s, dir) =>
      graft.ops.TextAnalysis.normalize(Tables.table(s, dir, "documents"))),
    "pii_scrub" -> ((s, dir) =>
      graft.ops.TextAnalysis.piiScrub(Tables.table(s, dir, "documents"))),
    "corpus_curate" -> ((s, dir) =>
      graft.ops.TextAnalysis.curate(Tables.table(s, dir, "documents"))),
    "corpus_sample" -> ((s, dir) =>
      graft.ops.TextAnalysis.stratifiedSample(Tables.table(s, dir, "documents"),
        "lang", Map("en" -> 0.8, "de" -> 0.5, "fr" -> 0.25, "es" -> 0.1))),
    "embed_neardup" -> ((s, dir) =>
      graft.ops.Similarity.nearDupPairs(s, Tables.table(s, dir, "embeddings"), 0.4)),
    "embedding_profile" -> ((s, dir) =>
      graft.ops.Similarity.embeddingProfile(Tables.table(s, dir, "embeddings"))),
    "ann_topk" -> ((s, dir) => {
      val e = Tables.table(s, dir, "embeddings")
      graft.ops.Similarity.bruteForceTopK(s, e, e.where(col("vec_id") < 10), 5)
    }),
    "ann_lsh" -> ((s, dir) => {
      val e = Tables.table(s, dir, "embeddings")
      graft.ops.Similarity.lshTopK(s, e, e.where(col("vec_id") < 10), 5)
    }),
    "ann_lsh_multi" -> ((s, dir) => {
      val e = Tables.table(s, dir, "embeddings")
      graft.ops.Similarity.lshTopKMulti(s, e, e.where(col("vec_id") < 10), 5)
    }),
    "ann_ivf" -> ((s, dir) => {
      val e = Tables.table(s, dir, "embeddings")
      graft.ops.Ivf.searchTopK(e, e.where(col("vec_id") < 10), 5, iters = 0)
    }),
    "ann_recall" -> ((s, dir) => {
      // index-quality monitor: recall@5 of the IVF probe scan vs exact
      // brute force, per query — ONE materialized corpus scan feeds both
      // branches, overlap joins two |q|·k frames (broadcast)
      val e = Tables.table(s, dir, "embeddings")
      graft.ops.Ivf.annRecall(e, e.where(col("vec_id") < 10), 5)
    }),
    "ann_ivf_trained" -> ((s, dir) => {
      // 2 Lloyd rounds — exercises deterministic distributed k-means; the
      // oracle replays both rounds (decimal-exact centroid means)
      val e = Tables.table(s, dir, "embeddings")
      graft.ops.Ivf.searchTopK(e, e.where(col("vec_id") < 10), 5, iters = 2)
    }),
    "label_confusion" -> ((s, dir) =>
      graft.ops.Ivf.labelConfusion(Tables.table(s, dir, "embeddings"))),
    "semantic_sample" -> ((s, dir) =>
      // cluster-balanced deterministic subsample: every quantizer cell
      // contributes up to perCell vectors picked by portable hash order —
      // the diversity-preserving alternative to a uniform corpus sample
      graft.ops.Ivf.semanticSample(Tables.table(s, dir, "embeddings"))),
    "pack_plan" -> ((s, dir) =>
      // GPT-style dense-packing layout: per-lang running token totals via
      // the distributed two-pass Scan (never a per-stratum window), then
      // pure integer sequence/offset arithmetic
      graft.ops.TextAnalysis.packPlan(Tables.table(s, dir, "documents"))),
    "semantic_neardup" -> ((s, dir) =>
      // SemDeDup pass: exact cosine pairs WITHIN quantizer cells — the
      // cell join bounds pair generation at sum(|cell|^2), not n^2
      graft.ops.Ivf.semanticNearDup(Tables.table(s, dir, "embeddings"))),
    "semantic_dedup" -> ((s, dir) =>
      // SemDeDup end-to-end: within-cell pairs -> connected components ->
      // keeper = farthest-from-centroid member (the curation decision)
      graft.ops.Ivf.semanticDedup(Tables.table(s, dir, "embeddings"))),
    "knn_graph" -> ((s, dir) =>
      // approximate k-NN graph: every vector's top-5 within its quantizer
      // cell — candidates cell-bounded, selection via the bounded heap
      graft.ops.Ivf.knnGraph(Tables.table(s, dir, "embeddings"))),
    "knn_components" -> ((s, dir) =>
      // mutual-kNN clustering: edges kept only when BOTH endpoints rank
      // each other top-k (hub pruning), then pointer-jumping CC
      graft.ops.Ivf.knnComponents(Tables.table(s, dir, "embeddings"))),
    "knn_pagerank" -> ((s, dir) =>
      // integer-scaled fixed-iteration PageRank over the kNN graph —
      // centrality for density-weighted curation; every intermediate an
      // exact BIGINT so any engine/partitioning replays bit-identically
      graft.ops.Graph.pageRank(
        graft.ops.Ivf.knnGraph(Tables.table(s, dir, "embeddings"))
          .select(col("vec_id").as("src"), col("neighbor_id").as("dst")))
        .select(col("v").as("vec_id"), col("pr"))),
    "knn_communities" -> ((s, dir) =>
      // deterministic synchronous label propagation over the kNN graph:
      // min-label tie-break, fixed rounds, integer argmax — communities
      // without a target count (CC over-merges through any bridge)
      graft.ops.Graph.labelPropagation(
        graft.ops.Ivf.knnGraph(Tables.table(s, dir, "embeddings"))
          .select(col("vec_id").as("src"), col("neighbor_id").as("dst")))
        .select(col("v").as("vec_id"), col("label"))),
    "knn_triangles" -> ((s, dir) =>
      // degree-ordered triangle counting + clustering coefficients over
      // the kNN graph: wedges only at each edge's lower-(deg,id) source,
      // closure a semi equi-join — hub fan-out bounded, no pair blowup
      graft.ops.Graph.triangles(
        graft.ops.Ivf.knnGraph(Tables.table(s, dir, "embeddings"))
          .select(col("vec_id").as("src"), col("neighbor_id").as("dst")))),
    "knn_assortativity" -> ((s, dir) =>
      // Newman degree assortativity over the kNN graph: exact-integer
      // endpoint-degree co-moments via the symmetrization algebra (both
      // orderings folded per edge row), one closing aggregation
      graft.ops.Graph.assortativity(
        graft.ops.Ivf.knnGraph(Tables.table(s, dir, "embeddings"))
          .select(col("vec_id").as("src"), col("neighbor_id").as("dst")))),
    "benford_check" -> ((s, dir) =>
      // first-digit distribution of order values vs Benford's law: string
      // digit extraction (no float log10 boundary), literal expectations
      graft.ops.Dq.benford(
        Tables.table(s, dir, "orders"), "o_totalprice")),
    "heaps_curve" -> ((s, dir) =>
      // corpus-growth / dedup-saturation curve: new exact-content uniques
      // per 100-doc ingest batch + the cumulative dedup'd size
      graft.ops.Dedup.heapsCurve(Tables.table(s, dir, "documents"))),
    "trix" -> ((s, dir) =>
      // triple-EMA rate of change: chained recursion (e2 folds the fresh
      // e1), one sequential sweep; recursive-CTE oracle with substituted
      // e1/e2 expressions
      Analytics.trix(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "cmo" -> ((s, dir) =>
      // Chande momentum: up/down 14-bar decimal frame sums off one lag
      // window (the vortex recipe), symmetric bounded oscillator
      Analytics.cmo(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "dpo" -> ((s, dir) =>
      // detrended price oscillator: displaced close minus the current
      // 20-bar SMA — one window, exact decimal frame sum
      Analytics.dpo(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "elder_ray" -> ((s, dir) =>
      // bull/bear power vs the EMA13 value line: the ema sweep carrying
      // high/low alongside; list_reduce oracle
      Analytics.elderRay(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "force_index" -> ((s, dir) =>
      // volume x close-change, EMA13-smoothed: exact decimal product
      // terms, unrounded EMA fold, list_reduce oracle
      Analytics.forceIndex(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "mass_index" -> ((s, dir) =>
      // range-expansion reversal bulge: chained double EMA9 of the range
      // (trix convention) + exact-decimal 25-bar ratio sum
      Analytics.massIndex(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "vwma" -> ((s, dir) =>
      // volume-weighted MA: exact decimal price x volume frame sums, one
      // division; the rolling sibling of vwap
      Analytics.vwma(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "ultimate_osc" -> ((s, dir) =>
      // Williams Ultimate: BP/TR averaged at 7/14/28 and blended 4:2:1;
      // six decimal frame sums on one window partitioning
      Analytics.ultimateOsc(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "coppock" -> ((s, dir) =>
      // Coppock curve: front-weighted WMA(10) of ROC14+ROC11 spelled as
      // ten integer-weighted lags over exact decimals — association-free
      Analytics.coppock(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "winnow_fingerprint" -> ((s, dir) =>
      // MOSS winnowing: per-window min k-gram hash via the packed-BIGINT
      // argmin; guarantees shared runs >= w+k-1 words share a fingerprint
      graft.ops.Dedup.winnowFingerprint(Tables.table(s, dir, "documents"))),
    "longest_repeat" -> ((s, dir) =>
      // ExactSubstr (Lee et al.): exact per-doc longest repeated token
      // span via distributed truncated-suffix order + adjacent LCP
      graft.ops.Dedup.longestRepeat(Tables.table(s, dir, "documents"))),
    "span_dedup" -> ((s, dir) =>
      // C4 line-dedup on fixed 10-word spans: first-occurrence keeper via
      // one packed-min aggregation, docs rewritten from surviving spans
      graft.ops.Dedup.spanDedup(Tables.table(s, dir, "documents"))),
    "exactsubstr_prune" -> ((s, dir) =>
      // ExactSubstr removal (Lee et al.): repeated-w-gram coverage ->
      // (doc,pos) anti-join -> doc rebuild; longest_repeat's ACTION
      graft.ops.Dedup.exactSubstrPrune(Tables.table(s, dir, "documents"))),
    "decontam_scrub" -> ((s, dir) =>
      // span-granular decontamination: benchmark-gram coverage scrubbed
      // from corpus docs (decontaminate drops docs; this keeps the rest)
      graft.ops.Dedup.spanScrub(
        Tables.table(s, dir, "documents"), col("source") === "src0")),
    "edit_join" -> ((s, dir) =>
      // FastSS deletion-neighborhood candidates + threshold-bounded
      // codegen Levenshtein verify; no cross product ever forms
      graft.ops.Fuzzy.editJoin(
        Tables.table(s, dir, "supplier"), "s_suppkey", "s_name")),
    "edit_cluster" -> ((s, dir) =>
      // entity resolution over the ED-1 pair graph: pointer-jumping CC
      // -> min-id keeper; every name returns, singletons keep themselves
      graft.ops.Fuzzy.editCluster(
        Tables.table(s, dir, "supplier"), "s_suppkey", "s_name")),
    "dsir_weights" -> ((s, dir) =>
      // DSIR importance weights: hashed unigram target/raw models, exact
      // decimal log-ratio sums, bounded feature table broadcast
      graft.ops.TextAnalysis.dsirWeights(
        Tables.table(s, dir, "documents"), col("lang") === "en")),
    "image_dedup" -> ((s, dir) =>
      // perceptual dHash near-dup: stub luma grid -> 63-bit dHash ->
      // pigeonhole banding -> Hamming verify -> pointer-jumping CC ->
      // min-id keeper (real-codec face spec-tested on generated PNGs)
      graft.ops.Dedup.imageDedup(Tables.table(s, dir, "documents"))),
    "video_dedup" -> ((s, dir) =>
      // per-frame stub dHash -> temporally-ALIGNED pigeonhole banding
      // (frame_idx in the join key) -> majority-of-aligned-frames verify
      // -> CC -> min-id keeper (real-codec face = Multimodal.frameDhash
      // over extracted frame images, spec-tested on PNG sequences)
      graft.ops.Dedup.videoDedup(Tables.table(s, dir, "documents"))),
    "classifier_score" -> ((s, dir) =>
      // the LogReg serving shape under deterministic hash pseudo-weights:
      // exact integer micro-unit z sums (order-free), one shared-libm
      // sigmoid, round-12 emission (trained-weight face is spec-tested)
      graft.ops.LogReg.pseudoScore(Tables.table(s, dir, "documents"))),
    "zorder_key" -> ((s, dir) =>
      // compaction-time Morton layout key: pure shift/and/or bit terms,
      // map-only whole-stage codegen, slice filter + 4-column pruning
      // pushed to the parquet scan
      Tables.table(s, dir, "lineitem")
        .where(col("l_shipdate") >= to_timestamp(lit("1995-03-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1995-04-01 00:00:00")))
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.ops.Layout.zorderKey(
            Seq(col("l_partkey").bitwiseAND(lit((1L << 21) - 1)),
              col("l_suppkey").bitwiseAND(lit((1L << 21) - 1))), 21)
            .as("zval"))),
    "zorder_skip" -> ((s, dir) =>
      // the layout win MEASURED: 64 equal "files" per layout, per-file
      // min/max boxes, and the file count a min/max-pruning reader must
      // touch for a centered 2-D box predicate — linear-by-x slabs
      // cannot prune on y, the z-order grid prunes on both
      graft.ops.Layout.zorderSkip(Tables.table(s, dir, "lineitem"),
        "l_partkey", "l_suppkey")),
    "hilbert_skip" -> ((s, dir) =>
      // the three-way layout decision: linear vs z-order vs HILBERT
      // (unrolled xy->d bit-twiddle as chained projections) under the
      // quadrant-aligned box AND the midline y band that straddles the
      // z-curve's seam — per-(layout, pred) file/row read counts
      graft.ops.Layout.curveSkip(Tables.table(s, dir, "lineitem"),
        "l_partkey", "l_suppkey")),
    "ccnet_buckets" -> ((s, dir) =>
      // CCNet head/middle/tail: per-lang ppl tercile ORDER STATISTICS off
      // the value histogram, lang-dim cutoffs broadcast back
      graft.ops.LmScore.ccnetBuckets(Tables.table(s, dir, "documents"))),
    "drift_psi" -> ((s, dir) =>
      // population stability index of order values, pre-1998 reference vs
      // after: equal-width global bins, exact-decimal term sums
      graft.ops.Dq.psiDrift(Tables.table(s, dir, "orders"), "o_totalprice",
        col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))),
    "stoch_rsi" -> ((s, dir) =>
      // StochRSI: the %K normalization over the window-form RSI; the
      // min/max frame stacks on the same partitioning, no extra shuffle
      Analytics.stochRsi(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "emv" -> ((s, dir) =>
      // Arms Ease of Movement: midpoint advance per unit volume — pure
      // integer micro-unit pipeline, no engine round() anywhere
      Analytics.emv(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "chandelier_exit" -> ((s, dir) =>
      // ATR-scaled trailing stops off the 22-bar extremes; exact decimal
      // TR sums, pick extremes, fixed-order stop arithmetic
      Analytics.chandelierExit(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "tsi" -> ((s, dir) =>
      // Blau's True Strength Index: chained double-EMA of momentum and
      // |momentum| in one four-state sweep; recursive-CTE oracle
      Analytics.tsi(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "fisher_transform" -> ((s, dir) =>
      // Ehlers Fisher transform: range position + two damped recursions
      // in one sweep with an n-deep midpoint ring (no post-sweep window)
      Analytics.fisherTransform(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "alligator" -> ((s, dir) =>
      // Williams alligator: three SMMA folds + forward displacement via
      // shift-deep rings, all in ONE sweep
      Analytics.alligator(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "fractals" -> ((s, dir) =>
      // Bill Williams swing points: strict 2-side high/low comparisons on
      // one symbol window — pure exact-price logic, no float hazards
      Analytics.fractals(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "awesome_osc" -> ((s, dir) =>
      // SMA5(mid) - SMA34(mid) with the /2 and /n folded into two double
      // divisions of exact decimal high+low frame sums
      Analytics.awesomeOsc(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "kst" -> ((s, dir) =>
      // Pring's Know Sure Thing: four smoothed ROC horizons blended
      // 1:2:3:4 — all lags and frames on ONE symbol partitioning
      Analytics.kst(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "rvi" -> ((s, dir) =>
      // Relative Vigor Index: the /6 cancels in the ratio so both SWMA
      // frame sums stay exact decimals; signal line on rounded doubles
      Analytics.rvi(Candles.fromTrades(Tables.trades(s, dir), Tf1h))),
    "event_transitions2" -> ((s, dir) =>
      // second-order Markov transitions: P(next | two previous events) —
      // both lags in one user window, dim-scale conditional shares
      graft.ops.Events.transitions2(Tables.events(s, dir))),
    "cross_source_dups" -> ((s, dir) =>
      // cross-source duplication matrix: shared exact contents per source
      // pair via one content-hash equi-join over the cut distinct frame
      graft.ops.Dedup.crossSourceDups(Tables.table(s, dir, "documents"))),
    "source_minhash" -> ((s, dir) =>
      // sketch-cost source overlap: per-source signature = element-wise
      // MIN of doc MinHash sigs (min commutes with set union), pair
      // Jaccard estimated from sources×numPerm frames — aggregation
      // cost where cross_source_dups pays an every-content-hash join
      graft.ops.Dedup.sourceMinhash(Tables.table(s, dir, "documents"))),
    "skew_report" -> ((s, dir) =>
      // hot-key pre-flight for the salted join: one map-side-combined
      // count agg + broadcast stats + TakeOrdered top-10
      graft.ops.Dq.skewReport(Tables.events(s, dir), "user_id")),
    "hybrid_rrf" -> ((s, dir) =>
      // reciprocal-rank fusion of the BM25 and exact-cosine rankings;
      // both branches rank-bounded before the ≤2n-row fusion join
      graft.ops.Retrieval.hybridRrf(Tables.table(s, dir, "documents"),
        Tables.table(s, dir, "embeddings"), Seq("spark", "join", "data"), 3L)),
    "mmr_rerank" -> ((s, dir) => {
      // MMR diversification of exact top-8 candidates, 4 greedy steps as
      // per-step broadcast joins + max_by aggs — state is a frame
      val e = Tables.table(s, dir, "embeddings")
      graft.ops.Retrieval.mmrRerank(s, e, e.where(col("vec_id") < 3))
    }),
    "embedding_outliers" -> ((s, dir) =>
      // per-cell centroid-cosine z-score screen: the anti-prototype drop
      // (SemDeDup's complement); one assignment scan, broadcast moments
      graft.ops.Ivf.embeddingOutliers(Tables.table(s, dir, "embeddings"))),
    "centroid_drift" -> ((s, dir) =>
      // nightly index health: prior-snapshot model refined once over the
      // full corpus; per-cell centroid cosine + assignment churn
      graft.ops.Ivf.centroidDrift(Tables.table(s, dir, "embeddings"))),
    "ann_sq8" -> ((s, dir) => {
      // scalar-quantized (1 byte/dim) asymmetric search: raw query vs
      // SQ8-reconstructed corpus — the 8x working-set cut between the
      // flat index and PQ; codec = 2·d corpus min/max stats
      val e = Tables.table(s, dir, "embeddings")
      graft.ops.Sq.searchTopK(e, e.where(col("vec_id") < 10), 5)
    }),
    "mad_outliers" -> ((s, dir) => {
      // robust per-type outlier flags: |x − median| > 3·MAD — the
      // z-score family (clip_outliers) breaks under fat tails;
      // median/MAD have a 50% breakdown point. TWO dim-scale grouped
      // EXACT percentiles (Spark `percentile` == DuckDB `quantile_cont`,
      // the quality_prune parity), each broadcast back; the flag itself
      // is map-only. At unbounded distinct-value scale swap in
      // `approx_percentile` (value_percentiles' path) — the oracle pins
      // the exact form. Rounded to 6 before every compare.
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val med = ev.groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5D)"), 6).as("med"))
      val withMed = ev.join(broadcast(med), Seq("event_type"))
        .withColumn("adev", round(abs(col("value") - col("med")), 6))
      val mad = withMed.groupBy(col("event_type"))
        .agg(round(expr("percentile(adev, 0.5D)"), 6).as("mad"))
      withMed.join(broadcast(mad), Seq("event_type"))
        .select(col("event_id"), col("event_type"), col("value"),
          col("med"), col("mad"), (col("adev") > col("mad") * 3).as("outlier"))
    }),
    "embedding_covariance" -> ((s, dir) => {
      // upper-triangular covariance of the embedding dims over values
      // QUANTIZED to 1e-6 by floor — every intermediate is an exact
      // integer, so any engine replays bit-identically (the
      // oracle-replayable face of Pca.train; the treeAggregate
      // accumulator there is the 100 TB path — this explode+self-join
      // shuffles n·d(d+1)/2 skinny rows and exists for replayability;
      // PcaSpec pins the two against each other). Per (i,j) group,
      // sum(xq) IS Σᵥx_{v,i} (each vector contributes once), so the
      // means come from the same aggregation — no second pass.
      val e = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>")))
        .toDF("vec_id", "i", "x")
        .select(col("vec_id"), col("i").cast("long").as("i"),
          floor(col("x") * lit(1000000)).cast("long").as("xq"))
      e.join(e.select(col("vec_id"), col("i").as("j"), col("xq").as("yq")),
          Seq("vec_id"))
        .where(col("i") <= col("j"))
        .groupBy(col("i"), col("j"))
        .agg(sum(col("xq") * col("yq")).as("sp"),
          sum(col("xq")).as("si"), sum(col("yq")).as("sj"),
          count(lit(1)).as("n"))
        .select(col("i"), col("j"),
          // + 0.0 folds IEEE −0.0 (a possible rounding output) to +0.0,
          // same normalization on the oracle side
          (round((col("sp").cast("double") / col("n") -
            (col("si").cast("double") / col("n")) *
            (col("sj").cast("double") / col("n"))) / lit(1000000000000.0), 6)
            + lit(0.0)).as("cov"))
    }),
    "semantic_incremental" -> ((s, dir) => {
      // nightly-crawl screening on the embedding side: the vec_id%10==0
      // batch vs the rest of the corpus — quantizer trained on the
      // corpus, each cell contributes a hash-sampled <=maxCell screen
      // set that BROADCASTS to the batch
      val e = Tables.table(s, dir, "embeddings")
      graft.ops.Ivf.incrementalSemantic(
        e.where(col("vec_id") % 10 === 0), e.where(col("vec_id") % 10 =!= 0))
    }),
    "mix_rebalance" -> ((s, dir) =>
      // uniform-token-share rebalancing: derived per-lang rates + the
      // deterministic hash keep decision (mix_report's executable sibling)
      graft.ops.TextAnalysis.mixRebalance(Tables.table(s, dir, "documents"))),
    "mix_temperature" -> ((s, dir) =>
      // temperature mix sampling (shares ∝ share^(1/T), T=2): the smooth
      // low-resource boost between proportional (T=1) and uniform (T=∞)
      graft.ops.TextAnalysis.mixTemperature(Tables.table(s, dir, "documents"))),
    "corpus_split" -> ((s, dir) =>
      // deterministic train/val/test assignment via the portable content
      // hash — stable across runs/engines/partitionings, map-only
      graft.ops.TextAnalysis.corpusSplit(Tables.table(s, dir, "documents"))),
    "quality_prune" -> ((s, dir) =>
      // per-language quality-quantile pruning: a global threshold would
      // evict whole low-resource languages; thresholds broadcast back
      graft.ops.TextAnalysis.qualityPrune(Tables.table(s, dir, "documents"))),
    "budget_sample" -> ((s, dir) =>
      // fixed token budget per language: deterministic hash shuffle + the
      // distributed two-pass prefix scan (same primitive as pack_plan)
      graft.ops.TextAnalysis.budgetSample(Tables.table(s, dir, "documents"))),
    "domain_cap" -> ((s, dir) =>
      // C4/RefinedWeb-style per-domain doc cap: each source keeps its
      // top-15 quality docs via the bounded per-source TopKByScore heap
      graft.ops.TextAnalysis.domainCap(Tables.table(s, dir, "documents"))),
    "domain_cap_tokens" -> ((s, dir) =>
      // token-budget flavor: hash-ordered prefix per source through the
      // distributed two-pass scan (budget_sample's stratum -> source)
      graft.ops.TextAnalysis.domainCapTokens(Tables.table(s, dir, "documents"))),
    "bm25_search" -> ((s, dir) =>
      // BM25 ranked retrieval (contamination sweeps / targeted sourcing):
      // broadcast query-term postings, dim-scale df/N/avgdl, exact
      // decimal per-doc score sums, TakeOrdered top-k
      graft.ops.Bm25.search(Tables.table(s, dir, "documents"),
        Seq("spark", "join", "data"))),
    "lm_perplexity" -> ((s, dir) =>
      // CCNet-style reference-LM quality filter: add-one bigram LM
      // trained on the src0 slice, every doc scored by cross-entropy
      // under it (OOV folded to <unk>); counts stay in frames — two
      // token-key joins, never a broadcast model
      graft.ops.LmScore.lmPerplexity(Tables.table(s, dir, "documents"))),
    "vocab_coverage" -> ((s, dir) =>
      // tokenizer-budget curve: fraction of corpus tokens covered by the
      // top-V types for a ladder of V — one term shuffle + a TakeOrdered,
      // exact integer folds over one collected sorted array
      graft.ops.TextAnalysis.vocabCoverage(Tables.table(s, dir, "documents"))),
    "split_leakage" -> ((s, dir) =>
      // eval-hygiene audit: near-dup pairs straddling the train/val/test
      // boundary — split recomputed as a pure expression on both pair ids
      graft.ops.TextAnalysis.splitLeakage(Tables.table(s, dir, "documents"))),
    "chunk_plan" -> ((s, dir) =>
      // RAG chunker layout: overlapped token windows per doc, map-only
      // explode into per-chunk work items (framesample's text sibling)
      graft.ops.TextAnalysis.chunkPlan(Tables.table(s, dir, "documents"))),
    "pq_encode" -> ((s, dir) =>
      graft.ops.Ivf.pqEncode(Tables.table(s, dir, "embeddings"))),
    "pq_search" -> ((s, dir) => {
      val e = Tables.table(s, dir, "embeddings")
      graft.ops.Ivf.pqSearch(e, e.where(col("vec_id") < 10), 5)
    }),
    "ivfpq_encode" -> ((s, dir) =>
      // IVF-PQ residual index build: coarse cell id + PQ codes of the
      // residual (v - centroid[cid]) in one fused map-only pass
      graft.ops.Ivf.ivfPqEncode(Tables.table(s, dir, "embeddings"))),
    "ann_ivfpq" -> ((s, dir) => {
      // IVF-PQ serving scan: probe nprobe cells, ADC over the residual
      // reconstruction — cell pruning x compressed scoring in one index
      val e = Tables.table(s, dir, "embeddings")
      graft.ops.Ivf.ivfPqSearch(e, e.where(col("vec_id") < 10), 5)
    }),
    "ann_ivfpq_rerank" -> ((s, dir) => {
      // ADC top-k' (k' = 4k) -> bounded raw-vector gather -> exact-cosine
      // re-rank keeping top-k: the standard compressed-serving last mile
      val e = Tables.table(s, dir, "embeddings")
      graft.ops.Ivf.ivfPqSearchRerank(e, e.where(col("vec_id") < 10), 5)
    }),
    "ann_filtered" -> ((s, dir) => {
      // metadata-predicate ANN: top-k WHERE label = 7 with the predicate
      // INSIDE the candidate scan (pushed to the corpus parquet read) and
      // the rescue pass guaranteeing k rows wherever >= k survivors exist
      // — post-filtering the unfiltered top-k would silently underfill.
      // k=10 over ~50 survivors across 16 cells so the oracle exercises
      // BOTH phases (some probes underfill, some don't)
      val e = Tables.table(s, dir, "embeddings")
      graft.ops.Ivf.searchTopKFiltered(e, e.where(col("vec_id") < 10), 10,
        col("label") === 7, iters = 0)
    }),
    "ann_filtered_pq" -> ((s, dir) => {
      // the compressed-index sibling: predicate filters the ENCODED frame
      // with the metadata CARRIED THROUGH the map-only encode
      // (passthrough — the r11 measured re-plan: joining the metadata
      // onto the index rows afterwards costs a corpus-scale vec_id
      // equi-join for rows the encode scan already had in hand), probe +
      // rescue both score ADC reconstructions
      val e = Tables.table(s, dir, "embeddings")
      val cents = graft.ops.Ivf.train(e, 16, 1)
      val enc = graft.ops.Ivf.ivfPqReconFrame(e, cents,
        passthrough = Seq("label"))
      graft.ops.Ivf.ivfPqSearchFilteredWith(enc, cents,
        e.where(col("vec_id") < 10), 10, col("label") === 7)
    }),
    "multimodal_meta" -> ((s, dir) =>
      graft.ops.Multimodal.meta(Tables.table(s, dir, "documents"))),
    "multimodal_decode" -> ((s, dir) =>
      graft.ops.Multimodal.decodeStub(Tables.table(s, dir, "documents"))),
    "multimodal_framesample" -> ((s, dir) =>
      graft.ops.Multimodal.frameSample(Tables.table(s, dir, "documents"))),
    "profile_lineitem" -> ((s, dir) =>
      // single-pass data-quality profile (rows-only: HLL estimates inside)
      graft.ops.Profile.profile(Tables.table(s, dir, "lineitem"))),
    "dq_check" -> ((s, dir) => {
      // declarative constraint suite in ONE aggregation pass (Deequ idea):
      // integer-counter verdicts, one double division per metric. The
      // uniqueness check is a REAL violation in this corpus - the report
      // proves the suite detects, not just rubber-stamps.
      import graft.ops.Dq
      Dq.check(Tables.table(s, dir, "lineitem"), Seq(
        Dq.minRows(1L),
        Dq.complete("l_shipdate"),
        Dq.unique(Seq("l_orderkey", "l_linenumber")),
        Dq.inRange("l_quantity", 1.0, 50.0),
        Dq.inRange("l_discount", 0.0, 0.1),
        Dq.inRange("l_tax", 0.0, 0.08),
        Dq.inRange("l_extendedprice", 1.0, 100000000.0),
        Dq.inSet("l_returnflag", Seq("A", "N", "R")),
        Dq.inSet("l_linestatus", Seq("O", "F"))))
    }),
    "profile_approx" -> ((s, dir) => {
      // the HLL-sketch profile path (the 100 TB default — fixed-size
      // sketches instead of the Expand row multiplication) surfaced as its
      // accuracy contract: every per-column estimate within 5% of exact.
      // rsd=0.01 makes 5% a ~5 sigma bound, deterministic given the data.
      val li = Tables.table(s, dir, "lineitem")
      val ap = graft.ops.Profile.profile(li, exactDistinct = false, rsd = 0.01)
        .select(col("column"), col("n_distinct").as("n_approx"))
      val ex = graft.ops.Profile.profile(li)
        .select(col("column"), col("n_rows"), col("n_null"),
          col("n_distinct").as("n_exact"))
      ex.join(ap, "column")
        .select(col("column"), col("n_rows"), col("n_null"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact")).cast("double") <=
            lit(0.05) * col("n_exact")).as("approx_ok"))
    })
  )

  /** TPC-H style revenue aggregate: exact decimal partial sums. */
  private def revenue = {
    val d = DecimalType(18, 2)
    sum(col("l_extendedprice").cast(d) *
      (lit(1).cast(d) - col("l_discount").cast(d))).cast("double")
  }

  // ---- oracles -------------------------------------------------------------

  def oracleSql: Map[String, String] = Map(
    "ohlcv_1m" -> withTrades(candlesSql(60000000L)),
    "ohlcv_5m" -> withTrades(candlesSql(300000000L)),
    "ohlcv_1d" -> withTrades(
      "SELECT symbol, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_ts, " +
        "min_by(price, ts) AS open, max(price) AS high, min(price) AS low, " +
        "max_by(price, ts) AS close, " +
        "CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS volume, " +
        "count(*) AS trades FROM t GROUP BY 1, 2"),
    "ohlcv_1M" -> withTrades(
      "SELECT symbol, CAST(date_trunc('month', ts) AS TIMESTAMP) AS bucket_ts, " +
        "min_by(price, ts) AS open, max(price) AS high, min(price) AS low, " +
        "max_by(price, ts) AS close, " +
        "CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS volume, " +
        "count(*) AS trades FROM t GROUP BY 1, 2"),
    "ema" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "l AS (SELECT symbol, bucket_ts, close, " +
        "list(close) OVER (PARTITION BY symbol ORDER BY bucket_ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS closes FROM c) " +
        "SELECT symbol, bucket_ts, close, " +
        "round(list_reduce(closes, (acc, x) -> " +
        "(CAST(2 AS DOUBLE) / CAST(21 AS DOUBLE)) * x + " +
        "(CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE) / CAST(21 AS DOUBLE)) * acc), 6) AS ema FROM l"),
    "atr" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "p AS (SELECT symbol, bucket_ts, high, low, close, " +
        "lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS prev_close FROM c), " +
        "d AS (SELECT symbol, bucket_ts, greatest(" +
        "CAST(high AS DECIMAL(18,2)) - CAST(low AS DECIMAL(18,2)), " +
        "abs(CAST(high AS DECIMAL(18,2)) - CAST(prev_close AS DECIMAL(18,2))), " +
        "abs(CAST(low AS DECIMAL(18,2)) - CAST(prev_close AS DECIMAL(18,2)))) AS tr " +
        "FROM p WHERE prev_close IS NOT NULL), " +
        "f AS (SELECT symbol, bucket_ts, CAST(tr AS DOUBLE) AS tr, " +
        "CAST(sum(tr) OVER w AS DOUBLE) AS sum_tr, count(*) OVER w AS cnt FROM d " +
        "WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)) " +
        "SELECT symbol, bucket_ts, tr, round(sum_tr / CAST(cnt AS DOUBLE), 6) AS atr FROM f WHERE cnt = 14"),
    "symbol_correlations" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "r AS (SELECT symbol, bucket_ts, (close - prev_close) / prev_close AS ret FROM (" +
        "SELECT symbol, bucket_ts, close, lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS prev_close FROM c) " +
        "WHERE prev_close IS NOT NULL) " +
        "SELECT a.symbol AS sym1, b.symbol AS sym2, " +
        "round(corr(a.ret, b.ret), 6) AS corr_ret, count(*) AS n_overlap " +
        "FROM r a JOIN r b ON a.bucket_ts = b.bucket_ts AND a.symbol < b.symbol " +
        "GROUP BY 1, 2"),
    // lead-lag replay: same rounded returns, same one-window shift
    // columns, same five corr aggregates in one pass
    "lead_lag" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "r0 AS (SELECT symbol, bucket_ts, close, " +
        "lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS prev_close FROM c), " +
        "r AS (SELECT symbol, bucket_ts, round((close - prev_close) / " +
        "(CASE WHEN prev_close <> 0 THEN prev_close END), 6) AS ret FROM r0 " +
        "WHERE prev_close IS NOT NULL AND prev_close <> 0), " +
        "rl AS (SELECT symbol, bucket_ts, ret, " +
        "lag(ret, 2) OVER w AS ret_m2, lag(ret, 1) OVER w AS ret_m1, " +
        "lead(ret, 1) OVER w AS ret_p1, lead(ret, 2) OVER w AS ret_p2 " +
        "FROM r WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts)) " +
        "SELECT a.symbol AS sym1, b.symbol AS sym2, count(*) AS n_overlap, " +
        "round(corr(a.ret, b.ret_m2), 6) AS corr_m2, " +
        "round(corr(a.ret, b.ret_m1), 6) AS corr_m1, " +
        "round(corr(a.ret, b.ret), 6) AS corr_0, " +
        "round(corr(a.ret, b.ret_p1), 6) AS corr_p1, " +
        "round(corr(a.ret, b.ret_p2), 6) AS corr_p2 " +
        "FROM r a JOIN rl b ON a.bucket_ts = b.bucket_ts AND a.symbol < b.symbol " +
        "GROUP BY 1, 2"),
    // pair-spread replay: exact-decimal OLS co-moments (width-19 casts
    // force DuckDB's INT128 multiplies), beta/spread/z in identical
    // double op order, guarded divisors
    "pair_spread" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "p0 AS (SELECT symbol, bucket_ts, CAST(close AS DECIMAL(18,2)) AS cl FROM c), " +
        "pr AS (SELECT a.symbol AS sym1, b.symbol AS sym2, a.bucket_ts, a.cl AS c1, b.cl AS c2 " +
        "FROM p0 a JOIN p0 b ON a.bucket_ts = b.bucket_ts AND a.symbol < b.symbol), " +
        "ols AS (SELECT sym1, sym2, count(*) AS n, CAST(sum(c1) AS DOUBLE) AS sy, " +
        "CAST(sum(c2) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(CAST(c2 AS DECIMAL(19,2)) * c2 AS DECIMAL(38,4))) AS DOUBLE) AS sxx, " +
        "CAST(sum(CAST(CAST(c2 AS DECIMAL(19,2)) * c1 AS DECIMAL(38,4))) AS DOUBLE) AS sxy " +
        "FROM pr GROUP BY 1, 2), " +
        "bt AS (SELECT sym1, sym2, (CAST(n AS DOUBLE) * sxy - sx * sy) / " +
        "(CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx <> 0 THEN CAST(n AS DOUBLE) * sxx - sx * sx END) AS beta FROM ols), " +
        "sp AS (SELECT pr.sym1, pr.sym2, pr.bucket_ts, bt.beta, " +
        "round(CAST(pr.c1 AS DOUBLE) - bt.beta * CAST(pr.c2 AS DOUBLE), 6) AS spread " +
        "FROM pr JOIN bt ON pr.sym1 = bt.sym1 AND pr.sym2 = bt.sym2), " +
        "ss AS (SELECT sym1, sym2, count(spread) AS sn, " +
        "CAST(sum(CAST(spread AS DECIMAL(18,6))) AS DOUBLE) AS ss1, " +
        "CAST(sum(CAST(CAST(spread AS DECIMAL(19,6)) * CAST(spread AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS DOUBLE) AS ss2 " +
        "FROM sp GROUP BY 1, 2) " +
        "SELECT sp.sym1, sp.sym2, sp.bucket_ts, round(sp.beta, 6) AS beta, sp.spread, " +
        "round((sp.spread - ss1 / sn) / (CASE WHEN (CASE WHEN sn > 1 THEN " +
        "(ss2 - sn * (ss1 / sn) * (ss1 / sn)) / (sn - 1) END) > 0 THEN " +
        "sqrt((ss2 - sn * (ss1 / sn) * (ss1 / sn)) / (sn - 1)) END), 6) AS zscore " +
        "FROM sp JOIN ss ON sp.sym1 = ss.sym1 AND sp.sym2 = ss.sym2"),
    "rolling_corr" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "r AS (SELECT symbol, bucket_ts, (close - prev_close) / prev_close AS ret FROM (" +
        "SELECT symbol, bucket_ts, close, lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS prev_close FROM c) " +
        "WHERE prev_close IS NOT NULL), " +
        "p AS (SELECT a.symbol AS sym1, b.symbol AS sym2, a.bucket_ts, " +
        "a.ret AS ret1, b.ret AS ret2 " +
        "FROM r a JOIN r b ON a.bucket_ts = b.bucket_ts AND a.symbol < b.symbol), " +
        "f AS (SELECT sym1, sym2, bucket_ts, count(*) OVER w AS cnt, " +
        "round(corr(ret1, ret2) OVER w, 6) AS rolling_corr FROM p " +
        "WINDOW w AS (PARTITION BY sym1, sym2 ORDER BY bucket_ts ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)) " +
        "SELECT sym1, sym2, bucket_ts, rolling_corr FROM f WHERE cnt = 24"),
    "heikin_ashi" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "w AS (SELECT symbol, bucket_ts, open, high, low, close, " +
        "(open + high + low + close) / 4.0 AS hac, " +
        "first_value(open) OVER ws AS fo, first_value(close) OVER ws AS fc, " +
        "list((open + high + low + close) / 4.0) OVER " +
        "(PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hcs " +
        "FROM c WINDOW ws AS (PARTITION BY symbol ORDER BY bucket_ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), " +
        "h AS (SELECT symbol, bucket_ts, high, low, hac, " +
        "list_reduce(list_prepend((fo + fc) / 2.0, coalesce(hcs, [])), " +
        "(acc, x) -> (acc + x) / 2.0) AS hao FROM w) " +
        "SELECT symbol, bucket_ts, round(hao, 6) AS ha_open, " +
        "round(greatest(high, greatest(hao, hac)), 6) AS ha_high, " +
        "round(least(low, least(hao, hac)), 6) AS ha_low, " +
        "round(hac, 6) AS ha_close FROM h"),
    "max_drawdown" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "p AS (SELECT symbol, bucket_ts, close, " +
        "max(close) OVER (PARTITION BY symbol ORDER BY bucket_ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak FROM c), " +
        "d AS (SELECT symbol, round((close - peak) / peak, 6) AS drawdown, peak FROM p) " +
        "SELECT symbol, min(drawdown) AS max_drawdown, max(peak) AS peak_close " +
        "FROM d GROUP BY 1"),
    // ADL replay: rounded CLV in DECIMAL(9,6) x volume in exact decimals
    // (the width-19 volume cast forces DuckDB's INT128 multiply), running
    // sum exact, surfaced double; zero-range candles contribute literal 0
    "adl" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "m AS (SELECT symbol, bucket_ts, " +
        "CAST(CAST(COALESCE(round(((close - low) - (high - close)) / " +
        "(CASE WHEN high <> low THEN high - low END), 6), 0.0) AS DECIMAL(9,6)) * " +
        "CAST(volume AS DECIMAL(19,2)) AS DECIMAL(28,8)) AS mfv FROM c) " +
        "SELECT symbol, bucket_ts, CAST(sum(mfv) OVER (PARTITION BY symbol ORDER BY bucket_ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS adl FROM m"),
    // Chaikin oscillator replay: the adl CTEs, then BOTH EMA recursions
    // as scalar-double list_reduce folds (safe, unlike struct
    // accumulators) over the per-symbol running list; alpha literals
    // spelled exactly as the sweep computes them
    "chaikin_osc" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "m AS (SELECT symbol, bucket_ts, " +
        "CAST(CAST(COALESCE(round(((close - low) - (high - close)) / " +
        "(CASE WHEN high <> low THEN high - low END), 6), 0.0) AS DECIMAL(9,6)) * " +
        "CAST(volume AS DECIMAL(19,2)) AS DECIMAL(28,8)) AS mfv FROM c), " +
        "ad AS (SELECT symbol, bucket_ts, CAST(sum(mfv) OVER (PARTITION BY symbol ORDER BY bucket_ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS adl FROM m), " +
        "l AS (SELECT symbol, bucket_ts, adl, list(adl) OVER (PARTITION BY symbol ORDER BY bucket_ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ls FROM ad) " +
        "SELECT symbol, bucket_ts, adl, " +
        "round(list_reduce(ls, (acc, x) -> 0.5 * x + 0.5 * acc) - " +
        "list_reduce(ls, (acc, x) -> (2.0 / 11.0) * x + (1.0 - 2.0 / 11.0) * acc), 6) AS chaikin_osc FROM l"),
    "obv" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "p AS (SELECT symbol, bucket_ts, close, volume, " +
        "lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS prev FROM c), " +
        "d AS (SELECT symbol, bucket_ts, CASE " +
        "WHEN prev IS NULL OR CAST(close AS DECIMAL(18,2)) - CAST(prev AS DECIMAL(18,2)) = CAST(0 AS DECIMAL(18,2)) THEN CAST(0 AS DECIMAL(18,2)) " +
        "WHEN CAST(close AS DECIMAL(18,2)) - CAST(prev AS DECIMAL(18,2)) > CAST(0 AS DECIMAL(18,2)) THEN CAST(volume AS DECIMAL(18,2)) " +
        "ELSE -CAST(volume AS DECIMAL(18,2)) END AS signed_vol FROM p) " +
        "SELECT symbol, bucket_ts, CAST(sum(signed_vol) OVER (PARTITION BY symbol ORDER BY bucket_ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS obv FROM d"),
    "resume_since" -> withTrades(
      s"SELECT symbol, max(bucket_ts) AS last_ts FROM (${candlesSql(60000000L)}) GROUP BY 1"),
    "incremental_fetch" -> withTrades(
      ", resume AS (SELECT symbol, max(epoch_us(ts)) - 259200000000 AS since_us FROM t GROUP BY 1), " +
        "f AS (SELECT t.symbol, t.ts, t.price, t.qty FROM t JOIN resume r ON t.symbol = r.symbol " +
        "WHERE epoch_us(t.ts) > r.since_us) " +
        candlesSql(3600000000L, "f")),
    "candle_upsert" -> withTrades(
      ", t1 AS (SELECT * FROM t WHERE ts < TIMESTAMP '2024-01-20 00:00:00'), " +
        "t2 AS (SELECT * FROM t WHERE ts >= TIMESTAMP '2024-01-12 00:00:00'), " +
        s"c1 AS (${candlesSql(3600000000L, "t1")}), " +
        s"c2 AS (${candlesSql(3600000000L, "t2")}) " +
        "SELECT * FROM c2 UNION ALL " +
        "SELECT c1.* FROM c1 WHERE NOT EXISTS " +
        "(SELECT 1 FROM c2 WHERE c2.symbol = c1.symbol AND c2.bucket_ts = c1.bucket_ts)"),
    "incomplete_drop" -> withTrades(
      s"SELECT * FROM (${candlesSql(3600000000L)}) " +
        "WHERE make_timestamp(epoch_us(bucket_ts) + 3600000000) <= TIMESTAMP '2024-01-30 23:00:00'"),
    "gap_detect" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}) " +
        "SELECT symbol, bucket_ts AS gap_start, next_ts AS gap_end, " +
        "CAST((epoch_us(next_ts) - epoch_us(bucket_ts)) / 3600000000 - 1 AS BIGINT) AS missing " +
        "FROM (SELECT symbol, bucket_ts, lead(bucket_ts) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS next_ts FROM c) " +
        "WHERE next_ts IS NOT NULL AND epoch_us(next_ts) - epoch_us(bucket_ts) > 3600000000"),
    "vwap" -> withTrades(
      "SELECT symbol, day, sum_pv / sum_qty AS vwap, sum_qty FROM (" +
        "SELECT symbol, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, " +
        "CAST(sum(CAST(price AS DECIMAL(18,2)) * CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS sum_pv, " +
        "CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM t GROUP BY 1, 2) WHERE sum_qty > 0"),
    "sma" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}) " +
        "SELECT symbol, bucket_ts, close, " +
        "CAST(sum(CAST(close AS DECIMAL(18,2))) OVER w AS DOUBLE) / CAST(count(*) OVER w AS DOUBLE) AS sma " +
        "FROM c WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)"),
    "returns" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}) " +
        "SELECT symbol, bucket_ts, close, prev_close, (close - prev_close) / prev_close AS ret FROM (" +
        "SELECT symbol, bucket_ts, close, lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS prev_close FROM c) " +
        "WHERE prev_close IS NOT NULL"),
    "mtf_context" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "d AS (SELECT symbol, CAST(date_trunc('day', bucket_ts) AS TIMESTAMP) AS day, " +
        "min_by(open, bucket_ts) AS d_open, max(high) AS d_high, min(low) AS d_low, " +
        "max_by(close, bucket_ts) AS d_close, " +
        "CAST(sum(CAST(volume AS DECIMAL(18,2))) AS DOUBLE) AS d_volume " +
        "FROM c GROUP BY 1, 2) " +
        "SELECT c.symbol, c.bucket_ts, c.close, d_open, d_high, d_low, d_close, d_volume, " +
        "round((c.close - d_low) / (CASE WHEN d_high <> d_low THEN d_high - d_low END), 6) AS day_range_pos " +
        "FROM c JOIN d ON c.symbol = d.symbol AND CAST(date_trunc('day', c.bucket_ts) AS TIMESTAMP) = d.day"),
    "drawdown_curve" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}) " +
        "SELECT symbol, bucket_ts, close, max(close) OVER w AS peak, " +
        "round((close - max(close) OVER w) / (CASE WHEN max(close) OVER w <> 0 THEN max(close) OVER w END), 6) AS drawdown, " +
        "close < max(close) OVER w AS underwater FROM c " +
        "WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"),
    // rangeVolatility replay: rounded log terms squared in exact
    // DECIMAL(18,12) sums; literal 4*ln2 / 2*ln2-1 constants so no
    // engine's libm ln(2) enters the compare
    "range_vol" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "xy AS (SELECT symbol, " +
        "CAST(round(ln(high / low), 6) AS DECIMAL(9,6)) AS x, " +
        "CAST(round(ln(close / open), 6) AS DECIMAL(9,6)) AS y " +
        "FROM c WHERE high > 0 AND low > 0 AND close > 0 AND open > 0), " +
        "agg AS (SELECT symbol, count(*) AS n, " +
        "CAST(sum(CAST(x * x AS DECIMAL(18,12))) AS DOUBLE) AS sx2, " +
        "CAST(sum(CAST(y * y AS DECIMAL(18,12))) AS DOUBLE) AS sy2 " +
        "FROM xy GROUP BY 1) " +
        "SELECT symbol, n, " +
        "round(sqrt(sx2 / n / 2.772588722239781), 6) AS parkinson, " +
        "round(sqrt(greatest(0.5 * (sx2 / n) - 0.3862943611198906 * (sy2 / n), 0.0)), 6) AS garman_klass " +
        "FROM agg"),
    // tick-rule replay: lag -> tick sign -> IGNORE NULLS carry-forward ->
    // bucketed exact-decimal volume sums; the imbalance ratio is one double
    // division on those exact sums
    "tick_rule" -> withTrades(
      ", x AS (SELECT symbol, ts, price, qty, " +
        "lag(price) OVER (PARTITION BY symbol ORDER BY ts) AS pp FROM t), " +
        "y AS (SELECT symbol, ts, qty, CASE WHEN price > pp THEN 1 " +
        "WHEN price < pp THEN -1 END AS tick FROM x), " +
        "z AS (SELECT symbol, ts, qty, last_value(tick IGNORE NULLS) OVER (" +
        "PARTITION BY symbol ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS side FROM y), " +
        "g AS (SELECT symbol, make_timestamp(epoch_us(ts) - epoch_us(ts) % 3600000000) AS bucket_ts, " +
        "CAST(sum(CASE WHEN side = 1 THEN CAST(qty AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS buy_qty, " +
        "CAST(sum(CASE WHEN side = -1 THEN CAST(qty AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS sell_qty, " +
        "CAST(sum(CASE WHEN side IS NULL THEN CAST(qty AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS unclassified_qty, " +
        "count(*) AS n_trades FROM z GROUP BY 1, 2) " +
        "SELECT symbol, bucket_ts, buy_qty, sell_qty, unclassified_qty, n_trades, " +
        "round((buy_qty - sell_qty) / (CASE WHEN buy_qty + sell_qty <> 0 THEN buy_qty + sell_qty END), 6) AS imbalance FROM g"),
    // volume-clock replay: exact BIGINT pre-trade cumulative, integer bar
    // division, the candle picks on the unique per-symbol ts
    "volume_bars" -> withTrades(
      ", x AS (SELECT symbol, ts, price, qty, " +
        "COALESCE(CAST(sum(CAST(qty AS BIGINT)) OVER (PARTITION BY symbol ORDER BY ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_prev FROM t) " +
        "SELECT symbol, CAST(cum_prev // 500 AS BIGINT) AS bar_id, min(ts) AS start_ts, max(ts) AS end_ts, " +
        "min_by(price, ts) AS open, max(price) AS high, min(price) AS low, " +
        "max_by(price, ts) AS close, " +
        "CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS volume, " +
        "count(*) AS n_trades FROM x GROUP BY 1, 2"),
    // VPIN replay: tick-rule signing + the volume-clock bucket id from the
    // SAME window chain, decimal bucket sums, the last (partial) bucket per
    // symbol dropped, per-bucket ratios averaged through DECIMAL(28,12)
    "vpin" -> withTrades(
      ", x AS (SELECT symbol, ts, price, qty, " +
        "lag(price) OVER (PARTITION BY symbol ORDER BY ts) AS pp, " +
        "COALESCE(CAST(sum(CAST(qty AS BIGINT)) OVER (PARTITION BY symbol ORDER BY ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_prev FROM t), " +
        "y AS (SELECT symbol, ts, qty, cum_prev // 500 AS bar_id, " +
        "CASE WHEN price > pp THEN 1 WHEN price < pp THEN -1 END AS tick FROM x), " +
        "z AS (SELECT symbol, qty, bar_id, last_value(tick IGNORE NULLS) OVER (" +
        "PARTITION BY symbol ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS side FROM y), " +
        "g AS (SELECT symbol, bar_id, " +
        "sum(CASE WHEN side = 1 THEN CAST(qty AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS buy, " +
        "sum(CASE WHEN side = -1 THEN CAST(qty AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS sell, " +
        "sum(CAST(qty AS DECIMAL(18,2))) AS vol FROM z GROUP BY 1, 2), " +
        "lb AS (SELECT symbol, max(bar_id) AS last_bar FROM g GROUP BY 1), " +
        "u AS (SELECT g.symbol, CAST(round(abs(CAST(buy AS DOUBLE) - CAST(sell AS DOUBLE)) / " +
        "CAST(vol AS DOUBLE), 12) AS DECIMAL(28,12)) AS t " +
        "FROM g JOIN lb ON g.symbol = lb.symbol WHERE g.bar_id < lb.last_bar AND vol > 0) " +
        "SELECT symbol, count(t) AS n_buckets, " +
        "round(CAST(sum(t) AS DOUBLE) / CAST(count(t) AS DOUBLE), 6) AS vpin FROM u GROUP BY 1"),
    // risk-ratio replay: rounded returns into exact decimal co-moments,
    // running-peak drawdown as a rounded double MAX, fixed-order finals
    "risk_ratios" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "x AS (SELECT symbol, bucket_ts, close, " +
        "lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS pc, " +
        "max(close) OVER (PARTITION BY symbol ORDER BY bucket_ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak FROM c), " +
        "y AS (SELECT symbol, " +
        "round((peak - close) / (CASE WHEN peak <> 0 THEN peak END), 6) AS dd, " +
        "CASE WHEN pc IS NOT NULL AND pc <> 0 THEN CAST(round((close - pc) / pc, 6) AS DECIMAL(18,6)) END AS ret FROM x), " +
        "a AS (SELECT symbol, count(ret) AS n, CAST(sum(ret) AS DOUBLE) AS s1, " +
        "CAST(sum(CAST(CAST(ret AS DECIMAL(19,6)) * CAST(ret AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS s2, " +
        "CAST(sum(CASE WHEN ret < 0 THEN CAST(CAST(ret AS DECIMAL(19,6)) * CAST(ret AS DECIMAL(19,6)) AS DECIMAL(38,12)) ELSE CAST(0 AS DECIMAL(38,12)) END) AS DOUBLE) AS sd2, " +
        "max(dd) AS max_dd FROM y GROUP BY 1), " +
        "b AS (SELECT symbol, n, CAST(n AS DOUBLE) AS nd, s1, s2, sd2, max_dd FROM a WHERE n >= 2), " +
        "f AS (SELECT symbol, n, nd, s1 / nd AS mean, " +
        "(s2 - s1 * s1 / nd) / nd AS variance, sd2, max_dd FROM b) " +
        "SELECT symbol, n, round(mean, 6) AS mean_ret, " +
        "round(mean / (CASE WHEN variance > 0 THEN sqrt(variance) END), 6) AS sharpe, " +
        "round(mean / (CASE WHEN sd2 > 0 THEN sqrt(sd2 / nd) END), 6) AS sortino, " +
        "round(mean / (CASE WHEN max_dd > 0 THEN max_dd END), 6) AS calmar, max_dd FROM f"),
    // ulcer replay: rounded drawdown-% squares in exact decimals, RMS and
    // Martin ratio in identical double op order
    "ulcer_index" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "x AS (SELECT symbol, bucket_ts, close, " +
        "lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS pc, " +
        "max(close) OVER (PARTITION BY symbol ORDER BY bucket_ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak FROM c), " +
        "y AS (SELECT symbol, CAST(round(100.0 * (peak - close) / " +
        "(CASE WHEN peak <> 0 THEN peak END), 6) AS DECIMAL(18,6)) AS dd, " +
        "CASE WHEN pc IS NOT NULL AND pc <> 0 THEN CAST(round((close - pc) / pc, 6) AS DECIMAL(18,6)) END AS ret FROM x), " +
        "a AS (SELECT symbol, count(*) AS n, " +
        "CAST(sum(CAST(dd * dd AS DECIMAL(38,12))) AS DOUBLE) AS sdd2, " +
        "CAST(sum(ret) AS DOUBLE) AS s1, count(ret) AS nr FROM y GROUP BY 1), " +
        "f AS (SELECT symbol, n, sqrt(sdd2 / CAST(n AS DOUBLE)) AS ui, s1, nr FROM a) " +
        "SELECT symbol, n, round(ui, 6) AS ulcer_index, " +
        "round((s1 / (CASE WHEN nr > 0 THEN CAST(nr AS DOUBLE) END)) / " +
        "(CASE WHEN ui > 0 THEN ui END), 6) AS martin FROM f"),
    // vortex replay: 2-decimal movement/TR terms, 14-bar decimal window
    // sums, full frames only, guarded ratio
    "vortex" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "x AS (SELECT symbol, bucket_ts, high, low, close, " +
        "lag(high) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS ph, " +
        "lag(low) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS pl, " +
        "lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS pc FROM c), " +
        "y AS (SELECT symbol, bucket_ts, " +
        "CAST(round(abs(high - pl), 2) AS DECIMAL(18,2)) AS vmp, " +
        "CAST(round(abs(low - ph), 2) AS DECIMAL(18,2)) AS vmn, " +
        "CAST(round(greatest(high - low, abs(high - pc), abs(low - pc)), 2) AS DECIMAL(18,2)) AS tr " +
        "FROM x WHERE pc IS NOT NULL), " +
        "z AS (SELECT symbol, bucket_ts, CAST(sum(vmp) OVER w AS DECIMAL(38,2)) AS svmp, " +
        "CAST(sum(vmn) OVER w AS DECIMAL(38,2)) AS svmn, CAST(sum(tr) OVER w AS DECIMAL(38,2)) AS str, count(*) OVER w AS cnt " +
        "FROM y WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)) " +
        "SELECT symbol, bucket_ts, " +
        "round(CAST(svmp AS DOUBLE) / (CASE WHEN str <> 0 THEN CAST(str AS DOUBLE) END), 6) AS vi_plus, " +
        "round(CAST(svmn AS DOUBLE) / (CASE WHEN str <> 0 THEN CAST(str AS DOUBLE) END), 6) AS vi_minus " +
        "FROM z WHERE cnt = 14"),
    // KAMA replay: decimal-exact ER terms (10-lag signal, 10-diff noise
    // window), rounded ER, then the variable-alpha fold VERBATIM via a
    // recursive CTE over per-symbol ordered lists (the holt recipe)
    "kama" ->
      (s"WITH RECURSIVE t AS ($TradesSql), c AS (${candlesSql(3600000000L)}), " +
        "x AS (SELECT symbol, bucket_ts, close, CAST(close AS DECIMAL(18,2)) AS cd, " +
        "row_number() OVER (PARTITION BY symbol ORDER BY bucket_ts) AS i FROM c), " +
        "d AS (SELECT symbol, bucket_ts, close, i, " +
        "abs(cd - lag(cd) OVER (PARTITION BY symbol ORDER BY bucket_ts)) AS ad, " +
        "abs(cd - lag(cd, 10) OVER (PARTITION BY symbol ORDER BY bucket_ts)) AS sig FROM x), " +
        "e AS (SELECT symbol, bucket_ts, close, i, sig, " +
        "CAST(sum(ad) OVER (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS noise FROM d), " +
        "f AS (SELECT symbol, bucket_ts, close, " +
        "CASE WHEN noise = 0 THEN 0.0 ELSE round(CAST(sig AS DOUBLE) / CAST(noise AS DOUBLE), 6) END AS er, " +
        "row_number() OVER (PARTITION BY symbol ORDER BY bucket_ts) AS j FROM e WHERE i >= 11), " +
        "per AS (SELECT symbol, list(close ORDER BY j) AS cs, list(er ORDER BY j) AS ers, " +
        "list(bucket_ts ORDER BY j) AS tss FROM f GROUP BY 1), " +
        "r AS (SELECT symbol, 1 AS j, CAST(cs[1] AS DOUBLE) AS kama, cs, ers, tss FROM per " +
        "UNION ALL SELECT symbol, j + 1, " +
        "kama + (ers[j + 1] * (0.6666666666666666 - 0.06451612903225806) + 0.06451612903225806) * " +
        "(ers[j + 1] * (0.6666666666666666 - 0.06451612903225806) + 0.06451612903225806) * (cs[j + 1] - kama), " +
        "cs, ers, tss FROM r WHERE j < len(cs)) " +
        "SELECT symbol, tss[j] AS bucket_ts, cs[j] AS close, ers[j] AS er, " +
        "round(kama, 6) AS kama FROM r"),
    // CMO replay: rounded up/down decimal frame sums, one double division
    // TSI replay: the chained four-state fold as a recursive CTE with the
    // fresh inner EMAs textually substituted; alphas spelled as the same
    // double divisions, complements 1.0 - alpha (the trix spelling)
    "tsi" -> {
      val EMI = "((2.0 / 26.0) * ms[j + 1] + (1.0 - (2.0 / 26.0)) * emi)"
      val EMO = s"((2.0 / 14.0) * $EMI + (1.0 - (2.0 / 14.0)) * emo)"
      val EAI = "((2.0 / 26.0) * abs(ms[j + 1]) + (1.0 - (2.0 / 26.0)) * eai)"
      val EAO = s"((2.0 / 14.0) * $EAI + (1.0 - (2.0 / 14.0)) * eao)"
      s"WITH RECURSIVE t AS ($TradesSql), c AS (${candlesSql(3600000000L)}), " +
        "d AS (SELECT symbol, bucket_ts, round(close - lag(close) OVER " +
        "(PARTITION BY symbol ORDER BY bucket_ts), 2) AS m FROM c), " +
        "e AS (SELECT symbol, bucket_ts, m FROM d WHERE m IS NOT NULL), " +
        "per AS (SELECT symbol, list(m ORDER BY bucket_ts) AS ms, " +
        "list(bucket_ts ORDER BY bucket_ts) AS tss FROM e GROUP BY 1), " +
        "r AS (SELECT symbol, 1 AS j, CAST(ms[1] AS DOUBLE) AS emi, " +
        "CAST(ms[1] AS DOUBLE) AS emo, abs(CAST(ms[1] AS DOUBLE)) AS eai, " +
        "abs(CAST(ms[1] AS DOUBLE)) AS eao, ms, tss FROM per " +
        s"UNION ALL SELECT symbol, j + 1, $EMI, $EMO, $EAI, $EAO, ms, tss FROM r WHERE j < len(ms)) " +
        "SELECT symbol, tss[j] AS bucket_ts, " +
        "CASE WHEN eao <> 0.0 THEN round(100.0 * (emo / eao), 6) END AS tsi FROM r"
    },
    // Fisher replay: rolling min/max windows gate full frames, then the
    // two damped recursions with the fresh CLAMPED value substituted
    // into the ln
    "fisher_transform" -> {
      def valj(x: String, prev: String) =
        s"greatest(-0.999, least(0.999, 0.33 * $x + 0.67 * $prev))"
      val V1 = valj("xs[1]", "0.0")
      val VJ = valj("xs[j + 1]", "val")
      s"WITH RECURSIVE t AS ($TradesSql), c AS (${candlesSql(3600000000L)}), " +
        "w1 AS (SELECT symbol, bucket_ts, (high + low) / 2.0 AS mid FROM c), " +
        "w2 AS (SELECT symbol, bucket_ts, mid, min(mid) OVER wf AS mn, " +
        "max(mid) OVER wf AS mx, count(*) OVER wf AS cnt FROM w1 " +
        "WINDOW wf AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)), " +
        "f AS (SELECT symbol, bucket_ts, CASE WHEN mx <> mn THEN " +
        "2.0 * ((mid - mn) / (mx - mn)) - 1.0 ELSE 0.0 END AS x FROM w2 WHERE cnt = 10), " +
        "per AS (SELECT symbol, list(x ORDER BY bucket_ts) AS xs, " +
        "list(bucket_ts ORDER BY bucket_ts) AS tss FROM f GROUP BY 1), " +
        s"r AS (SELECT symbol, 1 AS j, $V1 AS val, " +
        s"0.5 * ln((1.0 + $V1) / (1.0 - $V1)) + 0.5 * 0.0 AS fish, " +
        "CAST(NULL AS DOUBLE) AS fishp, xs, tss FROM per " +
        s"UNION ALL SELECT symbol, j + 1, $VJ, " +
        s"0.5 * ln((1.0 + $VJ) / (1.0 - $VJ)) + 0.5 * fish, fish, xs, tss " +
        "FROM r WHERE j < len(xs)) " +
        "SELECT symbol, tss[j] AS bucket_ts, round(fish, 6) AS fisher, " +
        "round(fishp, 6) AS fisher_signal FROM r"
    },
    // Alligator replay: three independent SMMA folds in one recursion,
    // forward displacement via window lags over the fold output
    "alligator" ->
      (s"WITH RECURSIVE t AS ($TradesSql), c AS (${candlesSql(3600000000L)}), " +
        "per AS (SELECT symbol, list(close ORDER BY bucket_ts) AS cs, " +
        "list(bucket_ts ORDER BY bucket_ts) AS tss FROM c GROUP BY 1), " +
        "r AS (SELECT symbol, 1 AS j, CAST(cs[1] AS DOUBLE) AS vj, " +
        "CAST(cs[1] AS DOUBLE) AS vt, CAST(cs[1] AS DOUBLE) AS vl, cs, tss FROM per " +
        "UNION ALL SELECT symbol, j + 1, " +
        "((1.0 / 13.0) * cs[j + 1] + (1.0 - (1.0 / 13.0)) * vj), " +
        "((1.0 / 8.0) * cs[j + 1] + (1.0 - (1.0 / 8.0)) * vt), " +
        "((1.0 / 5.0) * cs[j + 1] + (1.0 - (1.0 / 5.0)) * vl), cs, tss " +
        "FROM r WHERE j < len(cs)) " +
        "SELECT symbol, tss[j] AS bucket_ts, " +
        "lag(vj, 8) OVER w AS jaw, lag(vt, 5) OVER w AS teeth, " +
        "lag(vl, 3) OVER w AS lips FROM r " +
        "WINDOW w AS (PARTITION BY symbol ORDER BY j)"),
    // Fractals replay: strict comparisons against 2 lags + 2 leads of
    // exact 2-decimal prices, both-side-defined gate
    "fractals" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "x AS (SELECT symbol, bucket_ts, high, low, " +
        "lag(high, 1) OVER w AS ph1, lag(high, 2) OVER w AS ph2, " +
        "lead(high, 1) OVER w AS nh1, lead(high, 2) OVER w AS nh2, " +
        "lag(low, 1) OVER w AS pl1, lag(low, 2) OVER w AS pl2, " +
        "lead(low, 1) OVER w AS nl1, lead(low, 2) OVER w AS nl2 " +
        "FROM c WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts)) " +
        "SELECT symbol, bucket_ts, high, low, " +
        "(high > ph1 AND high > nh1 AND high > ph2 AND high > nh2) AS up_fractal, " +
        "(low < pl1 AND low < nl1 AND low < pl2 AND low < nl2) AS down_fractal " +
        "FROM x WHERE ph1 IS NOT NULL AND nh1 IS NOT NULL AND ph2 IS NOT NULL AND nh2 IS NOT NULL " +
        "AND ((high > ph1 AND high > nh1 AND high > ph2 AND high > nh2) " +
        "OR (low < pl1 AND low < nl1 AND low < pl2 AND low < nl2))"),
    // Awesome-oscillator replay: exact decimal high+low frame sums, the
    // /2 and /n folded into two double divisions, one subtraction
    "awesome_osc" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "z AS (SELECT symbol, bucket_ts, " +
        "sum(CAST(high AS DECIMAL(18,2)) + CAST(low AS DECIMAL(18,2))) OVER w1 AS s1, " +
        "sum(CAST(high AS DECIMAL(18,2)) + CAST(low AS DECIMAL(18,2))) OVER w2 AS s2, " +
        "count(*) OVER w2 AS cnt FROM c " +
        "WINDOW w1 AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), " +
        "w2 AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 33 PRECEDING AND CURRENT ROW)) " +
        "SELECT symbol, bucket_ts, " +
        "round(CAST(s1 AS DOUBLE) / 10.0 - CAST(s2 AS DOUBLE) / 68.0, 6) AS awesome_osc " +
        "FROM z WHERE cnt = 34"),
    // KST replay: four 6-rounded decimal ROCs, exact frame sums over
    // literal lengths, the 1:2:3:4 blend in identical double op order
    "kst" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "x AS (SELECT symbol, bucket_ts, close, " +
        "lag(close, 10) OVER w AS c10, lag(close, 15) OVER w AS c15, " +
        "lag(close, 20) OVER w AS c20, lag(close, 30) OVER w AS c30, " +
        "lag(close, 44) OVER w AS gate " +
        "FROM c WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts)), " +
        "y AS (SELECT symbol, bucket_ts, gate, " +
        "CAST(round(100.0 * (close / (CASE WHEN c10 <> 0 THEN c10 END) - 1.0), 6) AS DECIMAL(18,6)) AS r1, " +
        "CAST(round(100.0 * (close / (CASE WHEN c15 <> 0 THEN c15 END) - 1.0), 6) AS DECIMAL(18,6)) AS r2, " +
        "CAST(round(100.0 * (close / (CASE WHEN c20 <> 0 THEN c20 END) - 1.0), 6) AS DECIMAL(18,6)) AS r3, " +
        "CAST(round(100.0 * (close / (CASE WHEN c30 <> 0 THEN c30 END) - 1.0), 6) AS DECIMAL(18,6)) AS r4 " +
        "FROM x), " +
        "z AS (SELECT symbol, bucket_ts, gate, " +
        "CAST(sum(r1) OVER wa * 1000000 AS BIGINT) AS u1, " +
        "CAST(sum(r2) OVER wa * 1000000 AS BIGINT) AS u2, " +
        "CAST(sum(r3) OVER wa * 1000000 AS BIGINT) AS u3, " +
        "CAST(sum(r4) OVER wb * 1000000 AS BIGINT) AS u4 FROM y " +
        "WINDOW wa AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), " +
        "wb AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)), " +
        "k AS (SELECT symbol, bucket_ts, 3 * u1 + 6 * u2 + 9 * u3 + 8 * u4 AS nmicro " +
        "FROM z WHERE gate IS NOT NULL) " +
        "SELECT symbol, bucket_ts, " +
        "CAST(CASE WHEN nmicro >= 0 THEN (2 * nmicro + 30) // 60 " +
        "ELSE -((2 * -nmicro + 30) // 60) END AS DOUBLE) / 1000000.0 AS kst FROM k"),
    // RVI replay: integer-weighted exact decimal SWMA terms (the /6
    // cancels in the ratio), one double division, signal line over the
    // surviving rows' rounded doubles
    "rvi" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "x AS (SELECT symbol, bucket_ts, " +
        "CAST(round(close - open, 2) AS DECIMAL(18,2)) AS co, " +
        "CAST(round(high - low, 2) AS DECIMAL(18,2)) AS hl FROM c), " +
        "y AS (SELECT symbol, bucket_ts, " +
        "co + 2 * lag(co, 1) OVER w + 2 * lag(co, 2) OVER w + lag(co, 3) OVER w AS wn, " +
        "hl + 2 * lag(hl, 1) OVER w + 2 * lag(hl, 2) OVER w + lag(hl, 3) OVER w AS wd " +
        "FROM x WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts)), " +
        "f AS (SELECT * FROM y WHERE wd IS NOT NULL), " +
        "z AS (SELECT symbol, bucket_ts, CAST(sum(wn) OVER wf AS DECIMAL(38,2)) AS snum, " +
        "CAST(sum(wd) OVER wf AS DECIMAL(38,2)) AS sden, count(*) OVER wf AS cnt FROM f " +
        "WINDOW wf AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)), " +
        "g AS (SELECT symbol, bucket_ts, " +
        "round(CAST(snum AS DOUBLE) / (CASE WHEN sden <> 0 THEN CAST(sden AS DOUBLE) END), 6) AS rvi " +
        "FROM z WHERE cnt = 10), " +
        "h AS (SELECT symbol, bucket_ts, rvi, " +
        "CAST(CAST(rvi AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS rm FROM g), " +
        "i AS (SELECT symbol, bucket_ts, rvi, " +
        "rm + 2 * lag(rm, 1) OVER w2 + 2 * lag(rm, 2) OVER w2 + lag(rm, 3) OVER w2 AS nmicro " +
        "FROM h WINDOW w2 AS (PARTITION BY symbol ORDER BY bucket_ts)) " +
        "SELECT symbol, bucket_ts, rvi, " +
        "CAST(CASE WHEN nmicro >= 0 THEN (2 * nmicro + 6) // 12 " +
        "ELSE -((2 * -nmicro + 6) // 12) END AS DOUBLE) / 1000000.0 AS rvi_signal FROM i"),
    "cmo" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "x AS (SELECT symbol, bucket_ts, close, " +
        "lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS pc FROM c), " +
        "y AS (SELECT symbol, bucket_ts, " +
        "CAST(round(greatest(close - pc, 0.0), 2) AS DECIMAL(18,2)) AS up, " +
        "CAST(round(greatest(pc - close, 0.0), 2) AS DECIMAL(18,2)) AS dn " +
        "FROM x WHERE pc IS NOT NULL), " +
        "z AS (SELECT symbol, bucket_ts, CAST(sum(up) OVER w AS DECIMAL(38,2)) AS su, CAST(sum(dn) OVER w AS DECIMAL(38,2)) AS sd, " +
        "count(*) OVER w AS cnt FROM y WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts " +
        "ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)) " +
        "SELECT symbol, bucket_ts, round(100.0 * (CAST(su AS DOUBLE) - CAST(sd AS DOUBLE)) / " +
        "(CASE WHEN su + sd <> 0 THEN CAST(su + sd AS DOUBLE) END), 6) AS cmo FROM z WHERE cnt = 14"),
    // DPO replay: exact decimal SMA frame sum, displaced lag, one subtract
    "dpo" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "z AS (SELECT symbol, bucket_ts, close, " +
        "sum(CAST(close AS DECIMAL(18,2))) OVER w AS sc, count(*) OVER w AS cnt, " +
        "lag(close, 11) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS disp " +
        "FROM c WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts " +
        "ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)) " +
        "SELECT symbol, bucket_ts, round(disp - CAST(sc AS DOUBLE) / 20.0, 6) AS dpo " +
        "FROM z WHERE cnt = 20 AND disp IS NOT NULL"),
    // Elder Ray replay: the ema list_reduce fold, powers subtracted inside
    // the rounded expression
    "elder_ray" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "l AS (SELECT symbol, bucket_ts, high, low, list(close) OVER (" +
        "PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS closes FROM c), " +
        "e AS (SELECT symbol, bucket_ts, high, low, list_reduce(closes, (acc, x) -> " +
        "(CAST(2 AS DOUBLE) / CAST(14 AS DOUBLE)) * x + " +
        "(CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE) / CAST(14 AS DOUBLE)) * acc) AS ev FROM l) " +
        "SELECT symbol, bucket_ts, round(high - ev, 6) AS bull_power, " +
        "round(low - ev, 6) AS bear_power FROM e"),
    // Force-index replay: exact scale-4 decimal product terms, the ema
    // scalar fold seeded at each symbol's first term
    "force_index" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "x AS (SELECT symbol, bucket_ts, close, volume, " +
        "lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS pc FROM c), " +
        "f AS (SELECT symbol, bucket_ts, CAST((CAST(close AS DECIMAL(18,2)) - CAST(pc AS DECIMAL(18,2))) * " +
        "CAST(volume AS DECIMAL(18,2)) AS DOUBLE) AS fi FROM x WHERE pc IS NOT NULL), " +
        "l AS (SELECT symbol, bucket_ts, fi, list(fi) OVER (" +
        "PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fis FROM f) " +
        "SELECT symbol, bucket_ts, round(fi, 6) AS force_index, " +
        "round(list_reduce(fis, (acc, x) -> (CAST(2 AS DOUBLE) / CAST(14 AS DOUBLE)) * x + " +
        "(CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE) / CAST(14 AS DOUBLE)) * acc), 6) AS force_ema FROM l"),
    // Mass-index replay: the chained EMA9/EMA9 recursion with substituted
    // e1 (the trix technique) over ranges, rounded ratios into an exact
    // decimal 25-bar window sum
    "mass_index" -> {
      val E1 = "(0.2 * rs[j + 1] + (1.0 - 0.2) * e1)"
      val E2 = s"(0.2 * $E1 + (1.0 - 0.2) * e2)"
      s"WITH RECURSIVE t AS ($TradesSql), c AS (${candlesSql(3600000000L)}), " +
        "per AS (SELECT symbol, list(high - low ORDER BY bucket_ts) AS rs, " +
        "list(bucket_ts ORDER BY bucket_ts) AS tss FROM c GROUP BY 1), " +
        "r AS (SELECT symbol, 1 AS j, CAST(rs[1] AS DOUBLE) AS e1, " +
        "CAST(rs[1] AS DOUBLE) AS e2, rs, tss FROM per " +
        s"UNION ALL SELECT symbol, j + 1, $E1, $E2, rs, tss FROM r WHERE j < len(rs)), " +
        "q AS (SELECT symbol, tss[j] AS bucket_ts, " +
        "CASE WHEN e2 <> 0.0 THEN CAST(round(e1 / e2, 6) AS DECIMAL(18,6)) END AS r6 FROM r), " +
        "q2 AS (SELECT symbol, bucket_ts, r6 FROM q WHERE r6 IS NOT NULL), " +
        "z AS (SELECT symbol, bucket_ts, CAST(sum(r6) OVER w AS DECIMAL(38,6)) AS mi, count(*) OVER w AS cnt " +
        "FROM q2 WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)) " +
        "SELECT symbol, bucket_ts, round(CAST(mi AS DOUBLE), 6) AS mass_index FROM z WHERE cnt = 25"
    },
    // VWMA replay: exact decimal price x volume frame sums, one division
    "vwma" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "z AS (SELECT symbol, bucket_ts, " +
        "sum(CAST(CAST(close AS DECIMAL(18,2)) * CAST(volume AS DECIMAL(18,2)) AS DECIMAL(38,4))) OVER w AS spv, " +
        "sum(CAST(volume AS DECIMAL(18,2))) OVER w AS sv, count(*) OVER w AS cnt " +
        "FROM c WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)) " +
        "SELECT symbol, bucket_ts, round(CAST(spv AS DOUBLE) / " +
        "(CASE WHEN sv <> 0 THEN CAST(sv AS DOUBLE) END), 6) AS vwma FROM z WHERE cnt = 20"),
    // Ultimate-oscillator replay: rounded BP/TR decimal frame sums at the
    // three horizons, the 4:2:1 blend in identical double op order
    "ultimate_osc" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "x AS (SELECT symbol, bucket_ts, high, low, close, " +
        "lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS pc FROM c), " +
        "y AS (SELECT symbol, bucket_ts, " +
        "CAST(round(close - least(low, pc), 2) AS DECIMAL(18,2)) AS bp, " +
        "CAST(round(greatest(high, pc) - least(low, pc), 2) AS DECIMAL(18,2)) AS tr " +
        "FROM x WHERE pc IS NOT NULL), " +
        "z AS (SELECT symbol, bucket_ts, " +
        "CAST(sum(bp) OVER w7 AS DOUBLE) / (CASE WHEN CAST(sum(tr) OVER w7 AS DECIMAL(38,2)) <> 0 THEN CAST(sum(tr) OVER w7 AS DOUBLE) END) AS a1, " +
        "CAST(sum(bp) OVER w14 AS DOUBLE) / (CASE WHEN CAST(sum(tr) OVER w14 AS DECIMAL(38,2)) <> 0 THEN CAST(sum(tr) OVER w14 AS DOUBLE) END) AS a2, " +
        "CAST(sum(bp) OVER w28 AS DOUBLE) / (CASE WHEN CAST(sum(tr) OVER w28 AS DECIMAL(38,2)) <> 0 THEN CAST(sum(tr) OVER w28 AS DOUBLE) END) AS a3, " +
        "count(*) OVER w28 AS cnt FROM y WINDOW " +
        "w7 AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), " +
        "w14 AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 13 PRECEDING AND CURRENT ROW), " +
        "w28 AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)) " +
        "SELECT symbol, bucket_ts, round(100.0 * (4.0 * a1 + 2.0 * a2 + a3) / 7.0, 6) AS ultimate_osc " +
        "FROM z WHERE cnt = 28"),
    // Coppock replay: the ten integer-weighted lags over the exact decimal
    // ROC sum — written out so no windowed float sum exists in either engine
    "coppock" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "x AS (SELECT symbol, bucket_ts, close, " +
        "lag(close, 14) OVER ws AS p14, lag(close, 11) OVER ws AS p11 " +
        "FROM c WINDOW ws AS (PARTITION BY symbol ORDER BY bucket_ts)), " +
        "y AS (SELECT symbol, bucket_ts, " +
        "CAST(round(100.0 * (close / (CASE WHEN p14 <> 0 THEN p14 END) - 1.0), 6) + " +
        "round(100.0 * (close / (CASE WHEN p11 <> 0 THEN p11 END) - 1.0), 6) AS DECIMAL(18,6)) AS s FROM x), " +
        "z AS (SELECT symbol, bucket_ts, " +
        (0 until 10).map(j =>
          if (j == 0) "10 * s" else s"${10 - j} * (lag(s, $j) OVER ws)")
          .mkString("", " + ", " AS wsum, ") +
        "(lag(s, 9) OVER ws) AS gate FROM y WINDOW ws AS (PARTITION BY symbol ORDER BY bucket_ts)) " +
        "SELECT symbol, bucket_ts, round(CAST(wsum AS DOUBLE) / 55.0, 6) AS coppock " +
        "FROM z WHERE gate IS NOT NULL"),
    // ExactSubstr replay: same md5-prefix word hashes, the identical
    // (hash-array, doc_id, pos) total order (element-wise lexicographic,
    // shorter-prefix-first both engines), adjacent-pair word LCP via
    // first-false position, per-doc max with min-pos tie-break via a
    // two-step argmax
    "longest_repeat" ->
      ("WITH w AS (SELECT doc_id, list_transform(" +
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> ''), " +
        "wd -> CAST(CAST('0x' || substr(md5(wd), 1, 8) AS BIGINT) & 2147483647 AS INTEGER)) AS ws FROM documents), " +
        "wf AS (SELECT doc_id, ws FROM w WHERE len(ws) > 0), " +
        "ix AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM wf), " +
        "suf AS (SELECT doc_id, i - 1 AS pos, ws[i : i + 31] AS sfx FROM ix), " +
        "r AS (SELECT doc_id, pos, sfx, row_number() OVER (ORDER BY sfx, doc_id, pos) AS rnk FROM suf), " +
        "adj AS (SELECT a.doc_id, a.pos, b.doc_id AS doc2, b.pos AS pos2, " +
        "coalesce(nullif(list_position(list_transform(generate_series(1, least(len(a.sfx), len(b.sfx))), " +
        "i -> a.sfx[i] = b.sfx[i]), false), 0) - 1, least(len(a.sfx), len(b.sfx))) AS lcp " +
        "FROM r a JOIN r b ON b.rnk = a.rnk + 1), " +
        "c AS (SELECT doc_id, pos, lcp FROM adj UNION ALL SELECT doc2 AS doc_id, pos2 AS pos, lcp FROM adj), " +
        "mx AS (SELECT doc_id, max(lcp) AS mr FROM c GROUP BY 1), " +
        "best AS (SELECT c.doc_id, c.lcp AS max_repeat, min(c.pos) AS pos " +
        "FROM c JOIN mx ON mx.doc_id = c.doc_id AND c.lcp = mx.mr GROUP BY 1, 2), " +
        "spine AS (SELECT DISTINCT doc_id FROM r) " +
        "SELECT doc_id, CAST(coalesce(max_repeat, 0) AS BIGINT) AS max_repeat, " +
        "CAST(CASE WHEN coalesce(max_repeat, 0) > 0 THEN pos END AS BIGINT) AS pos " +
        "FROM spine LEFT JOIN best USING (doc_id)"),
    // Winnowing replay: same k-gram md5-prefix hashes, the packed-BIGINT
    // window argmin, DISTINCT selections, left-joined onto gram counts
    "winnow_fingerprint" ->
      ("WITH dw AS (SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents), " +
        "gi AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 3)) AS i FROM dw WHERE len(ws) >= 4), " +
        "g AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, " +
        "CAST('0x' || substr(md5(concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3])), 1, 8) AS BIGINT) AS h FROM gi), " +
        "sw AS (SELECT doc_id, min(h * 2147483648 + pos) OVER win AS pk, count(*) OVER win AS cnt " +
        "FROM g WINDOW win AS (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)), " +
        "sel AS (SELECT DISTINCT doc_id, pk FROM sw WHERE cnt = 4), " +
        "sa AS (SELECT doc_id, count(*) AS n_fingerprints, min(pk // 2147483648) AS min_fp FROM sel GROUP BY 1), " +
        "ng AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY 1) " +
        "SELECT ng.doc_id AS doc_id, n_grams, COALESCE(n_fingerprints, 0) AS n_fingerprints, " +
        "round(CAST(COALESCE(n_fingerprints, 0) AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) AS fp_density, min_fp " +
        "FROM ng LEFT JOIN sa ON ng.doc_id = sa.doc_id"),
    // PSI replay: identical global-bin float expressions, exact-decimal
    // term sums, shared-libm ln (the zipf precedent)
    "drift_psi" ->
      ("WITH b AS (SELECT CAST(o_totalprice AS DOUBLE) AS v, " +
        "o_orderdate < TIMESTAMP '1998-01-01' AS is_ref FROM orders WHERE o_totalprice IS NOT NULL), " +
        "bounds AS (SELECT min(v) AS lo, max(v) AS hi FROM b), " +
        "counts AS (SELECT least(CAST(floor((v - lo) * 20.0 / (CASE WHEN hi <> lo THEN hi - lo END)) AS BIGINT), 19) AS bin, " +
        "CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS nref, CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS ncur " +
        "FROM b CROSS JOIN bounds GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(nref) AS BIGINT) AS tref, CAST(sum(ncur) AS BIGINT) AS tcur FROM counts), " +
        "terms AS (SELECT CAST(round((CAST(nref AS DOUBLE) / CAST(tref AS DOUBLE) - CAST(ncur AS DOUBLE) / CAST(tcur AS DOUBLE)) * " +
        "ln(CAST(nref AS DOUBLE) / CAST(tref AS DOUBLE) / (CAST(ncur AS DOUBLE) / CAST(tcur AS DOUBLE))), 12) AS DECIMAL(28,12)) AS term, " +
        "tref, tcur FROM counts CROSS JOIN tot WHERE nref > 0 AND ncur > 0) " +
        "SELECT round(CAST(sum(term) AS DOUBLE), 6) AS psi, count(*) AS n_bins_used, " +
        "tref AS n_ref, tcur AS n_cur FROM terms GROUP BY tref, tcur"),
    // StochRSI replay: the rsi CTE chain, then min/max frames over the
    // rounded RSI doubles (picks, order-free)
    "stoch_rsi" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "p AS (SELECT symbol, bucket_ts, close, lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS prev FROM c), " +
        "d AS (SELECT symbol, bucket_ts, " +
        "greatest(CAST(close AS DECIMAL(18,2)) - CAST(prev AS DECIMAL(18,2)), CAST(0 AS DECIMAL(18,2))) AS gain, " +
        "greatest(-(CAST(close AS DECIMAL(18,2)) - CAST(prev AS DECIMAL(18,2))), CAST(0 AS DECIMAL(18,2))) AS loss " +
        "FROM p WHERE prev IS NOT NULL), " +
        "f AS (SELECT symbol, bucket_ts, " +
        "CAST(sum(gain) OVER w AS DOUBLE) AS sum_gain, " +
        "CAST(sum(loss) OVER w AS DOUBLE) AS sum_loss, count(*) OVER w AS cnt FROM d " +
        "WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)), " +
        "r AS (SELECT symbol, bucket_ts, round(CASE WHEN sum_loss = 0.0 THEN 100.0 " +
        "ELSE 100.0 - 100.0 / (1.0 + sum_gain / sum_loss) END, 6) AS rsi FROM f WHERE cnt = 14), " +
        "z AS (SELECT symbol, bucket_ts, rsi, min(rsi) OVER w2 AS lo, max(rsi) OVER w2 AS hi, " +
        "count(*) OVER w2 AS cnt2 FROM r WINDOW w2 AS (PARTITION BY symbol ORDER BY bucket_ts " +
        "ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)) " +
        "SELECT symbol, bucket_ts, rsi, round((rsi - lo) / " +
        "(CASE WHEN hi <> lo THEN hi - lo END), 6) AS stoch_rsi FROM z WHERE cnt2 = 14"),
    // EMV replay: identical float term expression rounded into exact
    // decimal frame sums over surviving (nonzero-volume) bars
    "emv" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "x AS (SELECT symbol, bucket_ts, high, low, volume, " +
        "lag(high) OVER ws AS ph, lag(low) OVER ws AS pl " +
        "FROM c WINDOW ws AS (PARTITION BY symbol ORDER BY bucket_ts)), " +
        "y AS (SELECT symbol, bucket_ts, " +
        "CAST(CAST((CAST(high AS DECIMAL(18,2)) + CAST(low AS DECIMAL(18,2)) - CAST(ph AS DECIMAL(18,2)) - CAST(pl AS DECIMAL(18,2))) * 100 AS BIGINT) * " +
        "CAST((CAST(high AS DECIMAL(18,2)) - CAST(low AS DECIMAL(18,2))) * 100 AS BIGINT) * 100000000 AS BIGINT) AS nn, " +
        "2 * CAST(CAST(volume AS DECIMAL(18,2)) * 100 AS BIGINT) AS dd " +
        "FROM x WHERE ph IS NOT NULL AND volume > 0), " +
        "m AS (SELECT symbol, bucket_ts, CASE WHEN nn >= 0 THEN (2 * nn + dd) // (2 * dd) " +
        "ELSE -((2 * -nn + dd) // (2 * dd)) END AS micro FROM y), " +
        "z AS (SELECT symbol, bucket_ts, CAST(sum(micro) OVER w AS BIGINT) AS st, count(*) OVER w AS cnt " +
        "FROM m WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)) " +
        "SELECT symbol, bucket_ts, CAST(CASE WHEN st >= 0 THEN (2 * st + 14) // 28 " +
        "ELSE -((2 * -st + 14) // 28) END AS DOUBLE) / 1000000.0 AS emv FROM z WHERE cnt = 14"),
    // Chandelier replay: pick extremes + exact decimal TR sums, identical
    // stop arithmetic
    "chandelier_exit" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "x AS (SELECT symbol, bucket_ts, high, low, " +
        "greatest(CAST(high AS DECIMAL(18,2)) - CAST(low AS DECIMAL(18,2)), " +
        "abs(CAST(high AS DECIMAL(18,2)) - CAST(pc AS DECIMAL(18,2))), " +
        "abs(CAST(low AS DECIMAL(18,2)) - CAST(pc AS DECIMAL(18,2)))) AS tr " +
        "FROM (SELECT symbol, bucket_ts, high, low, lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS pc FROM c) " +
        "WHERE pc IS NOT NULL), " +
        "z AS (SELECT symbol, bucket_ts, max(high) OVER w AS hh, min(low) OVER w AS ll, " +
        "CAST(sum(tr) OVER w AS DECIMAL(38,2)) AS str, count(*) OVER w AS cnt " +
        "FROM x WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 21 PRECEDING AND CURRENT ROW)) " +
        "SELECT symbol, bucket_ts, " +
        "round(hh - 3.0 * (CAST(str AS DOUBLE) / 22.0), 6) AS long_stop, " +
        "round(ll + 3.0 * (CAST(str AS DOUBLE) / 22.0), 6) AS short_stop FROM z WHERE cnt = 22"),
    // second-order transition replay: two lags in the same user window,
    // dim-scale conditional shares
    "event_transitions2" ->
      ("WITH p AS (SELECT user_id, event_type, " +
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type, " +
        "lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev2_type FROM events), " +
        "a AS (SELECT prev2_type, prev_type, event_type, count(*) AS n_transitions, " +
        "count(DISTINCT user_id) AS n_users FROM p WHERE prev2_type IS NOT NULL GROUP BY 1, 2, 3) " +
        "SELECT prev2_type, prev_type, event_type, n_transitions, n_users, " +
        "round(CAST(n_transitions AS DOUBLE) / " +
        "CAST(sum(n_transitions) OVER (PARTITION BY prev2_type, prev_type) AS DOUBLE), 6) AS p FROM a"),
    // cross-source duplication replay: distinct (source, md5) pairs,
    // content-hash self-join, zero-filled over the complete pair spine
    "cross_source_dups" ->
      ("WITH sc AS (SELECT DISTINCT source, md5(text) AS h FROM documents), " +
        "tot AS (SELECT source, count(*) AS n FROM sc GROUP BY 1), " +
        "pr AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared " +
        "FROM sc a JOIN sc b ON a.h = b.h AND a.source < b.source GROUP BY 1, 2) " +
        "SELECT ta.source AS source_a, tb.source AS source_b, " +
        "coalesce(pr.n_shared, 0) AS n_shared, ta.n AS n_a, tb.n AS n_b, " +
        "round(CAST(coalesce(pr.n_shared, 0) AS DOUBLE) / CAST(least(ta.n, tb.n) AS DOUBLE), 6) AS overlap " +
        "FROM tot ta JOIN tot tb ON ta.source < tb.source " +
        "LEFT JOIN pr ON pr.source_a = ta.source AND pr.source_b = tb.source"),
    // per-source MinHash replay: doc sigs exactly as dedup_minhash, then
    // element-wise min per source, component matches counted per pair
    "source_minhash" ->
      (s"WITH dw AS (SELECT source, string_split_regex(text, '\\s+') AS ws FROM documents), " +
        "dh AS (SELECT source, list_transform(" +
        "list_transform(generate_series(1, len(ws)-2), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])), " +
        "s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)) AS hashes FROM dw WHERE len(ws) >= 3), " +
        s"sigs AS (SELECT source, ${minhashSigSql(128)} AS sig FROM dh), " +
        "ix AS (SELECT unnest(generate_series(1, 128)) AS pos), " +
        "sm AS (SELECT source, pos, min(sig[pos]) AS mh FROM sigs CROSS JOIN ix GROUP BY 1, 2), " +
        "m AS (SELECT x.source AS source_a, y.source AS source_b, count(*) AS n_match " +
        "FROM sm x JOIN sm y ON x.pos = y.pos AND x.mh = y.mh AND x.source < y.source GROUP BY 1, 2), " +
        "srcs AS (SELECT DISTINCT source FROM sm), " +
        "sp AS (SELECT a.source AS source_a, b.source AS source_b " +
        "FROM srcs a JOIN srcs b ON a.source < b.source) " +
        "SELECT source_a, source_b, CAST(coalesce(n_match, 0) AS BIGINT) AS n_match, " +
        "round(CAST(coalesce(n_match, 0) AS DOUBLE) / 128, 6) AS est_jaccard " +
        "FROM sp LEFT JOIN m USING (source_a, source_b)"),
    // hot-key diagnostic replay: per-key counts, 1-row stats, top-10 heap
    "skew_report" ->
      ("WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1), " +
        "s AS (SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows, max(cnt) AS max_cnt FROM c), " +
        "t AS (SELECT user_id, cnt FROM c ORDER BY cnt DESC, user_id LIMIT 10) " +
        "SELECT user_id, cnt, n_keys, n_rows, max_cnt, " +
        "round(CAST(cnt AS DOUBLE) / n_rows, 6) AS share, " +
        "round(CAST(cnt AS DOUBLE) * n_keys / n_rows, 6) AS skew_x, " +
        "CAST(ceil(CAST(cnt AS DOUBLE) * n_keys / n_rows) AS BIGINT) AS salt_factor " +
        "FROM t CROSS JOIN s"),
    "hybrid_rrf" -> hybridRrfSql,
    "mmr_rerank" -> mmrRerankSql(),
    // Roll estimator replay: exact decimal close diffs, lag-1 co-moment via
    // exact partial sums, final cov/spread double in identical op order
    "roll_spread" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "p AS (SELECT symbol, bucket_ts, CAST(close AS DECIMAL(18,2)) - " +
        "CAST(lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS DECIMAL(18,2)) AS dp FROM c), " +
        "q AS (SELECT symbol, bucket_ts, dp, lag(dp) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS dp_prev FROM p), " +
        "f AS (SELECT symbol, dp, dp_prev FROM q WHERE dp IS NOT NULL AND dp_prev IS NOT NULL), " +
        "a AS (SELECT symbol, count(*) AS n, " +
        "CAST(sum(CAST(dp * dp_prev AS DECIMAL(38,4))) AS DOUBLE) AS sxy, " +
        "CAST(sum(dp) AS DOUBLE) AS sx, CAST(sum(dp_prev) AS DOUBLE) AS sy FROM f GROUP BY 1) " +
        "SELECT symbol, n, " +
        "round((sxy - sx * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS autocov_dp, " +
        "round(2.0 * sqrt(greatest(-((sxy - sx * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)), 0.0)), 6) AS roll_spread FROM a"),
    // Amihud replay: daily candles, per-day |ret|/(close*volume)*1e6 rounded
    // to 12 and summed in exact DECIMAL(28,12)
    "amihud" -> withTrades(
      s", c AS (${candlesSql(86400000000L)}), " +
        "p AS (SELECT symbol, bucket_ts, close, volume, " +
        "lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS prev_close FROM c), " +
        "f AS (SELECT symbol, (close - prev_close) / prev_close AS ret, close, volume FROM p " +
        "WHERE prev_close IS NOT NULL AND prev_close <> 0 AND volume > 0 AND close > 0), " +
        "x AS (SELECT symbol, CAST(round(abs(ret) / (close * volume) * 1000000.0, 12) AS DECIMAL(28,12)) AS t FROM f), " +
        "a AS (SELECT symbol, count(t) AS n_days, CAST(sum(t) AS DOUBLE) / CAST(count(t) AS DOUBLE) AS a FROM x GROUP BY 1) " +
        "SELECT symbol, n_days, round(a, 6) AS amihud FROM a"),
    // rolling beta replay: equal-weight market return (exact decimal sum /
    // count) joined back, then the same 24-row covar_pop/var_pop window
    "rolling_beta" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "r0 AS (SELECT symbol, bucket_ts, close, " +
        "lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS prev_close FROM c), " +
        "r AS (SELECT symbol, bucket_ts, round((close - prev_close) / " +
        "(CASE WHEN prev_close <> 0 THEN prev_close END), 6) AS ret FROM r0 WHERE prev_close IS NOT NULL), " +
        "r2 AS (SELECT * FROM r WHERE ret IS NOT NULL), " +
        "m AS (SELECT bucket_ts, CAST(sum(CAST(ret AS DECIMAL(18,6))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE) AS mkt_ret FROM r2 GROUP BY 1), " +
        "j AS (SELECT r2.symbol, r2.bucket_ts, r2.ret, m.mkt_ret FROM r2 JOIN m ON r2.bucket_ts = m.bucket_ts), " +
        "wd AS (SELECT symbol, bucket_ts, count(*) OVER w AS cnt, " +
        "covar_pop(ret, mkt_ret) OVER w AS cov_rm, var_pop(mkt_ret) OVER w AS var_m FROM j " +
        "WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)) " +
        "SELECT symbol, bucket_ts, round(cov_rm / (CASE WHEN var_m <> 0 THEN var_m END), 6) AS beta " +
        "FROM wd WHERE cnt = 24"),
    // Holt replay: the recursive CTE folds the same fixed-order double
    // recursion over per-symbol ORDERED close arrays (struct-accumulator
    // list_reduce is NOT used: DuckDB 1.0 evaluates dependent struct
    // fields inconsistently - measured); literals 0.5/0.3 have exact
    // double complements so both engines fold bit-identically
    "holt_forecast" ->
      (s"WITH RECURSIVE t AS ($TradesSql), c AS (${candlesSql(3600000000L)}), " +
        "per AS (SELECT symbol, list(close ORDER BY bucket_ts) AS cs, " +
        "list(bucket_ts ORDER BY bucket_ts) AS tss FROM c GROUP BY 1), " +
        "r AS (SELECT symbol, 1 AS i, cs[1] AS l, 0.0::DOUBLE AS b, cs, tss FROM per " +
        "UNION ALL SELECT symbol, i + 1, " +
        "0.5 * cs[i + 1] + 0.5 * (l + b), " +
        "0.3 * ((0.5 * cs[i + 1] + 0.5 * (l + b)) - l) + 0.7 * b, cs, tss FROM r WHERE i < len(cs)) " +
        "SELECT symbol, tss[i] AS bucket_ts, cs[i] AS close, round(l, 6) AS level, " +
        "round(b, 6) AS trend, round(l + b, 6) AS forecast FROM r"),
    // OLS trend replay: integer/exact-decimal co-moment sums, closed-form
    // slope/intercept/R2 in identical double op order, guarded divisors
    "trend_ols" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "xy AS (SELECT symbol, CAST(row_number() OVER (PARTITION BY symbol ORDER BY bucket_ts) - 1 AS BIGINT) AS x, " +
        "CAST(close AS DECIMAL(18,2)) AS y FROM c), " +
        "a AS (SELECT symbol, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sx2, " +
        "CAST(sum(y) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(y * y AS DECIMAL(38,4))) AS DOUBLE) AS sy2, " +
        "CAST(sum(CAST(CAST(x AS DECIMAL(18,2)) * y AS DECIMAL(38,4))) AS DOUBLE) AS sxy FROM xy GROUP BY 1), " +
        "b AS (SELECT symbol, n, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd, " +
        "CAST(sx2 AS DOUBLE) AS sx2d, sy, sy2, sxy FROM a), " +
        "f AS (SELECT symbol, n, nd, sxd, sy, " +
        "nd * sx2d - sxd * sxd AS dx, nd * sy2 - sy * sy AS dyv, nd * sxy - sxd * sy AS cov FROM b) " +
        "SELECT symbol, n, round(cov / (CASE WHEN dx <> 0 THEN dx END), 6) AS slope, " +
        "round((sy - (cov / (CASE WHEN dx <> 0 THEN dx END)) * sxd) / nd, 6) AS intercept, " +
        "round((cov * cov) / (CASE WHEN dx * dyv <> 0 THEN dx * dyv END), 6) AS r2 FROM f"),
    // EWMA vol replay: same unrounded-return recursion via list_reduce
    // with a scalar DOUBLE accumulator (safe, unlike struct accumulators);
    // (1 - lambda) spelled as the double expression both engines compute
    "ewma_vol" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "r0 AS (SELECT symbol, bucket_ts, close, " +
        "lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS prev_close FROM c), " +
        "r AS (SELECT symbol, bucket_ts, (close - prev_close) / prev_close AS ret FROM r0 " +
        "WHERE prev_close IS NOT NULL AND prev_close <> 0), " +
        "l AS (SELECT symbol, bucket_ts, ret, list(ret * ret) OVER (" +
        "PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r2s FROM r) " +
        "SELECT symbol, bucket_ts, round(ret, 6) AS ret, " +
        "round(sqrt(list_reduce(r2s, (acc, x) -> 0.94 * acc + (CAST(1 AS DOUBLE) - 0.94) * x)), 6) AS ewma_vol FROM l"),
    // Hurst replay: same lag window, same exact-decimal co-moments, the
    // log-k axis as literal multiples of ln 2, 5-point OLS on decimal
    // sums in identical double op order
    "hurst" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "lg AS (SELECT symbol, close, " +
        Seq(1, 2, 4, 8, 16).map(k => s"lag(close, $k) OVER w AS p$k").mkString(", ") +
        " FROM c WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts)), " +
        "rr AS (SELECT symbol, " +
        Seq(1, 2, 4, 8, 16).map(k =>
          s"CASE WHEN close > 0 AND p$k > 0 THEN CAST(round(ln(close / p$k), 6) AS DECIMAL(9,6)) END AS r$k").mkString(", ") +
        " FROM lg), " +
        "a AS (SELECT symbol, " +
        Seq(1, 2, 4, 8, 16).map(k =>
          s"count(r$k) AS n$k, CAST(sum(r$k) AS DOUBLE) AS s1_$k, " +
            s"CAST(sum(CAST(r$k * r$k AS DECIMAL(18,12))) AS DOUBLE) AS s2_$k").mkString(", ") +
        " FROM rr GROUP BY 1), " +
        "pts AS (" +
        Seq(1, 2, 4, 8, 16).zipWithIndex.map { case (k, i) =>
          s"SELECT symbol, $i AS i, n$k AS n, s1_$k AS s1, s2_$k AS s2 FROM a"
        }.mkString(" UNION ALL ") + "), " +
        "pv AS (SELECT symbol, i, s2 / CAST(n AS DOUBLE) - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) AS v " +
        "FROM pts WHERE n >= 2), " +
        "pxy AS (SELECT symbol, CAST(i AS DOUBLE) * 0.6931471805599453 AS x, round(ln(v), 6) AS y FROM pv WHERE v > 0), " +
        "f AS (SELECT symbol, CAST(count(*) AS BIGINT) AS n_scales, " +
        "CAST(sum(CAST(round(x, 12) AS DECIMAL(18,12))) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(round(y, 6) AS DECIMAL(18,12))) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(round(x * x, 12) AS DECIMAL(18,12))) AS DOUBLE) AS sxx, " +
        "CAST(sum(CAST(round(x * y, 12) AS DECIMAL(18,12))) AS DOUBLE) AS sxy FROM pxy GROUP BY 1) " +
        "SELECT symbol, n_scales, " +
        "round((CAST(n_scales AS DOUBLE) * sxy - sx * sy) / " +
        "(CASE WHEN CAST(n_scales AS DOUBLE) * sxx - sx * sx <> 0 THEN CAST(n_scales AS DOUBLE) * sxx - sx * sx END) / 2.0, 6) AS hurst " +
        "FROM f WHERE n_scales >= 3"),
    // VaR/ES replay: micro-unit returns, quantile_cont == Spark's exact
    // interpolated percentile over integers, integer tail filter + sums
    "var_es" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "r0 AS (SELECT symbol, bucket_ts, close, " +
        "lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS prev_close FROM c), " +
        "r AS (SELECT symbol, CAST(CAST(round((close - prev_close) / prev_close, 6) AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS rm " +
        "FROM r0 WHERE prev_close IS NOT NULL AND prev_close <> 0), " +
        "v AS (SELECT symbol, count(*) AS n, CAST(round(quantile_cont(rm, 0.05), 0) AS BIGINT) AS var_micro FROM r GROUP BY 1), " +
        "tl AS (SELECT r.symbol, rm, var_micro, n FROM r JOIN v ON r.symbol = v.symbol WHERE rm <= var_micro) " +
        "SELECT symbol, n, var_micro / 1000000.0 AS var_ret, " +
        "(CAST(sum(rm) AS DOUBLE) / CAST(count(*) AS DOUBLE)) / 1000000.0 AS es_ret, " +
        "count(*) AS n_tail FROM tl GROUP BY symbol, n, var_micro"),
    // seasonal decomposition replay: identical centered window, identical
    // exact-decimal seasonal means, finals rounded from unrounded parts
    "seasonal_decompose" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "b AS (SELECT symbol, bucket_ts, close, count(*) OVER w AS cnt, " +
        "CAST(sum(CAST(close AS DECIMAL(18,2))) OVER w AS DOUBLE) / 24.0 AS trend FROM c " +
        "WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)), " +
        "b2 AS (SELECT symbol, bucket_ts, close, trend, close - trend AS detr, " +
        "CAST(hour(bucket_ts) AS BIGINT) AS hod FROM b WHERE cnt = 24), " +
        "s0 AS (SELECT symbol, hod, CAST(sum(CAST(round(detr, 6) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS n_micros, " +
        "CAST(count(*) AS BIGINT) AS c FROM b2 GROUP BY 1, 2), " +
        "s AS (SELECT symbol, hod, CASE WHEN n_micros >= 0 THEN (2 * n_micros + c) // (2 * c) " +
        "ELSE -((2 * (-n_micros) + c) // (2 * c)) END AS s_micros FROM s0) " +
        "SELECT b2.symbol, bucket_ts, close, round(trend, 6) AS trend, " +
        "s_micros / 1000000.0 AS seasonal, " +
        "(CAST(CAST(round(close, 6) AS DECIMAL(18,6)) * 1000000 AS BIGINT) - " +
        "CAST(CAST(round(trend, 6) AS DECIMAL(18,6)) * 1000000 AS BIGINT) - s_micros) / 1000000.0 AS residual " +
        "FROM b2 JOIN s ON b2.symbol = s.symbol AND b2.hod = s.hod"),
    // Kyle lambda replay: the tick_rule side-classification CTEs, then the
    // SAME bucket agg nets signed flow AND picks open/close (min_by/max_by
    // on the unique ts); exact-decimal co-moments, slope in identical
    // double op order, scaled x1e6
    "kyle_lambda" -> withTrades(
      ", x AS (SELECT symbol, ts, price, qty, " +
        "lag(price) OVER (PARTITION BY symbol ORDER BY ts) AS pp FROM t), " +
        "y AS (SELECT symbol, ts, price, qty, CASE WHEN price > pp THEN 1 " +
        "WHEN price < pp THEN -1 END AS tick FROM x), " +
        "z AS (SELECT symbol, ts, price, qty, last_value(tick IGNORE NULLS) OVER (" +
        "PARTITION BY symbol ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS side FROM y), " +
        "g AS (SELECT symbol, make_timestamp(epoch_us(ts) - epoch_us(ts) % 3600000000) AS bucket_ts, " +
        "CAST(sum(CASE WHEN side = 1 THEN CAST(qty AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) - " +
        "sum(CASE WHEN side = -1 THEN CAST(qty AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS x, " +
        "CAST(CAST(max_by(price, ts) AS DECIMAL(18,2)) - CAST(min_by(price, ts) AS DECIMAL(18,2)) AS DECIMAL(18,2)) AS y " +
        "FROM z GROUP BY 1, 2), " +
        "a AS (SELECT symbol, count(*) AS n_buckets, CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(x * x AS DECIMAL(38,4))) AS DOUBLE) AS sxx, " +
        "CAST(sum(CAST(x * y AS DECIMAL(38,4))) AS DOUBLE) AS sxy FROM g GROUP BY 1) " +
        "SELECT symbol, n_buckets, round((CAST(n_buckets AS DOUBLE) * sxy - sx * sy) / " +
        "(CASE WHEN CAST(n_buckets AS DOUBLE) * sxx - sx * sx <> 0 THEN CAST(n_buckets AS DOUBLE) * sxx - sx * sx END) " +
        "* 1000000.0, 6) AS kyle_lambda FROM a"),
    // variance-ratio replay: the hurst lag/co-moment recipe at q=1,2,4,8;
    // ratios in identical double op order, guarded on n_q and v1
    "variance_ratio" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "lg AS (SELECT symbol, close, " +
        Seq(1, 2, 4, 8).map(k => s"lag(close, $k) OVER w AS p$k").mkString(", ") +
        " FROM c WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts)), " +
        "rr AS (SELECT symbol, " +
        Seq(1, 2, 4, 8).map(k =>
          s"CASE WHEN close > 0 AND p$k > 0 THEN CAST(round(ln(close / p$k), 6) AS DECIMAL(9,6)) END AS r$k").mkString(", ") +
        " FROM lg), " +
        "a AS (SELECT symbol, " +
        Seq(1, 2, 4, 8).map(k =>
          s"count(r$k) AS n$k, CAST(sum(r$k) AS DOUBLE) AS s1_$k, " +
            s"CAST(sum(CAST(r$k * r$k AS DECIMAL(18,12))) AS DOUBLE) AS s2_$k").mkString(", ") +
        " FROM rr GROUP BY 1), " +
        "v AS (SELECT symbol, n1, n2, n4, n8, " +
        Seq(1, 2, 4, 8).map(k =>
          s"s2_$k / CAST(n$k AS DOUBLE) - (s1_$k / CAST(n$k AS DOUBLE)) * (s1_$k / CAST(n$k AS DOUBLE)) AS v$k").mkString(", ") +
        " FROM a WHERE n1 >= 2) " +
        "SELECT symbol, n1 AS n_rets, " +
        Seq(2, 4, 8).map(k =>
          s"round(v$k / (CASE WHEN n$k >= 2 AND v1 > 0 THEN v1 END) / $k.0, 6) AS vr$k").mkString(", ") +
        " FROM v"),
    // bipower-variation replay: intraday lags partitioned by (symbol,
    // day), exact DECIMAL(28,12) term sums, literal pi/2, RV/BV emitted
    // as unrounded doubles (bit-identical: casts of exact decimal sums)
    "realized_jump" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "d AS (SELECT symbol, CAST(date_trunc('day', bucket_ts) AS TIMESTAMP) AS day, bucket_ts, close FROM c), " +
        "p AS (SELECT symbol, day, bucket_ts, close, " +
        "lag(close) OVER (PARTITION BY symbol, day ORDER BY bucket_ts) AS prev_close FROM d), " +
        "r AS (SELECT symbol, day, bucket_ts, CAST(round(ln(close / prev_close), 6) AS DECIMAL(9,6)) AS ret " +
        "FROM p WHERE prev_close IS NOT NULL AND prev_close > 0 AND close > 0), " +
        "r2 AS (SELECT symbol, day, ret, lag(ret) OVER (PARTITION BY symbol, day ORDER BY bucket_ts) AS prev_ret FROM r), " +
        "a AS (SELECT symbol, day, count(ret) AS n_rets, " +
        "CAST(sum(CAST(ret * ret AS DECIMAL(28,12))) AS DOUBLE) AS rv, " +
        "CAST(sum(CAST(abs(ret) * abs(prev_ret) AS DECIMAL(28,12))) AS DOUBLE) AS bp, " +
        "count(prev_ret) AS n_pairs FROM r2 GROUP BY 1, 2) " +
        "SELECT symbol, day, n_rets, rv, 1.5707963267948966 * bp AS bv, " +
        "greatest(rv - 1.5707963267948966 * bp, 0.0) AS jump, " +
        "round(greatest(rv - 1.5707963267948966 * bp, 0.0) / (CASE WHEN rv > 0 THEN rv END), 6) AS jump_share " +
        "FROM a WHERE n_pairs >= 1"),
    // calendar-effects replay: DuckDB's 0-based dayofweek shifts to
    // Spark's 1-based; exact decimal return co-moments per (symbol, dow)
    "calendar_effects" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "r0 AS (SELECT symbol, bucket_ts, close, " +
        "lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS prev_close FROM c), " +
        "r AS (SELECT symbol, CAST(dayofweek(bucket_ts) + 1 AS INTEGER) AS dow, " +
        "CAST(round((close - prev_close) / (CASE WHEN prev_close <> 0 THEN prev_close END), 6) AS DECIMAL(18,6)) AS r " +
        "FROM r0 WHERE prev_close IS NOT NULL AND prev_close <> 0), " +
        // the CAST to width 19 forces DuckDB's INT128 multiply path (an
        // (18,6) square overflows its INT64 fast path on jumpy returns)
        "a AS (SELECT symbol, dow, count(*) AS n, CAST(sum(r) AS DOUBLE) AS s1, " +
        "CAST(sum(CAST(CAST(r AS DECIMAL(19,6)) * r AS DECIMAL(38,12))) AS DOUBLE) AS s2 FROM r GROUP BY 1, 2) " +
        "SELECT symbol, dow, n, round(s1 / CAST(n AS DOUBLE), 6) AS mean_ret, " +
        "round(sqrt(greatest(s2 / CAST(n AS DOUBLE) - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)), 0.0)), 6) AS vol_ret FROM a"),
    // Aroon replay: the packed-BIGINT argmax key (cents*1e9 + idx) under a
    // plain windowed max in both engines; full 26-row frames only
    "aroon" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "i AS (SELECT symbol, bucket_ts, CAST(row_number() OVER (PARTITION BY symbol ORDER BY bucket_ts) AS BIGINT) AS idx, " +
        "CAST(round(high * 100, 0) AS BIGINT) AS hm, CAST(round(low * 100, 0) AS BIGINT) AS lm FROM c), " +
        "k AS (SELECT symbol, bucket_ts, idx, hm * 1000000000 + idx AS hkey, " +
        "(1000000000 - lm) * 1000000000 + idx AS lkey FROM i), " +
        "wd AS (SELECT symbol, bucket_ts, idx, count(*) OVER w AS cnt, " +
        "(max(hkey) OVER w) % 1000000000 AS hi_idx, (max(lkey) OVER w) % 1000000000 AS lo_idx FROM k " +
        "WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 25 PRECEDING AND CURRENT ROW)) " +
        "SELECT symbol, bucket_ts, " +
        "round(100.0 * (25.0 - CAST(idx - hi_idx AS DOUBLE)) / 25.0, 6) AS aroon_up, " +
        "round(100.0 * (25.0 - CAST(idx - lo_idx AS DOUBLE)) / 25.0, 6) AS aroon_down, " +
        "round(round(100.0 * (25.0 - CAST(idx - hi_idx AS DOUBLE)) / 25.0, 6) - " +
        "round(100.0 * (25.0 - CAST(idx - lo_idx AS DOUBLE)) / 25.0, 6), 6) AS aroon_osc " +
        "FROM wd WHERE cnt = 26"),
    // event-study replay: the volumeAnomaly z-screen as the event source,
    // generate_series offsets joined on (symbol, idx), ARs in exact
    // DECIMAL(18,6), CAR an exact-decimal running sum cast to double
    "event_study" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "b AS (SELECT symbol, bucket_ts, volume, CAST(row_number() OVER w AS BIGINT) AS idx, " +
        "round((close - lag(close) OVER w) / (CASE WHEN lag(close) OVER w <> 0 THEN lag(close) OVER w END), 6) AS ret " +
        "FROM c WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts)), " +
        "st AS (SELECT symbol, count(*) AS n, CAST(sum(CAST(volume AS DECIMAL(18,2))) AS DOUBLE) AS sv1, " +
        "CAST(sum(CAST(CAST(volume AS DECIMAL(18,2)) * CAST(volume AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sv2, " +
        "count(ret) AS nr, CAST(sum(CAST(ret AS DECIMAL(18,6))) AS DOUBLE) AS sr1 FROM b GROUP BY 1), " +
        "ev AS (SELECT b.symbol, b.idx AS ev_idx, b.bucket_ts AS event_ts FROM b JOIN st ON b.symbol = st.symbol " +
        "WHERE (st.sv2 - st.n * (st.sv1 / st.n) * (st.sv1 / st.n)) / (st.n - 1) > 0 AND " +
        "round((b.volume - st.sv1 / st.n) / sqrt((st.sv2 - st.n * (st.sv1 / st.n) * (st.sv1 / st.n)) / (st.n - 1)), 6) >= 2.0), " +
        "offs AS (SELECT ev.symbol, ev.event_ts, o.off, ev.ev_idx + o.off AS idx " +
        "FROM ev CROSS JOIN (SELECT unnest(generate_series(-3, 3)) AS off) o), " +
        "mr AS (SELECT symbol, sr1 / CAST(nr AS DOUBLE) AS mean_ret FROM st WHERE nr >= 1), " +
        "j AS (SELECT b.symbol, offs.event_ts, offs.off, b.ret, " +
        "CAST(round(b.ret - mr.mean_ret, 6) AS DECIMAL(18,6)) AS ar " +
        "FROM b JOIN offs ON b.symbol = offs.symbol AND b.idx = offs.idx " +
        "JOIN mr ON b.symbol = mr.symbol WHERE b.ret IS NOT NULL) " +
        "SELECT symbol, event_ts, off, ret, CAST(ar AS DOUBLE) AS ar, " +
        "CAST(sum(ar) OVER (PARTITION BY symbol, event_ts ORDER BY off " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS car FROM j"),
    // Kaplan-Meier replay: integer lifetime division (// here, `div` in
    // Spark - a double roundtrip would round vs truncate), exact decimal
    // ln-term sums, exhausted-stratum flag pins survival 0
    "kaplan_meier" ->
      ("WITH mx AS (SELECT max(epoch_us(ts)) AS max_us FROM events), " +
        "u AS (SELECT user_id, min(epoch_us(ts)) AS f_us, max(epoch_us(ts)) AS l_us FROM events GROUP BY 1), " +
        "lt AS (SELECT (l_us - f_us) // 86400000000 AS lifetime_days, " +
        "(l_us + 86400000000 <= max_us) AS churned FROM u, mx), " +
        "g AS (SELECT lifetime_days, CAST(count(*) AS BIGINT) AS n_total, " +
        "CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS n_churn FROM lt GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(n_total) AS BIGINT) AS all_users FROM g), " +
        "r AS (SELECT g.*, CAST(all_users - COALESCE(sum(n_total) OVER " +
        "(ORDER BY lifetime_days ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk FROM g, tot), " +
        "r2 AS (SELECT lifetime_days, n_risk, n_churn, " +
        "CASE WHEN n_churn < n_risk THEN CAST(round(ln(1.0 - CAST(n_churn AS DOUBLE) / CAST(n_risk AS DOUBLE)), 12) AS DECIMAL(28,12)) END AS term, " +
        "CASE WHEN n_churn = n_risk THEN 1 ELSE 0 END AS dead FROM r), " +
        "r3 AS (SELECT lifetime_days, n_risk, n_churn, max(dead) OVER wc AS dead_flag, " +
        "CAST(sum(term) OVER wc AS DOUBLE) AS logsum FROM r2 " +
        "WINDOW wc AS (ORDER BY lifetime_days ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
        "SELECT lifetime_days, n_risk, n_churn, " +
        "CASE WHEN dead_flag = 1 THEN 0.0 ELSE round(exp(logsum), 6) END AS survival " +
        "FROM r3 WHERE n_churn > 0"),
    "volume_profile" -> withTrades(
      ", rng AS (SELECT symbol, min(price) AS lo, max(price) AS hi FROM t GROUP BY 1), " +
        "b AS (SELECT t.symbol, qty, CASE WHEN hi = lo THEN 0 " +
        "ELSE CAST(least(floor((price - lo) / ((hi - lo) / 20.0)), 19.0) AS BIGINT) END AS band " +
        "FROM t JOIN rng ON t.symbol = rng.symbol) " +
        "SELECT symbol, band, count(*) AS n_trades, " +
        "CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS volume " +
        "FROM b GROUP BY 1, 2"),
    "funnel_3stage" ->
      ("WITH v AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'), " +
        "c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'), " +
        "p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'), " +
        "vc AS (SELECT v.user_id, v.ts, v.event_id, c.ts AS c_ts, c.event_id AS c_event_id " +
        "FROM v JOIN c ON v.user_id = c.user_id AND c.ts > v.ts AND epoch_us(c.ts) <= epoch_us(v.ts) + 86400000000), " +
        "vcp AS (SELECT vc.ts, vc.event_id, vc.c_event_id, p.event_id AS p_event_id " +
        "FROM vc JOIN p ON vc.user_id = p.user_id AND p.ts > vc.c_ts AND epoch_us(p.ts) <= epoch_us(vc.c_ts) + 86400000000) " +
        "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, " +
        "count(DISTINCT event_id) AS n_converting_views, " +
        "count(DISTINCT c_event_id) AS n_converting_clicks, " +
        "count(DISTINCT p_event_id) AS n_purchases " +
        "FROM vcp GROUP BY 1"),
    "return_moments" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "r0 AS (SELECT symbol, close, prev_close FROM (" +
        "SELECT symbol, close, lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS prev_close FROM c) " +
        "WHERE prev_close IS NOT NULL), " +
        "r AS (SELECT symbol, CAST(CASE WHEN close > 0 AND prev_close > 0 " +
        "THEN round(ln(close / prev_close), 6) END AS DECIMAL(9,6)) AS r FROM r0), " +
        "a AS (SELECT symbol, count(r) AS n, CAST(sum(r) AS DOUBLE) AS s1, " +
        "CAST(sum(CAST(r*r AS DECIMAL(18,12))) AS DOUBLE) AS s2, " +
        "CAST(sum(CAST(r*r*r AS DECIMAL(27,18))) AS DOUBLE) AS s3, " +
        "CAST(sum(CAST(r*r*r*r AS DECIMAL(36,24))) AS DOUBLE) AS s4 FROM r GROUP BY 1), " +
        "b AS (SELECT symbol, n, CAST(n AS DOUBLE) AS nd, s1, s2, s3, s4, " +
        "s1 / CAST(n AS DOUBLE) AS m FROM a), " +
        "d AS (SELECT *, s2 / nd - m * m AS v FROM b) " +
        "SELECT symbol, n, round(m, 6) AS mean_ret, round(sqrt(v), 6) AS stddev_ret, " +
        "round((s3 / nd - 3.0 * m * (s2 / nd) + 2.0 * m * m * m) / (sqrt(v) * v), 6) AS skew_ret, " +
        "round((s4 / nd - 4.0 * m * (s3 / nd) + 6.0 * m * m * (s2 / nd) - 3.0 * m * m * m * m) / (v * v) - 3.0, 6) AS kurtosis_ret " +
        "FROM d"),
    "candle_validate" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}) " +
        "SELECT symbol, count(*) AS n_candles, " +
        "CAST(sum(CASE WHEN high < low OR high < greatest(open, close) OR low > least(open, close) THEN 1 ELSE 0 END) AS BIGINT) AS n_ohlc_violations, " +
        "CAST(sum(CASE WHEN epoch_us(bucket_ts) % 3600000000 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_off_grid, " +
        "CAST(sum(CASE WHEN volume <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonpos_volume, " +
        "CAST((max(epoch_us(bucket_ts)) - min(epoch_us(bucket_ts))) // 3600000000 + 1 - count(*) AS BIGINT) AS n_missing_buckets " +
        "FROM c GROUP BY 1"),
    "rolling_vol" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "r AS (SELECT symbol, bucket_ts, (close - prev_close) / prev_close AS ret FROM (" +
        "SELECT symbol, bucket_ts, close, lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS prev_close FROM c) " +
        "WHERE prev_close IS NOT NULL), " +
        "f AS (SELECT symbol, bucket_ts, " +
        "CAST(sum(CAST(ret AS DECIMAL(18,12))) OVER w AS DOUBLE) AS sum_r, " +
        "CAST(sum(CAST(CAST(ret AS DECIMAL(18,12)) * CAST(ret AS DECIMAL(18,12)) AS DECIMAL(38,24))) OVER w AS DOUBLE) AS sum_r2, " +
        "count(ret) OVER w AS cnt FROM r " +
        "WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)) " +
        "SELECT symbol, bucket_ts, " +
        "round(sqrt(greatest((sum_r2 - sum_r * sum_r / CAST(cnt AS DOUBLE)) / CAST(cnt - 1 AS DOUBLE), 0.0)), 6) AS vol " +
        "FROM f WHERE cnt = 24"),
    "bollinger" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "f AS (SELECT symbol, bucket_ts, close, " +
        "CAST(sum(CAST(close AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_c, " +
        "CAST(sum(CAST(CAST(close AS DECIMAL(18,2)) * CAST(close AS DECIMAL(18,2)) AS DECIMAL(28,4))) OVER w AS DOUBLE) AS sum_c2, " +
        "count(*) OVER w AS cnt FROM c " +
        "WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)), " +
        "g AS (SELECT symbol, bucket_ts, close, sum_c / CAST(cnt AS DOUBLE) AS mean, " +
        "greatest((sum_c2 - sum_c * sum_c / CAST(cnt AS DOUBLE)) / CAST(cnt - 1 AS DOUBLE), 0.0) AS var " +
        "FROM f WHERE cnt = 20) " +
        "SELECT symbol, bucket_ts, close, mean, " +
        "mean + 2.0 * sqrt(var) AS upper, mean - 2.0 * sqrt(var) AS lower FROM g"),
    "rsi" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "p AS (SELECT symbol, bucket_ts, close, lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS prev FROM c), " +
        "d AS (SELECT symbol, bucket_ts, " +
        "greatest(CAST(close AS DECIMAL(18,2)) - CAST(prev AS DECIMAL(18,2)), CAST(0 AS DECIMAL(18,2))) AS gain, " +
        "greatest(-(CAST(close AS DECIMAL(18,2)) - CAST(prev AS DECIMAL(18,2))), CAST(0 AS DECIMAL(18,2))) AS loss " +
        "FROM p WHERE prev IS NOT NULL), " +
        "f AS (SELECT symbol, bucket_ts, " +
        "CAST(sum(gain) OVER w AS DOUBLE) AS sum_gain, " +
        "CAST(sum(loss) OVER w AS DOUBLE) AS sum_loss, count(*) OVER w AS cnt FROM d " +
        "WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)) " +
        "SELECT symbol, bucket_ts, round(CASE WHEN sum_loss = 0.0 THEN 100.0 " +
        "ELSE 100.0 - 100.0 / (1.0 + sum_gain / sum_loss) END, 6) AS rsi FROM f WHERE cnt = 14"),
    "macd" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "l AS (SELECT symbol, bucket_ts, list(close) OVER (PARTITION BY symbol ORDER BY bucket_ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS closes FROM c), " +
        "m AS (SELECT symbol, bucket_ts, " +
        "list_reduce(closes, (acc, x) -> (CAST(2 AS DOUBLE) / CAST(13 AS DOUBLE)) * x + " +
        "(CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE) / CAST(13 AS DOUBLE)) * acc) - " +
        "list_reduce(closes, (acc, x) -> (CAST(2 AS DOUBLE) / CAST(27 AS DOUBLE)) * x + " +
        "(CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE) / CAST(27 AS DOUBLE)) * acc) AS macd FROM l), " +
        "g0 AS (SELECT symbol, bucket_ts, macd, list(macd) OVER (PARTITION BY symbol ORDER BY bucket_ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS macds FROM m), " +
        "g AS (SELECT symbol, bucket_ts, macd, " +
        "list_reduce(macds, (acc, x) -> (CAST(2 AS DOUBLE) / CAST(10 AS DOUBLE)) * x + " +
        "(CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE) / CAST(10 AS DOUBLE)) * acc) AS sig FROM g0) " +
        "SELECT symbol, bucket_ts, round(macd, 6) AS macd, round(sig, 6) AS signal_line, " +
        "round(macd - sig, 6) AS histogram FROM g"),
    "stochastic" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "f AS (SELECT symbol, bucket_ts, close, max(high) OVER w AS hh, min(low) OVER w AS ll, " +
        "count(*) OVER w AS cnt FROM c " +
        "WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)), " +
        "g AS (SELECT symbol, bucket_ts, CASE WHEN hh <> ll THEN 100.0 * (close - ll) / (hh - ll) END AS k " +
        "FROM f WHERE cnt = 14) " +
        "SELECT symbol, bucket_ts, round(k, 6) AS pct_k, " +
        "round(((k + lag(k, 1) OVER wo) + lag(k, 2) OVER wo) / 3.0, 6) AS pct_d FROM g " +
        "WINDOW wo AS (PARTITION BY symbol ORDER BY bucket_ts)"),
    "williams_r" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "f AS (SELECT symbol, bucket_ts, close, max(high) OVER w AS hh, min(low) OVER w AS ll, " +
        "count(*) OVER w AS cnt FROM c " +
        "WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)) " +
        "SELECT symbol, bucket_ts, " +
        "round(CASE WHEN hh <> ll THEN -100.0 * (hh - close) / (hh - ll) END, 6) + 0.0 AS wpr " +
        "FROM f WHERE cnt = 14"),
    "anchored_vwap" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}) " +
        "SELECT symbol, bucket_ts, round(cum_pv / cum_v, 6) AS avwap, " +
        "round(cum_v, 6) AS cum_volume FROM (" +
        "SELECT symbol, bucket_ts, " +
        "CAST(sum(((high + low + close) / 3.0) * volume) OVER w AS DOUBLE) AS cum_pv, " +
        "CAST(sum(volume) OVER w AS DOUBLE) AS cum_v FROM c " +
        "WINDOW w AS (PARTITION BY symbol, date_trunc('day', bucket_ts) " +
        "ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
        "WHERE cum_v > 0"),
    "adx" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "x AS (SELECT symbol, bucket_ts, high, low, close, " +
        "lag(high) OVER ws AS ph, lag(low) OVER ws AS pl, lag(close) OVER ws AS pc FROM c " +
        "WINDOW ws AS (PARTITION BY symbol ORDER BY bucket_ts)), " +
        "y AS (SELECT symbol, bucket_ts, " +
        "greatest(high - low, abs(high - pc), abs(low - pc)) AS tr, " +
        "CASE WHEN (high - ph) > (pl - low) AND (high - ph) > 0 THEN high - ph ELSE 0.0 END AS pdm, " +
        "CASE WHEN (pl - low) > (high - ph) AND (pl - low) > 0 THEN pl - low ELSE 0.0 END AS ndm " +
        "FROM x WHERE ph IS NOT NULL), " +
        "z AS (SELECT symbol, bucket_ts, list(tr) OVER wu AS trs, " +
        "list(pdm) OVER wu AS pdms, list(ndm) OVER wu AS ndms FROM y " +
        "WINDOW wu AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), " +
        // Wilder smoothing = the alpha = 1/14 EMA fold, seeded by
        // list_reduce's first element; constants and operation order
        // mirror the Spark sweep exactly
        "w AS (SELECT symbol, bucket_ts, " +
        "list_reduce(trs, (acc, v) -> (1.0/14.0) * v + (1 - 1.0/14.0) * acc) AS str, " +
        "list_reduce(pdms, (acc, v) -> (1.0/14.0) * v + (1 - 1.0/14.0) * acc) AS sp, " +
        "list_reduce(ndms, (acc, v) -> (1.0/14.0) * v + (1 - 1.0/14.0) * acc) AS sn FROM z), " +
        "d AS (SELECT symbol, bucket_ts, " +
        "CASE WHEN str <> 0 THEN 100.0 * sp / str END AS pdi, " +
        "CASE WHEN str <> 0 THEN 100.0 * sn / str END AS ndi FROM w), " +
        "e AS (SELECT symbol, bucket_ts, pdi, ndi, " +
        "CASE WHEN pdi + ndi <> 0 THEN 100.0 * abs(pdi - ndi) / (pdi + ndi) END AS dx FROM d), " +
        "g AS (SELECT symbol, bucket_ts, pdi, ndi, " +
        "list_reduce(list(dx) OVER wu, (acc, v) -> (1.0/14.0) * v + (1 - 1.0/14.0) * acc) AS adx FROM e " +
        "WINDOW wu AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
        "SELECT symbol, bucket_ts, round(pdi, 6) AS plus_di, round(ndi, 6) AS minus_di, " +
        "round(adx, 6) AS adx FROM g"),
    "cci" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "t2 AS (SELECT symbol, bucket_ts, (high + low + close) / 3.0 AS tp FROM c), " +
        "f AS (SELECT symbol, bucket_ts, tp, list(tp) OVER w AS tps, count(*) OVER w AS cnt FROM t2 " +
        "WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)), " +
        // both sma and mean deviation are in-order left folds over the
        // window list (CAST keeps the 0.0 seed a DOUBLE), mirroring the
        // Spark aggregate() lambdas term for term
        "g AS (SELECT symbol, bucket_ts, tp, " +
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), tps), (acc, x) -> acc + x) / 20 AS sma_tp, tps " +
        "FROM f WHERE cnt = 20), " +
        "h AS (SELECT symbol, bucket_ts, tp, sma_tp, " +
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(tps, x -> abs(x - sma_tp))), (acc, x) -> acc + x) / 20 AS md FROM g) " +
        "SELECT symbol, bucket_ts, " +
        "round(CASE WHEN md <> 0.0 THEN (tp - sma_tp) / (0.015 * md) END, 6) AS cci FROM h"),
    "mfi" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "t2 AS (SELECT symbol, bucket_ts, volume, (high + low + close) / 3.0 AS tp, " +
        "lag((high + low + close) / 3.0, 1) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS tp_prev FROM c), " +
        "f AS (SELECT symbol, bucket_ts, " +
        "CASE WHEN tp > tp_prev THEN tp * volume ELSE 0.0 END AS pos_mf, " +
        "CASE WHEN tp < tp_prev THEN tp * volume ELSE 0.0 END AS neg_mf " +
        "FROM t2 WHERE tp_prev IS NOT NULL), " +
        "g AS (SELECT symbol, bucket_ts, CAST(sum(pos_mf) OVER w AS DOUBLE) AS pos_sum, " +
        "CAST(sum(neg_mf) OVER w AS DOUBLE) AS neg_sum, count(*) OVER w AS cnt FROM f " +
        "WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)) " +
        "SELECT symbol, bucket_ts, " +
        "round(CASE WHEN neg_sum = 0.0 AND pos_sum = 0.0 THEN NULL " +
        "WHEN neg_sum = 0.0 THEN 100.0 " +
        "ELSE 100.0 - 100.0 / (1.0 + pos_sum / neg_sum) END, 6) AS mfi " +
        "FROM g WHERE cnt = 14"),
    "donchian" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "f AS (SELECT symbol, bucket_ts, close, max(high) OVER w AS upper_band, " +
        "min(low) OVER w AS lower_band, count(*) OVER w AS cnt FROM c " +
        "WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)) " +
        "SELECT symbol, bucket_ts, close, upper_band, lower_band, " +
        "round((upper_band + lower_band) / 2.0, 6) AS middle FROM f WHERE cnt = 20"),
    "keltner" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "l AS (SELECT symbol, bucket_ts, list(close) OVER (PARTITION BY symbol ORDER BY bucket_ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS closes FROM c), " +
        "e AS (SELECT symbol, bucket_ts, " +
        "list_reduce(closes, (acc, x) -> (CAST(2 AS DOUBLE) / CAST(21 AS DOUBLE)) * x + " +
        "(CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE) / CAST(21 AS DOUBLE)) * acc) AS ema FROM l), " +
        "p AS (SELECT symbol, bucket_ts, high, low, close, " +
        "lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS prev_close FROM c), " +
        "d AS (SELECT symbol, bucket_ts, greatest(" +
        "CAST(high AS DECIMAL(18,2)) - CAST(low AS DECIMAL(18,2)), " +
        "abs(CAST(high AS DECIMAL(18,2)) - CAST(prev_close AS DECIMAL(18,2))), " +
        "abs(CAST(low AS DECIMAL(18,2)) - CAST(prev_close AS DECIMAL(18,2)))) AS tr " +
        "FROM p WHERE prev_close IS NOT NULL), " +
        "f AS (SELECT symbol, bucket_ts, CAST(sum(tr) OVER w AS DOUBLE) AS sum_tr, " +
        "count(*) OVER w AS cnt FROM d " +
        "WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)), " +
        "g AS (SELECT symbol, bucket_ts, round(sum_tr / CAST(cnt AS DOUBLE), 6) AS atr " +
        "FROM f WHERE cnt = 10) " +
        "SELECT e.symbol, e.bucket_ts, round(ema, 6) AS center, " +
        "round(ema + 2.0 * atr, 6) AS upper_band, round(ema - 2.0 * atr, 6) AS lower_band " +
        "FROM e JOIN g ON e.symbol = g.symbol AND e.bucket_ts = g.bucket_ts"),
    "acf" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "r AS (SELECT symbol, bucket_ts, (close - prev_close) / prev_close AS ret FROM (" +
        "SELECT symbol, bucket_ts, close, lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS prev_close FROM c) " +
        "WHERE prev_close IS NOT NULL), " +
        "lg AS (SELECT symbol, ret, " +
        (1 to 5).map(l =>
          s"lag(ret, $l) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS l$l").mkString(", ") +
        " FROM r), " +
        "st AS (" +
        (1 to 5).map(l =>
          s"SELECT symbol, ret, CAST($l AS BIGINT) AS lag_n, l$l AS rlag FROM lg WHERE l$l IS NOT NULL")
          .mkString(" UNION ALL ") + ") " +
        "SELECT symbol, lag_n, count(*) AS n, round(corr(ret, rlag), 6) AS acf " +
        "FROM st GROUP BY 1, 2 HAVING count(*) > 1"),
    "hourly_profile" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}) " +
        "SELECT symbol, CAST(hour(bucket_ts) AS BIGINT) AS hour_of_day, count(*) AS n_buckets, " +
        "CAST(sum(CAST(volume AS DECIMAL(18,2))) AS DOUBLE) AS total_volume, " +
        "CAST(sum(CAST(volume AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_volume, " +
        "CAST(sum(trades) AS BIGINT) AS total_trades FROM c GROUP BY 1, 2"),
    "pivot_points" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "d AS (SELECT symbol, CAST(date_trunc('day', bucket_ts) AS TIMESTAMP) AS day, " +
        "max(high) AS h, min(low) AS l, max_by(close, bucket_ts) AS c FROM c GROUP BY 1, 2), " +
        "p AS (SELECT symbol, day, lag(h) OVER w AS ph, lag(l) OVER w AS pl, lag(c) OVER w AS pc " +
        "FROM d WINDOW w AS (PARTITION BY symbol ORDER BY day)), " +
        "f AS (SELECT symbol, day, ph, pl, (ph + pl + pc) / 3.0 AS pv FROM p WHERE ph IS NOT NULL) " +
        "SELECT symbol, day, round(pv, 6) AS pivot, " +
        "round(2.0 * pv - pl, 6) AS r1, round(2.0 * pv - ph, 6) AS s1, " +
        "round(pv + (ph - pl), 6) AS r2, round(pv - (ph - pl), 6) AS s2 FROM f"),
    "cusum" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "r AS (SELECT symbol, bucket_ts, (close - prev_close) / prev_close AS ret FROM (" +
        "SELECT symbol, bucket_ts, close, lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS prev_close FROM c) " +
        "WHERE prev_close IS NOT NULL), " +
        "st AS (SELECT symbol, count(ret) AS n, CAST(sum(CAST(ret AS DECIMAL(18,12))) AS DOUBLE) AS s1, " +
        "CAST(sum(CAST(CAST(ret AS DECIMAL(18,12)) * CAST(ret AS DECIMAL(18,12)) AS DECIMAL(38,24))) AS DOUBLE) AS s2 " +
        "FROM r GROUP BY 1), " +
        "st2 AS (SELECT symbol, mu, variance FROM (" +
        "SELECT symbol, n, mu, (s2 - n * mu * mu) / (n - 1) AS variance FROM (" +
        "SELECT symbol, n, s1, s2, s1 / n AS mu FROM st) x1 WHERE n >= 2) x2 " +
        "WHERE variance > 0), " +
        "zl AS (SELECT r.symbol, r.bucket_ts, (r.ret - st2.mu) / sqrt(st2.variance) AS z " +
        "FROM r JOIN st2 ON r.symbol = st2.symbol), " +
        "zz AS (SELECT symbol, bucket_ts, z, list(z) OVER (PARTITION BY symbol ORDER BY bucket_ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zs FROM zl), " +
        "ff AS (SELECT symbol, bucket_ts, z, " +
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), zs), (acc, x) -> greatest(CAST(0 AS DOUBLE), acc + x - 0.5)) AS sp, " +
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), zs), (acc, x) -> least(CAST(0 AS DOUBLE), acc + x + 0.5)) AS sn FROM zz) " +
        "SELECT symbol, bucket_ts, round(z, 6) AS zscore, round(sp, 6) AS cusum_pos, " +
        "round(sn, 6) AS cusum_neg, (sp > 4.0 OR sn < -4.0) AS breach FROM ff"),
    "ichimoku" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "f AS (SELECT symbol, bucket_ts, close, " +
        "(max(high) OVER w9 + min(low) OVER w9) / 2.0 AS conversion, " +
        "(max(high) OVER w26 + min(low) OVER w26) / 2.0 AS base, " +
        "(max(high) OVER w52 + min(low) OVER w52) / 2.0 AS span_b_now, " +
        "count(*) OVER w26 AS cnt FROM c " +
        "WINDOW w9 AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 8 PRECEDING AND CURRENT ROW), " +
        "w26 AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 25 PRECEDING AND CURRENT ROW), " +
        "w52 AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN 51 PRECEDING AND CURRENT ROW)), " +
        "g AS (SELECT symbol, bucket_ts, close, conversion, base, cnt, " +
        "lag((conversion + base) / 2.0, 26) OVER wo AS span_a, " +
        "lag(span_b_now, 26) OVER wo AS span_b, " +
        "lead(close, 26) OVER wo AS lagging_close FROM f " +
        "WINDOW wo AS (PARTITION BY symbol ORDER BY bucket_ts)) " +
        "SELECT symbol, bucket_ts, close, round(conversion, 6) AS conversion, " +
        "round(base, 6) AS base, round(span_a, 6) AS span_a, " +
        "round(span_b, 6) AS span_b, lagging_close FROM g WHERE cnt = 26"),
    "stickiness" ->
      ("WITH du AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id FROM events), " +
        "mx AS (SELECT max(day) AS max_day FROM du), " +
        "dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM du GROUP BY 1), " +
        "e AS (SELECT user_id, unnest(generate_series(day, day + INTERVAL 29 DAY, INTERVAL 1 DAY)) AS day FROM du), " +
        "mau AS (SELECT e.day, count(DISTINCT user_id) AS mau FROM e, mx " +
        "WHERE e.day <= mx.max_day GROUP BY 1) " +
        "SELECT dau.day, dau.dau, mau.mau, " +
        "round(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness " +
        "FROM dau JOIN mau ON dau.day = mau.day"),
    "market_breadth" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "p AS (SELECT symbol, bucket_ts, close, " +
        "lag(close) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS prev FROM c) " +
        "SELECT bucket_ts, " +
        "CAST(sum(CASE WHEN close > prev THEN 1 ELSE 0 END) AS BIGINT) AS n_up, " +
        "CAST(sum(CASE WHEN close < prev THEN 1 ELSE 0 END) AS BIGINT) AS n_down, " +
        "CAST(sum(CASE WHEN close = prev THEN 1 ELSE 0 END) AS BIGINT) AS n_flat, " +
        "CASE WHEN CAST(sum(CASE WHEN close < prev THEN 1 ELSE 0 END) AS BIGINT) > 0 THEN " +
        "round(CAST(sum(CASE WHEN close > prev THEN 1 ELSE 0 END) AS DOUBLE) / " +
        "CAST(sum(CASE WHEN close < prev THEN 1 ELSE 0 END) AS BIGINT), 6) END AS ad_ratio " +
        "FROM p WHERE prev IS NOT NULL GROUP BY 1"),
    "session_paths" ->
      ("WITH x AS (SELECT user_id, ts, event_id, event_type, " +
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events), " +
        "y AS (SELECT user_id, ts, event_id, event_type, CASE WHEN prev_ts IS NULL OR " +
        "epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS brk FROM x), " +
        "s AS (SELECT user_id, ts, event_id, event_type, " +
        "CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM y), " +
        "r AS (SELECT user_id, session_id, event_type, " +
        "row_number() OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id) AS pos FROM s), " +
        "pth AS (SELECT user_id, session_id, " +
        "array_to_string(list(event_type ORDER BY pos), '>') AS path FROM r WHERE pos <= 3 GROUP BY 1, 2), " +
        "agg AS (SELECT path, count(*) AS n_sessions FROM pth GROUP BY 1) " +
        "SELECT path, n_sessions FROM agg ORDER BY n_sessions DESC, path LIMIT 20"),
    "rfm_segments" ->
      ("WITH base AS (SELECT o_custkey AS custkey, max(o_orderdate) AS last_order, " +
        "count(*) AS frequency, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary " +
        "FROM orders GROUP BY 1), " +
        "mx AS (SELECT max(last_order) AS max_date FROM base), " +
        "b2 AS (SELECT custkey, CAST(date_diff('day', last_order, max_date) AS BIGINT) AS recency_days, " +
        "frequency, monetary FROM base, mx) " +
        "SELECT custkey, recency_days, frequency, monetary, r_q, f_q, m_q, " +
        "r_q * 100 + f_q * 10 + m_q AS rfm FROM (" +
        "SELECT custkey, recency_days, frequency, monetary, " +
        "CAST(ntile(4) OVER (ORDER BY recency_days, custkey) AS BIGINT) AS r_q, " +
        "CAST(ntile(4) OVER (ORDER BY frequency DESC, custkey) AS BIGINT) AS f_q, " +
        "CAST(ntile(4) OVER (ORDER BY monetary DESC, custkey) AS BIGINT) AS m_q FROM b2) x"),
    "inter_event_times" ->
      ("WITH x AS (SELECT user_id, ts, event_id, event_type, " +
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events), " +
        "g AS (SELECT event_type, epoch_us(ts) - epoch_us(prev_ts) AS gap_us FROM x " +
        "WHERE prev_ts IS NOT NULL) " +
        "SELECT event_type, count(*) AS n_gaps, " +
        "CAST(round(CAST(sum(gap_us) AS DOUBLE) / count(*), 0) AS BIGINT) AS mean_gap_us, " +
        "CAST(round(quantile_cont(gap_us, 0.5), 0) AS BIGINT) AS p50_gap_us, " +
        "CAST(round(quantile_cont(gap_us, 0.9), 0) AS BIGINT) AS p90_gap_us " +
        "FROM g GROUP BY 1"),
    "gini_by_nation" ->
      ("WITH sp AS (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend " +
        "FROM orders GROUP BY 1), " +
        "j AS (SELECT n.n_name, c.c_custkey, CAST(sp.spend AS DECIMAL(18,2)) AS spend " +
        "FROM sp JOIN customer c ON sp.o_custkey = c.c_custkey " +
        "JOIN nation n ON c.c_nationkey = n.n_nationkey), " +
        "r AS (SELECT n_name, c_custkey, spend, " +
        "row_number() OVER (PARTITION BY n_name ORDER BY spend, c_custkey) AS rk FROM j), " +
        "a AS (SELECT n_name, count(*) AS n_customers, CAST(sum(spend) AS DOUBLE) AS total_spend, " +
        "CAST(sum(CAST(rk AS DECIMAL(10,0)) * spend) AS DOUBLE) AS s_ix FROM r GROUP BY 1) " +
        "SELECT n_name, n_customers, total_spend, " +
        "round(2.0 * s_ix / (n_customers * total_spend) - " +
        "CAST(n_customers + 1 AS DOUBLE) / n_customers, 6) AS gini FROM a"),
    "event_transitions" ->
      ("WITH p AS (SELECT user_id, event_type, lag(event_type) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id) AS prev_type FROM events), " +
        "a AS (SELECT prev_type, event_type, count(*) AS n_transitions, " +
        "count(DISTINCT user_id) AS n_users FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2) " +
        "SELECT prev_type, event_type, n_transitions, n_users, " +
        "round(CAST(n_transitions AS DOUBLE) / " +
        "CAST(sum(n_transitions) OVER (PARTITION BY prev_type) AS DOUBLE), 6) AS p FROM a"),
    "active_users_7d" ->
      ("WITH du AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id FROM events), " +
        "mx AS (SELECT max(day) AS max_day FROM du), " +
        "e AS (SELECT user_id, unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS day FROM du) " +
        "SELECT e.day, count(DISTINCT e.user_id) AS n_active FROM e, mx " +
        "WHERE e.day <= mx.max_day GROUP BY 1"),
    "spend_quartiles" ->
      ("WITH sp AS (SELECT o_custkey AS custkey, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend FROM orders GROUP BY 1) " +
        "SELECT custkey, spend, " +
        "row_number() OVER (ORDER BY spend DESC, custkey) AS spend_rank, " +
        "CAST(ntile(4) OVER (ORDER BY spend DESC, custkey) AS BIGINT) AS quartile FROM sp"),
    "asof_join" ->
      ("WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'), " +
        "c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click') " +
        "SELECT p.event_id, p.user_id, p.ts, p.value, " +
        "c.user_id AS click_user_id, c.ts AS click_ts, c.value AS click_value " +
        "FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts"),
    "asof_join_sql" ->
      ("WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'), " +
        "c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click') " +
        "SELECT p.event_id, p.user_id, p.ts, p.value, " +
        "c.user_id AS click_user_id, c.ts AS click_ts, c.value AS click_value " +
        "FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts"),
    "asof_join_left" ->
      ("WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'), " +
        "c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click') " +
        "SELECT p.event_id, p.user_id, p.ts, p.value, " +
        "c.user_id AS click_user_id, c.ts AS click_ts, c.value AS click_value " +
        "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts"),
    "asof_join_fwd" ->
      ("WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'), " +
        "c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click') " +
        "SELECT p.event_id, p.user_id, p.ts, p.value, " +
        "c.user_id AS click_user_id, c.ts AS click_ts, c.value AS click_value " +
        "FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts"),
    "asof_join_near" ->
      ("WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'), " +
        "c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'), " +
        "b AS (SELECT p.event_id, c.user_id AS b_uid, c.ts AS b_ts, c.value AS b_val " +
        "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts), " +
        "f AS (SELECT p.event_id, c.user_id AS f_uid, c.ts AS f_ts, c.value AS f_val " +
        "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts), " +
        "j AS (SELECT p.event_id, p.user_id, p.ts, p.value, b_uid, b_ts, b_val, f_uid, f_ts, f_val, " +
        "(b_ts IS NOT NULL AND (f_ts IS NULL OR " +
        "epoch_us(p.ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(p.ts))) AS pick_b " +
        "FROM p JOIN b ON b.event_id = p.event_id JOIN f ON f.event_id = p.event_id) " +
        "SELECT event_id, user_id, ts, value, " +
        "CASE WHEN pick_b THEN b_uid ELSE f_uid END AS click_user_id, " +
        "CASE WHEN pick_b THEN b_ts ELSE f_ts END AS click_ts, " +
        "CASE WHEN pick_b THEN b_val ELSE f_val END AS click_value " +
        "FROM j WHERE b_ts IS NOT NULL OR f_ts IS NOT NULL"),
    "asof_join_multikey" ->
      ("WITH p AS (SELECT event_id, user_id, CAST(date_trunc('day', ts) AS DATE) AS day, ts, value " +
        "FROM events WHERE event_type = 'purchase'), " +
        "c AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, ts, value " +
        "FROM events WHERE event_type = 'click') " +
        "SELECT p.event_id, p.user_id, p.ts, p.value, " +
        "c.ts AS click_ts, c.value AS click_value " +
        "FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.day = c.day AND p.ts >= c.ts"),
    // DuckDB has no NEAREST variant, so the oracle replays nearest as the
    // same two-directional ASOF LEFT JOIN distance pick as asof_join_near
    "asof_join_near_sql" ->
      ("WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'), " +
        "c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'), " +
        "b AS (SELECT p.event_id, c.user_id AS b_uid, c.ts AS b_ts, c.value AS b_val " +
        "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts), " +
        "f AS (SELECT p.event_id, c.user_id AS f_uid, c.ts AS f_ts, c.value AS f_val " +
        "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts), " +
        "j AS (SELECT p.event_id, p.user_id, p.ts, p.value, b_uid, b_ts, b_val, f_uid, f_ts, f_val, " +
        "(b_ts IS NOT NULL AND (f_ts IS NULL OR " +
        "epoch_us(p.ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(p.ts))) AS pick_b " +
        "FROM p JOIN b ON b.event_id = p.event_id JOIN f ON f.event_id = p.event_id) " +
        "SELECT event_id, user_id, ts, value, " +
        "CASE WHEN pick_b THEN b_uid ELSE f_uid END AS click_user_id, " +
        "CASE WHEN pick_b THEN b_ts ELSE f_ts END AS click_ts, " +
        "CASE WHEN pick_b THEN b_val ELSE f_val END AS click_value " +
        "FROM j WHERE b_ts IS NOT NULL OR f_ts IS NOT NULL"),
    "gap_fill" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "sp AS (SELECT symbol, unnest(generate_series(lo, hi, INTERVAL 3600 SECOND)) AS bucket_ts " +
        "FROM (SELECT symbol, min(bucket_ts) AS lo, max(bucket_ts) AS hi FROM c GROUP BY 1)) " +
        "SELECT sp.symbol, sp.bucket_ts, " +
        "CAST(CASE WHEN c.close IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap, " +
        "last_value(c.close IGNORE NULLS) OVER (PARTITION BY sp.symbol ORDER BY sp.bucket_ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_filled " +
        "FROM sp LEFT JOIN c ON sp.symbol = c.symbol AND sp.bucket_ts = c.bucket_ts"),
    "gap_fill_linear" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "sp AS (SELECT symbol, unnest(generate_series(lo, hi, INTERVAL 3600 SECOND)) AS bucket_ts " +
        "FROM (SELECT symbol, min(bucket_ts) AS lo, max(bucket_ts) AS hi FROM c GROUP BY 1)), " +
        "j AS (SELECT sp.symbol, sp.bucket_ts, c.close FROM sp LEFT JOIN c ON sp.symbol = c.symbol AND sp.bucket_ts = c.bucket_ts), " +
        "f AS (SELECT symbol, bucket_ts, close, " +
        "last_value(close IGNORE NULLS) OVER wb AS prev_c, " +
        "last_value(CASE WHEN close IS NOT NULL THEN epoch_us(bucket_ts) END IGNORE NULLS) OVER wb AS prev_t, " +
        "first_value(close IGNORE NULLS) OVER wf AS next_c, " +
        "first_value(CASE WHEN close IS NOT NULL THEN epoch_us(bucket_ts) END IGNORE NULLS) OVER wf AS next_t " +
        "FROM j WINDOW " +
        "wb AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        "wf AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
        "SELECT symbol, bucket_ts, CAST(CASE WHEN close IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap, " +
        "round(CASE WHEN close IS NOT NULL THEN close WHEN next_c IS NULL THEN prev_c WHEN prev_c IS NULL THEN next_c " +
        "ELSE prev_c + (next_c - prev_c) * (CAST(epoch_us(bucket_ts) - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE)) END, 6) AS close_interp FROM f"),
    "funnel_1h" ->
      ("WITH c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'), " +
        "p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'), " +
        "j AS (SELECT c.ts, c.event_id, p.value FROM c JOIN p ON c.user_id = p.user_id " +
        "AND p.ts > c.ts AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000) " +
        "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, " +
        "count(DISTINCT event_id) AS n_converting_clicks, " +
        "count(*) AS n_attributed_purchases, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS attributed_value " +
        "FROM j GROUP BY 1"),
    // linear attribution replay: same interval pairing, same rounded
    // share -> exact decimal sum
    "attribution_linear" ->
      ("WITH c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'), " +
        "p AS (SELECT user_id, ts, event_id AS p_event_id, value FROM events WHERE event_type = 'purchase'), " +
        "j AS (SELECT c.event_id, p.p_event_id, p.value FROM c JOIN p ON c.user_id = p.user_id " +
        "AND p.ts > c.ts AND epoch_us(p.ts) <= epoch_us(c.ts) + 86400000000), " +
        "s AS (SELECT event_id, CAST(round(value / CAST(count(*) OVER (PARTITION BY p_event_id) AS DOUBLE), 6) AS DECIMAL(18,6)) AS share FROM j) " +
        "SELECT event_id, count(*) AS n_purchases, CAST(sum(share) AS DOUBLE) AS credit FROM s GROUP BY 1"),
    "retention_cohorts" ->
      ("WITH a AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events), " +
        "c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY 1) " +
        "SELECT c.cohort_day, CAST(date_diff('day', c.cohort_day, a.day) AS BIGINT) AS day_offset, " +
        "count(DISTINCT a.user_id) AS n_users " +
        "FROM a JOIN c ON a.user_id = c.user_id GROUP BY 1, 2"),
    // LTV replay: same first-day cohorts, purchase revenue in exact
    // DECIMAL(18,2) sums, exact-decimal cumulative over age, per-user
    // division rounded at emission
    "ltv_cohorts" ->
      ("WITH e AS (SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, value FROM events), " +
        "c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1), " +
        "sz AS (SELECT cohort_day, count(*) AS n_users FROM c GROUP BY 1), " +
        "r AS (SELECT c.cohort_day, CAST(date_diff('day', c.cohort_day, e.day) AS BIGINT) AS age_days, " +
        "sum(CAST(value AS DECIMAL(18,2))) AS rev_d FROM e JOIN c ON e.user_id = c.user_id " +
        "WHERE e.event_type = 'purchase' GROUP BY 1, 2), " +
        "cum AS (SELECT cohort_day, age_days, rev_d, CAST(sum(rev_d) OVER (" +
        "PARTITION BY cohort_day ORDER BY age_days ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS cum_d FROM r) " +
        "SELECT cum.cohort_day, age_days, n_users, CAST(rev_d AS DOUBLE) AS revenue, " +
        "CAST(cum_d AS DOUBLE) AS cum_revenue, " +
        "round(CAST(cum_d AS DOUBLE) / CAST(n_users AS DOUBLE), 6) AS ltv_per_user " +
        "FROM cum JOIN sz ON cum.cohort_day = sz.cohort_day"),
    "top_volume" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}) " +
        "SELECT symbol, bucket_ts, volume, rn FROM (" +
        "SELECT symbol, bucket_ts, volume, " +
        "row_number() OVER (PARTITION BY symbol ORDER BY volume DESC, bucket_ts) AS rn FROM c) " +
        "WHERE rn <= 3"),
    "candle_stats" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}) " +
        "SELECT symbol, count(*) AS n_buckets, max(high) AS max_high, min(low) AS min_low, " +
        "CAST(sum(CAST(high - low AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_range, " +
        "CAST(sum(CAST(volume AS DECIMAL(18,2))) AS DOUBLE) AS total_volume " +
        "FROM c GROUP BY 1"),
    "ohlcv_1h_from_1m" -> withTrades(
      s", c1 AS (${candlesSql(60000000L)}), " +
        "f AS (SELECT symbol, bucket_ts AS b, open, high, low, close, volume, trades FROM c1) " +
        "SELECT symbol, make_timestamp(epoch_us(b) - epoch_us(b) % 3600000000) AS bucket_ts, " +
        "min_by(open, b) AS open, max(high) AS high, min(low) AS low, max_by(close, b) AS close, " +
        "CAST(sum(CAST(volume AS DECIMAL(18,2))) AS DOUBLE) AS volume, " +
        "CAST(sum(trades) AS BIGINT) AS trades FROM f GROUP BY 1, 2"),
    "sessionize" ->
      (s"WITH $sessionCtes " +
        "SELECT user_id, session_id, session_start, session_end, n_events FROM sess"),
    "session_stats" ->
      (s"WITH $sessionCtes " +
        "SELECT date_trunc('day', session_start) AS day, count(*) AS n_sessions, " +
        "count(DISTINCT user_id) AS n_users, CAST(sum(n_events) AS BIGINT) AS n_events, " +
        "CAST(sum(epoch_us(session_end) - epoch_us(session_start)) AS BIGINT) AS total_duration_us, " +
        "max(n_events) AS max_session_events FROM sess GROUP BY 1"),
    "bounce_rate" ->
      (s"WITH $sessionCtes " +
        "SELECT date_trunc('day', session_start) AS day, count(*) AS n_sessions, " +
        "CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces, " +
        "round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS bounce_rate " +
        "FROM sess GROUP BY 1"),
    "session_percentiles" ->
      (s"WITH $sessionCtes, " +
        "d AS (SELECT CAST(date_trunc('day', session_start) AS TIMESTAMP) AS day, " +
        "epoch_us(session_end) - epoch_us(session_start) AS dur_us FROM sess) " +
        "SELECT day, count(*) AS n_sessions, " +
        "CAST(round(quantile_cont(dur_us, 0.5), 0) AS BIGINT) AS p50_us, " +
        "CAST(round(quantile_cont(dur_us, 0.9), 0) AS BIGINT) AS p90_us, " +
        "CAST(round(quantile_cont(dur_us, 0.99), 0) AS BIGINT) AS p99_us " +
        "FROM d GROUP BY 1"),
    "q1_pricing" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc, " +
        "count(*) AS n FROM lineitem " +
        "WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' GROUP BY 1, 2"),
    "q3_revenue" ->
      (s"SELECT c_mktsegment, $RevenueSql AS revenue, count(*) AS n " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey GROUP BY 1"),
    "q5_region" ->
      (s"SELECT r_name, n_name, $RevenueSql AS revenue, count(*) AS n " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY 1, 2"),
    "q7_nation_trade" ->
      (s"SELECT supp_nation, cust_nation, CAST(year(l_shipdate) AS BIGINT) AS l_year, " +
        s"$RevenueSql AS revenue, count(*) AS n " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN (SELECT s_suppkey, n_name AS supp_nation FROM supplier " +
        "JOIN nation ON s_nationkey = n_nationkey) sn ON l_suppkey = sn.s_suppkey " +
        "JOIN (SELECT c_custkey, n_name AS cust_nation FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey) cn ON o_custkey = cn.c_custkey " +
        "WHERE supp_nation <> cust_nation GROUP BY 1, 2, 3"),
    "q8_market_share" -> {
      val num = "CAST(sum(CASE WHEN supp_nation = 'NATION_0' THEN " +
        "CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) " +
        "ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)"
      s"SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
        s"round($num / $RevenueSql, 6) AS mkt_share, " +
        s"$RevenueSql AS revenue, count(*) AS n " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN (SELECT c_custkey FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA') ca " +
        "ON o_custkey = ca.c_custkey " +
        "JOIN (SELECT s_suppkey, n_name AS supp_nation FROM supplier " +
        "JOIN nation ON s_nationkey = n_nationkey) sn ON l_suppkey = sn.s_suppkey " +
        "GROUP BY 1"
    },
    "q10_returned" ->
      (s"SELECT c_custkey, c_name, n_name, $RevenueSql AS revenue, count(*) AS n " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE l_returnflag = 'R' GROUP BY 1, 2, 3"),
    // q2 replay as the LITERAL correlated scalar subquery — DuckDB
    // decorrelates it itself, proving the Spark window-min plan computes
    // exactly the correlated semantics
    "q2_min_cost" ->
      ("WITH eur AS (SELECT s_suppkey, s_name, n_name FROM supplier " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'), " +
        "o AS (SELECT l_partkey, s_name, n_name, l_extendedprice " +
        "FROM lineitem JOIN eur ON l_suppkey = s_suppkey) " +
        "SELECT p_partkey, p_brand, s_name, n_name, " +
        "CAST(l_extendedprice AS DOUBLE) AS min_price " +
        "FROM o JOIN part ON p_partkey = o.l_partkey " +
        "WHERE l_extendedprice = (SELECT min(o2.l_extendedprice) FROM o o2 " +
        "WHERE o2.l_partkey = o.l_partkey)"),
    "q13_order_dist" ->
      ("SELECT c_count, count(*) AS custdist FROM (" +
        "SELECT c_custkey, count(o_orderkey) AS c_count " +
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
        "GROUP BY c_custkey) GROUP BY c_count"),
    // q4 replay as the LITERAL EXISTS correlated subquery — DuckDB turns
    // it into the same semi join the Spark side declares
    "q4_order_priority" ->
      ("SELECT o_orderpriority, count(*) AS n_orders FROM orders o " +
        "WHERE EXISTS (SELECT 1 FROM lineitem l " +
        "WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R') " +
        "GROUP BY 1"),
    "q18_large_orders" ->
      ("WITH big AS (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty " +
        "FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150) " +
        "SELECT c_custkey, c_name, o_orderkey, o_orderdate, " +
        "CAST(qty AS DOUBLE) AS total_qty " +
        "FROM orders JOIN big ON o_orderkey = l_orderkey " +
        "JOIN customer ON o_custkey = c_custkey"),
    // q17 replay as the LITERAL correlated-avg subquery (decimal-exact
    // mean like the Spark window) — DuckDB decorrelates it itself
    "q17_small_quantity" ->
      ("SELECT p_brand, " +
        "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly, " +
        "count(*) AS n " +
        "FROM lineitem l JOIN part ON p_partkey = l_partkey " +
        "WHERE l_quantity < 0.2 * (" +
        "SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) " +
        "FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey) " +
        "GROUP BY 1"),
    // q22 replay: literal scalar subquery + NOT EXISTS anti join
    "q22_dormant_value" ->
      ("SELECT n_name, count(*) AS n_custs, " +
        "CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal " +
        "FROM customer c JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE c_acctbal > (" +
        "SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) " +
        "FROM customer WHERE c_acctbal > 0) " +
        "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND o.o_orderdate >= DATE '2001-01-01') " +
        "GROUP BY 1"),
    // q21 replay as the LITERAL double-correlated subquery — EXISTS +
    // NOT EXISTS on lineitem under two aliases; DuckDB decorrelates to
    // the same semi + anti pair the Spark side declares
    "q21_waiting_suppliers" ->
      ("SELECT s_name, count(*) AS numwait " +
        "FROM lineitem l1 JOIN orders ON o_orderkey = l1.l_orderkey " +
        "JOIN supplier ON s_suppkey = l1.l_suppkey " +
        "WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F' " +
        "AND EXISTS (SELECT 1 FROM lineitem l2 " +
        "WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) " +
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 " +
        "WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey " +
        "AND l3.l_returnflag = 'R') " +
        "GROUP BY 1"),
    // q15 replay: literal nested-aggregate scalar subquery (max over the
    // same grouped revenue view), decimal-exact so the equality row set
    // is engine-stable
    "q15_top_supplier" ->
      ("WITH revenue AS (SELECT l_suppkey, " +
        "sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev " +
        "FROM lineitem GROUP BY 1) " +
        "SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue " +
        "FROM revenue JOIN supplier ON s_suppkey = l_suppkey " +
        "WHERE rev = (SELECT max(rev) FROM revenue)"),
    "q14_promo_share" ->
      ("SELECT round(CAST(sum(CASE WHEN p_type = 'PROMO' THEN " +
        "CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) " +
        "ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0 / " +
        s"$RevenueSql, 6) AS promo_share, $RevenueSql AS revenue, " +
        "count(*) AS n FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE l_shipdate >= TIMESTAMP '1997-03-01' " +
        "AND l_shipdate < TIMESTAMP '1997-04-01'"),
    "q19_disjunctive" ->
      (s"SELECT $RevenueSql AS revenue, count(*) AS n " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE l_quantity >= 1 AND l_quantity <= 30 AND (" +
        "(p_brand = 'Brand#1' AND l_quantity <= 11 AND p_size BETWEEN 1 AND 5) OR " +
        "(p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10) OR " +
        "(p_brand = 'Brand#3' AND l_quantity >= 20 AND p_size BETWEEN 1 AND 15))"),
    "q12_late_lines" ->
      ("SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), " +
        "CAST(l_shipdate AS DATE)) <= 30 THEN 'fast' " +
        "WHEN date_diff('day', CAST(o_orderdate AS DATE), " +
        "CAST(l_shipdate AS DATE)) <= 90 THEN 'normal' ELSE 'slow' END AS ship_class, " +
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
        "CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1"),
    "q16_supplier_parts" ->
      ("SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE p_brand <> 'Brand#1' AND l_suppkey NOT IN (" +
        "SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) " +
        "GROUP BY 1, 2"),
    "q20_dominant_suppliers" ->
      ("WITH li AS (SELECT l_partkey, l_suppkey, l_quantity FROM lineitem " +
        "JOIN part ON l_partkey = p_partkey " +
        "WHERE p_name LIKE '%widget%' AND year(l_shipdate) = 1997), " +
        "ps AS (SELECT l_partkey, l_suppkey, " +
        "sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty FROM li GROUP BY 1, 2), " +
        "tot AS (SELECT l_partkey, CAST(sum(qty) AS DECIMAL(38,2)) AS total FROM ps GROUP BY 1), " +
        "dom AS (SELECT ps.l_suppkey FROM ps JOIN tot ON tot.l_partkey = ps.l_partkey " +
        "WHERE ps.qty * 2 > tot.total) " +
        "SELECT s_suppkey, s_name, count(*) AS n_dominated " +
        "FROM dom JOIN supplier ON s_suppkey = l_suppkey GROUP BY 1, 2"),
    "q9_profit" ->
      ("SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) - " +
        "CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) " +
        "AS DOUBLE) AS profit, count(*) AS n " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE p_name LIKE '%widget%' GROUP BY 1, 2"),
    "q11_value_concentration" ->
      ("WITH bloc AS (SELECT s_suppkey FROM supplier JOIN nation " +
        "ON s_nationkey = n_nationkey WHERE n_nationkey % 5 = 0), " +
        "pp AS (SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS value " +
        "FROM lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM bloc) " +
        "GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(value) AS DECIMAL(38,4)) AS bloc_total, count(*) AS n_parts FROM pp) " +
        "SELECT l_partkey AS p_partkey, CAST(value AS DOUBLE) AS value " +
        "FROM pp, tot WHERE value * n_parts > bloc_total * 2"),
    "supplier_nation_revenue" ->
      (s"SELECT n_name, $RevenueSql AS revenue, count(*) AS n, " +
        "count(DISTINCT s_suppkey) AS n_suppliers " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey GROUP BY 1"),
    "brand_revenue" ->
      (s"SELECT p_brand, $RevenueSql AS revenue, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, count(*) AS n " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1"),
    "rollup_sales" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, count(*) AS n " +
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"),
    "cube_sales" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, count(*) AS n " +
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"),
    "pivot_events" ->
      ("SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, " +
        "count(*) FILTER (WHERE event_type = 'click') AS n_click, " +
        "count(*) FILTER (WHERE event_type = 'view') AS n_view, " +
        "count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase, " +
        "count(*) FILTER (WHERE event_type = 'signup') AS n_signup, " +
        "count(*) FILTER (WHERE event_type = 'error') AS n_error, " +
        "CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) " +
        "ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value " +
        "FROM events GROUP BY 1"),
    "distinct_users" ->
      "SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n FROM events GROUP BY 1",
    "dedup_exact" ->
      "SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies FROM documents GROUP BY 1",
    "dedup_substring" ->
      // grid spans stay the reporting unit; occurrence counts run against
      // the stride-1 full-window shingle stream plus short tails — the
      // alignment-invariant contract (Dedup.substringDedup scaladoc)
      ("WITH w AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ws FROM documents), " +
        "sp AS (SELECT doc_id, len(ws) AS n, unnest(list_transform(generate_series(1, (len(ws)+19)//20), " +
        "i -> struct_pack(pos := i, span := array_to_string(ws[(i-1)*20+1:i*20], ' ')))) AS s FROM w), " +
        "f AS (SELECT doc_id, s.pos AS pos, s.span AS span, md5(s.span) AS h, " +
        "s.pos * 20 <= n AS is_full FROM sp), " +
        "pr AS (SELECT unnest(list_transform(generate_series(1, greatest(len(ws) - 19, 0)), " +
        "i -> md5(array_to_string(ws[i:i+19], ' ')))) AS h FROM w " +
        "UNION ALL SELECT h FROM f WHERE NOT is_full), " +
        "c AS (SELECT h, count(*) AS cnt FROM pr GROUP BY 1) " +
        "SELECT doc_id, count(*) AS n_spans, " +
        "CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated_spans, " +
        "round(CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS dup_ratio, " +
        "md5(coalesce(array_to_string(list(span ORDER BY pos) FILTER (WHERE cnt = 1), ' '), '')) AS clean_fp " +
        "FROM f JOIN c USING (h) GROUP BY doc_id"),
    "dedup_minhash" ->
      s"WITH ${minhashPairsCtes()} SELECT id1, id2, est_jaccard FROM mh",
    "dedup_simhash" -> simhashNearDupSql(),
    "ngram_jaccard" ->
      s"WITH $jaccardCtes SELECT id1, id2, est_jaccard, jaccard FROM jac WHERE jaccard >= 0.5",
    "containment_pairs" ->
      (s"WITH ${minhashPairsCtes()}, " +
        "shg AS (SELECT doc_id, list_distinct(list_transform(" +
        "generate_series(1, len(ws)-2), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS sh FROM dw), " +
        "cp AS (SELECT m.id1, m.id2, CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_common, " +
        "CAST(len(a.sh) AS BIGINT) AS n1, CAST(len(b.sh) AS BIGINT) AS n2 " +
        "FROM mh m JOIN shg a ON a.doc_id = m.id1 JOIN shg b ON b.doc_id = m.id2), " +
        "f AS (SELECT id1, id2, n_common, n1, n2, " +
        "CASE WHEN n1 > 0 THEN round(CAST(n_common AS DOUBLE) / n1, 6) END AS containment_1in2, " +
        "CASE WHEN n2 > 0 THEN round(CAST(n_common AS DOUBLE) / n2, 6) END AS containment_2in1 FROM cp) " +
        "SELECT id1, id2, n_common, n1, n2, containment_1in2, containment_2in1 FROM f " +
        "WHERE containment_1in2 >= 0.8 OR containment_2in1 >= 0.8"),
    "corpus_dedup" -> corpusDedupSql(0.8),
    "corpus_dedup_stable" -> corpusDedupStableSql(0.8),
    "dedup_incremental" -> incrementalDedupSql(),
    "dedup_bloom" ->
      // exact by construction: the Bloom screen only routes rows; every
      // positive is verified, negatives are guaranteed-new
      ("WITH ch AS (SELECT DISTINCT CAST('0x'||substr(md5(text),1,15) AS BIGINT) AS h " +
        "FROM documents WHERE source <> 'src0') " +
        "SELECT doc_id, CAST('0x'||substr(md5(text),1,15) AS BIGINT) AS h, " +
        "CAST('0x'||substr(md5(text),1,15) AS BIGINT) IN (SELECT h FROM ch) AS is_dup " +
        "FROM documents WHERE source = 'src0'"),
    "corpus_shuffle" ->
      ("WITH k AS (SELECT doc_id, " +
        "CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)||':epoch0'),1,8) AS BIGINT) AS h " +
        "FROM documents) " +
        "SELECT doc_id, h, row_number() OVER (ORDER BY h, doc_id) - 1 AS shuffle_pos FROM k"),
    "corpus_diff" ->
      ("WITH prior AS (SELECT doc_id, source, md5(text) AS h FROM documents " +
        "WHERE doc_id % 2 = 0), " +
        "today AS (SELECT doc_id, source, md5(CASE WHEN doc_id % 10 = 0 " +
        "THEN text || ' rev2' ELSE text END) AS h FROM documents " +
        "WHERE doc_id % 7 <> 3) " +
        "SELECT coalesce(t.source, p.source) AS source, " +
        "CASE WHEN p.h IS NULL THEN 'added' WHEN t.h IS NULL THEN 'removed' " +
        "WHEN p.h <> t.h THEN 'changed' ELSE 'unchanged' END AS status, " +
        "count(*) AS n_docs " +
        "FROM prior p FULL OUTER JOIN today t ON p.doc_id = t.doc_id " +
        "GROUP BY 1, 2"),
    "repetition_score" ->
      ("WITH dw AS (SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents), " +
        "shg AS (SELECT doc_id, list_transform(generate_series(1, len(ws)-2), " +
        "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])) AS sh FROM dw), " +
        "c AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_trigrams, " +
        "CAST(len(list_distinct(sh)) AS BIGINT) AS n_distinct_trigrams FROM shg) " +
        "SELECT doc_id, n_trigrams, n_distinct_trigrams, CASE WHEN n_trigrams > 0 THEN " +
        "round(1.0 - CAST(n_distinct_trigrams AS DOUBLE) / n_trigrams, 6) END AS repetition FROM c"),
    "contamination_check" -> contaminationSql,
    "decontaminate" ->
      (s"WITH cc AS ($contaminationSql) " +
        "SELECT doc_id, n_shingles, n_hit, containment FROM cc " +
        "WHERE NOT coalesce(contaminated, false)"),
    "char_entropy" ->
      ("WITH d0 AS (SELECT doc_id, text FROM documents WHERE length(text) > 0), " +
        "e AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM d0), " +
        "h AS (SELECT doc_id, ch, count(*) AS c FROM e GROUP BY 1, 2), " +
        "t AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1), " +
        "tm AS (SELECT h.doc_id, h.ch, -(CAST(h.c AS DOUBLE) / CAST(t.n AS DOUBLE)) * " +
        "ln(CAST(h.c AS DOUBLE) / CAST(t.n AS DOUBLE)) AS term FROM h JOIN t ON h.doc_id = t.doc_id), " +
        "l AS (SELECT doc_id, list(term ORDER BY ch) AS terms FROM tm GROUP BY 1), " +
        "dd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct_chars FROM h GROUP BY 1) " +
        "SELECT l.doc_id, t.n AS n_chars, dd.n_distinct_chars, " +
        "round(list_reduce(list_prepend(CAST(0 AS DOUBLE), terms), (acc, x) -> acc + x) / " +
        "ln(CAST(2 AS DOUBLE)), 6) AS entropy_bits " +
        "FROM l JOIN t ON l.doc_id = t.doc_id JOIN dd ON dd.doc_id = l.doc_id"),
    "heavy_hitters" ->
      ("WITH w AS (SELECT unnest(string_split_regex(text, '\\s+')) AS term FROM documents), " +
        "wf AS (SELECT term FROM w WHERE term <> ''), " +
        "tot AS (SELECT count(*) AS n FROM wf), " +
        "ex AS (SELECT term, count(*) AS freq FROM wf GROUP BY 1) " +
        "SELECT term, freq, TRUE AS found, TRUE AS bounds_ok FROM ex, tot " +
        "WHERE freq > CAST(n AS DOUBLE) / 32"),
    "zipf_fit" ->
      ("WITH w AS (SELECT unnest(string_split_regex(text, '\\s+')) AS term FROM documents), " +
        "tc AS (SELECT term, count(*) AS freq FROM w WHERE term <> '' GROUP BY 1), " +
        "top AS (SELECT term, freq FROM tc ORDER BY freq DESC, term LIMIT 100), " +
        "r AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, term) AS rk FROM top), " +
        "l AS (SELECT CAST(count(*) AS BIGINT) AS n_terms, " +
        "list(ln(CAST(rk AS DOUBLE)) ORDER BY rk) AS xs, " +
        "list(ln(CAST(freq AS DOUBLE)) ORDER BY rk) AS ys, " +
        "list(ln(CAST(rk AS DOUBLE)) * ln(CAST(freq AS DOUBLE)) ORDER BY rk) AS xys, " +
        "list(ln(CAST(rk AS DOUBLE)) * ln(CAST(rk AS DOUBLE)) ORDER BY rk) AS x2s FROM r), " +
        "sm AS (SELECT n_terms, CAST(n_terms AS DOUBLE) AS nd, " +
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), xs), (a, x) -> a + x) AS sx, " +
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), ys), (a, x) -> a + x) AS sy, " +
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), xys), (a, x) -> a + x) AS sxy, " +
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), x2s), (a, x) -> a + x) AS sx2 FROM l), " +
        "f AS (SELECT n_terms, sx, sy, nd, " +
        "(nd * sxy - sx * sy) / (nd * sx2 - sx * sx) AS slope_raw FROM sm) " +
        "SELECT n_terms, round(slope_raw, 6) AS slope, " +
        "round((sy - slope_raw * sx) / nd, 6) AS intercept FROM f"),
    "tfidf_topterms" ->
      ("WITH w AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS term FROM documents), " +
        "wf AS (SELECT doc_id, term FROM w WHERE term <> ''), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM wf GROUP BY 1, 2), " +
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), " +
        "nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents), " +
        "scored AS (SELECT t.doc_id, t.term, t.tf, " +
        "round(t.tf * ln(CAST(nd.n_docs + 1 AS DOUBLE) / (d.df + 1)), 6) AS score " +
        "FROM tf t JOIN df d ON d.term = t.term CROSS JOIN nd) " +
        "SELECT doc_id, term, tf, score, rank FROM (SELECT scored.*, " +
        "row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank " +
        "FROM scored) s WHERE rank <= 3"),
    // PMI collocation replay: exact integer unigram/bigram counts, corpus
    // totals, then the identical fixed-order double PMI formula
    "bigram_pmi" ->
      ("WITH dw AS (SELECT list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws FROM documents), " +
        "d AS (SELECT ws FROM dw WHERE len(ws) >= 2), " +
        "tot AS (SELECT CAST(sum(len(ws)) AS BIGINT) AS nu, CAST(sum(len(ws) - 1) AS BIGINT) AS nb FROM d), " +
        "u AS (SELECT w, count(*) AS cu FROM (SELECT unnest(ws) AS w FROM d) GROUP BY 1), " +
        "b AS (SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2, count(*) AS n_ab " +
        "FROM (SELECT unnest(list_transform(generate_series(1, len(ws) - 1), " +
        "i -> concat_ws(' ', ws[i], ws[i + 1]))) AS bg FROM d) GROUP BY 1, 2 HAVING count(*) >= 5), " +
        "j AS (SELECT b.w1, b.w2, b.n_ab, ua.cu AS n_a, ub.cu AS n_b " +
        "FROM b JOIN u ua ON b.w1 = ua.w JOIN u ub ON b.w2 = ub.w) " +
        "SELECT w1, w2, n_ab, n_a, n_b, " +
        "round(ln((CAST(n_ab AS DOUBLE) / CAST(nb AS DOUBLE)) / " +
        "((CAST(n_a AS DOUBLE) / CAST(nu AS DOUBLE)) * (CAST(n_b AS DOUBLE) / CAST(nu AS DOUBLE)))), 6) AS pmi " +
        "FROM j, tot"),
    "candle_patterns" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "p AS (SELECT symbol, bucket_ts, open, high, low, close, " +
        "lag(open) OVER w AS prev_open, lag(close) OVER w AS prev_close FROM c " +
        "WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts)), " +
        "f AS (SELECT symbol, bucket_ts, open, high, low, close, " +
        "(high - low > 0 AND abs(close - open) <= 0.1 * (high - low)) AS doji, " +
        "(prev_close < prev_open AND close > open AND open <= prev_close AND close >= prev_open) AS bull_engulf, " +
        "(prev_close > prev_open AND close < open AND open >= prev_close AND close <= prev_open) AS bear_engulf FROM p) " +
        "SELECT symbol, bucket_ts, open, high, low, close, doji, bull_engulf, bear_engulf FROM f"),
    "bigram_surprisal" ->
      ("WITH dw AS (SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents), " +
        "dw2 AS (SELECT doc_id, ws FROM dw WHERE len(ws) >= 2), " +
        "bi0 AS (SELECT doc_id, unnest(generate_series(1, len(ws)-1)) AS i, ws FROM dw2), " +
        "bi AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2 FROM bi0), " +
        "c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2), " +
        "c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1) " +
        "SELECT b.doc_id, count(*) AS n_bigrams, " +
        "round(avg(ln(CAST(c1.c1 AS DOUBLE) / c12.c12)), 6) AS surprisal " +
        "FROM bi b JOIN c12 ON c12.w1 = b.w1 AND c12.w2 = b.w2 " +
        "JOIN c1 ON c1.w1 = b.w1 GROUP BY 1"),
    "volume_anomaly" -> withTrades(
      s", c AS (${candlesSql(3600000000L)}), " +
        "st AS (SELECT symbol, count(*) AS n, " +
        "CAST(sum(CAST(volume AS DECIMAL(18,2))) AS DOUBLE) AS s1, " +
        "CAST(sum(CAST(volume AS DECIMAL(18,2)) * CAST(volume AS DECIMAL(18,2))) AS DOUBLE) AS s2 " +
        "FROM c GROUP BY 1), " +
        "j0 AS (SELECT c.symbol, c.bucket_ts, c.volume, st.n, st.s1 / st.n AS mu, st.s2 " +
        "FROM c JOIN st ON st.symbol = c.symbol), " +
        "j AS (SELECT symbol, bucket_ts, volume, mu, " +
        "(s2 - n * mu * mu) / (n - 1) AS variance FROM j0) " +
        "SELECT symbol, bucket_ts, volume, " +
        "round((volume - mu) / sqrt(variance), 6) AS zscore FROM j " +
        "WHERE variance > 0 AND abs(round((volume - mu) / sqrt(variance), 6)) >= 2.0"),
    "q6_selective" ->
      ("SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue, " +
        "count(*) AS n FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00' " +
        "AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"),
    "customers_no_orders" ->
      ("SELECT c_custkey, c_name FROM customer " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_totalprice > 300000)"),
    "big_spender_segments" ->
      ("SELECT c_mktsegment, count(*) AS n FROM customer " +
        "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000) " +
        "GROUP BY 1"),
    "value_percentiles" ->
      ("SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50, " +
        "round(quantile_cont(value, 0.9), 6) AS p90, " +
        "round(quantile_cont(value, 0.99), 6) AS p99 FROM events GROUP BY 1"),
    "trimmed_mean" ->
      ("WITH b AS (SELECT event_type, round(quantile_cont(value, 0.01), 6) AS lo, " +
        "round(quantile_cont(value, 0.99), 6) AS hi FROM events GROUP BY 1) " +
        "SELECT e.event_type, count(*) AS n, " +
        "CAST(sum(CASE WHEN e.value < b.lo OR e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_trimmed, " +
        "round(CAST(sum(CASE WHEN e.value >= b.lo AND e.value <= b.hi THEN CAST(e.value AS DECIMAL(18,6)) END) AS DOUBLE) / " +
        "CAST(sum(CASE WHEN e.value >= b.lo AND e.value <= b.hi THEN 1 ELSE 0 END) AS BIGINT), 6) AS trimmed_mean " +
        "FROM events e JOIN b ON e.event_type = b.event_type GROUP BY 1"),
    "value_histogram" ->
      ("SELECT event_type, CAST(floor(value / 50) AS BIGINT) AS bucket, count(*) AS n " +
        "FROM events GROUP BY 1, 2"),
    "clip_outliers" ->
      ("WITH b AS (SELECT event_type, round(quantile_cont(value, 0.01), 6) AS lo, " +
        "round(quantile_cont(value, 0.99), 6) AS hi FROM events GROUP BY 1) " +
        "SELECT e.event_id, e.event_type, e.value, " +
        "least(greatest(e.value, b.lo), b.hi) AS clipped, " +
        "(e.value < b.lo OR e.value > b.hi) AS was_clipped " +
        "FROM events e JOIN b ON b.event_type = e.event_type"),
    "value_corr" ->
      ("SELECT event_type, round(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_value_user " +
        "FROM events GROUP BY 1"),
    "lang_id" -> langIdSql,
    "lang_confusion" ->
      (s"WITH li AS ($langIdSql) " +
        "SELECT lang, pred_lang, count(*) AS n FROM li GROUP BY 1, 2"),
    "quality_score" ->
      ("WITH f AS (SELECT doc_id, " +
        "CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) AS nw, " +
        "CAST(length(text) AS DOUBLE) AS nc, " +
        "CAST(length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS DOUBLE) AS np, " +
        "CAST(len(list_filter(string_split_regex(text, '\\s+'), " +
        "w -> w IN ('the','a','and','of','to','in','is','it','for','on'))) AS DOUBLE) AS ns " +
        "FROM documents) " +
        "SELECT doc_id, CAST(nw AS BIGINT) AS n_words, np / nc AS punct_ratio, " +
        "ns / nw AS stop_ratio, " +
        "0.5 * (ns / nw) + 0.3 * (1.0 - np / nc) + 0.2 * least(nw / 100.0, 1.0) AS score FROM f"),
    "token_count" ->
      ("SELECT doc_id, " +
        "CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_ws_tokens, " +
        "CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9\\s]')) AS BIGINT) AS n_subword_tokens, " +
        "CAST(length(text) AS BIGINT) AS n_chars_actual FROM documents"),
    // lexical diversity replay: the same split array drives both counts;
    // divisions fixed-order doubles, sqrt IEEE-exact in both engines
    "lexical_diversity" ->
      ("WITH w AS (SELECT doc_id, " +
        "CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_words, " +
        "CAST(len(list_distinct(string_split_regex(text, '\\s+'))) AS BIGINT) AS n_distinct " +
        "FROM documents) " +
        "SELECT doc_id, n_words, n_distinct, " +
        "round(CAST(n_distinct AS DOUBLE) / (CASE WHEN n_words > 0 THEN CAST(n_words AS DOUBLE) END), 6) AS ttr, " +
        "round(CAST(n_distinct AS DOUBLE) / (CASE WHEN n_words > 0 THEN sqrt(CAST(n_words AS DOUBLE)) END), 6) AS guiraud FROM w"),
    // fertility replay: same BPE-ish segmentation as token_count, exact
    // integer sums, fixed-order guarded ratios
    "tokenizer_fertility" ->
      ("WITH x AS (SELECT lang, CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS w, " +
        "CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9\\s]')) AS BIGINT) AS s, n_chars FROM documents), " +
        "a AS (SELECT lang, count(*) AS n_docs, CAST(sum(w) AS BIGINT) AS ws_tokens, " +
        "CAST(sum(s) AS BIGINT) AS subword_tokens, CAST(sum(n_chars) AS BIGINT) AS total_chars FROM x GROUP BY 1) " +
        "SELECT lang, n_docs, ws_tokens, subword_tokens, " +
        "round(CAST(subword_tokens AS DOUBLE) / (CASE WHEN ws_tokens > 0 THEN CAST(ws_tokens AS DOUBLE) END), 6) AS fertility, " +
        "round(CAST(total_chars AS DOUBLE) / (CASE WHEN subword_tokens > 0 THEN CAST(subword_tokens AS DOUBLE) END), 6) AS chars_per_token FROM a"),
    // dataset-card replay: quantile_cont == Spark's exact percentile over
    // the integer n_chars column, two-level distinct via the (source, h)
    // pre-group, (cnt desc, lang asc) argmax, entropy terms rounded 6 in
    // exact decimal sums (single-lang source pinned to literal 0 — the
    // -0.0 of -(1*ln 1) would hash-mismatch)
    "dataset_card" ->
      ("WITH b AS (SELECT source, lang, n_chars, md5(text) AS h FROM documents), " +
        "vol AS (SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars, " +
        "CAST(round(quantile_cont(n_chars, 0.5), 0) AS BIGINT) AS p50_chars, " +
        "CAST(round(quantile_cont(n_chars, 0.95), 0) AS BIGINT) AS p95_chars FROM b GROUP BY 1), " +
        "dup AS (SELECT source, count(*) AS n_distinct FROM (" +
        "SELECT source, h FROM b GROUP BY 1, 2) GROUP BY 1), " +
        "lc AS (SELECT source, lang, count(*) AS c FROM b GROUP BY 1, 2), " +
        "top AS (SELECT source, lang AS top_lang FROM (SELECT source, lang, " +
        "row_number() OVER (PARTITION BY source ORDER BY c DESC, lang) AS rn FROM lc) WHERE rn = 1), " +
        "langs AS (SELECT lc.source, count(*) AS n_langs, " +
        "CAST(sum(CAST(CASE WHEN lc.c = vol.n_docs THEN 0.0 " +
        "ELSE round(-((CAST(lc.c AS DOUBLE) / CAST(vol.n_docs AS DOUBLE)) * " +
        "ln(CAST(lc.c AS DOUBLE) / CAST(vol.n_docs AS DOUBLE))), 6) END AS DECIMAL(18,6))) AS DOUBLE) AS ent " +
        "FROM lc JOIN vol ON lc.source = vol.source GROUP BY 1) " +
        "SELECT vol.source, n_docs, total_chars, " +
        "round(CAST(total_chars AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS mean_chars, " +
        "p50_chars, p95_chars, n_langs, top_lang, " +
        "round(1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS dup_rate, " +
        "round(ent, 6) AS lang_entropy " +
        "FROM vol JOIN dup ON vol.source = dup.source " +
        "JOIN langs ON vol.source = langs.source JOIN top ON vol.source = top.source"),
    // mixRebalance replay: derived rates from the same two aggregations;
    // keep decision on UNROUNDED double quotients (IEEE-identical)
    "mix_rebalance" ->
      ("WITH t AS (SELECT doc_id, lang, " +
        "COALESCE(CAST(len(string_split_regex(text, '\\s+')) AS BIGINT), 0) AS n_tokens FROM documents), " +
        "bl AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS lang_tokens FROM t GROUP BY 1), " +
        "mn AS (SELECT min(lang_tokens) AS min_tokens FROM bl) " +
        "SELECT t.doc_id, t.lang, t.n_tokens, " +
        "round(CAST(mn.min_tokens AS DOUBLE) / CAST(bl.lang_tokens AS DOUBLE), 6) AS rate, " +
        "(CAST(CAST('0x'||substr(md5(CAST(t.doc_id AS VARCHAR)),1,8) AS BIGINT) AS DOUBLE) / 4294967296.0 " +
        "< CAST(mn.min_tokens AS DOUBLE) / CAST(bl.lang_tokens AS DOUBLE)) AS keep " +
        "FROM t JOIN bl ON t.lang = bl.lang CROSS JOIN mn"),
    // mixTemperature replay at T=2 (e = 0.5): caps = lang_tokens^e, rate
    // = min_cap / cap ROUNDED to 6 before the keep compare (pow is not
    // bit-portable across engines; the rounding makes the decision so)
    "mix_temperature" ->
      ("WITH t AS (SELECT doc_id, lang, " +
        "COALESCE(CAST(len(string_split_regex(text, '\\s+')) AS BIGINT), 0) AS n_tokens FROM documents), " +
        "bl AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS lang_tokens FROM t GROUP BY 1), " +
        "cp AS (SELECT lang, lang_tokens, pow(CAST(lang_tokens AS DOUBLE), 0.5) AS cap FROM bl), " +
        "mn AS (SELECT min(cap) AS min_cap FROM cp) " +
        "SELECT t.doc_id, t.lang, t.n_tokens, " +
        "round(mn.min_cap / cp.cap, 6) AS rate, " +
        "(CAST(CAST('0x'||substr(md5(CAST(t.doc_id AS VARCHAR)),1,8) AS BIGINT) AS DOUBLE) / 4294967296.0 " +
        "< round(mn.min_cap / cp.cap, 6)) AS keep " +
        "FROM t JOIN cp ON t.lang = cp.lang CROSS JOIN mn"),
    // splitLeakage replay: the dedup_minhash pair CTEs + the corpus_split
    // hash CASE recomputed on both pair ids
    "split_leakage" -> {
      def sc(c: String) =
        s"(CASE WHEN CAST(CAST('0x'||substr(md5(CAST($c AS VARCHAR)),1,8) AS BIGINT) AS DOUBLE) / 4294967296.0 < 0.8 THEN 'train' " +
          s"WHEN CAST(CAST('0x'||substr(md5(CAST($c AS VARCHAR)),1,8) AS BIGINT) AS DOUBLE) / 4294967296.0 < 0.9 THEN 'val' " +
          "ELSE 'test' END)"
      s"WITH ${minhashPairsCtes()} SELECT * FROM (" +
        "SELECT id1, id2, est_jaccard, " +
        s"${sc("id1")} AS split1, ${sc("id2")} AS split2 " +
        "FROM mh WHERE est_jaccard >= 0.5) WHERE split1 <> split2"
    },
    // chunkPlan replay: pure integer window arithmetic + generate_series
    "chunk_plan" ->
      ("WITH t AS (SELECT doc_id, " +
        "COALESCE(CAST(len(string_split_regex(text, '\\s+')) AS BIGINT), 0) AS n_tokens FROM documents), " +
        "n AS (SELECT doc_id, n_tokens, " +
        "CASE WHEN n_tokens = 0 THEN 0 ELSE 1 + (greatest(n_tokens - 128, 0) + 95) // 96 END AS n_chunks FROM t) " +
        "SELECT doc_id, n_tokens, CAST(ci AS BIGINT) AS chunk_idx, " +
        "CAST(ci * 96 AS BIGINT) AS tok_start, " +
        "CAST(least(ci * 96 + 128, n_tokens) AS BIGINT) AS tok_end " +
        "FROM n, unnest(generate_series(0, CAST(n_chunks - 1 AS BIGINT))) AS u(ci) " +
        "WHERE n_chunks > 0"),
    // corpusSplit replay: hash32/2^32 is exact in a double (h < 2^32,
    // division by a power of two), so the threshold compares are
    // bit-identical; no representable u falls between 0.9 and Spark's
    // computed 0.8+0.1 (gap ~1e-16 vs u granularity 2^-32)
    "corpus_split" ->
      ("SELECT doc_id, lang, CASE WHEN u < 0.8 THEN 'train' " +
        "WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split FROM (" +
        "SELECT doc_id, lang, " +
        "CAST(CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8) AS BIGINT) AS DOUBLE) / 4294967296.0 AS u " +
        "FROM documents)"),
    // qualityPrune replay: per-lang exact interpolated quantile
    // (quantile_cont == Spark's percentile), scores and thresholds
    // rounded to 6 before the keep compare; null scores stay null-keep
    "quality_prune" ->
      ("WITH f AS (SELECT doc_id, lang, " +
        "CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) AS nw, " +
        "CAST(length(text) AS DOUBLE) AS nc, " +
        "CAST(length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS DOUBLE) AS np, " +
        "CAST(len(list_filter(string_split_regex(text, '\\s+'), " +
        "w -> w IN ('the','a','and','of','to','in','is','it','for','on'))) AS DOUBLE) AS ns " +
        "FROM documents), " +
        "sc AS (SELECT doc_id, lang, " +
        "round(0.5 * (ns / nw) + 0.3 * (1.0 - np / nc) + 0.2 * least(nw / 100.0, 1.0), 6) AS score FROM f), " +
        "th AS (SELECT lang, round(quantile_cont(score, 0.25), 6) AS lang_thr FROM sc GROUP BY 1) " +
        "SELECT sc.doc_id, sc.lang, sc.score, th.lang_thr, " +
        "sc.score >= th.lang_thr AS keep FROM sc JOIN th ON th.lang = sc.lang"),
    // budgetSample replay: exclusive per-lang prefix sum over the
    // deterministic (hash, doc_id) order — the scan's window equivalent
    "budget_sample" ->
      ("WITH t AS (SELECT doc_id, lang, " +
        "COALESCE(CAST(len(string_split_regex(text, '\\s+')) AS BIGINT), 0) AS n_tokens, " +
        "CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8) AS BIGINT) AS h FROM documents), " +
        "c AS (SELECT doc_id, lang, n_tokens, " +
        "CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before FROM t) " +
        "SELECT doc_id, lang, n_tokens, cum_before, cum_before < 20000 AS keep FROM c"),
    // domainCap replay: same quality score as quality_prune, per-SOURCE
    // top-`cap` by (score DESC, doc_id) — the window is oracle-scale
    // only; the engine uses the bounded TopKByScore heap
    "domain_cap" ->
      ("WITH f AS (SELECT doc_id, source, " +
        "CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) AS nw, " +
        "CAST(length(text) AS DOUBLE) AS nc, " +
        "CAST(length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS DOUBLE) AS np, " +
        "CAST(len(list_filter(string_split_regex(text, '\\s+'), " +
        "w -> w IN ('the','a','and','of','to','in','is','it','for','on'))) AS DOUBLE) AS ns " +
        "FROM documents), " +
        "sc AS (SELECT doc_id, source, " +
        "round(0.5 * (ns / nw) + 0.3 * (1.0 - np / nc) + 0.2 * least(nw / 100.0, 1.0), 6) AS score FROM f), " +
        "rk AS (SELECT doc_id, row_number() OVER (PARTITION BY source " +
        "ORDER BY score DESC, doc_id) AS rn FROM sc WHERE score IS NOT NULL) " +
        "SELECT sc.doc_id, sc.source, sc.score, " +
        "COALESCE(rk.rn <= 15, false) AS keep FROM sc LEFT JOIN rk ON rk.doc_id = sc.doc_id"),
    // domainCapTokens replay: budget_sample's prefix scan with the
    // stratum swapped from language to source
    "domain_cap_tokens" ->
      ("WITH t AS (SELECT doc_id, source, " +
        "COALESCE(CAST(len(string_split_regex(text, '\\s+')) AS BIGINT), 0) AS n_tokens, " +
        "CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8) AS BIGINT) AS h FROM documents), " +
        "c AS (SELECT doc_id, source, n_tokens, " +
        "CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before FROM t) " +
        "SELECT doc_id, source, n_tokens, cum_before, cum_before < 800 AS keep FROM c"),
    // bm25 replay: Lucene-style idf, per-term contributions rounded to 6
    // and summed in exact DECIMAL(18,6) (association-order-free), same
    // left-assoc double expression shapes as the Spark side
    "bm25_search" ->
      ("WITH lens AS (SELECT doc_id, " +
        "COALESCE(CAST(len(string_split_regex(text, '\\s+')) AS BIGINT), 0) AS dl FROM documents), " +
        "stats AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS tot FROM lens), " +
        "q AS (SELECT unnest(['spark', 'join', 'data']) AS term), " +
        "toks AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS term FROM documents), " +
        "tf AS (SELECT doc_id, toks.term, count(*) AS tf FROM toks JOIN q ON q.term = toks.term GROUP BY 1, 2), " +
        "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1), " +
        "contrib AS (SELECT tf.doc_id, " +
        "CAST(round(ln((n - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) / " +
        "(tf + 1.2 * (0.25 + (0.75 * dl) / (CAST(tot AS DOUBLE) / n))), 6) AS DECIMAL(18,6)) AS c " +
        "FROM tf JOIN df ON df.term = tf.term JOIN lens ON lens.doc_id = tf.doc_id CROSS JOIN stats) " +
        "SELECT doc_id, score FROM (" +
        "SELECT doc_id, CAST(sum(c) AS DOUBLE) AS score, " +
        "row_number() OVER (ORDER BY CAST(sum(c) AS DOUBLE) DESC, doc_id) AS rn " +
        "FROM contrib GROUP BY 1) WHERE rn <= 20"),
    // lmPerplexity replay: add-one bigram LM trained on the src0 slice,
    // OOV folded to <unk>, P = (c12+1)/(c1+V) — a ratio of small exact
    // integers, so both engines take ln of the identical double; ppl
    // exponentiates the ALREADY-rounded log avg
    "lm_perplexity" ->
      ("WITH dw AS (SELECT doc_id, source, string_split_regex(text, '\\s+') AS ws FROM documents), " +
        "tr AS (SELECT ws FROM dw WHERE source = 'src0'), " +
        "vocab AS (SELECT DISTINCT unnest(ws) AS w FROM tr), " +
        "vocab2 AS (SELECT w FROM vocab WHERE w <> ''), " +
        "vn AS (SELECT count(*) + 1 AS V FROM vocab2), " +
        "trb0 AS (SELECT unnest(generate_series(1, len(ws)-1)) AS i, ws FROM tr WHERE len(ws) >= 2), " +
        "trb AS (SELECT ws[i] AS w1, ws[i+1] AS w2 FROM trb0), " +
        "c12 AS (SELECT w1, w2, count(*) AS c12 FROM trb GROUP BY 1, 2), " +
        "c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1), " +
        "db0 AS (SELECT doc_id, unnest(generate_series(1, len(ws)-1)) AS i, ws FROM dw WHERE len(ws) >= 2), " +
        "db AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2 FROM db0), " +
        "dm AS (SELECT doc_id, " +
        "CASE WHEN v1.w IS NULL THEN '<unk>' ELSE db.w1 END AS w1m, " +
        "CASE WHEN v2.w IS NULL THEN '<unk>' ELSE db.w2 END AS w2m, " +
        "(v1.w IS NULL OR v2.w IS NULL) AS oov " +
        "FROM db LEFT JOIN vocab2 v1 ON v1.w = db.w1 LEFT JOIN vocab2 v2 ON v2.w = db.w2), " +
        "sc AS (SELECT doc_id, oov, " +
        "-ln(CAST(COALESCE(c12.c12, 0) + 1 AS DOUBLE) / CAST(COALESCE(c1.c1, 0) + vn.V AS DOUBLE)) AS nll " +
        "FROM dm LEFT JOIN c12 ON c12.w1 = dm.w1m AND c12.w2 = dm.w2m " +
        "LEFT JOIN c1 ON c1.w1 = dm.w1m CROSS JOIN vn) " +
        "SELECT doc_id, count(*) AS n_bigrams, " +
        "CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS oov_bigrams, " +
        "round(avg(nll), 6) AS log_ppl, " +
        "round(exp(round(avg(nll), 6)), 6) AS ppl " +
        "FROM sc GROUP BY 1"),
    // CCNet buckets replay: the full lm_perplexity chain, then the value
    // HISTOGRAM + cumulative counts pick the tercile order statistics
    "ccnet_buckets" ->
      ("WITH dw AS (SELECT doc_id, source, string_split_regex(text, '\\s+') AS ws FROM documents), " +
        "tr AS (SELECT ws FROM dw WHERE source = 'src0'), " +
        "vocab AS (SELECT DISTINCT unnest(ws) AS w FROM tr), " +
        "vocab2 AS (SELECT w FROM vocab WHERE w <> ''), " +
        "vn AS (SELECT count(*) + 1 AS V FROM vocab2), " +
        "trb0 AS (SELECT unnest(generate_series(1, len(ws)-1)) AS i, ws FROM tr WHERE len(ws) >= 2), " +
        "trb AS (SELECT ws[i] AS w1, ws[i+1] AS w2 FROM trb0), " +
        "c12 AS (SELECT w1, w2, count(*) AS c12 FROM trb GROUP BY 1, 2), " +
        "c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1), " +
        "db0 AS (SELECT doc_id, unnest(generate_series(1, len(ws)-1)) AS i, ws FROM dw WHERE len(ws) >= 2), " +
        "db AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2 FROM db0), " +
        "dm AS (SELECT doc_id, " +
        "CASE WHEN v1.w IS NULL THEN '<unk>' ELSE db.w1 END AS w1m, " +
        "CASE WHEN v2.w IS NULL THEN '<unk>' ELSE db.w2 END AS w2m " +
        "FROM db LEFT JOIN vocab2 v1 ON v1.w = db.w1 LEFT JOIN vocab2 v2 ON v2.w = db.w2), " +
        "sc AS (SELECT doc_id, " +
        "-ln(CAST(COALESCE(c12.c12, 0) + 1 AS DOUBLE) / CAST(COALESCE(c1.c1, 0) + vn.V AS DOUBLE)) AS nll " +
        "FROM dm LEFT JOIN c12 ON c12.w1 = dm.w1m AND c12.w2 = dm.w2m " +
        "LEFT JOIN c1 ON c1.w1 = dm.w1m CROSS JOIN vn), " +
        "pp AS (SELECT doc_id, round(exp(round(avg(nll), 6)), 6) AS ppl FROM sc GROUP BY 1), " +
        "sl AS (SELECT pp.doc_id, d.lang, pp.ppl FROM pp JOIN documents d ON d.doc_id = pp.doc_id), " +
        "cnts AS (SELECT lang, ppl, count(*) AS c FROM sl GROUP BY 1, 2), " +
        "nn AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM cnts GROUP BY 1), " +
        "cum AS (SELECT lang, ppl, CAST(sum(c) OVER (PARTITION BY lang ORDER BY ppl " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM cnts), " +
        "cuts AS (SELECT cum.lang, " +
        "min(CASE WHEN cum >= (n + 2) // 3 THEN ppl END) AS c1, " +
        "min(CASE WHEN cum >= (2 * n + 2) // 3 THEN ppl END) AS c2 " +
        "FROM cum JOIN nn ON nn.lang = cum.lang GROUP BY 1) " +
        "SELECT sl.doc_id, sl.lang, sl.ppl, " +
        "CASE WHEN sl.ppl <= cuts.c1 THEN 'head' WHEN sl.ppl <= cuts.c2 THEN 'middle' " +
        "ELSE 'tail' END AS bucket FROM sl JOIN cuts ON cuts.lang = sl.lang"),
    // span_dedup replay: fixed 10-word spans via list slicing, packed
    // first-occurrence min, ordered string_agg rebuild
    "span_dedup" ->
      ("WITH dw AS (SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents), " +
        "sp0 AS (SELECT doc_id, ws, unnest(generate_series(0, CAST(ceil(len(ws) / 10.0) AS INTEGER) - 1)) AS idx FROM dw), " +
        "sp AS (SELECT doc_id, idx, array_to_string(ws[idx * 10 + 1 : idx * 10 + 10], ' ') AS span FROM sp0), " +
        "hh AS (SELECT doc_id, idx, span, md5(span) AS h, doc_id * 1048576 + idx AS pk FROM sp), " +
        "f AS (SELECT h, min(pk) AS first_pk FROM hh GROUP BY 1), " +
        "j AS (SELECT hh.doc_id, hh.idx, hh.span, (hh.pk = f.first_pk) AS kept " +
        "FROM hh JOIN f ON f.h = hh.h) " +
        "SELECT doc_id, count(*) AS n_spans, " +
        "CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, " +
        "coalesce(string_agg(CASE WHEN kept THEN span END, ' ' ORDER BY idx), '') AS text " +
        "FROM j GROUP BY 1"),
    // ExactSubstr-prune replay: identical md5-prefix w-gram hashes, the
    // repeat screen a HAVING count >= 2, coverage expanded per start,
    // kept words re-agg'd in position order
    "exactsubstr_prune" ->
      ("WITH dw AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws FROM documents), " +
        "wp0 AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM dw), " +
        "wq AS (SELECT doc_id, i - 1 AS pos, ws[i] AS word FROM wp0), " +
        "gi AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS i FROM dw WHERE len(ws) >= 8), " +
        "g AS (SELECT doc_id, i - 1 AS pos, CAST('0x' || substr(md5(array_to_string(ws[i : i + 7], ' ')), 1, 8) AS BIGINT) AS h FROM gi), " +
        "rep AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2), " +
        "cov AS (SELECT DISTINCT doc_id, p FROM (SELECT g.doc_id, unnest(generate_series(g.pos, g.pos + 7)) AS p FROM g JOIN rep USING (h))), " +
        "kept AS (SELECT wq.doc_id, wq.pos, wq.word FROM wq LEFT JOIN cov ON cov.doc_id = wq.doc_id AND cov.p = wq.pos WHERE cov.p IS NULL), " +
        "st AS (SELECT doc_id, COALESCE(CAST(len(ws) AS BIGINT), 0) AS n_words FROM dw), " +
        "rb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept, string_agg(word, ' ' ORDER BY pos) AS text FROM kept GROUP BY 1) " +
        "SELECT st.doc_id AS doc_id, n_words, n_words - COALESCE(n_kept, 0) AS n_removed, " +
        "COALESCE(rb.text, '') AS text FROM st LEFT JOIN rb USING (doc_id)"),
    // span-scrub replay: the exactsubstr_prune rebuild with the repeat
    // screen replaced by membership in the benchmark's distinct gram set;
    // corpus cut is IS DISTINCT FROM so a null source is CORPUS (the
    // spanScrub null-fold contract), never silently dropped
    "decontam_scrub" ->
      ("WITH dw AS (SELECT doc_id, source, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws FROM documents), " +
        "bgi AS (SELECT ws, unnest(generate_series(1, len(ws) - 7)) AS i FROM dw WHERE source = 'src0' AND len(ws) >= 8), " +
        "bg AS (SELECT DISTINCT CAST('0x' || substr(md5(array_to_string(ws[i : i + 7], ' ')), 1, 8) AS BIGINT) AS h FROM bgi), " +
        "cw AS (SELECT doc_id, ws FROM dw WHERE source IS DISTINCT FROM 'src0'), " +
        "wp0 AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM cw), " +
        "wq AS (SELECT doc_id, i - 1 AS pos, ws[i] AS word FROM wp0), " +
        "gi AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS i FROM cw WHERE len(ws) >= 8), " +
        "g AS (SELECT doc_id, i - 1 AS pos, CAST('0x' || substr(md5(array_to_string(ws[i : i + 7], ' ')), 1, 8) AS BIGINT) AS h FROM gi), " +
        "cov AS (SELECT DISTINCT doc_id, p FROM (SELECT g.doc_id, unnest(generate_series(g.pos, g.pos + 7)) AS p FROM g JOIN bg USING (h))), " +
        "kept AS (SELECT wq.doc_id, wq.pos, wq.word FROM wq LEFT JOIN cov ON cov.doc_id = wq.doc_id AND cov.p = wq.pos WHERE cov.p IS NULL), " +
        "st AS (SELECT doc_id, COALESCE(CAST(len(ws) AS BIGINT), 0) AS n_words FROM cw), " +
        "rb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept, string_agg(word, ' ' ORDER BY pos) AS text FROM kept GROUP BY 1) " +
        "SELECT st.doc_id AS doc_id, n_words, n_words - COALESCE(n_kept, 0) AS n_removed, " +
        "COALESCE(rb.text, '') AS text FROM st LEFT JOIN rb USING (doc_id)"),
    // edit_join replay: the all-pairs verify IS the oracle (DuckDB's
    // levenshtein, length band a = the k=1 pigeonhole) — the FastSS
    // candidate set is exactly what this cross check must reproduce
    "edit_join" ->
      ("SELECT a.s_suppkey AS id1, b.s_suppkey AS id2, " +
        "CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist " +
        "FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey " +
        "AND abs(len(a.s_name) - len(b.s_name)) <= 1 " +
        "WHERE levenshtein(a.s_name, b.s_name) <= 1"),
    // edit_cluster replay: the edit_join all-pairs oracle feeding the
    // image_dedup recursive-CTE CC, min-id keeper, full spine
    "edit_cluster" ->
      ("WITH RECURSIVE pr AS (SELECT a.s_suppkey AS id1, b.s_suppkey AS id2 " +
        "FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey " +
        "AND abs(len(a.s_name) - len(b.s_name)) <= 1 " +
        "WHERE levenshtein(a.s_name, b.s_name) <= 1), " +
        "edges AS (SELECT id1 AS a, id2 AS b FROM pr UNION SELECT id2, id1 FROM pr), " +
        "nodes AS (SELECT DISTINCT a AS nid FROM edges), " +
        "comp AS (SELECT nid, nid AS lbl FROM nodes " +
        "UNION SELECT e.a AS nid, c.lbl FROM edges e JOIN comp c ON e.b = c.nid), " +
        "labels AS (SELECT nid, min(lbl) AS cluster_id FROM comp GROUP BY 1) " +
        "SELECT s.s_suppkey AS id, s.s_name AS s, " +
        "COALESCE(l.cluster_id, s.s_suppkey) AS cluster_id, " +
        "(s.s_suppkey = COALESCE(l.cluster_id, s.s_suppkey)) AS keep " +
        "FROM supplier s LEFT JOIN labels l ON l.nid = s.s_suppkey"),
    // dHash image-dedup replay: the stub luma grid is md5-hex byte pairs
    // (position (2i mod 31)+1 — pure string/integer logic, no codec), the
    // 63-bit dHash a sum of shifted gradient-sign bits, banding/Hamming/
    // CC replayed exactly like corpus_dedup's recursive min-label CTE
    "image_dedup" ->
      ("WITH RECURSIVE hx AS (SELECT doc_id, md5(text) AS h FROM documents), " +
        "lb AS (SELECT doc_id, h, b, b // 8 AS r, b % 8 AS c " +
        "FROM hx CROSS JOIN range(63) t(b)), " +
        "bits AS (SELECT doc_id, " +
        "CASE WHEN CAST('0x'||substr(h, ((r*9+c+1)*2) % 31 + 1, 2) AS BIGINT) > " +
        "CAST('0x'||substr(h, ((r*9+c)*2) % 31 + 1, 2) AS BIGINT) " +
        "THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END AS bit FROM lb), " +
        "d AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS dhash FROM bits GROUP BY 1), " +
        "ch AS (SELECT doc_id, dhash, t.b AS chunk, " +
        "(dhash >> (t.b * 16)) & (CASE WHEN t.b = 3 THEN 32767 ELSE 65535 END) AS cval " +
        "FROM d CROSS JOIN range(4) t(b)), " +
        "pr AS (SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2 " +
        "FROM ch x JOIN ch y ON x.chunk = y.chunk AND x.cval = y.cval AND x.doc_id < y.doc_id " +
        "WHERE bit_count(xor(x.dhash, y.dhash)) <= 3), " +
        "edges AS (SELECT id1 AS a, id2 AS b FROM pr UNION SELECT id2, id1 FROM pr), " +
        "nodes AS (SELECT DISTINCT a AS doc_id FROM edges), " +
        "comp AS (SELECT doc_id, doc_id AS lbl FROM nodes " +
        "UNION SELECT e.a AS doc_id, c.lbl FROM edges e JOIN comp c ON e.b = c.doc_id), " +
        "labels AS (SELECT doc_id, min(lbl) AS cluster_id FROM comp GROUP BY 1) " +
        "SELECT d.doc_id AS doc_id, d.dhash AS dhash, " +
        "COALESCE(l.cluster_id, d.doc_id) AS cluster_id, " +
        "(d.doc_id = COALESCE(l.cluster_id, d.doc_id)) AS keep " +
        "FROM d LEFT JOIN labels l ON l.doc_id = d.doc_id"),
    // videoDedup replay: per-frame md5(text||'#'||f) stub grids, aligned
    // (f, chunk, cval) candidate join, strict-majority verify, same
    // recursive-CTE CC as image_dedup
    "video_dedup" ->
      ("WITH RECURSIVE d0 AS (SELECT doc_id, text, " +
        "LEAST(1 + len(text) // 256, 4) AS nf FROM documents), " +
        "fr AS (SELECT doc_id, nf, t.f AS f, " +
        "md5(text || '#' || CAST(t.f AS VARCHAR)) AS h " +
        "FROM d0 CROSS JOIN range(4) t(f) WHERE t.f < nf), " +
        "lb AS (SELECT doc_id, nf, f, h, b, b // 8 AS r, b % 8 AS c " +
        "FROM fr CROSS JOIN range(63) t(b)), " +
        "bits AS (SELECT doc_id, nf, f, " +
        "CASE WHEN CAST('0x'||substr(h, ((r*9+c+1)*2) % 31 + 1, 2) AS BIGINT) > " +
        "CAST('0x'||substr(h, ((r*9+c)*2) % 31 + 1, 2) AS BIGINT) " +
        "THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END AS bit FROM lb), " +
        "fd AS (SELECT doc_id, nf, f, CAST(sum(bit) AS BIGINT) AS dhash " +
        "FROM bits GROUP BY 1, 2, 3), " +
        "ch AS (SELECT doc_id, nf, f, dhash, t.b AS chunk, " +
        "(dhash >> (t.b * 16)) & (CASE WHEN t.b = 3 THEN 32767 ELSE 65535 END) AS cval " +
        "FROM fd CROSS JOIN range(4) t(b)), " +
        "fm AS (SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2, x.f AS f, " +
        "LEAST(x.nf, y.nf) AS al " +
        "FROM ch x JOIN ch y ON x.f = y.f AND x.chunk = y.chunk " +
        "AND x.cval = y.cval AND x.doc_id < y.doc_id " +
        "WHERE bit_count(xor(x.dhash, y.dhash)) <= 3), " +
        "pr AS (SELECT id1, id2 FROM (SELECT id1, id2, count(*) AS nm, " +
        "min(al) AS al FROM fm GROUP BY 1, 2) WHERE 2 * nm > al), " +
        "edges AS (SELECT id1 AS a, id2 AS b FROM pr UNION SELECT id2, id1 FROM pr), " +
        "nodes AS (SELECT DISTINCT a AS doc_id FROM edges), " +
        "comp AS (SELECT doc_id, doc_id AS lbl FROM nodes " +
        "UNION SELECT e.a AS doc_id, c.lbl FROM edges e JOIN comp c ON e.b = c.doc_id), " +
        "labels AS (SELECT doc_id, min(lbl) AS cluster_id FROM comp GROUP BY 1) " +
        "SELECT d0.doc_id AS doc_id, CAST(d0.nf AS BIGINT) AS n_frames, " +
        "COALESCE(l.cluster_id, d0.doc_id) AS cluster_id, " +
        "(d0.doc_id = COALESCE(l.cluster_id, d0.doc_id)) AS keep " +
        "FROM d0 LEFT JOIN labels l ON l.doc_id = d0.doc_id"),
    // pseudoScore replay: distinct md5-hash buckets, Knuth pseudo-weight
    // micro integers, exact BIGINT z sum, shared-libm sigmoid rounded 12
    "classifier_score" ->
      ("WITH t AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS w " +
        "FROM documents), " +
        "b AS (SELECT DISTINCT doc_id, " +
        "CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % 1024 AS b " +
        "FROM t WHERE w <> ''), " +
        "z AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_buckets, " +
        "CAST(sum((b * 2654435761) % 2000001 - 1000000) AS BIGINT) AS zmicro " +
        "FROM b GROUP BY 1) " +
        "SELECT doc_id, n_buckets, " +
        "round(1.0 / (1.0 + exp(-CAST(zmicro AS DOUBLE) / 1000000.0)), 12) AS score, " +
        "(zmicro >= 0) AS pred FROM z"),
    // Layout.zorderKey replay: the same 42 shift/and/or interleave terms
    // over masked part/supp keys, on the same one-month slice
    "zorder_key" ->
      (s"SELECT l_orderkey, l_linenumber, ${zorderSqlExpr(
        Seq("(l_partkey & 2097151)", "(l_suppkey & 2097151)"), 21)} AS zval " +
        "FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1995-03-01 00:00:00' " +
        "AND l_shipdate < TIMESTAMP '1995-04-01 00:00:00'"),
    // Layout.zorderSkip replay: max-normalize to 8 bits with `//` integer
    // division (Spark's exact-double floor), 16-bit interleave, 64 files
    // per layout (xn>>2 slabs vs z>>10 grid), min/max-box overlap with
    // the centered [64,95]^2 predicate
    "zorder_skip" ->
      ("WITH mx AS (SELECT max(l_partkey) AS mx, max(l_suppkey) AS my FROM lineitem), " +
        "base AS (SELECT (l_partkey * 256) // (mx + 1) AS xn, " +
        "(l_suppkey * 256) // (my + 1) AS yn FROM lineitem, mx), " +
        s"z AS (SELECT xn, yn, ${zorderSqlExpr(Seq("xn", "yn"), 8)} AS z FROM base), " +
        "lf AS (SELECT xn >> 2 AS file_id, min(xn) AS min_x, max(xn) AS max_x, " +
        "min(yn) AS min_y, max(yn) AS max_y, count(*) AS n FROM z GROUP BY 1), " +
        "zf AS (SELECT z >> 10 AS file_id, min(xn) AS min_x, max(xn) AS max_x, " +
        "min(yn) AS min_y, max(yn) AS max_y, count(*) AS n FROM z GROUP BY 1) " +
        "SELECT 'linear_x' AS layout, CAST(count(*) AS BIGINT) AS files_total, " +
        "CAST(sum(CASE WHEN min_x <= 95 AND max_x >= 64 AND min_y <= 95 AND max_y >= 64 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS files_read, " +
        "CAST(sum(CASE WHEN min_x <= 95 AND max_x >= 64 AND min_y <= 95 AND max_y >= 64 " +
        "THEN n ELSE 0 END) AS BIGINT) AS rows_read FROM lf " +
        "UNION ALL " +
        "SELECT 'zorder' AS layout, CAST(count(*) AS BIGINT) AS files_total, " +
        "CAST(sum(CASE WHEN min_x <= 95 AND max_x >= 64 AND min_y <= 95 AND max_y >= 64 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS files_read, " +
        "CAST(sum(CASE WHEN min_x <= 95 AND max_x >= 64 AND min_y <= 95 AND max_y >= 64 " +
        "THEN n ELSE 0 END) AS BIGINT) AS rows_read FROM zf"),
    // Layout.curveSkip replay: the same normalize + interleave CTEs, the
    // Hilbert xy->d unroll as 8 generated per-level CTEs (the identical
    // CASE/shift template Layout.withHilbert chains as projections),
    // 64-file stats per layout, both predicates per layout
    "hilbert_skip" -> hilbertSkipSql,
    // DSIR replay: md5-prefix hashed unigram buckets, add-one smoothed
    // target/raw models, 12-rounded log-ratios summed exact decimal
    "dsir_weights" ->
      ("WITH dw AS (SELECT doc_id, (lang = 'en') AS is_target, " +
        "unnest(string_split_regex(text, '\\s+')) AS w FROM documents), " +
        "tk AS (SELECT doc_id, is_target, " +
        "CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % 8192 AS b FROM dw WHERE w <> ''), " +
        "rc AS (SELECT b, count(*) AS rc FROM tk GROUP BY 1), " +
        "tc AS (SELECT b, count(*) AS tc FROM tk WHERE is_target GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS t_total, " +
        "count(*) AS r_total FROM tk), " +
        "ft AS (SELECT rc.b, CAST(round(" +
        "ln(CAST(COALESCE(tc.tc, 0) + 1 AS DOUBLE) / CAST(t_total + 8192 AS DOUBLE)) - " +
        "ln(CAST(rc.rc + 1 AS DOUBLE) / CAST(r_total + 8192 AS DOUBLE)), 12) AS DECIMAL(28,12)) AS lr " +
        "FROM rc LEFT JOIN tc ON tc.b = rc.b CROSS JOIN tot) " +
        "SELECT tk.doc_id, count(*) AS n_tokens, " +
        "CAST(sum(ft.lr) AS DOUBLE) AS dsir_logratio, " +
        "CAST(sum(ft.lr) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS per_token " +
        "FROM tk JOIN ft ON ft.b = tk.b GROUP BY 1"),
    // vocabCoverage replay: term counts, rank by (freq DESC, term), and
    // each budget's covered-token sum — all exact integers until the
    // final rounded ratio
    "vocab_coverage" ->
      ("WITH t AS (SELECT unnest(string_split_regex(text, '\\s+')) AS term FROM documents), " +
        "tt AS (SELECT term FROM t WHERE term <> ''), " +
        "tot AS (SELECT count(*) AS total_tokens FROM tt), " +
        "f AS (SELECT term, count(*) AS freq FROM tt GROUP BY 1), " +
        "rk AS (SELECT term, freq, row_number() OVER (ORDER BY freq DESC, term) AS r FROM f), " +
        "top AS (SELECT * FROM rk WHERE r <= 1024), " +
        "b AS (SELECT unnest([16, 64, 256, 1024]) AS v), " +
        "cov AS (SELECT b.v, count(*) AS n_types, CAST(sum(top.freq) AS BIGINT) AS covered_tokens " +
        "FROM b JOIN top ON top.r <= b.v GROUP BY 1) " +
        "SELECT CAST(cov.v AS BIGINT) AS v, CAST(cov.n_types AS BIGINT) AS n_types, " +
        "cov.covered_tokens, tot.total_tokens, " +
        "round(CAST(cov.covered_tokens AS DOUBLE) / tot.total_tokens, 6) AS coverage " +
        "FROM cov CROSS JOIN tot"),
    // packPlan replay: the same exclusive per-lang prefix sum as one
    // window (fine at oracle scale; the engine uses the two-pass scan)
    "pack_plan" ->
      ("WITH t AS (SELECT doc_id, lang, " +
        "COALESCE(CAST(len(string_split_regex(text, '\\s+')) AS BIGINT), 0) AS n_tokens FROM documents), " +
        "c AS (SELECT doc_id, lang, n_tokens, " +
        "COALESCE(CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cb FROM t) " +
        "SELECT doc_id, lang, n_tokens, " +
        "CAST(cb // 2048 AS BIGINT) AS seq_id, " +
        "CAST(cb % 2048 AS BIGINT) AS seq_offset, " +
        "CAST(CASE WHEN n_tokens > 0 THEN (cb % 2048 + n_tokens - 1) // 2048 + 1 " +
        "ELSE 0 END AS BIGINT) AS n_seqs FROM c"),
    "mix_report" ->
      ("WITH f AS (SELECT lang, source, " +
        "COALESCE(len(string_split_regex(text, '\\s+')), 0) AS t, " +
        "CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) AS nw, " +
        "CAST(length(text) AS DOUBLE) AS nc, " +
        "CAST(length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS DOUBLE) AS np, " +
        "CAST(len(list_filter(string_split_regex(text, '\\s+'), " +
        "w -> w IN ('the','a','and','of','to','in','is','it','for','on'))) AS DOUBLE) AS ns " +
        "FROM documents), " +
        "g AS (SELECT lang, source, t, " +
        "0.5 * (ns / nw) + 0.3 * (1.0 - np / nc) + 0.2 * least(nw / 100.0, 1.0) AS score FROM f) " +
        "SELECT lang, source, count(*) AS n_docs, CAST(sum(t) AS BIGINT) AS total_tokens, " +
        "round(CAST(sum(CAST(score AS DECIMAL(18,12))) AS DOUBLE) / count(score), 6) AS mean_score " +
        "FROM g GROUP BY 1, 2"),
    "packing_stats" ->
      ("WITH tc AS (SELECT source, " +
        "COALESCE(len(string_split_regex(text, '\\s+')), 0) AS t FROM documents) " +
        "SELECT source, count(*) AS n_docs, CAST(sum(t) AS BIGINT) AS total_tokens, " +
        "CAST(max(t) AS BIGINT) AS max_tokens, " +
        "CAST(sum(CASE WHEN t > 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_over_ctx, " +
        "CAST(sum((t + 63) // 64) AS BIGINT) AS windows_padded, " +
        "CAST((sum(t) + 63) // 64 AS BIGINT) AS windows_packed, " +
        "round(CAST(sum((t + 63) // 64) * 64 - sum(t) AS DOUBLE) / (CAST(sum((t + 63) // 64) AS BIGINT) * 64), 6) AS padding_waste " +
        "FROM tc GROUP BY 1"),
    "doc_fingerprint" ->
      ("SELECT doc_id, md5(text) AS fp, substr(md5(text), 1, 8) AS fp_prefix, " +
        "CAST(length(text) AS BIGINT) AS n_chars_actual, " +
        "CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_words FROM documents"),
    "ngram_freq" ->
      ("WITH w AS (SELECT string_split_regex(text, '\\s+') AS ws FROM documents), " +
        "g AS (SELECT unnest(list_transform(generate_series(1, len(ws)-1), " +
        "i -> concat_ws(' ', ws[i], ws[i+1]))) AS ngram FROM w) " +
        "SELECT ngram, count(*) AS n FROM g GROUP BY 1 ORDER BY n DESC, ngram LIMIT 20"),
    "text_normalize" ->
      ("WITH x AS (SELECT doc_id, text, " +
        "trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm FROM documents) " +
        "SELECT doc_id, md5(norm) AS norm_fp, " +
        "CAST(length(norm) AS BIGINT) AS n_chars_norm, " +
        "CAST(length(text) AS BIGINT) AS n_chars_raw FROM x"),
    "pii_scrub" ->
      ("WITH x AS (SELECT doc_id, text, " +
        "regexp_replace(regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'), " +
        "'[0-9][0-9 ()-]{6,}[0-9]', '<NUMBER>', 'g') AS clean FROM documents) " +
        "SELECT doc_id, " +
        "CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS BIGINT) AS n_emails, " +
        "CAST(len(regexp_extract_all(text, '[0-9][0-9 ()-]{6,}[0-9]')) AS BIGINT) AS n_digit_runs, " +
        "md5(clean) AS clean_fp, CAST(length(clean) AS BIGINT) AS n_chars_clean FROM x"),
    "embedding_profile" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "x AS (SELECT generate_subscripts(v, 1) - 1 AS dim, unnest(v) AS x FROM e) " +
        "SELECT CAST(dim AS BIGINT) AS dim, count(*) AS n, min(x) AS min_x, max(x) AS max_x, " +
        "round(CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE) / count(*), 6) AS mean_x " +
        "FROM x GROUP BY 1"),
    "embed_neardup" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) " +
        "SELECT a.vec_id AS id1, b.vec_id AS id2, " +
        "round(list_cosine_similarity(a.v, b.v), 6) AS cos " +
        "FROM e a JOIN e b ON a.vec_id < b.vec_id " +
        "WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4"),
    "ann_topk" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "q AS (SELECT * FROM e WHERE vec_id < 10) " +
        "SELECT qid, id2, cos, rn FROM (" +
        "SELECT q.vec_id AS qid, e.vec_id AS id2, " +
        "round(list_cosine_similarity(q.v, e.v), 6) AS cos, " +
        "CAST(row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY round(list_cosine_similarity(q.v, e.v), 6) DESC, e.vec_id) AS BIGINT) AS rn " +
        "FROM q JOIN e ON e.vec_id <> q.vec_id) WHERE rn <= 5"),
    "multimodal_meta" ->
      ("SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
        "md5(text) AS content_md5, " +
        "substr(hex(encode(text)), 1, 16) AS payload_hex_prefix, " +
        "'text' AS modality FROM documents"),
    "multimodal_framesample" ->
      ("WITH m AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS duration_ms FROM documents), " +
        "f AS (SELECT doc_id, duration_ms, least(duration_ms // 100 + 1, 8) AS n FROM m), " +
        "x AS (SELECT doc_id, duration_ms, unnest(generate_series(0, n - 1)) AS frame_idx FROM f) " +
        "SELECT doc_id, duration_ms, CAST(frame_idx AS BIGINT) AS frame_idx, " +
        "CAST(frame_idx * 100 AS BIGINT) AS frame_ts_ms FROM x"),
    "approx_distinct" ->
      ("SELECT event_type, count(DISTINCT user_id) AS n_exact, true AS approx_ok " +
        "FROM events GROUP BY 1"),
    "approx_percentiles" ->
      ("SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50, " +
        "round(quantile_cont(value, 0.9), 6) AS p90, " +
        "round(quantile_cont(value, 0.99), 6) AS p99, true AS approx_ok " +
        "FROM events GROUP BY 1"),
    "multimodal_decode" ->
      ("WITH h AS (SELECT doc_id, CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) AS h32, " +
        "md5(text) AS hx FROM documents) " +
        "SELECT doc_id, 16 + h32 % 64 AS width, 16 + (h32 >> 8) % 64 AS height, " +
        "CAST(3 AS BIGINT) AS channels, " +
        (0 until 8).map(i =>
          s"CAST('0x' || substr(hx, ${2 * i + 1}, 2) AS BIGINT) / 255.0 AS f$i")
          .mkString(", ") +
        " FROM h"),
    "profile_lineitem" -> profileOracleSql,
    // dq_check replay: ONE aggregation row of integer counters, then one
    // SELECT per constraint; verdicts compare counters, never floats
    "dq_check" ->
      ("WITH a AS (SELECT count(*) AS n, count(l_shipdate) AS ship, " +
        "count(DISTINCT (l_orderkey, l_linenumber)) AS pk, " +
        "CAST(sum(CASE WHEN l_quantity BETWEEN 1.0 AND 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS q_ok, count(l_quantity) AS q_n, " +
        "CAST(sum(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS d_ok, count(l_discount) AS d_n, " +
        "CAST(sum(CASE WHEN l_tax BETWEEN 0.0 AND 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS t_ok, count(l_tax) AS t_n, " +
        "CAST(sum(CASE WHEN l_extendedprice BETWEEN 1.0 AND 100000000.0 THEN 1 ELSE 0 END) AS BIGINT) AS p_ok, count(l_extendedprice) AS p_n, " +
        "CAST(sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS rf_ok, count(l_returnflag) AS rf_n, " +
        "CAST(sum(CASE WHEN l_linestatus IN ('O','F') THEN 1 ELSE 0 END) AS BIGINT) AS ls_ok, count(l_linestatus) AS ls_n " +
        "FROM lineitem) " +
        "SELECT 'row_count' AS check_name, round(CAST(n AS DOUBLE), 6) AS metric, n >= 1 AS passed FROM a " +
        "UNION ALL SELECT 'complete_l_shipdate', round(CAST(ship AS DOUBLE) / CAST(n AS DOUBLE), 6), ship = n FROM a " +
        "UNION ALL SELECT 'unique_l_orderkey_l_linenumber', round(CAST(pk AS DOUBLE) / CAST(n AS DOUBLE), 6), pk = n FROM a " +
        "UNION ALL SELECT 'range_l_quantity', round(CAST(q_ok AS DOUBLE) / CAST(q_n AS DOUBLE), 6), q_ok = q_n FROM a " +
        "UNION ALL SELECT 'range_l_discount', round(CAST(d_ok AS DOUBLE) / CAST(d_n AS DOUBLE), 6), d_ok = d_n FROM a " +
        "UNION ALL SELECT 'range_l_tax', round(CAST(t_ok AS DOUBLE) / CAST(t_n AS DOUBLE), 6), t_ok = t_n FROM a " +
        "UNION ALL SELECT 'range_l_extendedprice', round(CAST(p_ok AS DOUBLE) / CAST(p_n AS DOUBLE), 6), p_ok = p_n FROM a " +
        "UNION ALL SELECT 'set_l_returnflag', round(CAST(rf_ok AS DOUBLE) / CAST(rf_n AS DOUBLE), 6), rf_ok = rf_n FROM a " +
        "UNION ALL SELECT 'set_l_linestatus', round(CAST(ls_ok AS DOUBLE) / CAST(ls_n AS DOUBLE), 6), ls_ok = ls_n FROM a"),
    "profile_approx" -> profileApproxOracleSql,
    "corpus_sample" ->
      ("SELECT doc_id, lang AS stratum FROM documents " +
        "WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) / 4294967296.0 < " +
        "CASE lang WHEN 'en' THEN 0.8 WHEN 'de' THEN 0.5 " +
        "WHEN 'fr' THEN 0.25 WHEN 'es' THEN 0.1 ELSE 0.0 END"),
    "corpus_curate" ->
      ("WITH f AS (SELECT doc_id, " +
        "CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) AS nw, " +
        "CAST(length(text) AS DOUBLE) AS nc, " +
        "CAST(length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS DOUBLE) AS np, " +
        "CAST(len(list_filter(string_split_regex(text, '\\s+'), " +
        "w -> w IN ('the','a','and','of','to','in','is','it','for','on'))) AS DOUBLE) AS ns " +
        "FROM documents), " +
        "q AS (SELECT doc_id, 0.5 * (ns / nw) + 0.3 * (1.0 - np / nc) + " +
        "0.2 * least(nw / 100.0, 1.0) AS score FROM f), " +
        "st AS (SELECT d.doc_id, " +
        "md5(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g'))) AS norm_fp, " +
        "q.score, q.score >= 0.42 AS passed_quality " +
        "FROM documents d JOIN q ON q.doc_id = d.doc_id), " +
        "k AS (SELECT norm_fp, first(doc_id ORDER BY score DESC, doc_id) AS keep_id " +
        "FROM st WHERE passed_quality GROUP BY 1) " +
        "SELECT st.doc_id, st.norm_fp, round(st.score, 6) AS score, st.passed_quality, " +
        "(st.passed_quality AND st.doc_id = k.keep_id) AS kept " +
        "FROM st LEFT JOIN k ON k.norm_fp = st.norm_fp"),
    "ann_lsh" -> annLshOracleSql(k = 5, numPlanes = 6),
    "ann_lsh_multi" -> annLshMultiOracleSql(k = 5, numPlanes = 6, numTables = 4),
    "ann_ivf" -> annIvfOracleSql(k = 5, numCells = 16, nprobe = 4),
    // recall@k monitor: the ann_topk brute CTE and the ann_ivf probe
    // CTEs (same seeds/assign/probes templates), overlap-joined per query
    "ann_recall" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10), " +
        "brute AS (SELECT qid, id2 FROM (" +
        "SELECT q.qid, e.vec_id AS id2, row_number() OVER (PARTITION BY q.qid " +
        "ORDER BY round(list_cosine_similarity(q.qv, e.v), 6) DESC, e.vec_id) AS rn " +
        "FROM q JOIN e ON e.vec_id <> q.qid) WHERE rn <= 5), " +
        "cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS cvec " +
        "FROM e ORDER BY vec_id LIMIT 16), " +
        "assigned AS (SELECT vec_id, v, cid FROM (" +
        "SELECT e.vec_id, e.v, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
        "ORDER BY round(list_cosine_similarity(e.v, c.cvec), 6) DESC, c.cid) AS arn " +
        "FROM e CROSS JOIN cents c) WHERE arn = 1), " +
        "probes AS (SELECT qid, qv, cid FROM (" +
        "SELECT q.qid, q.qv, c.cid, row_number() OVER (PARTITION BY q.qid " +
        "ORDER BY round(list_cosine_similarity(q.qv, c.cvec), 6) DESC, c.cid) AS prn " +
        "FROM q CROSS JOIN cents c) WHERE prn <= 4), " +
        "ivf AS (SELECT qid, id2 FROM (" +
        "SELECT p.qid, a.vec_id AS id2, row_number() OVER (PARTITION BY p.qid " +
        "ORDER BY round(list_cosine_similarity(p.qv, a.v), 6) DESC, a.vec_id) AS rn " +
        "FROM assigned a JOIN probes p ON a.cid = p.cid WHERE a.vec_id <> p.qid) WHERE rn <= 5) " +
        "SELECT b.qid, count(*) AS n_brute, count(i.id2) AS n_hits, " +
        "round(CAST(count(i.id2) AS DOUBLE) / count(*), 6) AS recall " +
        "FROM brute b LEFT JOIN ivf i ON b.qid = i.qid AND b.id2 = i.id2 " +
        "GROUP BY 1"),
    // semanticNearDup replay: the ann_ivf seed/assignment CTEs + a
    // within-cell triangular self-join at the rounded-cosine threshold
    "semantic_neardup" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS cvec " +
        "FROM e ORDER BY vec_id LIMIT 16), " +
        "assigned AS (SELECT vec_id, v, cid FROM (" +
        "SELECT e.vec_id, e.v, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
        "ORDER BY round(list_cosine_similarity(e.v, c.cvec), 6) DESC, c.cid) AS arn " +
        "FROM e CROSS JOIN cents c) WHERE arn = 1) " +
        "SELECT CAST(a.cid AS BIGINT) AS cid, a.vec_id AS id1, b.vec_id AS id2, " +
        "round(list_cosine_similarity(a.v, b.v), 6) AS cos " +
        "FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id " +
        "WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4"),
    // knnComponents replay: the knn_graph CTEs + the mutual filter + the
    // recursive min-label CC mold
    "knn_components" ->
      ("WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS cvec " +
        "FROM e ORDER BY vec_id LIMIT 16), " +
        "assigned AS (SELECT vec_id, v, cid FROM (" +
        "SELECT e.vec_id, e.v, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
        "ORDER BY round(list_cosine_similarity(e.v, c.cvec), 6) DESC, c.cid) AS arn " +
        "FROM e CROSS JOIN cents c) WHERE arn = 1), " +
        "p0 AS (SELECT a.vec_id, b.vec_id AS neighbor_id, " +
        "round(list_cosine_similarity(a.v, b.v), 6) AS cos " +
        "FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id <> b.vec_id), " +
        "p AS (SELECT vec_id, neighbor_id FROM (" +
        "SELECT vec_id, neighbor_id, row_number() OVER (" +
        "PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rn FROM p0) " +
        "WHERE rn <= 5), " +
        "mut AS (SELECT a.vec_id AS id1, a.neighbor_id AS id2 FROM p a " +
        "JOIN p b ON b.vec_id = a.neighbor_id AND b.neighbor_id = a.vec_id " +
        "WHERE a.vec_id < a.neighbor_id), " +
        "edges AS (SELECT id1 AS a, id2 AS b FROM mut UNION SELECT id2, id1 FROM mut), " +
        "nodes AS (SELECT DISTINCT a AS vec_id FROM edges), " +
        "comp AS (SELECT vec_id, vec_id AS lbl FROM nodes " +
        "UNION SELECT g.a AS vec_id, c.lbl FROM edges g JOIN comp c ON g.b = c.vec_id) " +
        "SELECT vec_id, min(lbl) AS cluster_id FROM comp GROUP BY 1"),
    "mad_outliers" ->
      ("WITH m AS (SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med " +
        "FROM events GROUP BY 1), " +
        "a AS (SELECT e.event_id, e.event_type, e.value, m.med, " +
        "round(abs(e.value - m.med), 6) AS adev FROM events e JOIN m USING (event_type)), " +
        "d AS (SELECT event_type, round(quantile_cont(adev, 0.5), 6) AS mad " +
        "FROM a GROUP BY 1) " +
        "SELECT a.event_id, a.event_type, a.value, a.med, d.mad, " +
        "a.adev > d.mad * 3 AS outlier FROM a JOIN d USING (event_type)"),
    "embedding_covariance" ->
      ("WITH e AS (SELECT vec_id, " +
        "generate_subscripts(CAST(embedding AS DOUBLE[]), 1) - 1 AS i, " +
        "CAST(floor(unnest(CAST(embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS xq " +
        "FROM embeddings) " +
        "SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j, " +
        "round((CAST(sum(a.xq * b.xq) AS DOUBLE) / count(*) - " +
        "(CAST(sum(a.xq) AS DOUBLE) / count(*)) * " +
        "(CAST(sum(b.xq) AS DOUBLE) / count(*))) / 1000000000000.0, 6) + 0.0 AS cov " +
        "FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i " +
        "GROUP BY 1, 2"),
    // knnGraph replay: the semantic_neardup assignment CTEs + a full
    // within-cell join ranked per vector (cos desc, neighbor asc) ≤ k
    "knn_graph" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS cvec " +
        "FROM e ORDER BY vec_id LIMIT 16), " +
        "assigned AS (SELECT vec_id, v, cid FROM (" +
        "SELECT e.vec_id, e.v, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
        "ORDER BY round(list_cosine_similarity(e.v, c.cvec), 6) DESC, c.cid) AS arn " +
        "FROM e CROSS JOIN cents c) WHERE arn = 1), " +
        "p AS (SELECT a.vec_id, b.vec_id AS neighbor_id, " +
        "round(list_cosine_similarity(a.v, b.v), 6) AS cos " +
        "FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id <> b.vec_id) " +
        "SELECT vec_id, neighbor_id, cos, rn FROM (" +
        "SELECT vec_id, neighbor_id, cos, CAST(row_number() OVER (" +
        "PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn " +
        "FROM p) WHERE rn <= 5"),
    // pageRank replay: the knn_graph CTEs as the edge list, then THREE
    // unrolled integer-scaled iterations — every intermediate BIGINT
    // (pr in 1e-9 units, contributions pr // outdeg, damping
    // (85*s) // 100), so the replay is bit-exact by construction
    // assortativity replay: undirected view off the kNN graph, exact
    // integer degree co-moments (DuckDB HUGEINT sums), closed form in
    // doubles of exact integers, identical op order
    "knn_assortativity" ->
      (KnnGraphSql +
        "und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM g WHERE src <> dst), " +
        "dg AS (SELECT x, count(*) AS d FROM (SELECT u AS x FROM und UNION ALL SELECT v FROM und) GROUP BY 1), " +
        "a AS (SELECT count(*) AS m, CAST(sum(du.d + dv.d) AS BIGINT) AS sx, " +
        "CAST(sum(du.d * du.d + dv.d * dv.d) AS BIGINT) AS sxx, " +
        "CAST(sum(2 * du.d * dv.d) AS BIGINT) AS sxy " +
        "FROM und JOIN dg du ON und.u = du.x JOIN dg dv ON und.v = dv.x) " +
        "SELECT m AS m_edges, " +
        "round((2.0 * CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / " +
        "(CASE WHEN 2.0 * CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0 " +
        "THEN 2.0 * CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) END), 6) AS assortativity FROM a"),
    // Benford replay: first [1-9] of the value's string form (notation
    // changes preserve the leading significant digit), literal
    // expectations cast to DOUBLE, share rounded before the deviation
    "benford_check" ->
      ("WITH cnt AS (SELECT CAST(NULLIF(regexp_extract(CAST(o_totalprice AS VARCHAR), '([1-9])', 1), '') AS INTEGER) AS digit, " +
        "count(*) AS n FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice > 0 GROUP BY 1), " +
        "cnt2 AS (SELECT digit, n FROM cnt WHERE digit IS NOT NULL), " +
        "spine AS (SELECT * FROM (VALUES (1, CAST(0.30103 AS DOUBLE)), (2, CAST(0.176091 AS DOUBLE)), " +
        "(3, CAST(0.124939 AS DOUBLE)), (4, CAST(0.09691 AS DOUBLE)), (5, CAST(0.079181 AS DOUBLE)), " +
        "(6, CAST(0.066947 AS DOUBLE)), (7, CAST(0.057992 AS DOUBLE)), (8, CAST(0.051153 AS DOUBLE)), " +
        "(9, CAST(0.045757 AS DOUBLE))) AS s(digit, expected)), " +
        "tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM cnt2), " +
        "f AS (SELECT s.digit AS digit, COALESCE(n, 0) AS n, " +
        "round(CAST(COALESCE(n, 0) AS DOUBLE) / (CASE WHEN tot > 0 THEN CAST(tot AS DOUBLE) END), 6) AS share, " +
        "s.expected AS expected FROM spine s LEFT JOIN cnt2 ON s.digit = cnt2.digit CROSS JOIN tot) " +
        "SELECT digit, n, share, expected, round(share - expected, 6) AS dev FROM f"),
    // Heaps-curve replay: first-occurrence batches off md5 identity,
    // exact integer counts, one dim-scale cumulative window
    "heaps_curve" ->
      ("WITH pb AS (SELECT doc_id // 100 AS batch, count(*) AS docs FROM documents GROUP BY 1), " +
        "fs AS (SELECT md5(text) AS h, min(doc_id) AS fid FROM documents GROUP BY 1), " +
        "nb AS (SELECT fid // 100 AS batch, count(*) AS new_uniques FROM fs GROUP BY 1), " +
        "j AS (SELECT pb.batch AS batch, docs, COALESCE(new_uniques, 0) AS new_uniques " +
        "FROM pb LEFT JOIN nb ON pb.batch = nb.batch) " +
        "SELECT batch, docs, new_uniques, CAST(sum(new_uniques) OVER (ORDER BY batch " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_uniques FROM j"),
    // TRIX replay: the chained triple-EMA recursion with e1/e2 SUBSTITUTED
    // textually (a recursive CTE cannot reference fresh columns), alpha
    // spelled 0.2 and the complement computed as (1.0 - 0.2) — never a
    // 0.8 literal (1 - fl(0.2) != fl(0.8))
    "trix" -> {
      val E1 = "(0.2 * cs[j + 1] + (1.0 - 0.2) * e1)"
      val E2 = s"(0.2 * $E1 + (1.0 - 0.2) * e2)"
      val E3 = s"(0.2 * $E2 + (1.0 - 0.2) * e3)"
      s"WITH RECURSIVE t AS ($TradesSql), c AS (${candlesSql(3600000000L)}), " +
        "per AS (SELECT symbol, list(close ORDER BY bucket_ts) AS cs, " +
        "list(bucket_ts ORDER BY bucket_ts) AS tss FROM c GROUP BY 1), " +
        "r AS (SELECT symbol, 1 AS j, CAST(cs[1] AS DOUBLE) AS e1, " +
        "CAST(cs[1] AS DOUBLE) AS e2, CAST(cs[1] AS DOUBLE) AS e3, " +
        "CAST(NULL AS DOUBLE) AS e3p, cs, tss FROM per " +
        s"UNION ALL SELECT symbol, j + 1, $E1, $E2, $E3, e3, cs, tss FROM r WHERE j < len(cs)) " +
        "SELECT symbol, tss[j] AS bucket_ts, cs[j] AS close, round(e3, 6) AS e3, " +
        "CASE WHEN e3p IS NOT NULL AND e3p <> 0.0 THEN round(100.0 * (e3 / e3p - 1.0), 6) END AS trix FROM r"
    },
    "knn_pagerank" ->
      (KnnGraphSql +
        "nodes AS (SELECT src AS nv FROM g UNION SELECT dst FROM g), " +
        "outd AS (SELECT src, count(*) AS d FROM g GROUP BY 1), " +
        "nn AS (SELECT count(*) AS n FROM nodes), " +
        "p0 AS (SELECT nv, CAST(1000000000 // n AS BIGINT) AS pr FROM nodes CROSS JOIN nn), " +
        "s1 AS (SELECT g.dst AS nv, CAST(sum(p0.pr // o.d) AS BIGINT) AS s " +
        "FROM g JOIN p0 ON p0.nv = g.src JOIN outd o ON o.src = g.src GROUP BY 1), " +
        "p1 AS (SELECT nodes.nv, CAST((150000000 // nn.n) + (85 * COALESCE(s1.s, 0)) // 100 AS BIGINT) AS pr " +
        "FROM nodes CROSS JOIN nn LEFT JOIN s1 ON s1.nv = nodes.nv), " +
        "s2 AS (SELECT g.dst AS nv, CAST(sum(p1.pr // o.d) AS BIGINT) AS s " +
        "FROM g JOIN p1 ON p1.nv = g.src JOIN outd o ON o.src = g.src GROUP BY 1), " +
        "p2 AS (SELECT nodes.nv, CAST((150000000 // nn.n) + (85 * COALESCE(s2.s, 0)) // 100 AS BIGINT) AS pr " +
        "FROM nodes CROSS JOIN nn LEFT JOIN s2 ON s2.nv = nodes.nv), " +
        "s3 AS (SELECT g.dst AS nv, CAST(sum(p2.pr // o.d) AS BIGINT) AS s " +
        "FROM g JOIN p2 ON p2.nv = g.src JOIN outd o ON o.src = g.src GROUP BY 1), " +
        "p3 AS (SELECT nodes.nv, CAST((150000000 // nn.n) + (85 * COALESCE(s3.s, 0)) // 100 AS BIGINT) AS pr " +
        "FROM nodes CROSS JOIN nn LEFT JOIN s3 ON s3.nv = nodes.nv) " +
        "SELECT nv AS vec_id, pr FROM p3"),
    // LPA replay: same kNN graph CTEs, symmetrized distinct edges, then
    // the unrolled vote/argmax rounds (cnt DESC, label ASC == the
    // max(struct(cnt, -label)) tie-break)
    "knn_communities" ->
      (KnnGraphSql +
        "sym AS (SELECT DISTINCT src, dst FROM (" +
        "SELECT src, dst FROM g WHERE src <> dst " +
        "UNION ALL SELECT dst, src FROM g WHERE src <> dst)), " +
        "nodes AS (SELECT DISTINCT src AS nv FROM sym), " +
        "l0 AS (SELECT nv, nv AS label FROM nodes), " +
        lpaRoundsSql(5) +
        " SELECT nv AS vec_id, label FROM l5"),
    // triangle replay: same canonical undirected set, same (deg, id)
    // orientation, wedges at the oriented source closed by an equi-join
    // semi against the canonical edges; coefficients 2T/(d(d-1))
    "knn_triangles" ->
      (KnnGraphSql +
        "und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM g WHERE src <> dst), " +
        "dg AS (SELECT x, count(*) AS deg FROM (" +
        "SELECT u AS x FROM und UNION ALL SELECT v AS x FROM und) GROUP BY 1), " +
        "orient AS (SELECT CASE WHEN dv.deg < du.deg THEN und.v ELSE und.u END AS a, " +
        "CASE WHEN dv.deg < du.deg THEN und.u ELSE und.v END AS b " +
        "FROM und JOIN dg du ON und.u = du.x JOIN dg dv ON und.v = dv.x), " +
        "tri AS (SELECT w1.a, w1.b AS u, w2.b AS v FROM orient w1 " +
        "JOIN orient w2 ON w1.a = w2.a AND w1.b < w2.b " +
        "WHERE EXISTS (SELECT 1 FROM und WHERE und.u = w1.b AND und.v = w2.b)), " +
        "pn AS (SELECT x, count(*) AS t FROM (" +
        "SELECT a AS x FROM tri UNION ALL SELECT u AS x FROM tri UNION ALL SELECT v AS x FROM tri) GROUP BY 1) " +
        "SELECT dg.x AS vec_id, dg.deg AS degree, CAST(COALESCE(pn.t, 0) AS BIGINT) AS triangles, " +
        "round(2.0 * CAST(COALESCE(pn.t, 0) AS DOUBLE) / " +
        "(CASE WHEN dg.deg > 1 THEN CAST(dg.deg * (dg.deg - 1) AS DOUBLE) END), 6) AS clust_coeff " +
        "FROM dg LEFT JOIN pn ON dg.x = pn.x"),
    // outlier replay: the same seeded-centroid assignment argmax keeps the
    // rounded centroid cosine; per-cell moments in exact DECIMAL sums, z in
    // identical double op order, single-member cells null via CASE guards
    "embedding_outliers" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS cvec " +
        "FROM e ORDER BY vec_id LIMIT 16), " +
        "a AS (SELECT vec_id, CAST(cid AS BIGINT) AS cid, c AS ccos FROM (" +
        "SELECT e.vec_id, c.cid, round(list_cosine_similarity(e.v, c.cvec), 6) AS c, " +
        "row_number() OVER (PARTITION BY e.vec_id " +
        "ORDER BY round(list_cosine_similarity(e.v, c.cvec), 6) DESC, c.cid) AS arn " +
        "FROM e CROSS JOIN cents c) WHERE arn = 1), " +
        "st AS (SELECT cid, count(*) AS n, CAST(sum(CAST(ccos AS DECIMAL(9,6))) AS DOUBLE) AS s1, " +
        "CAST(sum(CAST(CAST(ccos AS DECIMAL(9,6)) * CAST(ccos AS DECIMAL(9,6)) AS DECIMAL(18,12))) AS DOUBLE) AS s2 " +
        "FROM a GROUP BY 1), " +
        "j AS (SELECT a.cid, a.vec_id, a.ccos, " +
        "round((a.ccos - s1 / n) / (CASE WHEN (CASE WHEN n > 1 THEN " +
        "(s2 - n * (s1 / n) * (s1 / n)) / (n - 1) END) > 0 THEN " +
        "sqrt((s2 - n * (s1 / n) * (s1 / n)) / (n - 1)) END), 6) AS zscore " +
        "FROM a JOIN st ON a.cid = st.cid) " +
        "SELECT cid, vec_id, ccos, zscore, " +
        "(zscore IS NOT NULL AND zscore <= -2.0) AS is_outlier FROM j"),
    // SQ8 replay: per-dim min/max, round-to-nearest byte codes, midpoint
    // decode, asymmetric cosine (raw query x reconstructed corpus) —
    // identical IEEE arithmetic on both sides
    "ann_sq8" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "x AS (SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM e), " +
        "mm AS (SELECT i, min(x) AS mn, max(x) AS mx FROM x GROUP BY 1), " +
        "r AS (SELECT x.vec_id, x.i, CASE WHEN mm.mx = mm.mn THEN mm.mn " +
        "ELSE mm.mn + LEAST(GREATEST(floor((x.x - mm.mn) / ((mm.mx - mm.mn) / 255.0) + 0.5), 0.0), 255.0) " +
        "* ((mm.mx - mm.mn) / 255.0) END AS rx " +
        "FROM x JOIN mm ON mm.i = x.i), " +
        "rv AS (SELECT vec_id, list(rx ORDER BY i) AS rvec FROM r GROUP BY 1), " +
        "q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10), " +
        "sc AS (SELECT q.qid, rv.vec_id AS id2, " +
        "round(list_cosine_similarity(q.qv, rv.rvec), 6) AS cos " +
        "FROM q JOIN rv ON rv.vec_id <> q.qid) " +
        "SELECT qid, id2, cos, rn FROM (" +
        "SELECT qid, id2, cos, CAST(row_number() OVER (" +
        "PARTITION BY qid ORDER BY cos DESC, id2) AS BIGINT) AS rn " +
        "FROM sc) WHERE rn <= 5"),
    // semanticDedup replay: the semantic_neardup pair CTEs + recursive
    // min-label reachability (the corpus_dedup CC mold) + the
    // farthest-from-centroid keeper (ccos asc, vec_id asc)
    "semantic_dedup" ->
      ("WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS cvec " +
        "FROM e ORDER BY vec_id LIMIT 16), " +
        "assigned AS (SELECT vec_id, v, cid FROM (" +
        "SELECT e.vec_id, e.v, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
        "ORDER BY round(list_cosine_similarity(e.v, c.cvec), 6) DESC, c.cid) AS arn " +
        "FROM e CROSS JOIN cents c) WHERE arn = 1), " +
        "pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2 " +
        "FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id " +
        "WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4), " +
        "edges AS (SELECT id1 AS a, id2 AS b FROM pairs UNION SELECT id2, id1 FROM pairs), " +
        "nodes AS (SELECT DISTINCT a AS vec_id FROM edges), " +
        "comp AS (SELECT vec_id, vec_id AS lbl FROM nodes " +
        "UNION SELECT g.a AS vec_id, c.lbl FROM edges g JOIN comp c ON g.b = c.vec_id), " +
        "labels AS (SELECT vec_id, min(lbl) AS cluster_id FROM comp GROUP BY 1), " +
        "sc AS (SELECT a.vec_id, round(list_cosine_similarity(a.v, c.cvec), 6) AS ccos " +
        "FROM assigned a JOIN cents c ON c.cid = a.cid) " +
        "SELECT l.vec_id, l.cluster_id, " +
        "(row_number() OVER (PARTITION BY l.cluster_id ORDER BY s.ccos, l.vec_id) = 1) AS keep " +
        "FROM labels l JOIN sc s ON s.vec_id = l.vec_id"),
    // incrementalSemantic replay: corpus-trained seed centroids, both
    // sides assigned, per-cell hash-order screen sample (<= maxCell),
    // batch x screen cosine, best-match argmax (cos desc, cvid asc)
    "semantic_incremental" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "ne AS (SELECT * FROM e WHERE vec_id % 10 = 0), " +
        "ce AS (SELECT * FROM e WHERE vec_id % 10 <> 0), " +
        "cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS cvec " +
        "FROM ce ORDER BY vec_id LIMIT 16), " +
        "cassigned AS (SELECT vec_id, v, cid FROM (" +
        "SELECT ce.vec_id, ce.v, c.cid, row_number() OVER (PARTITION BY ce.vec_id " +
        "ORDER BY round(list_cosine_similarity(ce.v, c.cvec), 6) DESC, c.cid) AS arn " +
        "FROM ce CROSS JOIN cents c) WHERE arn = 1), " +
        "nassigned AS (SELECT vec_id, v, cid FROM (" +
        "SELECT ne.vec_id, ne.v, c.cid, row_number() OVER (PARTITION BY ne.vec_id " +
        "ORDER BY round(list_cosine_similarity(ne.v, c.cvec), 6) DESC, c.cid) AS arn " +
        "FROM ne CROSS JOIN cents c) WHERE arn = 1), " +
        "screen AS (SELECT cid, vec_id, v FROM (" +
        "SELECT cid, vec_id, v, row_number() OVER (PARTITION BY cid " +
        "ORDER BY CAST('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,8) AS BIGINT), vec_id) AS hr " +
        "FROM cassigned) WHERE hr <= 64), " +
        "scored AS (SELECT n.vec_id, s.vec_id AS cvid, " +
        "round(list_cosine_similarity(n.v, s.v), 6) AS cos " +
        "FROM nassigned n JOIN screen s ON s.cid = n.cid), " +
        "rolled AS (SELECT vec_id, count(*) AS n_screened, max(cos) AS best_cos " +
        "FROM scored GROUP BY 1), " +
        "best AS (SELECT s.vec_id, min(s.cvid) AS best_match FROM scored s " +
        "JOIN rolled r ON r.vec_id = s.vec_id AND s.cos = r.best_cos GROUP BY 1) " +
        "SELECT d.vec_id, COALESCE(n_screened, 0) AS n_screened, best_match, best_cos, " +
        "(best_cos IS NULL OR best_cos < 0.4) AS novel " +
        "FROM (SELECT vec_id FROM embeddings WHERE vec_id % 10 = 0) d " +
        "LEFT JOIN rolled ON rolled.vec_id = d.vec_id " +
        "LEFT JOIN best ON best.vec_id = d.vec_id"),
    // semanticSample replay: the ann_ivf seed/assignment CTEs + the
    // portable md5-prefix hash pick per cell (h asc, vec_id asc)
    "semantic_sample" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS cvec " +
        "FROM e ORDER BY vec_id LIMIT 16), " +
        "assigned AS (SELECT vec_id, cid FROM (" +
        "SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
        "ORDER BY round(list_cosine_similarity(e.v, c.cvec), 6) DESC, c.cid) AS arn " +
        "FROM e CROSS JOIN cents c) WHERE arn = 1), " +
        "h AS (SELECT CAST(cid AS BIGINT) AS cid, vec_id, " +
        "CAST('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,8) AS BIGINT) AS h FROM assigned) " +
        "SELECT cid, vec_id, CAST(rn AS BIGINT) AS rn FROM (" +
        "SELECT cid, vec_id, row_number() OVER (PARTITION BY cid ORDER BY h, vec_id) AS rn " +
        "FROM h) WHERE rn <= 20"),
    "label_confusion" ->
      ("WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "cents AS (SELECT cid, list(xm ORDER BY pos) AS cvec FROM (" +
        "SELECT CAST(label AS INTEGER) AS cid, pos, " +
        "CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE) / count(*) AS xm FROM (" +
        "SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e) " +
        "GROUP BY 1, 2) GROUP BY cid), " +
        "assigned AS (SELECT vec_id, label, cid FROM (" +
        "SELECT e.vec_id, e.label, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
        "ORDER BY round(list_cosine_similarity(e.v, c.cvec), 6) DESC, c.cid) AS arn " +
        "FROM e CROSS JOIN cents c) WHERE arn = 1) " +
        "SELECT label, CAST(cid AS BIGINT) AS pred_label, count(*) AS n " +
        "FROM assigned GROUP BY 1, 2"),
    "ann_ivf_trained" -> annIvfTrainedOracleSql(k = 5, numCells = 16, nprobe = 4, iters = 2),
    "centroid_drift" -> centroidDriftOracleSql(numCells = 16),
    "pq_encode" -> pqEncodeOracleSql(m = 4, k = 16, dim = 64),
    "pq_search" -> pqSearchOracleSql(m = 4, k = 16, dim = 64, topK = 5),
    "ivfpq_encode" -> ivfPqEncodeOracleSql(m = 4, k = 16, dim = 64,
      numCells = 16, iters = 1),
    "ann_ivfpq" -> ivfPqSearchOracleSql(m = 4, k = 16, dim = 64,
      numCells = 16, iters = 1, nprobe = 4, topK = 5),
    "ann_ivfpq_rerank" -> ivfPqRerankOracleSql(m = 4, k = 16, dim = 64,
      numCells = 16, iters = 1, nprobe = 4, topK = 5, kFactor = 4),
    "ann_filtered" -> annIvfFilteredOracleSql(k = 10, numCells = 16,
      nprobe = 4, label = 7),
    "ann_filtered_pq" -> ivfPqFilteredOracleSql(m = 4, k = 16, dim = 64,
      numCells = 16, iters = 1, nprobe = 4, topK = 10, label = 7)
  )

  /** Shared DuckDB replay of Ivf.pqEncoded: per-subspace codebooks from
    * the k lowest vec_ids' slices (the Ivf seed contract), assignment =
    * argmax of round(cosine, 6) with lowest-cid tiebreak per subspace,
    * recon (in CTE `r`) = the concatenated chosen centroids.
    */
  private def pqCtes(m: Int, k: Int, dim: Int): String = {
    val sub = dim / m
    val cbs = (0 until m).map(s =>
      s"cb$s AS (SELECT cid, v[${s * sub + 1}:${(s + 1) * sub}] AS cvec FROM seeds)")
      .mkString(", ")
    val assigns = (0 until m).map(s =>
      s"a$s AS (SELECT vec_id, cid AS code$s FROM (" +
        "SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
        s"ORDER BY round(list_cosine_similarity(e.v[${s * sub + 1}:${(s + 1) * sub}], c.cvec), 6) DESC, c.cid) AS rn " +
        s"FROM e CROSS JOIN cb$s c) WHERE rn = 1)").mkString(", ")
    val joins = (0 until m).map(s => s"JOIN a$s ON a$s.vec_id = e.vec_id").mkString(" ") +
      " " + (0 until m).map(s => s"JOIN cb$s c$s ON c$s.cid = a$s.code$s").mkString(" ")
    val recon = (0 until m).map(s => s"c$s.cvec").mkString(" || ")
    "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "seeds AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v " +
      s"FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $k)), " +
      cbs + ", " + assigns + ", " +
      "r AS (SELECT e.vec_id, e.v, " +
      (0 until m).map(s => s"CAST(a$s.code$s AS BIGINT) AS code$s").mkString(", ") +
      s", ($recon) AS recon FROM e $joins)"
  }

  private def pqEncodeOracleSql(m: Int, k: Int, dim: Int): String =
    s"WITH ${pqCtes(m, k, dim)} " +
      "SELECT vec_id, " + (0 until m).map(s => s"code$s").mkString(", ") +
      ", round(list_cosine_similarity(v, recon), 6) AS recon_cos FROM r"

  private def pqSearchOracleSql(m: Int, k: Int, dim: Int, topK: Int): String =
    s"WITH ${pqCtes(m, k, dim)}, " +
      "q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10), " +
      "cand AS (SELECT q.qid, r.vec_id AS id2, " +
      "round(list_cosine_similarity(q.qv, r.recon), 6) AS cos " +
      "FROM r CROSS JOIN q WHERE r.vec_id <> q.qid) " +
      "SELECT qid, id2, cos, CAST(rn AS BIGINT) AS rn FROM (" +
      "SELECT qid, id2, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id2) AS rn " +
      s"FROM cand) WHERE rn <= $topK"

  /** Shared DuckDB replay of Ivf.ivfPqEncodedFrame: `iters` Lloyd rounds
    * train the coarse quantizer (annIvfTrained's assign/mean CTEs),
    * residuals v − centroid[cid] seed per-subspace codebooks from the k
    * lowest vec_ids' residuals, ONE Lloyd round refines each codebook on
    * the residual slices (decimal-exact means, present codes compacted —
    * the localizePos contract), and recon (CTE `r`) = coarse centroid +
    * concatenated chosen residual centroids. Subspace assignment guards
    * NaN cosines (a zero residual carries no direction) as
    * strictly-worse-than-any-real — mirroring NearestCell, where a NaN
    * comparison is false and the candidate never wins.
    */
  private def ivfPqCtes(m: Int, k: Int, dim: Int, numCells: Int,
                        iters: Int): String = {
    val sub = dim / m
    def assignCte(name: String, cents: String): String =
      s"$name AS (SELECT vec_id, v, cid FROM (" +
        "SELECT e.vec_id, e.v, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
        "ORDER BY round(list_cosine_similarity(e.v, c.cvec), 6) DESC, c.cid) AS arn " +
        s"FROM e CROSS JOIN $cents c) WHERE arn = 1)"
    def meanCte(name: String, from: String): String =
      s"$name AS (SELECT CAST(row_number() OVER (ORDER BY cid) - 1 AS INTEGER) AS cid, cvec FROM (" +
        "SELECT cid, list(xm ORDER BY pos) AS cvec FROM (" +
        "SELECT cid, pos, CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE) / count(*) AS xm FROM (" +
        s"SELECT cid, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM $from) " +
        "GROUP BY cid, pos) GROUP BY cid) x)"
    // NaN-guarded per-subspace code pick against codebook `book`
    def codePick(name: String, book: String, outCol: String, s: Int): String = {
      val cs = s"round(list_cosine_similarity(r0.res[${s * sub + 1}:${(s + 1) * sub}], c.cvec), 6)"
      s"$name AS (SELECT vec_id, scid AS $outCol FROM (" +
        "SELECT r0.vec_id, c.scid, row_number() OVER (PARTITION BY r0.vec_id " +
        s"ORDER BY (CASE WHEN isnan($cs) THEN -2 ELSE $cs END) DESC, c.scid) AS rn " +
        s"FROM resid r0 CROSS JOIN $book c) WHERE rn = 1)"
    }
    val rounds = (1 to iters).flatMap { i =>
      Seq(assignCte(s"ta${i - 1}", s"cents${i - 1}"), meanCte(s"cents$i", s"ta${i - 1}"))
    }.mkString(", ")
    val fin = s"cents$iters"
    // seed books → seed-code pick → one decimal-exact Lloyd round on the
    // residual slices (mirrors ivfPqEncodedFrame's bookIters = 1 default)
    val seedBooks = (0 until m).map(s =>
      s"sb$s AS (SELECT scid, res[${s * sub + 1}:${(s + 1) * sub}] AS cvec FROM seeds)")
      .mkString(", ")
    val seedPicks = (0 until m).map(s => codePick(s"pb$s", s"sb$s", "cid", s))
      .mkString(", ")
    val cbs = (0 until m).map { s =>
      s"cb$s AS (SELECT CAST(row_number() OVER (ORDER BY cid) - 1 AS INTEGER) AS scid, cvec FROM (" +
        "SELECT cid, list(xm ORDER BY pos) AS cvec FROM (" +
        "SELECT cid, pos, CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE) / count(*) AS xm FROM (" +
        s"SELECT pb$s.cid, unnest(r1.res[${s * sub + 1}:${(s + 1) * sub}]) AS x, " +
        s"generate_subscripts(r1.res[${s * sub + 1}:${(s + 1) * sub}], 1) AS pos " +
        s"FROM pb$s JOIN resid r1 ON r1.vec_id = pb$s.vec_id) " +
        "GROUP BY cid, pos) GROUP BY cid) x)"
    }.mkString(", ")
    val assigns = (0 until m).map(s => codePick(s"pa$s", s"cb$s", s"code$s", s))
      .mkString(", ")
    val joins = (0 until m).map(s => s"JOIN pa$s ON pa$s.vec_id = resid.vec_id").mkString(" ") +
      " " + (0 until m).map(s => s"JOIN cb$s c$s ON c$s.scid = pa$s.code$s").mkString(" ")
    val rr = (0 until m).map(s => s"c$s.cvec").mkString(" || ")
    "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "cents0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS cvec " +
      s"FROM e ORDER BY vec_id LIMIT $numCells), " +
      rounds + ", " +
      assignCte("af", fin) + ", " +
      s"resid AS (SELECT a.vec_id, a.v, a.cid, " +
      s"list_transform(generate_series(1, $dim), i -> a.v[i] - c.cvec[i]) AS res " +
      s"FROM af a JOIN $fin c ON c.cid = a.cid), " +
      "seeds AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS scid, res " +
      s"FROM (SELECT vec_id, res FROM resid ORDER BY vec_id LIMIT $k)), " +
      seedBooks + ", " + seedPicks + ", " + cbs + ", " + assigns + ", " +
      "r AS (SELECT resid.vec_id, resid.v, resid.cid, " +
      (0 until m).map(s => s"CAST(pa$s.code$s AS BIGINT) AS code$s").mkString(", ") +
      s", list_transform(generate_series(1, $dim), i -> cc.cvec[i] + ($rr)[i]) AS recon " +
      s"FROM resid $joins JOIN $fin cc ON cc.cid = resid.cid)"
  }

  private def ivfPqEncodeOracleSql(m: Int, k: Int, dim: Int, numCells: Int,
                                   iters: Int): String =
    s"WITH ${ivfPqCtes(m, k, dim, numCells, iters)} " +
      "SELECT vec_id, CAST(cid AS BIGINT) AS cid, " +
      (0 until m).map(s => s"code$s").mkString(", ") +
      ", round(list_cosine_similarity(v, recon), 6) AS recon_cos FROM r"

  private def ivfPqSearchOracleSql(m: Int, k: Int, dim: Int, numCells: Int,
                                   iters: Int, nprobe: Int, topK: Int): String =
    s"WITH ${ivfPqCtes(m, k, dim, numCells, iters)}, " +
      "q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10), " +
      "probes AS (SELECT qid, qv, cid FROM (" +
      "SELECT q.qid, q.qv, c.cid, row_number() OVER (PARTITION BY q.qid " +
      "ORDER BY round(list_cosine_similarity(q.qv, c.cvec), 6) DESC, c.cid) AS prn " +
      s"FROM q CROSS JOIN cents$iters c) WHERE prn <= $nprobe), " +
      "cand AS (SELECT p.qid, r.vec_id AS id2, " +
      "round(list_cosine_similarity(p.qv, r.recon), 6) AS cos " +
      "FROM r JOIN probes p ON r.cid = p.cid WHERE r.vec_id <> p.qid) " +
      "SELECT qid, id2, cos, CAST(rn AS BIGINT) AS rn FROM (" +
      "SELECT qid, id2, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id2) AS rn " +
      s"FROM cand) WHERE rn <= $topK"

  /** DuckDB replay of Ivf.ivfPqSearchRerank: the ADC candidate CTEs from
    * [[ivfPqSearchOracleSql]] cut at k′ = kFactor·topK, then each
    * candidate's RAW vector re-joins for the exact rounded cosine and the
    * final top-k row_number — the same order (cos DESC, id2) both stages.
    */
  private def ivfPqRerankOracleSql(m: Int, k: Int, dim: Int, numCells: Int,
                                   iters: Int, nprobe: Int, topK: Int,
                                   kFactor: Int): String =
    s"WITH ${ivfPqCtes(m, k, dim, numCells, iters)}, " +
      "q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10), " +
      "probes AS (SELECT qid, qv, cid FROM (" +
      "SELECT q.qid, q.qv, c.cid, row_number() OVER (PARTITION BY q.qid " +
      "ORDER BY round(list_cosine_similarity(q.qv, c.cvec), 6) DESC, c.cid) AS prn " +
      s"FROM q CROSS JOIN cents$iters c) WHERE prn <= $nprobe), " +
      "cand AS (SELECT p.qid, r.vec_id AS id2, " +
      "round(list_cosine_similarity(p.qv, r.recon), 6) AS cos " +
      "FROM r JOIN probes p ON r.cid = p.cid WHERE r.vec_id <> p.qid), " +
      "adc AS (SELECT qid, id2 FROM (" +
      "SELECT qid, id2, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id2) AS rn " +
      s"FROM cand) WHERE rn <= ${topK * kFactor}), " +
      "rer AS (SELECT a.qid, a.id2, " +
      "round(list_cosine_similarity(q.qv, e2.v), 6) AS cos " +
      "FROM adc a JOIN q ON q.qid = a.qid JOIN e e2 ON e2.vec_id = a.id2) " +
      "SELECT qid, id2, cos, CAST(rn AS BIGINT) AS rn FROM (" +
      "SELECT qid, id2, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id2) AS rn " +
      s"FROM rer) WHERE rn <= $topK"

  /** DuckDB replay of Ivf.searchTopKFiltered (iters=0 seed quantizer):
    * survivors filtered BEFORE cell assignment, probed-cell candidates,
    * then the rescue pass — queries whose probed cells hold < k survivors
    * re-score exactly against ALL survivors (their probe candidates
    * discarded, not mixed), replaying the k-guarantee contract.
    */
  private def annIvfFilteredOracleSql(k: Int, numCells: Int, nprobe: Int,
                                      label: Int): String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings), " +
      "cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS cvec " +
      s"FROM e ORDER BY vec_id LIMIT $numCells), " +
      s"s AS (SELECT vec_id, v FROM e WHERE label = $label), " +
      "assigned AS (SELECT vec_id, v, cid FROM (" +
      "SELECT s.vec_id, s.v, c.cid, row_number() OVER (PARTITION BY s.vec_id " +
      "ORDER BY round(list_cosine_similarity(s.v, c.cvec), 6) DESC, c.cid) AS arn " +
      "FROM s CROSS JOIN cents c) WHERE arn = 1), " +
      "q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10), " +
      "probes AS (SELECT qid, qv, cid FROM (" +
      "SELECT q.qid, q.qv, c.cid, row_number() OVER (PARTITION BY q.qid " +
      "ORDER BY round(list_cosine_similarity(q.qv, c.cvec), 6) DESC, c.cid) AS prn " +
      s"FROM q CROSS JOIN cents c) WHERE prn <= $nprobe), " +
      "cand AS (SELECT p.qid, a.vec_id AS id2, " +
      "round(list_cosine_similarity(p.qv, a.v), 6) AS cos " +
      "FROM assigned a JOIN probes p ON a.cid = p.cid WHERE a.vec_id <> p.qid), " +
      "cnt AS (SELECT qid, count(*) AS n FROM cand GROUP BY 1), " +
      "under AS (SELECT q.qid, q.qv FROM q LEFT JOIN cnt ON cnt.qid = q.qid " +
      s"WHERE coalesce(cnt.n, 0) < $k), " +
      "resc AS (SELECT u.qid, s.vec_id AS id2, " +
      "round(list_cosine_similarity(u.qv, s.v), 6) AS cos " +
      "FROM s JOIN under u ON s.vec_id <> u.qid), " +
      "fin AS (SELECT * FROM cand WHERE qid NOT IN (SELECT qid FROM under) " +
      "UNION ALL SELECT * FROM resc) " +
      "SELECT qid, id2, cos, CAST(rn AS BIGINT) AS rn FROM (" +
      "SELECT qid, id2, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id2) AS rn " +
      s"FROM fin) WHERE rn <= $k"

  /** DuckDB replay of Ivf.ivfPqSearchFilteredWith: the [[ivfPqCtes]]
    * encode chain, index rows filtered by the metadata join, probe +
    * rescue both scoring ADC reconstructions — the compressed-index
    * sibling of [[annIvfFilteredOracleSql]].
    */
  private def ivfPqFilteredOracleSql(m: Int, k: Int, dim: Int, numCells: Int,
                                     iters: Int, nprobe: Int, topK: Int,
                                     label: Int): String =
    s"WITH ${ivfPqCtes(m, k, dim, numCells, iters)}, " +
      "lbl AS (SELECT vec_id, label FROM embeddings), " +
      "rs AS (SELECT r.vec_id, r.cid, r.recon FROM r " +
      s"JOIN lbl ON lbl.vec_id = r.vec_id WHERE lbl.label = $label), " +
      "q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10), " +
      "probes AS (SELECT qid, qv, cid FROM (" +
      "SELECT q.qid, q.qv, c.cid, row_number() OVER (PARTITION BY q.qid " +
      "ORDER BY round(list_cosine_similarity(q.qv, c.cvec), 6) DESC, c.cid) AS prn " +
      s"FROM q CROSS JOIN cents$iters c) WHERE prn <= $nprobe), " +
      "cand AS (SELECT p.qid, rs.vec_id AS id2, " +
      "round(list_cosine_similarity(p.qv, rs.recon), 6) AS cos " +
      "FROM rs JOIN probes p ON rs.cid = p.cid WHERE rs.vec_id <> p.qid), " +
      "cnt AS (SELECT qid, count(*) AS n FROM cand GROUP BY 1), " +
      "under AS (SELECT q.qid, q.qv FROM q LEFT JOIN cnt ON cnt.qid = q.qid " +
      s"WHERE coalesce(cnt.n, 0) < $topK), " +
      "resc AS (SELECT u.qid, rs.vec_id AS id2, " +
      "round(list_cosine_similarity(u.qv, rs.recon), 6) AS cos " +
      "FROM rs JOIN under u ON rs.vec_id <> u.qid), " +
      "fin AS (SELECT * FROM cand WHERE qid NOT IN (SELECT qid FROM under) " +
      "UNION ALL SELECT * FROM resc) " +
      "SELECT qid, id2, cos, CAST(rn AS BIGINT) AS rn FROM (" +
      "SELECT qid, id2, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id2) AS rn " +
      s"FROM fin) WHERE rn <= $topK"

  /** DuckDB replay of Ivf.searchTopK with `iters` Lloyd rounds: each round
    * is argmax-assignment (rounded cosine, cid tiebreak) followed by
    * decimal-exact per-component centroid means, with cids re-ranked the
    * way Ivf.localize compacts them. Trained k-means, bit-replayed in SQL.
    */
  /** DuckDB replay of Ivf.centroidDrift: prior = even vec_ids, one Lloyd
    * round over the prior (train iters=1), ONE refinement of the full
    * corpus from those centroids (retrain), then per-cell centroid cosine
    * + prior-assignment churn — the same assign/mean CTEs the trained-IVF
    * oracle uses, parameterized by source.
    */
  private def centroidDriftOracleSql(numCells: Int): String = {
    def assignCte(name: String, src: String, cents: String): String =
      s"$name AS (SELECT vec_id, v, cid FROM (" +
        s"SELECT $src.vec_id, $src.v, c.cid, row_number() OVER (PARTITION BY $src.vec_id " +
        s"ORDER BY round(list_cosine_similarity($src.v, c.cvec), 6) DESC, c.cid) AS arn " +
        s"FROM $src CROSS JOIN $cents c) WHERE arn = 1)"
    def meanCte(name: String, from: String): String =
      s"$name AS (SELECT CAST(row_number() OVER (ORDER BY cid) - 1 AS INTEGER) AS cid, cvec FROM (" +
        "SELECT cid, list(xm ORDER BY pos) AS cvec FROM (" +
        "SELECT cid, pos, CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE) / count(*) AS xm FROM (" +
        s"SELECT cid, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM $from) " +
        "GROUP BY cid, pos) GROUP BY cid) x)"
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "ep AS (SELECT vec_id, v FROM e WHERE vec_id % 2 = 0), " +
      "cents0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS cvec " +
      s"FROM ep ORDER BY vec_id LIMIT $numCells), " +
      assignCte("a0", "ep", "cents0") + ", " +
      meanCte("centsOld", "a0") + ", " +
      assignCte("af", "e", "centsOld") + ", " +
      meanCte("centsNew", "af") + ", " +
      assignCte("aOld", "ep", "centsOld") + ", " +
      assignCte("aNew", "ep", "centsNew") + ", " +
      "mv AS (SELECT aOld.cid AS cid, CASE WHEN aOld.cid <> aNew.cid THEN 1 ELSE 0 END AS moved " +
      "FROM aOld JOIN aNew ON aOld.vec_id = aNew.vec_id), " +
      "per AS (SELECT cid, count(*) AS n_members, CAST(sum(moved) AS BIGINT) AS n_moved FROM mv GROUP BY 1), " +
      "dr AS (SELECT o.cid, round(list_cosine_similarity(o.cvec, n.cvec), 6) AS drift_cos " +
      "FROM centsOld o JOIN centsNew n ON o.cid = n.cid) " +
      "SELECT CAST(dr.cid AS BIGINT) AS cid, drift_cos, " +
      "CAST(COALESCE(per.n_members, 0) AS BIGINT) AS n_members, " +
      "CAST(COALESCE(per.n_moved, 0) AS BIGINT) AS n_moved, " +
      "round(CAST(COALESCE(per.n_moved, 0) AS DOUBLE) / " +
      "(CASE WHEN COALESCE(per.n_members, 0) > 0 THEN CAST(per.n_members AS DOUBLE) END), 6) AS churn_rate " +
      "FROM dr LEFT JOIN per ON dr.cid = per.cid"
  }

  private def annIvfTrainedOracleSql(k: Int, numCells: Int, nprobe: Int,
                                     iters: Int): String = {
    def assignCte(name: String, cents: String): String =
      s"$name AS (SELECT vec_id, v, cid FROM (" +
        "SELECT e.vec_id, e.v, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
        "ORDER BY round(list_cosine_similarity(e.v, c.cvec), 6) DESC, c.cid) AS arn " +
        s"FROM e CROSS JOIN $cents c) WHERE arn = 1)"
    def meanCte(name: String, from: String): String =
      s"$name AS (SELECT CAST(row_number() OVER (ORDER BY cid) - 1 AS INTEGER) AS cid, cvec FROM (" +
        "SELECT cid, list(xm ORDER BY pos) AS cvec FROM (" +
        "SELECT cid, pos, CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE) / count(*) AS xm FROM (" +
        s"SELECT cid, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM $from) " +
        "GROUP BY cid, pos) GROUP BY cid) x)"
    val rounds = (1 to iters).flatMap { i =>
      Seq(assignCte(s"a${i - 1}", s"cents${i - 1}"), meanCte(s"cents$i", s"a${i - 1}"))
    }.mkString(", ")
    val fin = s"cents$iters"
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "cents0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS cvec " +
      s"FROM e ORDER BY vec_id LIMIT $numCells), " +
      rounds + ", " +
      assignCte("af", fin) + ", " +
      "q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10), " +
      "probes AS (SELECT qid, qv, cid FROM (" +
      "SELECT q.qid, q.qv, c.cid, row_number() OVER (PARTITION BY q.qid " +
      "ORDER BY round(list_cosine_similarity(q.qv, c.cvec), 6) DESC, c.cid) AS prn " +
      s"FROM q CROSS JOIN $fin c) WHERE prn <= $nprobe), " +
      "cand AS (SELECT p.qid, a.vec_id AS id2, " +
      "round(list_cosine_similarity(p.qv, a.v), 6) AS cos " +
      "FROM af a JOIN probes p ON a.cid = p.cid WHERE a.vec_id <> p.qid) " +
      "SELECT qid, id2, cos, CAST(rn AS BIGINT) AS rn FROM (" +
      "SELECT qid, id2, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id2) AS rn " +
      s"FROM cand) WHERE rn <= $k"
  }

  /** DuckDB replay of Similarity.lshTopK: hyperplane sign buckets from the
    * same seeded plane constants, hamming≤1 multiprobe, rounded-cosine
    * top-k. Plane constants are inlined at full double precision (shortest
    * round-trip repr), so both engines bucket identically.
    */
  private def annLshOracleSql(k: Int, numPlanes: Int): String = {
    val ps = graft.ops.Similarity.planes(numPlanes, 64)
    val bucket = (0 until numPlanes).map { i =>
      val plane = ps(i).mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product(v, $plane) > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      s"eb AS (SELECT vec_id, v, $bucket AS bucket FROM e), " +
      "q AS (SELECT vec_id AS qid, v AS qv, bucket AS qb FROM eb WHERE vec_id < 10), " +
      "cand AS (SELECT q.qid, e2.vec_id AS id2, " +
      "round(list_cosine_similarity(q.qv, e2.v), 6) AS cos " +
      "FROM eb e2 CROSS JOIN q " +
      "WHERE bit_count(xor(CAST(e2.bucket AS BIGINT), CAST(q.qb AS BIGINT))) <= 1 " +
      "AND e2.vec_id <> q.qid) " +
      "SELECT qid, id2, cos, CAST(rn AS BIGINT) AS rn FROM (" +
      "SELECT qid, id2, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id2) AS rn " +
      s"FROM cand) WHERE rn <= $k"
  }

  /** DuckDB replay of Similarity.lshTopKMulti: per-table sign buckets from
    * the same per-table seeded planes; candidate = hamming≤1 in ANY table.
    */
  private def annLshMultiOracleSql(k: Int, numPlanes: Int, numTables: Int): String = {
    def bucketSql(table: Int): String = {
      val ps = graft.ops.Similarity.planes(numPlanes, 64, table)
      (0 until numPlanes).map { i =>
        val plane = ps(i).mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(v, $plane) > 0 THEN ${1 << i} ELSE 0 END)"
      }.mkString(" + ")
    }
    val bucketCols = (0 until numTables).map(t => s"${bucketSql(t)} AS b$t").mkString(", ")
    val anyTable = (0 until numTables)
      .map(t => s"bit_count(xor(CAST(e2.b$t AS BIGINT), CAST(q.b$t AS BIGINT))) <= 1")
      .mkString(" OR ")
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      s"eb AS (SELECT vec_id, v, $bucketCols FROM e), " +
      "q AS (SELECT * FROM eb WHERE vec_id < 10), " +
      "cand AS (SELECT q.vec_id AS qid, e2.vec_id AS id2, " +
      "round(list_cosine_similarity(q.v, e2.v), 6) AS cos " +
      s"FROM eb e2 CROSS JOIN q WHERE e2.vec_id <> q.vec_id AND ($anyTable)) " +
      "SELECT qid, id2, cos, CAST(rn AS BIGINT) AS rn FROM (" +
      "SELECT qid, id2, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id2) AS rn " +
      s"FROM cand) WHERE rn <= $k"
  }

  /** DuckDB replay of Ivf.searchTopK at iters=0: centroids are the
    * numCells lowest vec_ids, assignment/probing/top-k all order by
    * round(cosine, 6) with cell-id (resp. neighbor-id) tiebreaks —
    * exactly the native NearestCell + bounded top-k semantics.
    */
  private def annIvfOracleSql(k: Int, numCells: Int, nprobe: Int): String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS cvec " +
      s"FROM e ORDER BY vec_id LIMIT $numCells), " +
      "assigned AS (SELECT vec_id, v, cid FROM (" +
      "SELECT e.vec_id, e.v, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
      "ORDER BY round(list_cosine_similarity(e.v, c.cvec), 6) DESC, c.cid) AS arn " +
      "FROM e CROSS JOIN cents c) WHERE arn = 1), " +
      "q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10), " +
      "probes AS (SELECT qid, qv, cid FROM (" +
      "SELECT q.qid, q.qv, c.cid, row_number() OVER (PARTITION BY q.qid " +
      "ORDER BY round(list_cosine_similarity(q.qv, c.cvec), 6) DESC, c.cid) AS prn " +
      s"FROM q CROSS JOIN cents c) WHERE prn <= $nprobe), " +
      "cand AS (SELECT p.qid, a.vec_id AS id2, " +
      "round(list_cosine_similarity(p.qv, a.v), 6) AS cos " +
      "FROM assigned a JOIN probes p ON a.cid = p.cid WHERE a.vec_id <> p.qid) " +
      "SELECT qid, id2, cos, CAST(rn AS BIGINT) AS rn FROM (" +
      "SELECT qid, id2, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id2) AS rn " +
      s"FROM cand) WHERE rn <= $k"

  /** Column-by-column exact profile of lineitem (mirrors Profile.profile:
    * decimal-exact means, exact distinct counts, NULL fills for
    * non-applicable stats).
    */
  private def profileOracleSql: String = {
    val cols = Seq(
      ("l_orderkey", "bigint", "num"), ("l_partkey", "bigint", "num"),
      ("l_suppkey", "bigint", "num"), ("l_linenumber", "int", "num"),
      ("l_quantity", "double", "num"), ("l_extendedprice", "double", "num"),
      ("l_discount", "double", "num"), ("l_tax", "double", "num"),
      ("l_returnflag", "string", "str"), ("l_linestatus", "string", "str"),
      // timestamp flavors collapse to "timestamp" (Profile mirrors this):
      // the flavor is an environment fact that flips with writer settings
      ("l_shipdate", "timestamp", "other"))
    cols.map { case (n, t, kind) =>
      val num = kind == "num"
      val str = kind == "str"
      val minN = if (num) s"CAST(min($n) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val maxN = if (num) s"CAST(max($n) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val mean = if (num) s"CAST(sum(CAST($n AS DECIMAL(27,6))) AS DOUBLE) / count($n)"
                 else "CAST(NULL AS DOUBLE)"
      val lmin = if (str) s"CAST(min(length($n)) AS BIGINT)" else "CAST(NULL AS BIGINT)"
      val lmax = if (str) s"CAST(max(length($n)) AS BIGINT)" else "CAST(NULL AS BIGINT)"
      s"""SELECT '$n' AS "column", '$t' AS dtype, count(*) AS n_rows, """ +
        s"CAST(sum(CASE WHEN $n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, " +
        s"count(DISTINCT $n) AS n_distinct, $minN AS min_num, $maxN AS max_num, " +
        s"$mean AS mean_num, $lmin AS min_len, $lmax AS max_len FROM lineitem"
    }.mkString(" UNION ALL ")
  }

  /** HLL-profile contract oracle: exact counts + a literal TRUE per
    * column — hash-matches iff every sketch honors its 5% bound.
    */
  private def profileApproxOracleSql: String =
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate").map { n =>
      s"""SELECT '$n' AS "column", count(*) AS n_rows, """ +
        s"CAST(sum(CASE WHEN $n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, " +
        s"count(DISTINCT $n) AS n_exact, TRUE AS approx_ok FROM lineitem"
    }.mkString(" UNION ALL ")

  private def markerSql(quotedList: String): String =
    s"CAST(len(list_filter(string_split_regex(text, '\\s+'), w -> w IN ('$quotedList'))) AS BIGINT)"

  /** Stopword-profile language classifier replay — shared by lang_id (the
    * per-doc report) and lang_confusion (the evaluation matrix).
    */
  private lazy val langIdSql: String =
    "WITH s AS (SELECT doc_id, lang, " +
      s"${markerSql("the','and','of','to")} AS s_en, " +
      s"${markerSql("der','die','und','ist")} AS s_de, " +
      s"${markerSql("le','la','et','les")} AS s_fr, " +
      s"${markerSql("el','los','que','una")} AS s_es, " +
      "CAST(length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS BIGINT) AS s_zh " +
      "FROM documents) " +
      "SELECT doc_id, lang, CASE " +
      "WHEN s_en >= greatest(s_de, s_fr, s_es, s_zh) THEN 'en' " +
      "WHEN s_de >= greatest(s_fr, s_es, s_zh) THEN 'de' " +
      "WHEN s_fr >= greatest(s_es, s_zh) THEN 'fr' " +
      "WHEN s_es >= s_zh THEN 'es' ELSE 'zh' END AS pred_lang FROM s"

  private val RevenueSql =
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"

  // ---- dedup-family oracle SQL (DuckDB replay of the md5-portable
  //      minhash/simhash pipelines; permutation/band constants are inlined
  //      from the exact same Dedup.perms arrays the Spark side uses) -------

  /** list_value(sig_0, ..., sig_{numPerm-1}): the minhash signature. */
  private def minhashSigSql(numPerm: Int): String = {
    val (a, b) = graft.ops.Dedup.perms(numPerm)
    (0 until numPerm).map(i =>
      s"list_min(list_transform(hashes, h -> (${a(i)}*h + ${b(i)}) % ${graft.ops.Dedup.MinhashP}))")
      .mkString("list_value(", ", ", ")")
  }

  /** CTE chain ending in `mh(id1, id2, est_jaccard)`: the minhash-LSH
    * candidate pairs, mirroring Dedup.minhashLsh (incl. the
    * oversized-bucket hash-sampled multi-representative + two-stride ring
    * pairing).
    */
  private def minhashPairsCtes(numPerm: Int = 128, bands: Int = 16,
                               maxBucket: Int = 100, numReps: Int = 8,
                               where: String = ""): String = {
    val rows = numPerm / bands
    s"dw AS (SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents$where), " +
      "dh AS (SELECT doc_id, list_transform(" +
      "list_transform(generate_series(1, len(ws)-2), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])), " +
      "s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)) AS hashes FROM dw WHERE len(ws) >= 3), " +
      s"sigs AS (SELECT doc_id, ${minhashSigSql(numPerm)} AS sig FROM dh), " +
      "banded AS (SELECT doc_id, sig, band, " +
      s"CAST('0x' || substr(md5(array_to_string(sig[band*$rows+1 : band*$rows+$rows], ',')), 1, 15) AS BIGINT) AS bsig " +
      s"FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, ${bands - 1})) AS band) bx), " +
      "stats AS (SELECT band, bsig, count(*) AS bucket_n, min(doc_id) AS rep FROM banded GROUP BY 1, 2), " +
      "tagged AS (SELECT b.doc_id, b.sig, b.band, b.bsig, s.bucket_n, s.rep " +
      "FROM banded b JOIN stats s ON b.band = s.band AND b.bsig = s.bsig), " +
      s"small AS (SELECT * FROM tagged WHERE bucket_n <= $maxBucket), " +
      "smallpairs AS (SELECT x.doc_id AS id1, y.doc_id AS id2, x.sig AS sig1, y.sig AS sig2 " +
      "FROM small x JOIN small y ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id), " +
      "hrank AS (SELECT band, bsig, doc_id, row_number() OVER (PARTITION BY band, bsig " +
      "ORDER BY CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8) AS BIGINT), doc_id) AS hr " +
      s"FROM tagged WHERE bucket_n > $maxBucket), " +
      s"reps AS (SELECT band, bsig, doc_id AS rid FROM hrank WHERE hr <= $numReps), " +
      "bigpairs AS (SELECT least(t.doc_id, r.rid) AS id1, greatest(t.doc_id, r.rid) AS id2, " +
      "s1.sig AS sig1, s2.sig AS sig2 " +
      "FROM tagged t JOIN reps r ON r.band = t.band AND r.bsig = t.bsig " +
      "JOIN sigs s1 ON s1.doc_id = least(t.doc_id, r.rid) " +
      "JOIN sigs s2 ON s2.doc_id = greatest(t.doc_id, r.rid) " +
      s"WHERE t.bucket_n > $maxBucket AND t.doc_id <> r.rid), " +
      "ringsrc AS (SELECT doc_id, sig, lead(doc_id) OVER (PARTITION BY band, bsig ORDER BY doc_id) AS next_id, " +
      "lead(doc_id, 2) OVER (PARTITION BY band, bsig ORDER BY doc_id) AS next2_id " +
      s"FROM tagged WHERE bucket_n > $maxBucket), " +
      "ringpairs AS (SELECT r.doc_id AS id1, r.next_id AS id2, r.sig AS sig1, s2.sig AS sig2 " +
      "FROM ringsrc r JOIN sigs s2 ON s2.doc_id = r.next_id WHERE r.next_id IS NOT NULL), " +
      "ringpairs2 AS (SELECT r.doc_id AS id1, r.next2_id AS id2, r.sig AS sig1, s3.sig AS sig2 " +
      "FROM ringsrc r JOIN sigs s3 ON s3.doc_id = r.next2_id WHERE r.next2_id IS NOT NULL), " +
      "allpairs AS (SELECT * FROM smallpairs UNION ALL SELECT * FROM bigpairs UNION ALL SELECT * FROM ringpairs UNION ALL SELECT * FROM ringpairs2), " +
      "mh AS (SELECT id1, id2, " +
      s"max(len(list_filter(generate_series(1, $numPerm), i -> sig1[i] = sig2[i])) / $numPerm.0) AS est_jaccard " +
      "FROM allpairs GROUP BY 1, 2)"
  }

  /** Oracle for Dedup.incrementalDedup: the src0 batch screened against
    * the rest of the corpus — mirrors the Scala operator's banding,
    * oversized-corpus-bucket representative rule, and best-match pick.
    */
  private def incrementalDedupSql(minJaccard: Double = 0.8, numPerm: Int = 128,
                                  bands: Int = 16, maxBucket: Int = 100,
                                  numReps: Int = 8): String = {
    val rows = numPerm / bands
    s"WITH dw AS (SELECT doc_id, source, string_split_regex(text, '\\s+') AS ws FROM documents), " +
      "dh AS (SELECT doc_id, source, list_transform(" +
      "list_transform(generate_series(1, len(ws)-2), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])), " +
      "s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)) AS hashes FROM dw WHERE len(ws) >= 3), " +
      s"sigs AS (SELECT doc_id, source, ${minhashSigSql(numPerm)} AS sig FROM dh), " +
      "nsig AS (SELECT doc_id, sig FROM sigs WHERE source = 'src0'), " +
      "csig AS (SELECT doc_id, sig FROM sigs WHERE source <> 'src0'), " +
      s"bx AS (SELECT unnest(generate_series(0, ${bands - 1})) AS band), " +
      "nb AS (SELECT doc_id, band, " +
      s"CAST('0x' || substr(md5(array_to_string(sig[band*$rows+1 : band*$rows+$rows], ',')), 1, 15) AS BIGINT) AS bsig " +
      "FROM nsig CROSS JOIN bx), " +
      "cb AS (SELECT doc_id, band, " +
      s"CAST('0x' || substr(md5(array_to_string(sig[band*$rows+1 : band*$rows+$rows], ',')), 1, 15) AS BIGINT) AS bsig " +
      "FROM csig CROSS JOIN bx), " +
      "cs AS (SELECT band, bsig, count(*) AS bucket_n FROM cb GROUP BY 1, 2), " +
      // oversized corpus buckets contribute numReps hash-sampled members
      // (md5-prefix order), mirroring Dedup.incrementalDedup's screen set
      "crep AS (SELECT band, bsig, doc_id FROM (" +
      "SELECT c.band, c.bsig, c.doc_id, row_number() OVER (PARTITION BY c.band, c.bsig " +
      "ORDER BY CAST('0x'||substr(md5(CAST(c.doc_id AS VARCHAR)),1,8) AS BIGINT), c.doc_id) AS hr " +
      "FROM cb c JOIN cs s ON s.band = c.band AND s.bsig = c.bsig " +
      s"WHERE s.bucket_n > $maxBucket) WHERE hr <= $numReps), " +
      "cand AS (SELECT DISTINCT n.doc_id AS nid, c.doc_id AS cid FROM nb n " +
      "JOIN cb c ON n.band = c.band AND n.bsig = c.bsig " +
      "JOIN cs s ON s.band = n.band AND s.bsig = n.bsig " +
      s"WHERE s.bucket_n <= $maxBucket " +
      "UNION SELECT DISTINCT n.doc_id, r.doc_id FROM nb n " +
      "JOIN crep r ON n.band = r.band AND n.bsig = r.bsig), " +
      "scored AS (SELECT nid, cid, " +
      s"len(list_filter(generate_series(1, $numPerm), i -> a.sig[i] = b.sig[i])) / $numPerm.0 AS est " +
      "FROM cand JOIN nsig a ON a.doc_id = nid JOIN csig b ON b.doc_id = cid), " +
      "rolled AS (SELECT nid, count(*) AS n_candidates, max(est) AS best_est FROM scored GROUP BY 1), " +
      // ties at the max estimate break to the lowest corpus id (est is an
      // exact k/128 double, so the equality join is safe)
      "best AS (SELECT s.nid, min(s.cid) AS best_match FROM scored s " +
      "JOIN rolled r ON s.nid = r.nid AND s.est = r.best_est GROUP BY 1), " +
      "rolled2 AS (SELECT rolled.nid, n_candidates, best_est, best_match FROM rolled JOIN best ON best.nid = rolled.nid) " +
      "SELECT d.doc_id, COALESCE(n_candidates, 0) AS n_candidates, best_match, best_est, " +
      s"(best_est IS NULL OR best_est < $minJaccard) AS novel " +
      "FROM (SELECT doc_id FROM documents WHERE source = 'src0') d " +
      "LEFT JOIN rolled2 ON rolled2.nid = d.doc_id"
  }

  /** CTE chain extending minhash pairs with exact shingle-set Jaccard:
    * ends in `jac(id1, id2, est_jaccard, jaccard)` (unfiltered).
    */
  private def jaccardCtes: String = jaccardCtesWhere("")

  /** [[jaccardCtes]] over a filtered document set (`where` is an SQL
    * predicate suffix like " WHERE doc_id % 2 = 0") — lets the stable-id
    * oracle replay the prior batch's pipeline on a subset.
    */
  private def jaccardCtesWhere(where: String): String =
    minhashPairsCtes(where = where) + ", " +
      "shg AS (SELECT doc_id, list_distinct(list_transform(" +
      "generate_series(1, len(ws)-2), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS sh FROM dw), " +
      "jac AS (SELECT m.id1, m.id2, m.est_jaccard, " +
      "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / " +
      "CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard " +
      "FROM mh m JOIN shg a ON a.doc_id = m.id1 JOIN shg b ON b.doc_id = m.id2)"

  /** Min-label components over the near-dup graph of a (possibly
    * filtered) document set, as a self-contained subquery — the building
    * block [[corpusDedupStableSql]] instantiates twice (prior batch +
    * today's corpus).
    */
  private def dedupLabelsSubquery(minJaccard: Double, where: String): String =
    s"(WITH RECURSIVE ${jaccardCtesWhere(where)}, " +
      s"edges0 AS (SELECT id1, id2 FROM jac WHERE jaccard >= $minJaccard), " +
      "edges AS (SELECT id1 AS a, id2 AS b FROM edges0 UNION SELECT id2, id1 FROM edges0), " +
      "nodes AS (SELECT DISTINCT a AS doc_id FROM edges), " +
      "comp AS (SELECT doc_id, doc_id AS lbl FROM nodes " +
      "UNION SELECT e.a AS doc_id, c.lbl FROM edges e JOIN comp c ON e.b = c.doc_id) " +
      "SELECT doc_id, min(lbl) AS cluster_id FROM comp GROUP BY 1)"

  /** DuckDB replay of Dedup.corpusDedupStable over a two-batch setup:
    * prior labels from the even-doc_id half, today over the full corpus,
    * then the claim/award relabel (rep-doc priority, min-fresh fallback)
    * and the keeper window — mirrors clustersStable exactly.
    */
  private def corpusDedupStableSql(minJaccard: Double): String =
    "WITH prior AS (SELECT * FROM " +
      dedupLabelsSubquery(minJaccard, " WHERE doc_id % 2 = 0") + "), " +
      "today AS (SELECT * FROM " + dedupLabelsSubquery(minJaccard, "") + "), " +
      "claims AS (SELECT DISTINCT t.cluster_id, p.cluster_id AS p " +
      "FROM today t JOIN prior p ON p.doc_id = t.doc_id), " +
      "repc AS (SELECT t.doc_id AS p, t.cluster_id AS rep_comp FROM today t " +
      "JOIN prior pr ON pr.doc_id = t.doc_id AND pr.cluster_id = pr.doc_id), " +
      "award AS (SELECT c.p, COALESCE(min(r.rep_comp), min(c.cluster_id)) AS cluster_id " +
      "FROM claims c LEFT JOIN repc r ON r.p = c.p GROUP BY c.p), " +
      "stab AS (SELECT cluster_id, min(p) AS stable FROM award GROUP BY 1), " +
      "lab AS (SELECT t.doc_id, COALESCE(s.stable, t.cluster_id) AS cluster_id " +
      "FROM today t LEFT JOIN stab s ON s.cluster_id = t.cluster_id), " +
      "qf AS (SELECT doc_id, " +
      "CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) AS nw, " +
      "CAST(length(text) AS DOUBLE) AS nc, " +
      "CAST(length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS DOUBLE) AS np, " +
      "CAST(len(list_filter(string_split_regex(text, '\\s+'), " +
      "w -> w IN ('the','a','and','of','to','in','is','it','for','on'))) AS DOUBLE) AS ns " +
      "FROM documents), " +
      "qual AS (SELECT doc_id, 0.5 * (ns / nw) + 0.3 * (1.0 - np / nc) + " +
      "0.2 * least(nw / 100.0, 1.0) AS score FROM qf) " +
      "SELECT l.doc_id, l.cluster_id, " +
      "(row_number() OVER (PARTITION BY l.cluster_id ORDER BY q.score DESC, l.doc_id) = 1) AS keep " +
      "FROM lab l JOIN qual q ON q.doc_id = l.doc_id"

  /** SimHash oracle: 60 bit-vote terms over portable 60-bit word hashes,
    * then pigeonhole chunk join — mirrors Dedup.simhashNearDup.
    */
  private def simhashNearDupSql(maxHamming: Int = 3): String = {
    val terms = (0 until 60).map { j =>
      s"(CASE WHEN list_sum(list_transform(wh, h -> CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 " +
        s"THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")
    "WITH dw AS (SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents " +
      "WHERE len(string_split_regex(text, '\\s+')) >= 1), " +
      "wh AS (SELECT doc_id, list_transform(ws, w -> CAST('0x' || substr(md5(w), 1, 15) AS BIGINT)) AS wh FROM dw), " +
      s"sh AS (SELECT doc_id, $terms AS simhash FROM wh), " +
      "chunked AS (SELECT doc_id, simhash, chunk, (simhash >> (chunk*15)) & 32767 AS cval " +
      "FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS chunk) cx) " +
      "SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2, " +
      "CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming " +
      "FROM chunked x JOIN chunked y ON x.chunk = y.chunk AND x.cval = y.cval AND x.doc_id < y.doc_id " +
      s"WHERE bit_count(xor(x.simhash, y.simhash)) <= $maxHamming"
  }

  /** Connected components + keeper pick, mirroring Dedup.corpusDedup:
    * recursive min-label reachability over symmetric near-dup edges, then
    * one keeper per cluster (best quality score, ties lowest doc_id).
    */
  /** DuckDB replay of [[graft.ops.Layout.zorderKey]]: the identical
    * `cols.size * bits` shift/and/or interleave terms (bit j of column c
    * lands at j*k + c), emitted as one `|`-joined expression.
    */
  private def zorderSqlExpr(cols: Seq[String], bits: Int): String =
    (for { c <- cols.indices; j <- 0 until bits }
      yield s"(((${cols(c)} >> $j) & 1) << ${j * cols.size + c})")
      .mkString(" | ")

  /** DuckDB replay of [[graft.ops.Layout.curveSkip]]: normalize + z
    * interleave, then the Hilbert unroll as generated per-level CTEs
    * (i8 seeds state, i7..i0 apply [[graft.ops.Layout.hilbertIterSql]]),
    * then one stats CTE per layout and a 6-row UNION in the exact
    * (layout, pred) order the Spark side unions.
    */
  /** RRF fusion replay: the bm25_search CTE chain ranked to top-20, the
    * ann_topk exact-cosine chain for the one query vector, full-outer
    * fused with 1/(60+rank) reciprocal contributions (absent list = 0).
    */
  private def hybridRrfSql: String =
    "WITH lens AS (SELECT doc_id, " +
      "COALESCE(CAST(len(string_split_regex(text, '\\s+')) AS BIGINT), 0) AS dl FROM documents), " +
      "stats AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS tot FROM lens), " +
      "q AS (SELECT unnest(['spark', 'join', 'data']) AS term), " +
      "toks AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS term FROM documents), " +
      "tf AS (SELECT doc_id, toks.term, count(*) AS tf FROM toks JOIN q ON q.term = toks.term GROUP BY 1, 2), " +
      "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1), " +
      "contrib AS (SELECT tf.doc_id, " +
      "CAST(round(ln((n - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) / " +
      "(tf + 1.2 * (0.25 + (0.75 * dl) / (CAST(tot AS DOUBLE) / n))), 6) AS DECIMAL(18,6)) AS c " +
      "FROM tf JOIN df ON df.term = tf.term JOIN lens ON lens.doc_id = tf.doc_id CROSS JOIN stats), " +
      "lex AS (SELECT doc_id, rn AS lex_rn FROM (" +
      "SELECT doc_id, CAST(row_number() OVER (ORDER BY CAST(sum(c) AS DOUBLE) DESC, doc_id) AS BIGINT) AS rn " +
      "FROM contrib GROUP BY 1) WHERE rn <= 20), " +
      "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "qv AS (SELECT * FROM e WHERE vec_id = 3), " +
      "sem AS (SELECT doc_id, rn AS sem_rn FROM (" +
      "SELECT e.vec_id AS doc_id, CAST(row_number() OVER (" +
      "ORDER BY round(list_cosine_similarity(qv.v, e.v), 6) DESC, e.vec_id) AS BIGINT) AS rn " +
      "FROM qv JOIN e ON e.vec_id <> qv.vec_id) WHERE rn <= 20), " +
      "f AS (SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id, lex_rn, sem_rn, " +
      "round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + lex_rn), 0) + " +
      "COALESCE(CAST(1.0 AS DOUBLE) / (60 + sem_rn), 0), 6) AS rrf " +
      "FROM lex FULL OUTER JOIN sem ON sem.doc_id = lex.doc_id) " +
      "SELECT doc_id, lex_rn, sem_rn, rrf FROM f ORDER BY rrf DESC, doc_id LIMIT 10"

  /** MMR replay: exact top-n candidates + their pair-sim matrix, then the
    * k greedy steps UNROLLED as chained CTEs (sel_i picks the per-qid
    * argmax of 0.7·rel − 0.3·maxsim over pairs restricted to the selected
    * set selu_{i−1}) — one shared per-step template, the hilbertSkipSql
    * idiom.
    */
  private def mmrRerankSql(n: Int = 8, k: Int = 4): String = {
    val base =
      "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "q AS (SELECT * FROM e WHERE vec_id < 3), " +
        "cand0 AS (SELECT q.vec_id AS qid, e.vec_id AS doc_id, " +
        "round(list_cosine_similarity(q.v, e.v), 6) AS rel, e.v AS v, " +
        "row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY round(list_cosine_similarity(q.v, e.v), 6) DESC, e.vec_id) AS rn " +
        "FROM q JOIN e ON e.vec_id <> q.vec_id), " +
        s"cand AS (SELECT qid, doc_id, rel, v FROM cand0 WHERE rn <= $n), " +
        // sim/rel quantize to DECIMAL(8,6); λ·rel − μ·maxsim is then an
        // EXACT 7-decimal value whose round-to-6 is engine-independent
        // (as doubles, 7th-digit-5 boundaries split Spark vs DuckDB)
        "pairs AS (SELECT c1.qid, c1.doc_id AS a, c2.doc_id AS b, " +
        "CAST(round(list_cosine_similarity(c1.v, c2.v), 6) AS DECIMAL(8,6)) AS sim " +
        "FROM cand c1 JOIN cand c2 ON c1.qid = c2.qid AND c1.doc_id <> c2.doc_id), " +
        "sel1 AS (SELECT qid, doc_id, CAST(1 AS BIGINT) AS step, score FROM (" +
        "SELECT qid, doc_id, CAST(round(0.7 * CAST(rel AS DECIMAL(8,6)), 6) AS DOUBLE) AS score, " +
        "row_number() OVER (PARTITION BY qid " +
        "ORDER BY CAST(round(0.7 * CAST(rel AS DECIMAL(8,6)), 6) AS DOUBLE) DESC, doc_id) AS rn " +
        "FROM cand) WHERE rn = 1), " +
        "selu1 AS (SELECT * FROM sel1)"
    val steps = (2 to k).map { i =>
      val p = i - 1
      val scoreExpr =
        "CAST(round(0.7 * CAST(r.rel AS DECIMAL(8,6)) - 0.3 * m.maxsim, 6) AS DOUBLE)"
      s"sel$i AS (SELECT qid, a AS doc_id, CAST($i AS BIGINT) AS step, score FROM (" +
        s"SELECT m.qid, m.a, $scoreExpr AS score, " +
        "row_number() OVER (PARTITION BY m.qid " +
        s"ORDER BY $scoreExpr DESC, m.a) AS rn " +
        s"FROM (SELECT p.qid, p.a, max(p.sim) AS maxsim FROM pairs p " +
        s"JOIN selu$p s ON s.qid = p.qid AND s.doc_id = p.b " +
        s"WHERE NOT EXISTS (SELECT 1 FROM selu$p x WHERE x.qid = p.qid AND x.doc_id = p.a) " +
        "GROUP BY 1, 2) m " +
        "JOIN cand r ON r.qid = m.qid AND r.doc_id = m.a) WHERE rn = 1), " +
        s"selu$i AS (SELECT * FROM selu$p UNION ALL SELECT * FROM sel$i)"
    }.mkString(", ")
    s"WITH $base, $steps SELECT qid, step, doc_id, score FROM selu$k"
  }

  private def hilbertSkipSql: String = {
    val zex = zorderSqlExpr(Seq("xn", "yn"), 8)
    val iters = (7 to 0 by -1).map { lvl =>
      val prev = if (lvl == 7) "i8" else s"i${lvl + 1}"
      s"i$lvl AS (${graft.ops.Layout.hilbertIterSql(lvl, 8, Seq("xn", "yn", "z"))} FROM $prev)"
    }.mkString(", ")
    def statsCte(name: String, bucket: String) =
      s"$name AS (SELECT $bucket AS file_id, min(xn) AS min_x, max(xn) AS max_x, " +
        "min(yn) AS min_y, max(yn) AS max_y, count(*) AS n FROM hv GROUP BY 1)"
    def row(layout: String, cte: String, pred: String,
            x1: Long, x2: Long, y1: Long, y2: Long) =
      s"SELECT '$layout' AS layout, '$pred' AS pred, " +
        "CAST(count(*) AS BIGINT) AS files_total, " +
        s"CAST(sum(CASE WHEN min_x <= $x2 AND max_x >= $x1 AND min_y <= $y2 " +
        s"AND max_y >= $y1 THEN 1 ELSE 0 END) AS BIGINT) AS files_read, " +
        s"CAST(sum(CASE WHEN min_x <= $x2 AND max_x >= $x1 AND min_y <= $y2 " +
        s"AND max_y >= $y1 THEN n ELSE 0 END) AS BIGINT) AS rows_read FROM $cte"
    "WITH mx AS (SELECT max(l_partkey) AS mx, max(l_suppkey) AS my FROM lineitem), " +
      "base AS (SELECT (l_partkey * 256) // (mx + 1) AS xn, " +
      "(l_suppkey * 256) // (my + 1) AS yn FROM lineitem, mx), " +
      s"zc AS (SELECT xn, yn, $zex AS z FROM base), " +
      "i8 AS (SELECT xn, yn, z, xn AS hx, yn AS hy, CAST(0 AS BIGINT) AS hd FROM zc), " +
      iters + ", " +
      "hv AS (SELECT xn, yn, z, hd AS h FROM i0), " +
      statsCte("lf", "xn >> 3") + ", " +
      statsCte("zf", "z >> 11") + ", " +
      statsCte("hf", "h >> 11") + " " +
      Seq(
        row("linear_x", "lf", "center_box", 64, 95, 64, 95),
        row("linear_x", "lf", "x_band", 120, 135, 0, 255),
        row("linear_x", "lf", "y_band", 0, 255, 120, 135),
        row("zorder", "zf", "center_box", 64, 95, 64, 95),
        row("zorder", "zf", "x_band", 120, 135, 0, 255),
        row("zorder", "zf", "y_band", 0, 255, 120, 135),
        row("hilbert", "hf", "center_box", 64, 95, 64, 95),
        row("hilbert", "hf", "x_band", 120, 135, 0, 255),
        row("hilbert", "hf", "y_band", 0, 255, 120, 135)).mkString(" UNION ALL ")
  }

  private def corpusDedupSql(minJaccard: Double): String =
    s"WITH RECURSIVE $jaccardCtes, " +
      s"edges0 AS (SELECT id1, id2 FROM jac WHERE jaccard >= $minJaccard), " +
      "edges AS (SELECT id1 AS a, id2 AS b FROM edges0 UNION SELECT id2, id1 FROM edges0), " +
      "nodes AS (SELECT DISTINCT a AS doc_id FROM edges), " +
      "comp AS (SELECT doc_id, doc_id AS lbl FROM nodes " +
      "UNION SELECT e.a AS doc_id, c.lbl FROM edges e JOIN comp c ON e.b = c.doc_id), " +
      "labels AS (SELECT doc_id, min(lbl) AS cluster_id FROM comp GROUP BY 1), " +
      "qf AS (SELECT doc_id, " +
      "CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) AS nw, " +
      "CAST(length(text) AS DOUBLE) AS nc, " +
      "CAST(length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS DOUBLE) AS np, " +
      "CAST(len(list_filter(string_split_regex(text, '\\s+'), " +
      "w -> w IN ('the','a','and','of','to','in','is','it','for','on'))) AS DOUBLE) AS ns " +
      "FROM documents), " +
      "qual AS (SELECT doc_id, 0.5 * (ns / nw) + 0.3 * (1.0 - np / nc) + " +
      "0.2 * least(nw / 100.0, 1.0) AS score FROM qf) " +
      "SELECT l.doc_id, l.cluster_id, " +
      "(row_number() OVER (PARTITION BY l.cluster_id ORDER BY q.score DESC, l.doc_id) = 1) AS keep " +
      "FROM labels l JOIN qual q ON q.doc_id = l.doc_id"
}
