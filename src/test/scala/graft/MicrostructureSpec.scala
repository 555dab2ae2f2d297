package graft

import graft.ohlcv.Microstructure
import org.apache.spark.sql.functions._

/** Market-microstructure estimators (round 10): tick-rule order flow,
  * Roll spread, Amihud illiquidity, rolling beta — each pinned on a
  * hand-built sequence with a closed-form answer, plus conservation /
  * determinism contracts.
  */
class MicrostructureSpec extends SparkSpec {

  private val H = 3600000000L // 1h in micros

  // ---- tick rule ----

  test("tickRule: hand-built sequence classifies with carry-forward") {
    import spark.implicits._
    // one symbol, one hour: prices 10, 11 (up), 11 (zero-tick -> carries
    // +1), 10 (down), 10 (carries -1); first trade unclassified
    val t = Seq(
      ("A", ts(T0 + 0), 10.0, 1.0),
      ("A", ts(T0 + 60), 11.0, 2.0),
      ("A", ts(T0 + 120), 11.0, 4.0),
      ("A", ts(T0 + 180), 10.0, 8.0),
      ("A", ts(T0 + 240), 10.0, 16.0)
    ).toDF("symbol", "ts", "price", "qty")
    val r = Microstructure.tickRuleImbalance(t, H).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Double]("buy_qty") == 6.0) // trades 2+3 (2+4)
    assert(row.getAs[Double]("sell_qty") == 24.0) // trades 4+5 (8+16)
    assert(row.getAs[Double]("unclassified_qty") == 1.0) // leading trade
    assert(row.getAs[Long]("n_trades") == 5L)
    assert(math.abs(row.getAs[Double]("imbalance") - (6.0 - 24.0) / 30.0) < 1e-9)
  }

  test("tickRule: classified+unclassified volume is conserved per bucket") {
    val trades = core.Tables.trades(spark, Sf0001)
    val r = Microstructure.tickRuleImbalance(trades, H)
      .agg(sum(col("buy_qty") + col("sell_qty") + col("unclassified_qty")))
      .head().getDouble(0)
    val total = trades.agg(
      sum(col("qty").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double")).head().getDouble(0)
    assert(math.abs(r - total) < 1e-6, s"volume not conserved: $r vs $total")
  }

  test("tickRule: all-same-price symbol stays fully unclassified") {
    import spark.implicits._
    val t = Seq(("F", ts(T0), 5.0, 3.0), ("F", ts(T0 + 1), 5.0, 7.0))
      .toDF("symbol", "ts", "price", "qty")
    val row = Microstructure.tickRuleImbalance(t, H).collect().head
    assert(row.getAs[Double]("unclassified_qty") == 10.0)
    assert(row.getAs[Double]("buy_qty") == 0.0 && row.getAs[Double]("sell_qty") == 0.0)
    // 0/0 imbalance is null-guarded, not NaN/error
    assert(row.isNullAt(row.fieldIndex("imbalance")))
  }

  test("streaming tick rule matches batch classification across a batch split") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val all = Seq(
      ("A", ts(T0 + 0), 10.0, 1.0), ("A", ts(T0 + 60), 11.0, 2.0),
      ("A", ts(T0 + 120), 11.0, 4.0), ("A", ts(T0 + 180), 10.0, 8.0),
      ("A", ts(T0 + 240), 10.0, 16.0))
    val ms = MemoryStream[(String, java.sql.Timestamp, Double, Double)]
    val q = streaming.StreamingTickRule.run(
      ms.toDF.toDF("symbol", "ts", "price", "qty"))
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_tick").start()
    try {
      // the zero-tick carry-forward state must survive the batch boundary
      ms.addData(all.take(2): _*); q.processAllAvailable()
      ms.addData(all.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("stream_tick").orderBy("ts")
      .collect().map(r => (r.getAs[Double]("qty"),
        Option(r.getAs[Integer]("side")).map(_.intValue))).toSeq
    assert(got == Seq((1.0, None), (2.0, Some(1)), (4.0, Some(1)),
      (8.0, Some(-1)), (16.0, Some(-1))))
    // and the aggregated imbalance equals the batch operator on the union
    val agg = spark.table("stream_tick")
      .groupBy(col("symbol"))
      .agg(sum(when(col("side") === 1, col("qty")).otherwise(0.0)).as("b"),
        sum(when(col("side") === -1, col("qty")).otherwise(0.0)).as("s"))
      .head()
    val batch = Microstructure.tickRuleImbalance(
      all.toDF("symbol", "ts", "price", "qty"), 3600000000L).head()
    assert(agg.getAs[Double]("b") == batch.getAs[Double]("buy_qty"))
    assert(agg.getAs[Double]("s") == batch.getAs[Double]("sell_qty"))
  }

  // ---- Roll spread ----

  test("rollSpread: pure bid-ask bounce recovers the spread") {
    import spark.implicits._
    // closes alternate 100, 101, 100, 101... -> dp alternates +1/-1,
    // cov(dp_t, dp_{t-1}) = -1 exactly, Roll spread = 2*sqrt(1) = 2
    val candles = (0 until 40).map { i =>
      ("B", ts(T0 + i * 3600), if (i % 2 == 0) 100.0 else 101.0)
    }.toDF("symbol", "bucket_ts", "close")
    val row = Microstructure.rollSpread(candles).collect().head
    assert(row.getAs[Long]("n") == 38L)
    assert(math.abs(row.getAs[Double]("roll_spread") - 2.0) < 1e-3,
      s"expected ~2.0, got ${row.getAs[Double]("roll_spread")}")
    assert(row.getAs[Double]("autocov_dp") < 0)
  }

  test("rollSpread: trending prices clamp to zero spread") {
    import spark.implicits._
    // strictly rising closes -> positive autocovariance -> clamp at 0
    val candles = (0 until 30).map(i => ("C", ts(T0 + i * 3600), 100.0 + i))
      .toDF("symbol", "bucket_ts", "close")
    val row = Microstructure.rollSpread(candles).collect().head
    assert(row.getAs[Double]("roll_spread") == 0.0)
  }

  // ---- Amihud ----

  test("amihud: hand-computed two-day impact") {
    import spark.implicits._
    // day1 close 100 (vol 10), day2 close 110 (vol 10): one observation,
    // ret = 0.1, term = 0.1/(110*10)*1e6 = 90.909090909091
    val daily = Seq(
      ("D", ts(T0), 100.0, 10.0),
      ("D", ts(T0 + 86400), 110.0, 10.0)
    ).toDF("symbol", "bucket_ts", "close", "volume")
    val row = Microstructure.amihud(daily).collect().head
    assert(row.getAs[Long]("n_days") == 1L)
    assert(math.abs(row.getAs[Double]("amihud") - 90.909091) < 1e-6)
  }

  test("amihud: zero-volume days are excluded, not zero-counted") {
    import spark.implicits._
    val daily = Seq(
      ("E", ts(T0), 100.0, 10.0),
      ("E", ts(T0 + 86400), 110.0, 0.0), // excluded
      ("E", ts(T0 + 2 * 86400), 121.0, 10.0)
    ).toDF("symbol", "bucket_ts", "close", "volume")
    val row = Microstructure.amihud(daily).collect().head
    // the zero-volume day contributes NO impact observation (its own
    // day1->day2 return is dropped, not zero-counted); day2->day3 survives
    // because the lag still sees day2's close
    assert(row.getAs[Long]("n_days") == 1L)
    assert(math.abs(row.getAs[Double]("amihud") - 82.644628) < 1e-6) // 0.1/(121*10)*1e6
  }

  // ---- rolling beta ----

  test("rollingBeta: a symbol that IS the market has beta 1") {
    import spark.implicits._
    // two identical symbols -> market return == each symbol's return ->
    // cov/var = 1 exactly on every full frame
    val closes = (0 until 30).map(i => 100.0 + (i % 7) + 0.5 * (i % 3))
    val candles = (for {
      s <- Seq("X", "Y"); (c, i) <- closes.zipWithIndex
    } yield (s, ts(T0 + i * 3600), c)).toDF("symbol", "bucket_ts", "close")
    val rows = Microstructure.rollingBeta(candles, n = 24).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("beta") - 1.0) < 1e-6,
      s"self-market beta must be 1: $r"))
  }

  test("rollingBeta: leveraged symbol doubles the market beta") {
    import spark.implicits._
    // X has returns r_t, Z has exactly 2*r_t (via log-free construction:
    // prices engineered so simple returns double). Market = avg(r, 2r) =
    // 1.5r; beta_X = cov(r,1.5r)/var(1.5r) = 1/1.5; beta_Z = 2/1.5.
    val rets = (1 until 40).map(i => 0.01 * ((i % 5) - 2)) // returns in {-2%,..,2%}
    def prices(mult: Double) = rets.scanLeft(100.0)((p, r) => p * (1 + mult * r))
    val candles = (for {
      (s, m) <- Seq(("X", 1.0), ("Z", 2.0)); (c, i) <- prices(m).zipWithIndex
    } yield (s, ts(T0 + i * 3600), c)).toDF("symbol", "bucket_ts", "close")
    val rows = Microstructure.rollingBeta(candles, n = 24).collect()
    assert(rows.nonEmpty)
    val byS = rows.groupBy(_.getAs[String]("symbol"))
    // rounding of per-bucket returns to 6dp makes this approximate
    byS("X").foreach(r => assert(math.abs(r.getAs[Double]("beta") - 1.0 / 1.5) < 0.01))
    byS("Z").foreach(r => assert(math.abs(r.getAs[Double]("beta") - 2.0 / 1.5) < 0.01))
  }

  // ---- volume bars / VPIN (wave 7) ----

  /** Hand sequence for the volume clock at threshold 10: bar membership is
    * decided by the PRE-trade cumulative, so the trade that crosses a
    * boundary stays in its old bar, and a jumbo trade consumes whole bar
    * ids (bar 3 is skipped below).
    */
  private def vbTrades = {
    import spark.implicits._
    Seq(
      ("A", ts(T0 + 0), 10.0, 4.0),   // cum_prev 0  -> bar 0
      ("A", ts(T0 + 10), 11.0, 5.0),  // cum_prev 4  -> bar 0
      ("A", ts(T0 + 20), 9.0, 8.0),   // cum_prev 9  -> bar 0 (crosses, stays)
      ("A", ts(T0 + 30), 12.0, 2.0),  // cum_prev 17 -> bar 1
      ("A", ts(T0 + 40), 8.0, 1.0),   // cum_prev 19 -> bar 1
      ("A", ts(T0 + 50), 13.0, 20.0), // cum_prev 20 -> bar 2 (jumbo)
      ("A", ts(T0 + 60), 7.0, 1.0)    // cum_prev 40 -> bar 4 (bar 3 skipped)
    ).toDF("symbol", "ts", "price", "qty")
  }

  test("volumeBars: pre-trade cumulative decides the bar; jumbo trades skip ids") {
    val rows = Microstructure.volumeBars(vbTrades, threshold = 10L)
      .orderBy("bar_id").collect()
    assert(rows.map(_.getAs[Long]("bar_id")).toSeq == Seq(0L, 1L, 2L, 4L))
    val b0 = rows(0)
    assert(b0.getAs[Double]("volume") == 17.0 && b0.getAs[Long]("n_trades") == 3L)
    assert(b0.getAs[Double]("open") == 10.0 && b0.getAs[Double]("close") == 9.0)
    assert(b0.getAs[Double]("high") == 11.0 && b0.getAs[Double]("low") == 9.0)
    val b1 = rows(1)
    assert(b1.getAs[Double]("volume") == 3.0 && b1.getAs[Double]("open") == 12.0 &&
      b1.getAs[Double]("close") == 8.0)
    assert(rows(2).getAs[Double]("volume") == 20.0 && rows(2).getAs[Long]("n_trades") == 1L)
    assert(rows(3).getAs[Double]("volume") == 1.0)
  }

  test("volumeBars: volume is conserved and per-bar volume bounded off jumbos") {
    val trades = core.Tables.trades(spark, Sf0001)
    val bars = Microstructure.volumeBars(trades, threshold = 500L)
    val total = trades.agg(
      sum(col("qty").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double")).head().getDouble(0)
    val barSum = bars.agg(sum(col("volume"))).head().getDouble(0)
    assert(math.abs(total - barSum) < 1e-6, s"volume not conserved: $barSum vs $total")
    // a bar exceeds the threshold only by (at most) its last trade's size
    val over = bars.where(col("volume") >= 500.0 + 100.0).count()
    assert(over == 0, s"$over bars exceed threshold + max trade size")
  }

  test("vpin: hand-signed two-bucket construction; partial bucket dropped") {
    import spark.implicits._
    val t = Seq(
      ("A", ts(T0 + 0), 10.0, 5.0),  // unclassified, cum 0  -> bucket 0
      ("A", ts(T0 + 10), 11.0, 5.0), // buy,          cum 5  -> bucket 0
      ("A", ts(T0 + 20), 10.0, 4.0), // sell,         cum 10 -> bucket 1
      ("A", ts(T0 + 30), 10.0, 6.0), // carries sell, cum 14 -> bucket 1
      ("A", ts(T0 + 40), 12.0, 3.0)  // buy,          cum 20 -> bucket 2 (partial, dropped)
    ).toDF("symbol", "ts", "price", "qty")
    // bucket 0: buy 5, sell 0, V 10 -> 0.5; bucket 1: sell 10, V 10 -> 1.0
    val row = Microstructure.vpin(t, threshold = 10L).collect().head
    assert(row.getAs[Long]("n_buckets") == 2L)
    assert(math.abs(row.getAs[Double]("vpin") - 0.75) < 1e-9)
  }

  test("streaming vpin buckets match the hand-signed batch buckets across splits") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // the vpin hand sequence: bucket 0 (uncl 5, buy 5), bucket 1 (sell 10),
    // bucket 2 partial (stays in state, never emitted)
    val all = Seq(
      ("A", ts(T0 + 0), 10.0, 5.0), ("A", ts(T0 + 10), 11.0, 5.0),
      ("A", ts(T0 + 20), 10.0, 4.0), ("A", ts(T0 + 30), 10.0, 6.0),
      ("A", ts(T0 + 40), 12.0, 3.0))
    val expect = Seq(("A", 0L, 5.0, 0.0, 10.0), ("A", 1L, 0.0, 10.0, 10.0))
    // cut mid-bucket-0 (side carry must survive) and exactly between
    // buckets 1 and 2
    for (cut <- Seq(2, 4)) {
      val ms = MemoryStream[(String, java.sql.Timestamp, Double, Double)]
      val q = streaming.StreamingVpin.run(
          ms.toDF.toDF("symbol", "ts", "price", "qty"), threshold = 10L)
        .writeStream.outputMode("append").format("memory")
        .queryName(s"stream_vpin_$cut").start()
      try {
        ms.addData(all.take(cut): _*); q.processAllAvailable()
        ms.addData(all.drop(cut): _*); q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(s"stream_vpin_$cut").orderBy("bar_id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).toSeq
      assert(got == expect, s"cut=$cut: $got")
    }
  }

  test("streaming volume bars == batch completed bars across mid-bar and on-boundary splits") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val all = vbTrades.collect().map(r => (r.getString(0), r.getTimestamp(1),
      r.getDouble(2), r.getDouble(3))).toSeq
    val batch = Microstructure.volumeBars(vbTrades, threshold = 10L)
    val lastBar = batch.groupBy(col("symbol")).agg(max(col("bar_id")).as("lb"))
    val completed = batch.join(lastBar, Seq("symbol"))
      .where(col("bar_id") < col("lb")).drop("lb")
      .orderBy("symbol", "bar_id").collect().map(_.toSeq).toSeq
    // split after trade 2 (mid-bar 0) and after trade 5 (exactly when bar 2
    // is fully consumed): the open-bar state must survive both
    for (cut <- Seq(2, 6)) {
      val ms = MemoryStream[(String, java.sql.Timestamp, Double, Double)]
      val q = streaming.StreamingVolumeBars.run(
          ms.toDF.toDF("symbol", "ts", "price", "qty"), threshold = 10L)
        .writeStream.outputMode("append").format("memory")
        .queryName(s"stream_vb_$cut").start()
      try {
        ms.addData(all.take(cut): _*); q.processAllAvailable()
        ms.addData(all.drop(cut): _*); q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(s"stream_vb_$cut")
        .orderBy("symbol", "bar_id").collect().map(_.toSeq).toSeq
      assert(got == completed, s"cut=$cut: $got vs $completed")
    }
  }

  test("streaming faces truncate non-integral qty exactly like the batch cast") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // qty 2.7 truncates to 2 (cast-to-long), never rounds to 3 — the r10
    // ADVICE low: Math.round would move this trade across the bar boundary
    val all = Seq(
      ("A", ts(T0 + 0), 10.0, 2.7), ("A", ts(T0 + 10), 11.0, 7.9),
      // cum_prev after truncation: 0, 2, 9 -> third trade still in bar 0
      ("A", ts(T0 + 20), 12.0, 5.0), ("A", ts(T0 + 30), 9.0, 6.0))
    val df = all.toDF("symbol", "ts", "price", "qty")
    val batch = Microstructure.volumeBars(df, threshold = 10L)
    val lastBar = batch.groupBy(col("symbol")).agg(max(col("bar_id")).as("lb"))
    val completed = batch.join(lastBar, Seq("symbol"))
      .where(col("bar_id") < col("lb")).drop("lb")
      .orderBy("symbol", "bar_id").collect().map(_.toSeq).toSeq
    assert(completed.nonEmpty, "the hand sequence must complete a bar")
    val ms = MemoryStream[(String, java.sql.Timestamp, Double, Double)]
    val q = streaming.StreamingVolumeBars.run(
        ms.toDF.toDF("symbol", "ts", "price", "qty"), threshold = 10L)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_vb_frac").start()
    try { ms.addData(all: _*); q.processAllAvailable() } finally q.stop()
    val got = spark.table("stream_vb_frac")
      .orderBy("symbol", "bar_id").collect().map(_.toSeq).toSeq
    assert(got == completed, s"$got vs $completed")
  }
}
