package graft

import graft.ohlcv.Analytics
import org.apache.spark.sql.functions._

/** Round-10 forecasting family: Holt level/trend smoothing and the OLS
  * time trend — hand-folded trajectories and exact-line recovery.
  */
class ForecastSpec extends SparkSpec {

  test("holt: hand-folded trajectory (alpha=0.5, gamma=0.3)") {
    import spark.implicits._
    val candles = Seq(100.0, 102.0, 104.0, 106.0).zipWithIndex
      .map { case (c, i) => ("H", ts(T0 + i * 3600), c) }
      .toDF("symbol", "bucket_ts", "close")
    val r = Analytics.holt(candles).orderBy(col("bucket_ts")).collect()
    // fold: l1=101, b1=0.3; l2=102.65, b2=0.705; l3=104.6775, b3=1.10175
    val exp = Seq((100.0, 0.0, 100.0), (101.0, 0.3, 101.3),
      (102.65, 0.705, 103.355), (104.6775, 1.10175, 105.77925))
    r.zip(exp).foreach { case (row, (l, b, f)) =>
      assert(math.abs(row.getAs[Double]("level") - l) < 1e-9, row.toString)
      assert(math.abs(row.getAs[Double]("trend") - b) < 1e-9, row.toString)
      assert(math.abs(row.getAs[Double]("forecast") - f) < 1e-9, row.toString)
    }
  }

  test("holt: state resets per symbol (no cross-symbol bleed)") {
    import spark.implicits._
    val candles = (Seq(100.0, 200.0).zipWithIndex.map { case (c, i) =>
      ("A", ts(T0 + i * 3600), c)
    } ++ Seq(50.0).map(c => ("B", ts(T0), c)))
      .toDF("symbol", "bucket_ts", "close")
    val r = Analytics.holt(candles).collect()
      .map(x => (x.getString(0), x.getAs[Double]("level"))).toMap
    // B's level must be its own seed, untouched by A's history
    assert(r("B") == 50.0)
  }

  test("holt: a linear series converges its trend toward the true slope") {
    import spark.implicits._
    val candles = (0 until 200).map(i => ("L", ts(T0 + i * 3600), 100.0 + 2.0 * i))
      .toDF("symbol", "bucket_ts", "close")
    val last = Analytics.holt(candles).orderBy(col("bucket_ts").desc).head()
    assert(math.abs(last.getAs[Double]("trend") - 2.0) < 0.01,
      s"trend should approach 2.0: $last")
  }

  test("seasonalDecompose recovers a constructed hour-of-day pattern") {
    import spark.implicits._
    // close = 100 (flat trend) + deterministic hour-of-day bump; over full
    // days the centered 24h MA is exactly 100 (the bumps sum to zero) and
    // the seasonal component equals the bump
    val bump = (h: Int) => if (h == 3) 12.0 else if (h == 15) -12.0 else 0.0
    val candles = (0 until 24 * 10).map { i =>
      ("S", ts(T0 + i * 3600), 100.0 + bump(i % 24))
    }.toDF("symbol", "bucket_ts", "close")
    val r = graft.ohlcv.Analytics.seasonalDecompose(candles).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(math.abs(row.getAs[Double]("trend") - 100.0) < 1e-9, row.toString)
      val h = row.getAs[java.sql.Timestamp]("bucket_ts").toInstant
        .atZone(java.time.ZoneOffset.UTC).getHour
      assert(math.abs(row.getAs[Double]("seasonal") - bump(h)) < 1e-9, row.toString)
      assert(math.abs(row.getAs[Double]("residual")) < 1e-9, row.toString)
    }
  }

  test("kaplanMeier: hand-computed two-death curve with censoring") {
    import spark.implicits._
    val day = 86400L
    // corpus max at T0+40d. Users:
    //   u1: day 0 only            -> lifetime 0, churned
    //   u2: days 0..10            -> lifetime 10, churned
    //   u3: days 0..40 (active at end) -> lifetime 40, censored
    //   u4: days 30..40 (active at end) -> lifetime 10, censored
    val ev = Seq(
      (1L, 0L), (2L, 0L), (2L, 10 * day), (3L, 0L), (3L, 40 * day),
      (4L, 30 * day), (4L, 40 * day)
    ).zipWithIndex.map { case ((u, off), i) =>
      (i.toLong, ts(T0 + off), u, "click", 0.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.ops.Events.kaplanMeier(ev).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    // t=0: n_risk 4, 1 death -> S = 3/4; t=10: n_risk 3, 1 death (u4
    // censored, still at risk at 10) -> S = 0.75 * 2/3 = 0.5
    assert(r.keySet == Set(0L, 10L), r.toString)
    assert(r(0L)._1 == 4L && r(0L)._2 == 1L && math.abs(r(0L)._3 - 0.75) < 1e-6)
    assert(r(10L)._1 == 3L && r(10L)._2 == 1L && math.abs(r(10L)._3 - 0.5) < 1e-6)
  }

  test("kaplanMeier: exhausted last stratum pins survival to exact 0") {
    import spark.implicits._
    val day = 86400L
    // both users churn at their max lifetime -> final stratum d = n
    val ev = Seq(
      (1L, 0L), (1L, 2 * day), (2L, 0L), (2L, 2 * day),
      (99L, 40 * day) // anchor user keeps corpus max far ahead
    ).zipWithIndex.map { case ((u, off), i) =>
      (i.toLong, ts(T0 + off), u, "click", 0.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.ops.Events.kaplanMeier(ev).collect()
      .map(x => x.getLong(0) -> x.getDouble(3)).toMap
    // the anchor (lifetime 0, still active at cutoff) is censored; at
    // t=2 both remaining users churn -> d = n exhausts the stratum
    assert(r.keySet == Set(2L), r.toString)
    assert(r(2L) == 0.0, r.toString)
  }

  test("streaming holt equals the batch sweep across a micro-batch split") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val closes = Seq(100.0, 102.0, 104.0, 106.0, 103.0, 101.0)
    val all = closes.zipWithIndex.map { case (c, i) => ("H", ts(T0 + i * 3600), c) }
    val ms = MemoryStream[(String, java.sql.Timestamp, Double)]
    val q = streaming.StreamingHolt.run(
      ms.toDF.toDF("symbol", "bucket_ts", "close"))
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_holt").start()
    try {
      // the (level, trend) state must survive the batch boundary
      ms.addData(all.take(3): _*); q.processAllAvailable()
      ms.addData(all.drop(3): _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("stream_holt")
      .select("symbol", "bucket_ts", "close", "level", "trend", "forecast")
      .collect().map(_.toSeq).toSet
    val expected = graft.ohlcv.Analytics.holt(
        all.toDF("symbol", "bucket_ts", "close"))
      .collect().map(_.toSeq).toSet
    assert(got == expected && got.size == closes.size)
  }

  test("streaming renko equals the batch sweep across a micro-batch split") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // gap candle (2 up bricks), reversal, multi-brick drop — the anchor
    // state must survive the batch boundary mid-trend
    val closes = Seq(100.0, 112.0, 101.0, 89.0)
    val all = closes.zipWithIndex.map { case (c, i) => ("R", ts(T0 + i * 3600), c) }
    val ms = MemoryStream[(String, java.sql.Timestamp, Double)]
    val q = streaming.StreamingRenko.run(
      ms.toDF.toDF("symbol", "bucket_ts", "close"), brickSize = 5.0)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_renko").start()
    try {
      ms.addData(all.take(2): _*); q.processAllAvailable()
      ms.addData(all.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("stream_renko").collect().map(_.toSeq).toSet
    val expected = graft.ohlcv.Analytics.renko(
        all.toDF("symbol", "bucket_ts", "close"), brickSize = 5.0)
      .collect().map(_.toSeq).toSet
    assert(got == expected, s"got $got\nexpected $expected")
    // sanity on the construction itself: 2 up + 1 down + 3 down bricks
    assert(expected.size == 6, expected.toString)
  }

  test("streaming adl equals the batch exact-decimal line across a split") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // mid-range, close-at-high, close-at-low, zero-range: the full CLV
    // range; the exact-decimal running sum must survive the boundary
    val candles = Seq(
      ("A", ts(T0), 110.0, 90.0, 100.0, 10.0),
      ("A", ts(T0 + 3600), 120.0, 100.0, 120.0, 5.0),
      ("A", ts(T0 + 7200), 130.0, 110.0, 110.0, 4.0),
      ("A", ts(T0 + 10800), 110.0, 110.0, 110.0, 100.0))
    val ms = MemoryStream[(String, java.sql.Timestamp, Double, Double, Double, Double)]
    val q = streaming.StreamingAdl.run(
      ms.toDF.toDF("symbol", "bucket_ts", "high", "low", "close", "volume"))
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_adl").start()
    try {
      ms.addData(candles.take(2): _*); q.processAllAvailable()
      ms.addData(candles.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("stream_adl").collect().map(_.toSeq).toSet
    val expected = graft.ohlcv.Analytics.adl(
        candles.toDF("symbol", "bucket_ts", "high", "low", "close", "volume"))
      .collect().map(_.toSeq).toSet
    assert(got == expected && got.size == 4, s"got $got\nexpected $expected")
  }

  test("streaming supertrend equals the batch sweep across a micro-batch split") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // ratchet, flip, and band reset — split right before the flip candle
    // so the (atr, bands, trend) state must survive the boundary
    val candles = Seq(
      ("S", ts(T0), 110.0, 90.0, 100.0),
      ("S", ts(T0 + 3600), 112.0, 92.0, 111.0),
      ("S", ts(T0 + 7200), 125.0, 105.0, 124.0),
      ("S", ts(T0 + 10800), 126.0, 118.0, 120.0))
    val ms = MemoryStream[(String, java.sql.Timestamp, Double, Double, Double)]
    val q = streaming.StreamingSuperTrend.run(
      ms.toDF.toDF("symbol", "bucket_ts", "high", "low", "close"))
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_st").start()
    try {
      ms.addData(candles.take(2): _*); q.processAllAvailable()
      ms.addData(candles.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("stream_st").collect().map(_.toSeq).toSet
    val expected = graft.ohlcv.Studies.superTrend(
        candles.toDF("symbol", "bucket_ts", "high", "low", "close"))
      .collect().map(_.toSeq).toSet
    assert(got == expected && got.size == 4, s"got $got\nexpected $expected")
  }

  test("ewmaVol: hand-folded RiskMetrics recursion") {
    import spark.implicits._
    // closes 100,110,99,108.9 -> rets .1,-.1,.1; s2: .01, .94*.01+.06*.01=.01, .01
    val candles = Seq(100.0, 110.0, 99.0, 108.9).zipWithIndex
      .map { case (c, i) => ("E", ts(T0 + i * 3600), c) }
      .toDF("symbol", "bucket_ts", "close")
    val r = graft.ohlcv.Analytics.ewmaVol(candles)
      .orderBy("bucket_ts").collect()
    assert(r.length == 3)
    r.foreach(x => assert(math.abs(x.getAs[Double]("ewma_vol") - 0.1) < 1e-6, x.toString))
  }

  test("ewmaVol: volatility decays after a single shock") {
    import spark.implicits._
    // one big return then flat closes: sigma strictly decays at rate sqrt(0.94)
    val closes = 100.0 +: 120.0 +: Seq.fill(10)(120.0)
    val candles = closes.zipWithIndex
      .map { case (c, i) => ("D", ts(T0 + i * 3600), c) }
      .toDF("symbol", "bucket_ts", "close")
    val vols = graft.ohlcv.Analytics.ewmaVol(candles)
      .orderBy("bucket_ts").collect().map(_.getAs[Double]("ewma_vol"))
    assert(vols.head == 0.2)
    assert(vols.sliding(2).forall(p => p(1) < p(0)), vols.mkString(","))
  }

  test("streaming ewma vol equals the batch sweep across a micro-batch split") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val closes = Seq(100.0, 104.0, 99.0, 103.0, 101.0)
    val all = closes.zipWithIndex.map { case (c, i) => ("W", ts(T0 + i * 3600), c) }
    val ms = MemoryStream[(String, java.sql.Timestamp, Double)]
    val q = streaming.StreamingEwmaVol.run(
      ms.toDF.toDF("symbol", "bucket_ts", "close"))
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_ewma").start()
    try {
      ms.addData(all.take(2): _*); q.processAllAvailable()
      ms.addData(all.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("stream_ewma")
      .select("symbol", "bucket_ts", "ret", "ewma_vol")
      .collect().map(_.toSeq).toSet
    val expected = graft.ohlcv.Analytics.ewmaVol(
        all.toDF("symbol", "bucket_ts", "close"))
      .collect().map(_.toSeq).toSet
    assert(got == expected && got.size == closes.size - 1)
  }

  test("hurst: a random-walk-free trending series scores above one half") {
    import spark.implicits._
    // strictly trending multiplicative series: r_k variance grows ~k^2
    // (perfect persistence) -> slope ~2 -> H ~1; a shuffled/noisy series
    // would sit near 0.5. Use mild deterministic variation so per-k
    // variances are positive.
    val closes = (0 until 600).scanLeft(100.0)((p, i) =>
      p * (1.0 + 0.001 + 0.0005 * math.sin(i / 7.0)))
    val candles = closes.zipWithIndex
      .map { case (c, i) => ("T", ts(T0 + i * 3600), c) }
      .toDF("symbol", "bucket_ts", "close")
    val row = graft.ohlcv.Analytics.hurst(candles).head()
    assert(row.getAs[Long]("n_scales") == 5L)
    val h = row.getAs[Double]("hurst")
    assert(h > 0.7, s"persistent series must score high: $h")
  }

  test("hurst: an alternating (mean-reverting) series scores below one half") {
    import spark.implicits._
    // price flips around a slow drift: k=1 variance large, even-k
    // variances tiny (but nonzero, so all five points survive) -> H << 0.5
    val closes = (0 until 300).map(i =>
      (if (i % 2 == 0) 100.0 else 103.0) + 0.003 * i + 0.0001 * (i % 7))
    val candles = closes.zipWithIndex
      .map { case (c, i) => ("M", ts(T0 + i * 3600), c) }
      .toDF("symbol", "bucket_ts", "close")
    val row = graft.ohlcv.Analytics.hurst(candles).head()
    val h = row.getAs[Double]("hurst")
    assert(h < 0.3, s"mean-reverting series must score low: $h")
  }

  test("varEs: hand-computable 5% tail on a return ladder") {
    import spark.implicits._
    // 101 candles -> 100 returns forming a ladder; construct closes so
    // returns are exactly -0.05, -0.04, ..., then many small ones.
    // Use 20 distinct returns r_i = (i - 10) * 0.001 for i in 0..19,
    // each appearing 5 times -> 100 returns. 5th percentile of the
    // micro-unit multiset: interpolated between sorted positions.
    val rets = (0 until 100).map(i => ((i % 20) - 10) * 0.001)
    val closes = rets.scanLeft(1000.0)((p, r) => p * (1 + r))
    val candles = closes.zipWithIndex
      .map { case (c, i) => ("V", ts(T0 + i * 3600), c) }
      .toDF("symbol", "bucket_ts", "close")
    val row = graft.ohlcv.Analytics.varEs(candles).head()
    assert(row.getAs[Long]("n") == 100L)
    // sorted micros: five copies each of -10000,-9000,...; position
    // 0.05*(100-1)=4.95 -> between the 5th and 6th values (-10000,-9000)
    // -> -10000 + 0.95*1000 = -9050
    assert(math.abs(row.getAs[Double]("var_ret") - (-0.00905)) < 1e-9, row.toString)
    // tail = the five -10000s -> ES = -0.01
    assert(row.getAs[Long]("n_tail") == 5L)
    assert(math.abs(row.getAs[Double]("es_ret") - (-0.01)) < 1e-9, row.toString)
  }

  test("renko: hand-built brick sequence with gap and reversal") {
    import spark.implicits._
    val candles = Seq(100.0, 102.5, 102.2, 100.9).zipWithIndex
      .map { case (c, i) => ("R", ts(T0 + i * 3600), c) }
      .toDF("symbol", "bucket_ts", "close")
    val r = graft.ohlcv.Analytics.renko(candles, brickSize = 1.0)
      .orderBy(col("brick_idx")).collect()
      .map(x => (x.getAs[Long]("brick_idx"), x.getAs[Int]("direction"),
        x.getAs[Double]("open_level"), x.getAs[Double]("close_level"))).toSeq
    // 102.5 emits TWO up bricks (gap candle); 102.2 emits none; 100.9
    // crosses one full step down from anchor 102
    assert(r == Seq((1L, 1, 100.0, 101.0), (2L, 1, 101.0, 102.0),
      (3L, -1, 102.0, 101.0)), r.toString)
  }

  test("renko: per-symbol anchors are independent") {
    import spark.implicits._
    val candles = Seq(("A", ts(T0), 10.0), ("A", ts(T0 + 3600), 12.0),
      ("B", ts(T0), 500.0), ("B", ts(T0 + 3600), 499.0))
      .toDF("symbol", "bucket_ts", "close")
    val r = graft.ohlcv.Analytics.renko(candles, 1.0).collect()
      .map(x => (x.getString(0), x.getAs[Int]("direction")))
    assert(r.count(_._1 == "A") == 2 && r.count(_._1 == "B") == 1)
    assert(r.filter(_._1 == "B").forall(_._2 == -1))
  }

  test("trendOls: exact line recovered with R2 = 1") {
    import spark.implicits._
    val candles = (0 until 50).map(i => ("T", ts(T0 + i * 3600), 10.0 + 1.5 * i))
      .toDF("symbol", "bucket_ts", "close")
    val row = Analytics.trendOls(candles).head()
    assert(row.getAs[Long]("n") == 50L)
    assert(math.abs(row.getAs[Double]("slope") - 1.5) < 1e-6)
    assert(math.abs(row.getAs[Double]("intercept") - 10.0) < 1e-6)
    assert(math.abs(row.getAs[Double]("r2") - 1.0) < 1e-6)
  }

  test("trendOls: flat series has slope 0 and null R2 (zero variance)") {
    import spark.implicits._
    val candles = (0 until 10).map(i => ("F", ts(T0 + i * 3600), 42.0))
      .toDF("symbol", "bucket_ts", "close")
    val row = Analytics.trendOls(candles).head()
    assert(row.getAs[Double]("slope") == 0.0)
    assert(row.isNullAt(row.fieldIndex("r2")), "zero price variance must null R2")
  }

  test("trendOls: single-candle symbol yields null slope, not an error") {
    import spark.implicits._
    val candles = Seq(("S", ts(T0), 7.0)).toDF("symbol", "bucket_ts", "close")
    val row = Analytics.trendOls(candles).head()
    assert(row.getAs[Long]("n") == 1L)
    assert(row.isNullAt(row.fieldIndex("slope")))
  }

  // ---- KAMA (wave 7) ----

  test("kama: hand-folded adaptive trajectory matches the sweep") {
    import spark.implicits._
    val closes = Seq(10.0, 10.5, 10.2, 11.0, 11.4, 11.3, 12.0, 12.5)
    val candles = closes.zipWithIndex.map { case (c, i) =>
      ("K", ts(T0 + i * 3600), c)
    }.toDF("symbol", "bucket_ts", "close")
    val rows = Analytics.kama(candles, n = 3).orderBy("bucket_ts").collect()
    // emissions start at the first bar with a full 3-diff ER window (4th)
    assert(rows.length == closes.length - 3)
    // independent fold: exact-cent ER, round 6, variable-alpha recursion
    val rd = (v: Double) =>
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cents = closes.map(c => Math.round(c * 100))
    var k = 0.0
    val expect = (3 until closes.length).map { i =>
      val noise = (i - 2 to i).map(j => Math.abs(cents(j) - cents(j - 1))).sum
      val signal = Math.abs(cents(i) - cents(i - 3))
      val er = if (noise == 0L) 0.0 else rd((signal / 100.0) / (noise / 100.0))
      if (i == 3) k = closes(i)
      else {
        val sc = er * (0.6666666666666666 - 0.06451612903225806) +
          0.06451612903225806
        k = k + sc * sc * (closes(i) - k)
      }
      (er, rd(k))
    }
    rows.zip(expect).foreach { case (r, (er, km)) =>
      assert(r.getAs[Double]("er") == er, s"er at ${r.getAs[Any]("bucket_ts")}")
      assert(r.getAs[Double]("kama") == km, s"kama at ${r.getAs[Any]("bucket_ts")}")
    }
  }

  test("trix: hand-folded chained triple EMA and first-bar conventions") {
    import spark.implicits._
    val closes = Seq(10.0, 12.0, 11.0, 13.0)
    val candles = closes.zipWithIndex.map { case (c, i) =>
      ("T", ts(T0 + i * 3600), c)
    }.toDF("symbol", "bucket_ts", "close")
    val rows = Analytics.trix(candles).orderBy("bucket_ts").collect()
    assert(rows.length == 4)
    // independent chained fold, a = 0.2, b = 1 - a; e2 consumes fresh e1
    val rd = (v: Double) =>
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val a = 0.2; val b = 1.0 - a
    var e1 = closes.head; var e2 = e1; var e3 = e2
    assert(rows.head.getAs[Double]("e3") == 10.0 &&
      rows.head.isNullAt(rows.head.fieldIndex("trix")))
    closes.drop(1).zip(rows.drop(1)).foreach { case (c, r) =>
      val e3p = e3
      e1 = a * c + b * e1; e2 = a * e1 + b * e2; e3 = a * e2 + b * e3
      assert(r.getAs[Double]("e3") == rd(e3), r.toString)
      assert(r.getAs[Double]("trix") == rd(100.0 * (e3 / e3p - 1.0)), r.toString)
    }
    // second bar closed-form sanity: e3 = .2(.2(.2*12+.8*10)+.8*10)+.8*10
    assert(rows(1).getAs[Double]("e3") == rd(10.016))
  }

  test("cmo: hand 3-bar frames; flat frames null-guard") {
    import spark.implicits._
    val candles = Seq(10.0, 11.0, 13.0, 12.0, 14.0).zipWithIndex.map {
      case (c, i) => ("C", ts(T0 + i * 3600), c)
    }.toDF("symbol", "bucket_ts", "close")
    val r = Analytics.cmo(candles, n = 3).orderBy("bucket_ts").collect()
    // diffs +1,+2,-1,+2: frames (1,2,-1) -> 100*2/4; (2,-1,2) -> 100*3/5
    assert(r.map(_.getAs[Double]("cmo")).toSeq == Seq(50.0, 60.0), r.mkString(","))
    val flat = (0 to 4).map(i => ("F", ts(T0 + i * 3600), 5.0))
      .toDF("symbol", "bucket_ts", "close")
    val f = Analytics.cmo(flat, n = 3).collect()
    assert(f.nonEmpty && f.forall(r => r.isNullAt(r.fieldIndex("cmo"))),
      f.mkString(","))
  }

  test("dpo: linear ramp detrends to a constant") {
    import spark.implicits._
    val candles = (1 to 8).map(i => ("D", ts(T0 + i * 3600), i.toDouble))
      .toDF("symbol", "bucket_ts", "close")
    val r = Analytics.dpo(candles, n = 4).collect()
    // shift = 3: dpo = c_{t-3} - (t - 1.5) = -1.5 everywhere defined
    assert(r.length == 5)
    assert(r.forall(_.getAs[Double]("dpo") == -1.5), r.mkString(","))
  }

  test("elderRay: hand two-bar EMA13 powers and seed") {
    import spark.implicits._
    val candles = Seq(
      ("E", ts(T0), 11.0, 9.0, 10.0),
      ("E", ts(T0 + 3600), 25.0, 23.0, 24.0)
    ).toDF("symbol", "bucket_ts", "high", "low", "close")
    val r = Analytics.elderRay(candles).orderBy("bucket_ts").collect()
    // bar 1: e = 10 -> bull 1, bear -1; bar 2: e = (2*24 + 12*10)/14 = 12
    assert(r(0).getAs[Double]("bull_power") == 1.0 &&
      r(0).getAs[Double]("bear_power") == -1.0)
    assert(r(1).getAs[Double]("bull_power") == 13.0 &&
      r(1).getAs[Double]("bear_power") == 11.0)
  }

  test("forceIndex: exact product terms and the seeded EMA fold") {
    import spark.implicits._
    val candles = Seq(
      ("F", ts(T0), 10.0, 5.0),
      ("F", ts(T0 + 3600), 12.0, 10.0),
      ("F", ts(T0 + 7200), 11.0, 4.0)
    ).toDF("symbol", "bucket_ts", "close", "volume")
    val r = Analytics.forceIndex(candles).orderBy("bucket_ts").collect()
    assert(r.length == 2, "defined from the second bar")
    // fi = 2*10 = 20 (seed); fi = -1*4 = -4 -> ema = (2*(-4) + 12*20)/14
    assert(r(0).getAs[Double]("force_index") == 20.0 &&
      r(0).getAs[Double]("force_ema") == 20.0)
    assert(r(1).getAs[Double]("force_index") == -4.0)
    val exp = BigDecimal((2.0 / 14.0) * -4.0 + (1.0 - 2.0 / 14.0) * 20.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(1).getAs[Double]("force_ema") == exp, r(1).toString)
  }

  test("massIndex: degenerate n=1 pins ratio 1 sums; zero ranges drop") {
    import spark.implicits._
    val candles = Seq(
      ("M", ts(T0), 12.0, 10.0),
      ("M", ts(T0 + 3600), 15.0, 11.0),
      ("M", ts(T0 + 7200), 14.0, 14.0), // zero range: ratio undefined, drops
      ("M", ts(T0 + 10800), 16.0, 13.0)
    ).toDF("symbol", "bucket_ts", "high", "low")
    // n=1: e1 = e2 = range each bar -> ratio 1 where range != 0; span=2
    // windows run over the SURVIVING rows (1,2,4): sums 2.0 at rows 2, 4
    val r = Analytics.massIndex(candles, n = 1, span = 2)
      .orderBy("bucket_ts").collect()
    assert(r.map(_.getAs[Double]("mass_index")).toSeq == Seq(2.0, 2.0),
      r.mkString(","))
  }

  test("vwma: hand frame and the zero-volume null guard") {
    import spark.implicits._
    val candles = Seq(("V", ts(T0), 10.0, 1.0), ("V", ts(T0 + 3600), 20.0, 3.0))
      .toDF("symbol", "bucket_ts", "close", "volume")
    val r = Analytics.vwma(candles, n = 2).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Double]("vwma") == (10.0 + 60.0) / 4.0)
    val zero = Seq(("Z", ts(T0), 10.0, 0.0), ("Z", ts(T0 + 3600), 20.0, 0.0))
      .toDF("symbol", "bucket_ts", "close", "volume")
    val z = Analytics.vwma(zero, n = 2).collect().head
    assert(z.isNullAt(z.fieldIndex("vwma")))
  }

  test("ultimateOsc: constant-pressure bars blend to a flat 66.67 reading") {
    import spark.implicits._
    // every bar: bp = 1, tr = 1.5 -> each horizon's average is 2/3, and
    // the 4:2:1 blend of equal averages is that same average
    val candles = Seq(
      ("U", ts(T0), 10.0, 9.0, 9.5),
      ("U", ts(T0 + 3600), 11.0, 10.0, 10.5),
      ("U", ts(T0 + 7200), 12.0, 11.0, 11.5),
      ("U", ts(T0 + 10800), 13.0, 12.0, 12.5)
    ).toDF("symbol", "bucket_ts", "high", "low", "close")
    val r = Analytics.ultimateOsc(candles, n1 = 1, n2 = 2, n3 = 3).collect()
    assert(r.length == 1, "only the 4th bar has a full 3-frame")
    assert(r.head.getAs[Double]("ultimate_osc") == 66.666667, r.head.toString)
  }

  test("coppock: flat prices read exactly zero once the deepest lag exists") {
    import spark.implicits._
    val candles = (1 to 30).map(i => ("C", ts(T0 + i * 3600), 100.0))
      .toDF("symbol", "bucket_ts", "close")
    val r = Analytics.coppock(candles).collect()
    // s defined from bar 15 (lag 14); the 10-lag WMA gate from bar 24
    assert(r.length == 7, s"${r.length}")
    assert(r.forall(_.getAs[Double]("coppock") == 0.0), r.mkString(","))
  }

  test("stochRsi: hand normalization and the flat-RSI null guard") {
    import spark.implicits._
    // closes 10,11,12,11,12 with n=2: rsi = 100, 50, 50 from bar 3
    val candles = Seq(10.0, 11.0, 12.0, 11.0, 12.0).zipWithIndex.map {
      case (c, i) => ("S", ts(T0 + i * 3600), c)
    }.toDF("symbol", "bucket_ts", "close")
    val r = Analytics.stochRsi(candles, n = 2, n2 = 2).orderBy("bucket_ts").collect()
    assert(r.length == 2)
    // frame (100, 50): (50-50)/(100-50) = 0; frame (50, 50): flat -> null
    assert(r(0).getAs[Double]("stoch_rsi") == 0.0, r(0).toString)
    assert(r(1).isNullAt(r(1).fieldIndex("stoch_rsi")), r(1).toString)
  }

  test("emv: hand integer-exact term and the zero-volume drop") {
    import spark.implicits._
    // b2: A = (14+11-12-10) = 3, R = 3, V = 5 -> term = 50*300*300/500
    // in cent algebra = 9000.0 EMV
    val candles = Seq(
      ("E", ts(T0), 12.0, 10.0, 3.0),
      ("E", ts(T0 + 3600), 14.0, 11.0, 5.0),
      ("E", ts(T0 + 7200), 15.0, 12.0, 0.0) // zero volume: no observation
    ).toDF("symbol", "bucket_ts", "high", "low", "volume")
    val r = Analytics.emv(candles, n = 1).orderBy("bucket_ts").collect()
    assert(r.length == 1, "zero-volume bar contributes no term")
    assert(r.head.getAs[Double]("emv") == 9000.0, r.head.toString)
  }

  test("chandelierExit: hand stops off the frame extremes and simple ATR") {
    import spark.implicits._
    val candles = Seq(
      ("C", ts(T0), 10.0, 9.0, 9.5),
      ("C", ts(T0 + 3600), 12.0, 10.0, 11.0),
      ("C", ts(T0 + 7200), 13.0, 11.0, 12.0)
    ).toDF("symbol", "bucket_ts", "high", "low", "close")
    // frame = bars 2,3 (bar 1 has no prev): tr2 = max(2,|12-9.5|,|10-9.5|)
    // = 2.5; tr3 = max(2, 2, 0) = 2; atr = 2.25; hh = 13, ll = 10
    val r = Analytics.chandelierExit(candles, n = 2, mult = 3.0).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Double]("long_stop") == 13.0 - 3.0 * 2.25)
    assert(r.head.getAs[Double]("short_stop") == 10.0 + 3.0 * 2.25)
  }

  test("kama: per-symbol seed reset and flat-window ER convention") {
    import spark.implicits._
    val candles = (Seq.fill(5)(20.0).zipWithIndex.map { case (c, i) =>
      ("F", ts(T0 + i * 3600), c)
    } ++ Seq(30.0, 31.0, 32.0, 33.0, 34.0).zipWithIndex.map { case (c, i) =>
      ("T", ts(T0 + i * 3600), c)
    }).toDF("symbol", "bucket_ts", "close")
    val bySym = Analytics.kama(candles, n = 3).collect()
      .groupBy(_.getAs[String]("symbol"))
    // flat symbol: noise 0 -> ER 0 by convention, kama pinned at the seed
    assert(bySym("F").forall(r => r.getAs[Double]("er") == 0.0 &&
      r.getAs[Double]("kama") == 20.0))
    // clean trend: ER 1 everywhere, each symbol seeds at ITS OWN 4th close
    assert(bySym("T").forall(r => r.getAs[Double]("er") == 1.0))
    assert(bySym("T").map(r => r.getAs[Double]("kama")).min == 33.0)
  }

  test("fractals: strict swing points, edge bars and ties never emit") {
    import spark.implicits._
    val candles = Seq((10.0, 5.0), (11.0, 6.0), (15.0, 3.0), (12.0, 7.0),
      (11.0, 8.0)).zipWithIndex.map { case ((h, l), i) =>
      ("F", ts(T0 + i * 3600), h, l)
    }.toDF("symbol", "bucket_ts", "high", "low")
    val r = Analytics.fractals(candles).collect()
    // only the center bar qualifies — and it is BOTH an up and a down
    // fractal (high spike + low spike on the same bar)
    assert(r.length == 1, r.mkString(","))
    assert(r.head.getAs[java.sql.Timestamp]("bucket_ts") == ts(T0 + 2 * 3600))
    assert(r.head.getAs[Boolean]("up_fractal") &&
      r.head.getAs[Boolean]("down_fractal"))
    // a tied high is NOT a fractal (strict comparisons)
    val tied = Seq((10.0, 5.0), (15.0, 5.0), (15.0, 5.0), (12.0, 5.0),
      (11.0, 5.0)).zipWithIndex.map { case ((h, l), i) =>
      ("T", ts(T0 + i * 3600), h, l)
    }.toDF("symbol", "bucket_ts", "high", "low")
    assert(Analytics.fractals(tied).collect().isEmpty)
  }

  test("awesome_osc: hand frame at n1=2, n2=3") {
    import spark.implicits._
    val candles = Seq((2.0, 0.0), (4.0, 2.0), (6.0, 4.0)).zipWithIndex.map {
      case ((h, l), i) => ("A", ts(T0 + i * 3600), h, l)
    }.toDF("symbol", "bucket_ts", "high", "low")
    val r = Analytics.awesomeOsc(candles, n1 = 2, n2 = 3).collect()
    // mids 1, 3, 5: SMA2 = 4, SMA3 = 3 -> AO = 1; only the full 3-frame
    assert(r.length == 1)
    assert(r.head.getAs[Double]("awesome_osc") == 1.0)
  }

  test("kst: flat series blends to exactly zero with the lag-44 gate") {
    import spark.implicits._
    val candles = (0 until 50).map(i => ("K", ts(T0 + i * 3600), 25.0))
      .toDF("symbol", "bucket_ts", "close")
    val r = Analytics.kst(candles).collect()
    // gate: defined where lag-44 exists -> 50 - 44 = 6 rows, all zero ROCs
    assert(r.length == 6, r.length.toString)
    assert(r.forall(_.getAs[Double]("kst") == 0.0), r.mkString(","))
  }

  test("rvi: constant-conviction hand value, signal over surviving rows") {
    import spark.implicits._
    // co = 1, hl = 2 every bar: wn = 6, wd = 12 once lag-3 exists
    val candles = (0 until 8).map(i =>
      ("R", ts(T0 + i * 3600), 10.0, 11.0, 11.0, 9.0))
      .toDF("symbol", "bucket_ts", "open", "close", "high", "low")
    val r = Analytics.rvi(candles, n = 2).orderBy("bucket_ts").collect()
    // surviving rows start at bar 3 (lag-3 gate); full 2-frames from bar 4
    assert(r.length == 4, r.mkString(","))
    assert(r.forall(_.getAs[Double]("rvi") == 0.5), r.mkString(","))
    // signal needs three prior SURVIVING rvi rows: only the last row
    val defined = r.filter(!_.isNullAt(r.head.fieldIndex("rvi_signal")))
    assert(defined.length == 1 &&
      defined.head.getAs[Double]("rvi_signal") == 0.5, r.mkString(","))
    // zero-range bars null the ratio
    val flat = (0 until 8).map(i =>
      ("Z", ts(T0 + i * 3600), 10.0, 10.0, 10.0, 10.0))
      .toDF("symbol", "bucket_ts", "open", "close", "high", "low")
    val z = Analytics.rvi(flat, n = 2).collect()
    assert(z.nonEmpty && z.forall(_.isNullAt(z.head.fieldIndex("rvi"))))
  }

  test("tsi: hand-folded four-state trajectory; flat series nulls") {
    import spark.implicits._
    val closes = Seq(10.0, 11.0, 13.0, 12.0)
    val candles = closes.zipWithIndex.map { case (c, i) =>
      ("T", ts(T0 + i * 3600), c)
    }.toDF("symbol", "bucket_ts", "close")
    val r = Analytics.tsi(candles).orderBy("bucket_ts").collect()
    assert(r.length == 3) // emission from bar 2
    // replay the fold: m = +1, +2, -1
    val a1 = 2.0 / 26.0; val b1 = 1.0 - a1
    val a2 = 2.0 / 14.0; val b2 = 1.0 - a2
    var emi = 1.0; var emo = 1.0; var eai = 1.0; var eao = 1.0
    val rd = (v: Double) => BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0).getAs[Double]("tsi") == 100.0) // seed: m/|m| = 1
    Seq(2.0, -1.0).zip(r.drop(1)).foreach { case (m, row) =>
      emi = a1 * m + b1 * emi; emo = a2 * emi + b2 * emo
      eai = a1 * math.abs(m) + b1 * eai; eao = a2 * eai + b2 * eao
      assert(row.getAs[Double]("tsi") == rd(100.0 * (emo / eao)), row.toString)
    }
    val flat = (0 until 5).map(i => ("F", ts(T0 + i * 3600), 7.0))
      .toDF("symbol", "bucket_ts", "close")
    val f = Analytics.tsi(flat).collect()
    assert(f.length == 4 && f.forall(_.isNullAt(f.head.fieldIndex("tsi"))))
  }

  test("fisher_transform: hand recursion at n=2, signal = previous fisher") {
    import spark.implicits._
    // mids 1, 3, 2 (high = low = 2*mid/2 trick: set high=low=mid*2-mid)
    val candles = Seq(1.0, 3.0, 2.0).zipWithIndex.map { case (m, i) =>
      ("F", ts(T0 + i * 3600), m, m)
    }.toDF("symbol", "bucket_ts", "high", "low")
    val r = Analytics.fisherTransform(candles, n = 2).orderBy("bucket_ts")
      .collect()
    assert(r.length == 2) // full 2-frames from bar 2
    val rd = (v: Double) => BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // bar 2: frame {1,3}, mid 3 -> x = 1; v = .33; fish1 = .5 ln(1.33/.67)
    val v1 = 0.33 * 1.0 + 0.67 * 0.0
    val fish1 = 0.5 * math.log((1.0 + v1) / (1.0 - v1)) + 0.5 * 0.0
    assert(r(0).getAs[Double]("fisher") == rd(fish1), r(0).toString)
    assert(r(0).isNullAt(r(0).fieldIndex("fisher_signal")))
    // bar 3: frame {3,2}, mid 2 -> x = -1; v = .33*(-1) + .67*v1
    val v2 = 0.33 * -1.0 + 0.67 * v1
    val fish2 = 0.5 * math.log((1.0 + v2) / (1.0 - v2)) + 0.5 * fish1
    assert(r(1).getAs[Double]("fisher") == rd(fish2), r(1).toString)
    assert(r(1).getAs[Double]("fisher_signal") == rd(fish1))
    // flat series: x = 0 by the zero-range convention -> fisher 0
    val flat = (0 until 4).map(i => ("Z", ts(T0 + i * 3600), 5.0, 5.0))
      .toDF("symbol", "bucket_ts", "high", "low")
    val z = Analytics.fisherTransform(flat, n = 2).collect()
    assert(z.length == 3 && z.forall(_.getAs[Double]("fisher") == 0.0))
  }

  test("alligator: SMMA folds + forward displacement rings, per-symbol reset") {
    import spark.implicits._
    val closes = Seq(10.0, 12.0, 14.0, 16.0, 18.0)
    val candles = (closes.zipWithIndex.map { case (c, i) =>
      ("A", ts(T0 + i * 3600), c)
    } ++ Seq(("B", ts(T0), 50.0), ("B", ts(T0 + 3600), 60.0),
      ("B", ts(T0 + 2 * 3600), 70.0), ("B", ts(T0 + 3 * 3600), 80.0)))
      .toDF("symbol", "bucket_ts", "close")
    val bySym = Analytics.alligator(candles).collect()
      .groupBy(_.getAs[String]("symbol"))
      .map { case (s, rs) => s -> rs.sortBy(_.getAs[java.sql.Timestamp]("bucket_ts")) }
    val a = bySym("A")
    // jaw (shift 8) and teeth (shift 5) undefined inside 5 bars
    assert(a.forall(r => r.isNullAt(r.fieldIndex("jaw")) &&
      r.isNullAt(r.fieldIndex("teeth"))))
    // lips (SMMA5 shifted 3): bar 3 shows the seed, bar 4 the first fold
    assert(a.take(3).forall(_.isNullAt(a.head.fieldIndex("lips"))))
    assert(a(3).getAs[Double]("lips") == 10.0)
    assert(a(4).getAs[Double]("lips") == 0.2 * 12.0 + 0.8 * 10.0)
    // symbol B: its own seed, no bleed from A
    val b = bySym("B")
    assert(b(3).getAs[Double]("lips") == 50.0)
  }
}
