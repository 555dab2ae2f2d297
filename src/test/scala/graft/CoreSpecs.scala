package graft

import graft.core.Timeframe
import graft.ohlcv.{Analytics, Candles}
import graft.operators.AsofJoin
import org.apache.spark.sql.functions._
class TimeframeSpec extends SparkSpec {
  test("parses the reference grammar \\d+[smhdwMy]") {
    assert(Timeframe.parse("1m") == Timeframe(1, 'm'))
    assert(Timeframe.parse("15m").micros == 15L * 60 * 1000000)
    assert(Timeframe.parse("4h").micros == 4L * 3600 * 1000000)
    assert(Timeframe.parse("1w").micros == 7L * 86400 * 1000000)
    assert(Timeframe.parse("1M").isCalendar && Timeframe.parse("1y").isCalendar)
    intercept[IllegalArgumentException](Timeframe.parse("m1"))
    intercept[IllegalArgumentException](Timeframe.parse("1x"))
    intercept[IllegalArgumentException](Timeframe.parse(""))
    intercept[IllegalArgumentException](Timeframe.parse("0m"))
  }

  test("n-month calendar buckets anchor at epoch months") {
    import spark.implicits._
    import java.sql.Timestamp
    val tf3M = Timeframe.parse("3M")
    val tf2y = Timeframe.parse("2y")
    val r = Seq(Timestamp.valueOf("2024-05-15 10:30:00"))
      .toDF("t")
      .select(tf3M.bucketStart(col("t")).as("b3m"), tf3M.bucketEnd(col("t")).as("e3m"),
        tf2y.bucketStart(col("t")).as("b2y"))
      .head()
    assert(r.getTimestamp(0) == Timestamp.valueOf("2024-04-01 00:00:00"))
    assert(r.getTimestamp(1) == Timestamp.valueOf("2024-07-01 00:00:00"))
    assert(r.getTimestamp(2) == Timestamp.valueOf("2024-01-01 00:00:00"))
  }

  test("bucketStart is a width-multiple lower bound (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1)
    val samples = Seq.fill(200)(
      (math.abs(rnd.nextLong()) % 4102444800L, Seq("1m", "5m", "1h", "1d")(rnd.nextInt(4))))
    val df = samples.map { case (sec, s) => (ts(sec), s) }.toDF("t", "tf")
    Seq("1m", "5m", "1h", "1d").foreach { s =>
      val tf = Timeframe.parse(s)
      val bad = df.where(col("tf") === s)
        .select(unix_micros(tf.bucketStart(col("t"))).as("b"), unix_micros(col("t")).as("u"))
        .where(col("b") % tf.micros =!= 0 || col("b") > col("u") ||
          col("u") >= col("b") + tf.micros)
        .count()
      assert(bad == 0, s"bucketStart violated invariants for $s")
    }
  }
}

class CandlesSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def mkTrades(rows: (String, Long, Double, Double)*) = {
    import spark.implicits._
    rows.map { case (s, t, p, q) => (s, ts(t), p, q) }
      .toDF("symbol", "ts", "price", "qty")
  }

  test("fromTrades computes first/max/min/last/sum per bucket") {
    val trades = mkTrades(
      ("BTC", T0 + 10, 100.0, 1.0), ("BTC", T0 + 20, 105.0, 2.0),
      ("BTC", T0 + 50, 95.0, 1.0), ("BTC", T0 + 70, 99.0, 3.0),
      ("ETH", T0 + 5, 10.0, 5.0))
    val out = Candles.fromTrades(trades, Timeframe.parse("1m"))
      .sort("symbol", "bucket_ts").collect()
    assert(out.length == 3)
    val btc0 = out(0)
    assert(btc0.getAs[String]("symbol") == "BTC")
    assert(btc0.getAs[Double]("open") == 100.0)
    assert(btc0.getAs[Double]("high") == 105.0)
    assert(btc0.getAs[Double]("low") == 95.0)
    assert(btc0.getAs[Double]("close") == 95.0)
    assert(btc0.getAs[Double]("volume") == 4.0)
    assert(btc0.getAs[Long]("trades") == 3L)
    assert(out(1).getAs[Double]("open") == 99.0) // second BTC bucket
  }

  test("mergeable candles: merge of arbitrary splits == full recompute") {
    val trades = graft.core.Tables.trades(spark, Sf0001)
    val tf = Timeframe.parse("1h")
    // adversarial split: interleaved by row hash, cutting through buckets
    val h = pmod(hash(col("ts")), lit(2))
    val merged = Candles.merge(
        Candles.fromTradesMergeable(trades.where(h === 0), tf),
        Candles.fromTradesMergeable(trades.where(h === 1), tf))
      .drop("first_ts", "last_ts")
      .collect().map(_.toSeq).toSet
    val full = Candles.fromTrades(trades, tf).collect().map(_.toSeq).toSet
    assert(merged == full)
  }

  test("cascade resample equals direct aggregation from trades") {
    val trades = graft.core.Tables.trades(spark, Sf0001)
    val direct = Candles.fromTrades(trades, Timeframe.parse("1h"))
      .collect().map(_.toSeq).toSet
    val cascade = Candles.resample(
      Candles.fromTrades(trades, Timeframe.parse("1m")), Timeframe.parse("1h"))
      .collect().map(_.toSeq).toSet
    assert(cascade == direct)
  }

  test("upsert: later batch wins per (symbol, bucket)") {
    val c1 = Candles.fromTrades(mkTrades(
      ("BTC", T0 + 10, 100.0, 1.0), ("BTC", T0 + 70, 101.0, 1.0)), Timeframe.parse("1m"))
    val c2 = Candles.fromTrades(mkTrades(
      ("BTC", T0 + 70, 200.0, 2.0)), Timeframe.parse("1m"))
    val out = Candles.upsert(c1, c2).sort("bucket_ts").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("open") == 100.0) // untouched bucket kept
    assert(out(1).getAs[Double]("open") == 200.0) // overlapping bucket replaced
  }

  test("dropIncomplete keeps only buckets whose end <= now") {
    val c = Candles.fromTrades(mkTrades(
      ("BTC", T0 + 10, 1.0, 1.0), ("BTC", T0 + 70, 2.0, 1.0)), Timeframe.parse("1m"))
    import spark.implicits._
    val kept = Candles.dropIncomplete(c, Timeframe.parse("1m"),
      lit(ts(T0 + 90)).cast("timestamp")).collect()
    assert(kept.length == 1) // second bucket [T0+60, T0+120) incomplete at T0+90
  }

  test("empty inputs produce empty outputs, not errors") {
    val empty = mkTrades().where(lit(false))
    assert(Candles.fromTrades(empty, Timeframe.parse("1m")).count() == 0)
    assert(Candles.gaps(Candles.fromTrades(empty, Timeframe.parse("1m")),
      Timeframe.parse("1m")).count() == 0)
    assert(Analytics.ema(Candles.fromTrades(empty, Timeframe.parse("1m")), 5).count() == 0)
  }

  test("gaps finds missing buckets") {
    val c = Candles.fromTrades(mkTrades(
      ("BTC", T0 + 10, 1.0, 1.0), ("BTC", T0 + 200, 2.0, 1.0)), Timeframe.parse("1m"))
    val g = Candles.gaps(c, Timeframe.parse("1m")).collect()
    assert(g.length == 1)
    assert(g(0).getAs[Long]("missing") == 2L) // buckets at +60 and +120 missing
  }
}

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val candles = Candles.fromTrades(
    Seq(("BTC", ts(T0 + 10), 100.0, 2.0), ("BTC", ts(T0 + 3610), 110.0, 1.0),
      ("BTC", ts(T0 + 7210), 99.0, 1.0))
      .toDF("symbol", "ts", "price", "qty"), Timeframe.parse("1h"))

  test("sma averages over the trailing frame") {
    val out = Analytics.sma(candles, 2).sort("bucket_ts").collect()
    assert(out(0).getAs[Double]("sma") == 100.0)
    assert(out(1).getAs[Double]("sma") == 105.0)
    assert(out(2).getAs[Double]("sma") == 104.5)
  }

  test("ema follows the recurrence") {
    val out = Analytics.ema(candles, 2).sort("bucket_ts").collect()
    val a = 2.0 / 3.0
    assert(out(0).getAs[Double]("ema") == 100.0)
    assert(math.abs(out(1).getAs[Double]("ema") - (a * 110 + (1 - a) * 100.0)) < 1e-12)
  }

  test("linear gap fill interpolates between surrounding real closes") {
    val sparse = Candles.fromTrades(
      Seq(("BTC", ts(T0 + 10), 100.0, 1.0), ("BTC", ts(T0 + 3 * 3600 + 10), 130.0, 1.0))
        .toDF("symbol", "ts", "price", "qty"), Timeframe.parse("1h"))
    val out = Analytics.gapFillLinear(sparse, 3600000000L).sort("bucket_ts")
      .collect().map(r => (r.getAs[Long]("is_gap"), r.getAs[Double]("close_interp")))
    // closes 100 @ h0 and 130 @ h3 → gaps at h1/h2 interpolate 110/120
    assert(out.toSeq == Seq((0L, 100.0), (1L, 110.0), (1L, 120.0), (0L, 130.0)))
  }

  test("drawdown curve tracks running peak and underwater state") {
    val out = Analytics.drawdownCurve(candles).sort("bucket_ts").collect()
    assert(out.map(_.getAs[Double]("peak")).toSeq == Seq(100.0, 110.0, 110.0))
    assert(out.map(_.getAs[Double]("drawdown")).toSeq == Seq(0.0, 0.0, -0.1))
    assert(out.map(_.getAs[Boolean]("underwater")).toSeq == Seq(false, false, true))
  }

  test("volume profile bins volume into per-symbol price bands") {
    import spark.implicits._
    // prices 0..19 with qty 1 → one trade per band at 20 bands
    val t = (0 until 20).map(i => ("BTC", ts(T0 + i), i.toDouble, 1.0))
      .toDF("symbol", "ts", "price", "qty")
    val out = Analytics.volumeProfile(t).collect()
    assert(out.length == 20 && out.forall(_.getAs[Long]("n_trades") == 1L))
    assert(out.map(_.getAs[Long]("band")).sorted.toSeq == (0L until 20L))
    // degenerate single-price symbol → one band 0
    val flat = Analytics.volumeProfile(
      Seq(("ETH", ts(T0), 5.0, 2.0), ("ETH", ts(T0 + 1), 5.0, 3.0))
        .toDF("symbol", "ts", "price", "qty")).collect()
    assert(flat.length == 1 && flat.head.getAs[Long]("band") == 0L &&
      flat.head.getAs[Double]("volume") == 5.0)
  }

  test("candle validator counts envelope, grid, and gap violations") {
    import spark.implicits._
    val w = 3600000000L
    val frames = Seq(
      // A: valid but with a 2-bucket hole between h0 and h3
      ("A", ts(T0), 10.0, 12.0, 9.0, 11.0, 5.0, 1L),
      ("A", ts(T0 + 3 * 3600), 11.0, 13.0, 10.0, 12.0, 5.0, 1L),
      // B: off the hourly grid
      ("B", ts(T0 + 1800), 10.0, 12.0, 9.0, 11.0, 5.0, 1L),
      // C: broken OHLC envelope + non-positive volume
      ("C", ts(T0), 10.0, 9.0, 10.5, 10.0, -1.0, 1L))
      .toDF("symbol", "bucket_ts", "open", "high", "low", "close", "volume", "trades")
    val out = Analytics.validate(frames, w).collect()
      .map(r => r.getAs[String]("symbol") -> r).toMap
    assert(out("A").getAs[Long]("n_missing_buckets") == 2L &&
      out("A").getAs[Long]("n_ohlc_violations") == 0L)
    assert(out("B").getAs[Long]("n_off_grid") == 1L)
    assert(out("C").getAs[Long]("n_ohlc_violations") == 1L &&
      out("C").getAs[Long]("n_nonpos_volume") == 1L &&
      out("C").getAs[Long]("n_missing_buckets") == 0L)
  }

  test("return moments match the hand-computed log-return statistics") {
    // closes 100, 110, 99 → log returns ln(1.1), ln(0.9)
    val out = Analytics.returnMoments(candles).collect()
    assert(out.length == 1)
    val r = out.head
    val r1 = BigDecimal(math.log(1.1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r2 = BigDecimal(math.log(0.9)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val m = (r1 + r2) / 2
    val v = (r1 * r1 + r2 * r2) / 2 - m * m
    assert(r.getAs[Long]("n") == 2L)
    assert(math.abs(r.getAs[Double]("mean_ret") - m) < 1e-5)
    assert(math.abs(r.getAs[Double]("stddev_ret") - math.sqrt(v)) < 1e-5)
  }

  test("rolling volatility is the sample stddev of trailing returns") {
    // closes 100, 110, 99 → returns 0.1, -0.1; n=2 frames: single full
    // frame at the last bucket with stddev_samp(0.1, -0.1) = 0.1*sqrt(2)
    val out = Analytics.rollingVol(candles, 2).collect()
    assert(out.length == 1)
    assert(math.abs(out.head.getAs[Double]("vol") -
      BigDecimal(0.1 * math.sqrt(2.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
    // constant returns → zero volatility
    val geo = Candles.fromTrades(
      Seq(("ETH", ts(T0 + 10), 100.0, 1.0), ("ETH", ts(T0 + 3610), 110.0, 1.0),
        ("ETH", ts(T0 + 7210), 121.0, 1.0))
        .toDF("symbol", "ts", "price", "qty"), Timeframe.parse("1h"))
    val flat = Analytics.rollingVol(geo, 2).collect()
    assert(flat.forall(_.getAs[Double]("vol") == 0.0))
  }

  test("returns are close-over-close") {
    val out = Analytics.returns(candles).sort("bucket_ts").collect()
    assert(out.length == 2)
    assert(math.abs(out(0).getAs[Double]("ret") - 0.1) < 1e-12)
  }

  test("candle patterns flag doji and engulfing bars") {
    val c = Seq(
      // BTC: red bar then a bullish engulfing bar
      ("BTC", ts(T0), 10.0, 10.5, 8.5, 9.0),
      ("BTC", ts(T0 + 3600), 8.9, 10.5, 8.5, 10.1),
      // ETH: a doji (tiny body, wide range)
      ("ETH", ts(T0), 10.0, 11.0, 9.0, 10.01),
      // ETH: plain bar, no pattern
      ("ETH", ts(T0 + 3600), 10.0, 12.0, 9.9, 11.9))
      .toDF("symbol", "ts", "open", "high", "low", "close")
      .withColumn("bucket_ts", col("ts")).drop("ts")
    val out = Analytics.candlePatterns(c).collect()
      .map(r => (r.getAs[String]("symbol"), r.getAs[Double]("close")) -> r).toMap
    assert(out.size == 4) // every candle emitted with its flags
    assert(out(("BTC", 10.1)).getAs[Boolean]("bull_engulf"))
    assert(out(("ETH", 10.01)).getAs[Boolean]("doji"))
    val plain = out(("ETH", 11.9))
    assert(!plain.getAs[Boolean]("doji") && !plain.getAs[Boolean]("bull_engulf") &&
      !plain.getAs[Boolean]("bear_engulf"))
    // a first candle's engulfing flag is null only when its own direction
    // doesn't already falsify the conjunction (3VL: null AND false = false)
    val first = out(("BTC", 9.0)) // red: close < open, so bull_engulf = false
    assert(!first.getAs[Boolean]("bull_engulf"))
    assert(first.isNullAt(first.fieldIndex("bear_engulf")))
  }

  test("volume anomaly flags only buckets beyond z sample deviations") {
    // volumes 1,1,1,1,10: mean 2.8, sd 4.02...; only the 10 passes z=1.5
    val c = Candles.fromTrades(
      (0 to 3).map(i => ("BTC", ts(T0 + 10 + 3600 * i), 100.0, 1.0))
        .:+ (("BTC", ts(T0 + 10 + 3600 * 4), 100.0, 10.0))
      .toDF("symbol", "ts", "price", "qty"), Timeframe.parse("1h"))
    val out = Analytics.volumeAnomaly(c, 1.5).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Double]("volume") == 10.0)
    assert(out(0).getAs[Double]("zscore") > 1.5)
    // constant volumes: variance 0 -> nothing flagged, nothing thrown
    val flat = Candles.fromTrades(
      (0 to 3).map(i => ("BTC", ts(T0 + 10 + 3600 * i), 100.0, 2.0))
        .toDF("symbol", "ts", "price", "qty"), Timeframe.parse("1h"))
    assert(Analytics.volumeAnomaly(flat, 1.5).count() == 0)
  }
}

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("joins each left row to latest right at-or-before, per key") {
    val left = Seq((1L, ts(T0 + 100), "p1"), (1L, ts(T0 + 200), "p2"),
      (2L, ts(T0 + 100), "p3"), (3L, ts(T0 + 100), "p4"))
      .toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts(T0 + 50), 10.0), (1L, ts(T0 + 150), 20.0),
      (1L, ts(T0 + 200), 30.0), (2L, ts(T0 + 101), 40.0))
      .toDF("user_id", "ts", "v")
    val out = AsofJoin.join(left, right, "user_id", "ts", "ts")
      .sort("user_id", "ts").collect()
    // user 1 @100 -> 10.0; user 1 @200 -> 30.0 (equal ts visible);
    // user 2 @100 -> right @101 is later: dropped; user 3: no right: dropped
    assert(out.length == 2)
    assert(out(0).getAs[String]("tag") == "p1" && out(0).getAs[Double]("r_v") == 10.0)
    assert(out(1).getAs[String]("tag") == "p2" && out(1).getAs[Double]("r_v") == 30.0)
  }

  test("duplicate right timestamps resolve deterministically (struct-greatest wins)") {
    val left = Seq((1L, ts(T0 + 100), "p1")).toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts(T0 + 50), 10.0), (1L, ts(T0 + 50), 30.0),
      (1L, ts(T0 + 50), 20.0)).toDF("user_id", "ts", "v")
    // whatever the physical input order, the tied pick must be stable
    (1 to 3).foreach { p =>
      val out = AsofJoin.join(left, right.repartition(p), "user_id", "ts", "ts")
        .collect()
      assert(out.length == 1 && out.head.getAs[Double]("r_v") == 30.0)
    }
  }

  test("native AsofJoinExec matches the composed formulation (incl. self-join inputs)") {
    val e = graft.core.Tables.events(spark, Sf0001)
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val c = e.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "user_id", "ts", "value",
        "click_user_id", "click_ts", "click_value")
        .collect().map(_.toSeq).toSet
    val native = AsofJoin.joinNative(p, c, "user_id", "ts", "ts", "click_")
    assert(native.queryExecution.executedPlan.toString.contains("AsofJoin"),
      native.queryExecution.executedPlan.toString)
    assert(rows(native) == rows(AsofJoin.join(p, c, "user_id", "ts", "ts", "click_")))
    // tie determinism mirrors the composed form: struct-greatest right wins
    import spark.implicits._
    val l1 = Seq((1L, ts(T0 + 100), "p1")).toDF("user_id", "ts", "tag")
    val r1 = Seq((1L, ts(T0 + 50), 10.0), (1L, ts(T0 + 50), 30.0))
      .toDF("user_id", "ts", "v")
    (1 to 3).foreach { parts =>
      val out = AsofJoin.joinNative(l1, r1.repartition(parts), "user_id", "ts", "ts")
        .collect()
      assert(out.length == 1 && out.head.getAs[Double]("r_v") == 30.0)
    }
  }

  test("native AsofJoinExec left-outer preserves unmatched lefts with null rights") {
    val e = graft.core.Tables.events(spark, Sf0001)
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val c = e.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    val inner = AsofJoin.joinNative(p, c, "user_id", "ts", "ts", "click_")
    val outer = AsofJoin.joinNative(p, c, "user_id", "ts", "ts", "click_",
      leftOuter = true)
    assert(outer.queryExecution.executedPlan.toString.contains("AsofJoin"))
    assert(outer.count() == p.count()) // every left row survives
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    // matched rows are exactly the inner join's rows
    assert(rows(outer.where(col("click_ts").isNotNull)) == rows(inner))
    // unmatched rows carry nulls across ALL right columns
    val un = outer.where(col("click_ts").isNull)
      .select("click_user_id", "click_value").collect()
    assert(un.nonEmpty && un.forall(r => r.isNullAt(0) && r.isNullAt(1)))
    // a null-keyed left row is dropped by inner but preserved by left-outer
    import spark.implicits._
    val l1 = Seq((Some(1L), ts(T0 + 100), "p1"), (Option.empty[Long], ts(T0 + 100), "pnull"))
      .toDF("user_id", "ts", "tag")
    val r1 = Seq((1L, ts(T0 + 50), 10.0)).toDF("user_id", "ts", "v")
    val out = AsofJoin.joinNative(l1, r1, "user_id", "ts", "ts", leftOuter = true)
    assert(out.count() == 2)
    val nullRow = out.where(col("tag") === "pnull").collect().head
    assert(nullRow.isNullAt(nullRow.fieldIndex("r_v")))
  }

  test("forward asof matches the earliest right at-or-after, sharing rights across lefts") {
    import spark.implicits._
    // two lefts both before the same right: PEEK (not consume) means both
    // match it; a left after every right gets no match (inner) / nulls (outer)
    val l = Seq((1L, ts(T0 + 10), "a"), (1L, ts(T0 + 20), "b"), (1L, ts(T0 + 99), "z"))
      .toDF("user_id", "ts", "tag")
    val r = Seq((1L, ts(T0 + 20), 5.0), (1L, ts(T0 + 50), 7.0))
      .toDF("user_id", "ts", "v")
    (1 to 3).foreach { parts =>
      val out = AsofJoin.joinNative(l, r.repartition(parts), "user_id", "ts", "ts",
        forward = true).collect()
        .map(x => x.getAs[String]("tag") -> x.getAs[Double]("r_v")).toMap
      assert(out == Map("a" -> 5.0, "b" -> 5.0)) // at-or-after: ts 20 matches ts 20
    }
    val outer = AsofJoin.joinNative(l, r, "user_id", "ts", "ts",
      leftOuter = true, forward = true).collect()
    assert(outer.length == 3)
    assert(outer.find(_.getAs[String]("tag") == "z").get.isNullAt(3))
    // cross-check against the composed truth on real data: min right ts
    // at-or-after per left via an aggregation
    val e = graft.core.Tables.events(spark, Sf0001)
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = e.where(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val expected = p.join(c, col("user_id") === col("cu") && col("cts") >= col("ts"))
      .groupBy(col("event_id")).agg(min(col("cts")).as("exp_ts"))
    val native = AsofJoin.joinNative(p, c.select(col("cu").as("user_id"),
      col("cts").as("ts")), "user_id", "ts", "ts", "c_", forward = true)
      .select(col("event_id"), col("c_ts"))
    val diff = native.join(expected, "event_id")
      .where(col("c_ts") =!= col("exp_ts")).count()
    assert(diff == 0 && native.count() == expected.count())
  }

  test("nearest asof picks the closer side, ties go backward") {
    import spark.implicits._
    // left at T0+30: back candidate ts 10 (dist 20), fwd ts 40 (dist 10) → fwd
    // left at T0+45: back 40 (5), fwd 100 (55) → back
    // left at T0+40: exact match → dist 0 backward wins
    // left at T0+200: only back exists; left at T0+5: only fwd exists
    val l = Seq((1L, ts(T0 + 30), "a"), (1L, ts(T0 + 45), "b"),
      (1L, ts(T0 + 40), "c"), (1L, ts(T0 + 200), "d"), (2L, ts(T0 + 5), "e"))
      .toDF("user_id", "ts", "tag")
    val r = Seq((1L, ts(T0 + 10), 1.0), (1L, ts(T0 + 40), 4.0),
      (1L, ts(T0 + 100), 10.0), (2L, ts(T0 + 8), 8.0))
      .toDF("user_id", "ts", "v")
    (1 to 3).foreach { parts =>
      val out = AsofJoin.joinNative(l, r.repartition(parts), "user_id", "ts", "ts",
        nearest = true).collect()
        .map(x => x.getAs[String]("tag") -> x.getAs[Double]("r_v")).toMap
      assert(out == Map("a" -> 4.0, "b" -> 4.0, "c" -> 4.0,
        "d" -> 10.0, "e" -> 8.0), s"parts=$parts")
    }
    // left-outer: a keyless left still emits (nulls)
    val l2 = Seq((9L, ts(T0), "lone")).toDF("user_id", "ts", "tag")
    val outer = AsofJoin.joinNative(l2, r, "user_id", "ts", "ts",
      leftOuter = true, nearest = true).collect()
    assert(outer.length == 1 && outer.head.isNullAt(4))
    // cross-check vs composed truth on real data: min |Δts| click per purchase
    val e = graft.core.Tables.events(spark, Sf0001)
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = e.where(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val expected = p.join(c, col("user_id") === col("cu"))
      .groupBy(col("event_id"))
      .agg(min(abs(unix_micros(col("cts")) - unix_micros(col("ts")))).as("exp_d"))
    val native = AsofJoin.joinNative(p, c.select(col("cu").as("user_id"),
      col("cts").as("ts")), "user_id", "ts", "ts", "c_", nearest = true)
      .select(col("event_id"),
        abs(unix_micros(col("c_ts")) - unix_micros(col("ts"))).as("got_d"))
    val diff = native.join(expected, "event_id")
      .where(col("got_d") =!= col("exp_d")).count()
    assert(diff == 0 && native.count() == expected.count())
  }

  test("null keys never match (SQL join semantics)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("user_id", LongType, nullable = true),
      StructField("ts", TimestampType, nullable = false),
      StructField("tag", StringType, nullable = false)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(null, ts(T0 + 100), "pnull"),
      org.apache.spark.sql.Row(1L: java.lang.Long, ts(T0 + 100), "p1"))
    val left = spark.createDataFrame(rows, schema)
    val right = spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(null, ts(T0 + 50), "rnull"),
      org.apache.spark.sql.Row(1L: java.lang.Long, ts(T0 + 50), "r1")), schema)
    val out = AsofJoin.join(left, right, "user_id", "ts", "ts").collect()
    assert(out.length == 1 && out.head.getAs[String]("tag") == "p1")
  }
}
