package graft

import graft.ohlcv.{Microstructure, Studies}
import org.apache.spark.sql.functions._

/** Round-10 market-studies family: Kyle lambda, variance ratio, bipower
  * jump detection, calendar effects, Aroon, event study — hand-computed
  * constructions for each estimator's defining property.
  */
class StudiesSpec extends SparkSpec {

  test("kyleLambda: hand-computed OLS slope on constructed flow/impact") {
    import spark.implicits._
    // three buckets with (flow, close-open) = (10,1), (2,2), (-10,-1):
    //   h0: t1 unclassified (no prior tick), t2 up(+10)    -> flow 10, dp 1
    //   h1: t1 down(-4), t2 up(+6)                          -> flow  2, dp 2
    //   h2: t1 down(-8), t2 down(-2)                        -> flow -10, dp -1
    // sxy = 10*1 + 2*2 + (-10)(-1) = 24, sx = sy = 2, sxx = 204
    // slope = (3*24 - 2*2)/(3*204 - 2*2) = 68/608; x1e6, round 6
    val trades = Seq(
      ("K", ts(T0 + 0), 100.0, 5.0), ("K", ts(T0 + 60), 101.0, 10.0),
      ("K", ts(T0 + 3600), 100.0, 4.0), ("K", ts(T0 + 3660), 102.0, 6.0),
      ("K", ts(T0 + 7200), 101.0, 8.0), ("K", ts(T0 + 7260), 100.0, 2.0))
      .toDF("symbol", "ts", "price", "qty")
    val r = Microstructure.kyleLambda(trades, 3600000000L).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_buckets") == 3L)
    val exp = math.rint(68.0 / 608.0 * 1000000.0 * 1e6) / 1e6
    assert(math.abs(r.head.getAs[Double]("kyle_lambda") - exp) < 1e-9,
      s"expected $exp: ${r.head}")
  }

  test("varianceRatio: perfect mean reversion pins VR = 0; flat pins null") {
    import spark.implicits._
    // alternating log-price: every q-step return for even q is exactly 0
    val alt = (0 until 64).map(i =>
      ("MR", ts(T0 + i * 3600), if (i % 2 == 0) 100.0 else 110.0))
      .toDF("symbol", "bucket_ts", "close")
    val r = Studies.varianceRatio(alt).collect().head
    assert(r.getAs[Long]("n_rets") == 63L)
    Seq("vr2", "vr4", "vr8").foreach { c =>
      assert(r.getAs[Double](c) == 0.0, s"$c should be 0: $r")
    }
    // constant price: Var(r_1) = 0 -> guarded null, never divide-by-zero
    val flat = (0 until 16).map(i => ("F", ts(T0 + i * 3600), 100.0))
      .toDF("symbol", "bucket_ts", "close")
    val f = Studies.varianceRatio(flat).collect().head
    Seq("vr2", "vr4", "vr8").foreach(c => assert(f.isNullAt(f.fieldIndex(c)), s"$c: $f"))
  }

  test("realizedJump: an isolated gap is pure jump (BV = 0, share = 1)") {
    import spark.implicits._
    // flat, one 2x gap, flat again - all within one day: every adjacent
    // |r_t||r_{t-1}| product touches a zero return, so BV = 0 and
    // jump = RV = round(ln 2, 6)^2 exactly
    val closes = Seq.fill(5)(100.0) ++ Seq.fill(5)(200.0)
    val candles = closes.zipWithIndex.map { case (c, i) =>
      ("J", ts(T0 + i * 3600), c)
    }.toDF("symbol", "bucket_ts", "close")
    val r = Studies.realizedJump(candles).collect().head
    val lnTwo = math.rint(math.log(2.0) * 1e6) / 1e6
    assert(r.getAs[Long]("n_rets") == 9L)
    assert(math.abs(r.getAs[Double]("rv") - lnTwo * lnTwo) < 1e-12, r.toString)
    assert(r.getAs[Double]("bv") == 0.0, r.toString)
    assert(math.abs(r.getAs[Double]("jump") - lnTwo * lnTwo) < 1e-12, r.toString)
    assert(r.getAs[Double]("jump_share") == 1.0, r.toString)
  }

  test("realizedJump: constant drift has no jump (BV clamps it to zero)") {
    import spark.implicits._
    // identical returns: BV = (pi/2)*(n-1)*r^2 >= n*r^2 = RV for n = 24,
    // so the decomposition clamps at jump = 0
    val candles = (0 until 24).map(i =>
      ("D", ts(T0 + i * 3600), 100.0 * math.pow(1.01, i)))
      .toDF("symbol", "bucket_ts", "close")
    val r = Studies.realizedJump(candles).collect().head
    assert(r.getAs[Double]("jump") == 0.0, r.toString)
    assert(r.getAs[Double]("jump_share") == 0.0, r.toString)
  }

  test("calendarEffects: constant return pins mean, zero vol, Spark dow") {
    import spark.implicits._
    // T0 is Monday 2024-01-01; three closes -> two returns of exactly 0.1
    val candles = Seq(100.0, 110.0, 121.0).zipWithIndex.map { case (c, i) =>
      ("C", ts(T0 + i * 3600), c)
    }.toDF("symbol", "bucket_ts", "close")
    val r = Studies.calendarEffects(candles).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Int]("dow") == 2, s"Monday is 2 in Spark: ${r.head}")
    assert(r.head.getAs[Long]("n") == 2L)
    assert(r.head.getAs[Double]("mean_ret") == 0.1)
    assert(r.head.getAs[Double]("vol_ret") == 0.0)
  }

  test("aroon: rising series pins up=100/down=0; equal highs tie to recent") {
    import spark.implicits._
    val rising = (0 until 30).map(i =>
      ("A", ts(T0 + i * 3600), 100.0 + i, 90.0 + i)).toDF("symbol", "bucket_ts", "high", "low")
    val r = Studies.aroon(rising).orderBy(col("bucket_ts")).collect()
    assert(r.length == 30 - 25, s"full 26-row frames only: ${r.length}")
    r.foreach { row =>
      assert(row.getAs[Double]("aroon_up") == 100.0, row.toString)
      assert(row.getAs[Double]("aroon_down") == 0.0, row.toString)
      assert(row.getAs[Double]("aroon_osc") == 100.0, row.toString)
    }
    // all-equal highs/lows: the packed key ties break to the MOST RECENT
    // bar, so both sides read 100 (extreme is always "now")
    val flat = (0 until 30).map(i => ("F", ts(T0 + i * 3600), 100.0, 90.0))
      .toDF("symbol", "bucket_ts", "high", "low")
    val f = Studies.aroon(flat).collect()
    f.foreach { row =>
      assert(row.getAs[Double]("aroon_up") == 100.0, row.toString)
      assert(row.getAs[Double]("aroon_down") == 100.0, row.toString)
    }
  }

  test("eventStudy: single volume shock, hand-computed AR/CAR path") {
    import spark.implicits._
    // volume 10 everywhere except 1000 at index 16 (1-based): z ~= 5.3 is
    // the only event; close steps 100 -> 110 at the event bucket, so
    // ret = 0.1 there and 0 elsewhere; mean_ret = 0.1/29
    val n = 30
    val candles = (0 until n).map { i =>
      val close = if (i >= 15) 110.0 else 100.0
      val vol = if (i == 15) 1000.0 else 10.0
      ("E", ts(T0 + i * 3600), close, vol)
    }.toDF("symbol", "bucket_ts", "close", "volume")
    val r = Studies.eventStudy(candles).orderBy(col("off")).collect()
    assert(r.length == 7, s"one event x 7 offsets: ${r.length}")
    assert(r.forall(_.getAs[java.sql.Timestamp]("event_ts") == ts(T0 + 15 * 3600)))
    val base = math.rint(-0.1 / 29.0 * 1e6) / 1e6        // ar off the event
    val spike = math.rint((0.1 - 0.1 / 29.0) * 1e6) / 1e6 // ar at the event
    val ars = r.map(_.getAs[Double]("ar"))
    assert(ars.zip(Seq(base, base, base, spike, base, base, base)).forall {
      case (a, e) => math.abs(a - e) < 1e-9
    }, ars.mkString(", "))
    val carAt0 = r(3).getAs[Double]("car")
    assert(math.abs(carAt0 - (3 * base + spike)) < 1e-9, s"car(0) = $carAt0")
  }
}
