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
}
