package graft

import graft.core.GraftSession
import graft.ohlcv.CandleStore
import graft.sources.TradeSource
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SqlSurfaceSpec extends SparkSpec {
  test("star schema + trades reachable from spark.sql, incl. native cosine_sim") {
    Graft.registerViews(spark, Sf0001)
    val candles = spark.sql(
      """SELECT symbol, date_trunc('hour', ts) AS b, min(price) AS lo, max(price) AS hi
        |FROM trades GROUP BY 1, 2""".stripMargin)
    assert(candles.count() > 0)
    val cos = spark.sql(
      """SELECT a.vec_id, cosine_sim(CAST(a.embedding AS ARRAY<DOUBLE>),
        |                            CAST(a.embedding AS ARRAY<DOUBLE>)) AS self_cos
        |FROM embeddings a LIMIT 5""".stripMargin).collect()
    assert(cos.forall(r => math.abs(r.getAs[Double]("self_cos") - 1.0) < 1e-9))
  }

  test("GraftExtensions registers cosine_sim against a fresh extensions set") {
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions()(exts) // must not throw; function wired
  }

  test("cosine_sim is typed: float arrays widen, strings fail at analysis") {
    Graft.registerViews(spark, Sf0001)
    // raw array<float> embeddings auto-cast to array<double> — no explicit CAST
    val cos = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM embeddings LIMIT 5").collect()
    assert(cos.forall(r => math.abs(r.getAs[Double]("c") - 1.0) < 1e-6))
    // a string argument is an analysis-time error, not an executor crash
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_sim('oops', embedding) FROM embeddings").collect()
    }
    assert(err.getMessage.toLowerCase.contains("type"))
  }
}

class CandleSourceSpec extends SparkSpec {
  test("ccxt fetch_ohlcv JSON batches explode into candle rows") {
    import graft.sources.CandleSource
    val dir = Files.createTempDirectory("graft_ccxt").toString
    val line =
      s"""{"symbol":"XRP/USD","ohlcv":[[${(T0) * 1000}.0,0.5,0.6,0.45,0.55,1000.0],""" +
        s"""[${(T0 + 60) * 1000}.0,0.55,0.7,0.5,0.65,2000.0]]}"""
    Files.writeString(java.nio.file.Paths.get(dir, "batch.json"), line)
    val candles = CandleSource.ccxtJson(spark, dir)
    val rows = candles.orderBy("bucket_ts").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[java.sql.Timestamp]("bucket_ts") == ts(T0))
    assert(rows(0).getAs[Double]("open") == 0.5 && rows(0).getAs[Double]("volume") == 1000.0)
    // round-trips through the store like engine-computed candles
    val store = new CandleStore(Files.createTempDirectory("graft_ccxt_store").toString)
    store.write(candles, "bitfinex", graft.core.Timeframe.parse("1m"))
    assert(store.read(spark, Some("bitfinex"), Some("XRP/USD")).count() == 2)
  }
}

class TradeSourceSpec extends SparkSpec {
  test("csv and json trade batches read with the canonical schema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_src").toString
    val df = Seq(("BTC", ts(T0 + 1), 100.5, 2.0), ("ETH", ts(T0 + 2), 10.25, 1.0))
      .toDF("symbol", "ts", "price", "qty")
    df.write.option("header", "true").mode("overwrite").csv(s"$dir/csv")
    df.write.mode("overwrite").json(s"$dir/json")

    val fromCsv = TradeSource.csv(spark, s"$dir/csv")
    val fromJson = TradeSource.json(spark, s"$dir/json")
    assert(fromCsv.schema == TradeSource.schema)
    assert(fromCsv.count() == 2 && fromJson.count() == 2)
    assert(fromJson.where(col("symbol") === "BTC").head().getAs[Double]("price") == 100.5)
  }
}
