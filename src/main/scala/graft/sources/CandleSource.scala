package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest exchange-computed candle batches in the exact shape the
  * reference receives from `exchange.fetch_ohlcv`
  * (ccxt-ohlcv-fetch.py:94-107): JSON lines of
  * `{"symbol": "...", "ohlcv": [[ts_ms, o, h, l, c, v], ...]}` — one
  * batch per line, candle rows as 6-element arrays. Explodes into the
  * engine's candle schema; `trades` is unknown to the exchange payload
  * and surfaces as 0.
  */
object CandleSource {

  val batchSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("ohlcv", ArrayType(ArrayType(DoubleType)))))

  def ccxtJson(spark: SparkSession, path: String): DataFrame =
    fromBatches(spark.read.schema(batchSchema).json(path))

  /** (symbol, ohlcv array<array<double>>) batches → candle rows. */
  def fromBatches(batches: DataFrame): DataFrame =
    batches
      .select(col("symbol"), explode(col("ohlcv")).as("row"))
      .select(
        col("symbol"),
        timestamp_micros((col("row")(0) * 1000).cast("long")).as("bucket_ts"),
        col("row")(1).as("open"),
        col("row")(2).as("high"),
        col("row")(3).as("low"),
        col("row")(4).as("close"),
        col("row")(5).as("volume"),
        lit(0L).as("trades"))
}
