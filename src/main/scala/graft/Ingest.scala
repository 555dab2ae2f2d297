package graft

import graft.core.{GraftSession, Tables, Timeframe}
import graft.ohlcv.{Candles, CandleStore}

/** CLI equivalent of the reference fetcher's workflow
  * (ccxt-ohlcv-fetch.py:304-309): ingest a trade batch, resample to the
  * requested timeframe, upsert into the partitioned store, report the
  * resume point, optionally export CSV.
  *
  * Usage: Ingest <tradesDir> <storeRoot> <exchange> <timeframe> [csvOut]
  */
object Ingest {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: Ingest <tradesDir> <storeRoot> <exchange> <timeframe> [csvOut]")
    val Array(tradesDir, storeRoot, exchange, tfStr) = args.take(4)
    val tf = Timeframe.parse(tfStr)
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val store = new CandleStore(storeRoot)
    val trades = Tables.trades(spark, tradesDir)
    val candles = Candles.fromTrades(trades, tf)
    store.write(candles, exchange, tf)

    val symbols = candles.select("symbol").distinct()
      .collect().map(_.getString(0)).sorted
    symbols.foreach { sym =>
      val resume = store.resumeSince(spark, exchange, sym, tf)
      println(s"[ingest] $exchange/$sym/$tf resume_since=${resume.orNull}")
    }
    args.lift(4).foreach { csvOut =>
      store.exportCsv(spark, csvOut, exchange, symbols.head, tf)
      println(s"[ingest] exported ${symbols.head} -> $csvOut")
    }
    println(s"[ingest] wrote ${candles.count()} candles for ${symbols.length} symbols")
    spark.stop()
  }
}
