package graft

import graft.core.{GraftSession, Tables, Timeframe}
import graft.ohlcv.{Candles, CandleStore}

/** CLI equivalent of the reference fetcher's workflow
  * (ccxt-ohlcv-fetch.py:304-309): ingest a trade batch, resample to the
  * requested timeframe, upsert into the partitioned store, report the
  * resume point, optionally export CSV.
  *
  * Usage: Ingest <tradesDir> <storeRoot> <exchange> <timeframe>
  *               [csvOut] [--since=2024-01-15T00:00:00Z]
  *
  * `--since` mirrors the reference's flag (ccxt-ohlcv-fetch.py:193-195);
  * without it, ingest starts from each symbol's stored resume point
  * exactly like the reference's default (:274-285).
  */
object Ingest {
  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    require(pos.length >= 4,
      "usage: Ingest <tradesDir> <storeRoot> <exchange> <timeframe> [csvOut] " +
        "[--since=ISO8601] [--sqlite=DIR]")
    val Array(tradesDir, storeRoot, exchange, tfStr) = pos.take(4)
    val tf = Timeframe.parse(tfStr)
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val store = new CandleStore(storeRoot)
    val since = flags.collectFirst { case f if f.startsWith("--since=") =>
      Timeframe.parseIso8601(f.stripPrefix("--since="))
    }
    val trades0 = Tables.trades(spark, tradesDir)
    val trades = since.fold(trades0)(s =>
      trades0.where(org.apache.spark.sql.functions.col("ts") >= s))
    val candles = Candles.fromTrades(trades, tf)
    store.write(candles, exchange, tf)

    val symbols = candles.select("symbol").distinct()
      .collect().map(_.getString(0)).sorted
    symbols.foreach { sym =>
      val resume = store.resumeSince(spark, exchange, sym, tf)
      println(s"[ingest] $exchange/$sym/$tf resume_since=${resume.orNull}")
    }
    pos.lift(4).foreach { csvOut =>
      store.exportCsv(spark, csvOut, exchange, symbols.head, tf)
      println(s"[ingest] exported ${symbols.head} -> $csvOut")
    }
    // --sqlite=DIR additionally emits the reference's literal per-series
    // .sqlite files (gen_db_name layout) for downstream sqlite tooling
    flags.collectFirst { case f if f.startsWith("--sqlite=") =>
      f.stripPrefix("--sqlite=")
    }.foreach { dir =>
      val files = graft.sinks.SqliteExport.export(candles, exchange, tf, dir)
      println(s"[ingest] sqlite export: ${files.length} series files under $dir")
    }
    println(s"[ingest] wrote ${candles.count()} candles for ${symbols.length} symbols")
    spark.stop()
  }
}
