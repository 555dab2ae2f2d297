package graft

import graft.core.{GraftSession, Tables, Timeframe}
import graft.ohlcv.{Candles, CandleStore}

/** Multi-timeframe backfill: resample trades once at the finest
  * timeframe, then derive every coarser frame via the candle cascade
  * (Candles.resample) — one trade-log scan total, where the reference
  * runs its fetch loop once per timeframe.
  *
  * Usage: Backfill <tradesDir> <storeRoot> <exchange> [tf1 tf2 ...]
  * (default frames: 1m 5m 1h 1d)
  */
object Backfill {
  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    require(pos.length >= 3,
      "usage: Backfill <tradesDir> <storeRoot> <exchange> [timeframes...] [--sqlite=DIR]")
    val Array(tradesDir, storeRoot, exchange) = pos.take(3)
    val frames = (if (pos.length > 3) pos.drop(3).toSeq
      else Seq("1m", "5m", "1h", "1d")).map(Timeframe.parse)
    val sqliteDir = flags.collectFirst {
      case f if f.startsWith("--sqlite=") => f.stripPrefix("--sqlite=")
    }
    require(frames.nonEmpty && !frames.head.isCalendar,
      "finest timeframe must be fixed-width")

    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val store = new CandleStore(storeRoot)

    val finest = Candles.fromTrades(Tables.trades(spark, tradesDir), frames.head)
    finest.cache()
    frames.foreach { tf =>
      val candles = if (tf == frames.head) finest else Candles.resample(finest, tf)
      store.write(candles, exchange, tf)
      sqliteDir.foreach { dir =>
        val files = graft.sinks.SqliteExport.export(candles, exchange, tf, dir)
        println(s"[backfill] sqlite: ${files.length} series files for $tf")
      }
      println(s"[backfill] $exchange/$tf: ${candles.count()} candles")
    }
    finest.unpersist()
    spark.stop()
  }
}
