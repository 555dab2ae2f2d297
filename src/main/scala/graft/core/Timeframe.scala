package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Timeframe grammar of the reference fetcher: `\d+[smhdwMy]`
  * (ccxt-ohlcv-fetch.py:141-166). Fixed-width units (s m h d w) bucket by
  * pure epoch-microsecond arithmetic — stays inside whole-stage codegen and
  * is identical on every engine. Calendar units (M y) bucket by
  * `date_trunc`, matching the reference's relativedelta month/year
  * semantics.
  */
final case class Timeframe(n: Int, unit: Char) {
  require(n > 0, s"timeframe count must be positive: $n$unit")
  require("smhdwMy".indexOf(unit.toInt) >= 0, s"unknown timeframe unit: $unit")

  def isCalendar: Boolean = unit == 'M' || unit == 'y'

  /** Bucket width in microseconds — fixed-width units only. */
  def micros: Long = unit match {
    case 's' => n * 1000000L
    case 'm' => n * 60L * 1000000L
    case 'h' => n * 3600L * 1000000L
    case 'd' => n * 86400L * 1000000L
    case 'w' => n * 7L * 86400L * 1000000L
    case u   => throw new IllegalArgumentException(s"calendar unit $u has no fixed width")
  }

  /** Bucket start (timestamp) for a timestamp column. Epoch arithmetic
    * (`ts - ts mod width`) rather than float division: exact, codegen'd,
    * and oracle-reproducible.
    */
  /** Width in months (calendar units only). */
  private def months: Int = if (unit == 'M') n else n * 12

  def bucketStart(ts: Column): Column =
    if (isCalendar) {
      if (n == 1) date_trunc(if (unit == 'M') "month" else "year", ts)
      else {
        // n-month buckets anchored at 1970-01 (epoch month arithmetic,
        // mirroring the reference's relativedelta month/year stepping)
        val m = (year(ts) - 1970) * 12 + month(ts) - 1
        // add_months yields DateType; surface the bucket as a timestamp
        add_months(to_timestamp(lit("1970-01-01 00:00:00")),
          m - pmod(m, lit(months))).cast("timestamp")
      }
    } else timestamp_micros(unix_micros(ts) - pmod(unix_micros(ts), lit(micros)))

  /** Exclusive bucket end. */
  def bucketEnd(ts: Column): Column =
    if (isCalendar) add_months(bucketStart(ts), months).cast("timestamp")
    else timestamp_micros(unix_micros(bucketStart(ts)) + lit(micros))

  override def toString: String = s"$n$unit"
}

object Timeframe {
  private val Grammar = """^(\d+)([smhdwMy])$""".r

  /** Parse `1m`, `5m`, `1h`, `1d`, `1w`, `1M`, `1y`, ... — same grammar as
    * the reference's `timeframe_re` (ccxt-ohlcv-fetch.py:142).
    */
  def parse(s: String): Timeframe = s match {
    case Grammar(n, u) => Timeframe(n.toInt, u.head)
    case _ => throw new IllegalArgumentException(s"could not parse timeframe '$s'")
  }

  /** ISO-8601 `--since` parsing (ccxt-ohlcv-fetch.py:287) as a Column. */
  def parseIso8601(s: String): Column =
    to_timestamp(lit(s), "yyyy-MM-dd'T'HH:mm:ssX")
}
