package graft

import graft.core.Tables
import graft.core.Timeframe
import graft.ohlcv.Candles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Environment-drift guard for the `ts` read boundary (the round-9
  * incident: a driver-side testdata regeneration flipped events.parquet
  * from TIMESTAMP(NANOS) to TIMESTAMP(MICROS, isAdjustedToUTC=false) —
  * TimestampNTZType on the Spark side — and every `unix_micros`-based
  * operator died at ANALYSIS time, zeroing 54 queries for a round).
  *
  * The SAME event frame is written in all three timestamp flavors seen
  * across driver regenerations, and `Tables.events` / the Timeframe
  * bucketing path are pinned to IDENTICAL output on each:
  *   - TIMESTAMP_MICROS adjusted to UTC  → TimestampType (pass-through)
  *   - TIMESTAMP_MICROS not adjusted     → TimestampNTZType (cast; the
  *     UTC session makes wall time == instant, so it is the identity on
  *     the underlying micros)
  *   - legacy nanos-as-Long              → LongType (integer div 1000)
  * A future flavor that reaches `Tables.events` unnormalized fails HERE,
  * in one suite, instead of as 54 opaque per-query analysis errors.
  */
class SchemaRobustnessSpec extends SparkSpec {

  private lazy val flavorDirs: Map[String, String] = {
    val base = java.nio.file.Files
      .createTempDirectory("graft-ts-flavors").toString
    // a real slice keeps the fixture faithful to driver data (props
    // regex, user_id types, multi-symbol coverage)
    val slice = Tables.events(spark, Sf0001).limit(500).cache()
    val utc = slice // ts already TimestampType under the UTC session
    val ntz = slice.withColumn("ts", col("ts").cast(TimestampNTZType))
    val nanos = slice.withColumn("ts",
      (unix_micros(col("ts")) * lit(1000L)).cast(LongType))
    val out = Map("utc" -> utc, "ntz" -> ntz, "nanos" -> nanos).map {
      case (name, df) =>
        val dir = s"$base/$name"
        df.coalesce(1).write.parquet(s"$dir/events.parquet")
        name -> dir
    }
    slice.unpersist()
    out
  }

  private def micros(dir: String): Seq[Long] = {
    val e = Tables.events(spark, dir)
    assert(e.schema("ts").dataType == TimestampType,
      s"Tables.events must normalize ts to TimestampType, got " +
        s"${e.schema("ts").dataType} for $dir")
    e.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq.sorted
  }

  test("all three ts flavors normalize to the same TimestampType micros") {
    val byFlavor = flavorDirs.map { case (n, d) => n -> micros(d) }
    assert(byFlavor("utc").nonEmpty, "fixture slice must not be empty")
    assert(byFlavor("ntz") == byFlavor("utc"),
      "NTZ flavor drifted from the UTC reference")
    assert(byFlavor("nanos") == byFlavor("utc"),
      "legacy Long-nanos flavor drifted from the UTC reference")
  }

  test("timeframe bucketing is flavor-invariant end to end") {
    def candles(dir: String): Seq[String] =
      Candles.fromTrades(Tables.trades(spark, dir), Timeframe.parse("1h"))
        .select(col("symbol"), unix_micros(col("bucket_ts")).as("b"),
          col("open"), col("high"), col("low"), col("close"), col("volume"))
        .collect().map(_.toString).toSeq.sorted
    val ref = candles(flavorDirs("utc"))
    assert(ref.nonEmpty, "bucketing fixture must produce candles")
    assert(candles(flavorDirs("ntz")) == ref,
      "1h candles differ between NTZ and UTC flavors")
    assert(candles(flavorDirs("nanos")) == ref,
      "1h candles differ between Long-nanos and UTC flavors")
  }

  test("sessionize accepts every flavor (the analysis-time regression shape)") {
    // the r9 failure mode was an AnalysisException, not wrong rows — pin
    // that each flavor at least ANALYZES AND RUNS through a second
    // unix_micros consumer (Sessionize) with identical session counts
    def sessions(dir: String): Long =
      graft.ops.Sessionize.byUser(Tables.events(spark, dir), 1800000000L).count()
    val ref = sessions(flavorDirs("utc"))
    assert(sessions(flavorDirs("ntz")) == ref)
    assert(sessions(flavorDirs("nanos")) == ref)
  }
}
