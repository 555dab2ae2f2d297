package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inactivity-gap sessionization over an event stream — batch form.
  * One window pass per user (single shuffle on user_id): mark session
  * breaks with lag, number sessions with a running sum, aggregate.
  * Deterministic ordering via (ts, event_id) tiebreak.
  */
object Sessionize {

  /** Events with their session_id attached (the pre-aggregation frame
    * `byUser` rolls up) — kept as its own step so path/journey analyses
    * can consume per-event session labels. Extra columns pass through.
    */
  def labeled(events: DataFrame, gapMicros: Long,
              carry: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    events
      .select((Seq("user_id", "ts", "event_id") ++ carry).map(col): _*)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("brk")).over(run))
  }

  def byUser(events: DataFrame, gapMicros: Long): DataFrame =
    labeled(events, gapMicros)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
}
