package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics beyond sessionization: behavioral transition
  * matrices and rolling active-user reach. Both are single-shuffle shapes
  * that survive 100 TB: transitions is one lag window per user plus a
  * tiny-cardinality aggregation; rolling actives bounds its blow-up at
  * `windowDays`× the DISTINCT (day, user) frame — never the raw events.
  */
object Events {

  /** Markov transition matrix over consecutive event types per user:
    * (prev_type, event_type) → transition count, distinct users making the
    * transition, and the conditional probability p(next | prev). Ordering
    * ties on identical timestamps break on event_id (deterministic). The
    * probability window partitions by prev_type over the aggregated frame
    * — event-type-squared rows, dim-scale at any corpus size.
    */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wp = Window.partitionBy(col("prev_type"))
    events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col("user_id")).as("n_users"))
      .withColumn("p", round(col("n_transitions").cast("double") /
        sum(col("n_transitions")).over(wp).cast("double"), 6))
  }

  /** Rolling `windowDays`-day distinct active users per calendar day.
    * COUNT(DISTINCT) over a sliding time range can't partial-aggregate,
    * so instead each DISTINCT (day, user) pair is exploded to the days it
    * keeps the user "active" (≤ windowDays rows each — bounded, map-side)
    * and one exact distinct-count per observation day follows. Days past
    * the data's end are clamped via a broadcast 1-row max. Output covers
    * every day with ≥1 active user in its trailing window.
    */
  def rollingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val du = events
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .distinct()
    val mx = du.agg(max(col("day")).as("max_day"))
    du.select(col("user_id"),
        explode(sequence(col("day"),
          col("day") + expr(s"INTERVAL ${windowDays - 1} DAY"),
          expr("INTERVAL 1 DAY"))).as("day"))
      .crossJoin(broadcast(mx))
      .where(col("day") <= col("max_day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }
}
