package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  /** SECOND-ORDER event transitions: P(next | the two previous events) —
    * the Markov-order upgrade of [[transitions]] that catches the
    * path-dependence a first-order chain flattens (search→view→buy vs
    * view→view→buy convert very differently); the n-gram language-model
    * idea applied to event streams, and the standard next-step predictor
    * baseline. Emits (prev2, prev1, next) with the transition count,
    * distinct users, and the conditional probability within the
    * (prev2, prev1) context.
    *
    * Same shape as transitions: one (user, ts, event_id)-ordered lag
    * window (both lags fold into it), one grouped aggregation (bounded by
    * event-type³ — dim-scale at any fact size), and the conditional
    * share via a window over that dim-scale table. Exact counts; one
    * rounded division.
    */
  def transitions2(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wp = Window.partitionBy(col("prev2_type"), col("prev_type"))
    events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("prev2_type", lag(col("event_type"), 2).over(w))
      .where(col("prev2_type").isNotNull)
      .groupBy(col("prev2_type"), col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col("user_id")).as("n_users"))
      .withColumn("p", round(col("n_transitions").cast("double") /
        sum(col("n_transitions")).over(wp).cast("double"), 6))
  }

  /** Inter-event-time distribution per event type: for each consecutive
    * event pair of a user (ts/event_id ordered), the gap in microseconds,
    * rolled up by the LATER event's type — count, mean, p50/p90. All
    * integer microsecond arithmetic until the final division/percentile
    * interpolation, surfaced as whole microseconds (the
    * session_percentiles rounding rule). One lag window + one
    * low-cardinality aggregation.
    */
  def interEventTimes(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .where(col("prev_ts").isNotNull)
      .select(col("event_type"),
        (unix_micros(col("ts")) - unix_micros(col("prev_ts"))).as("gap_us"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        round(sum(col("gap_us")).cast("double") / count(lit(1)), 0)
          .cast("long").as("mean_gap_us"),
        round(expr("percentile(gap_us, 0.5)"), 0).cast("long").as("p50_gap_us"),
        round(expr("percentile(gap_us, 0.9)"), 0).cast("long").as("p90_gap_us"))
  }

  /** Per-day bounce rate over inactivity-gap sessions: fraction of
    * sessions with exactly one event. Rides entirely on `Sessionize`
    * output — one extra conditional aggregation.
    */
  def bounceRate(events: DataFrame, gapMicros: Long = 1800000000L): DataFrame =
    Sessionize.byUser(events, gapMicros)
      .groupBy(date_trunc("day", col("session_start")).as("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
      .withColumn("bounce_rate",
        round(col("n_bounces").cast("double") / col("n_sessions"), 6))

  /** DAU/MAU stickiness per day: daily actives over trailing-30-day
    * actives — the engagement-depth ratio. One materialized DISTINCT
    * (day, user) frame feeds both counts; the trailing count uses the
    * same bounded explode as `rollingActiveUsers` (≤30 rows per distinct
    * pair, never a sliding COUNT(DISTINCT)).
    */
  def stickiness(events: DataFrame, longDays: Int = 30): DataFrame = {
    val du = graft.core.Materialize.once(events
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .distinct())
    val mx = du.agg(max(col("day")).as("max_day"))
    val dau = du.groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau"))
    val mau = du.select(col("user_id"),
        explode(sequence(col("day"),
          col("day") + expr(s"INTERVAL ${longDays - 1} DAY"),
          expr("INTERVAL 1 DAY"))).as("day"))
      .crossJoin(broadcast(mx))
      .where(col("day") <= col("max_day"))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("mau"))
    dau.join(mau, "day")
      .select(col("day"), col("dau"), col("mau"),
        round(col("dau").cast("double") / col("mau"), 6).as("stickiness"))
  }

  /** Most common session-opening journeys: each session's first `depth`
    * event types joined into a path string, counted corpus-wide, top-N by
    * frequency (path tiebreak). Rides on Sessionize.labeled — the path
    * pick is ONE more window over the SAME (user_id) partitioning (no
    * extra shuffle); the rollup keys on dim-scale path strings; top-N is
    * a TakeOrdered global sort-limit, never a full sort.
    */
  def sessionPaths(events: DataFrame, gapMicros: Long = 1800000000L,
                   depth: Int = 3, topN: Int = 20): DataFrame = {
    val ws = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts"), col("event_id"))
    Sessionize.labeled(events, gapMicros, carry = Seq("event_type"))
      .withColumn("pos", row_number().over(ws))
      .where(col("pos") <= depth)
      .groupBy(col("user_id"), col("session_id"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"),
        col("event_type")))), s => s.getField("event_type")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path")).limit(topN)
  }

  /** LINEAR multi-touch attribution: every purchase's value is split
    * EQUALLY across all of that user's clicks in the preceding `window`
    * (vs. the as-of join's last-touch and funnel_1h's any-touch counting —
    * the third classic attribution model, and the one marketers default
    * to when no touch deserves full credit). Emits per-click totals:
    * how many purchases the click shares in, and its summed credit.
    *
    * Scale shape: the click→purchase pairing is the IntervalJoin hash
    * join (equi-key on user, interval residual — never a nested loop);
    * the per-purchase touch count is ONE window over the pair frame
    * (partitioned by purchase id — fan-out bounded by clicks-per-window);
    * per-click totals are one map-side-combined aggregation. Determinism:
    * each credit share rounds to 6 decimals and sums in exact
    * DECIMAL(18,6) (order-insensitive), replayed identically by the
    * oracle.
    */
  def linearAttribution(events: DataFrame,
                        windowMicros: Long = 86400000000L): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val j = graft.operators.IntervalJoin
      .forward(clicks, purchases, "user_id", "ts", "ts", windowMicros, "p_")
    val w = Window.partitionBy(col("p_event_id"))
    j.withColumn("share",
      round(col("p_value") / count(lit(1)).over(w).cast("double"), 6)
        .cast(DecimalType(18, 6)))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("share")).cast("double").as("credit"))
  }

  /** KAPLAN–MEIER survival curve over user lifetimes — the
    * right-censoring-aware retention statistic (a naive "fraction still
    * active after N days" silently treats recent users as churned; KM
    * does not). Lifetime = whole days between a user's first and last
    * event (integer micros division); a user is an observed CHURN if
    * their last event is ≥ `censorDays` before the corpus's max ts,
    * otherwise right-censored (still alive at cutoff). Emits one row per
    * lifetime with ≥ 1 churn: n_risk (users with lifetime ≥ t), n_churn,
    * and Ŝ(t) = Π_{s ≤ t} (1 − d/n).
    *
    * Scale shape: one per-user aggregation shrinks the stream to the user
    * dimension; everything after (per-lifetime grouping, two running
    * windows) is lifetime-cardinality — days, not users. The corpus max
    * ts is a 1-row broadcast. Determinism: the product runs as
    * exp(Σ ln-terms) with each term rounded to 12 and summed in exact
    * DECIMAL(28,12) (order-insensitive); an exhausted stratum (d = n,
    * ln 0 undefined) flips a cumulative flag that pins Ŝ = 0 exactly —
    * no ±inf enters either engine's arithmetic.
    */
  /** Cohort LTV curves — cumulative purchase revenue per signup cohort by
    * account age: the growth-analytics staple next to retention_cohorts
    * (that one counts WHO comes back; this one sums WHAT they spend, per
    * user, so cohorts of different sizes compare on one axis). Cohort =
    * the user's first-activity day, age = whole days since; revenue sums
    * in exact DECIMAL(18,2) per (cohort, age), the cumulative curve is an
    * exact-decimal running sum over age (order-exact in both engines),
    * and ltv_per_user divides by the cohort's size, rounded at emission.
    *
    * Scale shape: one user-dim shrink (first-day per user) joined back —
    * broadcast at test scale, a shuffle join at fact scale; the purchase
    * aggregation map-side combines; the cumulative window runs over the
    * (cohort, age) DIM-scale frame, never the fact.
    */
  def ltvCohorts(events: DataFrame): DataFrame = {
    val d2 = DecimalType(18, 2)
    val e = graft.core.Materialize.once(events.select(col("user_id"),
      date_trunc("day", col("ts")).as("day"), col("event_type"), col("value")))
    val cohort = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val sizes = cohort.groupBy(col("cohort_day")).agg(count(lit(1)).as("n_users"))
    val rev = e.where(col("event_type") === "purchase")
      .join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("age_days"))
      .agg(sum(col("value").cast(d2)).as("rev_d"))
    val w = Window.partitionBy(col("cohort_day")).orderBy(col("age_days"))
      .rowsBetween(Window.unboundedPreceding, 0)
    rev
      .withColumn("cum_d", sum(col("rev_d")).over(w))
      .join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day"), col("age_days"), col("n_users"),
        col("rev_d").cast("double").as("revenue"),
        col("cum_d").cast("double").as("cum_revenue"),
        round(col("cum_d").cast("double") / col("n_users").cast("double"), 6)
          .as("ltv_per_user"))
  }

  def kaplanMeier(events: DataFrame, censorDays: Int = 1): DataFrame = {
    val day = 86400000000L
    val mx = events.agg(max(unix_micros(col("ts"))).as("max_us"))
    val users = events.groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("f_us"),
        max(unix_micros(col("ts"))).as("l_us"))
      .crossJoin(broadcast(mx))
      .select(
        // integer division on both engines (Spark `div` / DuckDB `//`):
        // a double roundtrip would CAST-round in DuckDB but truncate here
        expr(s"(l_us - f_us) div $day").as("lifetime_days"),
        (col("l_us") + lit(censorDays * day) <= col("max_us")).as("churned"))
    val g = users.groupBy(col("lifetime_days"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("churned"), 1L).otherwise(0L)).as("n_churn"))
    val total = g.agg(sum(col("n_total")).as("all_users"))
    // unpartitioned windows are SAFE here (unlike heaps_curve's
    // corpus-linear spine, de-windowed in r11): they run over `g`, the
    // per-lifetime-day frame, whose row count is bounded by the calendar
    // span of the data (thousands of rows at ANY corpus size) — the same
    // dim-scale contract as the cuts/cutoff frames elsewhere
    val wPrior = Window.orderBy(col("lifetime_days"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("lifetime_days"))
      .rowsBetween(Window.unboundedPreceding, 0)
    g.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("all_users") - coalesce(sum(col("n_total")).over(wPrior), lit(0L)))
      .withColumn("term", when(col("n_churn") < col("n_risk"),
        round(log(lit(1.0) - col("n_churn").cast("double") / col("n_risk").cast("double")), 12)
          .cast(DecimalType(28, 12))).otherwise(lit(null).cast(DecimalType(28, 12))))
      .withColumn("dead_flag",
        max(when(col("n_churn") === col("n_risk"), 1L).otherwise(0L)).over(wCum))
      .withColumn("logsum", sum(col("term")).over(wCum).cast("double"))
      .where(col("n_churn") > 0)
      .select(col("lifetime_days"), col("n_risk"), col("n_churn"),
        when(col("dead_flag") === 1, lit(0.0))
          .otherwise(round(exp(col("logsum")), 6)).as("survival"))
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
    // the distinct pair frame feeds both the max-day bound and the explode
    // branch: materialize it once instead of scanning events twice
    val du = graft.core.Materialize.once(events
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .distinct())
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
