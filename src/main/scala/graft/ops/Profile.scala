package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, NumericType, StringType, TimestampNTZType, TimestampType}

/** Single-pass column profiler — the data-quality sweep a training-data
  * pipeline runs before ingest. One aggregation job produces one row per
  * column (null rate, distinct count, numeric min/max/mean, string length
  * stats); no per-column jobs, no collect loops.
  *
  * Determinism: means go through exact DECIMAL(27,6) partial sums (order-
  * insensitive) divided by the non-null count, so the result is
  * bit-identical across engines and shuffle orders. Distinct counts are
  * exact by default (Spark plans all of them in one pass via Expand); pass
  * `exactDistinct = false` for the HLL-sketch variant when an estimate is
  * enough — at very large scale that trades the Expand row multiplication
  * for a fixed-size sketch per column.
  */
object Profile {

  def profile(df: DataFrame, exactDistinct: Boolean = true,
              rsd: Double = 0.05): DataFrame = {
    val fields = df.schema.fields
    val d = DecimalType(27, 6)
    val aggs = Seq.newBuilder[Column]
    aggs += count(lit(1)).as("_nrows")
    fields.zipWithIndex.foreach { case (f, i) =>
      val c = col(f.name)
      aggs += sum(when(c.isNull, 1L).otherwise(0L)).as(s"_null$i")
      aggs += (if (exactDistinct) count_distinct(c)
               else approx_count_distinct(c, rsd)).as(s"_dist$i")
      if (f.dataType.isInstanceOf[NumericType]) {
        aggs += min(c).cast("double").as(s"_min$i")
        aggs += max(c).cast("double").as(s"_max$i")
        aggs += sum(c.cast(d)).cast("double").as(s"_sum$i")
        aggs += count(c).as(s"_cnt$i")
      }
      if (f.dataType == StringType) {
        aggs += min(length(c)).cast("long").as(s"_lmin$i")
        aggs += max(length(c)).cast("long").as(s"_lmax$i")
      }
    }
    val a = aggs.result()
    val agged = df.agg(a.head, a.tail: _*)
    val structs = fields.zipWithIndex.map { case (f, i) =>
      val numeric = f.dataType.isInstanceOf[NumericType]
      val stringy = f.dataType == StringType
      struct(
        lit(f.name).as("column"),
        // timestamp flavors collapse to one label: which flavor a parquet
        // file carries is an ENVIRONMENT fact (isAdjustedToUTC flips with
        // writer settings — the r9 testdata drift), not a data-quality
        // fact, and a profile pinned to the flavor breaks on regeneration
        lit(f.dataType match {
          case TimestampNTZType | TimestampType => "timestamp"
          case dt => dt.simpleString
        }).as("dtype"),
        col("_nrows").as("n_rows"),
        col(s"_null$i").as("n_null"),
        col(s"_dist$i").as("n_distinct"),
        (if (numeric) col(s"_min$i") else lit(null).cast("double")).as("min_num"),
        (if (numeric) col(s"_max$i") else lit(null).cast("double")).as("max_num"),
        // null-guarded: an all-null numeric column yields null mean rather
        // than an ANSI DIVIDE_BY_ZERO
        (if (numeric) col(s"_sum$i") / when(col(s"_cnt$i") > 0, col(s"_cnt$i"))
         else lit(null).cast("double")).as("mean_num"),
        (if (stringy) col(s"_lmin$i") else lit(null).cast("long")).as("min_len"),
        (if (stringy) col(s"_lmax$i") else lit(null).cast("long")).as("max_len"))
    }
    agged.select(explode(array(structs.toSeq: _*))).select("col.*")
  }

  /** Automatic sketch policy: exact distinct counts up to `maxExactRows`
    * input rows, HLL sketches above — the 100 TB default where the exact
    * mode's Expand (one duplicated row per distinct-counted column) would
    * multiply a huge scan. Row count comes from the optimized plan's
    * statistics when the catalog has them (free); otherwise one columnar
    * count job — cheap next to the profile pass itself, and only paid on
    * stat-less inputs.
    */
  def profileAuto(df: DataFrame, maxExactRows: Long = 10000000L,
                  rsd: Double = 0.01): DataFrame = {
    val rows = df.queryExecution.optimizedPlan.stats.rowCount
      .map(_.toLong).getOrElse(df.count())
    profile(df, exactDistinct = rows <= maxExactRows, rsd = rsd)
  }
}

/** Declarative data-quality constraint suite evaluated in ONE aggregation
  * pass (the Deequ idea re-expressed as plain Catalyst aggregates): each
  * check contributes a metric expression and a pass predicate over the
  * same aggregation row, so N constraints cost one scan — never one job
  * per check. At 100 TB the difference between one pass and N passes IS
  * the feature.
  *
  * Determinism: every metric is a ratio of exact integer counters (one
  * double division, identical in any engine/shuffle order), rounded at
  * emission; every pass verdict compares the COUNTERS as integers, never
  * the floating metric. The only multi-stage member is `unique` (exact
  * distinct count ⇒ Spark plans an Expand) — the price of an exact
  * uniqueness claim; swap for approx_count_distinct when an estimate is
  * acceptable.
  */
object Dq {

  /** One constraint: `metric` and `passed` are AGGREGATE expressions —
    * they are evaluated inside the single `check` aggregation.
    */
  final case class Check(name: String, metric: Column, passed: Column)

  private def nrows: Column = count(lit(1))

  /** Fraction of rows with a non-null value; passes only when complete. */
  def complete(c: String): Check = Check(
    s"complete_$c",
    count(col(c)).cast("double") / nrows.cast("double"),
    count(col(c)) === nrows)

  /** Distinct ratio of the (composite) key; passes only when unique. */
  def unique(cols: Seq[String]): Check = Check(
    s"unique_${cols.mkString("_")}",
    count_distinct(struct(cols.map(col): _*)).cast("double") / nrows.cast("double"),
    count_distinct(struct(cols.map(col): _*)) === nrows)

  /** Fraction of NON-NULL values inside [lo, hi]; passes when all are. */
  def inRange(c: String, lo: Double, hi: Double): Check = Check(
    s"range_$c",
    sum(when(col(c).between(lo, hi), 1L).otherwise(0L)).cast("double") /
      when(count(col(c)) > 0, count(col(c))).cast("double"),
    sum(when(col(c).between(lo, hi), 1L).otherwise(0L)) === count(col(c)))

  /** Fraction of NON-NULL values in the allowed set; passes when all are. */
  def inSet(c: String, values: Seq[String]): Check = Check(
    s"set_$c",
    sum(when(col(c).isin(values: _*), 1L).otherwise(0L)).cast("double") /
      when(count(col(c)) > 0, count(col(c))).cast("double"),
    sum(when(col(c).isin(values: _*), 1L).otherwise(0L)) === count(col(c)))

  /** Row-count floor (non-empty input, ingest sanity). */
  def minRows(n: Long): Check =
    Check("row_count", nrows.cast("double"), nrows >= n)

  /** Evaluate all checks in one aggregation; one output row per check:
    * (check_name, metric rounded to 6, passed).
    */
  def check(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val aggs = checks.zipWithIndex.flatMap { case (c, i) =>
      Seq(c.metric.as(s"_m$i"), c.passed.as(s"_p$i"))
    }
    val structs = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"),
        round(col(s"_m$i"), 6).as("metric"),
        col(s"_p$i").as("passed"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(structs: _*)).as("c"))
      .select(col("c.check_name"), col("c.metric"), col("c.passed"))
  }

  /** PSI population drift between a reference and a current slice of the
    * same column — the Population Stability Index every model-monitoring
    * stack gates on (rule of thumb: < 0.1 stable, 0.1–0.25 drifting,
    * > 0.25 shifted): Σ over bins of (p−q)·ln(p/q), with p/q the
    * reference/current bin shares. Bins are `bins` equal-width cuts of
    * the GLOBAL [min, max] (the value_histogram convention — identical
    * float expressions in both engines, top edge clamped into the last
    * bin); bins empty on EITHER side are skipped (the standard
    * convention, counted out via `n_bins_used` so a gate can see how
    * much support the score has). Per-bin terms round to 12 and sum in
    * exact DECIMAL(28,12) (the amihud recipe) — ln is the engines'
    * shared libm (the zipf/surprisal precedent), everything after it
    * fixed-order. One row: psi, n_bins_used, n_ref, n_cur.
    *
    * Scale shape: one pruned scan for the global bounds, one for the
    * binned counts (two-pass, the budget_sample convention — never a
    * fact-scale materialization), bounds broadcast via a 1-row cross;
    * the bin table is cut once (dim-scale) and feeds totals + terms.
    */
  def psiDrift(df: DataFrame, c: String, isRef: Column, bins: Int = 20): DataFrame = {
    require(bins >= 2, "bins >= 2")
    val base = df.where(col(c).isNotNull)
      .select(col(c).cast("double").as("v"), isRef.as("is_ref"))
    val bounds = base.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val counts = graft.core.Materialize.once(base
      .crossJoin(broadcast(bounds))
      .select(least(floor((col("v") - col("lo")) * lit(bins.toDouble) /
          when(col("hi") =!= col("lo"), col("hi") - col("lo"))),
          lit((bins - 1).toLong)).as("bin"),
        col("is_ref"))
      .groupBy(col("bin"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("nref"),
        sum(when(col("is_ref"), 0L).otherwise(1L)).as("ncur")))
    val tot = counts.agg(sum(col("nref")).as("tref"), sum(col("ncur")).as("tcur"))
    counts.crossJoin(broadcast(tot))
      .where(col("nref") > 0 && col("ncur") > 0)
      .select(
        round((col("nref").cast("double") / col("tref").cast("double") -
          col("ncur").cast("double") / col("tcur").cast("double")) *
          log(col("nref").cast("double") / col("tref").cast("double") /
            (col("ncur").cast("double") / col("tcur").cast("double"))), 12)
          .cast(DecimalType(28, 12)).as("term"),
        col("tref"), col("tcur"))
      .groupBy(col("tref"), col("tcur"))
      .agg(count(lit(1)).as("n_bins_used"),
        sum(col("term")).cast("double").as("s"))
      .select(round(col("s"), 6).as("psi"), col("n_bins_used"),
        col("tref").as("n_ref"), col("tcur").as("n_cur"))
  }

  /** BENFORD first-digit screen over a positive numeric column — the
    * classic "was this measured or fabricated/truncated" audit: natural
    * multi-magnitude quantities put digit d first with probability
    * log₁₀(1 + 1/d); synthetic, capped, or unit-priced data deviates
    * hard. One row per digit 1–9 with the observed share, the Benford
    * expectation, and the signed deviation — downstream gates threshold
    * max |dev| (tested magnitude-spanning data follows the law, uniform
    * price-style data fails it; both are useful answers).
    *
    * The first significant digit is extracted from the value's decimal
    * STRING form (first [1-9] character) — pure integer/string logic:
    * no log10/pow float boundary where 999.99…/1000 could flip a digit
    * between engines. Shares are single double divisions of exact
    * counts, expectations are SPELLED LITERALS (the range_vol no-libm
    * rule: no engine's log evaluates in the compare), rounded at
    * emission. Scale: one pruned scan into a 9-group map-side-combined
    * aggregation; digits with no rows still emit (0 share) via the
    * broadcast digit spine.
    */
  def benford(df: DataFrame, c: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // round-6 literals of log10(1+1/d), d = 1..9
    val expected = Seq(0.30103, 0.176091, 0.124939, 0.09691, 0.079181,
      0.066947, 0.057992, 0.051153, 0.045757)
    val spine = expected.zipWithIndex
      .map { case (e, i) => (i + 1, e) }.toDF("digit", "expected")
    // the 9-row count table feeds both the total and the spine join —
    // cut it so the fact scan runs ONCE, not once per consumer
    val counts = graft.core.Materialize.once(df
      .where(col(c).isNotNull && col(c) > 0)
      .select(regexp_extract(col(c).cast("string"), "([1-9])", 1)
        .cast("int").as("digit"))
      .where(col("digit").isNotNull)
      .groupBy(col("digit")).agg(count(lit(1)).as("n")))
    val total = counts.agg(sum(col("n")).as("tot"))
    broadcast(spine)
      .join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"),
        coalesce(col("n"), lit(0L)).as("n"),
        round(coalesce(col("n"), lit(0L)).cast("double") /
          when(col("tot") > 0, col("tot").cast("double")), 6).as("share"),
        col("expected"))
      .withColumn("dev", round(col("share") - col("expected"), 6))
  }

  /** Hot-key diagnostic for a join/group key — the pre-flight that sizes
    * operators.SaltedJoin's salt factor instead of guessing it: per-key
    * counts, the top-N heaviest keys, and per-key skew stats against the
    * MEAN key load. `skew_x` = cnt/avg (how many average keys this one
    * weighs); `salt_factor` = ceil(skew_x) — the number of salt buckets
    * that spreads the key back to roughly average-task load. A key with
    * skew_x ≈ 1 needs no salting; the 100 TB practice is to feed the
    * keys this report surfaces into the salted path and leave the rest
    * on the plain co-partitioned join.
    *
    * Scale shape: ONE map-side-combined count aggregation over the fact
    * (the hot key partially aggregates before the shuffle — the
    * diagnostic itself cannot be skewed by the skew it measures); the
    * global stats are a 1-row broadcast; the top-N is a TakeOrdered
    * bounded heap, never a global sort.
    */
  def skewReport(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"))
    counts.orderBy(col("cnt").desc, col(key)).limit(topN)
      .crossJoin(broadcast(stats))
      .select(col(key), col("cnt"), col("n_keys"), col("n_rows"),
        col("max_cnt"),
        round(col("cnt").cast("double") / col("n_rows"), 6).as("share"),
        round(col("cnt").cast("double") * col("n_keys") / col("n_rows"), 6)
          .as("skew_x"),
        ceil(col("cnt").cast("double") * col("n_keys") / col("n_rows"))
          .cast("long").as("salt_factor"))
  }
}
