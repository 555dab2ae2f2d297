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
