package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Single-pass column profiler — the data-quality sweep a training-data
  * pipeline runs before ingest. One aggregation job produces one row per
  * column (null rate, distinct estimate, numeric min/max/mean, string
  * length stats); no per-column jobs, no collect loops.
  */
object Profile {

  def profile(df: DataFrame): DataFrame = {
    val total = count(lit(1))
    val perCol: Seq[Column] = df.schema.fields.zipWithIndex.map { case (f, i) =>
      val c = col(f.name)
      val numeric = f.dataType.isInstanceOf[NumericType]
      val stringy = f.dataType == StringType
      struct(
        lit(f.name).as("column"),
        lit(f.dataType.simpleString).as("dtype"),
        total.as("n_rows"),
        sum(when(c.isNull, 1L).otherwise(0L)).as("n_null"),
        approx_count_distinct(c).as("approx_distinct"),
        (if (numeric) min(c).cast("double") else lit(null).cast("double")).as("min_num"),
        (if (numeric) max(c).cast("double") else lit(null).cast("double")).as("max_num"),
        (if (numeric) avg(c.cast("double")) else lit(null).cast("double")).as("mean_num"),
        (if (stringy) min(length(c)).cast("long") else lit(null).cast("long")).as("min_len"),
        (if (stringy) max(length(c)).cast("long") else lit(null).cast("long")).as("max_len"))
        .as(s"c$i")
    }.toSeq
    df.agg(perCol.head, perCol.tail: _*)
      .select(explode(array(df.schema.fields.indices.map(i => col(s"c$i")): _*)))
      .select("col.*")
  }
}
