package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact global ranking WITHOUT a single-partition window. A plain
  * `row_number().over(Window.orderBy(...))` collapses the whole dataset
  * into one task — the classic 100 TB scale-killer. Here the frame is
  * range-partitioned on the sort key (so partition i's rows all precede
  * partition i+1's), sorted within partitions, and `zipWithIndex` turns
  * per-partition positions into global ranks with one lightweight
  * count-per-partition job — every partition stays parallel.
  */
object Rank {

  /** Appends a 1-based global `rank` column under the total order given by
    * `order` (callers must pass a tie-free key list for determinism).
    */
  def withGlobalRank(df: DataFrame, order: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    // NOT cut before zipWithIndex (measured and rejected): its
    // count-per-partition job and the later consumption share the same
    // RDD, so Spark's stage skipping reuses the range-shuffle files —
    // only the shuffle-READ + local sort re-runs, which is cheaper than
    // a localCheckpoint write+read of the whole sorted frame
    // (corpus_shuffle 0.26→0.85 s, heaps_curve 0.46→1.74 s with the cut)
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = sorted.schema.add("rank", LongType, nullable = false)
    val ranked = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }

  /** Appends `rank` and an SQL-standard NTILE bucket (1..k: the first
    * `n mod k` buckets take one extra row) computed ARITHMETICALLY from
    * the global rank — same result as `ntile(k) OVER (ORDER BY ...)`,
    * no single-partition window. The total count rides as a broadcast
    * 1-row aggregate over the (materialized-once) ranked frame.
    */
  def withNtile(df: DataFrame, k: Int, order: Seq[Column],
                tileName: String = "tile"): DataFrame = {
    val ranked = graft.core.Materialize.once(withGlobalRank(df, order))
    val total = ranked.agg(max(col("rank")).as("n_total"))
    // n = qk + r: buckets 1..r have q+1 rows, buckets r+1..k have q rows
    val q = floor(col("n_total") / k).cast("long")
    val r = col("n_total") % k
    val cut = r * (q + 1)
    ranked.crossJoin(broadcast(total))
      .withColumn(tileName,
        when(col("rank") <= cut,
          floor((col("rank") - 1) / (q + 1)).cast("long") + 1)
          .otherwise(r + floor((col("rank") - cut - 1) / q).cast("long") + 1))
      .drop("n_total")
  }
}
