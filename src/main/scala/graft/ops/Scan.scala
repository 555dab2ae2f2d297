package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Exact per-group EXCLUSIVE prefix sums without a per-group window — the
  * distributed scan primitive. A running total via
  * `sum(...) OVER (PARTITION BY group ORDER BY ...)` puts each group in
  * ONE task; with a handful of giant strata (languages, sources) that is
  * the same 100 TB scale-killer as an unpartitioned window, just split a
  * few ways. Here the frame is range-partitioned on (group…, order…) so
  * a giant group SPANS partitions and stays parallel, and the scan is the
  * classic two-pass algorithm:
  *
  *  1. one pass computes each partition's per-group sum (a tiny
  *     (partition × resident groups) table collected to the driver —
  *     group cardinality is dim-scale by assumption);
  *  2. the driver prefix-sums those into per-(partition, group) starting
  *     offsets, broadcast back;
  *  3. a second pass streams each partition once more, carrying one
  *     running counter per resident group.
  *
  * Both passes are sequential streams over sorted partitions — O(1) state
  * per group per task, no shuffle beyond the range partitioning. (The
  * second pass recomputes the sorted frame rather than caching it — the
  * same cost profile as `zipWithIndex` in ops.Rank, and at 100 TB a
  * recompute of a map-side projection is cheaper than caching it.)
  */
object Scan {

  /** Appends `out` = the exclusive running total of `value` (a LONG
    * column; nulls are not allowed) within each `group`, ordered by
    * `order` (pass tie-free keys for determinism).
    */
  def withRunningTotal(df: DataFrame, group: Seq[String], order: Seq[String],
                       value: String, out: String = "cum_before"): DataFrame = {
    val spark = df.sparkSession
    val sortCols = (group ++ order).map(col)
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val gIdx = group.map(sorted.schema.fieldIndex).toArray
    val vIdx = sorted.schema.fieldIndex(value)
    val rdd = sorted.rdd

    // pass 1: per-partition per-group sums (dim-scale table) → driver
    val partSums: Array[Map[Seq[Any], Long]] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val sums = scala.collection.mutable.LinkedHashMap[Seq[Any], Long]()
        it.foreach { r =>
          val g = gIdx.map(r.get(_): Any).toSeq
          sums.update(g, sums.getOrElse(g, 0L) + r.getLong(vIdx))
        }
        Iterator.single((pid, sums.toMap))
      }
      .collect().sortBy(_._1).map(_._2)

    // driver: starting offset of each group in each partition
    val running = scala.collection.mutable.Map[Seq[Any], Long]()
    val offsets: Array[Map[Seq[Any], Long]] = partSums.map { m =>
      val off = m.keysIterator.map(k => k -> running.getOrElse(k, 0L)).toMap
      m.foreach { case (k, v) => running.update(k, running.getOrElse(k, 0L) + v) }
      off
    }
    val bc = spark.sparkContext.broadcast(offsets)

    // pass 2: stream each partition with its groups' starting offsets
    val scanned = rdd.mapPartitionsWithIndex { (pid, it) =>
      val run = scala.collection.mutable.Map[Seq[Any], Long]() ++= bc.value(pid)
      it.map { r =>
        val g = gIdx.map(r.get(_): Any).toSeq
        val before = run.getOrElse(g, 0L)
        run.update(g, before + r.getLong(vIdx))
        Row.fromSeq(r.toSeq :+ before)
      }
    }
    spark.createDataFrame(scanned, schema)
  }
}
