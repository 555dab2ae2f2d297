package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a MERGEABLE two-phase aggregate —
  * the 100 TB heavy-hitters operator: each map task summarizes its
  * partition into at most k−1 counters before the shuffle, merges are
  * counter sums followed by the standard k-th-largest offset subtraction,
  * and the guarantee survives both phases: every item with true frequency
  * > n/k is present in the output, and each reported estimate e satisfies
  * true − n/k ≤ e ≤ true. (Agarwal et al.'s mergeable-summaries result —
  * the property that makes the sketch distributable at all.)
  *
  * The estimates themselves depend on merge order (like any MG sketch),
  * so the CORRECTNESS surface is the contract, not the raw counters —
  * `heavy_hitters` emits the guarantee as oracle-checkable booleans over
  * the true heavy-hitter set, the approx_distinct pattern.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], term: String): Map[String, Long] =
    buf.get(term) match {
      case Some(c) => buf.updated(term, c + 1)
      case None if buf.size < k - 1 => buf.updated(term, 1L)
      case None =>
        // decrement-all step: drop zeros (classic MG; O(k) per eviction)
        buf.iterator.map { case (t, c) => (t, c - 1) }
          .filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k - 1) sum
    else {
      // subtract the k-th largest counter from everything, drop ≤0 —
      // the mergeable-summaries offset step preserving the error bound
      val kth = sum.values.toSeq.sorted(Ordering[Long].reverse).apply(k - 1)
      sum.iterator.map { case (t, c) => (t, c - kth) }
        .filter(_._2 > 0).toMap
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
    org.apache.spark.sql.Encoders.kryo[Map[String, Long]]
  override def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
