package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

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
  *
  * The aggregation buffer is a mutable HashMap updated in place —
  * Aggregators own their buffer between serializations, so per-element
  * reduce is O(1) amortized and the O(k) rebuild happens only on the
  * (rare) eviction/offset steps, not on every element like an immutable
  * `Map.updated` chain would.
  */
class MisraGries(k: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  /** Subtract `offset` from every counter in place, dropping ≤0 entries.
    * (Snapshot the keys first — removing while iterating a live keysIterator
    * is undefined for HashMap.)
    */
  private def subtractAll(buf: mutable.HashMap[String, Long], offset: Long): Unit = {
    val keys = buf.keysIterator.toArray
    var i = 0
    while (i < keys.length) {
      val t = keys(i)
      val c = buf(t) - offset
      if (c > 0) buf(t) = c else buf -= t
      i += 1
    }
  }

  override def reduce(buf: mutable.HashMap[String, Long], term: String): mutable.HashMap[String, Long] = {
    buf.get(term) match {
      case Some(c) => buf(term) = c + 1
      case None if buf.size < k - 1 => buf(term) = 1L
      case None => subtractAll(buf, 1L) // classic MG decrement-all step
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a(t) = a.getOrElse(t, 0L) + c }
    if (a.size > k - 1) {
      // subtract the k-th largest counter from everything, drop ≤0 —
      // the mergeable-summaries offset step preserving the error bound
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      subtractAll(a, counts(counts.length - k))
    }
    a
  }

  override def finish(buf: mutable.HashMap[String, Long]): Map[String, Long] = buf.toMap

  override def bufferEncoder: org.apache.spark.sql.Encoder[mutable.HashMap[String, Long]] =
    org.apache.spark.sql.Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
