package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) candidate flowing into the top-k accumulator. */
case class ScoredId(cos: Double, id: Long)

/** Bounded top-k aggregator: keeps the k best (cos desc, id asc) rows per
  * group. Registered via `functions.udaf`, Spark plans it as a regular
  * two-phase aggregate — each map task reduces its partition to at most k
  * rows per group BEFORE the shuffle, so a query scoring n candidates
  * shuffles O(k × partitions) rows per group instead of all n (the
  * row_number-window formulation shuffles and sorts everything).
  *
  * Determinism: the ordering (cos desc, then id asc) is total for distinct
  * ids, so results are independent of partitioning and merge order.
  */
class TopKByScore(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def better(x: ScoredId, y: ScoredId): Boolean =
    x.cos > y.cos || (x.cos == y.cos && x.id < y.id)

  override def zero: Seq[ScoredId] = Vector.empty

  // buffer is kept sorted (best first); insertion splices at the ordered
  // position — O(k) per accepted row, no re-sort (k is small and the
  // reduce path is the 100 TB hot loop)
  override def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] =
    if (buf.size >= k && better(buf.last, in)) buf
    else {
      val (above, below) = buf.span(better(_, in))
      ((above :+ in) ++ below).take(k)
    }

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] = {
    // merge two sorted buffers, truncate to k
    val out = Vector.newBuilder[ScoredId]
    var (x, y) = (a, b)
    var n = 0
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && better(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

  override def bufferEncoder: ExpressionEncoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()

  override def outputEncoder: ExpressionEncoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}

/** One scored term flowing into the per-doc top-k accumulator. */
case class ScoredTerm(score: Double, term: String, tf: Long)

/** Bounded top-k over (score desc, term asc) ranked TERMS — the same
  * map-side-bounded shape as TopKByScore, for tfidfTopTerms' per-doc
  * ranking: a row_number window sorts every doc's full vocabulary in one
  * partition (a pathological doc with a huge distinct vocabulary becomes
  * one fat sorted partition), while this aggregate caps per-doc work and
  * shuffle volume at O(k) rows per map task. Ordering is total for
  * distinct terms, so the result is partitioning-independent.
  */
class TopKTermsByScore(k: Int)
    extends Aggregator[ScoredTerm, Seq[ScoredTerm], Seq[ScoredTerm]] {

  private def better(x: ScoredTerm, y: ScoredTerm): Boolean =
    x.score > y.score || (x.score == y.score && x.term < y.term)

  override def zero: Seq[ScoredTerm] = Vector.empty

  override def reduce(buf: Seq[ScoredTerm], in: ScoredTerm): Seq[ScoredTerm] =
    if (buf.size >= k && better(buf.last, in)) buf
    else {
      val (above, below) = buf.span(better(_, in))
      ((above :+ in) ++ below).take(k)
    }

  override def merge(a: Seq[ScoredTerm], b: Seq[ScoredTerm]): Seq[ScoredTerm] = {
    val out = Vector.newBuilder[ScoredTerm]
    var (x, y) = (a, b)
    var n = 0
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && better(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[ScoredTerm]): Seq[ScoredTerm] = r

  override def bufferEncoder: ExpressionEncoder[Seq[ScoredTerm]] =
    ExpressionEncoder[Seq[ScoredTerm]]()

  override def outputEncoder: ExpressionEncoder[Seq[ScoredTerm]] =
    ExpressionEncoder[Seq[ScoredTerm]]()
}
