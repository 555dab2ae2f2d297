package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Whole-operator as-of join as first-class Catalyst machinery: a logical
  * node, a planner strategy, and a physical operator that DECLARES its
  * distribution/ordering needs instead of hand-building them — Spark's
  * EnsureRequirements then co-partitions both children on the key(s) and
  * sorts each by (keys…, ts), exactly like a SortMergeJoin, and can elide
  * either shuffle/sort when a child is already partitioned or bucketed
  * that way (something the RDD-style union+repartition formulation in
  * graft.operators.AsofJoin can never benefit from).
  *
  * Execution is a per-partition merge sweep: advance the right iterator
  * while right.ts <= left.ts for the current key tuple, carrying one
  * buffered right row — O(n+m) per partition, state of a single row.
  * Right rows tied on (keys…, ts) resolve by their trailing sort columns,
  * so output is deterministic regardless of physical input order.
  *
  * `keys` may be COMPOSITE (DuckDB's ASOF accepts several equality
  * conditions next to the ts inequality): all key columns must share
  * names between the sides; distribution clusters on the whole tuple and
  * the sweep compares tuples lexicographically in the declared order.
  * A null in ANY key component never matches (SQL equality semantics).
  *
  * `forward = true` flips the direction: each left matches the EARLIEST
  * right with right.ts >= left.ts (next quote after the event). Same
  * ascending co-sort, same single sweep — the iterator skips rights
  * strictly before the left timestamp and PEEKS the head instead of
  * consuming it (later lefts, having later timestamps, can still match
  * the same right). `leftOuter` composes with either direction.
  *
  * `nearest = true` matches whichever of the two candidates — latest
  * at-or-before vs earliest after — sits closer in time (ties go
  * backward, so an exact-timestamp match always wins). One sweep still:
  * the backward candidate is carried like the backward join, the forward
  * candidate is the peeked head. Requires an integer-backed timestamp
  * (timestamps are epoch micros internally) because "closer" needs a
  * distance, not just an ordering.
  */
case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
                        keys: Seq[String], leftTs: String, rightTs: String,
                        prefix: String, leftOuter: Boolean = false,
                        forward: Boolean = false,
                        nearest: Boolean = false) extends BinaryNode {
  // left-outer: right columns become nullable (unmatched lefts emit nulls)
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(a =>
      a.withName(prefix + a.name).withNullability(a.nullable || leftOuter))
  // the operator consumes every child column it emits; without this,
  // ColumnPruning sees zero expression references (keys are names, not
  // exprs) and prunes the children empty under e.g. count()
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, keys, lts, rts, prefix, leftOuter, forward, nearest) =>
      def attr(p: LogicalPlan, name: String): Attribute =
        p.output.find(_.name == name).getOrElse(
          throw new IllegalArgumentException(s"column $name not found in ${p.output.map(_.name)}"))
      AsofJoinExec(keys.map(attr(l, _)), attr(l, lts),
        keys.map(attr(r, _)), attr(r, rts),
        prefix, leftOuter, forward, nearest, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(lKeys: Seq[Attribute], lTs: Attribute,
                        rKeys: Seq[Attribute], rTs: Attribute, prefix: String,
                        leftOuter: Boolean, forward: Boolean, nearest: Boolean,
                        left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  require(lKeys.nonEmpty && lKeys.size == rKeys.size,
    s"as-of join needs matching non-empty key lists (got $lKeys vs $rKeys)")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(a =>
      a.withName(prefix + a.name).withNullability(a.nullable || leftOuter))

  // co-partition both children on the key tuple (EnsureRequirements makes
  // the two hash partitionings compatible, or reuses existing ones)
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(lKeys), ClusteredDistribution(rKeys))

  // each child sorted by (keys…, ts); the right side additionally by its
  // remaining columns so (keys, ts) ties resolve deterministically
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    lKeys.map(SortOrder(_, Ascending)) :+ SortOrder(lTs, Ascending),
    rKeys.map(SortOrder(_, Ascending)) ++ Seq(SortOrder(rTs, Ascending)) ++
      right.output.filterNot(a => rKeys.exists(_.exprId == a.exprId) || a.exprId == rTs.exprId)
        .filter(a => org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(a.dataType))
        .map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdxs = lKeys.map(k => left.output.indexWhere(_.exprId == k.exprId)).toArray
    val lTsIdx = left.output.indexWhere(_.exprId == lTs.exprId)
    val rKeyIdxs = rKeys.map(k => right.output.indexWhere(_.exprId == k.exprId)).toArray
    val rTsIdx = right.output.indexWhere(_.exprId == rTs.exprId)
    val keyTypes = lKeys.map(_.dataType).toArray
    val nKeys = keyTypes.length
    val tsType = lTs.dataType
    val outAttrs = output
    // under left-outer the projection's right-side inputs can be null even
    // when the child attribute is non-nullable — bind them nullable so the
    // generated projection null-checks instead of reading garbage
    val inAttrs = left.output ++
      (if (leftOuter) right.output.map(_.withNullability(true)) else right.output)
    val nullRow: InternalRow =
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(right.output.size)
    val isLeftOuter = leftOuter
    val isForward = forward
    val isNearest = nearest
    // "nearest" needs a numeric time distance; timestamps are epoch-micros
    // longs internally, so integer-backed types are exactly the orderable
    // ones with a meaningful difference
    def tsLong(v: Any): Long = v match {
      case l: java.lang.Long => l
      case i: java.lang.Integer => i.toLong
      case other => throw new UnsupportedOperationException(
        s"nearest as-of requires an integer-backed timestamp, got ${other.getClass}")
    }

    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val kOrds: Array[Ordering[Any]] =
          keyTypes.map(TypeUtils.getInterpretedOrdering)
        val tOrd = TypeUtils.getInterpretedOrdering(tsType)
        val proj = UnsafeProjection.create(outAttrs, inAttrs)
        val joined = new JoinedRow
        val rBuf = rIter.buffered
        var lastKey: Array[Any] = null
        var lastRight: InternalRow = null
        var lastTs: Any = null

        // extract a key tuple; null if ANY component is null (never matches)
        def keysOf(row: InternalRow, idxs: Array[Int]): Array[Any] = {
          val out = new Array[Any](nKeys)
          var i = 0
          while (i < nKeys) {
            val v = row.get(idxs(i), keyTypes(i))
            if (v == null) return null
            out(i) = v
            i += 1
          }
          out
        }
        // lexicographic tuple compare in declared key order (matches the
        // required child ordering, so the merge sweep stays aligned)
        def keyCompare(a: Array[Any], b: Array[Any]): Int = {
          var i = 0
          while (i < nKeys) {
            val c = kOrds(i).compare(a(i), b(i))
            if (c != 0) return c
            i += 1
          }
          0
        }

        lIter.flatMap { l =>
          val lk = keysOf(l, lKeyIdxs)
          val lt = l.get(lTsIdx, tsType)
          if (lk == null || lt == null) {
            // nulls never match; left-outer still preserves the left row
            if (isLeftOuter) Iterator.single(proj(joined(l, nullRow)))
            else Iterator.empty
          } else if (isForward) {
            // skip rights strictly before (lk, lt); the head — if it still
            // has the left's key — is the earliest right at-or-after. PEEK,
            // don't consume: later lefts can match the same right.
            var advance = true
            while (advance && rBuf.hasNext) {
              val r = rBuf.head
              val rk = keysOf(r, rKeyIdxs)
              val rt = r.get(rTsIdx, tsType)
              if (rk == null || rt == null) { rBuf.next() } // skip null rows
              else {
                val c = keyCompare(rk, lk)
                if (c < 0 || (c == 0 && tOrd.compare(rt, lt) < 0)) rBuf.next()
                else advance = false
              }
            }
            val matched = rBuf.hasNext && {
              val rk = keysOf(rBuf.head, rKeyIdxs)
              rk != null && keyCompare(rk, lk) == 0
            }
            if (matched) Iterator.single(proj(joined(l, rBuf.head)))
            else if (isLeftOuter) Iterator.single(proj(joined(l, nullRow)))
            else Iterator.empty
          } else {
            // consume right rows at-or-before (lk, lt); later keys stay put
            var advance = true
            while (advance && rBuf.hasNext) {
              val r = rBuf.head
              val rk = keysOf(r, rKeyIdxs)
              val rt = r.get(rTsIdx, tsType)
              if (rk == null || rt == null) { rBuf.next() } // skip null rows
              else {
                val c = keyCompare(rk, lk)
                if (c < 0 || (c == 0 && tOrd.compare(rt, lt) <= 0)) {
                  rBuf.next()
                  lastKey = rk
                  lastRight = r.copy()
                  lastTs = rt
                } else advance = false
              }
            }
            val backOk = lastRight != null && lastKey != null &&
              keyCompare(lastKey, lk) == 0
            if (isNearest) {
              // forward candidate = the peeked head (first right after lt),
              // if it still carries the left's key
              val fwdOk = rBuf.hasNext && {
                val rk = keysOf(rBuf.head, rKeyIdxs)
                rk != null && keyCompare(rk, lk) == 0
              }
              if (backOk && fwdOk) {
                val db = tsLong(lt) - tsLong(lastTs)
                val df = tsLong(rBuf.head.get(rTsIdx, tsType)) - tsLong(lt)
                val r = if (db <= df) lastRight else rBuf.head
                Iterator.single(proj(joined(l, r)))
              } else if (backOk) Iterator.single(proj(joined(l, lastRight)))
              else if (fwdOk) Iterator.single(proj(joined(l, rBuf.head)))
              else if (isLeftOuter) Iterator.single(proj(joined(l, nullRow)))
              else Iterator.empty
            } else if (backOk)
              Iterator.single(proj(joined(l, lastRight)))
            else if (isLeftOuter) Iterator.single(proj(joined(l, nullRow)))
            else Iterator.empty
          }
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
