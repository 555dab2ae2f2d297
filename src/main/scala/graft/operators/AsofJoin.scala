package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed as-of (backward) join: for each left row, the latest right
  * row with the same key and right.ts <= left.ts.
  *
  * Spark-first scale design: instead of an inequality join (O(n·m) per key)
  * or broadcasting a side, both inputs are unioned into one stream tagged
  * by side, hash-partitioned on the key, sorted in-partition by
  * (key, ts, side), and swept once per partition carrying the last-seen
  * right row per key. One shuffle, O(n+m) work, no state beyond a single
  * row — the same shape survives 1000 executors and 100 TB. (Composing
  * built-ins — join + max_by — is quadratic per key and rejected; see
  * SURVEY.md §4.)
  */
object AsofJoin {

  /** As-of join as a first-class physical operator (graft.plans
    * .AsofJoinExec): declares ClusteredDistribution + (key, ts) ordering
    * and lets EnsureRequirements plan the exchanges — which it can then
    * ELIDE when a child is already hash-partitioned or bucketed on the
    * key, unlike the hand-repartitioned `join` below. Same semantics,
    * spec-checked equal.
    *
    * `leftOuter = true` gives ASOF LEFT JOIN semantics: every left row is
    * preserved; lefts with no at-or-before right match (or a null
    * key/timestamp) emit null right columns — the portfolio/attribution
    * shape where "no prior quote yet" must stay visible. Same plan, same
    * single sweep; the physical operator just emits a null-filled right
    * side instead of dropping the row.
    *
    * `forward = true` matches each left to the EARLIEST right with
    * right.ts >= left.ts instead (next fill after the order, next
    * observation after the query point). Same co-sorted sweep; see
    * AsofJoinNode. Composes with `leftOuter`.
    *
    * `nearest = true` picks whichever side of the left timestamp is
    * closer (ties go backward) — the sensor-alignment shape where the
    * closest observation, not the preceding one, is wanted. Composes with
    * `leftOuter`; mutually exclusive with `forward`.
    */
  def joinNative(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String, rightTs: String, prefix: String = "r_",
                 leftOuter: Boolean = false, forward: Boolean = false,
                 nearest: Boolean = false): DataFrame =
    joinNativeKeys(left, right, Seq(key), leftTs, rightTs, prefix,
      leftOuter, forward, nearest)

  /** COMPOSITE-key form (DuckDB's ASOF accepts several equality
    * conditions next to the ts inequality): the operator clusters on the
    * whole key tuple and sweeps tuples lexicographically — same plan
    * shape, same O(n+m) sweep; a null in ANY key component never matches.
    */
  def joinNativeKeys(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String, prefix: String = "r_",
                     leftOuter: Boolean = false, forward: Boolean = false,
                     nearest: Boolean = false): DataFrame = {
    require(!(forward && nearest), "forward and nearest are mutually exclusive")
    require(keys.nonEmpty, "as-of join needs at least one key column")
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.graftbridge.Bridge
    val spark = left.sparkSession
    // idempotent runtime registration (synchronized: check-then-append on
    // shared session state). Sessions built with GraftExtensions already
    // carry the strategy via injectPlannerStrategy; a duplicate candidate
    // would be harmless (the planner takes the first plan) but is avoided.
    spark.synchronized {
      if (!spark.experimental.extraStrategies.contains(graft.plans.AsofJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ graft.plans.AsofJoinStrategy
    }
    val lPlan = Bridge.analyzed(left)
    // fresh exprIds on the right side: both inputs may derive from the
    // same scan (self-join), and DeduplicateRelations doesn't visit
    // custom nodes
    val rPlan0 = Bridge.analyzed(right)
    val rPlan = Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
    Bridge.ofRows(spark,
      graft.plans.AsofJoinNode(lPlan, rPlan, keys, leftTs, rightTs, prefix,
        leftOuter, forward, nearest))
  }

  /** Inner backward as-of join (composed formulation: tag-union both
    * sides, one repartition, per-partition sweep). Right columns are
    * emitted with `prefix`. At equal timestamps the right row is visible
    * to the left row ("at-or-before").
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, prefix: String = "r_"): DataFrame = {
    val lStruct = struct(left.columns.toIndexedSeq.map(left(_)): _*)
    val rStruct = struct(right.columns.toIndexedSeq.map(right(_)): _*)
    val lType = left.schema
    val rType = right.schema

    val lTagged = left.select(
      left(key).as("_k"), left(leftTs).as("_t"), lit(1).as("_side"),
      lStruct.as("_l"), lit(null).cast(rType).as("_r"))
    val rTagged = right.select(
      right(key).as("_k"), right(rightTs).as("_t"), lit(0).as("_side"),
      lit(null).cast(lType).as("_l"), rStruct.as("_r"))

    // final `_r` sort key: a deterministic tiebreak when two right rows
    // share (key, ts) — the struct-greatest right row wins, independent of
    // physical row order. (Requires right columns to be orderable types,
    // which ASOF semantics already effectively assume.)
    val unioned = lTagged.unionByName(rTagged)
      .repartition(col("_k"))
      .sortWithinPartitions(col("_k"), col("_t"), col("_side"), col("_r"))

    val outSchema = StructType(
      left.schema.fields ++
        right.schema.fields.map(f => f.copy(name = prefix + f.name)))
    val outEnc = Encoders.row(outSchema)
    val nLeft = left.schema.size
    val nRight = right.schema.size

    unioned.mapPartitions { it =>
      var curKey: Any = null
      var lastRight: Row = null
      it.flatMap { row =>
        val k = row.get(0)
        if (k == null) Iterator.empty // SQL join semantics: nulls never match
        else {
        if (k != curKey) { curKey = k; lastRight = null }
        if (row.getInt(2) == 0) { // right side: remember, emit nothing
          lastRight = row.getStruct(4)
          Iterator.empty
        } else if (lastRight != null) {
          val l = row.getStruct(3)
          val vals = new Array[Any](nLeft + nRight)
          var i = 0
          while (i < nLeft) { vals(i) = l.get(i); i += 1 }
          i = 0
          while (i < nRight) { vals(nLeft + i) = lastRight.get(i); i += 1 }
          Iterator.single(
            new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
              vals, outSchema): Row)
        } else Iterator.empty
        }
      }
    }(outEnc)
  }
}
