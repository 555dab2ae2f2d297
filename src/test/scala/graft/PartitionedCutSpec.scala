package graft

import graft.core.Materialize
import org.apache.spark.sql.functions._

/** Contract of the declared-layout cut (Materialize.cutPartitioned /
  * oncePartitioned, r16) and the skew guard for the iterative kernels'
  * single-key layouts (r15 verdict ask #3).
  *
  * Background: a plain checkpoint's LogicalRDD reads UnknownPartitioning
  * under AQE, so every consumer re-exchanges the materialized frame. The
  * declared cut re-wraps it with the HashPartitioning the caller
  * guaranteed via a closing repartition(n, keys) — making cross-cut
  * co-partitioned joins real. These specs pin (1) correctness equals the
  * undeclared computation, (2) the co-partitioned join truly elides its
  * exchanges, (3) the empty-input hazard (AQE empty propagation yields a
  * 0-partition rdd; declaring (keys, 1) there would elide the
  * single-partition normalization and a global aggregate would return
  * zero rows), and (4) the skew exposure of the kernels' single-key
  * layouts: the shuffled-hash BUILD side (unique-key labels) stays
  * uniform even when the STREAMED side carries an adversarial hot key.
  */
class PartitionedCutSpec extends SparkSpec {

  private def partitionRowCounts(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.groupBy(spark_partition_id().as("p")).count()
      .collect().map(_.getLong(1)).toSeq

  test("declared cut reports its hash layout and a co-partitioned join elides both exchanges") {
    Materialize.releaseAll(spark, blocking = true)
    import spark.implicits._
    val n = 3
    val left = Materialize.cutPartitioned(
      spark.range(0, 1000).select(col("id").as("k"), (col("id") % 7).as("x"))
        .repartition(n, col("k")),
      Seq("k"), n)
    val right = Materialize.cutPartitioned(
      spark.range(0, 1000, 2).select(col("id").as("k"), (col("id") * 3).as("y"))
        .repartition(n, col("k")),
      Seq("k"), n)
    assert(left.queryExecution.executedPlan.outputPartitioning.toString
      .startsWith("hashpartitioning(k"), "declared layout must be visible to the planner")
    val joined = left.join(right.hint("shuffle_hash"), Seq("k"))
    val cnt = joined.count()
    assert(cnt == 500)
    // the executed join plan must contain NO exchange: both sides sit in
    // the same declared (k, n) layout
    val planStr = joined.queryExecution.executedPlan.toString
    assert(!planStr.contains("Exchange"),
      s"co-partitioned declared cuts must not re-exchange:\n$planStr")
    assert(planStr.contains("ShuffledHashJoin"), s"hint must hold:\n$planStr")
    // correctness vs the undeclared computation
    val expect = spark.range(0, 1000).select(col("id").as("k"), (col("id") % 7).as("x"))
      .join(spark.range(0, 1000, 2).select(col("id").as("k"), (col("id") * 3).as("y")), Seq("k"))
      .agg(sum(col("x") + col("y"))).head().getLong(0)
    val got = joined.agg(sum(col("x") + col("y"))).head().getLong(0)
    assert(got == expect)
    Materialize.releaseAll(spark, blocking = true)
  }

  test("declared cut on an EMPTY frame falls back and global aggregates still return one row") {
    Materialize.releaseAll(spark, blocking = true)
    val empty = Materialize.cutPartitioned(
      spark.range(100).select(col("id").as("k"))
        .where(col("k") < 0) // empty after AQE propagation
        .repartition(1, col("k")),
      Seq("k"), 1)
    // the r16 bug shape: a 0-partition rdd declared as (k, 1) satisfied
    // SinglePartition, the exchange was elided, and head() saw no rows
    val row = empty.agg(coalesce(sum(col("k")), lit(-1L)).as("s")).head()
    assert(row.getLong(0) == -1L, "empty global aggregate must still emit its one row")
    assert(empty.count() == 0L)
    Materialize.releaseAll(spark, blocking = true)
  }

  test("skew guard: clusters() on an adversarial star graph — hub streams, build side stays uniform") {
    Materialize.releaseAll(spark, blocking = true)
    import spark.implicits._
    val nLeaves = 4096
    // star: node 0 is a mega-degree hub (the single-key layout's worst
    // case — every symmetrized edge (i, 0) hashes to ONE partition of the
    // b-layout). The kernel must stay correct, and the memory-relevant
    // side — the shuffled-hash BUILD (labels, unique doc_id) — must stay
    // uniform: skew rides the STREAMED side only.
    val pairs = (1 to nLeaves).map(i => (0L, i.toLong)).toDF("id1", "id2")
    val labels = graft.ops.Dedup.clusters(pairs)
    assert(labels.count() == nLeaves + 1)
    assert(labels.where(col("cluster_id") =!= 0L).count() == 0,
      "every node of the star must land in component 0")
    // rebuild the kernel's label layout shape (unique key, same
    // repartition) and measure its partition histogram: unique-key hash
    // layouts stay uniform under any input skew — this is what bounds
    // the shuffled-hash build memory at scale
    val n = 8
    val labelLayout = labels.repartition(n, col("doc_id"))
    val counts = partitionRowCounts(labelLayout).sorted
    val max = counts.max.toDouble
    val med = counts(counts.size / 2).toDouble
    info(f"label-layout partitions: max=$max%.0f median=$med%.0f ratio=${max / math.max(med, 1)}%.2f")
    assert(max <= 4 * math.max(med, 1.0) + 64,
      s"unique-key build layout must stay uniform; got $counts")
    Materialize.releaseAll(spark, blocking = true)
  }

  test("skew guard: LSH pair fan-out under a mega identical-text bucket stays linear (the documented caps)") {
    Materialize.releaseAll(spark, blocking = true)
    import spark.implicits._
    // one 600-doc exact-duplicate cluster: every band bucket holds all
    // 600 docs (bucket_n > maxBucket=100 — the 'big' path). The caps
    // guarantee TOTAL pairs O(m·(numReps+2)) per band, i.e. linear in m,
    // never the m² a naive bucket join would emit; the hottest id1 (a
    // hash-chosen representative) carries O(m) pairs — streamed, never a
    // hash-join build side in the verify joins.
    val m = 600
    val docs = (0 until m).map(i =>
      (i.toLong, "the same exact duplicated text payload appears here " +
        "with enough words to shingle properly across every document"))
      .toDF("doc_id", "text")
    val pairs = graft.ops.Dedup.minhashLsh(docs)
      .select(col("id1"), col("id2"))
    val total = pairs.count()
    val bands = 16
    val numReps = 8
    val bound = bands.toLong * m * (numReps + 2)
    info(s"mega-bucket pairs: total=$total linear bound=$bound (m=$m)")
    assert(total > 0 && total <= bound,
      s"pair generation must stay linear in bucket size: $total > $bound")
    // hot-key fan-out: max pairs per id1 vs median — documents that the
    // hot key is O(m) (a representative) while typical keys stay at the
    // ring/rep constant; the layout's largest partition is bounded by
    // (#reps-per-partition)·O(m), not by m²
    val perKey = pairs.groupBy(col("id1")).count().collect().map(_.getLong(1)).sorted
    info(f"per-id1 fan-out: max=${perKey.max} median=${perKey(perKey.length / 2)} " +
      f"(numReps+2 ring/rep constant per band = ${numReps + 2})")
    assert(perKey.max <= 2L * m * bands,
      "hot-key fan-out must stay O(m) per band, never O(m^2)")
    Materialize.releaseAll(spark, blocking = true)
  }
}
