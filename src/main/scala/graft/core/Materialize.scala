package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Lineage cuts for multi-branch / iterative reuse — the single source of
  * truth for the engine's materialization policy (see BENCH_NOTES round-3
  * ledger for the measured comparison vs DataFrame persist and eager
  * checkpointing).
  *
  * Reliable checkpoint when the session has a checkpoint dir (cluster
  * fault tolerance — local checkpoint blocks die with their executor,
  * which at 100 TB with dynamic allocation means a failed job); an
  * executor-local checkpoint otherwise (bench/local mode). Local
  * checkpoints store raw UnsafeRows — unlike DataFrame persist, which
  * pays InMemoryRelation's columnar-compression CPU.
  *
  * Every cut is recorded in a session-lifetime registry so callers can
  * RELEASE the storage when the query that created it finishes:
  * local-checkpoint blocks are MEMORY_AND_DISK-persisted RDDs, and a
  * long-lived session (a notebook, a query service, the 125-query bench
  * loop) that never unpersists them accumulates every pipeline's
  * materialized frames until memory pressure evicts working sets to disk
  * under unrelated queries. Call [[release]] at each query boundary.
  *
  * CONTRACT: a localCheckpoint truncates lineage, so after `release()`
  * the data of previously-returned materialized frames is gone for good —
  * any further action on one of them fails. Release only at a boundary
  * where the query's outputs have been fully consumed (collected /
  * written / counted). Reliable checkpoints (cluster mode) keep their
  * files; for those, release is a no-op and file cleanup belongs to
  * `spark.cleaner.referenceTracking.cleanCheckpoints`.
  */
object Materialize {

  /** RDD ids of every checkpoint block this registry has handed out and
    * not yet released. Ids only — holding the RDD objects themselves
    * would be its own driver-side leak.
    */
  private val trackedIds = scala.collection.mutable.LinkedHashSet[Int]()

  private def track(df: DataFrame): DataFrame = {
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => trackedIds.synchronized { trackedIds += lr.rdd.id }
      case _              => () // reliable checkpoint → no persisted block
    }
    df
  }

  /** LAZY cut: materialization folds into the NEXT action on the returned
    * frame — no dedicated checkpoint job. Use for a frame consumed by
    * several branches of ONE query (per-branch pushed-down filters
    * de-canonicalize subtrees, so ReuseExchange never fires on its own).
    */
  def once(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(false)
    else track(df.localCheckpoint(false))

  /** EAGER cut: materializes now. Use between iterative rounds where the
    * frame seeds the next round's plan and must not grow lineage.
    */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else track(df.localCheckpoint())

  /** Number of tracked checkpoint blocks still persisted in the context —
    * the bench loop asserts this returns to zero between queries.
    */
  def liveBlockCount(spark: SparkSession): Int = {
    val persisted = spark.sparkContext.getPersistentRDDs
    trackedIds.synchronized { trackedIds.count(persisted.contains) }
  }

  /** Unpersist every tracked checkpoint block and clear the registry.
    * Non-blocking by default — the BlockManager drops the blocks
    * asynchronously, which is what a query boundary wants.
    */
  def release(spark: SparkSession, blocking: Boolean = false): Unit = {
    val ids = trackedIds.synchronized {
      val snapshot = trackedIds.toVector; trackedIds.clear(); snapshot
    }
    val persisted = spark.sparkContext.getPersistentRDDs
    ids.foreach(id => persisted.get(id).foreach(_.unpersist(blocking)))
  }
}
