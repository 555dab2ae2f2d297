package graft.core

import org.apache.spark.sql.DataFrame

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
  */
object Materialize {

  /** LAZY cut: materialization folds into the NEXT action on the returned
    * frame — no dedicated checkpoint job. Use for a frame consumed by
    * several branches of ONE query (per-branch pushed-down filters
    * de-canonicalize subtrees, so ReuseExchange never fires on its own).
    */
  def once(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(false)
    else df.localCheckpoint(false)

  /** EAGER cut: materializes now. Use between iterative rounds where the
    * frame seeds the next round's plan and must not grow lineage.
    */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
