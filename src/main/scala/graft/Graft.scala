package graft

import graft.core.Tables
import graft.ops.Similarity
import org.apache.spark.sql.SparkSession

/** SQL surface: register the test star schema + the trade-stream mapping
  * as temp views and the native functions, so every engine capability is
  * reachable from `spark.sql(...)` as well as the typed API.
  */
object Graft {
  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "documents", "embeddings")

  // view registration is idempotent per (session, dir): re-registering
  // re-reads every parquet footer for schema inference (~0.8 s of pure
  // per-call setup measured at sf0.1 — 3× the asof query's own runtime),
  // so SQL-surface queries memoize it. Keyed weakly by session so a
  // stopped session's entry is collectable; a dir CHANGE on the same
  // session re-registers (createOrReplaceTempView overwrites).
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  def registerViews(spark: SparkSession, dir: String): Unit =
    if (registered.get(spark) != dir) {
      TableNames.foreach(n =>
        Tables.table(spark, dir, n).createOrReplaceTempView(n))
      Tables.events(spark, dir).createOrReplaceTempView("events")
      Tables.trades(spark, dir).createOrReplaceTempView("trades")
      Similarity.register(spark)
      registered.put(spark, dir)
    }
}
