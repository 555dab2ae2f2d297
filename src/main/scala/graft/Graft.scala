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

  def registerViews(spark: SparkSession, dir: String): Unit = {
    TableNames.foreach(n =>
      Tables.table(spark, dir, n).createOrReplaceTempView(n))
    Tables.events(spark, dir).createOrReplaceTempView("events")
    Tables.trades(spark, dir).createOrReplaceTempView("trades")
    Similarity.register(spark)
  }
}
