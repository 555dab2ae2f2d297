package graft.plans

import graft.functions.CosineSimilarity
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions registering graft's native expressions for SQL use.
  * Install via `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      exprs => CosineSimilarity(exprs(0), exprs(1))))
    e.injectOptimizerRule(_ => CanonicalizeCosine)
    e.injectPlannerStrategy(_ => AsofJoinStrategy)
    // ASOF [LEFT] JOIN SQL syntax (the form the DuckDB oracle itself
    // writes): parser strips the keyword and plants a marker node, the
    // resolution rule swaps it for the native AsofJoinNode
    e.injectParser((_, delegate) => new GraftSqlParser(delegate))
    e.injectResolutionRule(_ => ResolveAsofJoin)
  }
}
