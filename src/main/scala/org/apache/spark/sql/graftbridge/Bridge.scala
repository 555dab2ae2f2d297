package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. `ExpressionUtils` is private[sql] in
  * Spark 4 classic, so this shim lives under org.apache.spark.sql — the
  * standard pattern for Spark extension libraries that define native
  * Catalyst expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a hand-built LogicalPlan (`Dataset.ofRows` is
    * private[sql]); the entry point for custom logical operators.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed plan of a DataFrame (accessor shim). */
  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}

/** Mixin declaring "every input is array<double>" with implicit casting.
  * `AbstractDataType` is private[sql], so the trait lives in this shim
  * package; graft expressions just mix it in.
  */
trait AllDoubleArrayInputs
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  this: Expression =>
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    children.map(_ =>
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
}

/** Mixin declaring "(array<double>, int)" inputs with implicit casting —
  * the (vector, cell-id) shape of the two-level quantizer's sub-cell
  * argmax. Same private[sql]-AbstractDataType rationale as above.
  */
trait DoubleArrayIntInputs
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  this: Expression =>
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.IntegerType)
}
