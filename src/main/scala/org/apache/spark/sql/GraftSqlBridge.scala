package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surface: Column <-> Expression conversion
  * (org.apache.spark.sql.classic.ExpressionUtils). Needed to splice a
  * typed Aggregator (functions.udaf -> Column) into a Catalyst
  * FunctionRegistry builder, which deals in raw Expressions — Spark 4
  * removed the public Column(expr) constructor.
  */
object GraftSqlBridge {
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  /** A typed Aggregator applied to raw child Expressions, as the
    * AggregateExpression a FunctionRegistry builder must return. The
    * udaf()->Column route produces a lazy ColumnNodeExpression that only
    * the Dataset API's converter resolves — inside the registry it
    * reaches codegen unresolved ([INTERNAL_ERROR] Cannot generate code).
    */
  def typedAggExpression[IN, BUF, OUT](
      agg: expressions.Aggregator[IN, BUF, OUT],
      inputEncoder: Encoder[IN],
      children: Seq[Expression]): Expression = {
    val uda = expressions.UserDefinedAggregator(agg, inputEncoder)
    execution.aggregate.ScalaAggregator(uda, children).toAggregateExpression()
  }
}
