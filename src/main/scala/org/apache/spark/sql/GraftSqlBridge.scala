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

  /** A thread-confined external `Row` -> `InternalRow` converter for
    * `schema`. `createDataFrame(rows.asJava, schema)` performs this
    * conversion single-threaded on the DRIVER at plan time — ~3 s for
    * 600k narrow rows, the actual wire-ingest bottleneck (PERF.md r19).
    * Handing each wire connection its own converter moves that cost onto
    * the parallel decode threads. The returned rows are defensive copies
    * (the underlying serializer reuses one UnsafeRow buffer).
    */
  def rowSerializer(
      schema: types.StructType): Row => catalyst.InternalRow = {
    val ser = catalyst.encoders.ExpressionEncoder(
      catalyst.encoders.RowEncoder.encoderFor(schema)).createSerializer()
    r => ser(r).copy()
  }

  /** A codegen'd ascending ordering over `keys` for in-memory sorting of
    * Catalyst rows — keeps direct-written ingest parts sorted by the
    * table's sorting key (the MergeTree part invariant) without a Spark
    * sort job.
    */
  def internalOrdering(schema: types.StructType,
                       keys: Seq[String]): Ordering[catalyst.InternalRow] = {
    val attrs = catalyst.types.DataTypeUtils.toAttributes(schema)
    val byName = attrs.map(a => a.name -> a).toMap
    val so = keys.flatMap(byName.get).map(a =>
      catalyst.expressions.SortOrder(a, catalyst.expressions.Ascending))
    catalyst.expressions.codegen.GenerateOrdering.generate(so, attrs)
  }

  /** A DataFrame over already-Catalyst rows: a `LocalRelation` leaf, no
    * further driver-side conversion. Scans parallelize across the local
    * scheduler like any other leaf.
    */
  def internalLocalDf(spark: SparkSession,
                      schema: types.StructType,
                      rows: Seq[catalyst.InternalRow]): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession],
      catalyst.plans.logical.LocalRelation(
        catalyst.types.DataTypeUtils.toAttributes(schema), rows))
}
