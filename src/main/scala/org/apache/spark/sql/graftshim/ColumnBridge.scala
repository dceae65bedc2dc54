package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Bridge into Spark's `private[sql]` Column↔Expression converters (needed
  * since Spark 4 wraps Column around ColumnNode). Lives under
  * org.apache.spark.sql to satisfy the access modifier; contains no logic. */
object ColumnBridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Eagerly convert a Column's node tree to a catalyst Expression
    * (UnresolvedFunction/UnresolvedAttribute/Literal…). `expression`
    * above wraps lazily in a ColumnNodeExpression leaf, which pattern
    * matchers walking the tree (filter extraction for catalog pruning)
    * cannot see into. */
  def toCatalyst(c: Column): Expression =
    try ColumnNodeToExpressionConverter(c.node)
    catch { case _: Throwable => ExpressionUtils.expression(c) }

  /** DataFrame over an RDD[InternalRow] without the external-row encode/
    * decode round trip (`spark.internalCreateDataFrame` is private[sql]).
    * For per-partition streaming folds where the row codec would be the
    * hot-path cost. */
  def ofInternalRows(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[
        org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
