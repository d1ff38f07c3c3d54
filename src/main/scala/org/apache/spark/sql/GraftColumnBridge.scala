package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public Column API and catalyst Expressions.
  * Spark 4 made the converters `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so custom native
  * expressions (graft.functions.NormalizeIp) need this in-package
  * accessor — the standard pattern for Spark extension libraries.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager Column→Expression conversion. `expression` defers via a
    * lazy ColumnNodeExpression placeholder that only materializes
    * during Dataset analysis — fine inside the DataFrame API, but a
    * FunctionRegistry builder must hand the analyzer a real catalyst
    * tree: a custom expression's checkInputDataTypes would otherwise
    * see the unconverted placeholder (NullType) and fail resolution. */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
