package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column <-> Expression converters.
  * Lives inside the org.apache.spark.sql package solely to satisfy the
  * access qualifier; this is the standard extension-point technique for
  * libraries that register custom Catalyst expressions.
  */
package object graftbridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly convert a Column built from PUBLIC functions into a plain
    * catalyst tree (UnresolvedFunction nodes the analyzer then resolves).
    * [[toExpression]]'s lazy ColumnNodeExpression wrapper is fine inside
    * Dataset APIs but opaque to codegen when returned from a
    * FunctionRegistry builder — this is the converter for that path.
    */
  def toCatalystTree(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
