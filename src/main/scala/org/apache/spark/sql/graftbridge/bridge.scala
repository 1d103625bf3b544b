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
}
