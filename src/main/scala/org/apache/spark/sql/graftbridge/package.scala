package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's classic Column<->Expression conversion (the
  * Column constructor stopped taking Expressions in Spark 4; the
  * supported conversion lives in `classic.ExpressionUtils`, which is
  * sql-private — hence this package-located shim).
  */
package object graftbridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
