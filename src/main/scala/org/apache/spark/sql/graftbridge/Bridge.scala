package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ClassicConversions, ExpressionUtils}

/** Spark 4 moved Column onto ColumnNode and made the
  * Column↔catalyst-Expression bridges private[sql]; a library defining
  * native Catalyst expressions still needs both directions. This object
  * lives under org.apache.spark.sql solely to re-export them — the
  * sanctioned pattern for Catalyst-extending libraries.
  */
object Bridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column =
    ClassicConversions.ColumnConstructorExt(Column).apply(e)
}
