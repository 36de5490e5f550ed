package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge.
  *
  * Spark 4 wraps Column around ColumnNode and gates the catalyst
  * conversion behind `private[sql]` (ExpressionUtils,
  * columnNodeSupport.scala in the Spark source). Custom native
  * expressions still need a Column surface for library code that
  * cannot rely on session function registration, so this one-file
  * bridge lives in the `org.apache.spark.sql` package scope — the
  * same technique community libraries (frameless, spark-daria) use.
  * Nothing else in the repo reaches into Spark internals.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
