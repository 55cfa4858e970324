package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's `private[sql]` Column ⇄ catalyst Expression
  * conversion (`org.apache.spark.sql.classic.ExpressionUtils`). Lives in an
  * `org.apache.spark.sql` subpackage solely to satisfy the access modifier;
  * the rest of graft uses only this narrow doorway for custom expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge to the session's `private[sql]` function registry — lets graft
  * register its native expressions as SQL functions on an EXISTING session
  * (the extensions path covers new sessions built `.withExtensions`).
  */
object RegistryBridge {
  def register(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
