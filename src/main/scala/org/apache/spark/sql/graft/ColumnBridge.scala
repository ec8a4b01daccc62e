package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's package-private Column <-> Expression conversion
  * (org.apache.spark.sql.classic.ExpressionUtils). Spark 4 backs
  * Column with ColumnNode rather than a catalyst Expression, so custom
  * native expressions (graft.functions.expressions.*) need this hop to
  * participate in the public Column algebra. Lives under
  * org.apache.spark.sql to satisfy the private[sql] scope — the same
  * pattern Spark connector libraries use. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Live-session function registration (sessionState is private[sql]). */
object FunctionRegistration {
  def register(
      spark: org.apache.spark.sql.SparkSession,
      builders: Seq[(org.apache.spark.sql.catalyst.FunctionIdentifier,
        org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
        Seq[Expression] => Expression)]): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    builders.foreach { case (ident, inf, builder) =>
      registry.registerFunction(ident, inf, builder)
    }
  }
}
