package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression conversions (Spark 4 classic
  * moved them behind `org.apache.spark.sql.classic.ExpressionUtils`).
  * Standard extension-library pattern: a thin accessor inside the sql
  * package namespace; no Spark internals are modified.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
