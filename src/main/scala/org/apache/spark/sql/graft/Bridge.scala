package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal escape hatch into the `private[sql]` Column ⇄ Expression
  * converters — the supported pattern for libraries that ship custom
  * Catalyst expressions without forking Spark. Nothing else from the
  * private API surface is touched. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
