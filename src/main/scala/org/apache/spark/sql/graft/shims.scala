package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to `private[sql]` Column↔Expression plumbing (Spark 4
  * moved the classic converters behind package privacy). This is the only
  * file that lives inside Spark's namespace; everything graft-specific
  * stays in `graft.*`. */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
