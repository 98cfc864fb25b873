package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the private[sql] Column <-> catalyst Expression
  * converters, the standard Spark-extension shim: graft's native
  * expressions (graft.functions._) need Column wrappers WITHOUT going
  * through the session function registry, so pure Column helpers like
  * TextFunctions.shingles work on any session, registered or not. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
