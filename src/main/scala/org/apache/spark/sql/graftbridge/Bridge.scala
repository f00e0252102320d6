package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Column↔Expression plumbing, needed
  * to expose custom Catalyst expressions (graft.functions.DotProduct) as
  * `Column`s in Spark 4's ColumnNode world. This is the only place the
  * library reaches across Spark's package boundary; everything else is
  * public API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
