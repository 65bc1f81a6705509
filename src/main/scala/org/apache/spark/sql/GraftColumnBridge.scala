package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge to Spark 4's private[sql] Expression↔Column conversion, so graft
 * can expose custom Catalyst expressions (e.g. the Confluent-Avro decoder)
 * as ordinary public Columns. Spark 4 removed the public
 * `new Column(expr)` constructor; `classic.ExpressionUtils` is the
 * blessed internal path the built-in functions use.
 */
object GraftColumnBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
