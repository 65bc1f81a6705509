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

  /** Executed physical plan of a streaming query's LAST micro-batch —
    * the real fused plan (a `foreachBatch` body only ever sees its
    * batch as an already-computed ExistingRDD). Used by specs to pin
    * that a composed streaming pipeline plans as ONE query. */
  def lastStreamingPlan(
      q: org.apache.spark.sql.streaming.StreamingQuery): String =
    q match {
      case w: execution.streaming.runtime.StreamingQueryWrapper =>
        w.streamingQuery.lastExecution.executedPlan.toString
      case other =>
        throw new IllegalArgumentException(
          s"not a wrapped streaming query: ${other.getClass}")
    }
}
