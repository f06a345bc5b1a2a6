package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal public bridge to Spark 4's `private[sql]` Column <-> Expression
 * converters (`org.apache.spark.sql.classic.ExpressionUtils`), needed to
 * expose custom Catalyst expressions as user-facing Columns.
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Block until all queued listener events are delivered (the bus is
    * `private[spark]`); used by Snapshots.commit so the write job's
    * task-end metrics are fully captured before they are read. */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
