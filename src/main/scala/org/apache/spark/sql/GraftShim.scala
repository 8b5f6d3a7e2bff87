package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` constructors for graft's custom logical
  * plans (the standard extension-library technique — the only member
  * of graft that lives outside the `graft` namespace).
  */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  def expression(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Column over a raw Catalyst expression — for graft's native
    * expressions that carry a non-literal payload (e.g. a trained
    * Bloom bitmap) and therefore cannot go through the SQL function
    * registry. */
  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Collision-free per-session identity (`private[sql]` upstream);
    * graft's training memos key on it instead of identityHashCode. */
  def sessionUUID(s: SparkSession): String =
    s.asInstanceOf[classic.SparkSession].sessionUUID
}
