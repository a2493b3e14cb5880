package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic `Column` -> Catalyst `Expression` converter.
  * Spark 4 split `Column` onto the connect-compatible `ColumnNode` and
  * made the classic converter `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); extension libraries
  * reach it from a package object under `org.apache.spark.sql` — the
  * established pattern for Catalyst-level integrations. Used only to
  * EXTRACT prunable range conjuncts from a user predicate
  * (graft.ops.FileSkipping.rangesOf); query semantics never depend on it
  * because the full predicate is always re-applied to the scan.
  */
object ColumnExpr {
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
