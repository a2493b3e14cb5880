package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic `Column` -> Catalyst `Expression` converter.
  * Spark 4 split `Column` onto the connect-compatible `ColumnNode` and
  * made the classic converter `private[sql]`; extension libraries reach
  * it from a package under `org.apache.spark.sql` — the established
  * pattern for Catalyst-level integrations. `ExpressionUtils.expression`
  * only WRAPS the node lazily (`ColumnNodeExpression`), whose children
  * are still `sql.internal` ColumnNodes that no Catalyst matcher sees —
  * so we run the real recursive conversion
  * (`ColumnNodeToExpressionConverter`, what the classic session itself
  * applies at plan time) and get a genuine unresolved Catalyst tree
  * (`And`/`UnresolvedFunction`/`Literal`/`UnresolvedAttribute`). Used
  * only to EXTRACT prunable range conjuncts from a user predicate
  * (graft.ops.FileSkipping.predsOf); query semantics never depend on it
  * because the full predicate is always re-applied to the scan.
  */
object ColumnExpr {
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
