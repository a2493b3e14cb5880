package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: turn a global-rank filter into a top-k.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY forces every
  * row into one partition (Spark warns "No Partition Defined for Window
  * operation"), so `WHERE rn <= k` sorts the entire input on a single
  * task before discarding all but k rows. Whenever the filter's bound on
  * the row number is a literal, the same k rows can be found by a
  * `Limit(k, Sort(order))` UNDER the window — which plans as
  * `TakeOrderedAndProjectExec`: each input partition keeps a k-row heap
  * and only k rows per partition ever move. The window then numbers just
  * the k survivors (identical assignment, since row_number over the
  * first k rows of the same total order is the prefix of the original
  * numbering). On a non-total order the original row_number is already
  * nondeterministic among ties; the rewrite commits to the sort's
  * tie choice.
  *
  * This is the rule form of the hand-pattern used by the query packs
  * (`ORDER BY ... LIMIT k` + re-rank); installed via
  * [[graft.GraftExtensions]] it applies to any user query shaped the
  * natural way. Spark's own `InferWindowGroupLimit` inserts a
  * `WindowGroupLimit` below the window (per-partition pruning) but still
  * funnels every partition's survivors through the single-partition
  * sort; this rewrite replaces that global sort with the heap-based
  * top-k exchange.
  */
object TopKViaSortLimit extends Rule[LogicalPlan] {

  /** The literal bound k such that `cond` implies `rn <= k`, if `cond`
    * (or one conjunct of it) is a comparison of `rn` against a literal.
    */
  private def limitFor(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntLit(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntLit(k)) if a.semanticEquals(rn)        => Some(k - 1)
    case GreaterThanOrEqual(IntLit(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(IntLit(k), a: Attribute) if a.semanticEquals(rn)     => Some(k - 1)
    case EqualTo(a: Attribute, IntLit(1)) if a.semanticEquals(rn)         => Some(1)
    case And(l, r) => limitFor(l, rn).orElse(limitFor(r, rn))
    case _ => None
  }

  // Non-negative in-range literals only: negative bounds never produce a
  // useful rewrite (the filter is empty anyway), and admitting them would
  // let `k - 1` wrap at Int.MinValue into a giant Limit.
  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) if v >= 0 => Some(v)
      case Literal(v: Long, LongType) if v >= 0 && v <= Int.MaxValue => Some(v.toInt)
      case _ => None
    }
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window)
        if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          w.windowExpressions.size == 1 &&
          // idempotence: don't re-wrap a child this rule (or the user)
          // already bounded
          !w.child.isInstanceOf[GlobalLimit] =>
      w.windowExpressions.head match {
        case al @ Alias(WindowExpression(RowNumber(), _), _) =>
          limitFor(cond, al.toAttribute) match {
            case Some(k) if k >= 0 =>
              f.copy(child = w.withNewChildren(Seq(
                Limit(Literal(k), Sort(w.orderSpec, global = true, w.child)))))
            case _ => f
          }
        case _ => f
      }
  }
}
