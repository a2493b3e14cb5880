package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, LongType, TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Optimizer rule: bucketize a literal-width BAND JOIN.
  *
  * A join condition shaped `a.key = b.key AND b.ts > a.ts AND
  * b.ts <= a.ts + INTERVAL w` (the "events within w of each anchor"
  * pattern) planned natively hashes only on the key and applies the band
  * as a POST-JOIN filter — every same-key pair materializes, which is
  * quadratic in per-key density. Whenever the band's width is a LITERAL
  * interval, the same pairs are found by the [[graft.ops.RangeJoin]]
  * construction: the anchor side explodes to the (at most two, for a
  * width-w band over width-w buckets) integer time buckets its window
  * overlaps, the probe side maps to its single bucket, and the join adds
  * `bucket = bucket` to its equi-keys — candidate pairs shrink from
  * per-key density² to per-(key, bucket) co-occupancy, with the original
  * band kept as the residual filter (so the rewrite can never change the
  * result, only the candidate set).
  *
  * Bucketing uses truncating integer division of `unix_micros` — any
  * consistent monotone bucket function is correct (a point inside the
  * window always lands between the window ends' buckets), so the
  * truncation-vs-floor distinction for pre-1970 timestamps is harmless
  * here, unlike in a user-facing bucket id.
  *
  * Scope (deliberately tight): INNER joins whose condition carries at
  * least one cross-side attribute equality plus exactly the two band
  * conjuncts — lower bound `pt >/>= s`, upper bound
  * `pt </<= s + <literal day-time interval>` with both sides referencing
  * the same `s` — everything else passes through untouched. The rule is
  * the automatic face of the hand-built `ops.RangeJoin.intervalJoin`;
  * installed via [[graft.GraftExtensions]] it applies to any user query
  * written the natural way.
  */
object BandJoinViaBuckets extends Rule[LogicalPlan] with PredicateHelper {

  private val BucketCol = "__band_bucket"

  /** `start + literal interval` in whatever node analysis produced. */
  private object PlusInterval {
    def unapply(e: Expression): Option[(Expression, Long)] = e match {
      case TimestampAddInterval(s, Literal(micros: Long, _: DayTimeIntervalType), _) =>
        Some((s, micros))
      case TimestampAddInterval(s, Literal(ci: CalendarInterval, _), _) if ci.months == 0 =>
        Some((s, ci.days * 86400000000L + ci.microseconds))
      case _ => None
    }
  }

  private def bucketOf(ts: Expression, w: Long): Expression =
    IntegralDivide(UnixMicros(ts), Literal(w))

  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(left.outputSet)) Some(true)
    else if (refs.subsetOf(right.outputSet)) Some(false)
    else None
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !cond.references.exists(_.name == BucketCol) =>
      val conjuncts = splitConjunctivePredicates(cond)

      val hasEquiKey = conjuncts.exists {
        case EqualTo(a, b) =>
          (sideOf(a, left, right), sideOf(b, left, right)) match {
            case (Some(x), Some(y)) => x != y
            case _ => false
          }
        case _ => false
      }

      // lower bound: pt >/>= s with pt and s on opposite sides
      def lowerMatch(e: Expression): Option[(Expression, Expression)] = e match {
        case GreaterThan(pt, s)        => crossPair(pt, s)
        case GreaterThanOrEqual(pt, s) => crossPair(pt, s)
        case LessThan(s, pt)           => crossPair(pt, s)
        case LessThanOrEqual(s, pt)    => crossPair(pt, s)
        case _ => None
      }
      def crossPair(pt: Expression, s: Expression): Option[(Expression, Expression)] =
        if (pt.dataType == TimestampType && s.dataType == TimestampType &&
          sideOf(pt, left, right).isDefined && sideOf(s, left, right).isDefined &&
          sideOf(pt, left, right) != sideOf(s, left, right)) Some((pt, s))
        else None

      // upper bound: pt <=/< s + INTERVAL w (same pt, same s)
      def upperMatch(e: Expression, pt: Expression, s: Expression): Option[Long] = e match {
        case LessThanOrEqual(p2, PlusInterval(s2, w))
            if p2.semanticEquals(pt) && s2.semanticEquals(s) => Some(w)
        case LessThan(p2, PlusInterval(s2, w))
            if p2.semanticEquals(pt) && s2.semanticEquals(s) => Some(w)
        case GreaterThanOrEqual(PlusInterval(s2, w), p2)
            if p2.semanticEquals(pt) && s2.semanticEquals(s) => Some(w)
        case GreaterThan(PlusInterval(s2, w), p2)
            if p2.semanticEquals(pt) && s2.semanticEquals(s) => Some(w)
        case _ => None
      }

      val band = (for {
        lo <- conjuncts.iterator.flatMap(lowerMatch(_).iterator)
        (pt, s) = lo
        w <- conjuncts.iterator.flatMap(upperMatch(_, pt, s).iterator)
        if w > 0
      } yield (pt, s, w)).take(1).toSeq.headOption

      band match {
        case Some((pt, s, w)) if hasEquiKey =>
          // anchor side = the side holding s; it explodes to the buckets
          // of [s, s + w] (window width == bucket width -> <= 2 rows)
          val sOnLeft = sideOf(s, left, right).contains(true)
          val anchorChild = if (sOnLeft) left else right
          // pure integer micros arithmetic end to end — no
          // timezone-aware nodes, which the optimizer may not introduce
          // unresolved (bucket(s + w) == div(unix_micros(s) + w, w))
          val seq = new Sequence(
            bucketOf(s, w),
            IntegralDivide(Add(UnixMicros(s), Literal(w)), Literal(w)),
            None,
            // Sequence is TimeZoneAwareExpression: an optimizer-introduced
            // instance must carry the session zone or the plan validator
            // rejects it as unresolved (the zone is irrelevant for a
            // bigint sequence, but resolvedness demands it)
            Some(conf.sessionLocalTimeZone))
          val bucketAttr = AttributeReference(BucketCol, LongType,
            nullable = seq.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)()
          val gen = Generate(
            Explode(seq),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(bucketAttr), child = anchorChild)
          val newCond = And(cond, EqualTo(bucketAttr, bucketOf(pt, w)))
          val newJoin =
            if (sOnLeft) Join(gen, right, Inner, Some(newCond), hint)
            else Join(left, gen, Inner, Some(newCond), hint)
          // restore the original output (the bucket column is internal)
          Project(j.output, newJoin)
        case _ => j
      }
  }
}
