package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, GreaterThanOrEqual, LessThanOrEqual, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite a plain SQL `BETWEEN` join into the custom
  * [[RangeJoin]] node — so `SELECT … FROM points p JOIN intervals i ON
  * p.ts BETWEEN i.lo AND i.hi` picks up the sorted-broadcast stabbing
  * plan with NO query rewrite by the user. This is the piece that makes
  * the custom operator a first-class citizen of the SQL surface rather
  * than a DataFrame-API-only helper.
  *
  * A join is rewritten only when ALL of:
  *  - inner join, no join hint (hints mean the user chose a plan);
  *  - the condition contains `p >= lo AND p <= hi` (any conjunct order
  *    / comparison orientation) with `p` built purely from the left
  *    side, `lo`/`hi` purely from the right, all deterministic and of
  *    one type;
  *  - NO equi-conjunct links the sides (an equi key makes Catalyst's
  *    shuffled hash/sort-merge join the better plan — the rewrite only
  *    targets joins that would otherwise fall to
  *    BroadcastNestedLoopJoin);
  *  - the interval side's estimated size fits the broadcast threshold
  *    (`spark.sql.autoBroadcastJoinThreshold`; the exec broadcasts it).
  *
  * Leftover conjuncts become a [[Filter]] above the [[RangeJoin]] —
  * same rows, same nullability, strictly less work than evaluating the
  * full predicate on every pair.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** (point, bound, isLower) for a recognized range conjunct. */
  private def classify(
      e: Expression, left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression, Boolean)] = {
    def fromLeft(x: Expression) = x.references.nonEmpty && x.references.subsetOf(left.outputSet)
    def fromRight(x: Expression) = x.references.nonEmpty && x.references.subsetOf(right.outputSet)
    e match {
      case GreaterThanOrEqual(p, lo) if fromLeft(p) && fromRight(lo) => Some((p, lo, true))
      case GreaterThanOrEqual(hi, p) if fromLeft(p) && fromRight(hi) => Some((p, hi, false))
      case LessThanOrEqual(p, hi) if fromLeft(p) && fromRight(hi) => Some((p, hi, false))
      case LessThanOrEqual(lo, p) if fromLeft(p) && fromRight(lo) => Some((p, lo, true))
      case _ => None
    }
  }

  private def isEquiConjunct(e: Expression, left: LogicalPlan, right: LogicalPlan): Boolean = {
    def crossSides(a: Expression, b: Expression): Boolean =
      (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet) &&
        a.references.nonEmpty && b.references.nonEmpty) ||
        (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet) &&
          b.references.nonEmpty && a.references.nonEmpty)
    e match {
      // EqualNullSafe too: ExtractEquiJoinKeys treats <=> as an equi
      // key, so a hash join is available and the rewrite must yield
      case EqualTo(a, b) => crossSides(a, b)
      case org.apache.spark.sql.catalyst.expressions.EqualNullSafe(a, b) => crossSides(a, b)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), JoinHint.NONE)
        if cond.deterministic =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (conjuncts.exists(isEquiConjunct(_, left, right))) j
      else {
        val classified = conjuncts.map(c => c -> classify(c, left, right))
        val lowers = classified.collect { case (c, Some((p, b, true))) => (c, p, b) }
        val uppers = classified.collect { case (c, Some((p, b, false))) => (c, p, b) }
        val pair = (for {
          (lc, lp, lo) <- lowers
          (uc, up, hi) <- uppers
          if lp.semanticEquals(up) &&
            lp.dataType == lo.dataType && lp.dataType == hi.dataType &&
            org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(lp.dataType)
        } yield (lc, uc, lp, lo, hi)).headOption
        pair match {
          case Some((lc, uc, p, lo, hi))
              if right.stats.sizeInBytes >= 0 &&
                conf.autoBroadcastJoinThreshold > 0 &&
                right.stats.sizeInBytes <= conf.autoBroadcastJoinThreshold =>
            val rj = RangeJoin(left, right, p, lo, hi)
            val rest = conjuncts.filterNot(c => c.eq(lc) || c.eq(uc))
            if (rest.isEmpty) rj
            else Filter(rest.reduce(And), rj)
          case _ => j
        }
      }
  }
}
