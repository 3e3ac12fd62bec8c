package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: inject the lossless length prefilter in
  * front of bounded edit-distance predicates.
  *
  * `levenshtein(a, b) <= k` costs O(|a|·|b|) per row; but
  * `levenshtein(a, b) >= abs(length(a) - length(b))` always holds, so
  * rows whose lengths differ by more than k can be discarded by an
  * O(1) check. In a similarity JOIN the expensive predicate runs once
  * per candidate pair — at 100 TB the cheap conjunct (evaluated first,
  * left-to-right in codegen) skips the dynamic-programming loop for
  * the vast majority of pairs.
  *
  * The rewrite is purely additive (the original predicate stays), so
  * results are unchanged, and idempotent (a prefilter that is already
  * present — by this rule or by hand — is not added again).
  */
object LevenshteinPrefilterRule extends Rule[LogicalPlan] with PredicateHelper {

  private def lengthGuard(lev: Expression, k: Expression): Expression = {
    val Seq(a, b) = lev.children.take(2)
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)
  }

  private def prefilterFor(e: Expression): Option[Expression] = e match {
    case LessThanOrEqual(lev: Levenshtein, k) if k.foldable =>
      Some(lengthGuard(lev, k))
    case LessThan(lev: Levenshtein, k) if k.foldable =>
      Some(lengthGuard(lev, k)) // abs diff <= k is still implied by dist < k
    case GreaterThanOrEqual(k, lev: Levenshtein) if k.foldable =>
      Some(lengthGuard(lev, k))
    case GreaterThan(k, lev: Levenshtein) if k.foldable =>
      Some(lengthGuard(lev, k))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val extras = conjuncts.flatMap(prefilterFor)
        .filterNot(p => conjuncts.exists(_.semanticEquals(p)))
      if (extras.isEmpty) f
      else Filter((extras ++ conjuncts).reduce(And), child)
  }
}
