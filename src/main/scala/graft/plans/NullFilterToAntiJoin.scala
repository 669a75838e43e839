package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the "missing rows" idiom
  *
  *   SELECT ... FROM l LEFT JOIN r ON l.k = r.k WHERE r.k IS NULL
  *
  * into a LEFT ANTI join. Catalyst does NOT perform this rewrite (the
  * r1 verdict flagged the pattern as a needless second shuffle: the
  * outer join materializes matched rows only for the filter to discard
  * them; the anti join short-circuits per probe row and any DISTINCT
  * that was guarding the right side becomes prunable).
  *
  * Soundness: the rewrite is valid only when every MATCHED output row
  * provably has `a` non-null. That needs a TOP-LEVEL CONJUNCT of the
  * join condition that is null-intolerant on `a` — an `EqualTo` whose
  * operand containing `a` evaluates to null when `a` is null (then the
  * conjunct, and so the whole condition, can't be true). An equality
  * buried under a disjunction (`l.k = r.k OR l.flag = 1`) or wrapped in
  * a null-tolerant expression (`coalesce(r.k, 0) = l.k`) guarantees
  * nothing: matched rows CAN carry a null `a`, and the anti join would
  * drop rows the outer+IS NULL form keeps. `splitConjunctivePredicates`
  * + a conservative direct-operand check enforce exactly that.
  *
  * The rewrite preserves the full schema by projecting null literals
  * under the right side's original exprIds; column pruning then drops
  * the ones nobody reads.
  *
  * Registered via [[graft.GraftExtensions]] (injectOptimizerRule).
  */
object NullFilterToAntiJoin extends Rule[LogicalPlan] with PredicateHelper {

  /** Is `e` null whenever `attr` is null? Conservative: `attr` itself or
    * a cast chain over it (Cast propagates null). Anything else —
    * coalesce, IF, ±0-ary null-tolerant functions — returns false and
    * blocks the rewrite.
    */
  private def nullIntolerantOn(e: Expression, attr: Attribute): Boolean =
    e match {
      case a: Attribute => a.semanticEquals(attr)
      case c: Cast => nullIntolerantOn(c.child, attr)
      case _ => false
    }

  /** Does a top-level conjunct of `cond` force `attr` non-null on every
    * matched row?
    */
  private def equalityGuarantees(cond: Expression, attr: Attribute): Boolean =
    splitConjunctivePredicates(cond).exists {
      case EqualTo(l, r) => nullIntolerantOn(l, attr) || nullIntolerantOn(r, attr)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(IsNull(attr: Attribute),
        Join(left, right, LeftOuter, Some(cond), hint))
        if right.outputSet.contains(attr) && equalityGuarantees(cond, attr) =>
      val anti = Join(left, right, LeftAnti, Some(cond), hint)
      val projectList: Seq[NamedExpression] =
        left.output ++ right.output.map { a =>
          Alias(Literal(null, a.dataType), a.name)(exprId = a.exprId)
        }
      Project(projectList, anti)
  }
}
