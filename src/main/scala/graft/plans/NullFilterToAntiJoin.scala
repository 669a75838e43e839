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
  * Soundness: under a LEFT OUTER join whose condition contains an
  * equality referencing right-side attribute `a`, every MATCHED output
  * row has `a` non-null (an equality never matches on null), so
  * `IS NULL(a)` keeps exactly the unmatched rows — the anti join's
  * result — with all right-side columns null. The rewrite preserves the
  * full schema by projecting null literals under the right side's
  * original exprIds; column pruning then drops the ones nobody reads.
  *
  * Registered via [[graft.GraftExtensions]] (injectOptimizerRule).
  */
object NullFilterToAntiJoin extends Rule[LogicalPlan] {

  /** Does some equality inside `cond` reference `attr` (⇒ matched rows
    * can't have it null)?
    */
  private def equalityGuarantees(cond: Expression, attr: Attribute): Boolean =
    cond.collectFirst {
      case e: EqualTo if e.references.contains(attr) => e
    }.isDefined

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
