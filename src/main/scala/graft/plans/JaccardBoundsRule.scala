package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: a filter `jaccard(a, b) >= t` implies the size bound
  * `t·|set(b)| <= |set(a)| AND t·|set(a)| <= |set(b)|`, because
  * J(A,B) <= min(|A|,|B|) / max(|A|,|B|) over the element SETS. The
  * rewrite prepends the bound conjuncts so candidate pairs short-circuit
  * before the pairwise intersection+lookup pass. Distinct sizes (not raw
  * lengths) keep the bound sound for arrays with duplicate elements —
  * raw lengths would over-prune (e.g. a=[x], b=[x,x] has J=1).
  *
  * The per-pair savings here are the short-circuit; the bigger win —
  * computing each side's distinct size ONCE per document instead of per
  * pair — lives in the Dedup pipelines, which prefilter on precomputed
  * scalar sizes before the verify join.
  *
  * Guarded to literal thresholds in (0, 1]; idempotent under the
  * fixed-point optimizer.
  */
object JaccardBoundsRule extends Rule[LogicalPlan] {

  private def bounds(a: Expression, b: Expression, t: Expression): Expression = {
    val sa = Cast(Size(ArrayDistinct(a)), DoubleType)
    val sb = Cast(Size(ArrayDistinct(b)), DoubleType)
    And(
      LessThanOrEqual(Multiply(t, sb), sa),
      LessThanOrEqual(Multiply(t, sa), sb))
  }

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case ge @ GreaterThanOrEqual(j: Kernels.JaccardSimExpr, t @ Literal(v: Double, DoubleType))
        if v > 0.0 && v <= 1.0 =>
      And(bounds(j.left, j.right, t), ge)
    case gt @ GreaterThan(j: Kernels.JaccardSimExpr, t @ Literal(v: Double, DoubleType))
        if v > 0.0 && v <= 1.0 =>
      And(bounds(j.left, j.right, t), gt)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) if !alreadyRewritten(cond) =>
      val next = rewrite(cond)
      if (next fastEquals cond) f else Filter(next, child)
  }

  // guard: don't stack bounds on every optimizer pass — a rewritten
  // predicate already contains a Size() conjunct next to the jaccard
  private def alreadyRewritten(cond: Expression): Boolean =
    cond.exists {
      case And(a, b) =>
        a.exists(_.isInstanceOf[Size]) && b.exists(_.isInstanceOf[Kernels.JaccardSimExpr])
      case _ => false
    }
}
