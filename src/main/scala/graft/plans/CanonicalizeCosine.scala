package graft.plans

import graft.functions.CosineSimilarity
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: canonicalize the (commutative) argument order of
  * CosineSimilarity by semantic hash, so `cosine(a,b)` and `cosine(b,a)`
  * become the same expression and common-subexpression elimination /
  * cached-plan reuse can collapse them. Bitwise-safe: the fused loop
  * computes dot and both norms in the same element order either way.
  * Injected by GraftExtensions.
  */
object CanonicalizeCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b) if b.semanticHash() < a.semanticHash() =>
        CosineSimilarity(b, a)
    }
}
