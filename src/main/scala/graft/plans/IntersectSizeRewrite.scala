package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, Literal, Size, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}
import graft.functions.SortedIntersectSize

/** Optimizer rule: rewrite `size(array_intersect(a, b))` over
  * non-null string arrays into the codegen'd sorted-merge kernel
  * `graft_intersect_size(array_sort(array_distinct(a)), ...)`.
  *
  * Semantics-preserving because `array_intersect` already returns
  * DISTINCT elements — its size IS the set-intersection size, which is
  * exactly what the kernel computes. The win is the per-row cost:
  * the generic form builds a hash set per invocation; after the
  * rewrite the sort+dedup happens once per operand (and is usually
  * lifted out of the join by ordinary subexpression/projection
  * placement) while the per-pair work is a linear merge.
  *
  * Restricted to `array<string>` with `containsNull = false` — the
  * kernel compares UTF8Strings directly and has no null-element
  * contract. Injected via [[graft.GraftExtensions]]
  * (`injectOptimizerRule`) or session-locally through
  * `spark.experimental.extraOptimizations`.
  */
object IntersectSizeRewrite extends Rule[LogicalPlan] {

  private def eligible(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case ArrayType(StringType, false) => true
    case _                            => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(l, r), _)
          if eligible(l.dataType) && eligible(r.dataType) =>
        // SortArray, not ArraySort: the latter's default comparator is
        // an unresolved lambda, illegal to introduce at optimizer time
        SortedIntersectSize(
          SortArray(ArrayDistinct(l), Literal(true)),
          SortArray(ArrayDistinct(r), Literal(true)))
    }
}
