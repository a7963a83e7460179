package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.Size
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rewrites for graft's native kernels, injected via
  * [[graft.GraftExtensions]] (`injectOptimizerRule`) — the third Catalyst
  * extension point alongside expressions (G1/G12/G13) and planner
  * strategies (G8).
  *
  * `graft_intersect_count(a, a)` over identical (sorted-distinct) arrays
  * is just `size(a)`: the rewrite deletes the O(|a|) two-pointer walk per
  * row. The shape arises naturally when a generated pair query joins a
  * bucket to itself or a templated query compares a column against
  * itself; constant-folding it mirrors how Spark's own optimizer folds
  * `a = a` to `true` for deterministic non-nullable inputs. */
object SelfIntersectRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case SortedLongIntersectCount(a, b)
          if a.deterministic && a.semanticEquals(b) =>
        Cast(Size(a), LongType): Expression
    }
}
