package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom optimizer rule (the `Rule[LogicalPlan]` extension path):
  * Catalyst's own PushDownPredicates cannot see through an unknown
  * node, so probe-side filters above AsOfJoinNode would run after the
  * join. This rule pushes any filter that references only left-side
  * attributes below the node — after which the standard rules carry
  * it all the way into the parquet scan (PushedFilters), restoring
  * scan pruning for the custom operator. Registered via the public
  * `spark.experimental.extraOptimizations` hook.
  */
object PushFilterThroughAsOf extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsOfJoinNode)
        if cond.references.subsetOf(a.left.outputSet) &&
          cond.deterministic =>
      a.copy(left = Filter(cond, a.left))
  }
}
