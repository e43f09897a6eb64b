package graft.plans

import graft.functions.{PosShingles, ShingleSet}
import org.apache.spark.sql.catalyst.expressions.ArrayDistinct
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: collapse `array_distinct(graft_pos_shingles(x))`
  * into the one-pass `graft_shingles(x)` kernel.
  *
  * The two sides are proven equivalent by TextExpressionsSpec on the full
  * corpus plus edge cases: both are never-null (null/short text -> empty
  * array), and both keep FIRST-OCCURRENCE order (`array_distinct`
  * preserves the first hit; [[graft.functions.TextKernels.shingleSet]]
  * uses a LinkedHashSet). The rewrite removes a whole per-row pass — the
  * positional kernel materializes every shingle occurrence and
  * array_distinct re-walks it with a hash set, while [[ShingleSet]]
  * dedups inside the tokenizer loop.
  *
  * This is the custom-operator ladder's Rule[LogicalPlan] step applied
  * the way this engine prefers it: not a new physical operator (the
  * built-ins express every catalog semantics) but a canonicalizer that
  * lets callers compose kernels naively and still get the fused plan. A
  * consumer that writes the composed form — e.g. a notebook user
  * assembling span detection by hand — pays nothing for not knowing the
  * fused kernel exists. Registered via [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions=graft.functions.GraftExtensions`); safe to
  * inject repeatedly (the rewrite is idempotent) and a no-op on plans
  * that never mention the kernels.
  */
object CollapseDistinctPosShingles extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayDistinct(PosShingles(child)) => ShingleSet(child)
    }
}
