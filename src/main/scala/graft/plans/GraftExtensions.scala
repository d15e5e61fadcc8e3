package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{DotProductLong, NormSqLong}

/** Engine-specific Catalyst rules, registered through the public
  * `SparkSessionExtensions` hook (spark.sql.extensions=graft.plans.GraftExtensions).
  *
  * [[RewriteSelfDot]] is a peephole rule: a self dot product `dot_q(x, x)`
  * is a squared norm, and [[NormSqLong]] evaluates it with one array read
  * per element instead of two. Similarity pipelines hit this shape whenever
  * a generic pair scorer is applied to (v, v) — e.g. a cross scorer run over
  * a pair list that includes identity pairs, or norm computation written via
  * the generic kernel.
  *
  * The same hook is where a production deployment would register the bigger
  * rewrites sketched in SURVEY.md §7.2 (brute-force similarity cross-join ->
  * LSH-bucketed equi-join); those change result semantics (approximate
  * recall) so they stay opt-in library calls (SimilarityOps.lshNearDupPairs)
  * rather than silent plan rewrites.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteSelfDot)
  }
}

object RewriteSelfDot extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProductLong(a, b) if a.semanticEquals(b) && a.deterministic => NormSqLong(a)
    }
}
