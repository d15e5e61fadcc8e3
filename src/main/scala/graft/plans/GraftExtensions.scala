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
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
    GraftFunctions.registrations.foreach(ext.injectFunction)
  }
}

/** SQL-surface registration of the engine's custom expressions, so
  * `spark.sql("SELECT dot_q(a, b) ...")` works wherever the extensions are
  * installed (or after [[GraftFunctions.register]] on an existing session).
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  import graft.functions.{DotProductLong, MinHashSketch, NormSqLong, SimHashSketch}

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_q"),
      new ExpressionInfo(classOf[DotProductLong].getName, "dot_q"),
      (es: Seq[Expression]) => DotProductLong(es(0), es(1))),
    (FunctionIdentifier("norm_sq_q"),
      new ExpressionInfo(classOf[NormSqLong].getName, "norm_sq_q"),
      (es: Seq[Expression]) => NormSqLong(es(0))),
    (FunctionIdentifier("minhash_sketch"),
      new ExpressionInfo(classOf[MinHashSketch].getName, "minhash_sketch"),
      (es: Seq[Expression]) => MinHashSketch(es(0),
        es(1).eval(null).asInstanceOf[Int]).toAggregateExpression()),
    (FunctionIdentifier("simhash_sketch"),
      new ExpressionInfo(classOf[SimHashSketch].getName, "simhash_sketch"),
      (es: Seq[Expression]) => SimHashSketch(es(0)).toAggregateExpression())) ++
    // curation operators surfaced as SQL functions: built from the same
    // Column compositions the DataFrame API uses (one definition, both
    // surfaces), bridged through the Column<->Expression shim
    composed

  private def composed: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    import org.apache.spark.sql.graft.shim
    import graft.operators.{SampleOps, TextOps}
    def fn(name: String)(build: Seq[Expression] => org.apache.spark.sql.Column) =
      (FunctionIdentifier(name), new ExpressionInfo("graft.operators", name),
        (es: Seq[Expression]) => shim.toExpression(build(es)))
    Seq(
      fn("hash60")(es => TextOps.hash60(shim.column(es(0)))),
      fn("lang_id")(es => TextOps.langId(shim.column(es(0)))),
      fn("quality_score")(es => TextOps.qualityFeatures(shim.column(es(0))).last._2),
      fn("fingerprint")(es => TextOps.fingerprint(shim.column(es(0)))),
      fn("rolling_fp")(es => TextOps.rollingFingerprint(shim.column(es(0)))),
      fn("redact_pii")(es => TextOps.redactPii(shim.column(es(0)))),
      fn("split_assign")(es => SampleOps.splitAssign(shim.column(es(0)))),
      fn("zvalue")(es => graft.storage.ZOrder.zvalue2(
        shim.column(es(0)), shim.column(es(1)),
        es(2).eval(null).asInstanceOf[Int])))
  }

  /** Imperative registration for sessions built without the extensions. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}

object RewriteSelfDot extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProductLong(a, b) if a.semanticEquals(b) && a.deterministic => NormSqLong(a)
    }
}
