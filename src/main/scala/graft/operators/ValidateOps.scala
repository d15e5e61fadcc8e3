package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality validation (Deequ-style) for pipeline gates: compute a set
  * of named metrics over a table in ONE aggregation pass, and evaluate
  * boolean constraints against them.
  *
  * A 100 TB ingest needs the quality gate to cost one scan, not one scan per
  * metric: every metric here is an aggregate expression, so Spark evaluates
  * all of them in a single partial+final hash aggregate (map-side combine,
  * one row on the shuffle per partition). Constraints are plain boolean
  * expressions over the metric columns — evaluated on the single metrics
  * row, i.e. for free.
  *
  * Double ratios divide exact long counts once, so the metrics are
  * bit-reproducible in any engine (oracle-checkable).
  */
object ValidateOps {

  /** Fraction of non-null values (Deequ `Completeness`). */
  def completeness(c: Column): Column =
    count(c).cast("double") / count(lit(1)).cast("double")

  /** distinct/total ratio (1.0 = the column is a key; Deequ `Uniqueness`
    * over full rows). Exact distinct — see [[approxUniqueness]] for the
    * sketch form when the column is ultra-high-cardinality.
    */
  def uniqueness(c: Column): Column =
    count_distinct(c).cast("double") / count(c).cast("double")

  /** HLL-based uniqueness for columns where exact distinct would dominate
    * the shuffle (engine-specific sketch: spec-checked, not oracle-compared).
    */
  def approxUniqueness(c: Column, rsd: Double = 0.01): Column =
    approx_count_distinct(c, rsd).cast("double") / count(c).cast("double")

  /** Fraction of non-null values inside [lo, hi) (Deequ `Compliance`). */
  def inRangeRatio(c: Column, lo: Double, hi: Double): Column =
    sum(when(c >= lo && c < hi, 1L).otherwise(0L)).cast("double") /
      count(c).cast("double")

  /** Fraction of non-null values matching a predicate (generic compliance). */
  def compliance(pred: Column, over: Column): Column =
    sum(when(pred, 1L).otherwise(0L)).cast("double") / count(over).cast("double")

  /** One-pass metrics profile: a single-row DataFrame with one column per
    * named metric. All metrics share one aggregate (one scan, one shuffle of
    * partial buffers).
    */
  def profile(df: DataFrame, metrics: Seq[(String, Column)]): DataFrame = {
    require(metrics.nonEmpty, "at least one metric required")
    val aggs = metrics.map { case (name, m) => m.as(name) }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Profile + constraints: constraints are boolean expressions over the
    * metric COLUMNS (refer to them by name with `col(...)`), appended to the
    * metrics row. The whole check is still one aggregation pass.
    */
  def check(df: DataFrame, metrics: Seq[(String, Column)],
            constraints: Seq[(String, Column)]): DataFrame = {
    val prof = profile(df, metrics)
    constraints.foldLeft(prof) { case (acc, (name, pred)) =>
      acc.withColumn(name, pred)
    }
  }
}
