package graft.storage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate (materialized view) over a
  * [[TxLogTable]] fact table: per-key count + exact decimal sum, updated
  * from change-feed deltas instead of rescanning the facts.
  *
  * The 100 TB argument: a nightly full re-aggregation of a 100 TB fact
  * table costs a full scan + shuffle every time; maintaining the view from
  * the change feed costs O(|delta| + |touched keys|) — the delta is
  * aggregated (map-side combined) and full-outer-merged into the view on
  * the grouping key. Only abelian aggregates (count, sum — things with an
  * inverse) are maintainable this way; min/max would need a re-aggregation
  * of the affected keys on deletes.
  *
  * Sums accumulate in DECIMAL(38,6), so the maintained state is exact and
  * order-independent — the incrementally-maintained view is bit-identical
  * to a from-scratch recomputation, which is exactly what the oracle query
  * asserts.
  */
object IncrementalAgg {

  private val zero = lit(0).cast("decimal(38,6)")

  /** Initial state: one row per key with (cnt, sum_v). */
  def snapshot(fact: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    fact.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(38,6)")).as("sum_v"))

  /** Fold a change feed (rows tagged `_change_type` in {insert, delete} —
    * the [[TxLogTable.changes]] shape) into the aggregate state. Deletes
    * subtract; keys whose count reaches zero leave the view.
    */
  def applyDelta(mv: DataFrame, changes: DataFrame,
                 keys: Seq[String], valueCol: String): DataFrame = {
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    val delta = changes.groupBy(keys.map(col): _*)
      .agg(sum(sign).as("d_cnt"),
        sum((sign * col(valueCol).cast("decimal(38,6)")).cast("decimal(38,6)")).as("d_sum"))
    mv.join(delta, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L))).as("cnt"),
        (coalesce(col("sum_v"), zero) + coalesce(col("d_sum"), zero))
          .cast("decimal(38,6)").as("sum_v")): _*)
      .filter(col("cnt") > 0)
  }
}
