package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — the sensor-alignment operator the
  * reference's wide layout exists to approximate (influx_service.py:191-197
  * aligns transducers of one device by timestamp; an as-of join aligns them
  * when timestamps don't coincide).
  *
  * Spark has no built-in as-of join, so this composes built-ins (SURVEY.md
  * §7.2 preference (a)): tag both sides, union, and take `last(..,
  * ignoreNulls)` of the right side's payload over a per-key window ordered by
  * time. Cost is one shuffle on the key + an in-partition sort — O(n log n),
  * no cross product, no state on the driver — so it scales to 100 TB exactly
  * like any sort-merge join. Right rows sort before left rows at equal
  * timestamps, so a right row at exactly t is visible to a left row at t.
  */
object AsofJoin {
  // Null caveat: rows with null keys land in the same window partition and
  // can match each other, unlike SQL join semantics. The physical operator
  // (graft.plans.AsofJoinExec) implements strict null-never-matches; prefer
  // it when the key may be null.

  /** @param left      probe side; every row is preserved (left outer as-of)
    * @param right     reference side supplying the "most recent" values
    * @param keys      equi-join key columns present on both sides
    * @param leftTs    left ordering column (must be orderable, e.g. LONG us)
    * @param rightTs   right ordering column
    * @param rightVals right columns to carry; emitted as `right_<name>`
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rvFields = (rightTs +: rightVals).distinct
    val rvType = right.select(rvFields.map(col): _*).schema

    val lNorm = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__is_left", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
      .select(keys.map(col) ++ Seq(col("__ts"), col("__is_left"), col("__rv")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    val rNorm = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__is_left", lit(0))
      .withColumn("__rv", struct(rvFields.map(col): _*))
      .select(lNorm.columns.map(c =>
        if (c == "__ts" || c == "__is_left" || c == "__rv" || keys.contains(c)) col(c)
        else lit(null).as(c)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lNorm.unionByName(rNorm)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++
        rvFields.map(v => col(s"__m.$v").as(s"right_$v")): _*)
  }
}
