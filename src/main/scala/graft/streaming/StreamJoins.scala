package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream joins with bounded state.
  *
  * An unbounded stream-stream join would buffer both sides forever; the
  * interval form is the one that scales: each side carries a watermark and
  * the join condition bounds how far apart matching events can be, so
  * Spark's symmetric hash join can evict state as the watermarks advance —
  * state is O(join window · arrival rate), independent of stream age.
  * This is the streaming face of the batch as-of/range joins
  * (`plans/AsofJoinPlan`, `RangeJoin`): same correlate-events-in-time
  * semantics, incremental execution.
  */
object StreamJoins {

  /** Inner interval join: rows pair when they share `key` and the right
    * event time lands in `[leftTs + lower, leftTs + upper]`.
    *
    * `lower`/`upper` are calendar-interval strings (`"0 seconds"`,
    * `"10 minutes"`); `leftDelay`/`rightDelay` are the two sides'
    * watermark delays. Both timestamp columns must be TIMESTAMP type —
    * watermarks don't attach to raw longs. The output carries both sides'
    * columns under the `l`/`r` aliases; select with qualified names when
    * the sides share column names.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   lower: String, upper: String,
                   leftDelay: String, rightDelay: String): DataFrame = {
    val l = left.withWatermark(leftTs, leftDelay).alias("l")
    val r = right.withWatermark(rightTs, rightDelay).alias("r")
    l.join(r, expr(
      s"""l.`$key` = r.`$key`
         |AND r.`$rightTs` >= l.`$leftTs` + INTERVAL $lower
         |AND r.`$rightTs` <= l.`$leftTs` + INTERVAL $upper""".stripMargin))
  }
}
