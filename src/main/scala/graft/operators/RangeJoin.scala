package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: points with a timestamp against intervals
  * [start, end) — "which maintenance window / session / outage does each
  * point fall into". A naive `ts >= start AND ts < end` theta join plans
  * as BroadcastNestedLoopJoin (or a full cartesian when neither side fits
  * in a broadcast) — a non-starter at 100 TB.
  *
  * Scale-safe shape: discretize time into fixed-width bins. Every interval
  * is exploded onto each bin it overlaps (explode factor =
  * interval_len / binWidth, bounded and chosen by the caller); every point
  * maps to exactly one bin. The join becomes a plain hash equi-join on
  * (bin [+ any extra keys]) with the exact containment predicate as a
  * post-filter — shuffle parallelism scales with the time range instead of
  * being capped by a broadcast, and no pair outside a shared bin is ever
  * materialized. Pick binUs near the median interval length: wider bins
  * raise false candidates, narrower bins raise the explode factor.
  *
  * All bin arithmetic is integer division (`div`) — double division of
  * epoch-us values loses exactness near 2^53 and can flip a floor at bin
  * boundaries.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, tsCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binUs: Long, extraKeys: Seq[String] = Nil): DataFrame = {
    require(binUs > 0, "bin width must be positive")
    val pts = points.withColumn("__bin", expr(s"$tsCol div ${binUs}L"))
    val ivs = intervals
      // empty/inverted intervals ([start, end) with end <= start) are
      // dropped BEFORE the explode: Spark's sequence() steps -1 when
      // start > stop, so a corrupt interval would otherwise fan out into
      // a huge descending bin list (results stay right via the post-filter,
      // but the shuffle blows up)
      .filter(col(endCol) > col(startCol))
      // [start, end): the last contained instant is end-1
      .withColumn("__bin", explode(sequence(
        expr(s"$startCol div ${binUs}L"), expr(s"($endCol - 1) div ${binUs}L"))))
    pts.join(ivs, ("__bin" +: extraKeys).toSeq)
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }
}
