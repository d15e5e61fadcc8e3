package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The implicit time-series query surface the reference's storage layout is
  * designed to serve (SURVEY.md §2.2): time-range scans, time-bucketed
  * aggregates (the InfluxQL `GROUP BY time(10m)` idiom, cf. the service's own
  * 10-minute rollup at influx_service.py:310-322), last/first value per
  * series, top-k.
  *
  * All operators are shuffle-minimal: one hash-aggregate (partial+final) for
  * buckets, one window per-key for ranks; filters are plain predicates that
  * push down to parquet.
  */
object TimeSeriesOps {

  /** Time-range scan predicate — pushes to the parquet scan. */
  def timeRange(ts: Column, from: String, to: String): Column =
    ts >= lit(from).cast("timestamp") && ts < lit(to).cast("timestamp")

  /** Time-range predicate on a raw nanosecond-epoch LONG column. The derived
    * `ts` timestamp is a computed column, so predicates on it cannot reach
    * the parquet scan; an equivalent bound on the physical `ts_ns` column
    * does (exact for whole-second bounds, since us = ns div 1000).
    */
  def timeRangeNs(tsNs: Column, from: String, to: String): Column = {
    def ns(s: String): Long = // explicit UTC: independent of the JVM default zone
      java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
    tsNs >= lit(ns(from)) && tsNs < lit(ns(to))
  }

  /** Tumbling time-bucket aggregation: `GROUP BY time(dur)` semantics.
    * Uses Spark's `window()` (epoch-aligned tumbling windows); callers pass
    * the aggregate columns. Partial aggregation (map-side combine) applies
    * automatically, so the shuffle carries one row per (key, bucket).
    */
  def bucketAgg(df: DataFrame, ts: Column, duration: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(ts, duration) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("w_start", unix_micros(col("window.start")))
      .drop("window")

  /** Last value per series: `max_by` keeps the aggregation a single
    * hash-agg (no sort, no window shuffle) — the InfluxQL `last()` idiom.
    */
  def lastBy(df: DataFrame, keys: Seq[Column], orderCol: Column, valueCol: Column): DataFrame =
    df.groupBy(keys: _*)
      .agg(
        max_by(valueCol, orderCol).as("last_value"),
        max(orderCol).as("last_ts"),
        min_by(valueCol, orderCol).as("first_value"))

  /** Top-k rows per group by a ranking column; deterministic via explicit
    * tie-breakers. Plans as one shuffle on the partition keys + in-partition
    * sort (no global sort).
    */
  def topKPerGroup(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    df.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }
}
