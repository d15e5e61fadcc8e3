package graft.storage

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max statistics index — the Delta/Iceberg data-skipping
  * idea applied to the point store. Partition pruning handles the time
  * dimension (PointStore's date partitions); this index handles the SORT
  * dimension: PointStore sorts rows by (device_id, ts) within each
  * partition, so per-file device ranges are tight and a device-selective
  * query can skip whole files before the scan starts.
  *
  * Parquet row-group min/max gives the same skipping only AFTER a file's
  * footer is opened; at 10⁶ files, footer reads are themselves the
  * bottleneck (one round trip each on an object store). The stats table is
  * one tiny row per file, scanned once, so planning cost is O(files in the
  * index), and the pruned file list goes straight to the reader.
  *
  * Build is a single pass over the table grouped by `input_file_name()`
  * (per-file partial aggregation — the shuffle carries one row per file).
  * The index MUST be rebuilt after any file-changing operation
  * (compaction, vacuum, overwrite): reads through a stale index fail fast
  * on a vanished file — deliberately, since silently skipping it would
  * under-read rows that moved into files the stale index doesn't list.
  */
object StatsIndex {

  /** One row per data file with min/max for each of `cols`. */
  def build(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  def write(stats: DataFrame, statsPath: String): Unit =
    stats.coalesce(1).write.mode("overwrite").parquet(statsPath)

  def read(spark: SparkSession, statsPath: String): DataFrame =
    spark.read.parquet(statsPath)

  /** Files whose [min_c, max_c] range intersects [lo, hi] — the candidate
    * set for a range predicate on `c`. Collect is bounded by file count
    * (the index's whole point is that this is small relative to data).
    */
  def candidateFiles(stats: DataFrame, c: String, lo: Column, hi: Column): Seq[String] =
    stats.filter(col(s"max_$c") >= lo && col(s"min_$c") <= hi)
      .select("file").collect().map(_.getString(0)).toSeq

  /** Range read with file skipping: prune the file list via the index,
    * then scan only the surviving files with the precise predicate on top
    * (the index is a superset filter, never a substitute for it).
    * `tablePath` is passed as basePath so partition columns (e.g.
    * PointStore's p_date) survive the leaf-file read; an empty candidate
    * set returns an empty DataFrame with the table schema — a normal
    * query outcome, not an error.
    */
  def readRange(spark: SparkSession, statsPath: String, tablePath: String, c: String,
                lo: Column, hi: Column): DataFrame = {
    val files = candidateFiles(read(spark, statsPath), c, lo, hi)
    if (files.isEmpty)
      spark.read.parquet(tablePath).where(lit(false))
    else
      spark.read.option("basePath", tablePath).parquet(files: _*)
        .filter(col(c) >= lo && col(c) <= hi)
  }
}
