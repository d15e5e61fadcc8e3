package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout of the narrow point table (the engine's single physical
  * layout; the wide view is derived — see Ingest.wideView).
  *
  * Partitioning: by UTC date. Time-range queries — the dominant access
  * pattern the reference's storage serves (SURVEY.md §2.2) — then prune
  * whole partitions before any IO. Device-level selectivity comes from
  * parquet row-group min/max on `device_id` within a date partition;
  * partitioning by device_id itself would explode the partition count at
  * fleet scale (10^6 devices x 10^3 days), the classic small-files failure.
  * At warehouse scale, add bucketing on device_id for shuffle-free
  * device-aligned joins.
  *
  * Continuous ingestion (streaming appends accumulating small files) goes
  * through [[TxLogTable]] instead: per-batch `append` commits + periodic
  * size-bounded `compact`, with snapshot-isolated readers — the
  * upsert/compaction story plain parquet append lacks.
  */
object PointStore {

  def write(points: DataFrame, path: String): Unit =
    points
      .withColumn("p_date", to_date(col("ts")))
      .repartition(col("p_date")) // one writer wave per partition, no tiny files
      .sortWithinPartitions("device_id", "ts") // tight row-group min/max on device+time
      .write.partitionBy("p_date").mode("overwrite").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Time-range read: the date predicate prunes partitions; the precise ts
    * bounds filter within the boundary dates.
    */
  def readRange(spark: SparkSession, path: String, from: String, to: String): DataFrame =
    read(spark, path)
      .filter(col("p_date") >= to_date(lit(from)) && col("p_date") <= to_date(lit(to)))
      .filter(col("ts") >= lit(from).cast("timestamp") && col("ts") < lit(to).cast("timestamp"))
}
