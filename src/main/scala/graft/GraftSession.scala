package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory for the engine.
  *
  * Tuned for the local[32] single-JVM harness but with settings chosen to
  * survive a multi-executor cluster: AQE on (runtime re-plan + skew-join
  * handling), shuffle partitions matched to local cores (would be raised on a
  * real cluster), UTC session time zone for oracle parity.
  *
  * `spark.sql.legacy.parquet.nanosAsLong=true` is required because the
  * `events` fixture stores TIMESTAMP(NANOS) which Spark's parquet reader
  * rejects natively; we read nanos as LONG and truncate to micros ourselves
  * (see [[Tables.events]]), exactly matching DuckDB's ns->us truncation so
  * oracle comparisons agree. Mirrors the reference's nanosecond write
  * precision (influx_service.py:200) while documenting Spark's micro limit.
  */
object GraftSession {

  /** Apply engine defaults to a builder; callers may override afterwards. */
  def builder(appName: String = "graft", cores: String = "32"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")

  /** Ensure an externally-created session (driver's Verify/Bench, tests) has
    * the configs the engine depends on. Safe to call repeatedly.
    */
  def prepare(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark
  }
}
