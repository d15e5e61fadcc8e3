package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All loaders are plain parquet scans so Catalyst predicate pushdown and
  * column pruning apply; nothing is cached here (callers decide).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.prepare(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** `events` with its timestamp surfaced twice — `ts` TIMESTAMP (µs) and
    * `ts_ns` LONG (nanosecond epoch) — whatever layout the fixture was
    * written with (the driver has regenerated it across rounds):
    *
    *   - TIMESTAMP_MICROS file (current): `ts` is the RAW physical column
    *     (read as TimestampType via inferTimestampNTZ=false + UTC session,
    *     an identity re-tag of the stored micros), so time predicates on it
    *     reach the parquet scan; `ts_ns = unix_micros(ts) * 1000` is derived.
    *   - TIMESTAMP(NANOS) file (legacy): Spark's reader only accepts it via
    *     `nanosAsLong`, so `ts_ns` is the raw pushable column and
    *     `ts = timestamp_micros(ts_ns div 1000)` is derived (integer `div`,
    *     not `/`: double division loses precision above 2^53; truncation
    *     matches DuckDB's ns->us cast).
    *
    * Both layouts agree with DuckDB's read of the same file (`epoch_us(ts)`
    * oracle convention), so oracle parity is layout-independent. Time-range
    * scans should filter BOTH columns (TimeSeriesOps.timeRangeEvents): the
    * raw one lands in PushedFilters, the derived twin is redundant but exact.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        // cast is a no-op on TimestampType and a UTC-identity on NTZ, so
        // `ts` stays the scan's own attribute either way (pushdown-safe)
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every fixture as a temp view (events with its ts/ts_ns dual
    * surface) and the engine's SQL functions, so the whole query surface is
    * reachable from `spark.sql(...)` — the BASELINE "query via Spark SQL"
    * entry point. Idempotent.
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
    graft.plans.GraftFunctions.register(spark)
  }
}
