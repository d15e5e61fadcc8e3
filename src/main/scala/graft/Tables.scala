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

  /** `events` with its TIMESTAMP(NANOS) column surfaced twice:
    *   - `ts_ns` LONG: full nanosecond epoch (reference writes ns precision,
    *     influx_service.py:200)
    *   - `ts` TIMESTAMP: truncated to microseconds, identical to what DuckDB
    *     yields when reading the same file (truncation, not rounding).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      // integer `div`, not `/`: double division loses precision above 2^53
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))

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
