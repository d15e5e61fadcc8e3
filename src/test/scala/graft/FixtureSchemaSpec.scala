package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-contract guard: the driver has regenerated `events.parquet` with
  * a different timestamp physical layout between rounds (TIMESTAMP(NANOS) →
  * TIMESTAMP_MICROS NTZ), which once silently broke 64 queries. This spec
  * pins the contract in one named place: whatever layout is on disk,
  * [[Tables.events]] must surface the dual `ts` TIMESTAMP / `ts_ns` LONG
  * schema with consistent values, and time predicates must still reach the
  * parquet scan. Both layouts are synthesized in-test so the probe logic is
  * exercised even after the next regeneration.
  */
class FixtureSchemaSpec extends SparkSuite {

  private def assertDualSurface(df: org.apache.spark.sql.DataFrame): Unit = {
    assert(df.schema("ts").dataType == TimestampType,
      s"ts must be TIMESTAMP, got ${df.schema("ts").dataType}")
    assert(df.schema("ts_ns").dataType == LongType,
      s"ts_ns must be LONG, got ${df.schema("ts_ns").dataType}")
    // the two surfaces must agree: ts_ns truncates to ts's micros
    val bad = df.filter(unix_micros(col("ts")) =!= expr("ts_ns div 1000")).count()
    assert(bad == 0L, s"$bad rows where ts and ts_ns disagree")
  }

  test("driver fixture: events reads with the dual ts/ts_ns surface") {
    val df = Tables.events(spark, sf)
    assertDualSurface(df)
    assert(df.count() > 0)
  }

  test("driver fixture: time predicate on ts reaches the parquet scan") {
    val p = Tables.events(spark, sf)
      .filter(graft.operators.TimeSeriesOps.timeRangeEvents(
        "2024-01-10 00:00:00", "2024-01-12 00:00:00"))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(ts"),
      s"no pushed time bound in:\n$p")
  }

  test("synthesized TIMESTAMP_MICROS (NTZ) layout reads via the probe") {
    val dir = java.nio.file.Files.createTempDirectory("fixture_us").toString
    // write through NTZ so the file gets isAdjustedToUTC=false micros,
    // the current driver fixture's exact physical layout
    spark.range(10).select(
      col("id").as("event_id"), col("id").as("user_id"),
      lit("click").as("event_type"), (col("id") * 1.5).as("value"),
      lit("{}").as("props"),
      timestamp_micros(lit(1704067200000000L) + col("id") * lit(3600000000L))
        .cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assertDualSurface(df)
    assert(df.filter(col("ts_ns") === 1704070800000000L * 1000L).count() == 1)
  }

  test("synthesized legacy nanosecond-LONG layout reads via the probe") {
    val dir = java.nio.file.Files.createTempDirectory("fixture_ns").toString
    // a TIMESTAMP(NANOS) column under nanosAsLong resolves as LONG; a plain
    // LONG ts column is indistinguishable to the probe, so it stands in
    spark.range(10).select(
      col("id").as("event_id"), col("id").as("user_id"),
      lit("click").as("event_type"), (col("id") * 1.5).as("value"),
      lit("{}").as("props"),
      (lit(1704067200000000000L) + col("id") * lit(3600000000000L) + lit(777L)).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assertDualSurface(df)
    // truncation, not rounding: the 777 ns tail drops
    assert(df.filter(unix_micros(col("ts")) === 1704067200000000L).count() == 1)
  }
}
