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

  test("timeRangeEvents boundaries: from-inclusive, to-exclusive, exact at the microsecond") {
    val dir = java.nio.file.Files.createTempDirectory("fixture_bounds").toString
    val base = 1704844800000000L // 2024-01-10 00:00:00 UTC in micros
    // rows 1µs before the lower bound, ON each bound, 1µs before the upper
    spark.createDataFrame(Seq(
      (1L, base - 1L), (2L, base), (3L, base + 86400000000L - 1L),
      (4L, base + 86400000000L))).toDF("event_id", "us")
      .select(col("event_id"), col("event_id").as("user_id"),
        lit("click").as("event_type"), lit(1.0).as("value"), lit("{}").as("props"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
      .filter(graft.operators.TimeSeriesOps.timeRangeEvents(
        "2024-01-10 00:00:00", "2024-01-11 00:00:00"))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(2L, 3L), s"boundary semantics broken: kept $got")
  }

  test("driver fixtures: every column the engine depends on exists with its type family") {
    // one named failure per regenerated table beats N anonymous query
    // failures (the round-8 lesson). Type families, not exact types, so
    // benign width changes (int32 vs int64) don't false-alarm.
    def family(dt: DataType): String = dt match {
      case _: IntegerType | _: LongType | _: ShortType => "int"
      case _: DoubleType | _: FloatType | _: DecimalType => "num"
      case _: StringType => "str"
      case _: TimestampType | _: TimestampNTZType | _: DateType => "time"
      case ArrayType(e, _) => s"array<${family(e)}>"
      case other => other.typeName
    }
    val required: Map[String, Map[String, String]] = Map(
      "region" -> Map("r_regionkey" -> "int", "r_name" -> "str"),
      "nation" -> Map("n_nationkey" -> "int", "n_name" -> "str", "n_regionkey" -> "int"),
      "customer" -> Map("c_custkey" -> "int", "c_nationkey" -> "int",
        "c_acctbal" -> "num", "c_mktsegment" -> "str"),
      "supplier" -> Map("s_suppkey" -> "int", "s_nationkey" -> "int", "s_acctbal" -> "num"),
      "part" -> Map("p_partkey" -> "int", "p_brand" -> "str", "p_type" -> "str",
        "p_size" -> "int", "p_retailprice" -> "num"),
      "orders" -> Map("o_orderkey" -> "int", "o_custkey" -> "int",
        "o_orderstatus" -> "str", "o_totalprice" -> "num",
        "o_orderdate" -> "time", "o_orderpriority" -> "str"),
      "lineitem" -> Map("l_orderkey" -> "int", "l_partkey" -> "int",
        "l_suppkey" -> "int", "l_linenumber" -> "int", "l_quantity" -> "num",
        "l_extendedprice" -> "num", "l_discount" -> "num", "l_tax" -> "num",
        "l_returnflag" -> "str", "l_linestatus" -> "str", "l_shipdate" -> "time"),
      "documents" -> Map("doc_id" -> "int", "text" -> "str", "lang" -> "str",
        "source" -> "str", "n_chars" -> "int"),
      "embeddings" -> Map("vec_id" -> "int", "embedding" -> "array<num>",
        "label" -> "int"))
    val problems = for {
      (tbl, cols) <- required.toSeq
      schema = Tables.table(spark, sf, tbl).schema
      (name, fam) <- cols.toSeq
      actual = schema.fields.find(_.name == name).map(f => family(f.dataType))
      if !actual.contains(fam)
    } yield s"$tbl.$name: want $fam, got ${actual.getOrElse("MISSING")}"
    assert(problems.isEmpty, s"fixture drift:\n  ${problems.mkString("\n  ")}")
  }
}
