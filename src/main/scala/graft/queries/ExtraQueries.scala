package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.WeightedAvg

/** Remaining SURVEY §2 checklist items: outer joins, global sort/limit
  * (TakeOrderedAndProject), approximate aggregates (sketches, gated via
  * self-relative error booleans computed identically in both engines),
  * the typed-UDAF surface, and the registry document JSON roundtrip
  * (to_json/from_json/explode, the device-document shape of
  * influx_service.py:226-229).
  */
object ExtraQueries {

  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 6) =
    sum(c.cast(s"decimal(38,$scale)")).cast("double")

  private val one = lit(1)

  /** Materialize a result computed from scratch files under `tmpRoot`,
    * then delete the scratch tree so repeated invocations don't litter the
    * temp filesystem. Fully distributed: the result is WRITTEN to its own
    * parquet dir (executor-parallel, any result size — never a driver
    * collect) and read back from there once the inputs are gone; result
    * dirs are swept by a JVM shutdown hook, so nothing outlives the
    * process.
    */
  private val resultDirs =
    java.util.Collections.synchronizedList(new java.util.ArrayList[java.nio.file.Path]())
  private lazy val resultSweeper: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => resultDirs.forEach(deleteTree(_))))
  private def deleteTree(root: java.nio.file.Path): Unit = {
    val st = java.nio.file.Files.walk(root)
    try st.toArray.map(_.asInstanceOf[java.nio.file.Path])
      .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    finally st.close()
  }
  private def materializeAndClean(s: SparkSession, out: DataFrame,
                                  tmpRoot: java.nio.file.Path): DataFrame = {
    resultSweeper
    val resultDir = java.nio.file.Files.createTempDirectory("graft_result")
    resultDirs.add(resultDir)
    out.write.mode("overwrite").parquet(s"$resultDir/r")
    deleteTree(tmpRoot)
    s.read.parquet(s"$resultDir/r")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // left outer join + null-aware aggregation over the optional side
    "q_outer_join" -> ((s, dir) => {
      val liAgg = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity"), 4).as("qty"))
      Tables.orders(s, dir)
        .join(liAgg, col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy("o_orderpriority")
        .agg(
          count(one).as("n_orders"),
          count(col("qty")).as("n_with_items"),
          dsum(coalesce(col("qty"), lit(0.0))).as("total_qty"))
    }),

    // global top-n: orderBy + limit plans TakeOrderedAndProject (no full sort)
    "q_sort_limit" -> ((s, dir) => {
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // sketches: approx distinct + approx percentiles. The estimates are
    // engine-specific (HLL++ / t-digest internals differ), so the oracle
    // compares each engine's approximation against ITS OWN exact value and
    // emits booleans — both sides deterministically produce `true`, giving
    // the sketches a full rows+schema+hash gate while still exercising them.
    // Exact n_users is also emitted (bit-comparable across engines).
    // Mixing countDistinct with non-distinct aggregates forces Catalyst
    // into an Expand-based plan that replays the scan per aggregate group
    // (measured 12.6s vs 1.8s at sf0.1). Split into one distinct agg and
    // one plain agg, rejoined by broadcast on the tiny group key.
    "q_approx_aggs" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("__nd"))
      val rest = ev.groupBy("event_type")
        .agg(
          // rsd 0.01: the default 0.05 makes a 5% bound a ~1-sigma check
          // that fails ~1/3 of the time once the HLL leaves its near-exact
          // sparse regime (observed at sf0.1); at rsd 0.01 the same bound
          // is 5 sigma
          approx_count_distinct(col("user_id"), 0.01).as("__and"),
          percentile_approx(col("value"), lit(0.5), lit(1000)).as("__ap50"),
          percentile_approx(col("value"), lit(0.95), lit(1000)).as("__ap95"),
          expr("percentile(value, 0.5)").as("__p50"),
          expr("percentile(value, 0.95)").as("__p95"),
          (max(col("value")) - min(col("value"))).as("__spread"))
      rest.join(broadcast(exact), "event_type")
        .select(
          col("event_type"),
          col("__nd").as("n_users"),
          (abs(col("__and") - col("__nd")) <= lit(0.05) * col("__nd")).as("users_ok"),
          (abs(col("__ap50") - col("__p50")) <= lit(0.05) * col("__spread")).as("p50_ok"),
          (abs(col("__ap95") - col("__p95")) <= lit(0.05) * col("__spread")).as("p95_ok"))
    }),

    // count-min sketch: deterministic md5-hash-row grid as ONE map-side-
    // combined aggregation (shuffle bounded at depth*width cells at any
    // input size), probes take min over their cells against the broadcast
    // grid. CMS never undercounts — `never_under` must be true everywhere,
    // and the exact estimate VALUES gate bit-for-bit
    "q_cms_counts" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val cells = graft.operators.SketchOps.cmsCells(ev, col("user_id"), 4, 1024)
      // ONE per-user exact agg serves both the probe-key set and the
      // comparison column (r18): the old shape scanned events a third
      // time for `distinct user_id % 5 == 0` — that set IS the keys of
      // the exact agg, filtered. |users| rows, persisted for its two
      // consumers; 3 corpus scans -> 2.
      val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n")).persist()
      val probes = exact.filter(col("user_id") % 5 === 0).select("user_id")
      graft.operators.SketchOps.cmsEstimate(cells, probes, "user_id", 4, 1024)
        .join(exact, Seq("user_id"))
        .select(col("user_id"), col("exact_n"), col("cms_est"),
          (col("cms_est") >= col("exact_n")).as("never_under"))
    }),

    // ACID MERGE upsert through the transaction-log table: seed a keyed
    // dimension from customer, MERGE the latest-order update per customer
    // (asOf = order date, so stale updates lose), read the committed
    // snapshot back. The oracle recomputes the same upsert relationally —
    // gating the actual write->merge->read roundtrip, not just the algebra.
    "q_table_merge" -> ((s, dir) => {
      val tmpRoot = java.nio.file.Files.createTempDirectory("graft_merge")
      val t = new graft.storage.TxLogTable(s, tmpRoot.toString + "/t")
      t.overwrite(Tables.customer(s, dir).select(
        col("c_custkey").as("k"), col("c_acctbal").as("v"), lit(0L).as("as_of_us")))
      val latestOrder = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("k"))
        .agg(
          max_by(col("o_totalprice"), struct(col("o_orderdate"), col("o_orderkey"))).as("v"),
          // o_orderdate is parquet TIMESTAMP_NTZ; cast is identity under the
          // UTC session zone and matches DuckDB's naive epoch_us
          unix_micros(max(col("o_orderdate")).cast("timestamp")).as("as_of_us"))
      t.merge(latestOrder, keys = Seq("k"), orderCol = Some("as_of_us"))
      materializeAndClean(s, t.read(), tmpRoot)
    }),

    // incremental materialized-view maintenance: seed a per-customer
    // (count, decimal-sum) aggregate from the v0 fact snapshot, append two
    // more batches, fold ONLY the appended rows (the O(delta) change feed)
    // into the view — the oracle recomputes the aggregate from scratch, so
    // a hash match proves incremental == full recompute bit-for-bit
    "q_incremental_mv" -> ((s, dir) => {
      val tmpRoot = java.nio.file.Files.createTempDirectory("graft_imv")
      val t = new graft.storage.TxLogTable(s, tmpRoot.toString + "/fact")
      val o = Tables.orders(s, dir).select(col("o_custkey").as("k"),
        col("o_totalprice").as("v"), col("o_orderkey"))
      t.overwrite(o.filter(col("o_orderkey") % 3 === 0))
      val v0 = t.version.get
      val mv0 = graft.storage.IncrementalAgg.snapshot(t.read(), Seq("k"), "v")
      t.append(o.filter(col("o_orderkey") % 3 === 1))
      t.append(o.filter(col("o_orderkey") % 3 === 2))
      val delta = t.appendsBetween(v0, t.version.get)
        .withColumn("_change_type", lit("insert"))
      val mv = graft.storage.IncrementalAgg.applyDelta(mv0, delta, Seq("k"), "v")
        .select(col("k"), col("cnt"), col("sum_v").cast("double").as("sum_v"))
      materializeAndClean(s, mv, tmpRoot)
    }),

    // Z-order (Morton) curve values over two independent dimensions — the
    // multi-dim clustering key that keeps per-file min/max tight on BOTH
    // columns (file skipping for either predicate; see ZOrder/StorageSpec)
    "q_zorder" -> ((s, dir) => {
      val x = col("user_id").bitwiseAND(lit(1023L))
      val y = floor(col("value")).cast("long").bitwiseAND(lit(1023L))
      Tables.events(s, dir).filter(col("event_id") % 97 === 0)
        .select(col("event_id"), graft.storage.ZOrder.zvalue2(x, y, 10).as("zv"))
    }),

    // BIGMIN z-range scan end-to-end: z-cluster the (user bucket, value
    // bucket) grid with a per-file zv stats index, decompose a query
    // rectangle into z-runs, scan only intersecting files, exact predicate
    // on top — gated against a plain relational box filter in DuckDB
    "q_zrange" -> ((s, dir) => {
      val tmpRoot = java.nio.file.Files.createTempDirectory("graft_zrange")
      val pts = Tables.events(s, dir).select(
        col("event_id"),
        col("user_id").bitwiseAND(lit(1023L)).as("zx"),
        floor(col("value")).cast("long").bitwiseAND(lit(1023L)).as("zy"))
      graft.storage.ZOrder.writeIndexed(pts, col("zx"), col("zy"), bits = 10,
        nFiles = 8, s"$tmpRoot/z", s"$tmpRoot/stats")
      val out = graft.storage.ZOrder.readBox(s, s"$tmpRoot/stats", s"$tmpRoot/z",
          "zx", "zy", xLo = 100L, xHi = 300L, yLo = 40L, yHi = 90L, bits = 10)
        .agg(count(one).as("n_rows"), sum(col("event_id")).as("sum_event_id"),
          sum(col("zx")).as("sum_x"), sum(col("zy")).as("sum_y"))
      materializeAndClean(s, out, tmpRoot)
    }),

    // file-format roundtrip: nation through CSV (headered, quoted), region
    // through JSON lines, read back with explicit schemas, joined and
    // aggregated — gating the actual write->read path of both sources,
    // checked against the parquet originals
    "q_formats_roundtrip" -> ((s, dir) => {
      val tmpRoot = java.nio.file.Files.createTempDirectory("graft_fmt")
      val nationSchema = Tables.nation(s, dir).schema
      val regionSchema = Tables.region(s, dir).schema
      Tables.nation(s, dir).write.option("header", "true").csv(s"$tmpRoot/nation_csv")
      Tables.region(s, dir).write.json(s"$tmpRoot/region_json")
      val nation = s.read.option("header", "true").schema(nationSchema)
        .csv(s"$tmpRoot/nation_csv")
      val region = s.read.schema(regionSchema).json(s"$tmpRoot/region_json")
      val out = nation.join(region, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(one).as("n_nations"), sum(col("n_nationkey")).as("sum_key"))
      materializeAndClean(s, out, tmpRoot)
    }),

    // typed UDAF: weighted average with exact decimal buffer
    "q_udaf_wavg" -> ((s, dir) => {
      val wavg = udaf(WeightedAvg)
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"))
    }),

    // InfluxQL-style per-series analytics: derivative, difference,
    // moving average, cumulative sum, elapsed
    "q_ts_analytics" -> ((s, dir) => {
      graft.operators.TimeSeriesOps.seriesAnalytics(
        Tables.events(s, dir).filter(col("user_id") < 30),
        key = col("user_id"), tsUs = unix_micros(col("ts")), value = col("value"))
    }),

    // time-bucket gap filling with fill(previous): daily buckets over the
    // fixture's January range, LOCF per series
    "q_ts_gapfill" -> ((s, dir) => {
      graft.operators.TimeSeriesOps.gapFillLocf(
        Tables.events(s, dir),
        key = col("user_id"), tsUs = unix_micros(col("ts")), value = col("value"),
        fromUs = 1704067200000000L,            // 2024-01-01 00:00 UTC
        untilUs = 1704067200000000L + 30L * 86400000000L,
        stepUs = 86400000000L)
    }),

    // time-bucket gap filling with fill(linear): 4-hour buckets so real
    // gaps exist; empty buckets take the line between observed neighbors
    "q_ts_gapfill_linear" -> ((s, dir) => {
      graft.operators.TimeSeriesOps.gapFillLinear(
        Tables.events(s, dir).filter(col("user_id") < 50),
        key = col("user_id"), tsUs = unix_micros(col("ts")), value = col("value"),
        fromUs = 1704067200000000L,            // 2024-01-01 00:00 UTC
        untilUs = 1704067200000000L + 30L * 86400000000L,
        stepUs = 14400000000L)                 // 4 h -> 180 buckets
    }),

    // InfluxQL exponential_moving_average as a truncated-kernel window
    // (fixed literal weights -> deterministic IEEE tree, oracle-exact)
    "q_ts_ema" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")), col("event_id"))
      Tables.events(s, dir).filter(col("user_id") < 15)
        .select(col("user_id").as("series_key"), unix_micros(col("ts")).as("ts_us"),
          col("value"),
          graft.operators.TimeSeriesOps.exponentialMovingAverage(
            col("value"), w, n = 4, depth = 10).as("ema4"))
    }),

    // InfluxQL technical-analysis indicators over raw series: Chande
    // momentum, Kaufman efficiency ratio (rolling int64 diff sums) and
    // truncated-Wilder RSI — all integer until one IEEE multiply+divide
    "q_ts_ta" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("series_key"))
        .orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, dir).filter(col("user_id") < 15)
        .select(col("user_id").as("series_key"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), floor(col("value") * lit(1000000.0)).as("vu"))
        .withColumn("du", col("vu") - lag(col("vu"), 1).over(w))
        .select(col("series_key"), col("ts_us"),
          graft.operators.TimeSeriesOps.chandeMomentumOscillator(
            col("vu"), col("du"), w, n = 5).as("cmo5"),
          graft.operators.TimeSeriesOps.kaufmansEfficiencyRatio(
            col("vu"), col("du"), w, n = 5).as("ker5"),
          graft.operators.TimeSeriesOps.relativeStrengthIndex(
            col("du"), w, n = 4, depth = 10).as("rsi4"))
    }),

    // InfluxQL double/triple EMA + TRIX: staged truncated-kernel EMAs,
    // each stage re-quantized before re-entering the integer kernel
    "q_ts_tema" -> ((s, dir) => {
      graft.operators.TimeSeriesOps.emaStages(
        Tables.events(s, dir).filter(col("user_id") < 15),
        col("user_id"), unix_micros(col("ts")), col("value"),
        n = 4, depth = 10, stages = 3, tieBreak = Seq(col("event_id")))
        .select(col("series_key"), col("ts_us"),
          (lit(2.0) * col("e1") - col("e2")).as("dema4"),
          (lit(3.0) * col("e1") - lit(3.0) * col("e2") + col("e3")).as("tema4"),
          {
            import org.apache.spark.sql.expressions.Window
            val w = Window.partitionBy(col("series_key"))
              .orderBy(col("ts_us"), col("__tb0"))
            val prev = lag(col("e3"), 1).over(w)
            when(prev.isNotNull && prev =!= 0.0,
              (lit(100.0) * (col("e3") - prev)) / prev)
              .otherwise(lit(null).cast("double")).as("trix4")
          })
    }),

    // InfluxQL holt_winters(): fixed-coefficient Holt forecast — EMA-kernel
    // level + EMA-kernel trend over first differences, horizons 1..3 from
    // each series' last point
    "q_ts_holt" -> ((s, dir) => {
      graft.operators.TimeSeriesOps.holtForecast(
        Tables.events(s, dir).filter(col("user_id") < 15),
        col("user_id"), unix_micros(col("ts")), col("value"),
        n = 4, depth = 10, horizons = Seq(1, 2, 3), tieBreak = Seq(col("event_id")))
    }),

    // InfluxQL integral(): trapezoid area under each series, quantized-summed
    "q_ts_integral" -> ((s, dir) => {
      graft.operators.TimeSeriesOps.integral(Tables.events(s, dir),
        col("user_id"), unix_micros(col("ts")), col("value"),
        tieBreak = Seq(col("event_id")))
    }),

    // trailing TIME-window aggregates (RANGE frame over event-time micros):
    // "sum/count over the last 10 minutes" per event — the time-based frame
    // InfluxQL moving windows imply, which a ROWS frame cannot express for
    // irregular series. RANGE frames treat order-value peers identically in
    // every engine, so ties don't break determinism.
    "q_trailing_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
        .rangeBetween(-600000000L, 0) // 10 minutes of microseconds, inclusive
      Tables.events(s, dir).filter(col("user_id") < 25)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          sum(col("value").cast("decimal(38,4)")).over(w).cast("double").as("sum_10m"),
          count(lit(1)).over(w).as("n_10m"))
    }),

    // InfluxQL mode(): most frequent value per series (deterministic
    // tie-break on the value itself). user_id is high-cardinality, so the
    // per-series window scales with the data — no low-cardinality ceiling.
    "q_ts_mode" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("n").desc, col("event_type").asc)
      counts.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("user_id"), col("event_type").as("mode_value"), col("n").as("n_obs"))
    }),

    // per-series z-score outlier detection from exact decimal moments
    "q_ts_outliers" -> ((s, dir) => {
      graft.operators.StatsOps.outlierStats(Tables.events(s, dir),
        col("user_id"), col("value"), k = 2.0)
    }),

    // Pearson correlation of click vs view spend per (user, day) cell —
    // integer-quantized units, exact decimal moments, one double tree
    "q_ts_corr" -> ((s, dir) => {
      val units = floor(col("value") * lit(100.0))
      val cells = Tables.events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(when(col("event_type") === "click", units)).as("xu"),
          sum(when(col("event_type") === "view", units)).as("yu"))
      graft.operators.StatsOps.pearsonUnits(cells, col("xu"), col("yu"))
    }),

    // the custom physical as-of operator (AsofJoinNode/Strategy/Exec) on the
    // same alignment task as q_asof_join, checked against DuckDB's ASOF JOIN
    "q_asof_join_exec" -> ((s, dir) => {
      val ev = Tables.events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_us", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("click_ts"), col("value").as("click_value"))
      graft.plans.AsofJoinExecApi.asof(purchases, clicks, Seq("user_id"), "ts_us", "click_ts")
        .select(col("event_id"), col("ts_us"), col("value"), col("click_ts"), col("click_value"))
    }),

    // sliding event-time windows (20-min window, 10-min slide: each event
    // lands in exactly two windows)
    "q_sliding_window" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "20 minutes", "10 minutes"), col("event_type"))
        .agg(count(one).as("n"), dsum(col("value"), 4).as("sum_value"))
        .select(unix_micros(col("window.start")).as("w_start"), col("event_type"),
          col("n"), col("sum_value"))
    }),

    // device-document JSON roundtrip: build the REST document shape, parse
    // it back (from_json), explode the transducer array into registry rows
    "q_registry_explode" -> ((s, dir) => {
      val docSchema = StructType(Seq(
        StructField("id", LongType),
        StructField("transducers", ArrayType(StructType(Seq(StructField("name", StringType)))))))
      Tables.customer(s, dir)
        .select(to_json(struct(
          col("c_custkey").as("id"),
          array(struct(lit("Temp").as("name")),
            struct(concat(lit("s"), col("c_custkey") % 4).as("name"))).as("transducers"))).as("doc"))
        .select(from_json(col("doc"), docSchema).as("d"))
        .select(col("d.id").as("device_id"), explode(col("d.transducers")).as("t"))
        .select(col("device_id"), lower(col("t.name")).as("transducer"))
        .groupBy("transducer")
        .agg(count(one).as("n"), countDistinct(col("device_id")).as("n_devices"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_outer_join" ->
      """WITH li AS (SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS qty
        |  FROM lineitem GROUP BY 1)
        |SELECT o_orderpriority, count(*) AS n_orders, count(qty) AS n_with_items,
        |  CAST(sum(CAST(coalesce(qty, 0.0) AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
        |FROM orders LEFT JOIN li ON o_orderkey = l_orderkey
        |GROUP BY 1""".stripMargin,

    "q_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q_approx_aggs" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS n_users,
        |  abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
        |    <= 0.05 * count(DISTINCT user_id) AS users_ok,
        |  abs(approx_quantile(value, 0.5) - quantile_cont(value, 0.5))
        |    <= 0.05 * (max(value) - min(value)) AS p50_ok,
        |  abs(approx_quantile(value, 0.95) - quantile_cont(value, 0.95))
        |    <= 0.05 * (max(value) - min(value)) AS p95_ok
        |FROM events GROUP BY 1""".stripMargin,

    "q_cms_counts" -> {
      def bh(k: String) = PipelineQueries.hash60Sql(
        s"'cms' || CAST(t.r AS VARCHAR) || '_' || $k") + " % 1024"
      s"""WITH cells AS (SELECT t.r, ${bh("CAST(user_id AS VARCHAR)")} AS b,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM events, UNNEST([0, 1, 2, 3]) t(r) GROUP BY 1, 2),
         |pr AS (SELECT DISTINCT user_id FROM events WHERE user_id % 5 = 0),
         |pc AS (SELECT pr.user_id, t.r, ${bh("CAST(pr.user_id AS VARCHAR)")} AS b
         |  FROM pr, UNNEST([0, 1, 2, 3]) t(r)),
         |es AS (SELECT user_id, min(coalesce(cnt, CAST(0 AS BIGINT))) AS cms_est
         |  FROM pc LEFT JOIN cells ON pc.r = cells.r AND pc.b = cells.b
         |  GROUP BY 1),
         |ex AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_n
         |  FROM events GROUP BY 1)
         |SELECT es.user_id, exact_n, CAST(cms_est AS BIGINT) AS cms_est,
         |  cms_est >= exact_n AS never_under
         |FROM es JOIN ex USING (user_id)""".stripMargin
    },

    "q_table_merge" ->
      """WITH ranked AS (
        |  SELECT o_custkey AS k, o_totalprice AS v,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders),
        |mx AS (SELECT o_custkey AS k, epoch_us(max(o_orderdate)) AS as_of_us
        |  FROM orders GROUP BY 1),
        |upd AS (SELECT r.k, r.v, m.as_of_us FROM ranked r JOIN mx m ON r.k = m.k WHERE r.rn = 1)
        |SELECT coalesce(u.k, c.c_custkey) AS k,
        |  coalesce(u.v, c.c_acctbal) AS v,
        |  coalesce(u.as_of_us, 0) AS as_of_us
        |FROM customer c FULL JOIN upd u ON c.c_custkey = u.k""".stripMargin,

    "q_incremental_mv" ->
      """SELECT o_custkey AS k, count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_v
        |FROM orders GROUP BY 1""".stripMargin,

    "q_zorder" ->
      s"""WITH t AS (SELECT event_id, user_id & 1023 AS zx,
         |    CAST(floor(value) AS BIGINT) & 1023 AS zy
         |  FROM events WHERE event_id % 97 = 0)
         |SELECT event_id, ${graft.storage.ZOrder.zvalue2Sql("zx", "zy", 10)} AS zv
         |FROM t""".stripMargin,

    "q_zrange" ->
      """WITH t AS (SELECT event_id, user_id & 1023 AS zx,
        |    CAST(floor(value) AS BIGINT) & 1023 AS zy
        |  FROM events)
        |SELECT count(*) AS n_rows, CAST(sum(event_id) AS BIGINT) AS sum_event_id,
        |  CAST(sum(zx) AS BIGINT) AS sum_x, CAST(sum(zy) AS BIGINT) AS sum_y
        |FROM t WHERE zx BETWEEN 100 AND 300 AND zy BETWEEN 40 AND 90""".stripMargin,

    "q_formats_roundtrip" ->
      """SELECT r_name, count(*) AS n_nations,
        |  CAST(sum(n_nationkey) AS BIGINT) AS sum_key
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1""".stripMargin,

    "q_udaf_wavg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(38,6))) AS DOUBLE)
        |    / CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS wavg_price
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q_ts_analytics" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events WHERE user_id < 30),
        |d AS (SELECT user_id, ts_us, value,
        |    value - lag(value) OVER w AS difference,
        |    ts_us - lag(ts_us) OVER w AS elapsed_us,
        |    (value - lag(value) OVER w) / (CAST(ts_us - lag(ts_us) OVER w AS DOUBLE) / 1000000.0) AS derivative,
        |    CAST(sum(CAST(value AS DECIMAL(38,4))) OVER f AS DOUBLE) / count(*) OVER f AS moving_avg_3,
        |    CAST(sum(CAST(value AS DECIMAL(38,4))) OVER
        |      (PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cumulative_sum,
        |    max(value) OVER p - min(value) OVER p AS spread
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us),
        |         f AS (PARTITION BY user_id ORDER BY ts_us ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        |         p AS (PARTITION BY user_id))
        |SELECT user_id AS series_key, ts_us, value, difference, elapsed_us, derivative,
        |  CASE WHEN derivative < 0 THEN NULL ELSE derivative END AS nn_derivative,
        |  moving_avg_3, cumulative_sum, spread
        |FROM d""".stripMargin,

    "q_ts_gapfill" ->
      """WITH b AS (
        |  SELECT user_id AS series_key,
        |    (epoch_us(ts) - 1704067200000000) // 86400000000 AS bucket,
        |    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS bucket_sum
        |  FROM events
        |  WHERE epoch_us(ts) >= 1704067200000000 AND epoch_us(ts) < 1706659200000000
        |  GROUP BY 1, 2),
        |keys AS (SELECT DISTINCT series_key FROM b),
        |skel AS (SELECT series_key, o AS bucket FROM keys, UNNEST(generate_series(0, 29)) AS t(o)),
        |j AS (SELECT s.series_key, s.bucket,
        |    1704067200000000 + s.bucket * 86400000000 AS bucket_start_us, b.bucket_sum
        |  FROM skel s LEFT JOIN b ON s.series_key = b.series_key AND s.bucket = b.bucket)
        |SELECT series_key, bucket, bucket_start_us, bucket_sum,
        |  last_value(bucket_sum IGNORE NULLS) OVER
        |    (PARTITION BY series_key ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS filled_sum
        |FROM j""".stripMargin,

    "q_ts_gapfill_linear" ->
      """WITH b AS (
        |  SELECT user_id AS series_key,
        |    (epoch_us(ts) - 1704067200000000) // 14400000000 AS bucket,
        |    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS bucket_sum
        |  FROM events
        |  WHERE epoch_us(ts) >= 1704067200000000 AND epoch_us(ts) < 1706659200000000
        |    AND user_id < 50
        |  GROUP BY 1, 2),
        |keys AS (SELECT DISTINCT series_key FROM b),
        |skel AS (SELECT series_key, o AS bucket FROM keys, UNNEST(generate_series(0, 179)) AS t(o)),
        |j AS (SELECT s.series_key, s.bucket, b.bucket_sum
        |  FROM skel s LEFT JOIN b ON s.series_key = b.series_key AND s.bucket = b.bucket),
        |w AS (SELECT series_key, bucket, bucket_sum,
        |    last_value(bucket_sum IGNORE NULLS) OVER pb AS pv,
        |    last_value(CASE WHEN bucket_sum IS NOT NULL THEN bucket END IGNORE NULLS) OVER pb AS pbk,
        |    first_value(bucket_sum IGNORE NULLS) OVER nf AS nv,
        |    first_value(CASE WHEN bucket_sum IS NOT NULL THEN bucket END IGNORE NULLS) OVER nf AS nbk
        |  FROM j
        |  WINDOW pb AS (PARTITION BY series_key ORDER BY bucket ROWS UNBOUNDED PRECEDING),
        |         nf AS (PARTITION BY series_key ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT series_key, bucket,
        |  1704067200000000 + bucket * 14400000000 AS bucket_start_us, bucket_sum,
        |  CASE WHEN bucket_sum IS NOT NULL THEN bucket_sum
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL
        |         THEN pv + (nv - pv) * (CAST(bucket - pbk AS DOUBLE) / CAST(nbk - pbk AS DOUBLE))
        |       ELSE NULL END AS filled_sum
        |FROM w""".stripMargin,

    "q_ts_ema" -> {
      val cs = graft.operators.TimeSeriesOps.emaCoefficients(4, 10)
      val num = cs.zipWithIndex.map { case (c, j) =>
        s"coalesce(lag(vu, $j) OVER w * $c, 0)"
      }.mkString(" + ")
      val den = cs.zipWithIndex.map { case (c, j) =>
        s"CASE WHEN lag(vu, $j) OVER w IS NOT NULL THEN $c ELSE 0 END"
      }.mkString(" + ")
      s"""WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
         |    CAST(floor(value * 1000000.0) AS BIGINT) AS vu
         |  FROM events WHERE user_id < 15)
         |SELECT user_id AS series_key, ts_us, value,
         |  CAST(($num) AS DOUBLE) / CAST(($den) AS DOUBLE) / 1000000.0 AS ema4
         |FROM t
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)""".stripMargin
    },

    "q_ts_ta" -> {
      val cs = graft.operators.TimeSeriesOps.wilderCoefficients(4, 10)
      val g = cs.zipWithIndex.map { case (c, j) =>
        s"coalesce(lag(gn, $j) OVER w * $c, 0)"
      }.mkString(" + ")
      val l = cs.zipWithIndex.map { case (c, j) =>
        s"coalesce(lag(ls, $j) OVER w * $c, 0)"
      }.mkString(" + ")
      val mass = cs.zipWithIndex.map { case (c, j) =>
        s"CASE WHEN lag(du, $j) OVER w IS NOT NULL THEN $c ELSE 0 END"
      }.mkString(" + ")
      s"""WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         |    CAST(floor(value * 1000000.0) AS BIGINT) AS vu
         |  FROM events WHERE user_id < 15),
         |d AS (SELECT *,
         |    vu - lag(vu) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS du
         |  FROM t),
         |d2 AS (SELECT *,
         |    CASE WHEN du > 0 THEN du ELSE 0 END AS gn,
         |    CASE WHEN du < 0 THEN -du ELSE 0 END AS ls
         |  FROM d),
         |s AS (SELECT *,
         |    CAST(sum(gn) OVER wf AS BIGINT) AS up,
         |    CAST(sum(ls) OVER wf AS BIGINT) AS down,
         |    CAST(sum(abs(du)) OVER wf AS BIGINT) AS vol,
         |    lag(vu, 5) OVER w AS v5,
         |    CAST(($g) AS BIGINT) AS gk,
         |    CAST(($l) AS BIGINT) AS lk,
         |    CAST(($mass) AS BIGINT) AS mass
         |  FROM d2
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id),
         |    wf AS (PARTITION BY user_id ORDER BY ts_us, event_id
         |           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
         |SELECT user_id AS series_key, ts_us,
         |  CASE WHEN v5 IS NOT NULL THEN
         |    CASE WHEN up + down = 0 THEN 0.0
         |      ELSE (100.0 * CAST(up - down AS DOUBLE)) / CAST(up + down AS DOUBLE) END
         |    ELSE NULL END AS cmo5,
         |  CASE WHEN v5 IS NOT NULL THEN
         |    CASE WHEN vol = 0 THEN 0.0
         |      ELSE CAST(abs(vu - v5) AS DOUBLE) / CAST(vol AS DOUBLE) END
         |    ELSE NULL END AS ker5,
         |  CASE WHEN mass > 0 THEN
         |    CASE WHEN gk + lk = 0 THEN 50.0
         |      ELSE (100.0 * CAST(gk AS DOUBLE)) / CAST(gk + lk AS DOUBLE) END
         |    ELSE NULL END AS rsi4
         |FROM s""".stripMargin
    },

    "q_ts_tema" -> {
      val cs = graft.operators.TimeSeriesOps.emaCoefficients(4, 10)
      def ema(u: String) = {
        val num = cs.zipWithIndex.map { case (c, j) =>
          s"coalesce(lag($u, $j) OVER w * $c, 0)"
        }.mkString(" + ")
        val den = cs.zipWithIndex.map { case (c, j) =>
          s"CASE WHEN lag($u, $j) OVER w IS NOT NULL THEN $c ELSE 0 END"
        }.mkString(" + ")
        s"CAST(($num) AS DOUBLE) / CAST(($den) AS DOUBLE) / 1000000.0"
      }
      s"""WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         |    CAST(floor(value * 1000000.0) AS BIGINT) AS vu
         |  FROM events WHERE user_id < 15),
         |s1 AS (SELECT user_id, event_id, ts_us, ${ema("vu")} AS e1
         |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         |q1 AS (SELECT *, CAST(floor(e1 * 1000000.0) AS BIGINT) AS u1 FROM s1),
         |s2 AS (SELECT user_id, event_id, ts_us, e1, ${ema("u1")} AS e2
         |  FROM q1 WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         |q2 AS (SELECT *, CAST(floor(e2 * 1000000.0) AS BIGINT) AS u2 FROM s2),
         |s3 AS (SELECT user_id, event_id, ts_us, e1, e2, ${ema("u2")} AS e3
         |  FROM q2 WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         |f AS (SELECT *, lag(e3) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS p3
         |  FROM s3)
         |SELECT user_id AS series_key, ts_us,
         |  2.0 * e1 - e2 AS dema4,
         |  3.0 * e1 - 3.0 * e2 + e3 AS tema4,
         |  CASE WHEN p3 IS NOT NULL AND p3 <> 0.0
         |    THEN (100.0 * (e3 - p3)) / p3 ELSE NULL END AS trix4
         |FROM f""".stripMargin
    },

    "q_ts_holt" -> {
      val cs = graft.operators.TimeSeriesOps.emaCoefficients(4, 10)
      def num(u: String) = cs.zipWithIndex.map { case (c, j) =>
        s"coalesce(lag($u, $j) OVER w * $c, 0)"
      }.mkString(" + ")
      def den(u: String) = cs.zipWithIndex.map { case (c, j) =>
        s"CASE WHEN lag($u, $j) OVER w IS NOT NULL THEN $c ELSE 0 END"
      }.mkString(" + ")
      s"""WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
         |    CAST(floor(value * 1000000.0) AS BIGINT) AS vu
         |  FROM events WHERE user_id < 15),
         |d AS (SELECT *, CAST(floor((value - lag(value) OVER
         |      (PARTITION BY user_id ORDER BY ts_us, event_id)) * 1000000.0) AS BIGINT) AS du
         |  FROM t),
         |e AS (SELECT user_id,
         |    CAST((${num("vu")}) AS DOUBLE) / CAST((${den("vu")}) AS DOUBLE) / 1000000.0 AS sm_level,
         |    CAST((${num("du")}) AS DOUBLE) / CAST((${den("du")}) AS DOUBLE) / 1000000.0 AS trd,
         |    row_number() OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn
         |  FROM d WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         |lastp AS (SELECT user_id, sm_level,
         |    CASE WHEN isnan(trd) THEN 0.0 ELSE trd END AS sm_trend
         |  FROM e WHERE rn = 1)
         |SELECT user_id AS series_key, CAST(h AS BIGINT) AS h, sm_level, sm_trend,
         |  sm_level + CAST(h AS BIGINT) * sm_trend AS forecast
         |FROM lastp, UNNEST([1, 2, 3]) AS u(h)""".stripMargin
    },

    "q_ts_integral" ->
      """WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
        |tr AS (SELECT user_id,
        |    CAST(floor(((value + lag(value) OVER w) / 2.0
        |      * (CAST(ts_us - lag(ts_us) OVER w AS DOUBLE) / 1000000.0))
        |      * 1000000.0) AS BIGINT) AS u
        |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT user_id AS series_key,
        |  CAST(coalesce(sum(u), 0) AS DOUBLE) / 1000000.0 AS integral,
        |  count(u) AS n_segments
        |FROM tr GROUP BY 1""".stripMargin,

    "q_trailing_window" ->
      """SELECT user_id, epoch_us(ts) AS ts_us,
        |  CAST(sum(CAST(value AS DECIMAL(38,4))) OVER w AS DOUBLE) AS sum_10m,
        |  count(*) OVER w AS n_10m
        |FROM events WHERE user_id < 25
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_ts_mode" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2),
        |r AS (SELECT user_id, event_type, n,
        |    row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
        |  FROM c)
        |SELECT user_id, event_type AS mode_value, n AS n_obs FROM r WHERE rk = 1""".stripMargin,

    "q_ts_outliers" ->
      """WITH st AS (SELECT user_id, value,
        |    CAST(count(value) OVER w AS DOUBLE) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(38,4))) OVER w AS DOUBLE) AS sx,
        |    CAST(sum(CAST(value * value AS DECIMAL(38,4))) OVER w AS DOUBLE) AS sxx
        |  FROM events WINDOW w AS (PARTITION BY user_id)),
        |fl AS (SELECT user_id, value, sx / n AS mean,
        |    sqrt(greatest((sxx - sx * sx / n) / (n - 1.0), 0.0)) AS std
        |  FROM st)
        |SELECT user_id AS series_key, count(value) AS n,
        |  CAST(sum(CASE WHEN abs(value - mean) > 2.0 * std THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  min(mean) AS mean, min(std) AS std
        |FROM fl GROUP BY 1""".stripMargin,

    "q_ts_corr" ->
      """WITH u AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    CASE WHEN event_type = 'click' THEN CAST(floor(value * 100.0) AS BIGINT) END AS xu0,
        |    CASE WHEN event_type = 'view' THEN CAST(floor(value * 100.0) AS BIGINT) END AS yu0
        |  FROM events),
        |cells AS (SELECT user_id, day, sum(xu0) AS xu, sum(yu0) AS yu FROM u GROUP BY 1, 2),
        |p AS (SELECT xu, yu FROM cells WHERE xu IS NOT NULL AND yu IS NOT NULL),
        |m AS (SELECT count(*) AS n,
        |    sum(CAST(xu AS DECIMAL(38,0))) AS sx, sum(CAST(yu AS DECIMAL(38,0))) AS sy,
        |    sum(CAST(xu AS DECIMAL(38,0)) * CAST(yu AS DECIMAL(38,0))) AS sxy,
        |    sum(CAST(xu AS DECIMAL(38,0)) * CAST(xu AS DECIMAL(38,0))) AS sxx,
        |    sum(CAST(yu AS DECIMAL(38,0)) * CAST(yu AS DECIMAL(38,0))) AS syy
        |  FROM p)
        |SELECT n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr
        |FROM m""".stripMargin,

    "q_asof_join_exec" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value FROM events),
        |p AS (SELECT event_id, user_id, ts_us, value FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts_us AS click_ts, value AS click_value FROM ev WHERE event_type = 'click')
        |SELECT p.event_id, p.ts_us, p.value, c.click_ts, c.click_value
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND c.click_ts <= p.ts_us""".stripMargin,

    "q_sliding_window" ->
      """WITH expanded AS (
        |  SELECT ((epoch_us(ts) // 600000000) - o) * 600000000 AS w_start, event_type, value
        |  FROM events, UNNEST([0, 1]) AS t(o))
        |SELECT w_start, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
        |FROM expanded GROUP BY 1, 2""".stripMargin,

    "q_registry_explode" ->
      """WITH t AS (
        |  SELECT c_custkey AS device_id, 'temp' AS transducer FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 's' || (c_custkey % 4) FROM customer)
        |SELECT transducer, count(*) AS n, count(DISTINCT device_id) AS n_devices
        |FROM t GROUP BY 1""".stripMargin
  )
}
