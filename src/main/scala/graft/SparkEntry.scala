package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.Ingest
import graft.operators.TimeSeriesOps

/** Driver contract — one `queries` entry + one `oracleSql` entry per
  * implemented operator from SURVEY.md §2.
  *
  * Oracle-parity conventions (see SURVEY.md §5.2):
  *   - double aggregates go through `DECIMAL(38,s)` then back to double, so
  *     the sum is order-independent and bit-identical across engines;
  *   - timestamps are emitted as epoch-microsecond longs (`unix_micros`),
  *     matching DuckDB's ns->us truncation of the events fixture;
  *   - every computed column is explicitly aliased identically in both the
  *     Spark plan and the oracle SQL;
  *   - rankings order by exact (decimal/long) keys with explicit tie-breaks.
  */
object SparkEntry {

  /** Order-independent double sum: exact decimal accumulation, double out. */
  private def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(s"decimal(38,$scale)")).cast("double")

  private val one = lit(1)

  /** MQTT-shaped message stream synthesized deterministically from the
    * `events` fixture: topic `openchirp/device/dev{user_id%50}/{event_type}`
    * (format of influx_service.py:129), payload cycling through the
    * reference's type-inference cases (float / bool-exact / bool-miss /
    * json-string / int-collapses-to-float, influx_service.py:149-181).
    */
  def mqttMessages(spark: SparkSession, dir: String): DataFrame = {
    val m = col("event_id") % 6
    Tables.events(spark, dir).select(
      concat_ws("/", lit("openchirp"), lit("device"),
        concat(lit("dev"), col("user_id") % 50), col("event_type")).as("topic"),
      when(m === 0, col("value").cast("string"))
        .when(m === 1, lit("true"))
        .when(m === 2, lit("False"))
        .when(m === 3, lit("TRUE"))
        .when(m === 4, col("props"))
        .otherwise(lit("7")).as("payload"),
      col("ts"), col("ts_ns"))
  }

  private val mqttMessagesSql =
    """SELECT 'openchirp/device/dev' || (user_id % 50) || '/' || event_type AS topic,
      |  CASE event_id % 6
      |    WHEN 0 THEN CAST(value AS VARCHAR) WHEN 1 THEN 'true' WHEN 2 THEN 'False'
      |    WHEN 3 THEN 'TRUE' WHEN 4 THEN props ELSE '7' END AS payload,
      |  ts FROM events""".stripMargin

  /** Device registry stand-in: buckets 0..39 of 50 are registered, so the
    * semi-join (R6, influx_service.py:134-137) actually filters. */
  def registry(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_custkey") % 50 < 40)
      .select(concat(lit("dev"), col("c_custkey") % 50).as("device_id"))
      .distinct()

  private val registrySql =
    "SELECT DISTINCT 'dev' || (c_custkey % 50) AS device_id FROM customer WHERE c_custkey % 50 < 40"

  /** Flagship: the full reference hot path (R1-R9) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_ingest_narrow")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ graft.queries.RelationalQueries.queries ++
      graft.queries.PipelineQueries.queries ++ graft.queries.ExtraQueries.queries ++
      graft.queries.CurationQueries.queries ++ graft.queries.InfluxQLQueries.queries

  def oracleSql: Map[String, String] =
    coreOracleSql ++ graft.queries.RelationalQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql ++ graft.queries.ExtraQueries.oracleSql ++
      graft.queries.CurationQueries.oracleSql ++ graft.queries.InfluxQLQueries.oracleSql

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // R3-R9: topic parse -> type inference -> registry semi-join -> narrow
    // points -> per-series rollup. The whole reference hot path, one plan.
    "q_ingest_narrow" -> ((s, dir) => {
      val parsed = Ingest.inferTypes(Ingest.parseTopic(
        mqttMessages(s, dir).filter(Ingest.dataTopicFilter)))
      val pts = Ingest.narrowPoints(Ingest.registryFilter(parsed, registry(s, dir)))
      pts.groupBy("device_id", "transducer")
        .agg(count(one).as("n_points"), dsum(col("num")).as("sum_num"),
          count(col("bool")).as("n_bool"), count(col("str")).as("n_str"))
    }),

    // R3 dispatch as a gated query: data-plane / control-plane / dead-letter
    // routing over a mixed topic stream (the reference swallows unroutable
    // messages in a bare except, influx_service.py:114-119 — we route and
    // count them)
    "q_dead_letter" -> ((s, dir) => {
      val m = col("event_id") % 5
      val mixed = Tables.events(s, dir).select(
        when(m === 3, lit("openchirp/service/svc1/thing/events"))
          .when(m === 4, concat(lit("noise/"), col("event_type")))
          .otherwise(concat_ws("/", lit("openchirp"), lit("device"),
            concat(lit("dev"), col("user_id") % 50), col("event_type"))).as("topic"))
      mixed.select(
          when(Ingest.dataTopicFilter, "data")
            .when(Ingest.isEventTopic("openchirp/service/svc1/thing/events"), "control")
            .otherwise("dead_letter").as("route"),
          col("topic"))
        .groupBy("route")
        .agg(count(one).as("n"), countDistinct(col("topic")).as("n_topics"))
    }),

    // §2.2: time-bucketed aggregation (GROUP BY time(10m) idiom; R10)
    "q_bucket_10m" -> ((s, dir) => {
      TimeSeriesOps.bucketAgg(Tables.events(s, dir), col("ts"), "10 minutes",
        Seq(col("event_type")),
        Seq(count(one).as("n"), dsum(col("value"), 4).as("sum_value")))
        .select("w_start", "event_type", "n", "sum_value")
    }),

    // R6: registry membership as broadcast left-semi join
    "q_semijoin_registry" -> ((s, dir) => {
      val reg = Tables.customer(s, dir).filter(col("c_custkey") < 100)
        .select(col("c_custkey").as("user_id"))
      Tables.events(s, dir)
        .join(broadcast(reg), Seq("user_id"), "left_semi")
        .groupBy("event_type")
        .agg(count(one).as("n"), dsum(col("value"), 4).as("sum_value"))
    }),

    // dead-letter complement of R6 (unregistered devices)
    "q_antijoin_registry" -> ((s, dir) => {
      val reg = Tables.customer(s, dir).filter(col("c_custkey") < 100)
        .select(col("c_custkey").as("user_id"))
      Tables.events(s, dir)
        .join(broadcast(reg), Seq("user_id"), "left_anti")
        .groupBy("event_type")
        .agg(count(one).as("n"), dsum(col("value"), 4).as("sum_value"))
    }),

    // §2.3 aggregation: TPC-H Q1-style pricing summary (hash-agg, partial+final)
    "q_tpch_q1" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity"), 4).as("sum_qty"),
          dsum(col("l_extendedprice"), 4).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          (dsum(col("l_quantity"), 4) / count(one)).as("avg_qty"),
          count(one).as("count_order"))
    }),

    // §2.3 joins: star join lineitem⋈orders⋈customer⋈nation⋈region
    // (broadcast dims, shuffle only on the fact keys)
    "q_star_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = broadcast(Tables.customer(s, dir))
      val n = broadcast(Tables.nation(s, dir))
      val r = broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
    }),

    // §2.2: last/first value per series (InfluxQL last()/first())
    "q_last_value" -> ((s, dir) => {
      TimeSeriesOps.lastBy(Tables.events(s, dir),
        Seq(col("user_id")), unix_micros(col("ts")), col("value"))
    }),

    // R8: wide/"organized" layout as a derived pivot view
    "q_pivot_wide" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy((col("user_id") % 10).as("user_bucket"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(dsum(col("value"), 4))
    }),

    // §2.3 sorts/top-k: top-3 spenders per event_type, exact decimal
    // ordering. event_type has 5 values, so a plain per-group window would
    // sort ALL (event_type, user) totals on <=5 tasks; the salted two-stage
    // top-k keeps parallelism at |groups|*32 and the final exact window
    // only ranks <=3*32 candidates per group.
    "q_topk_users" -> ((s, dir) => {
      val totals = Tables.events(s, dir)
        .groupBy("event_type", "user_id")
        .agg(sum(col("value").cast("decimal(38,4)")).as("total_dec"))
      TimeSeriesOps.topKPerGroupSalted(totals,
        Seq(col("event_type")), Seq(col("total_dec").desc, col("user_id").asc), 3,
        saltExpr = hash(col("user_id")))
        .select(col("event_type"), col("rk"), col("user_id"),
          col("total_dec").cast("double").as("total"))
    }),

    // §2.3 JSON functions: control-plane style payload extraction
    "q_json_extract" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(one).as("n"), sum(col("k")).as("sum_k"))
    }),

    // §2.3 streaming windows (batch-equivalent): session windows, 30-min gap
    "q_session_window" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(one).as("n_events"), dsum(col("value"), 4).as("sum_value"))
        .select(col("user_id"), unix_micros(col("session_window.start")).as("session_start"),
          col("n_events"), col("sum_value"))
    }),

    // §2.2: time-range scan (dual-column bound -> the raw one reaches the
    // parquet scan as a PushedFilter, whichever fixture layout is on disk)
    "q_time_range" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(TimeSeriesOps.timeRangeEvents("2024-01-10 00:00:00", "2024-01-12 00:00:00"))
        .groupBy("user_id")
        .agg(count(one).as("n"), dsum(col("value"), 4).as("sum_value"))
    })
  )

  private def coreOracleSql: Map[String, String] = Map(
    "q_ingest_narrow" ->
      s"""WITH msgs AS ($mqttMessagesSql),
         |parsed AS (
         |  SELECT split_part(topic,'/',3) AS device_id, lower(split_part(topic,'/',4)) AS transducer,
         |    try_cast(payload AS DOUBLE) AS num,
         |    CASE WHEN try_cast(payload AS DOUBLE) IS NOT NULL THEN NULL
         |         WHEN payload IN ('true','True') THEN true
         |         WHEN payload IN ('false','False') THEN false END AS bool,
         |    CASE WHEN try_cast(payload AS DOUBLE) IS NULL
         |          AND payload NOT IN ('true','True','false','False') THEN payload END AS str
         |  FROM msgs WHERE regexp_matches(topic, '^openchirp/device/[^/]+/[^/]+$$')),
         |registry AS ($registrySql)
         |SELECT device_id, transducer, count(*) AS n_points,
         |  CAST(sum(CAST(num AS DECIMAL(38,6))) AS DOUBLE) AS sum_num,
         |  count(bool) AS n_bool, count(str) AS n_str
         |FROM parsed WHERE device_id IN (SELECT device_id FROM registry)
         |GROUP BY 1, 2""".stripMargin,

    "q_dead_letter" ->
      """WITH mixed AS (
        |  SELECT CASE event_id % 5
        |    WHEN 3 THEN 'openchirp/service/svc1/thing/events'
        |    WHEN 4 THEN 'noise/' || event_type
        |    ELSE 'openchirp/device/dev' || (user_id % 50) || '/' || event_type END AS topic
        |  FROM events)
        |SELECT CASE
        |    WHEN regexp_matches(topic, '^openchirp/device/[^/]+/[^/]+$') THEN 'data'
        |    WHEN topic = 'openchirp/service/svc1/thing/events' THEN 'control'
        |    ELSE 'dead_letter' END AS route,
        |  count(*) AS n, count(DISTINCT topic) AS n_topics
        |FROM mixed GROUP BY 1""".stripMargin,

    "q_bucket_10m" ->
      """SELECT (epoch_us(ts) // 600000000) * 600000000 AS w_start, event_type,
        |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_semijoin_registry" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
        |FROM events WHERE user_id IN (SELECT c_custkey FROM customer WHERE c_custkey < 100)
        |GROUP BY 1""".stripMargin,

    "q_antijoin_registry" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
        |FROM events e WHERE NOT EXISTS (
        |  SELECT 1 FROM customer c WHERE c.c_custkey < 100 AND c.c_custkey = e.user_id)
        |GROUP BY 1""".stripMargin,

    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2""".stripMargin,

    "q_star_join" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1""".stripMargin,

    "q_last_value" ->
      """SELECT user_id, arg_max(value, epoch_us(ts)) AS last_value,
        |  max(epoch_us(ts)) AS last_ts, arg_min(value, epoch_us(ts)) AS first_value
        |FROM events GROUP BY 1""".stripMargin,

    "q_pivot_wide" ->
      """SELECT user_id % 10 AS user_bucket,
        |  CAST(sum(CAST(value AS DECIMAL(38,4))) FILTER (WHERE event_type = 'click') AS DOUBLE) AS click,
        |  CAST(sum(CAST(value AS DECIMAL(38,4))) FILTER (WHERE event_type = 'error') AS DOUBLE) AS error,
        |  CAST(sum(CAST(value AS DECIMAL(38,4))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase,
        |  CAST(sum(CAST(value AS DECIMAL(38,4))) FILTER (WHERE event_type = 'signup') AS DOUBLE) AS signup,
        |  CAST(sum(CAST(value AS DECIMAL(38,4))) FILTER (WHERE event_type = 'view') AS DOUBLE) AS "view"
        |FROM events GROUP BY 1""".stripMargin,

    "q_topk_users" ->
      """WITH totals AS (
        |  SELECT event_type, user_id, sum(CAST(value AS DECIMAL(38,4))) AS total_dec
        |  FROM events GROUP BY 1, 2),
        |ranked AS (
        |  SELECT event_type, row_number() OVER (PARTITION BY event_type
        |    ORDER BY total_dec DESC, user_id) AS rk, user_id, total_dec
        |  FROM totals)
        |SELECT event_type, rk, user_id, CAST(total_dec AS DOUBLE) AS total
        |FROM ranked WHERE rk <= 3""".stripMargin,

    "q_json_extract" ->
      """WITH t AS (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |SELECT k % 10 AS k_bucket, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k FROM t GROUP BY 1""".stripMargin,

    "q_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, epoch_us(min(ts)) AS session_start, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
        |FROM sessions GROUP BY user_id, sid""".stripMargin,

    "q_time_range" ->
      """SELECT user_id, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
        |GROUP BY 1""".stripMargin
  )
}
