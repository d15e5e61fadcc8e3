package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.influxql.InfluxQL

/** Oracle-gated queries for the InfluxQL SELECT front-end: each runs a real
  * InfluxQL string through the parser + planner (graft.influxql.InfluxQL)
  * over the events fixture shaped as narrow points, and the DuckDB oracle
  * recomputes the identical semantics in SQL. The point surface mirrors the
  * reference's storage model: device tag = `dev{user_id % 50}` (the topic
  * device id, influx_service.py:129), measurement = event_type, time in
  * epoch microseconds.
  */
object InfluxQLQueries {

  /** The narrow-points adapter the front-end queries run over. The events
    * dual time surface (`ts` TIMESTAMP + `ts_ns` LONG, Tables.events) rides
    * along so the planner's redundant raw-column time bounds reach the
    * parquet scan whichever column is physical (PushedFilters — pinned by
    * PlanAuditSpec); `ts_us` is the exact query-time surface.
    */
  def points(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      concat(lit("dev"), col("user_id") % 50).as("device"),
      col("event_type").as("transducer"),
      unix_micros(col("ts")).as("ts_us"),
      col("ts"),
      col("ts_ns"),
      col("value"))

  private val ptsSql =
    """pts AS (SELECT 'dev' || (user_id % 50) AS device, event_type AS transducer,
      |  epoch_us(ts) AS ts_us, value FROM events)""".stripMargin

  /** The companion-query surface needs a SECOND tag and a SECOND field so
    * companions exercise both kinds: `cohort` (tag, u0..u9) and `load`
    * (field, user_id mod 97 as double) ride beside the device/value pair.
    */
  def pointsWide(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      concat(lit("dev"), col("user_id") % 50).as("device"),
      concat(lit("u"), col("user_id") % 10).as("cohort"),
      col("event_type").as("transducer"),
      unix_micros(col("ts")).as("ts_us"),
      col("ts"),
      col("ts_ns"),
      col("value"),
      (col("user_id") % 97).cast("double").as("load"))

  private val ptsWSql =
    """ptsw AS (SELECT 'dev' || (user_id % 50) AS device,
      |  'u' || (user_id % 10) AS cohort, event_type AS transducer,
      |  epoch_us(ts) AS ts_us, value,
      |  CAST(user_id % 97 AS DOUBLE) AS load FROM events)""".stripMargin

  // exact-moment sample stddev of 1e-6-quantized values (the engine's
  // deterministic stddev pin), as DuckDB SQL
  private val vuSql = "CAST(floor(value*1000000.0) AS DECIMAL(38,0))"
  private val stddevSql =
    s"""CASE WHEN count(value) > 1 THEN
       |  sqrt((CAST(count(value) AS DOUBLE) * CAST(sum($vuSql * $vuSql) AS DOUBLE)
       |        - CAST(sum($vuSql) AS DOUBLE) * CAST(sum($vuSql) AS DOUBLE))
       |       / CAST(count(value) * (count(value) - 1) AS DOUBLE)) / 1000000.0
       |ELSE NULL END""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // the full aggregate surface through one InfluxQL statement: daily
    // buckets per device over January, default fill(null) densification
    "q_influxql_agg" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT count(value), sum(value), mean(value), min(value), max(value),
          |       spread(value), stddev(value)
          |FROM click
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |GROUP BY time(1d), device""".stripMargin)
    }),

    // fill(linear) + a negated tag predicate: empty 6-hour buckets take the
    // straight line between observed neighbors, per device
    "q_influxql_fill" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT mean(value) FROM view
          |WHERE time >= '2024-01-01' AND time < '2024-01-31' AND device != 'dev7'
          |GROUP BY time(6h), device FILL(linear)""".stripMargin)
    }),

    // transformations over aggregates: rate, delta, running and moving
    // forms across the densified daily series, per device
    "q_influxql_transform" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT derivative(mean(value), 1h) AS dmean, difference(max(value)) AS dmax,
          |       cumulative_sum(sum(value)) AS csum, moving_average(mean(value), 3) AS ma3
          |FROM signup
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |GROUP BY time(1d), device""".stripMargin)
    }),

    // regex FROM: matching measurements stay separate series, surfaced as
    // a measurement column; fill densifies per measurement
    "q_influxql_regex" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT count(value), mean(value) FROM /^(click|view)$/
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |GROUP BY time(1d)""".stripMargin)
    }),

    // mode() beside a one-pass aggregate: two-level frequency aggregation
    // equi-joined back on the (epoch-aligned weekly bucket, device) keys
    "q_influxql_mode" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT mode(value), count(value) FROM view
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |GROUP BY time(1w), device""".stripMargin)
    }),

    // top(value, N) per tag group: N extreme POINTS with their own times
    // (rank window pruned by WindowGroupLimit, never a full per-group sort)
    "q_influxql_topn" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT top(value, 3) FROM error
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |GROUP BY device""".stripMargin)
    }),

    // the three-arg per-tag form (InfluxDB 1.8): the 5 greatest points
    // across DISTINCT device values, at most one per device — a rank-1
    // champion window per tag value (WindowGroupLimit prunes to one row
    // per device before the exchange), then a top-5 over the champions,
    // whose row count is bounded by tag cardinality (50 devices)
    "q_influxql_topn_tag" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT top(value, device, 5) FROM click
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'""".stripMargin)
    }),

    // top/bottom under GROUP BY time(d): the 2 smallest points per
    // (device, day) bucket, each keeping its ORIGINAL point timestamp
    // (InfluxDB 1.8 — top/bottom never collapse to the bucket start)
    "q_influxql_topn_bucketed" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT bottom(value, 2) FROM click
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |GROUP BY time(1d), device""".stripMargin)
    }),

    // selector companion columns (InfluxDB 1.8, r17): max(value) beside
    // bare tag/field refs returns the SELECTED point's companion values;
    // under GROUP BY time(1d) the row collapses to the bucket start while
    // companions still come from the picked point. One rank-1 window per
    // bucket (WindowGroupLimit-pruned), ties pinned (value desc, ts asc,
    // companions asc)
    "q_influxql_selector_companion" -> ((s, dir) => {
      InfluxQL.run(pointsWide(s, dir),
        """SELECT max(value), device, load FROM click
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |GROUP BY time(1d)""".stripMargin)
    }),

    // percentile companion: selects an ACTUAL point per device by
    // InfluxDB's nearest-rank rule (1-based rank = floor(n*P/100 + 0.5)
    // over value-ascending order) — the bare percentile AGGREGATE
    // interpolates instead, mirroring InfluxDB's selector/aggregate split
    "q_influxql_percentile_companion" -> ((s, dir) => {
      InfluxQL.run(pointsWide(s, dir),
        """SELECT percentile(value, 90), cohort FROM view
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |GROUP BY device""".stripMargin)
    }),

    // top(value, N) with companions: the N extreme points per device keep
    // their own times and carry the companion tag + field values; the
    // companions join the tie-break chain so the pick is deterministic
    "q_influxql_topn_companion" -> ((s, dir) => {
      InfluxQL.run(pointsWide(s, dir),
        """SELECT top(value, 3), cohort, load FROM error
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |GROUP BY device""".stripMargin)
    }),

    // boolean WHERE trees: OR with parentheses (AND binds tighter) plus a
    // numeric field predicate beside the top-level time bounds — the bounds
    // stay top-level conjuncts, so scan pushdown and the fill skeleton are
    // unaffected by the disjunction
    "q_influxql_where" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT count(value) AS cnt, mean(value) AS mv FROM click
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |  AND (device = 'dev3' OR device = 'dev4' OR value > 90)
          |GROUP BY time(1d)""".stripMargin)
    }),

    // the technical-analysis transform family over daily buckets: staged
    // truncated-kernel EMAs (EMA/DEMA/TEMA/TRIX) and the diff-based
    // indicators (RSI on the Wilder kernel, CMO, KER) — all integer-exact
    // until their final IEEE multiply+divide, so the whole family hash-gates
    "q_influxql_ta" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT exponential_moving_average(mean(value), 4) AS ema4,
          |       double_exponential_moving_average(mean(value), 4) AS dema4,
          |       triple_exponential_moving_average(mean(value), 4) AS tema4,
          |       triple_exponential_derivative(mean(value), 4) AS trix4,
          |       relative_strength_index(mean(value), 4) AS rsi4,
          |       chande_momentum_oscillator(mean(value), 4) AS cmo4,
          |       kaufmans_efficiency_ratio(mean(value), 4) AS ker4
          |FROM click
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |GROUP BY time(1d), device""".stripMargin)
    }),

    // SELECT * — the everyday inspection query: star expands against the
    // live schema (alphabetical non-reserved columns) with paged raw output
    "q_influxql_star" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT * FROM purchase
          |WHERE time >= '2024-01-01' AND time < '2024-01-05'
          |LIMIT 200""".stripMargin)
    }),

    // regex tag predicates: `device =~ /re/` keeps matching series and
    // `!~` drops them (everyday InfluxQL); rlike is unanchored substring
    // search in Spark AND DuckDB's regexp_matches, so the oracle mirrors
    // the pattern verbatim
    // kaufmans_adaptive_moving_average(mean(value), 4): the one TA
    // recurrence with a DATA-DEPENDENT smoothing constant — sc per bucket
    // from the KER machinery, then a true per-series recursion (kamaScan's
    // repartition→sort→O(1)-state scan); the oracle replays the identical
    // IEEE step sequence with a recursive CTE
    "q_influxql_kama" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT kaufmans_adaptive_moving_average(mean(value), 4) AS kama4
          |FROM click
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |GROUP BY time(1d), device""".stripMargin)
    }),

    "q_influxql_tag_regex" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT count(value) AS c, mean(value) AS mv FROM purchase
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |  AND device =~ /dev[2-5]$/ AND device !~ /dev3/
          |GROUP BY time(1d), device""".stripMargin)
    }),

    // expression engine over aggregates: binary arithmetic between calls,
    // scalar functions (IEEE-exact ones only, the oracle must mirror
    // bit-for-bit), literals, and count(distinct()) — shared calls
    // aggregate once; composite expressions evaluate in double
    "q_influxql_math" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT (mean(value) - min(value)) / (spread(value) + 1) AS norm,
          |       sqrt(sum(value)) AS rootsum,
          |       abs(mean(value) - 50) AS dist50,
          |       count(value) * 2 AS cnt2,
          |       count(distinct(value)) AS uniq
          |FROM click
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |GROUP BY time(1d), device""".stripMargin)
    }),

    // base-b log(x, b) planned as ln(x)/ln(b) — quantized 1e-7 floor; every
    // input is built as aggregate·2^k + {0.5, 0.25} so it is provably never
    // an integer, hence never an integer power of the (odd-prime) base, and
    // the true log is irrational — the 1-ulp StrictMath-vs-libm drift can
    // never straddle a quantization boundary (the ln(1)=0 hazard class)
    "q_influxql_log" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT floor(log(count(value) * 2 + 0.5, 7) * 10000000) AS lg7,
          |       floor(log(count(value) * 4 + 0.5, 3) * 10000000) AS lg3,
          |       floor(log(max(value) * 2 + 0.25, 7) * 10000000) AS lgmax,
          |       count(value) AS cnt
          |FROM click
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |GROUP BY time(1d), device""".stripMargin)
    }),

    // integral(): trapezoid area under each series' curve per daily bucket
    // (whole-bucket segments only, the engine's pinned boundary rule) at
    // two units, joined beside a hash aggregate — a window pass + grouped
    // int64 sum, bit-exact through the 1e-6 floor quantization
    "q_influxql_integral" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT integral(value) AS integ, integral(value, 1h) AS integ_h,
          |       count(value) AS cnt
          |FROM click
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |GROUP BY time(1d), device FILL(none)""".stripMargin)
    }),

    // raw (per-point) expressions ride the scan projection beside a field
    // predicate — no aggregation, no shuffle beyond the output sort
    "q_influxql_raw" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT value * 2 + 1 AS v2, floor(value / 4) AS q4 FROM view
          |WHERE time >= '2024-01-01' AND time < '2024-01-10' AND value > 50""".stripMargin)
    }),

    // series + row paging: SLIMIT/SOFFSET pick a contiguous series window
    // in tag order (distinct -> TakeOrderedAndProject -> broadcast semi
    // join, never a full-output window); LIMIT/OFFSET then page the rows
    // over the (time, tags) output order
    "q_influxql_slimit" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT mean(value) AS mv FROM click
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |GROUP BY time(1d), device
          |LIMIT 60 OFFSET 50 SLIMIT 5 SOFFSET 10""".stripMargin)
    }),

    // subquery FROM: per-(day, device) maxima re-aggregated weekly — the
    // InfluxDB mean-of-max idiom; the inner plan's fill skeleton emits
    // null day-buckets the outer aggregates ignore, exactly as InfluxDB
    // sequences it
    "q_influxql_subquery" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT mean(dmax) AS mdm, max(dmax) AS mxm FROM
          |(SELECT max(value) AS dmax FROM click
          | WHERE time >= '2024-01-01' AND time < '2024-01-31'
          | GROUP BY time(1d), device)
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |GROUP BY time(1w)""".stripMargin)
    }),

    // tz(): GROUP BY time(1d) buckets align to LOCAL midnights in the given
    // IANA zone (Lord Howe's +11:00 January offset exercises a half-hour
    // base zone), with the fill skeleton densified in wall-clock space;
    // output times are the UTC instants of the local bucket starts
    "q_influxql_tz" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT count(value) AS c, mean(value) AS mv FROM click
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |GROUP BY time(1d), device FILL(previous)
          |TZ('Australia/Lord_Howe')""".stripMargin)
    }),

    // tz() across a real DST transition: Pacific/Fiji ended DST on
    // 2024-01-14 (03:00 local falls back to 02:00 — a 25-hour local day
    // INSIDE the queried window), so the daily bucket instants hop
    // 11:00Z -> 12:00Z mid-range; pins the wall-clock skeleton's DST
    // arithmetic end-to-end against the oracle, not only in local specs
    "q_influxql_tz_dst" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT count(value) AS c, max(value) AS mx FROM view
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |GROUP BY time(1d), device FILL(previous)
          |TZ('Pacific/Fiji')""".stripMargin)
    }),

    // raw-series transformations: derivative/difference/moving_average/
    // cumulative_sum directly over the raw points per (measurement, device)
    // series — no GROUP BY time(); first points emit null and drop only
    // when EVERY field is null (cumulative_sum keeps them alive)
    "q_influxql_raw_transform" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT derivative(value, 1m) AS rate,
          |       non_negative_derivative(value, 1m) AS nnrate,
          |       difference(value) AS diff,
          |       non_negative_difference(value) AS nndiff,
          |       moving_average(value, 4) AS ma4,
          |       cumulative_sum(value) AS cs
          |FROM click
          |WHERE time >= '2024-01-01' AND time < '2024-01-08'
          |GROUP BY device""".stripMargin)
    }),

    // sample(value, N): N deterministic hash-order points per device series
    // (md5-derived over the point time — never rand(), oracle-reproducible)
    "q_influxql_sample" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT sample(value, 3) FROM view
          |WHERE time >= '2024-01-01' AND time < '2024-01-08'
          |GROUP BY device""".stripMargin)
    }),

    // raw distinct(value) selector: unique values per device at time 0
    // (InfluxDB's ungrouped-distinct rule)
    "q_influxql_distinct" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT distinct(value) FROM purchase
          |WHERE time >= '2024-01-01' AND time < '2024-01-08'
          |GROUP BY device""".stripMargin)
    }),

    // elapsed(): whole-unit gaps to the series predecessor, first point
    // dropped — one window per measurement series
    "q_influxql_elapsed" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT elapsed(value, 1s) AS gap FROM click
          |WHERE time >= '2024-01-01' AND time < '2024-01-10'""".stripMargin)
    }),

    // time(interval, offset): daily buckets aligned to 06:00 — the bucket
    // grid and the fill skeleton both shift off the epoch
    "q_influxql_toffset" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT count(value) AS c, mean(value) AS mv FROM view
          |WHERE time >= '2024-01-01' AND time < '2024-01-31'
          |GROUP BY time(1d, 6h), device""".stripMargin)
    }),

    // holt_winters(mean(value), 3, 0): three forecast points per device
    // beyond its last daily bucket — the fixed-coefficient Holt kernel
    // (integer EMA level + EMA trend over first differences) on the
    // bucketed aggregate series
    "q_influxql_holt" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        "SELECT holt_winters(mean(value), 3, 0) FROM click GROUP BY time(1d), device")
    }),

    // holt_winters_with_fit(mean(value), 3, 0): the in-sample smoothed
    // level at every observed bucket (fill(none) keeps the grid to the
    // observed buckets, so the oracle mirrors without a skeleton), then
    // the three forecasts
    "q_influxql_holt_fit" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT holt_winters_with_fit(mean(value), 3, 0) FROM click
          |GROUP BY time(1d), device fill(none)""".stripMargin)
    }),

    // the seasonal face of with_fit: in-sample rows carry the level PLUS
    // the bucket's own weekday-phase index (massless/NaN indexes ride as
    // 0), then the forecasts
    "q_influxql_holt_fit_seasonal" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT holt_winters_with_fit(mean(value), 2, 7) FROM click
          |GROUP BY time(1d), device fill(none)""".stripMargin)
    }),

    // holt_winters(mean(value), 4, 7): weekly ADDITIVE seasonality over
    // daily buckets — per-(device, weekday-phase) residual EMA indexes
    // ride the level + trend forecast
    "q_influxql_holt_seasonal" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        "SELECT holt_winters(mean(value), 4, 7) FROM click GROUP BY time(1d), device")
    }),

    // selector/percentile functions, ISO time literals, aliases,
    // fill(previous), ORDER BY time DESC and LIMIT — one statement
    "q_influxql_selectors" -> ((s, dir) => {
      InfluxQL.run(points(s, dir),
        """SELECT first(value) AS first_v, last(value) AS last_v,
          |       median(value) AS med, percentile(value, 90) AS p90
          |FROM purchase
          |WHERE time >= '2024-01-01T00:00:00Z' AND time < '2024-01-31T00:00:00Z'
          |GROUP BY time(2h) FILL(previous)
          |ORDER BY time DESC LIMIT 50""".stripMargin)
    }),

    // the HTTP face's `epoch=<unit>` integer rendering, oracle-gated: the
    // bucket times of a dialect query pass through the EXACT conversion
    // /query renders (InfluxHttpServer.epochOf — floor division, never
    // IEEE `/`), one column per unit, against DuckDB's integer arithmetic
    "q_influxql_epoch" -> ((s, dir) => {
      import s.implicits._
      InfluxQL.run(points(s, dir),
        """SELECT count(value) AS c FROM click
          |WHERE time >= '2024-01-01' AND time < '2024-01-08'
          |GROUP BY time(1d) FILL(none)""".stripMargin)
        .select(col("time"), col("c")).as[(Long, Long)]
        .map { case (t, c) =>
          import graft.http.InfluxHttpServer.epochOf
          (t, epochOf(t, "ns"), epochOf(t, "ms"), epochOf(t, "s"),
            epochOf(t, "m"), epochOf(t, "h"), c)
        }
        .toDF("time", "epoch_ns", "epoch_ms", "epoch_s", "epoch_m", "epoch_h", "c")
    }))

  def oracleSql: Map[String, String] = Map(

    "q_influxql_epoch" ->
      s"""WITH $ptsSql,
         |f AS (SELECT ts_us, value FROM pts WHERE transducer = 'click'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1704672000000000),
         |b AS (SELECT ts_us - ts_us % 86400000000 AS time,
         |      CAST(count(value) AS BIGINT) AS c FROM f GROUP BY 1)
         |SELECT time, time * 1000 AS epoch_ns, time // 1000 AS epoch_ms,
         |  time // 1000000 AS epoch_s, time // 60000000 AS epoch_m,
         |  time // 3600000000 AS epoch_h, c FROM b""".stripMargin,

    "q_influxql_agg" ->
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'click'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000),
         |b AS (SELECT ts_us - ts_us % 86400000000 AS time, device,
         |    count(value) AS cnt,
         |    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sm,
         |    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
         |      / CAST(count(value) AS DOUBLE) AS mn,
         |    min(value) AS mnv, max(value) AS mxv,
         |    max(value) - min(value) AS sprd,
         |    $stddevSql AS sd
         |  FROM f GROUP BY 1, 2),
         |devs AS (SELECT DISTINCT device FROM b),
         |skel AS (SELECT device, 1704067200000000 + o * 86400000000 AS time
         |         FROM devs, UNNEST(generate_series(0, 29)) AS t(o))
         |SELECT s.time, s.device, b.cnt AS "count", b.sm AS "sum", b.mn AS mean,
         |  b.mnv AS "min", b.mxv AS "max", b.sprd AS spread, b.sd AS stddev
         |FROM skel s LEFT JOIN b ON s.time = b.time AND s.device = b.device""".stripMargin,

    "q_influxql_fill" ->
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'view'
         |      AND device != 'dev7'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000),
         |b AS (SELECT ts_us - ts_us % 21600000000 AS time, device,
         |    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
         |      / CAST(count(value) AS DOUBLE) AS mean
         |  FROM f GROUP BY 1, 2),
         |devs AS (SELECT DISTINCT device FROM b),
         |skel AS (SELECT device, 1704067200000000 + o * 21600000000 AS time
         |         FROM devs, UNNEST(generate_series(0, 119)) AS t(o)),
         |j AS (SELECT s.time, s.device, b.mean
         |  FROM skel s LEFT JOIN b ON s.time = b.time AND s.device = b.device),
         |w AS (SELECT time, device, mean,
         |    last_value(mean IGNORE NULLS) OVER pb AS pv,
         |    last_value(CASE WHEN mean IS NOT NULL THEN time END IGNORE NULLS) OVER pb AS pt,
         |    first_value(mean IGNORE NULLS) OVER nf AS nv,
         |    first_value(CASE WHEN mean IS NOT NULL THEN time END IGNORE NULLS) OVER nf AS nt
         |  FROM j
         |  WINDOW pb AS (PARTITION BY device ORDER BY time ROWS UNBOUNDED PRECEDING),
         |         nf AS (PARTITION BY device ORDER BY time ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT time, device,
         |  CASE WHEN mean IS NOT NULL THEN mean
         |       WHEN pv IS NOT NULL AND nv IS NOT NULL
         |         THEN pv + (nv - pv) * (CAST(time - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
         |       ELSE NULL END AS mean
         |FROM w""".stripMargin,

    "q_influxql_transform" ->
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'signup'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000),
         |b AS (SELECT ts_us - ts_us % 86400000000 AS time, device,
         |    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
         |      / CAST(count(value) AS DOUBLE) AS mean_v,
         |    max(value) AS max_v,
         |    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_v
         |  FROM f GROUP BY 1, 2),
         |devs AS (SELECT DISTINCT device FROM b),
         |skel AS (SELECT device, 1704067200000000 + o * 86400000000 AS time
         |         FROM devs, UNNEST(generate_series(0, 29)) AS t(o)),
         |j AS (SELECT s.time, s.device, b.mean_v, b.max_v, b.sum_v
         |  FROM skel s LEFT JOIN b ON s.time = b.time AND s.device = b.device)
         |SELECT time, device,
         |  (mean_v - lag(mean_v) OVER w)
         |    / (CAST(time - lag(time) OVER w AS DOUBLE) / 3600000000.0) AS dmean,
         |  max_v - lag(max_v) OVER w AS dmax,
         |  CAST(sum(CAST(floor(sum_v * 1000000.0) AS DECIMAL(38,0))) OVER cum AS DOUBLE)
         |    / 1000000.0 AS csum,
         |  CAST(sum(CAST(floor(mean_v * 1000000.0) AS DECIMAL(38,0))) OVER ma AS DOUBLE)
         |    / CAST(count(mean_v) OVER ma AS DOUBLE) / 1000000.0 AS ma3
         |FROM j
         |WINDOW w AS (PARTITION BY device ORDER BY time),
         |  cum AS (PARTITION BY device ORDER BY time ROWS UNBOUNDED PRECEDING),
         |  ma AS (PARTITION BY device ORDER BY time ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_influxql_ta" -> {
      import graft.operators.TimeSeriesOps
      val ecs = TimeSeriesOps.emaCoefficients(4, TimeSeriesOps.emaDialectDepth(4))
      val wcs = TimeSeriesOps.wilderCoefficients(4, TimeSeriesOps.wilderDialectDepth(4))
      def ema(u: String) = {
        val num = ecs.zipWithIndex.map { case (c, j) =>
          s"coalesce(lag($u, $j) OVER w * $c, 0)"
        }.mkString(" + ")
        val den = ecs.zipWithIndex.map { case (c, j) =>
          s"CASE WHEN lag($u, $j) OVER w IS NOT NULL THEN $c ELSE 0 END"
        }.mkString(" + ")
        s"CAST(($num) AS DOUBLE) / CAST(($den) AS DOUBLE) / 1000000.0"
      }
      val gk = wcs.zipWithIndex.map { case (c, j) =>
        s"coalesce(lag(gn, $j) OVER w * $c, 0)"
      }.mkString(" + ")
      val lk = wcs.zipWithIndex.map { case (c, j) =>
        s"coalesce(lag(ls, $j) OVER w * $c, 0)"
      }.mkString(" + ")
      val mass = wcs.zipWithIndex.map { case (c, j) =>
        s"CASE WHEN lag(du, $j) OVER w IS NOT NULL THEN $c ELSE 0 END"
      }.mkString(" + ")
      val win = "(PARTITION BY device ORDER BY time)"
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'click'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000),
         |b AS (SELECT ts_us - ts_us % 86400000000 AS time, device,
         |    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
         |      / CAST(count(value) AS DOUBLE) AS mean_v
         |  FROM f GROUP BY 1, 2),
         |devs AS (SELECT DISTINCT device FROM b),
         |skel AS (SELECT device, 1704067200000000 + o * 86400000000 AS time
         |         FROM devs, UNNEST(generate_series(0, 29)) AS t(o)),
         |j AS (SELECT s.time, s.device, CAST(floor(b.mean_v * 1000000.0) AS BIGINT) AS vu
         |  FROM skel s LEFT JOIN b ON s.time = b.time AND s.device = b.device),
         |d AS (SELECT *, vu - lag(vu) OVER $win AS du FROM j),
         |d2 AS (SELECT *,
         |    CASE WHEN du > 0 THEN du ELSE 0 END AS gn,
         |    CASE WHEN du < 0 THEN -du ELSE 0 END AS ls
         |  FROM d),
         |s1 AS (SELECT *, CASE WHEN vu IS NOT NULL THEN ${ema("vu")} END AS e1
         |  FROM d2 WINDOW w AS $win),
         |q1 AS (SELECT *, CAST(floor(e1 * 1000000.0) AS BIGINT) AS u1 FROM s1),
         |s2 AS (SELECT *, CASE WHEN u1 IS NOT NULL THEN ${ema("u1")} END AS e2
         |  FROM q1 WINDOW w AS $win),
         |q2 AS (SELECT *, CAST(floor(e2 * 1000000.0) AS BIGINT) AS u2 FROM s2),
         |s3 AS (SELECT *, CASE WHEN u2 IS NOT NULL THEN ${ema("u2")} END AS e3
         |  FROM q2 WINDOW w AS $win),
         |fin AS (SELECT *,
         |    lag(e3) OVER w AS p3,
         |    lag(vu, 4) OVER w AS v4,
         |    CAST(sum(gn) OVER wf AS BIGINT) AS up,
         |    CAST(sum(ls) OVER wf AS BIGINT) AS down,
         |    CAST(sum(abs(du)) OVER wf AS BIGINT) AS vol,
         |    CAST(($gk) AS BIGINT) AS gk,
         |    CAST(($lk) AS BIGINT) AS lk,
         |    CAST(($mass) AS BIGINT) AS mass
         |  FROM s3 WINDOW w AS $win,
         |    wf AS (PARTITION BY device ORDER BY time
         |           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
         |SELECT time, device,
         |  e1 AS ema4,
         |  CASE WHEN e1 IS NOT NULL THEN 2.0 * e1 - e2 END AS dema4,
         |  CASE WHEN e1 IS NOT NULL THEN 3.0 * e1 - 3.0 * e2 + e3 END AS tema4,
         |  CASE WHEN e3 IS NOT NULL AND p3 IS NOT NULL AND p3 <> 0.0
         |    THEN (100.0 * (e3 - p3)) / p3 END AS trix4,
         |  CASE WHEN vu IS NOT NULL AND mass > 0 THEN
         |    CASE WHEN gk + lk = 0 THEN 50.0
         |      ELSE (100.0 * CAST(gk AS DOUBLE)) / CAST(gk + lk AS DOUBLE) END
         |    END AS rsi4,
         |  CASE WHEN vu IS NOT NULL AND v4 IS NOT NULL THEN
         |    CASE WHEN up + down = 0 THEN 0.0
         |      ELSE (100.0 * CAST(up - down AS DOUBLE)) / CAST(up + down AS DOUBLE) END
         |    END AS cmo4,
         |  CASE WHEN vu IS NOT NULL AND v4 IS NOT NULL THEN
         |    CASE WHEN vol IS NULL THEN NULL WHEN vol = 0 THEN 0.0
         |      ELSE CAST(abs(vu - v4) AS DOUBLE) / CAST(vol AS DOUBLE) END
         |    END AS ker4
         |FROM fin""".stripMargin
    },

    "q_influxql_kama" -> {
      val win = "(PARTITION BY device ORDER BY time)"
      // sc = (er·(2/3 − 2/31) + 2/31)² — the constant subexpressions are
      // WRITTEN as arithmetic (not printed decimals) so DuckDB folds the
      // identical IEEE doubles the Scala compiler folded
      s"""WITH RECURSIVE $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'click'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000),
         |b AS (SELECT ts_us - ts_us % 86400000000 AS time, device,
         |    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
         |      / CAST(count(value) AS DOUBLE) AS mv
         |  FROM f GROUP BY 1, 2),
         |devs AS (SELECT DISTINCT device FROM b),
         |skel AS (SELECT device, 1704067200000000 + o * 86400000000 AS time
         |         FROM devs, UNNEST(generate_series(0, 29)) AS t(o)),
         |j AS (SELECT s.time, s.device, b.mv,
         |    CAST(floor(b.mv * 1000000.0) AS BIGINT) AS vu
         |  FROM skel s LEFT JOIN b ON s.time = b.time AND s.device = b.device),
         |d AS (SELECT *, vu - lag(vu) OVER $win AS du FROM j),
         |e AS (SELECT *,
         |    lag(vu, 4) OVER w AS v4,
         |    CAST(sum(abs(du)) OVER (PARTITION BY device ORDER BY time
         |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS vol
         |  FROM d WINDOW w AS $win),
         |er AS (SELECT *,
         |    CASE WHEN v4 IS NOT NULL THEN
         |      CASE WHEN vol IS NULL THEN NULL WHEN vol = 0 THEN 0.0
         |        ELSE CAST(abs(vu - v4) AS DOUBLE) / CAST(vol AS DOUBLE) END
         |      END AS r
         |  FROM e),
         |sct AS (SELECT *, r * (2.0/3.0 - 2.0/31.0) + 2.0/31.0 AS t0 FROM er),
         |scr AS (SELECT device, time, mv, t0 * t0 AS sc,
         |    row_number() OVER $win AS rn
         |  FROM sct WHERE mv IS NOT NULL AND t0 IS NOT NULL),
         |k AS (
         |  SELECT device, time, rn, mv AS kama FROM scr WHERE rn = 1
         |  UNION ALL
         |  SELECT s.device, s.time, s.rn, k.kama + s.sc * (s.mv - k.kama)
         |  FROM scr s JOIN k ON s.device = k.device AND s.rn = k.rn + 1)
         |SELECT j.time, j.device, k.kama AS kama4
         |FROM j LEFT JOIN k ON j.device = k.device AND j.time = k.time""".stripMargin
    },

    "q_influxql_regex" ->
      s"""WITH $ptsSql,
         |f AS (SELECT transducer, ts_us, value FROM pts
         |      WHERE regexp_matches(transducer, '^(click|view)$$')
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000),
         |b AS (SELECT ts_us - ts_us % 86400000000 AS time, transducer AS measurement,
         |    count(value) AS cnt,
         |    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
         |      / CAST(count(value) AS DOUBLE) AS mn
         |  FROM f GROUP BY 1, 2),
         |ms AS (SELECT DISTINCT measurement FROM b),
         |skel AS (SELECT measurement, 1704067200000000 + o * 86400000000 AS time
         |         FROM ms, UNNEST(generate_series(0, 29)) AS t(o))
         |SELECT s.time, s.measurement, b.cnt AS "count", b.mn AS mean
         |FROM skel s LEFT JOIN b ON s.time = b.time AND s.measurement = b.measurement""".stripMargin,

    "q_influxql_mode" ->
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'view'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000),
         |freq AS (SELECT ts_us - ts_us % 604800000000 AS time, device, value,
         |    count(*) AS mc
         |  FROM f GROUP BY 1, 2, 3),
         |modes AS (SELECT time, device,
         |    -((max({'c': mc, 'nv': -value})).nv) AS mode
         |  FROM freq GROUP BY 1, 2),
         |counts AS (SELECT ts_us - ts_us % 604800000000 AS time, device,
         |    count(value) AS cnt
         |  FROM f GROUP BY 1, 2),
         |b AS (SELECT m.time, m.device, m.mode, c.cnt
         |  FROM modes m JOIN counts c ON m.time = c.time AND m.device = c.device),
         |devs AS (SELECT DISTINCT device FROM b),
         |skel AS (SELECT device, 1703721600000000 + o * 604800000000 AS time
         |         FROM devs, UNNEST(generate_series(0, 4)) AS t(o))
         |SELECT s.time, s.device, b.mode, b.cnt AS "count"
         |FROM skel s LEFT JOIN b ON s.time = b.time AND s.device = b.device""".stripMargin,

    "q_influxql_topn" ->
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'error'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000),
         |r AS (SELECT ts_us AS time, device, value,
         |    row_number() OVER (PARTITION BY device ORDER BY value DESC, ts_us ASC) AS rk
         |  FROM f)
         |SELECT time, device, value AS top FROM r WHERE rk <= 3""".stripMargin,

    "q_influxql_topn_tag" ->
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'click'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000),
         |c AS (SELECT device, ts_us, value,
         |    row_number() OVER (PARTITION BY device ORDER BY value DESC, ts_us ASC) AS ck
         |  FROM f),
         |r AS (SELECT ts_us AS time, device, value,
         |    row_number() OVER (ORDER BY value DESC, ts_us ASC, device ASC) AS rk
         |  FROM c WHERE ck = 1)
         |SELECT time, device, value AS top FROM r WHERE rk <= 5""".stripMargin,

    "q_influxql_topn_bucketed" ->
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'click'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000),
         |r AS (SELECT ts_us AS time, device, value,
         |    row_number() OVER (PARTITION BY device, ts_us - ts_us % 86400000000
         |                       ORDER BY value ASC, ts_us ASC) AS rk
         |  FROM f)
         |SELECT time, device, value AS bottom FROM r WHERE rk <= 2""".stripMargin,

    "q_influxql_selector_companion" ->
      s"""WITH $ptsWSql,
         |f AS (SELECT device, ts_us, value, load FROM ptsw
         |      WHERE transducer = 'click'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000
         |      AND value IS NOT NULL),
         |r AS (SELECT ts_us - ts_us % 86400000000 AS time, device, load, value,
         |    row_number() OVER (PARTITION BY ts_us - ts_us % 86400000000
         |      ORDER BY value DESC, ts_us ASC, device ASC, load ASC) AS rk
         |  FROM f)
         |SELECT time, value AS "max", device, load FROM r WHERE rk = 1""".stripMargin,

    "q_influxql_percentile_companion" ->
      s"""WITH $ptsWSql,
         |f AS (SELECT device, cohort, ts_us, value FROM ptsw
         |      WHERE transducer = 'view'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000
         |      AND value IS NOT NULL),
         |r AS (SELECT ts_us AS time, device, cohort, value,
         |    row_number() OVER (PARTITION BY device
         |      ORDER BY value ASC, ts_us ASC, cohort ASC) AS rk,
         |    count(*) OVER (PARTITION BY device) AS n
         |  FROM f)
         |SELECT time, device, value AS percentile, cohort FROM r
         |WHERE rk = CAST(floor(CAST(n AS DOUBLE) * 90.0 / 100.0 + 0.5) AS BIGINT)""".stripMargin,

    "q_influxql_topn_companion" ->
      s"""WITH $ptsWSql,
         |f AS (SELECT device, cohort, ts_us, value, load FROM ptsw
         |      WHERE transducer = 'error'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000),
         |r AS (SELECT ts_us AS time, device, cohort, load, value,
         |    row_number() OVER (PARTITION BY device
         |      ORDER BY value DESC, ts_us ASC, cohort ASC, load ASC) AS rk
         |  FROM f)
         |SELECT time, device, value AS top, cohort, load FROM r WHERE rk <= 3""".stripMargin,

    "q_influxql_math" ->
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'click'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000),
         |b AS (SELECT ts_us - ts_us % 86400000000 AS time, device,
         |    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sm,
         |    CAST(count(value) AS DOUBLE) AS cntd,
         |    min(value) AS mnv, max(value) AS mxv,
         |    CAST(count(DISTINCT value) AS BIGINT) AS uniq
         |  FROM f GROUP BY 1, 2),
         |e AS (SELECT time, device,
         |    ((sm / cntd) - mnv) / ((mxv - mnv) + 1.0) AS norm,
         |    sqrt(sm) AS rootsum,
         |    abs((sm / cntd) - 50.0) AS dist50,
         |    cntd * 2.0 AS cnt2, uniq
         |  FROM b),
         |devs AS (SELECT DISTINCT device FROM e),
         |skel AS (SELECT device, 1704067200000000 + o * 86400000000 AS time
         |         FROM devs, UNNEST(generate_series(0, 29)) AS t(o))
         |SELECT s.time, s.device, e.norm, e.rootsum, e.dist50, e.cnt2, e.uniq
         |FROM skel s LEFT JOIN e ON s.time = e.time AND s.device = e.device""".stripMargin,

    // log(x, b) mirror: identical ln(x)/ln(b) IEEE shape (division before
    // the 1e7 scale, floor last), count cast to double exactly as the
    // engine's expression leaves do
    "q_influxql_log" ->
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'click'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000),
         |b AS (SELECT ts_us - ts_us % 86400000000 AS time, device,
         |    CAST(count(value) AS DOUBLE) AS cntd, max(value) AS mxv,
         |    count(value) AS cnt
         |  FROM f GROUP BY 1, 2),
         |e AS (SELECT time, device,
         |    floor(ln(cntd * 2.0 + 0.5) / ln(7.0) * 10000000.0) AS lg7,
         |    floor(ln(cntd * 4.0 + 0.5) / ln(3.0) * 10000000.0) AS lg3,
         |    floor(ln(mxv * 2.0 + 0.25) / ln(7.0) * 10000000.0) AS lgmax,
         |    cnt
         |  FROM b),
         |devs AS (SELECT DISTINCT device FROM e),
         |skel AS (SELECT device, 1704067200000000 + o * 86400000000 AS time
         |         FROM devs, UNNEST(generate_series(0, 29)) AS t(o))
         |SELECT s.time, s.device, e.lg7, e.lg3, e.lgmax, e.cnt
         |FROM skel s LEFT JOIN e ON s.time = e.time AND s.device = e.device""".stripMargin,

    // integral mirrors the engine pin: lag over (ts, value) per device,
    // segments kept only when both endpoints share the daily bucket,
    // per-segment 1e-6 floor quantization, int64 sum, one final division
    "q_influxql_integral" ->
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'click'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000),
         |seg AS (SELECT device, ts_us - ts_us % 86400000000 AS time, ts_us, value,
         |    lag(ts_us) OVER w AS pt, lag(value) OVER w AS pv
         |  FROM f WINDOW w AS (PARTITION BY device ORDER BY ts_us, value)),
         |u AS (SELECT device, time, value,
         |    CASE WHEN pt IS NOT NULL AND pt - pt % 86400000000 = time
         |      THEN CAST(floor((value + pv) / 2.0
         |        * (CAST(ts_us - pt AS DOUBLE) / 1000000.0) * 1000000.0) AS BIGINT)
         |    END AS u1,
         |    CASE WHEN pt IS NOT NULL AND pt - pt % 86400000000 = time
         |      THEN CAST(floor((value + pv) / 2.0
         |        * (CAST(ts_us - pt AS DOUBLE) / 3600000000.0) * 1000000.0) AS BIGINT)
         |    END AS u2
         |  FROM seg)
         |SELECT time, device,
         |  CAST(coalesce(sum(u1), 0) AS DOUBLE) / 1000000.0 AS integ,
         |  CAST(coalesce(sum(u2), 0) AS DOUBLE) / 1000000.0 AS integ_h,
         |  count(value) AS cnt
         |FROM u GROUP BY 1, 2""".stripMargin,

    "q_influxql_raw" ->
      s"""WITH $ptsSql
         |SELECT ts_us AS time, (value * 2.0) + 1.0 AS v2, floor(value / 4.0) AS q4
         |FROM pts WHERE transducer = 'view'
         |  AND ts_us >= 1704067200000000 AND ts_us < 1704844800000000
         |  AND value > 50""".stripMargin,

    "q_influxql_where" ->
      s"""WITH $ptsSql,
         |f AS (SELECT ts_us, value FROM pts WHERE transducer = 'click'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000
         |      AND (device = 'dev3' OR device = 'dev4' OR value > 90)),
         |b AS (SELECT ts_us - ts_us % 86400000000 AS time, count(value) AS cnt,
         |    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
         |      / CAST(count(value) AS DOUBLE) AS mv
         |  FROM f GROUP BY 1),
         |skel AS (SELECT 1704067200000000 + o * 86400000000 AS time
         |         FROM UNNEST(generate_series(0, 29)) AS t(o))
         |SELECT s.time, b.cnt, b.mv
         |FROM skel s LEFT JOIN b ON s.time = b.time""".stripMargin,

    "q_influxql_star" ->
      s"""WITH $ptsSql
         |SELECT ts_us AS time, device, value FROM pts
         |WHERE transducer = 'purchase'
         |  AND ts_us >= 1704067200000000 AND ts_us < 1704412800000000
         |ORDER BY time, device, value LIMIT 200""".stripMargin,

    "q_influxql_tag_regex" ->
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'purchase'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000
         |      AND regexp_matches(device, 'dev[2-5]$$')
         |      AND NOT regexp_matches(device, 'dev3')),
         |b AS (SELECT ts_us - ts_us % 86400000000 AS time, device, count(value) AS c,
         |    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
         |      / CAST(count(value) AS DOUBLE) AS mv
         |  FROM f GROUP BY 1, 2),
         |devs AS (SELECT DISTINCT device FROM f),
         |skel AS (SELECT device, 1704067200000000 + o * 86400000000 AS time
         |         FROM devs, UNNEST(generate_series(0, 29)) AS t(o))
         |SELECT s.time, s.device, b.c, b.mv
         |FROM skel s LEFT JOIN b ON s.time = b.time AND s.device = b.device""".stripMargin,

    "q_influxql_slimit" ->
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'click'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000),
         |b AS (SELECT ts_us - ts_us % 86400000000 AS time, device,
         |    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
         |      / CAST(count(value) AS DOUBLE) AS mv
         |  FROM f GROUP BY 1, 2),
         |sel AS (SELECT DISTINCT device FROM b ORDER BY device LIMIT 5 OFFSET 10),
         |skel AS (SELECT device, 1704067200000000 + o * 86400000000 AS time
         |         FROM sel, UNNEST(generate_series(0, 29)) AS t(o)),
         |j AS (SELECT s.time, s.device, b.mv
         |  FROM skel s LEFT JOIN b ON s.time = b.time AND s.device = b.device)
         |SELECT time, device, mv FROM j
         |ORDER BY time, device LIMIT 60 OFFSET 50""".stripMargin,

    "q_influxql_subquery" ->
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'click'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000),
         |b AS (SELECT ts_us - ts_us % 86400000000 AS time, device,
         |    max(value) AS dmax
         |  FROM f GROUP BY 1, 2),
         |a AS (SELECT time - time % 604800000000 AS wtime,
         |    CAST(sum(CAST(dmax AS DECIMAL(38,4))) AS DOUBLE)
         |      / CAST(count(dmax) AS DOUBLE) AS mdm,
         |    max(dmax) AS mxm
         |  FROM b GROUP BY 1),
         |skel AS (SELECT 1703721600000000 + o * 604800000000 AS time
         |         FROM UNNEST(generate_series(0, 4)) AS t(o))
         |SELECT s.time, a.mdm, a.mxm
         |FROM skel s LEFT JOIN a ON s.time = a.wtime""".stripMargin,

    "q_influxql_tz" ->
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'click'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000),
         |b AS (SELECT
         |    epoch_us(timezone('Australia/Lord_Howe', make_timestamptz(ts_us)))
         |      - epoch_us(timezone('Australia/Lord_Howe', make_timestamptz(ts_us)))
         |        % 86400000000 AS bwall,
         |    device, count(value) AS c,
         |    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
         |      / CAST(count(value) AS DOUBLE) AS mv
         |  FROM f GROUP BY 1, 2),
         |devs AS (SELECT DISTINCT device FROM b),
         |skel AS (SELECT device, 1704067200000000 + o * 86400000000 AS bwall
         |         FROM devs, UNNEST(generate_series(0, 30)) AS t(o)),
         |j AS (SELECT epoch_us(timezone('Australia/Lord_Howe',
         |        make_timestamp(s.bwall))) AS time,
         |    s.device, b.c, b.mv
         |  FROM skel s LEFT JOIN b ON s.bwall = b.bwall AND s.device = b.device)
         |SELECT time, device,
         |  last_value(c IGNORE NULLS) OVER pb AS c,
         |  last_value(mv IGNORE NULLS) OVER pb AS mv
         |FROM j
         |WINDOW pb AS (PARTITION BY device ORDER BY time ROWS UNBOUNDED PRECEDING)""".stripMargin,

    "q_influxql_tz_dst" ->
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'view'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000),
         |b AS (SELECT
         |    epoch_us(timezone('Pacific/Fiji', make_timestamptz(ts_us)))
         |      - epoch_us(timezone('Pacific/Fiji', make_timestamptz(ts_us)))
         |        % 86400000000 AS bwall,
         |    device, count(value) AS c, max(value) AS mx
         |  FROM f GROUP BY 1, 2),
         |devs AS (SELECT DISTINCT device FROM b),
         |skel AS (SELECT device, 1704067200000000 + o * 86400000000 AS bwall
         |         FROM devs, UNNEST(generate_series(0, 30)) AS t(o)),
         |j AS (SELECT epoch_us(timezone('Pacific/Fiji',
         |        make_timestamp(s.bwall))) AS time,
         |    s.device, b.c, b.mx
         |  FROM skel s LEFT JOIN b ON s.bwall = b.bwall AND s.device = b.device)
         |SELECT time, device,
         |  last_value(c IGNORE NULLS) OVER pb AS c,
         |  last_value(mx IGNORE NULLS) OVER pb AS mx
         |FROM j
         |WINDOW pb AS (PARTITION BY device ORDER BY time ROWS UNBOUNDED PRECEDING)""".stripMargin,

    "q_influxql_raw_transform" ->
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'click'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1704672000000000
         |      AND value IS NOT NULL),
         |t AS (SELECT ts_us AS time, device,
         |    CASE WHEN ts_us > lag(ts_us) OVER w THEN (value - lag(value) OVER w)
         |      / (CAST(ts_us - lag(ts_us) OVER w AS DOUBLE) / 60000000.0) END AS rate,
         |    value - lag(value) OVER w AS diff,
         |    CASE WHEN count(value) OVER ma >= 4 THEN
         |      CAST(sum(CAST(floor(value * 1000000.0) AS DECIMAL(38,0))) OVER ma AS DOUBLE)
         |        / 4.0 / 1000000.0 END AS ma4,
         |    CAST(sum(CAST(floor(value * 1000000.0) AS DECIMAL(38,0))) OVER cum AS DOUBLE)
         |      / 1000000.0 AS cs
         |  FROM f
         |  WINDOW w AS (PARTITION BY device ORDER BY ts_us, value),
         |    ma AS (PARTITION BY device ORDER BY ts_us, value
         |           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
         |    cum AS (PARTITION BY device ORDER BY ts_us, value ROWS UNBOUNDED PRECEDING))
         |SELECT time, device, rate,
         |  CASE WHEN rate < 0 THEN NULL ELSE rate END AS nnrate,
         |  diff,
         |  CASE WHEN diff < 0 THEN NULL ELSE diff END AS nndiff,
         |  ma4, cs
         |FROM t
         |WHERE rate IS NOT NULL OR diff IS NOT NULL OR ma4 IS NOT NULL
         |   OR cs IS NOT NULL""".stripMargin,

    "q_influxql_sample" ->
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'view'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1704672000000000
         |      AND value IS NOT NULL),
         |r AS (SELECT ts_us AS time, device, value,
         |    row_number() OVER (PARTITION BY device
         |      ORDER BY ('0x' || substr(md5(CAST(ts_us AS VARCHAR)), 1, 15))::BIGINT,
         |        ts_us, value) AS rk
         |  FROM f)
         |SELECT time, device, value AS sample FROM r WHERE rk <= 3""".stripMargin,

    "q_influxql_distinct" ->
      s"""WITH $ptsSql
         |SELECT DISTINCT CAST(0 AS BIGINT) AS time, device, value AS "distinct"
         |FROM pts WHERE transducer = 'purchase'
         |  AND ts_us >= 1704067200000000 AND ts_us < 1704672000000000
         |  AND value IS NOT NULL""".stripMargin,

    "q_influxql_elapsed" ->
      s"""WITH $ptsSql,
         |f AS (SELECT ts_us, value FROM pts WHERE transducer = 'click'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1704844800000000),
         |w AS (SELECT ts_us AS time,
         |    ts_us - lag(ts_us) OVER (ORDER BY ts_us, value) AS d
         |  FROM f)
         |SELECT time, CAST(floor(CAST(d AS DOUBLE) / 1000000.0) AS BIGINT) AS gap
         |FROM w WHERE d IS NOT NULL""".stripMargin,

    "q_influxql_toffset" ->
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'view'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000),
         |b AS (SELECT ts_us - ((ts_us - 21600000000) % 86400000000) AS time, device,
         |    count(value) AS c,
         |    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
         |      / CAST(count(value) AS DOUBLE) AS mv
         |  FROM f GROUP BY 1, 2),
         |devs AS (SELECT DISTINCT device FROM b),
         |skel AS (SELECT device, 1704002400000000 + o * 86400000000 AS time
         |         FROM devs, UNNEST(generate_series(0, 30)) AS t(o))
         |SELECT s.time, s.device, b.c, b.mv
         |FROM skel s LEFT JOIN b ON s.time = b.time AND s.device = b.device""".stripMargin,

    "q_influxql_holt" -> {
      val cs = graft.operators.TimeSeriesOps.emaCoefficients(4, 10)
      def num(u: String) = cs.zipWithIndex.map { case (c, j) =>
        s"coalesce(lag($u, $j) OVER w * $c, 0)"
      }.mkString(" + ")
      def den(u: String) = cs.zipWithIndex.map { case (c, j) =>
        s"CASE WHEN lag($u, $j) OVER w IS NOT NULL THEN $c ELSE 0 END"
      }.mkString(" + ")
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'click'),
         |b AS (SELECT ts_us - ts_us % 86400000000 AS time, device,
         |    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
         |      / CAST(count(value) AS DOUBLE) AS mv
         |  FROM f GROUP BY 1, 2),
         |d AS (SELECT *, CAST(floor(mv * 1000000.0) AS BIGINT) AS vu,
         |    CAST(floor((mv - lag(mv) OVER
         |      (PARTITION BY device ORDER BY time)) * 1000000.0) AS BIGINT) AS du
         |  FROM b),
         |e AS (SELECT device, time,
         |    CAST((${num("vu")}) AS DOUBLE) / CAST((${den("vu")}) AS DOUBLE) / 1000000.0 AS lvl,
         |    CAST((${num("du")}) AS DOUBLE) / CAST((${den("du")}) AS DOUBLE) / 1000000.0 AS trd,
         |    row_number() OVER (PARTITION BY device ORDER BY time DESC) AS rn
         |  FROM d WINDOW w AS (PARTITION BY device ORDER BY time)),
         |lastp AS (SELECT device, time, lvl,
         |    CASE WHEN isnan(trd) THEN 0.0 ELSE trd END AS trd
         |  FROM e WHERE rn = 1)
         |SELECT time + CAST(h AS BIGINT) * 86400000000 AS time, device,
         |  lvl + CAST(h AS BIGINT) * trd AS holt_winters
         |FROM lastp, UNNEST([1, 2, 3]) AS u(h)""".stripMargin
    },

    "q_influxql_holt_fit" -> {
      val cs = graft.operators.TimeSeriesOps.emaCoefficients(4, 10)
      def num(u: String) = cs.zipWithIndex.map { case (c, j) =>
        s"coalesce(lag($u, $j) OVER w * $c, 0)"
      }.mkString(" + ")
      def den(u: String) = cs.zipWithIndex.map { case (c, j) =>
        s"CASE WHEN lag($u, $j) OVER w IS NOT NULL THEN $c ELSE 0 END"
      }.mkString(" + ")
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'click'),
         |b AS (SELECT ts_us - ts_us % 86400000000 AS time, device,
         |    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
         |      / CAST(count(value) AS DOUBLE) AS mv
         |  FROM f GROUP BY 1, 2),
         |d AS (SELECT *, CAST(floor(mv * 1000000.0) AS BIGINT) AS vu,
         |    CAST(floor((mv - lag(mv) OVER
         |      (PARTITION BY device ORDER BY time)) * 1000000.0) AS BIGINT) AS du
         |  FROM b),
         |e AS (SELECT device, time,
         |    CAST((${num("vu")}) AS DOUBLE) / CAST((${den("vu")}) AS DOUBLE) / 1000000.0 AS lvl,
         |    CAST((${num("du")}) AS DOUBLE) / CAST((${den("du")}) AS DOUBLE) / 1000000.0 AS trd,
         |    row_number() OVER (PARTITION BY device ORDER BY time DESC) AS rn
         |  FROM d WINDOW w AS (PARTITION BY device ORDER BY time)),
         |lastp AS (SELECT device, time, lvl,
         |    CASE WHEN isnan(trd) THEN 0.0 ELSE trd END AS trd
         |  FROM e WHERE rn = 1)
         |SELECT time, device, lvl AS holt_winters_with_fit FROM e
         |UNION ALL
         |SELECT time + CAST(h AS BIGINT) * 86400000000 AS time, device,
         |  lvl + CAST(h AS BIGINT) * trd AS holt_winters_with_fit
         |FROM lastp, UNNEST([1, 2, 3]) AS u(h)""".stripMargin
    },

    "q_influxql_holt_fit_seasonal" -> {
      val cs = graft.operators.TimeSeriesOps.emaCoefficients(4, 10)
      def num(u: String) = cs.zipWithIndex.map { case (c, j) =>
        s"coalesce(lag($u, $j) OVER w * $c, 0)"
      }.mkString(" + ")
      def den(u: String) = cs.zipWithIndex.map { case (c, j) =>
        s"CASE WHEN lag($u, $j) OVER w IS NOT NULL THEN $c ELSE 0 END"
      }.mkString(" + ")
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'click'),
         |b AS (SELECT ts_us - ts_us % 86400000000 AS time, device,
         |    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
         |      / CAST(count(value) AS DOUBLE) AS mv
         |  FROM f GROUP BY 1, 2),
         |d AS (SELECT *, CAST(floor(mv * 1000000.0) AS BIGINT) AS vu,
         |    CAST(floor((mv - lag(mv) OVER
         |      (PARTITION BY device ORDER BY time)) * 1000000.0) AS BIGINT) AS du,
         |    (time // 86400000000) % 7 AS ph
         |  FROM b),
         |e AS (SELECT device, time, ph, mv,
         |    CAST((${num("vu")}) AS DOUBLE) / CAST((${den("vu")}) AS DOUBLE) / 1000000.0 AS lvl,
         |    CAST((${num("du")}) AS DOUBLE) / CAST((${den("du")}) AS DOUBLE) / 1000000.0 AS trd,
         |    row_number() OVER (PARTITION BY device ORDER BY time DESC) AS rn
         |  FROM d WINDOW w AS (PARTITION BY device ORDER BY time)),
         |r AS (SELECT device, time, ph,
         |    CAST(floor((mv - lvl) * 1000000.0) AS BIGINT) AS ru
         |  FROM e),
         |sx AS (SELECT device, time, ph,
         |    CAST((${num("ru")}) AS DOUBLE) / CAST((${den("ru")}) AS DOUBLE) / 1000000.0 AS sv,
         |    row_number() OVER (PARTITION BY device, ph ORDER BY time DESC) AS rnp
         |  FROM r WINDOW w AS (PARTITION BY device, ph ORDER BY time)),
         |seasons AS (SELECT device, ph,
         |    CASE WHEN isnan(sv) THEN 0.0 ELSE sv END AS sv
         |  FROM sx WHERE rnp = 1),
         |lastp AS (SELECT device, time, ph, lvl,
         |    CASE WHEN isnan(trd) THEN 0.0 ELSE trd END AS trd
         |  FROM e WHERE rn = 1),
         |fan AS (SELECT l.device, l.time, l.lvl, l.trd, u.h,
         |    (l.ph + u.h) % 7 AS fph
         |  FROM lastp l, UNNEST([1, 2]) AS u(h))
         |SELECT e.time, e.device,
         |  e.lvl + (CASE WHEN s2.sv IS NULL OR isnan(s2.sv) THEN 0.0 ELSE s2.sv END)
         |    AS holt_winters_with_fit
         |FROM e JOIN sx s2 ON s2.device = e.device AND s2.time = e.time
         |WHERE NOT isnan(e.lvl)
         |UNION ALL
         |SELECT fan.time + CAST(fan.h AS BIGINT) * 86400000000 AS time, fan.device,
         |  fan.lvl + CAST(fan.h AS BIGINT) * fan.trd + COALESCE(se.sv, 0.0)
         |    AS holt_winters_with_fit
         |FROM fan LEFT JOIN seasons se
         |  ON fan.device = se.device AND fan.fph = se.ph""".stripMargin
    },

    "q_influxql_holt_seasonal" -> {
      val cs = graft.operators.TimeSeriesOps.emaCoefficients(4, 10)
      def num(u: String) = cs.zipWithIndex.map { case (c, j) =>
        s"coalesce(lag($u, $j) OVER w * $c, 0)"
      }.mkString(" + ")
      def den(u: String) = cs.zipWithIndex.map { case (c, j) =>
        s"CASE WHEN lag($u, $j) OVER w IS NOT NULL THEN $c ELSE 0 END"
      }.mkString(" + ")
      s"""WITH $ptsSql,
         |f AS (SELECT device, ts_us, value FROM pts WHERE transducer = 'click'),
         |b AS (SELECT ts_us - ts_us % 86400000000 AS time, device,
         |    CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
         |      / CAST(count(value) AS DOUBLE) AS mv
         |  FROM f GROUP BY 1, 2),
         |d AS (SELECT *, CAST(floor(mv * 1000000.0) AS BIGINT) AS vu,
         |    CAST(floor((mv - lag(mv) OVER
         |      (PARTITION BY device ORDER BY time)) * 1000000.0) AS BIGINT) AS du,
         |    (time // 86400000000) % 7 AS ph
         |  FROM b),
         |e AS (SELECT device, time, ph, mv,
         |    CAST((${num("vu")}) AS DOUBLE) / CAST((${den("vu")}) AS DOUBLE) / 1000000.0 AS lvl,
         |    CAST((${num("du")}) AS DOUBLE) / CAST((${den("du")}) AS DOUBLE) / 1000000.0 AS trd,
         |    row_number() OVER (PARTITION BY device ORDER BY time DESC) AS rn
         |  FROM d WINDOW w AS (PARTITION BY device ORDER BY time)),
         |r AS (SELECT device, time, ph,
         |    CAST(floor((mv - lvl) * 1000000.0) AS BIGINT) AS ru
         |  FROM e),
         |sx AS (SELECT device, time, ph,
         |    CAST((${num("ru")}) AS DOUBLE) / CAST((${den("ru")}) AS DOUBLE) / 1000000.0 AS sv,
         |    row_number() OVER (PARTITION BY device, ph ORDER BY time DESC) AS rnp
         |  FROM r WINDOW w AS (PARTITION BY device, ph ORDER BY time)),
         |seasons AS (SELECT device, ph,
         |    CASE WHEN isnan(sv) THEN 0.0 ELSE sv END AS sv
         |  FROM sx WHERE rnp = 1),
         |lastp AS (SELECT device, time, ph, lvl,
         |    CASE WHEN isnan(trd) THEN 0.0 ELSE trd END AS trd
         |  FROM e WHERE rn = 1),
         |fan AS (SELECT l.device, l.time, l.lvl, l.trd, u.h,
         |    (l.ph + u.h) % 7 AS fph
         |  FROM lastp l, UNNEST([1, 2, 3, 4]) AS u(h))
         |SELECT fan.time + CAST(fan.h AS BIGINT) * 86400000000 AS time, fan.device,
         |  fan.lvl + CAST(fan.h AS BIGINT) * fan.trd + COALESCE(se.sv, 0.0) AS holt_winters
         |FROM fan LEFT JOIN seasons se
         |  ON fan.device = se.device AND fan.fph = se.ph""".stripMargin
    },

    "q_influxql_selectors" ->
      s"""WITH $ptsSql,
         |f AS (SELECT ts_us, value FROM pts WHERE transducer = 'purchase'
         |      AND ts_us >= 1704067200000000 AND ts_us < 1706659200000000),
         |b AS (SELECT ts_us - ts_us % 7200000000 AS time,
         |    (min({'t': ts_us, 'v': value})).v AS first_v,
         |    (max({'t': ts_us, 'v': value})).v AS last_v,
         |    quantile_cont(value, 0.5) AS med,
         |    quantile_cont(value, 0.9) AS p90
         |  FROM f GROUP BY 1),
         |skel AS (SELECT 1704067200000000 + o * 7200000000 AS time
         |         FROM UNNEST(generate_series(0, 359)) AS t(o)),
         |j AS (SELECT s.time, b.first_v, b.last_v, b.med, b.p90
         |  FROM skel s LEFT JOIN b ON s.time = b.time),
         |w AS (SELECT time,
         |    last_value(first_v IGNORE NULLS) OVER pb AS first_v,
         |    last_value(last_v IGNORE NULLS) OVER pb AS last_v,
         |    last_value(med IGNORE NULLS) OVER pb AS med,
         |    last_value(p90 IGNORE NULLS) OVER pb AS p90
         |  FROM j WINDOW pb AS (ORDER BY time ROWS UNBOUNDED PRECEDING))
         |SELECT time, first_v, last_v, med, p90 FROM w
         |ORDER BY time DESC LIMIT 50""".stripMargin)
}
