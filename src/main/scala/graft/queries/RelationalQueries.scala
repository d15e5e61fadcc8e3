package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.AsofJoin

/** SURVEY.md §2.3 coverage: the relational surface Spark provides for free
  * over the reference's storage layout — window functions, multi-dim
  * aggregation, set ops, scalar function families, distinct aggregates, and
  * the composed as-of join. One oracle-checked query per family.
  */
object RelationalQueries {

  /** One SQL text, two engines: correlated EXISTS / NOT EXISTS, an IN
    * subquery, and a scalar subquery (decimal-exact average so the
    * threshold comparison is deterministic cross-engine). Runs through the
    * raw-SQL entry (`Tables.registerViews`) — the whole subquery surface is
    * Catalyst-planned (semi/anti joins), nothing engine-specific.
    */
  private val subqueriesSql: String =
    """WITH thresh AS (
      |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
      |    / count(*) AS avg_price FROM orders)
      |SELECT c_mktsegment, count(*) AS n_cust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(38,4))) AS DOUBLE) AS sum_bal
      |FROM customer c
      |WHERE c_custkey IN (
      |    SELECT o_custkey FROM orders
      |    WHERE o_totalprice > 1.5 * (SELECT avg_price FROM thresh))
      |  AND EXISTS (
      |    SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders o2
      |    WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
      |      AND o2.o_totalprice < 50000.0)
      |GROUP BY 1""".stripMargin

  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 6) =
    sum(c.cast(s"decimal(38,$scale)")).cast("double")

  private val one = lit(1)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // subquery surface via the raw-SQL entry: same text runs in the oracle
    "q_subqueries" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql(subqueriesSql)
    }),

    // ranking / analytic / frame window functions over per-supplier series
    "q_window_funcs" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).filter(col("l_suppkey") % 10 === 0)
      val wSeq = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val wQty = Window.partitionBy(col("l_suppkey")).orderBy(col("l_quantity").desc)
      li.select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        row_number().over(wSeq).cast("long").as("rn"),
        rank().over(wQty).cast("long").as("qty_rank"),
        dense_rank().over(wQty).cast("long").as("qty_dense_rank"),
        lag(col("l_quantity"), 1).over(wSeq).as("prev_qty"),
        lead(col("l_quantity"), 1).over(wSeq).as("next_qty"),
        sum(col("l_quantity").cast("decimal(38,4)"))
          .over(wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_qty"))
    }),

    // ROLLUP: hierarchical totals (nation -> status -> grand total)
    "q_rollup" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = broadcast(Tables.customer(s, dir))
      val n = broadcast(Tables.nation(s, dir))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("o_orderstatus"))
        .agg(count(one).as("n_orders"), dsum(col("o_totalprice"), 4).as("total"))
    }),

    // CUBE over event dimensions
    "q_cube" -> ((s, dir) => {
      Tables.events(s, dir)
        .cube(col("event_type"), (col("user_id") % 5).as("ub"))
        .agg(count(one).as("n"), dsum(col("value"), 4).as("sum_value"))
    }),

    // GROUPING SETS via the SQL surface (spark.sql over a temp view)
    "q_grouping_sets" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events_v")
      s.sql(
        """SELECT event_type, user_id % 5 AS ub, count(1) AS n
          |FROM events_v
          |GROUP BY GROUPING SETS ((event_type), (user_id % 5), ())""".stripMargin)
    }),

    // relational set operations: UNION / INTERSECT / EXCEPT (all distinct)
    "q_setops" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def users(t: String) = ev.filter(col("event_type") === t).select(col("user_id"))
      val both = users("purchase").intersect(users("error"))
        .withColumn("setop", lit("purchase_and_error"))
      val errOnly = users("error").except(users("purchase"))
        .withColumn("setop", lit("error_only"))
      val any = users("purchase").union(users("signup")).distinct()
        .withColumn("setop", lit("purchase_or_signup"))
      both.unionByName(errOnly).unionByName(any)
        .groupBy("setop").agg(count(one).as("n_users"), sum(col("user_id")).as("sum_users"))
    }),

    // string function family (R5/§2.3) over documents
    "q_string_funcs" -> ((s, dir) => {
      Tables.documents(s, dir).filter(col("doc_id") % 20 === 0).select(
        col("doc_id"),
        upper(substring(col("text"), 1, 12)).as("head_upper"),
        length(col("text")).cast("long").as("len"),
        length(replace(col("text"), lit(" "), lit(""))).cast("long").as("len_nospace"),
        regexp_extract(col("text"), "^(\\w+)", 1).as("first_token"),
        instr(col("text"), "data").cast("long").as("data_pos"),
        concat_ws("|", col("lang"), col("source")).as("lang_source"),
        lpad(col("lang"), 5, "_").as("lang_pad"),
        reverse(substring(col("text"), 1, 8)).as("head_rev"),
        substring_index(col("text"), " ", 2).as("first_two"))
    }),

    // date/time function family (§2.3) over orders
    "q_datetime_funcs" -> ((s, dir) => {
      Tables.orders(s, dir).filter(col("o_orderkey") % 100 === 0).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        (weekday(col("o_orderdate")) + 1).cast("long").as("isodow"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        date_format(date_trunc("quarter", col("o_orderdate")), "yyyy-MM-dd").as("quarter_start"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_2002"),
        date_format(add_months(col("o_orderdate"), 1), "yyyy-MM-dd").as("next_month"),
        // o_orderdate is parquet TIMESTAMP_NTZ; cast is identity under UTC TZ
        unix_micros(col("o_orderdate").cast("timestamp")).as("epoch_us"))
    }),

    // math function family (§2.3); only IEEE-exact ops + correctly-rounded sqrt
    "q_math_funcs" -> ((s, dir) => {
      Tables.lineitem(s, dir).filter(col("l_orderkey") % 500 === 0).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - lit(0.05)).as("abs_dev"),
        floor(col("l_extendedprice")).cast("long").as("floor_price"),
        ceil(col("l_extendedprice")).cast("long").as("ceil_price"),
        signum(col("l_discount") - lit(0.05)).as("sign_dev"),
        (col("l_orderkey") % 7).as("mod7"),
        sqrt(col("l_extendedprice")).as("sqrt_price"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("gmax"),
        least(col("l_tax"), col("l_discount")).as("lmin"),
        round(col("l_extendedprice") * col("l_quantity"), 2).as("rounded_amt"))
    }),

    // array function family (§2.3): tokenize + size/distinct/contains/slice
    "q_array_funcs" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, dir).filter(col("doc_id") % 10 === 0).select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
        array_contains(toks, "data").as("has_data"),
        concat_ws(" ", slice(toks, 1, 3)).as("first3"),
        concat_ws(" ", array_sort(slice(toks, 1, 5))).as("first5_sorted"))
    }),

    // map function family (§2.3): wide layout as MapType + element_at
    "q_map_funcs" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(one).as("n"))
        .groupBy(col("user_id"))
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("n")))).as("m"))
        .select(
          col("user_id"),
          coalesce(element_at(col("m"), "click"), lit(0L)).as("n_click"),
          coalesce(element_at(col("m"), "purchase"), lit(0L)).as("n_purchase"),
          size(col("m")).cast("long").as("n_types"),
          concat_ws(",", array_sort(map_keys(col("m")))).as("types"))
    }),

    // distinct aggregates (exact; §2.3 aggregation)
    "q_distinct_agg" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("event_type")).as("n_types"),
          countDistinct(concat_ws("|", col("event_type"), col("user_id"))).as("n_pairs"),
          count(one).as("n"))
    }),

    // EXACT interpolated percentiles (InfluxQL percentile() / SQL
    // percentile_cont): Spark's percentile and DuckDB's quantile_cont share
    // the type-7 definition; parity of the interpolation arithmetic is
    // pinned by this oracle row
    "q_percentiles" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          expr("percentile(value, 0.25)").as("p25"),
          expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.75)").as("p75"),
          expr("percentile(value, 0.95)").as("p95"),
          min(col("value")).as("vmin"),
          max(col("value")).as("vmax"))
    }),

    // interval (range) join via time binning: events landing inside
    // per-nation 6-hour maintenance windows. The binned equi-join shape
    // replaces the nested-loop theta join (see RangeJoin) — hash shuffle
    // on the hour bin, exact containment as post-filter
    "q_range_join" -> ((s, dir) => {
      val jan1Us = 1704067200000000L
      val windows = Tables.nation(s, dir).select(
        col("n_nationkey").as("window_id"),
        (lit(jan1Us) + col("n_nationkey") * lit(86400000000L)).as("w_start_us"),
        (lit(jan1Us) + col("n_nationkey") * lit(86400000000L) + lit(21600000000L)).as("w_end_us"))
      val events = Tables.events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
      graft.operators.RangeJoin.pointInInterval(
          events, "ts_us", windows, "w_start_us", "w_end_us", binUs = 3600000000L)
        .groupBy("window_id")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(38,4)")).cast("double").as("sum_value"))
    }),

    // sequential-pattern funnel: view -> click-after-view ->
    // purchase-after-that-click, per user; stage-reach counts per user
    // cohort (user_id % 10). Three keyed aggregations, all shuffling on
    // user_id — no window over the full event set
    "q_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts_us")).as("v_ts"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("ts_us") > col("v_ts"))
        .groupBy("user_id").agg(min(col("ts_us")).as("c_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("ts_us") > col("c_ts"))
        .groupBy("user_id").agg(min(col("ts_us")).as("p_ts"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .groupBy((col("user_id") % 10).as("cohort"))
        .agg(
          count(lit(1)).as("n_view"),
          count(col("c_ts")).as("n_view_click"),
          count(col("p_ts")).as("n_full_funnel"))
    }),

    // as-of join: align each purchase to the user's most recent click
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_us", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("click_ts"), col("value").as("click_value"))
      AsofJoin.asof(purchases, clicks, Seq("user_id"),
        leftTs = "ts_us", rightTs = "click_ts", rightVals = Seq("click_value"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_subqueries" -> subqueriesSql,

    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |v AS (SELECT user_id, min(ts_us) AS v_ts FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts_us) AS c_ts
        |  FROM e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts_us > v.v_ts GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts_us) AS p_ts
        |  FROM e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts_us > c.c_ts GROUP BY 1)
        |SELECT v.user_id % 10 AS cohort,
        |  count(*) AS n_view, count(c.c_ts) AS n_view_click,
        |  count(p.p_ts) AS n_full_funnel
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |  LEFT JOIN p ON v.user_id = p.user_id
        |GROUP BY 1""".stripMargin,

    "q_range_join" ->
      """WITH w AS (SELECT n_nationkey AS window_id,
        |    1704067200000000 + n_nationkey * 86400000000 AS w_start_us,
        |    1704067200000000 + n_nationkey * 86400000000 + 21600000000 AS w_end_us
        |  FROM nation)
        |SELECT window_id, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
        |FROM events JOIN w
        |  ON epoch_us(ts) >= w_start_us AND epoch_us(ts) < w_end_us
        |GROUP BY 1""".stripMargin,

    "q_percentiles" ->
      """SELECT event_type,
        |  quantile_cont(value, 0.25) AS p25,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.75) AS p75,
        |  quantile_cont(value, 0.95) AS p95,
        |  min(value) AS vmin, max(value) AS vmax
        |FROM events GROUP BY 1""".stripMargin,

    "q_window_funcs" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  row_number() OVER w_seq AS rn,
        |  rank() OVER w_qty AS qty_rank,
        |  dense_rank() OVER w_qty AS qty_dense_rank,
        |  lag(l_quantity, 1) OVER w_seq AS prev_qty,
        |  lead(l_quantity, 1) OVER w_seq AS next_qty,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) OVER
        |    (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |     ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_qty
        |FROM lineitem WHERE l_suppkey % 10 = 0
        |WINDOW w_seq AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber),
        |       w_qty AS (PARTITION BY l_suppkey ORDER BY l_quantity DESC)""".stripMargin,

    "q_rollup" ->
      """SELECT n_name, o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, o_orderstatus)""".stripMargin,

    "q_cube" ->
      """SELECT event_type, user_id % 5 AS ub, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY CUBE (event_type, user_id % 5)""".stripMargin,

    "q_grouping_sets" ->
      """SELECT event_type, user_id % 5 AS ub, count(*) AS n
        |FROM events GROUP BY GROUPING SETS ((event_type), (user_id % 5), ())""".stripMargin,

    "q_setops" ->
      """WITH p AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
        |     e AS (SELECT user_id FROM events WHERE event_type = 'error'),
        |     sg AS (SELECT user_id FROM events WHERE event_type = 'signup'),
        |     tagged AS (
        |       SELECT user_id, 'purchase_and_error' AS setop FROM (SELECT * FROM p INTERSECT SELECT * FROM e)
        |       UNION ALL
        |       SELECT user_id, 'error_only' FROM (SELECT * FROM e EXCEPT SELECT * FROM p)
        |       UNION ALL
        |       SELECT user_id, 'purchase_or_signup' FROM (SELECT * FROM p UNION SELECT * FROM sg))
        |SELECT setop, count(*) AS n_users, CAST(sum(user_id) AS BIGINT) AS sum_users
        |FROM tagged GROUP BY 1""".stripMargin,

    "q_string_funcs" ->
      """SELECT doc_id,
        |  upper(substring(text, 1, 12)) AS head_upper,
        |  length(text) AS len,
        |  length(replace(text, ' ', '')) AS len_nospace,
        |  regexp_extract(text, '^(\w+)', 1) AS first_token,
        |  strpos(text, 'data') AS data_pos,
        |  lang || '|' || source AS lang_source,
        |  lpad(lang, 5, '_') AS lang_pad,
        |  reverse(substring(text, 1, 8)) AS head_rev,
        |  CASE WHEN length(string_split(text, ' ')) >= 2
        |       THEN string_split(text, ' ')[1] || ' ' || string_split(text, ' ')[2]
        |       ELSE text END AS first_two
        |FROM documents WHERE doc_id % 20 = 0""".stripMargin,

    "q_datetime_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
        |  isodow(o_orderdate) AS isodow,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS quarter_start,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
        |  strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month,
        |  epoch_us(o_orderdate) AS epoch_us
        |FROM orders WHERE o_orderkey % 100 = 0""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS abs_dev,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
        |  CASE WHEN l_discount - 0.05 > 0 THEN 1.0 WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS sign_dev,
        |  l_orderkey % 7 AS mod7,
        |  sqrt(l_extendedprice) AS sqrt_price,
        |  greatest(l_quantity, l_discount * 100) AS gmax,
        |  least(l_tax, l_discount) AS lmin,
        |  round(l_extendedprice * l_quantity, 2) AS rounded_amt
        |FROM lineitem WHERE l_orderkey % 500 = 0""".stripMargin,

    "q_array_funcs" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id % 10 = 0)
        |SELECT doc_id,
        |  length(toks) AS n_tokens,
        |  length(list_distinct(toks)) AS n_distinct_tokens,
        |  list_contains(toks, 'data') AS has_data,
        |  array_to_string(toks[1:3], ' ') AS first3,
        |  array_to_string(list_sort(toks[1:5]), ' ') AS first5_sorted
        |FROM t""".stripMargin,

    "q_map_funcs" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |  count(DISTINCT event_type) AS n_types,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
        |FROM events GROUP BY 1""".stripMargin,

    "q_distinct_agg" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  count(DISTINCT user_id) AS n_users,
        |  count(DISTINCT event_type) AS n_types,
        |  count(DISTINCT event_type || '|' || user_id) AS n_pairs,
        |  count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,

    "q_asof_join" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value FROM events),
        |p AS (SELECT event_id, user_id, ts_us, value FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts_us AS click_ts, value AS click_value FROM ev WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts_us, p.value,
        |  c.click_ts AS right_click_ts, c.click_value AS right_click_value
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND c.click_ts <= p.ts_us""".stripMargin
  )
}
