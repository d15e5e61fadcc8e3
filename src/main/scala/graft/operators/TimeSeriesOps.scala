package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The implicit time-series query surface the reference's storage layout is
  * designed to serve (SURVEY.md §2.2): time-range scans, time-bucketed
  * aggregates (the InfluxQL `GROUP BY time(10m)` idiom, cf. the service's own
  * 10-minute rollup at influx_service.py:310-322), last/first value per
  * series, top-k.
  *
  * All operators are shuffle-minimal: one hash-aggregate (partial+final) for
  * buckets, one window per-key for ranks; filters are plain predicates that
  * push down to parquet.
  */
object TimeSeriesOps {

  /** Time-range scan predicate — pushes to the parquet scan. */
  def timeRange(ts: Column, from: String, to: String): Column =
    ts >= lit(from).cast("timestamp") && ts < lit(to).cast("timestamp")

  /** Time-range predicate on a nanosecond-epoch LONG column (exact for
    * whole-second bounds, since us = ns div 1000).
    */
  def timeRangeNs(tsNs: Column, from: String, to: String): Column = {
    def ns(s: String): Long = // explicit UTC: independent of the JVM default zone
      java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
    tsNs >= lit(ns(from)) && tsNs < lit(ns(to))
  }

  /** Time-range predicate for the events dual surface (`ts` TIMESTAMP +
    * `ts_ns` LONG, Tables.events): bounds BOTH columns. Exactly one of the
    * two is the raw parquet column (layout-dependent — see Tables.events);
    * its bound lands in PushedFilters and prunes row groups / partitions,
    * while the derived twin is a redundant-but-exact in-memory predicate.
    * At 100 TB the pushed bound is the difference between pruning to a few
    * row groups and scanning the corpus.
    */
  def timeRangeEvents(from: String, to: String): Column =
    timeRange(col("ts"), from, to) && timeRangeNs(col("ts_ns"), from, to)

  /** Tumbling time-bucket aggregation: `GROUP BY time(dur)` semantics.
    * Uses Spark's `window()` (epoch-aligned tumbling windows); callers pass
    * the aggregate columns. Partial aggregation (map-side combine) applies
    * automatically, so the shuffle carries one row per (key, bucket).
    */
  def bucketAgg(df: DataFrame, ts: Column, duration: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(ts, duration) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("w_start", unix_micros(col("window.start")))
      .drop("window")

  /** Last value per series: `max_by` keeps the aggregation a single
    * hash-agg (no sort, no window shuffle) — the InfluxQL `last()` idiom.
    */
  def lastBy(df: DataFrame, keys: Seq[Column], orderCol: Column, valueCol: Column): DataFrame =
    df.groupBy(keys: _*)
      .agg(
        max_by(valueCol, orderCol).as("last_value"),
        max(orderCol).as("last_ts"),
        min_by(valueCol, orderCol).as("first_value"))

  /** InfluxQL-style per-series analytics (derivative / difference /
    * moving_average / cumulative_sum / elapsed): one window per series,
    * ordered by time — a single shuffle on the series key.
    * Double expressions are shaped for bit-exact oracle parity; running
    * sums and moving averages accumulate in decimal.
    */
  def seriesAnalytics(df: DataFrame, key: Column, tsUs: Column, value: Column,
                      movingN: Int = 3): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tsUs)
    val full = Window.partitionBy(key) // whole-series frame (no order)
    val frame = w.rowsBetween(-(movingN - 1), Window.currentRow)
    val prevV = lag(value, 1).over(w)
    val prevTs = lag(tsUs, 1).over(w)
    // per-second rate; null on the first point of a series
    val derivative = (value - prevV) / ((tsUs - prevTs).cast("double") / lit(1000000.0))
    df.select(
      key.as("series_key"), tsUs.as("ts_us"), value.as("value"),
      (value - prevV).as("difference"),
      (tsUs - prevTs).as("elapsed_us"),
      derivative.as("derivative"),
      // InfluxQL non_negative_derivative: negative rates (counter resets)
      // suppressed to null rather than reported as bogus negatives
      when(derivative < 0, lit(null).cast("double")).otherwise(derivative)
        .as("nn_derivative"),
      (sum(value.cast("decimal(38,4)")).over(frame).cast("double")
        / count(lit(1)).over(frame)).as(s"moving_avg_$movingN"),
      sum(value.cast("decimal(38,4)")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double").as("cumulative_sum"),
      // InfluxQL spread(): max - min over the whole series (exact doubles)
      (max(value).over(full) - min(value).over(full)).as("spread"))
  }

  /** Time-bucket gap filling with LOCF (InfluxQL `GROUP BY time(...) fill(previous)`):
    * densify each series over [fromTs, toTs) at `stepUs` spacing, then carry
    * the last observed aggregate forward. The bucket skeleton is generated
    * per series key (explode of a bounded sequence — no driver loop); the
    * fill is a last-ignoreNulls window. One shuffle on the series key.
    */
  /** Hard cap on the densified skeleton length (buckets per series). The
    * skeleton materializes as ONE `sequence()` array per series row before
    * exploding, so an unbounded range (a year at 1s = 31M buckets) would
    * build a 31M-element array in a single row — executor OOM. InfluxDB
    * guards the same way (`max-select-buckets`); we fail fast with the
    * count in the message instead of dying mid-stage.
    */
  val MaxFillBuckets: Long = 1L << 20

  /** Total-skeleton-rows bound for densifying fills: buckets × series —
    * the max-select-series face of the same guard. A years-long range at
    * a small step over many series is output the user almost never means;
    * fail loudly like [[MaxFillBuckets]] instead of generating it. Only
    * CHECKED past [[FillSeriesProbeBuckets]] buckets, so small skeletons
    * (every dashboard query) never pay the series-count job.
    */
  val MaxFillRows: Long = 1L << 27

  /** Bucket count above which the fill planner runs the one extra
    * series-count job to enforce [[MaxFillRows]]. */
  val FillSeriesProbeBuckets: Long = 1L << 14

  /** Bucket count of a [fromUs, untilUs) range at stepUs, overflow-safe
    * (Long end to end — a wide range with a small step overflowed the old
    * `.toInt`, silently truncating the skeleton) and capped. */
  private[graft] def fillBucketCount(fromUs: Long, untilUs: Long, stepUs: Long): Long = {
    val n = (untilUs - fromUs - 1) / stepUs + 1 // ceil without additive overflow
    require(n <= MaxFillBuckets,
      s"gap-fill skeleton of $n buckets exceeds max $MaxFillBuckets " +
        "(max-select-buckets guard); widen the step or narrow the range")
    n
  }

  def gapFillLocf(df: DataFrame, key: Column, tsUs: Column, value: Column,
                  fromUs: Long, untilUs: Long, stepUs: Long): DataFrame = {
    require(untilUs > fromUs && stepUs > 0, "empty or inverted gap-fill range")
    val bucketed = df
      .filter(tsUs >= fromUs && tsUs < untilUs)
      .groupBy(key.as("series_key"),
        (floor((tsUs - lit(fromUs)) / lit(stepUs)).cast("long")).as("bucket"))
      .agg(sum(value.cast("decimal(38,4)")).cast("double").as("bucket_sum"))
    // ceil: a trailing partial bucket still belongs to the skeleton (floor
    // would silently drop its data in the join below)
    val nBuckets = fillBucketCount(fromUs, untilUs, stepUs)
    val skeleton = bucketed.select(col("series_key")).distinct()
      .select(col("series_key"),
        explode(sequence(lit(0L), lit(nBuckets - 1L))).as("bucket"))
    val w = Window.partitionBy(col("series_key")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    skeleton.join(bucketed, Seq("series_key", "bucket"), "left")
      .select(col("series_key"), col("bucket"),
        (lit(fromUs) + col("bucket") * lit(stepUs)).as("bucket_start_us"),
        col("bucket_sum"),
        last(col("bucket_sum"), ignoreNulls = true).over(w).as("filled_sum"))
  }

  /** Time-bucket gap filling with linear interpolation (InfluxQL
    * `GROUP BY time(...) fill(linear)`): same densified skeleton as
    * [[gapFillLocf]], but an empty bucket takes the straight line between
    * its nearest observed neighbors; buckets before the first / after the
    * last observation stay null (InfluxQL leaves the edges unfilled —
    * there is nothing to interpolate toward).
    *
    * Cross-engine determinism: the neighbor values are exact
    * (decimal-accumulated bucket sums cast once to double) and the
    * interpolation is a fixed IEEE expression tree — prev + (next-prev) ·
    * (Δbucket/gap) — three exactly-specified double ops on exact inputs,
    * bit-identical in any IEEE engine (same discipline as the cosine's
    * single division). Two window passes over one shuffle on the series
    * key; nothing rescans the input.
    */
  def gapFillLinear(df: DataFrame, key: Column, tsUs: Column, value: Column,
                    fromUs: Long, untilUs: Long, stepUs: Long): DataFrame = {
    require(untilUs > fromUs && stepUs > 0, "empty or inverted gap-fill range")
    val bucketed = df
      .filter(tsUs >= fromUs && tsUs < untilUs)
      .groupBy(key.as("series_key"),
        (floor((tsUs - lit(fromUs)) / lit(stepUs)).cast("long")).as("bucket"))
      .agg(sum(value.cast("decimal(38,4)")).cast("double").as("bucket_sum"))
    val nBuckets = fillBucketCount(fromUs, untilUs, stepUs)
    val skeleton = bucketed.select(col("series_key")).distinct()
      .select(col("series_key"),
        explode(sequence(lit(0L), lit(nBuckets - 1L))).as("bucket"))
    val back = Window.partitionBy(col("series_key")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("series_key")).orderBy(col("bucket"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsBucket = when(col("bucket_sum").isNotNull, col("bucket"))
    val joined = skeleton.join(bucketed, Seq("series_key", "bucket"), "left")
      .select(col("series_key"), col("bucket"), col("bucket_sum"),
        last(col("bucket_sum"), ignoreNulls = true).over(back).as("__pv"),
        last(obsBucket, ignoreNulls = true).over(back).as("__pb"),
        first(col("bucket_sum"), ignoreNulls = true).over(fwd).as("__nv"),
        first(obsBucket, ignoreNulls = true).over(fwd).as("__nb"))
    joined.select(col("series_key"), col("bucket"),
      (lit(fromUs) + col("bucket") * lit(stepUs)).as("bucket_start_us"),
      col("bucket_sum"),
      when(col("bucket_sum").isNotNull, col("bucket_sum"))
        .when(col("__pv").isNotNull && col("__nv").isNotNull,
          col("__pv") + (col("__nv") - col("__pv")) *
            ((col("bucket") - col("__pb")).cast("double") /
              (col("__nb") - col("__pb")).cast("double")))
        .otherwise(lit(null).cast("double")).as("filled_sum"))
  }

  /** Integer kernel for the truncated EMA: weight_j = 2·(n-1)^j / (n+1)^(j+1)
    * (the a·(1-a)^j kernel with a = 2/(n+1)), scaled by (n+1)^depth so every
    * coefficient is an exact integer — the whole EMA then runs in int64
    * arithmetic and the only floating-point ops are the two final divides.
    */
  def emaCoefficients(n: Int, depth: Int): Seq[Long] = {
    require(n > 1 && depth > 0, "need n > 1 and depth > 0")
    // headroom: coefficients multiply 1e-6-quantized values (~2^30 for a
    // 1e3-range metric); keep the kernel below 2^32 so products stay exact
    require(BigInt(n + 1).pow(depth) * 2 < (BigInt(1) << 32),
      s"EMA kernel (n=$n, depth=$depth) overflows the int64 budget")
    (0 until depth).map(j =>
      (BigInt(2) * BigInt(n - 1).pow(j) * BigInt(n + 1).pow(depth - 1 - j)).toLong)
  }

  /** InfluxQL-style `exponential_moving_average(n)` as a truncated-kernel
    * weighted average over the trailing `depth` points, normalized by the
    * kernel mass of the points actually present (a series head averages
    * what exists instead of decaying toward zero). Truncation error is
    * (1-a)^depth of the mass — depth 5·n keeps it under 1%.
    *
    * Cross-engine determinism: values are quantized to 1e-6 units (one IEEE
    * multiply + floor per row), weighted by the integer kernel, and summed
    * in int64 — exact — so the result is two IEEE divisions away from
    * integers and bit-identical in any engine. (A double-weight fold drifts
    * an ulp across engines; this is the same quantize-then-integer-sum
    * discipline as the vector kernels.)
    */
  def exponentialMovingAverage(value: Column, w: org.apache.spark.sql.expressions.WindowSpec,
                               n: Int, depth: Int): Column = {
    val cs = emaCoefficients(n, depth)
    val vu = floor(value * lit(1000000.0)) // 1e-6 units, int64
    val num = cs.zipWithIndex.map { case (c, j) =>
      coalesce(lag(vu, j).over(w) * lit(c), lit(0L))
    }.reduce(_ + _)
    val den = cs.zipWithIndex.map { case (c, j) =>
      when(lag(vu, j).over(w).isNotNull, lit(c)).otherwise(lit(0L))
    }.reduce(_ + _)
    num.cast("double") / den.cast("double") / lit(1000000.0)
  }

  /** Integer kernel for truncated Wilder smoothing (α = 1/n): weight_j =
    * ((n-1)/n)^j scaled by n^(depth-1) so every coefficient is an exact
    * integer. The α factor itself is dropped — RSI consumes these kernels
    * only as a gain/loss RATIO, where it cancels.
    */
  def wilderCoefficients(n: Int, depth: Int): Seq[Long] = {
    require(n > 1 && depth > 0, "need n > 1 and depth > 0")
    require(BigInt(n).pow(depth) * 2 < (BigInt(1) << 32),
      s"Wilder kernel (n=$n, depth=$depth) overflows the int64 budget")
    (0 until depth).map(j =>
      (BigInt(n - 1).pow(j) * BigInt(n).pow(depth - 1 - j)).toLong)
  }

  /** Kernel depth the InfluxQL dialect uses for `n`-period EMA-family
    * transforms: the 5n truncation target (mass error (1-a)^5n < 1%)
    * capped by the integer-coefficient budget of [[emaCoefficients]].
    * Deterministic in `n` alone, so the differential interpreter and the
    * oracle SQL derive the identical kernel.
    */
  def emaDialectDepth(n: Int): Int = {
    var d = 1
    while (d < 5 * n && BigInt(n + 1).pow(d + 1) * 2 < (BigInt(1) << 32)) d += 1
    d
  }

  /** [[emaDialectDepth]]'s counterpart for the Wilder (α = 1/n) kernel. */
  def wilderDialectDepth(n: Int): Int = {
    var d = 1
    while (d < 5 * n && BigInt(n).pow(d + 1) * 2 < (BigInt(1) << 32)) d += 1
    d
  }

  /** InfluxQL `relative_strength_index(n)` over a pre-computed quantized
    * diff column (1e-6 int64 units, null at each series head): truncated
    * Wilder-smoothed average gain vs average loss,
    * RSI = 100·G/(G+L). Both averages share the same kernel mass, so the
    * normalization cancels and the whole computation is int64 until one
    * IEEE multiply + divide. Pinned determinism semantics: rows whose
    * trailing kernel has zero mass (series head) yield null; a flat window
    * (G = L = 0) yields the neutral 50.
    */
  def relativeStrengthIndex(du: Column, w: org.apache.spark.sql.expressions.WindowSpec,
                            n: Int, depth: Int): Column = {
    val cs = wilderCoefficients(n, depth)
    val gain = when(du > 0, du).otherwise(lit(0L))
    val loss = when(du < 0, -du).otherwise(lit(0L))
    def ksum(x: Column) = cs.zipWithIndex.map { case (c, j) =>
      coalesce(lag(x, j).over(w) * lit(c), lit(0L))
    }.reduce(_ + _)
    val mass = cs.zipWithIndex.map { case (c, j) =>
      when(lag(du, j).over(w).isNotNull, lit(c)).otherwise(lit(0L))
    }.reduce(_ + _)
    val g = ksum(gain)
    val l = ksum(loss)
    when(mass > 0,
      when(g + l === 0, lit(50.0))
        .otherwise((lit(100.0) * g.cast("double")) / (g + l).cast("double")))
      .otherwise(lit(null).cast("double"))
  }

  /** InfluxQL `chande_momentum_oscillator(n)` over quantized values and
    * their diffs: CMO = 100·(ΣU − ΣD)/(ΣU + ΣD) across the trailing n
    * diffs — pure rolling int64 sums, one IEEE multiply + divide. Pinned
    * semantics: rows without a full n-diff trailing window (lag(v, n)
    * absent) yield null; an all-flat window yields 0.
    */
  def chandeMomentumOscillator(vu: Column, du: Column,
                               w: org.apache.spark.sql.expressions.WindowSpec,
                               n: Int): Column = {
    val frame = w.rowsBetween(-(n - 1), 0)
    val up = sum(when(du > 0, du).otherwise(lit(0L))).over(frame)
    val down = sum(when(du < 0, -du).otherwise(lit(0L))).over(frame)
    when(lag(vu, n).over(w).isNotNull,
      when(up + down === 0, lit(0.0))
        .otherwise((lit(100.0) * (up - down).cast("double")) / (up + down).cast("double")))
      .otherwise(lit(null).cast("double"))
  }

  /** InfluxQL `kaufmans_efficiency_ratio(n)` over quantized values and
    * their diffs: KER = |v_t − v_{t−n}| / Σ_{j<n}|diff_{t−j}| — direction
    * over volatility across the trailing n diffs, int64 until one IEEE
    * division. Pinned semantics: no full window → null; zero volatility
    * → 0 (the InfluxDB convention for a perfectly flat window).
    */
  def kaufmansEfficiencyRatio(vu: Column, du: Column,
                              w: org.apache.spark.sql.expressions.WindowSpec,
                              n: Int): Column = {
    val vol = sum(abs(du)).over(w.rowsBetween(-(n - 1), 0))
    val dir = abs(vu - lag(vu, n).over(w))
    when(lag(vu, n).over(w).isNotNull,
      when(vol === 0, lit(0.0))
        .otherwise(dir.cast("double") / vol.cast("double")))
      .otherwise(lit(null).cast("double"))
  }

  /** Staged EMA smoothing for the DEMA/TEMA/TRIX family: adds columns
    * `e1..e<stages>` where each stage is the truncated-kernel EMA of the
    * previous stage's output, re-quantized (floor·1e6) before re-entering
    * the integer kernel — every stage is therefore bit-exact cross-engine.
    * One shuffle on the series key; Catalyst chains the per-stage Window
    * operators over the same sort order.
    */
  def emaStages(df: DataFrame, key: Column, tsUs: Column, value: Column,
                n: Int, depth: Int, stages: Int,
                tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    require(stages >= 1 && stages <= 3, "1..3 smoothing stages")
    val tbNames = tieBreak.indices.map(i => s"__tb$i")
    val w = Window.partitionBy(col("series_key"))
      .orderBy(col("ts_us") +: tbNames.map(col): _*)
    var cur = df.select(
      key.as("series_key") +: tsUs.as("ts_us") +: value.as("value") +:
        tieBreak.zip(tbNames).map { case (c, nm) => c.as(nm) }: _*)
    var src: Column = col("value")
    for (k <- 1 to stages) {
      cur = cur.withColumn(s"e$k", exponentialMovingAverage(src, w, n, depth))
      src = col(s"e$k")
    }
    cur
  }

  /** Kaufman's adaptive moving average — the one TA recurrence whose
    * smoothing constant is DATA-DEPENDENT per step (sc = (er·(2/3 − 2/31)
    * + 2/31)², er the trailing efficiency ratio), so it cannot unroll to a
    * fixed window kernel like [[exponentialMovingAverage]]. The honest
    * shape is the sequential per-series recursion InfluxDB itself runs:
    * one shuffle partitions by series, a partition-local sort orders each
    * series by time, and a single O(1)-state linear scan folds
    * kama' = kama + sc·(price − kama) — the classic
    * repartition→sortWithinPartitions→mapPartitions pattern, no per-series
    * buffering, so a 100 TB corpus streams through.
    *
    * Pinned determinism semantics (the oracle mirrors them step by step —
    * the recursion is a fixed IEEE tree, bit-exact cross-engine):
    *   - rows whose `sc` is null (no defined efficiency ratio yet, or a
    *     ratio interrupted by a null neighbor) emit null and do NOT
    *     advance the state;
    *   - the first sc-defined row of a series seeds kama with its own
    *     price;
    *   - every later sc-defined row folds the recursion.
    *
    * Input columns: `keys` identify the series, `timeCol` (long) orders
    * it, `priceCol`/`scCol` are doubles (null-price rows are dropped —
    * the indicator emits only at present buckets). Returns (keys...,
    * timeCol, outCol) for a left join back onto the bucket grid.
    */
  def kamaScan(df: DataFrame, keys: Seq[String], timeCol: String,
               priceCol: String, scCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // \u0001-separated composite key; a null tag encodes as \u0002 so a
    // series with an absent tag never merges with one tagged ""
    val seriesKey = concat_ws("\u0001", keys.map(k =>
      coalesce(col(k).cast("string"), lit("\u0002"))): _*)
    val keyed = df
      .filter(col(priceCol).isNotNull)
      .select(
        seriesKey.as("_1"),
        col(timeCol).cast("long").as("_2"),
        col(priceCol).cast("double").as("_3"),
        col(scCol).cast("double").as("_4"))
      .as[(String, Long, Double, Option[Double])]
    val scanned = keyed
      .repartition(col("_1"))
      .sortWithinPartitions(col("_1"), col("_2"))
      .mapPartitions { it =>
        var curKey: String = null
        var kama: java.lang.Double = null
        it.map { case (k, t, p, sc) =>
          if (k != curKey) { curKey = k; kama = null }
          val out: Option[Double] = sc match {
            case Some(s) =>
              if (kama == null) kama = p
              else kama = kama + s * (p - kama)
              Some(kama.doubleValue)
            case None => None
          }
          (k, t, out)
        }
      }
      .toDF("__kama_k", timeCol, outCol)
    df.withColumn("__kama_k", seriesKey)
      .join(scanned, Seq("__kama_k", timeCol), "left")
      .drop("__kama_k")
  }

  /** InfluxQL `holt_winters(h, ...)`-style forecast — the fixed-coefficient
    * variant of Holt's linear method: the LEVEL is the truncated-kernel
    * integer EMA of the values and the TREND the same kernel over first
    * differences (each recurrence's fixed-α unrolling, truncated at
    * `depth`); the forecast at horizon `h` is `level_T + h·trend_T` taken
    * at each series' last point. InfluxQL fits its coefficients with an
    * optimizer, which no two engines reproduce bit-identically; fixing
    * them keeps the operator deterministic and oracle-exact while keeping
    * the same query surface (influx_service.py's InfluxDB tail exposes
    * holt_winters() to its users). Same quantize-then-int64-sum discipline
    * as [[exponentialMovingAverage]]; a single-point series has no trend
    * (NaN-safe: trend 0, forecast = level).
    *
    * One window shuffle on the series key serves both smoothings and the
    * last-point pick; the horizon fan-out runs on |series| rows only.
    */
  def holtForecast(df: DataFrame, key: Column, tsUs: Column, value: Column,
                   n: Int, depth: Int, horizons: Seq[Int],
                   tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    require(horizons.nonEmpty, "need at least one horizon")
    val tbNames = tieBreak.indices.map(i => s"__tb$i")
    val base = df.select(
      key.as("series_key") +: tsUs.as("__ts") +: value.as("__v") +:
        tieBreak.zip(tbNames).map { case (c, nm) => c.as(nm) }: _*)
    val w = Window.partitionBy(col("series_key"))
      .orderBy(col("__ts") +: tbNames.map(col): _*)
    val wDesc = Window.partitionBy(col("series_key"))
      .orderBy(col("__ts").desc +: tbNames.map(col(_).desc): _*)
    val smoothed = base
      .withColumn("__d", col("__v") - lag(col("__v"), 1).over(w))
      .select(col("series_key"),
        exponentialMovingAverage(col("__v"), w, n, depth).as("sm_level"),
        // rows with no predecessor have an all-null diff kernel (mass 0):
        // guard the 0/0 BEFORE it evaluates — under ANSI it throws, it
        // doesn't NaN — trend 0 is the honest "no slope evidence" answer
        when(lag(col("__v"), 1).over(w).isNotNull,
          exponentialMovingAverage(col("__d"), w, n, depth))
          .otherwise(lit(0.0)).as("sm_trend"),
        row_number().over(wDesc).as("__rn"))
    smoothed.filter(col("__rn") === 1)
      .select(col("series_key"),
        explode(array(horizons.map(h => lit(h.toLong)): _*)).as("h"),
        col("sm_level"), col("sm_trend"))
      .withColumn("forecast", col("sm_level") + col("h") * col("sm_trend"))
  }

  /** InfluxQL `integral()`: time-weighted area under the series (trapezoid
    * rule), per key. Each row's trapezoid (v + prev_v)/2 · Δt_seconds is a
    * double computed identically in any engine, then quantized to 1e-6
    * units with `floor` and summed in int64 — order-independent and exact
    * (a DECIMAL cast of a computed double rounds differently across
    * engines near the scale quantum; floor-quantization does not). One
    * window + one hash-agg per series key.
    */
  def integral(df: DataFrame, key: Column, tsUs: Column, value: Column,
               tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    // explicit tie-break columns keep the trapezoid pairing deterministic
    // when a series carries equal timestamps (repo convention: exact sort
    // keys + explicit tie-breaks — tied-ts peer order is engine-arbitrary)
    val w = Window.partitionBy(key).orderBy(tsUs +: tieBreak: _*)
    val trap = (value + lag(value, 1).over(w)) / lit(2.0) *
      ((tsUs - lag(tsUs, 1).over(w)).cast("double") / lit(1000000.0))
    df.select(key.as("series_key"), floor(trap * lit(1000000.0)).as("__u"))
      .groupBy("series_key")
      .agg(
        // single-point series have no segments: integral 0, not null
        (coalesce(sum(col("__u")), lit(0L)).cast("double") / lit(1000000.0))
          .as("integral"),
        count(col("__u")).as("n_segments"))
  }

  /** Fixed-width value histogram per key: bin i covers
    * [lo + i*w, lo + (i+1)*w) with w = (hi-lo)/nBins; values below `lo` land
    * in bin -1, values >= `hi` in bin `nBins` (explicit overflow bins, so
    * the histogram partitions the data — nothing silently dropped). One
    * hash aggregate: the shuffle carries at most |keys|·(nBins+2) rows
    * regardless of input size. Bin arithmetic is a single IEEE divide +
    * floor, bit-identical cross-engine.
    */
  def fixedWidthHistogram(df: DataFrame, keys: Seq[Column], value: Column,
                          lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, "need nBins > 0 and hi > lo")
    val w = (hi - lo) / nBins
    // least() clamp: with a non-exactly-representable width, a value just
    // under `hi` can have (value-lo)/w round up to nBins — keep it in the
    // last REAL bin; the overflow bin is strictly for value >= hi
    val bin = when(value < lo, lit(-1L))
      .when(value >= hi, lit(nBins.toLong))
      .otherwise(least(floor((value - lit(lo)) / lit(w)).cast("long"), lit(nBins - 1L)))
    df.groupBy(keys :+ bin.as("bin"): _*)
      .agg(count(lit(1)).as("n"),
        min(value).as("bin_min"),
        max(value).as("bin_max"))
  }

  /** Top-k rows per group by a ranking column; deterministic via explicit
    * tie-breakers. Plans as one shuffle on the partition keys + in-partition
    * sort (no global sort).
    */
  def topKPerGroup(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    df.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }

  /** Scale-safe top-k per group for LOW-CARDINALITY group keys. A window
    * partitioned by a 5-value key runs on at most 5 tasks no matter how big
    * the cluster is — a structural parallelism ceiling. Instead: a partial
    * top-k per (group, salt) slice (parallelism = |groups|·nSalts), then the
    * exact final rank over the <= |groups|·nSalts·k surviving candidates.
    * The overall top-k of a group is always contained in the union of its
    * per-slice top-ks, so the result is identical to [[topKPerGroup]]
    * provided `orderBy` is a total order (use explicit tie-breakers) and
    * `saltExpr` is deterministic per row (content-derived, never
    * spark_partition_id/rand — those change under task retry).
    */
  def topKPerGroupSalted(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column],
                         k: Int, saltExpr: Column, nSalts: Int = 32): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val salt = pmod(saltExpr, lit(nSalts))
    val wPartial = Window.partitionBy(partitionBy :+ salt: _*).orderBy(orderBy: _*)
    val candidates = df.withColumn("__rk_partial", row_number().over(wPartial))
      .filter(col("__rk_partial") <= k).drop("__rk_partial")
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    candidates.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }
}
