package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TimeSeriesOps

class TimeSeriesSpec extends SparkSuite {
  import spark.implicits._

  test("exponential moving average: truncated kernel, normalized over present history") {
    val df = Seq((1L, 0L, 1.0), (1L, 1L, 2.0), (1L, 2L, 4.0)).toDF("k", "ts", "v")
    val w = Window.partitionBy(col("k")).orderBy(col("ts"))
    val got = df.select(col("ts"),
        TimeSeriesOps.exponentialMovingAverage(col("v"), w, n = 4, depth = 10).as("ema"))
      .as[(Long, Double)].collect().toMap
    // a = 2/5 = 0.4; weights 0.4, 0.24, 0.144, ...
    assert(math.abs(got(0L) - 1.0) < 1e-12, "single point: ema == value")
    assert(math.abs(got(1L) - (0.4 * 2.0 + 0.24 * 1.0) / (0.4 + 0.24)) < 1e-12)
    assert(math.abs(got(2L) - (0.4 * 4.0 + 0.24 * 2.0 + 0.144 * 1.0) / (0.4 + 0.24 + 0.144)) < 1e-12)
    // more recent points weigh more: ema at t2 sits between last value and mean
    assert(got(2L) > (1.0 + 2.0 + 4.0) / 3 && got(2L) < 4.0)
  }

  test("chande momentum + kaufman efficiency: rolling diff sums, pinned edge semantics") {
    val df = Seq((1L, 0L, 1.0), (1L, 1L, 3.0), (1L, 2L, 2.0), (1L, 3L, 2.0), (1L, 4L, 5.0),
                 (2L, 0L, 2.0), (2L, 1L, 2.0), (2L, 2L, 2.0)).toDF("k", "ts", "v")
    val w = Window.partitionBy(col("k")).orderBy(col("ts"))
    val base = df.select(col("k"), col("ts"), floor(col("v") * lit(1000000.0)).as("vu"))
      .withColumn("du", col("vu") - lag(col("vu"), 1).over(w))
    val got = base.select(col("k"), col("ts"),
        TimeSeriesOps.chandeMomentumOscillator(col("vu"), col("du"), w, n = 2).as("cmo"),
        TimeSeriesOps.kaufmansEfficiencyRatio(col("vu"), col("du"), w, n = 2).as("ker"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]),
         Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(got((1L, 0L)) == (None, None), "no full window -> null")
    assert(got((1L, 1L)) == (None, None))
    // diffs +2, -1: U=2 D=1 -> 100*(2-1)/3; dir |2-1|=1 over vol 3
    assert(math.abs(got((1L, 2L))._1.get - 100.0 / 3) < 1e-9)
    assert(math.abs(got((1L, 2L))._2.get - 1.0 / 3) < 1e-12)
    // diffs -1, 0: U=0 D=1 -> -100; dir |2-3|=1 over vol 1
    assert(got((1L, 3L))._1.get == -100.0 && got((1L, 3L))._2.get == 1.0)
    // diffs 0, +3: all-up window -> +100; straight move -> KER 1
    assert(got((1L, 4L))._1.get == 100.0 && got((1L, 4L))._2.get == 1.0)
    // flat series: 0/0 pinned to 0.0 on both indicators
    assert(got((2L, 2L)) == (Some(0.0), Some(0.0)))
  }

  test("relative strength index: truncated Wilder kernel, flat window pins 50") {
    val df = Seq((1L, 0L, 1.0), (1L, 1L, 2.0), (1L, 2L, 1.5), (1L, 3L, 3.0),
                 (2L, 0L, 2.0), (2L, 1L, 2.0)).toDF("k", "ts", "v")
    val w = Window.partitionBy(col("k")).orderBy(col("ts"))
    val got = df.select(col("k"), col("ts"), floor(col("v") * lit(1000000.0)).as("vu"))
      .withColumn("du", col("vu") - lag(col("vu"), 1).over(w))
      .select(col("k"), col("ts"),
        TimeSeriesOps.relativeStrengthIndex(col("du"), w, n = 4, depth = 10).as("rsi"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(got((1L, 0L)).isEmpty, "series head has no diff evidence")
    assert(got((1L, 1L)).get == 100.0, "only gains -> 100")
    // Wilder weights (3/4)^j: G = 0.75*1, L = 1*0.5 -> 100*0.75/1.25
    assert(math.abs(got((1L, 2L)).get - 60.0) < 1e-9)
    // G = 1.5 + (9/16)*1, L = (3/4)*0.5 -> 100*2.0625/2.4375
    assert(math.abs(got((1L, 3L)).get - 100.0 * 2.0625 / 2.4375) < 1e-9)
    assert(got((2L, 1L)).get == 50.0, "flat window pins the neutral 50")
  }

  test("ema stages: each stage is the EMA of the re-quantized previous stage") {
    val df = Seq((1L, 0L, 1.0), (1L, 1L, 2.0), (1L, 2L, 4.0)).toDF("k", "ts", "v")
    val staged = TimeSeriesOps.emaStages(df, col("k"), col("ts"), col("v"),
      n = 4, depth = 10, stages = 3)
    val rows = staged.orderBy(col("ts")).collect()
    val e1 = rows.map(_.getAs[Double]("e1"))
    val e2 = rows.map(_.getAs[Double]("e2"))
    val e3 = rows.map(_.getAs[Double]("e3"))
    // stage 1 equals the plain EMA
    val w = Window.partitionBy(col("k")).orderBy(col("ts"))
    val plain = df.select(col("ts"),
        TimeSeriesOps.exponentialMovingAverage(col("v"), w, 4, 10).as("e"))
      .orderBy(col("ts")).collect().map(_.getDouble(1))
    assert(e1.sameElements(plain))
    // stage 2 equals the kernel applied to floor(e1*1e6) by hand
    val cs = TimeSeriesOps.emaCoefficients(4, 10)
    def kernel(us: Seq[Long], t: Int): Double = {
      val terms = (0 until math.min(t + 1, cs.length)).map(j => (cs(j) * us(t - j), cs(j)))
      terms.map(_._1).sum.toDouble / terms.map(_._2).sum.toDouble / 1e6
    }
    val u1 = e1.map(x => math.floor(x * 1e6).toLong)
    (0 to 2).foreach(t => assert(e2(t) == kernel(u1, t), s"e2 at $t"))
    val u2 = e2.map(x => math.floor(x * 1e6).toLong)
    (0 to 2).foreach(t => assert(e3(t) == kernel(u2, t), s"e3 at $t"))
  }

  test("outlier stats: z-score flags from exact moments, constant series safe") {
    import graft.operators.StatsOps
    val df = Seq((1L, 1.0), (1L, 1.0), (1L, 1.0), (1L, 100.0),
      (2L, 5.0), (2L, 5.0)).toDF("k", "v")
    val got = StatsOps.outlierStats(df, col("k"), col("v"), k = 1.0)
      .select("series_key", "n", "n_outliers")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((4L, 1L)), s"the 100.0 spike must flag: $got")
    assert(got(2L) == ((2L, 0L)), "constant series: std 0, nothing flags, no NaN")
  }

  test("pearson: exact moments give corr 1 / -1 on linear series, nulls drop") {
    import graft.operators.StatsOps
    val pos = Seq((Some(1L), Some(2L)), (Some(2L), Some(4L)), (Some(3L), Some(6L)),
      (None, Some(9L))).toDF("xu", "yu")
    val (n, c) = StatsOps.pearsonUnits(pos, col("xu"), col("yu"))
      .as[(Long, Double)].head()
    assert(n == 3L && math.abs(c - 1.0) < 1e-12, s"n=$n corr=$c")
    val neg = Seq((1L, 30L), (2L, 20L), (3L, 10L)).toDF("xu", "yu")
    val (_, cn) = StatsOps.pearsonUnits(neg, col("xu"), col("yu"))
      .as[(Long, Double)].head()
    assert(math.abs(cn + 1.0) < 1e-12, s"corr=$cn")
  }

  test("pearson: units near 2^32 do not overflow the moment products (ANSI-strict)") {
    import graft.operators.StatsOps
    // x*y of these exceeds int64 (2^33 * 2^33 = 2^66): the operand-first
    // decimal cast must make the multiply exact instead of wrapping (or
    // throwing under ANSI). Linear series -> corr exactly 1.
    val big = (1L to 4L).map(i => (i * (1L << 33), i * (1L << 33) * 3)).toDF("xu", "yu")
    withSQLConf("spark.sql.ansi.enabled" -> "true") {
      val (n, c) = StatsOps.pearsonUnits(big, col("xu"), col("yu"))
        .as[(Long, Double)].head()
      assert(n == 4L && math.abs(c - 1.0) < 1e-12, s"n=$n corr=$c")
    }
  }

  test("holt forecast: level + h*trend from the EMA kernels, single-point series trend 0") {
    val df = Seq((1L, 0L, 1L, 1.0), (1L, 1L, 2L, 2.0), (1L, 2L, 3L, 4.0), (2L, 0L, 4L, 7.0))
      .toDF("k", "ts", "id", "v")
    val got = TimeSeriesOps.holtForecast(df, col("k"), col("ts"), col("v"),
      n = 4, depth = 10, horizons = Seq(1, 2), tieBreak = Seq(col("id")))
      .select("series_key", "h", "forecast").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val cs = TimeSeriesOps.emaCoefficients(4, 10).map(_.toDouble)
    // level: kernel over values (4, 2, 1); trend: kernel over diffs (2, 1)
    val level = (cs(0) * 4e6 + cs(1) * 2e6 + cs(2) * 1e6) / (cs(0) + cs(1) + cs(2)) / 1e6
    val trend = (cs(0) * 2e6 + cs(1) * 1e6) / (cs(0) + cs(1)) / 1e6
    assert(math.abs(got((1L, 1L)) - (level + trend)) < 1e-9)
    assert(math.abs(got((1L, 2L)) - (level + 2 * trend)) < 1e-9)
    // single point: no diffs -> trend 0 (never NaN), forecast stays flat
    assert(got((2L, 1L)) == 7.0 && got((2L, 2L)) == 7.0)
  }

  test("gap fill linear: empty buckets interpolate between neighbors, edges stay null") {
    // series 1: observations in buckets 1 (sum 2.0) and 4 (sum 8.0) of [0, 6)
    // with step 10us -> buckets 2,3 interpolate 4.0, 6.0; 0 and 5 stay null
    val df = Seq((1L, 15L, 2.0), (1L, 45L, 8.0)).toDF("k", "ts", "v")
    val got = TimeSeriesOps.gapFillLinear(df, col("k"), col("ts"), col("v"),
        fromUs = 0L, untilUs = 60L, stepUs = 10L)
      .select(col("bucket"), col("filled_sum"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got(0L).isEmpty && got(5L).isEmpty, "nothing to interpolate toward at the edges")
    assert(got(1L).contains(2.0) && got(4L).contains(8.0), "observed buckets pass through")
    assert(got(2L).contains(4.0) && got(3L).contains(6.0), "gap takes the straight line")
    // multi-bucket series with a single observation: nothing fills
    val single = TimeSeriesOps.gapFillLinear(
        Seq((7L, 25L, 3.0)).toDF("k", "ts", "v"),
        col("k"), col("ts"), col("v"), fromUs = 0L, untilUs = 60L, stepUs = 10L)
      .select(col("bucket"), col("filled_sum"))
      .as[(Long, Option[Double])].collect().toMap
    assert(single(2L).contains(3.0) && (0L to 5L).filterNot(_ == 2L).forall(single(_).isEmpty))
  }

  test("gap fill skeleton: Long-safe bucket count, capped fail-fast") {
    val df = Seq((1L, 15L, 2.0)).toDF("k", "ts", "v")
    // a range/step pair whose bucket count overflows Int must fail loudly
    // (the old .toInt silently truncated to a wrong — even empty — skeleton)
    val e = intercept[IllegalArgumentException] {
      TimeSeriesOps.gapFillLocf(df, col("k"), col("ts"), col("v"),
        fromUs = 0L, untilUs = Long.MaxValue / 2, stepUs = 1L)
    }
    assert(e.getMessage.contains("max-select-buckets"))
    val e2 = intercept[IllegalArgumentException] {
      TimeSeriesOps.gapFillLinear(df, col("k"), col("ts"), col("v"),
        fromUs = 0L, untilUs = (TimeSeriesOps.MaxFillBuckets + 1) * 10L, stepUs = 10L)
    }
    assert(e2.getMessage.contains("max-select-buckets"))
  }

  test("integral: trapezoid area per series, first point contributes no segment") {
    val df = Seq((7L, 0L, 1.0), (7L, 1000000L, 3.0), (7L, 3000000L, 5.0),
      (8L, 0L, 2.0)).toDF("k", "ts_us", "v")
    val got = TimeSeriesOps.integral(df, col("k"), col("ts_us"), col("v"))
      .as[(Long, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(7L) == ((2.0 + 8.0, 2L)))        // (3+1)/2*1s + (5+3)/2*2s
    assert(got(8L) == ((0.0, 0L)))              // single point: empty sum
  }
}
