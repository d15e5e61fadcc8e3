package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical analytics with cross-engine exactness: z-score outlier
  * detection per series and Pearson correlation between two aligned series.
  *
  * The discipline: every aggregate moment (n, Σx, Σx², Σxy) is accumulated
  * EXACTLY — decimal for sums of raw values, int64/decimal for sums of
  * quantized units — so the moments are order-independent; the final
  * statistic is then a fixed tree of IEEE ops (+,·,/,sqrt — all correctly
  * rounded) over those exact moments, hence bit-identical in any engine.
  * Double-summing moments directly would make the result depend on Spark's
  * partitioning; casting computed doubles to DECIMAL would round
  * differently across engines near the scale quantum. Quantize-then-
  * integer-sum avoids both.
  */
object StatsOps {

  /** Per-series z-score outlier summary: rows where |v - mean| > k·std,
    * with mean/std derived from exact decimal moments (sample variance,
    * clamped at 0 for constant series). One window shuffle on the series
    * key, then one hash-agg — no second scan.
    */
  def outlierStats(df: DataFrame, key: Column, value: Column, k: Double): DataFrame = {
    val w = Window.partitionBy(key)
    val n = count(value).over(w).cast("double")
    val sx = sum(value.cast("decimal(38,4)")).over(w).cast("double")
    // v·v of a raw metric has twice its decimal digits — still exact at scale 4
    val sxx = sum((value * value).cast("decimal(38,4)")).over(w).cast("double")
    val mean = sx / n
    val variance = (sxx - sx * sx / n) / (n - lit(1.0))
    val std = sqrt(greatest(variance, lit(0.0)))
    df.select(key.as("series_key"), value.as("__v"),
        mean.as("__mean"), std.as("__std"), n.as("__n"))
      .groupBy("series_key")
      .agg(
        count(col("__v")).as("n"),
        sum(when(abs(col("__v") - col("__mean")) > lit(k) * col("__std"), 1L)
          .otherwise(0L)).as("n_outliers"),
        first(col("__mean")).as("mean"),
        first(col("__std")).as("std"))
  }

  /** Pearson correlation between two pre-quantized integer series (`xu`,
    * `yu` — e.g. 1e-2 units of a metric), over rows where both are present.
    * Moments are exact (int64 sums routed through DECIMAL(38,0) so products
    * can't overflow); the correlation is one fixed double tree over them.
    */
  def pearsonUnits(df: DataFrame, xu: Column, yu: Column): DataFrame = {
    val both = df.filter(xu.isNotNull && yu.isNotNull)
      .select(xu.as("__x"), yu.as("__y"))
    val agg = both.agg(
      count(lit(1)).as("n"),
      sum(col("__x").cast("decimal(38,0)")).as("sx"),
      sum(col("__y").cast("decimal(38,0)")).as("sy"),
      // operand-FIRST casts: int64 × int64 overflows before a post-hoc cast
      // could save it (units near 2^32 wrap — or throw under ANSI); decimal
      // × decimal is exact and DuckDB's HUGEINT path matches bit-for-bit
      sum(col("__x").cast("decimal(38,0)") * col("__y").cast("decimal(38,0)")).as("sxy"),
      sum(col("__x").cast("decimal(38,0)") * col("__x").cast("decimal(38,0)")).as("sxx"),
      sum(col("__y").cast("decimal(38,0)") * col("__y").cast("decimal(38,0)")).as("syy"))
    val nd = col("n").cast("double")
    val (sx, sy) = (col("sx").cast("double"), col("sy").cast("double"))
    val (sxy, sxx, syy) = (col("sxy").cast("double"), col("sxx").cast("double"), col("syy").cast("double"))
    agg.select(col("n"),
      ((nd * sxy - sx * sy) /
        (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy))).as("corr"))
  }
}
