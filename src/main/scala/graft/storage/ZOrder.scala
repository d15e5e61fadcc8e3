package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two dimension keys so
  * that sorting by the combined value keeps BOTH dimensions locally bounded
  * in every file — the Delta OPTIMIZE ZORDER idea.
  *
  * Why it matters at 100 TB: a layout sorted linearly by `x` gives tight
  * per-file min/max on `x` but useless ranges on `y` (every file spans the
  * whole `y` domain), so a `y`-selective query scans everything. Sorted by
  * z-value, each file covers a tile of the (x, y) grid: min/max stay tight
  * on both columns and [[StatsIndex]] (or parquet row-group stats) can skip
  * files for range predicates on either dimension.
  *
  * The z-value is plain integer arithmetic (shift/mask/sum), so it is
  * codegen'd, shuffle-free, and bit-identical in any engine — oracle-checkable.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two NON-NEGATIVE integer
    * columns: bit b of `x` lands at position 2b, bit b of `y` at 2b+1.
    * Callers scale/clamp their dimensions into [0, 2^bits) first.
    */
  def zvalue2(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { b =>
      shiftright(x, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)) +
        shiftright(y, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)
  }

  /** The DuckDB-side mirror of [[zvalue2]] for oracle SQL: same shift/mask
    * tree over column expressions `x` and `y` (pre-parenthesized).
    */
  def zvalue2Sql(x: String, y: String, bits: Int): String =
    (0 until bits).map { b =>
      s"((($x) >> $b) & 1) * ${1L << (2 * b)} + ((($y) >> $b) & 1) * ${1L << (2 * b + 1)}"
    }.mkString(" + ")

  /** Write `df` z-clustered on (x, y): range-partition by z-value into
    * `nFiles` contiguous z-ranges (= spatial tiles) and sort within each.
    * Pair with [[StatsIndex.build]] on both dimension columns to get
    * file skipping on either dimension.
    */
  def write(df: DataFrame, x: Column, y: Column, bits: Int, nFiles: Int, path: String): Unit = {
    require(nFiles > 0, "nFiles must be positive")
    df.withColumn("__z", zvalue2(x, y, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
