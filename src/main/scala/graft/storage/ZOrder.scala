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

  /** Z-clustered write that KEEPS the z-value as column `zv` and builds a
    * per-file [min_zv, max_zv] [[StatsIndex]] at `statsPath` — the layout
    * [[readBox]] range queries prune against.
    */
  def writeIndexed(df: DataFrame, x: Column, y: Column, bits: Int, nFiles: Int,
                   path: String, statsPath: String): Unit = {
    require(nFiles > 0, "nFiles must be positive")
    val spark = df.sparkSession
    df.withColumn("zv", zvalue2(x, y, bits))
      .repartitionByRange(nFiles, col("zv"))
      .sortWithinPartitions("zv")
      .write.mode("overwrite").parquet(path)
    StatsIndex.write(StatsIndex.build(spark.read.parquet(path), Seq("zv")), statsPath)
  }

  /** Driver-side mirror of [[zvalue2]] for planning arithmetic. */
  def zvalue2Long(x: Long, y: Long, bits: Int): Long = {
    var z = 0L; var b = 0
    while (b < bits) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }

  /** Decompose the query rectangle [xLo,xHi] × [yLo,yHi] into at most
    * ~`maxRanges` INCLUSIVE z-value intervals covering the box — the
    * BIGMIN/LITMAX idea (Tropf & Herzog: on leaving the box, jump to the
    * next z-value inside it) computed up front as an interval set: a
    * quadtree cell aligned to the Morton curve owns one CONTIGUOUS z-range,
    * so recursively splitting cells that straddle the box edge yields
    * exactly the maximal in-box z-runs, and the gaps between the returned
    * intervals are exactly the out-of-box z-jumps BIGMIN would skip.
    *
    * Why it matters: a zv-only plan must scan the single interval
    * [z(xLo,yLo), z(xHi,yHi)], which for a box straddling a high-bit
    * boundary covers nearly the whole curve; the decomposition prunes the
    * between-run files. Cells are coarsened (over-approximated, never
    * dropped) once the budget is reached, so the interval count — and
    * planning cost — stays bounded regardless of box shape; the exact
    * predicate on top keeps the result precise.
    */
  def zRanges(xLo: Long, xHi: Long, yLo: Long, yHi: Long, bits: Int,
              maxRanges: Int = 64): Seq[(Long, Long)] = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val max = (1L << bits) - 1
    require(0 <= xLo && xLo <= xHi && xHi <= max, s"x range [$xLo,$xHi] outside [0,$max]")
    require(0 <= yLo && yLo <= yHi && yHi <= max, s"y range [$yLo,$yHi] outside [0,$max]")
    require(maxRanges >= 1, "maxRanges must be >= 1")
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val queue = scala.collection.mutable.Queue[(Long, Long, Int)]((0L, 0L, bits))
    while (queue.nonEmpty) {
      val (cx, cy, lvl) = queue.dequeue()
      val side = 1L << lvl
      val (x1, y1) = (cx + side - 1, cy + side - 1)
      val disjoint = cx > xHi || x1 < xLo || cy > yHi || y1 < yLo
      if (!disjoint) {
        val base = zvalue2Long(cx, cy, bits)
        val span = (1L << (2 * lvl)) - 1
        val inside = cx >= xLo && x1 <= xHi && cy >= yLo && y1 <= yHi
        if (inside || lvl == 0) out += ((base, base + span))
        else if (out.size + queue.size >= maxRanges) out += ((base, base + span)) // coarsen, stay bounded
        else {
          val h = side >> 1
          queue += ((cx, cy, lvl - 1)); queue += ((cx + h, cy, lvl - 1))
          queue += ((cx, cy + h, lvl - 1)); queue += ((cx + h, cy + h, lvl - 1))
        }
      }
    }
    // merge touching/overlapping runs so downstream pruning sees maximal intervals
    val merged = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    out.sortBy(_._1).foreach { case (lo, hi) =>
      if (merged.nonEmpty && lo <= merged.last._2 + 1)
        merged(merged.size - 1) = (merged.last._1, math.max(merged.last._2, hi))
      else merged += ((lo, hi))
    }
    merged.toSeq
  }

  /** Rectangle query over a [[writeIndexed]] layout with z-interval file
    * skipping: prune to files whose [min_zv, max_zv] intersects ANY
    * decomposed z-run, then apply the exact box predicate (the interval set
    * is a superset filter, never a substitute). Empty candidates return an
    * empty frame with the table schema.
    */
  def readBox(spark: org.apache.spark.sql.SparkSession, statsPath: String, tablePath: String,
              xName: String, yName: String, xLo: Long, xHi: Long, yLo: Long, yHi: Long,
              bits: Int, maxRanges: Int = 64): DataFrame = {
    val ranges = zRanges(xLo, xHi, yLo, yHi, bits, maxRanges)
    val files = candidateFilesForRanges(StatsIndex.read(spark, statsPath), ranges)
    val exact = col(xName).between(xLo, xHi) && col(yName).between(yLo, yHi)
    if (files.isEmpty) spark.read.parquet(tablePath).where(lit(false))
    else spark.read.option("basePath", tablePath).parquet(files: _*).filter(exact)
  }

  /** Files whose [min_zv, max_zv] intersects any of the inclusive runs. */
  def candidateFilesForRanges(stats: DataFrame, ranges: Seq[(Long, Long)]): Seq[String] = {
    if (ranges.isEmpty) return Seq.empty
    val pred = ranges.map { case (lo, hi) => col("max_zv") >= lo && col("min_zv") <= hi }
      .reduce(_ || _)
    stats.filter(pred).select("file").collect().map(_.getString(0)).toSeq
  }
}
