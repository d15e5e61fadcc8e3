package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextOps.hash60

/** Count-min sketch (Cormode & Muthukrishnan 2005): approximate frequency
  * estimation over an unbounded key space in bounded memory — the 100 TB
  * tool for "roughly how often does each of these tokens/users/urls occur"
  * without a full-cardinality groupBy.
  *
  * Spark-first formulation: the sketch GRID is a plain aggregation —
  * explode each row into its `depth` (row, bucket) cells and hash-agg
  * counts. Map-side partial aggregation bounds the shuffle at depth×width
  * cells per task regardless of input size, which is exactly the CMS
  * memory bound; elementwise cell addition is the sketch merge, and
  * groupBy IS that merge, so no custom UDAF is needed (and the plan stays
  * whole-stage codegen). Hash rows are md5-derived (`hash60("cms{r}_" +
  * key)`), so the whole structure is deterministic and oracle-checkable —
  * unusual for a sketch, standard for this engine.
  *
  * Estimates never undercount (each cell counts a superset of any one
  * key's occurrences); overcounts are bounded by collisions: est <= true +
  * 2N/width with probability 1 − 2^−depth per probe.
  */
object SketchOps {

  /** The d×w cell grid of `key`'s frequency sketch: (r, b, cnt), at most
    * depth·width rows. Omitted cells are zero.
    */
  /** The cell address of `key` in hash row `r` — ONE definition shared by
    * the build and probe sides: the CMS never-undercount guarantee holds
    * only if both address cells identically.
    */
  private def cellOf(key: Column, r: Column, width: Int): Column =
    pmod(hash60(concat(lit("cms"), r.cast("string"), lit("_"),
      key.cast("string"))), lit(width.toLong))

  def cmsCells(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad cms dims: $depth x $width")
    val rows = array((0 until depth).map(lit): _*)
    df.select(key.cast("string").as("__k"), explode(rows).as("r"))
      .select(col("r"), cellOf(col("__k"), col("r"), width).as("b"))
      .groupBy("r", "b").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for a set of probe keys against a [[cmsCells]] grid:
    * min over the key's `depth` cells (absent cell = 0). The grid side is
    * <= depth·width rows — broadcast; probes stay distributed, so
    * estimating millions of candidate keys is one map-side pass + a
    * per-key min.
    */
  def cmsEstimate(cells: DataFrame, probes: DataFrame, key: String,
                  depth: Int, width: Int): DataFrame = {
    val rows = array((0 until depth).map(lit): _*)
    probes.select(col(key), explode(rows).as("r"))
      .select(col(key), col("r"), cellOf(col(key), col("r"), width).as("b"))
      .join(broadcast(cells), Seq("r", "b"), "left")
      .groupBy(col(key))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
