package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextOps.hash60

/** Dataset-assembly operators for training-data pipelines: deterministic
  * splitting, rate sampling, and token-budget sequence packing.
  *
  * Sampling/splitting is HASH-based, never `rand()`: the assignment of a
  * document to train/val/test (or into a sampled subset) is a pure function
  * of its id, so it is stable across runs, retries, and engines (md5-derived
  * — oracle-checkable), and adding documents never reshuffles existing
  * assignments. This is how production pipelines keep eval sets
  * uncontaminated under dataset growth.
  */
object SampleOps {

  /** Uniform bucket in [0, buckets) from the md5-derived id hash. */
  def hashBucket(id: Column, buckets: Int): Column =
    pmod(hash60(id.cast("string")), lit(buckets.toLong))

  /** Deterministic train/val/test assignment by hash bucket percentage:
    * [0, trainPct) -> train, [trainPct, trainPct+valPct) -> val, rest test.
    */
  def splitAssign(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = hashBucket(id, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Keep a deterministic ~`rate` fraction of rows (hash Bernoulli over
    * 1e6 buckets — resolution 1e-6).
    */
  def sampleByRate(id: Column, rate: Double): Column =
    hashBucket(id, 1000000) < (rate * 1000000).toLong

  /** Per-group quota sampling: keep at most `k` rows per group, chosen by
    * deterministic hash order over `id` (so the kept set is a stable,
    * uniform sample — not "whatever sorted first" — and survives retries
    * and dataset growth). The domain-quota idiom: cap any one domain/source
    * from dominating a training mix.
    *
    * Group keys are typically LOW cardinality (a handful of sources), so
    * this routes through the salted two-stage top-k — parallelism stays
    * |groups|·nSalts instead of collapsing to |groups| tasks.
    * Emits the input plus `rk` (1-based keep rank within the group).
    */
  def quotaPerGroup(df: DataFrame, group: Column, id: Column, k: Int): DataFrame =
    graft.operators.TimeSeriesOps.topKPerGroupSalted(
      df, Seq(group), Seq(hash60(id.cast("string")).asc, id.asc), k,
      saltExpr = hash60(concat(lit("qsalt_"), id.cast("string"))))

  /** Stratified deterministic sampling: per-stratum keep rates (e.g. keep
    * 100% of rare languages, 10% of English). Unlisted strata fall back to
    * `defaultRate`. Pure hash predicate — map-only at any scale.
    */
  def stratifiedSample(stratum: Column, id: Column,
                       rates: Map[String, Double], defaultRate: Double): Column = {
    val base = sampleByRate(id, defaultRate)
    rates.foldLeft(when(lit(false), lit(false))) { case (acc, (s, r)) =>
      acc.when(stratum === s, sampleByRate(id, r))
    }.otherwise(base)
  }

  /** Token-budget sequence packing within each `group`: documents are laid
    * out in `order`, and a document starts a new chunk when the running
    * token total before it has crossed the budget (streaming concat-and-cut
    * packing). Per-group windows keep this scale-safe — packing is done per
    * shard/source, never as one global ordered pass.
    * Emits the input plus `chunk` (0-based per group).
    */
  def packChunks(df: DataFrame, group: Column, order: Column,
                 nTokens: Column, budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(group).orderBy(order)
    val before = coalesce(
      sum(nTokens).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    // integer div, not floor(double /): a running total near 2^53 would
    // make the double quotient inexact and could flip a chunk boundary
    df.withColumn("__before", before)
      .withColumn("chunk", expr(s"__before div ${budget}L"))
      .drop("__before")
  }
}
