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
