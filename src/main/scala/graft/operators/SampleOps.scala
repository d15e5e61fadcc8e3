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

  /** LEAKAGE-SAFE split: near-duplicate documents must share a split —
    * keying each document's split on its own id leaks eval content into
    * train through paraphrases and boilerplate copies (the classic
    * contamination path [[splitAssign]] alone cannot see). Every document
    * takes its near-dup CLUSTER REPRESENTATIVE as its split key (the min
    * id of its connected component over `pairs`; documents in no pair
    * represent themselves), so a whole cluster lands in one split.
    * `pairs` = (i, j) edges from any near-dup detector (SimHash, MinHash,
    * embedding cosine — all candidate-bounded).
    *
    * Scale posture: components run on the PAIR set (already banded/
    * bucketed, never all-pairs; O(log diameter) label rounds), then one
    * join back on id — documents without a near-dup never enter the
    * component computation. Emits the input plus `rep_id` and `split`.
    */
  def leakageSafeSplit(docs: DataFrame, id: Column, pairs: DataFrame,
                       trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val comp = graft.operators.DedupOps.connectedComponents(pairs)
      .select(col("node").as("__node"), col("component").as("__rep"))
    docs.join(comp, id === col("__node"), "left")
      .withColumn("rep_id", coalesce(col("__rep"), id.cast("long")))
      .drop("__node", "__rep")
      .withColumn("split", splitAssign(col("rep_id"), trainPct, valPct))
  }

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

  /** Data-mixing rates: given per-source integer weights and a global
    * token budget, the per-source keep rate (ppm) that hits each source's
    * budget share. INTEGER arithmetic end to end — `target = budget·w div
    * ΣW`, `rate = min(1e6, target·1e6 div sourceTokens)` — so the rates
    * are bit-identical on any engine (no double division anywhere). The
    * pretraining data-mixing step: upweight rare high-quality sources,
    * downsample the dominant crawl, deterministically.
    *
    * One aggregation over the corpus (per-source token totals), one tiny
    * weight-sum combine (broadcast single row), emits (source, weight,
    * total_tokens, target_tokens, rate_ppm). `budget·1e6` must fit a long:
    * budgets up to ~9·10^12 tokens — beyond that, pre-scale the weights.
    * `budget·weight` runs in decimal(38,0) so arbitrarily large long
    * weights never overflow the product (target ≤ budget always fits); a
    * source with zero tokens gets an EXPLICIT rate_ppm of 0 — the naive
    * `div`-by-zero null would be silently swallowed by null-skipping
    * `least()` into a keep-everything rate of 1e6.
    */
  def mixtureRates(docs: DataFrame, source: String, weight: Column,
                   nTokens: Column, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0 && budgetTokens <= Long.MaxValue / 1000000L,
      s"budget out of range: $budgetTokens")
    val totals = docs.groupBy(col(source).as("source"))
      .agg(max(weight).as("weight"), sum(nTokens).as("total_tokens"))
    val wSum = totals.agg(sum(col("weight")).as("__wsum"))
    totals.crossJoin(broadcast(wSum))
      .withColumn("target_tokens",
        expr(s"(cast(${budgetTokens} as decimal(38,0)) * weight) div __wsum"))
      .withColumn("rate_ppm",
        when(col("total_tokens") > 0,
          least(lit(1000000L), expr("(target_tokens * 1000000L) div total_tokens")))
          .otherwise(lit(0L)))
      .drop("__wsum")
  }

  /** The REPETITION face of data mixing — [[mixtureRates]] without the
    * keep-all cap: a rare high-weight source whose budget share exceeds
    * its size repeats (pretraining's "N epochs of Wikipedia" idiom). Per
    * source: `epochs = target div total` full passes plus a deterministic
    * hash-Bernoulli tail of `tail_rate_ppm = (target mod total)·1e6 div
    * total`. Same integer arithmetic end to end as mixtureRates, so the
    * plan is oracle-exact; a zero-token source gets explicit zeros.
    * Emits (source, weight, total_tokens, target_tokens, epochs,
    * tail_rate_ppm). Overflow bounds: `target ≤ budget ≤ 9.2e12` (the
    * mixtureRates require), so `remainder·1e6 < budget·1e6` fits a long.
    */
  def mixtureEpochRates(docs: DataFrame, source: String, weight: Column,
                        nTokens: Column, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0 && budgetTokens <= Long.MaxValue / 1000000L,
      s"budget out of range: $budgetTokens")
    val totals = docs.groupBy(col(source).as("source"))
      .agg(max(weight).as("weight"), sum(nTokens).as("total_tokens"))
    val wSum = totals.agg(sum(col("weight")).as("__wsum"))
    totals.crossJoin(broadcast(wSum))
      .withColumn("target_tokens",
        expr(s"(cast(${budgetTokens} as decimal(38,0)) * weight) div __wsum"))
      .withColumn("epochs",
        when(col("total_tokens") > 0, expr("target_tokens div total_tokens"))
          .otherwise(lit(0L)))
      .withColumn("tail_rate_ppm",
        when(col("total_tokens") > 0,
          expr("((target_tokens - epochs * total_tokens) * 1000000L) div total_tokens"))
          .otherwise(lit(0L)))
      .drop("__wsum")
  }

  /** Apply [[mixtureEpochRates]]: replicate each document `epochs` times
    * plus one more iff its id hash falls under the source's tail rate,
    * tagging each copy with a 0-based `epoch` — the materialized
    * oversampled mix (feed `epoch` into [[deterministicShuffle]]'s seed
    * so each pass gets its own order). Explode of a per-row integer
    * sequence: map-side only after the broadcast rate join, no shuffle,
    * output rows ∝ the token budget — exactly the blow-up the caller
    * asked for. A document whose source keeps 0 copies disappears (an
    * empty sequence explodes to nothing).
    */
  def mixtureOversample(docs: DataFrame, source: String, weight: Column,
                        id: Column, nTokens: Column, budgetTokens: Long): DataFrame = {
    val rates = mixtureEpochRates(docs, source, weight, nTokens, budgetTokens)
      .select(col("source").as("__src"), col("epochs"), col("tail_rate_ppm"))
    docs.join(broadcast(rates), docs(source) === col("__src"))
      .drop("__src")
      .withColumn("__copies",
        col("epochs") + (hashBucket(id, 1000000) < col("tail_rate_ppm")).cast("long"))
      .withColumn("epoch", explode(
        when(col("__copies") > 0, sequence(lit(0L), col("__copies") - 1))
          .otherwise(array().cast("array<bigint>"))))
      .drop("__copies", "epochs", "tail_rate_ppm")
  }

  /** Apply [[mixtureRates]]: keep each document iff its id hash falls under
    * its source's rate — stable under retries and corpus growth like every
    * sampler here. Emits the input plus `rate_ppm`.
    */
  def mixtureSample(docs: DataFrame, source: String, weight: Column,
                    id: Column, nTokens: Column, budgetTokens: Long): DataFrame = {
    val rates = mixtureRates(docs, source, weight, nTokens, budgetTokens)
      .select(col("source").as("__src"), col("rate_ppm"))
    docs.join(broadcast(rates), docs(source) === col("__src"))
      .drop("__src")
      .filter(hashBucket(id, 1000000) < col("rate_ppm"))
  }

  /** Deterministic global training-order shuffle: every row gets a `shard`
    * in [0, nShards) and a 0-based `pos` within its shard, both pure
    * functions of (seed, id) — the reproducible equivalent of "shuffle the
    * corpus and cut it into N files" that every pretraining run performs
    * per epoch. Same seed + same corpus = identical order on any engine or
    * retry; a new seed (next epoch) is a fresh permutation; appended
    * documents interleave into the order without perturbing existing
    * rows' relative order (their hashes don't change) — so a grown corpus
    * reuses shard prefixes instead of invalidating them.
    *
    * Scale posture: one shuffle on `shard` plus a per-shard sort.
    * Parallelism = nShards, which IS the output-file count a training run
    * writes — pick nShards like you pick file counts (thousands at
    * 100 TB), and the per-shard window never collapses the job. The
    * layout is exactly the `repartition(shard) + sortWithinPartitions`
    * a shard writer materializes; `pos` is the row's final offset in its
    * shard file. Emits the input plus `shard` and `pos`.
    */
  def deterministicShuffle(df: DataFrame, id: Column, seed: String,
                           nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val w = Window.partitionBy(pmod(col("__h"), lit(nShards.toLong)))
      .orderBy(col("__h"), id)
    df.withColumn("__h", hash60(concat(lit(seed + "_"), id.cast("string"))))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__h")
  }

  /** Curriculum ordering: documents phase by quality QUARTILE (phase 0 =
    * the top quartile — train on the cleanest data first, the curriculum-
    * learning idiom) and shuffle deterministically WITHIN each phase.
    * Global training order = (phase, shard, pos).
    *
    * Scale posture: quartile thresholds come from ONE exact-percentile
    * aggregation broadcast back (Spark `percentile` == DuckDB
    * `quantile_cont` bit-for-bit), phase assignment is map-side, and the
    * position window partitions by (phase, shard) — never an unpartitioned
    * global sort. Emits the input plus `phase`, `shard`, `pos`.
    */
  def curriculumOrder(df: DataFrame, id: Column, score: Column, seed: String,
                      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val th = df.agg(
      percentile(score, lit(0.25)).as("__t25"),
      percentile(score, lit(0.5)).as("__t50"),
      percentile(score, lit(0.75)).as("__t75"))
    val w = Window.partitionBy(col("phase"), col("shard"))
      .orderBy(col("__h"), id)
    df.crossJoin(broadcast(th))
      .withColumn("phase",
        when(score >= col("__t75"), 0L)
          .when(score >= col("__t50"), 1L)
          .when(score >= col("__t25"), 2L)
          .otherwise(3L))
      .withColumn("__h", hash60(concat(lit(seed + "_"), id.cast("string"))))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__t25", "__t50", "__t75", "__h")
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
