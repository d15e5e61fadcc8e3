package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextOps.hash60

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * every raw document by how much more likely its hashed n-gram features are
  * under a TARGET distribution (the high-quality corpus you want more of)
  * than under the RAW distribution, then resample toward the target with
  * Gumbel-top-k.
  *
  * Determinism discipline (the engine-wide rules): features hash through the
  * md5-derived [[TextOps.hash60]]; the per-BUCKET log importance is
  * quantized ONCE (`floor(x * 1e7)` over a fixed IEEE expression tree whose
  * `ln` calls are bit-stable cross-engine — the q_lm_perplexity precedent),
  * so the per-DOCUMENT weight is an order-independent int64 sum; and the
  * Gumbel noise is the inverse-CDF transform of a hash-uniform (never
  * `rand()`), so resampling is reproducible across runs, retries, and
  * engines.
  *
  * Scale posture: the bucket-statistics table is at most `buckets` rows
  * (broadcast), built in ONE corpus pass that aggregates raw and target
  * counts together; scoring is a second pass — explode features, broadcast
  * join, per-doc sum on the high-cardinality doc key. Nothing shuffles the
  * corpus on a low-cardinality key, and the top-k resample is
  * orderBy+limit (TakeOrderedAndProject: per-partition heaps + a driver
  * merge of k rows, never a global sort).
  */
object ImportanceOps {

  /** Hashed n-gram feature buckets of a document: word unigrams + bigrams
    * (with multiplicity — DSIR's bag-of-hashed-ngrams), each mapped to
    * `hash60(gram) % buckets`. Map-only, codegen'd; no UDF.
    */
  def featureBuckets(text: Column, buckets: Int): Column = {
    val toks = TextOps.tokens(text)
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(2)))))
      .otherwise(array().cast("array<string>"))
    transform(concat(toks, bigrams), f => pmod(hash60(f), lit(buckets.toLong)))
  }

  /** Per-bucket quantized log importance: for each feature bucket `b`,
    * `lw_q[b] = floor(1e7 * (ln p_target(b) - ln p_raw(b)))` with add-1
    * smoothed bucket unigram models (`p(b) = (count(b)+1)/(total+buckets)`).
    * `isTarget` marks the rows that define the target distribution; the raw
    * distribution is the whole input. One corpus pass computes both counts;
    * output is <= `buckets` rows: (bk, cr, ct, lw_q).
    */
  def dsirBucketWeights(docs: DataFrame, text: String, isTarget: Column,
                        buckets: Int): DataFrame = {
    // per-token md5 is CPU-dense: spread a few-split corpus across the
    // session's slots first (no-op on a many-split real table)
    val f = SkewOps.spreadSmall(docs).select(isTarget.as("__t"),
      explode(featureBuckets(col(text), buckets)).as("bk"))
    // persist the <= `buckets`-row stats table: without it the corpus
    // explode under `counts` re-runs for the totals agg AND the crossJoin
    // left side — three corpus passes instead of the one this pass owes.
    // Bounded by construction, so caching is safe at any corpus size.
    val counts = f.groupBy("bk").agg(
      count(lit(1)).as("cr"),
      sum(when(col("__t"), lit(1L)).otherwise(lit(0L))).as("ct")).persist()
    val totals = counts.agg(sum("cr").as("__tr"), sum("ct").as("__tt"))
    counts.crossJoin(broadcast(totals))
      .withColumn("lw_q",
        lwQ(col("ct"), col("cr"), col("__tt"), col("__tr"), buckets))
      .select(col("bk"), col("cr"), col("ct"), col("lw_q"))
  }

  /** The quantized per-bucket log-importance expression — ONE fixed IEEE
    * tree shared by the one-shot, dense-index, and oracle paths.
    *
    * The ratio == 1 case (cross products equal) is answered EXACTLY as 0:
    * it is the one input whose true log-ratio (0) sits exactly ON a
    * quantization boundary — `ln r` is irrational for every other rational
    * r, so no other input can — and there the engines' libm `ln`s straddle
    * it by 1 ulp (Spark = StrictMath, DuckDB = platform libm), flipping
    * `floor` between 0 and −1. Found by the GRAFT_DIFF_SCALE=5 net, seed
    * 34: ct=2 cr=3 tt=71 tr=116 B=64 gives ln(3·180/(135·4)) = ln 1.
    * Cross products ride decimal(38,0) so 100 TB-scale totals never
    * overflow the comparison.
    */
  private def lwQ(ct: Column, cr: Column, tt: Column, tr: Column,
                  buckets: Int): Column = {
    val b = lit(buckets.toDouble)
    val bL = lit(buckets.toLong)
    val ratioOne =
      (ct + lit(1L)).cast("decimal(38,0)") * (tr + bL).cast("decimal(38,0)") ===
        (cr + lit(1L)).cast("decimal(38,0)") * (tt + bL).cast("decimal(38,0)")
    when(ratioOne, lit(0L)).otherwise(floor((
      (log(ct.cast("double") + lit(1.0)) - log(tt.cast("double") + b)) -
        (log(cr.cast("double") + lit(1.0)) - log(tr.cast("double") + b))
      ) * lit(1e7)).cast("long"))
  }

  /** Persist the DSIR bucket model once as a DENSE (bk, lw_q) TxLogTable
    * covering every bucket id in [0, buckets) — buckets unseen in the raw
    * corpus carry the add-1-smoothed default weight, so a probe batch with
    * novel features still joins totally. The build-once / probe-per-batch
    * split of [[dsirWeights]] (the persisted-index pattern the MinHash /
    * IVF / PQ families use): the corpus is scanned at BUILD time only.
    */
  def buildDsirIndex(docs: DataFrame, text: String, isTarget: Column,
                     buckets: Int, path: String): Unit = {
    val spark = docs.sparkSession
    val f = SkewOps.spreadSmall(docs).select(isTarget.as("__t"),
      explode(featureBuckets(col(text), buckets)).as("bk"))
    val counts = f.groupBy("bk").agg(
      count(lit(1)).as("cr"),
      sum(when(col("__t"), lit(1L)).otherwise(lit(0L))).as("ct")).persist()
    val totals = counts.agg(sum("cr").as("__tr"), sum("ct").as("__tt"))
    val dense = spark.range(buckets).select(col("id").as("bk"))
      .join(counts, Seq("bk"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bk"), lwQ(coalesce(col("ct"), lit(0L)),
        coalesce(col("cr"), lit(0L)), col("__tt"), col("__tr"), buckets).as("lw_q"))
    // MERGE keyed on the bucket id, not append: a REBUILD replaces the
    // model (an appended second build would duplicate bk rows and the
    // probe's broadcast join would double-count every feature)
    new graft.storage.TxLogTable(spark, s"$path/buckets").merge(dense, Seq("bk"))
    counts.unpersist()
  }

  /** Score a NEW batch against a [[buildDsirIndex]] model: only the batch
    * explodes and hashes — the corpus is two table-read columns riding a
    * broadcast. Same output shape as [[dsirWeights]].
    */
  def dsirProbe(spark: org.apache.spark.sql.SparkSession, path: String,
                newDocs: DataFrame, id: String, text: String,
                buckets: Int): DataFrame = {
    val w = new graft.storage.TxLogTable(spark, s"$path/buckets").read()
    SkewOps.spreadSmall(newDocs)
      .select(col(id), explode(featureBuckets(col(text), buckets)).as("bk"))
      .join(broadcast(w), Seq("bk"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_features"), sum("lw_q").as("weight_q"))
  }

  /** Per-document importance weight: the int64 sum of its features' bucket
    * weights (occurrence-weighted — a bucket a doc hits three times counts
    * three times, the multinomial log-likelihood ratio). Emits
    * (id, n_features, weight_q); weight_q > 0 means "more target-like than
    * the raw corpus average".
    */
  def dsirWeights(docs: DataFrame, id: String, text: String, isTarget: Column,
                  buckets: Int): DataFrame = {
    // ONE explode+md5 feature pass (r18, guide §1.2): the exploded (id,
    // __t, bk) stream is persisted and feeds BOTH the bucket-count agg and
    // the scoring join — the former [[dsirBucketWeights]]-then-rescore
    // shape hashed the corpus twice. Same expressions, same rows, so the
    // scoring output is bit-identical (the bucket model covers every bk in
    // f by construction, so the inner join still keeps every occurrence).
    val f = SkewOps.spreadSmall(docs)
      .select(col(id), isTarget.as("__t"),
        explode(featureBuckets(col(text), buckets)).as("bk"))
      .persist()
    val counts = f.groupBy("bk").agg(
      count(lit(1)).as("cr"),
      sum(when(col("__t"), lit(1L)).otherwise(lit(0L))).as("ct")).persist()
    val totals = counts.agg(sum("cr").as("__tr"), sum("ct").as("__tt"))
    val w = counts.crossJoin(broadcast(totals))
      .withColumn("lw_q",
        lwQ(col("ct"), col("cr"), col("__tt"), col("__tr"), buckets))
      .select("bk", "lw_q")
    f.join(broadcast(w), Seq("bk"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_features"), sum("lw_q").as("weight_q"))
  }

  /** Deterministic Gumbel noise at the same 1e7 quantization as the
    * weights: `floor(1e7 * -ln(-ln(u)))` with `u = (hash60(seed_id) % 1e6
    * + 0.5) / 1e6` — the inverse-CDF Gumbel transform over a hash-uniform,
    * so `weight_q + gumbelQ` implements Gumbel-top-k sampling without
    * replacement proportional to `softmax(weight)`, reproducibly.
    */
  def gumbelQ(id: Column, seed: String): Column = {
    val u = (pmod(hash60(concat(lit(seed + "_"), id.cast("string"))),
      lit(1000000L)).cast("double") + lit(0.5)) / lit(1000000.0)
    floor(-log(-log(u)) * lit(1e7)).cast("long")
  }

  /** Gumbel-top-k importance resample over [[dsirWeights]] output: the k
    * rows with the largest perturbed weight, ties broken by id. A fresh
    * `seed` draws a fresh sample from the same importance distribution.
    */
  def dsirResample(weights: DataFrame, id: String, k: Int, seed: String): DataFrame =
    weights
      .withColumn("key_q", col("weight_q") + gumbelQ(col(id), seed))
      .orderBy(col("key_q").desc, col(id).asc)
      .limit(k)
}
