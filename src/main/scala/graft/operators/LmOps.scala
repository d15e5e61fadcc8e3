package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet-style pipeline stage
  * that ranks documents by how "natural" their text is under a small LM
  * trained on the corpus itself (Wenzek et al., "CCNet: Extracting High
  * Quality Monolingual Datasets from Web Crawl Data", 2020 — their KenLM
  * perplexity bucket step; reference scope: the repo under study stores
  * raw feeds only, so this is part of the engine's training-data extension
  * surface, not a reference port).
  *
  * The model is a bigram add-one LM over a capped vocabulary:
  *
  *   P(w' | w) = (C(w, w') + 1) / (C(w) + V)
  *
  * where C(w) counts w as a bigram CONTEXT (so the distribution sums to 1
  * over the V types), the vocabulary is the top-K tokens by corpus count
  * (count desc, token asc — the deterministic tie-break every ranking here
  * uses) and everything else maps to `<unk>`, V = |vocab| + 1.
  *
  * Determinism: counts are exact integers; each bigram contributes
  * `floor((ln(C2+1) - ln(C1+V)) * 1e7)` as an int64, so the per-document
  * sum is order-independent and the average converts to double ONCE —
  * bit-identical in any engine with the same libm ln (the q_math_funcs
  * precedent). Perplexity is one final IEEE exp.
  *
  * Scale (100 TB corpus):
  *   - vocabulary: one hash-agg on token (map-side combined) + global
  *     top-K via orderBy().limit(K) — TakeOrderedAndProject, a bounded
  *     per-partition heap, never a global sort;
  *   - model: context/pair counts aggregate over at most (K+1)² keys —
  *     a tiny shuffle regardless of corpus size — and both tables
  *     broadcast to the scoring pass;
  *   - scoring: map-only (explode + broadcast joins) followed by ONE
  *     doc-keyed aggregation with map-side partials. Nothing in the plan
  *     grows with corpus size except the map-side passes themselves.
  */
object LmOps {

  /** (doc, prev, cur) bigram stream of the whitespace tokens. Built
    * array-side (`slice` + `arrays_zip`) so a one-token document yields
    * zero rows without a `sequence()` guard, then exploded ONCE.
    */
  def bigrams(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = TextOps.tokens(col(text))
    docs.select(col(id).as("doc_id"),
        explode(arrays_zip(
          slice(toks, lit(1), size(toks) - 1).as("prev_raw"),
          slice(toks, lit(2), size(toks) - 1).as("cur_raw"))).as("bg"))
      .select(col("doc_id"), col("bg.prev_raw"), col("bg.cur_raw"))
  }

  /** Top-`k` corpus vocabulary by (count desc, token asc): one column
    * `tok`. TakeOrderedAndProject — bounded heap per partition.
    */
  def vocabulary(docs: DataFrame, text: String, k: Int): DataFrame =
    docs.select(explode(TextOps.tokens(col(text))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc).limit(k)
      .select("tok")

  /** Bigram stream with both components vocab-mapped (OOV → `<unk>`):
    * (doc_id, prev, cur). Two broadcast left joins — map-only.
    */
  def mappedBigrams(docs: DataFrame, id: String, text: String,
                    vocab: DataFrame): DataFrame =
    bigrams(docs, id, text)
      .join(broadcast(vocab.select(col("tok").as("__vp"))),
        col("prev_raw") === col("__vp"), "left")
      .join(broadcast(vocab.select(col("tok").as("__vc"))),
        col("cur_raw") === col("__vc"), "left")
      .select(col("doc_id"),
        coalesce(col("__vp"), lit("<unk>")).as("prev"),
        coalesce(col("__vc"), lit("<unk>")).as("cur"))

  /** Score every document by its average bigram log-probability under the
    * corpus-trained model: (doc_id, n_bigrams, avg_logprob, perplexity).
    * Documents with fewer than two tokens emit no row (no evidence).
    *
    * The left model joins keep the operator correct when `mapped` comes
    * from a DIFFERENT corpus than the model (incremental scoring): an
    * unseen bigram backs off to its context count, an unseen context to 0.
    */
  def scoreAgainst(mapped: DataFrame, ctx: DataFrame, pairs: DataFrame,
                   vTypes: Long): DataFrame =
    mapped
      .join(broadcast(pairs), Seq("prev", "cur"), "left")
      .join(broadcast(ctx), Seq("prev"), "left")
      // probability == 1 (c2+1 == c1+V) answers EXACTLY 0 without touching
      // ln — the one input whose true log sits on a quantization boundary,
      // where StrictMath and libm straddle it by 1 ulp (the
      // ImportanceOps.lwQ landmine, same fix). Here c2 <= c1 always (pairs
      // partition their context's count), so with V >= 2 the branch is
      // purely defensive; it becomes reachable in the degenerate
      // empty-vocabulary case (c1 = c2 = 0, V = 1) and costs one compare
      .select(col("doc_id"),
        when(coalesce(col("c2"), lit(0L)) + lit(1L) ===
            coalesce(col("c1"), lit(0L)) + lit(vTypes), lit(0L))
          .otherwise(
            floor((log(coalesce(col("c2"), lit(0L)).cast("double") + lit(1.0)) -
              log(coalesce(col("c1"), lit(0L)).cast("double") + lit(vTypes.toDouble))) *
              lit(1e7)).cast("long")).as("lp_q"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp_q").as("__s"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("__s").cast("double") / col("n_bigrams").cast("double") /
          lit(1e7)).as("avg_logprob"))
      .withColumn("perplexity", exp(-col("avg_logprob")))

  /** Train on `docs`, score `docs` — the single-corpus pipeline stage.
    *
    * Pass accounting (r18, guide §1.2/§5): the vocabulary is <= K rows but
    * costs a full corpus token pass — persist it (materialized by the
    * `vTypes` count) so the two broadcast joins read K cached rows instead
    * of re-aggregating the corpus each time; persist, not localCheckpoint,
    * keeps the TakeOrderedAndProject visible in the plan for the
    * PlanAuditSpec bounded-heap pin. The mapped bigram stream feeds THREE
    * aggregations (ctx, pairs, the per-doc score) inside one plan —
    * uncached, each re-runs the explode + vocab joins over the corpus.
    * MEMORY_AND_DISK persist drops lmScore from ~5 corpus passes to 2
    * (vocab, mapped materialization); the cached partitions spill rather
    * than OOM on a corpus-scale run.
    *
    * CACHE OWNERSHIP (ADVICE r18): the `mapped` pin is CORPUS-SCALE and
    * stays referenced by the returned plan, so lmScore cannot unpersist it
    * — the CALLER owns release. The bench/verify paths release via the
    * per-query session `clearCache()` (the shingle-index convention); any
    * other composition (operator-chaining tests, a future service face)
    * must `spark.catalog.clearCache()` or keep a handle and unpersist
    * after consuming the result, or a corpus-sized cache entry outlives
    * the call.
    */
  def lmScore(docs: DataFrame, id: String, text: String,
              vocabK: Int): DataFrame = {
    val vocab = vocabulary(docs, text, vocabK).persist()
    val mapped = mappedBigrams(docs, id, text, vocab)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ctx = mapped.groupBy("prev").agg(count(lit(1)).as("c1"))
    val pairs = mapped.groupBy("prev", "cur").agg(count(lit(1)).as("c2"))
    // control-plane scalar: |vocab| is bounded by K by construction
    val vTypes = vocab.count() + 1
    scoreAgainst(mapped, ctx, pairs, vTypes)
  }
}
