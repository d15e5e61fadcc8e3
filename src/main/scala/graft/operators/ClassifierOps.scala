package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextOps.hash60

/** Model-based quality filtering — the fastText/DCLM-style pipeline stage:
  * train a linear classifier over hashed bag-of-words features ON the
  * corpus (full-batch gradient descent, a fixed number of passes), then
  * score every document. The modern curation stacks (DCLM, FineWeb-Edu)
  * gate pretraining data on exactly this shape of model; here both the
  * TRAINING and the scoring are distributed Spark aggregations.
  *
  * Determinism discipline: everything is fixed-point int64 at scale 1e6 —
  * features are mean-normalized token counts `x_q = count*1e6 div n_tokens`
  * (the fastText averaging), the logistic squash is the RATIONAL surrogate
  * `s(z) = 1/2 + z / (2*(1+|z|))` (one integer division; `exp` is the one
  * libm call that differs cross-engine by 1 ulp — the q_lm_perplexity
  * lesson — so the kernel is transcendental-free), and every gradient is an
  * order-independent integer sum. Spark's `div` and DuckDB's `//` both
  * truncate toward zero, so the whole training trajectory replays
  * bit-exactly as unrolled SQL.
  *
  * Scale posture: each GD iteration is two corpus passes (margins, then
  * gradients) built from ONE persisted feature table; the weight vector is
  * at most `buckets+1` rows and rides a broadcast join — the corpus never
  * shuffles on a low-cardinality key. Gradient sums hold in int64 up to
  * ~9e6 documents per aggregation (|e·x| <= 1e12); past that, route the
  * sum through decimal(38,0) — same plan shape.
  */
object ClassifierOps {

  /** Fixed-point scale: 1e6 = 1.0. */
  val S = 1000000L

  /** Hashed mean-normalized bag-of-words plus a constant bias feature:
    * (__id, bk, x_q) with `bk` in [0, buckets] — bucket `buckets` IS the
    * bias (x_q = 1e6 for every doc). Per-token md5 is CPU-dense, so a
    * few-split corpus spreads across the slots first.
    */
  def featuresQ(docs: DataFrame, id: String, text: String, buckets: Int): DataFrame = {
    val toks = TextOps.tokens(col(text))
    val base = SkewOps.spreadSmall(docs)
      .select(col(id).as("__id"), explode(toks).as("tok"), size(toks).as("__n"))
      .groupBy(col("__id"), pmod(hash60(col("tok")), lit(buckets.toLong)).as("bk"))
      .agg(expr(s"(count(1) * ${S}L) div max(__n)").as("x_q"))
    val bias = docs.select(col(id).as("__id"), lit(buckets.toLong).as("bk"),
      lit(S).as("x_q"))
    base.unionByName(bias)
  }

  /** Full-batch GD for `iters` passes: weights (bk, w_q) at scale 1e6,
    * initialized to zero. Per pass: margins `z = (sum x·w) div 1e6` per
    * doc, surrogate-sigmoid errors `e = s(z) - y`, per-bucket mean
    * gradients, update `w -= lrNum * mean(e·x) / 1e12` (all truncating
    * integer steps, replayed identically by the DuckDB oracle).
    */
  def trainLinearQ(docs: DataFrame, id: String, text: String, label: Column,
                   buckets: Int = 1024, iters: Int = 3, lrNum: Long = 1L): DataFrame = {
    // x and y cache PRE-PARTITIONED on the per-pass join/agg key: the
    // margin groupBy, the error join, and the gradient join then all
    // reuse the cached partitioning instead of re-shuffling corpus-scale
    // frames every pass — one exchange paid once vs two per iteration
    // (measured 3.6s -> faster at sf0.1; the integer kernel is
    // order-independent, so partitioning cannot move a bit)
    val x = featuresQ(docs, id, text, buckets)
      .repartition(col("__id")).persist()
    val w = trainOnFeatures(x, docs, id, label, buckets, iters, lrNum)
    // the corpus-scale cache must not outlive training; the final
    // weights are checkpointed blocks, so dropping it costs nothing
    x.unpersist()
    w
  }

  /** The GD loop over a PRE-BUILT (persisted, __id-partitioned) feature
    * frame — split out so [[trainAndScoreQ]] can share ONE feature pass
    * between training and scoring (r18: featuresQ is the corpus-scan half
    * of the operator — per-token md5 — and train-then-score paid it twice,
    * guide §1.2 "don't compute things you throw away").
    */
  private def trainOnFeatures(x: DataFrame, docs: DataFrame, id: String,
                              label: Column, buckets: Int, iters: Int,
                              lrNum: Long): DataFrame = {
    require(iters >= 1 && lrNum >= 1L, s"bad iters=$iters lrNum=$lrNum")
    val y = docs.select(col(id).as("__id"),
      when(label, lit(S)).otherwise(lit(0L)).as("y_q"))
      .repartition(col("__id")).persist()
    // one driver long (bounded), read once instead of a count job per pass
    val nRows = docs.count()
    // zero-init weights over the FULL bucket domain [0, buckets] (bias
    // included) instead of distinct(bk) over the cached corpus features:
    // the distinct cost a full cached-x pass plus an exchange inside
    // iteration 1's job (r19). Unoccupied buckets ride along at w_q = 0
    // forever (no x row joins them, so no gradient ever lands) and every
    // downstream join is keyed on x's buckets — scores are bit-identical
    // (CurationSpec/differential nets assert the trajectory).
    var w = x.sparkSession.range(buckets + 1L)
      .select(col("id").as("bk"), lit(0L).as("w_q"))
    for (_ <- 0 until iters) {
      val z = x.join(broadcast(w), Seq("bk"))
        .groupBy("__id")
        .agg(expr(s"cast(sum(x_q * w_q) as bigint) div ${S}L").as("z_q"))
      val e = z.join(y, Seq("__id"))
        .select(col("__id"), (expr(
          s"500000L + (z_q * ${S}L) div (2L * (${S}L + abs(z_q)))") -
          col("y_q")).as("e_q"))
      val g = x.join(e, Seq("__id"))
        .groupBy("bk")
        .agg(expr("cast(sum(e_q * x_q) as bigint)").as("g_q"))
      // localCheckpoint each round's weights (<= buckets+1 rows, bounded):
      // it both stops the broadcast of w_t from re-executing every earlier
      // round's corpus passes (geometric re-execution) AND truncates the
      // lineage so Catalyst analysis stays O(1) per round at any `iters`
      // (the connectedComponents rule) — eager jobs over tiny frames
      w = w.join(g, Seq("bk"), "left")
        .select(col("bk"), (col("w_q") -
          coalesce(expr(s"(${lrNum}L * (g_q div ${nRows}L)) div ${S}L"),
            lit(0L))).as("w_q"))
        .localCheckpoint(true)
    }
    // the label cache must not outlive training; the final weights are
    // checkpointed blocks, so dropping it costs nothing (the caller owns x)
    y.unpersist()
    w
  }

  /** Train AND score over ONE persisted feature pass: the per-token-md5
    * featuresQ scan is the operator's corpus-pass cost, and the separate
    * train-then-score composition paid it twice (train builds features,
    * scoring rebuilds them). Identical math to trainLinearQ + scoreLinearQ
    * — featuresQ is deterministic, so scoring from the same cached frame
    * cannot move a bit (ClassifierSpec asserts equality). The feature cache
    * stays pinned for the returned plan; callers (Bench) clear it with the
    * session cache, exactly like the dedup shingle indexes.
    */
  def trainAndScoreQ(docs: DataFrame, id: String, text: String, label: Column,
                     buckets: Int = 1024, iters: Int = 3,
                     lrNum: Long = 1L): DataFrame = {
    val x = featuresQ(docs, id, text, buckets)
      .repartition(col("__id")).persist()
    val w = trainOnFeatures(x, docs, id, label, buckets, iters, lrNum)
    x.join(broadcast(w), Seq("bk"))
      .groupBy("__id")
      .agg(expr(s"cast(sum(x_q * w_q) as bigint) div ${S}L").as("score_q"))
      .select(col("__id").as(id), col("score_q"))
  }

  /** Train once, persist the weight table (<= buckets+1 rows) as a
    * TxLogTable — the model registry for [[classifierProbe]]: training
    * scans the corpus; scoring new batches never does.
    */
  def buildClassifierIndex(docs: DataFrame, id: String, text: String,
                           label: Column, buckets: Int, iters: Int,
                           lrNum: Long, path: String): Unit = {
    val w = trainLinearQ(docs, id, text, label, buckets, iters, lrNum)
    // MERGE keyed on the bucket id, not append: a RETRAIN replaces the
    // model. An appended second build would duplicate bk rows, and the
    // probe's broadcast join would then silently double every score.
    // The merged frame is DENSE over [0, buckets] (bias included): a
    // sparse upsert would keep a PREVIOUS model's weights alive for any
    // bucket the retrain corpus happens not to touch — the retrain means
    // zero weight there, and scoreLinearQ's inner join would silently
    // apply the stale one. buckets+1 rows, driver-side trivial.
    val dense = docs.sparkSession.range(buckets + 1L).toDF("bk")
      .join(w, Seq("bk"), "left")
      .select(col("bk"), coalesce(col("w_q"), lit(0L)).as("w_q"))
    new graft.storage.TxLogTable(docs.sparkSession, s"$path/weights")
      .merge(dense, Seq("bk"))
    ()
  }

  /** Score a NEW batch against persisted weights: only the batch hashes;
    * the model rides a broadcast. Unseen features drop (zero weight), the
    * bias bucket keeps every batch document scored.
    */
  def classifierProbe(spark: org.apache.spark.sql.SparkSession, path: String,
                      newDocs: DataFrame, id: String, text: String,
                      buckets: Int): DataFrame = {
    val w = new graft.storage.TxLogTable(spark, s"$path/weights").read()
    scoreLinearQ(newDocs, id, text, w, buckets)
  }

  /** Score docs under trained weights: (id, score_q) with `score_q` the
    * 1e6-scaled margin; `score_q > 0` is the positive-class prediction.
    * Features unseen at train time drop out of the inner join — exactly a
    * zero weight — while the bias bucket keeps every document scored.
    */
  def scoreLinearQ(docs: DataFrame, id: String, text: String, w: DataFrame,
                   buckets: Int): DataFrame =
    featuresQ(docs, id, text, buckets).join(broadcast(w), Seq("bk"))
      .groupBy("__id")
      .agg(expr(s"cast(sum(x_q * w_q) as bigint) div ${S}L").as("score_q"))
      .select(col("__id").as(id), col("score_q"))
}
