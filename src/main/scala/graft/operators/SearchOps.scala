package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextOps.tokens

/** Keyword-relevance search over a document corpus: BM25-family scoring for
  * a fixed term set, returning the global top-k.
  *
  * Scale shape: corpus statistics (N, average length, per-term document
  * frequencies) are ONE aggregation over the corpus producing a single tiny
  * row, broadcast back into a map-only scoring pass; the global top-k is
  * `orderBy().limit(k)` (TakeOrderedAndProject: per-partition heaps + a
  * driver merge of k·P rows — never a global sort). Two scans total,
  * no shuffle of document data.
  *
  * Determinism: the classic BM25 idf uses `ln`, whose libm rounding differs
  * across engines; this uses the Robertson-Spärck-Jones RATIONAL idf
  * `(N - df + 0.5) / (df + 0.5)` (same monotonicity, no transcendentals), so
  * every score is a fixed tree of IEEE +,*,/ — bit-identical in any engine
  * and therefore oracle-checkable.
  */
object SearchOps {

  /** Per-document BM25-style score against `terms`, plus the global top-k.
    * `k1` saturates term frequency, `b` controls length normalization —
    * standard BM25 parameters (defaults 1.2 / 0.75).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val toks = tokens(col(textCol))

    // corpus stats: one aggregate row — N, avg doc length (exact decimal
    // accumulation), and one df per query term
    val dfAggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(array_contains(toks, t), 1L).otherwise(0L)).as(s"df_$i")
    }
    val statAggs = Seq(
      count(lit(1)).as("n_corpus"),
      (sum(size(toks).cast("decimal(38,0)")).cast("double") /
        count(lit(1)).cast("double")).as("avg_len")) ++ dfAggs
    val stats = docs.agg(statAggs.head, statAggs.tail: _*)

    // score pass: stats is a 1-row side, broadcast cross join (no shuffle of
    // the corpus); tf comes from one tokens() evaluation per row
    val scored = docs.crossJoin(broadcast(stats))
    val dl = size(toks).cast("double")
    val lenNorm = lit(1.0) - lit(b) + lit(b) * dl / col("avg_len")
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(toks, x => x === t)).cast("double")
      val idf = (col("n_corpus").cast("double") - col(s"df_$i") + lit(0.5)) /
        (col(s"df_$i").cast("double") + lit(0.5))
      idf * (tf * (lit(k1) + lit(1.0))) / (tf + lit(k1) * lenNorm)
    }.reduce(_ + _)

    scored
      .select(col(idCol).as("doc_id"), score.as("score"))
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009): fuse
    * a lexical and a semantic ranking of the same id space into one hybrid
    * ranking — the standard way modern retrieval stacks combine BM25 with
    * embedding ANN. Each list contributes `1 / (k0 + rank)` to a document's
    * fused score (k0 = 60 in the paper); documents absent from a list
    * contribute nothing from it.
    *
    * Both inputs are `(doc_id, rank)` top-k results, so the fuse is a
    * full-outer equi-join of two k-bounded frames — negligible at any
    * corpus scale (the cost lives in producing the input rankings). The
    * score is a FIXED expression tree of two exact integer adds, two IEEE
    * divisions and one IEEE add — never a float aggregation whose order
    * could drift — so fused scores are bit-identical cross-engine and the
    * result is oracle-checkable. Ties break on doc_id.
    */
  def rrfFuse(lex: DataFrame, sem: DataFrame, k0: Int = 60, k: Int): DataFrame = {
    val a = lex.select(col("doc_id"), col("rank").cast("long").as("rank_lex"))
    val b = sem.select(col("doc_id"), col("rank").cast("long").as("rank_sem"))
    val score =
      coalesce(lit(1.0) / (lit(k0.toLong) + col("rank_lex")).cast("double"), lit(0.0)) +
        coalesce(lit(1.0) / (lit(k0.toLong) + col("rank_sem")).cast("double"), lit(0.0))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), score.as("rrf"), col("rank_lex"), col("rank_sem"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(k)
  }
}
