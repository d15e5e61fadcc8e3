package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{DedupOps, LmOps, MultimodalOps, SampleOps, SimilarityOps, TextOps}

/** LLM-data-pipeline operators (SURVEY.md §2.4): deduplication (exact,
  * n-gram Jaccard, MinHash+LSH, SimHash, embedding cosine), similarity
  * search (brute-force + hyperplane LSH), text analysis (token counting,
  * language ID, quality scoring, fingerprinting), multimodal columns.
  *
  * Every query here is fully deterministic — hashing is md5-derived, vector
  * math is integer-quantized — so even the LSH variants are oracle-checked
  * end-to-end, not just rows-only.
  */
object PipelineQueries {

  // DuckDB fragments shared across oracles (also used by CurationQueries)
  private[queries] val toksSql = "string_split(text, ' ')"
  private[queries] def hash60Sql(x: String) = s"('0x' || substr(md5($x), 1, 15))::BIGINT"

  // the ExactSubstr spans pipeline as a reusable CTE chain ending in
  // `spans(doc_id, span_start, span_end, span_len)` — shared by
  // q_dedup_substring and q_dedup_substring_clean
  private val substringSpansSql =
    s"""w AS (SELECT doc_id, CAST(t.i AS BIGINT) AS off,
       |    ${hash60Sql("substr(text, t.i + 1, 30)")} AS wh
       |  FROM documents, UNNEST(generate_series(0, length(text) - 30)) AS t(i)),
       |d AS (SELECT wh FROM w GROUP BY wh HAVING count(*) >= 2),
       |o AS (SELECT w.doc_id, w.off FROM w JOIN d USING (wh)),
       |b AS (SELECT doc_id, off,
       |    CASE WHEN lag(off) OVER (PARTITION BY doc_id ORDER BY off) IS NULL
       |      OR off - lag(off) OVER (PARTITION BY doc_id ORDER BY off) > 30
       |    THEN 1 ELSE 0 END AS brk FROM o),
       |g AS (SELECT doc_id, off, sum(brk) OVER (PARTITION BY doc_id ORDER BY off
       |    ROWS UNBOUNDED PRECEDING) AS isl FROM b),
       |spans AS (SELECT doc_id, min(off) AS span_start, max(off) + 30 AS span_end,
       |  max(off) + 30 - min(off) AS span_len FROM g GROUP BY doc_id, isl)""".stripMargin
  private val shinglesSql =
    s"""d AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
       |  FROM d, UNNEST(generate_series(1, len(toks) - 2)) AS t(i))""".stripMargin
  private[queries] val quantSql =
    """q AS (SELECT vec_id, list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS qv FROM embeddings),
      |n AS (SELECT vec_id, qv, CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS nq FROM q)""".stripMargin
  private[queries] def dotSql(a: String, b: String) =
    s"CAST(list_sum(list_transform(list_zip($a, $b), s -> s[1] * s[2])) AS BIGINT)"

  // the CCNet LM scoring chain (LmOps.lmScore, vocab 40) ending in
  // `agg(doc_id, n_bigrams, avg_logprob)` — shared by q_lm_perplexity and
  // the perplexity-bucket filter
  private val lmAggSql: String =
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |big AS (SELECT doc_id, toks[i] AS prev_raw, toks[i+1] AS cur_raw
       |  FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS g(i)),
       |uni AS (SELECT unnest(toks) AS tok FROM t),
       |vocab AS (SELECT tok FROM (SELECT tok, count(*) AS cnt FROM uni GROUP BY 1)
       |  ORDER BY cnt DESC, tok LIMIT 40),
       |mapped AS (SELECT doc_id, coalesce(vp.tok, '<unk>') AS prev,
       |    coalesce(vc.tok, '<unk>') AS cur
       |  FROM big LEFT JOIN vocab vp ON big.prev_raw = vp.tok
       |  LEFT JOIN vocab vc ON big.cur_raw = vc.tok),
       |ctx AS (SELECT prev, count(*) AS c1 FROM mapped GROUP BY 1),
       |pairs AS (SELECT prev, cur, count(*) AS c2 FROM mapped GROUP BY 1, 2),
       |v AS (SELECT count(*) + 1 AS vn FROM vocab),
       |lp AS (SELECT doc_id,
       |    CASE WHEN c2 + 1 = c1 + vn THEN CAST(0 AS BIGINT)
       |    ELSE CAST(floor((ln(CAST(c2 AS DOUBLE) + 1.0) -
       |      ln(CAST(c1 AS DOUBLE) + CAST(vn AS DOUBLE))) * 10000000.0) AS BIGINT)
       |    END AS lp_q
       |  FROM mapped JOIN pairs USING (prev, cur) JOIN ctx USING (prev), v),
       |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(CAST(sum(lp_q) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |      / 10000000.0 AS avg_logprob
       |  FROM lp GROUP BY 1)""".stripMargin

  // One greedy MMR stage (SimilarityOps.mmrRerank, lambda=0.7): score every
  // unselected candidate as 0.7*relevance - 0.3*max-sim-to-selected, pick
  // the per-query argmax (id tie-break), append to the selected set
  private def mmrStageSql(t: Int): String =
    s"""r$t AS (SELECT c.query_id, c.neighbor_id,
       |    0.7 * c.cos - 0.3 * max(p.sim) AS score
       |  FROM cand c
       |  JOIN pr p ON p.query_id = c.query_id AND p.i = c.neighbor_id
       |  JOIN sel${t - 1} s ON s.query_id = p.query_id AND s.sel_id = p.j
       |  WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} x
       |    WHERE x.query_id = c.query_id AND x.sel_id = c.neighbor_id)
       |  GROUP BY c.query_id, c.neighbor_id, c.cos),
       |s$t AS (SELECT query_id, neighbor_id AS sel_id, CAST($t AS BIGINT) AS step, score
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id) AS rn FROM r$t) WHERE rn = 1),
       |sel$t AS (SELECT query_id, sel_id FROM sel${t - 1}
       |  UNION ALL SELECT query_id, sel_id FROM s$t)""".stripMargin
  private[queries] def stopSql(lang: String) = {
    val lst = TextOps.stopwords(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter(toks, t -> list_contains([$lst], t)))"
  }

  // SimHash pair SQL, shared between q_dedup_simhash, the recursive
  // clustering oracle (q_dedup_clusters wraps the same pairs in a
  // WITH RECURSIVE min-label reachability), and the edit-distance verify
  // (CurationQueries, with a doc subset `where`)
  private[queries] def simhashCtes(where: String = ""): String =
    s"""d AS (SELECT doc_id, $toksSql AS toks FROM documents $where),
       |tok AS (SELECT DISTINCT doc_id, unnest(toks) AS tok FROM d),
       |h AS (SELECT doc_id, ${hash60Sql("tok")} AS h FROM tok),
       |bits AS (SELECT doc_id, j, sum(CASE WHEN (h >> j) % 2 = 1 THEN 1 ELSE -1 END) AS s
       |  FROM h, UNNEST(generate_series(0, 59)) AS t(j) GROUP BY 1, 2),
       |sig AS (SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS simhash
       |  FROM bits GROUP BY 1),
       |bk AS (SELECT doc_id, simhash, b AS band, (simhash >> (b * 15)) % 32768 AS bv
       |  FROM sig, UNNEST(generate_series(0, 3)) AS t(b))""".stripMargin
  private[queries] def simhashPairSelect =
    """SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
      |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      |FROM bk a JOIN bk b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin

  private[queries] def cosSql(av: String, an: String, bv: String, bn: String) =
    s"""CAST(${dotSql(av, bv)} AS DOUBLE) / sqrt(CAST($an AS DOUBLE) * CAST($bn AS DOUBLE))"""

  /** Deterministic per-(dataset, index-config) location for a persisted ANN
    * index, so repeated query runs against the same data reuse the build
    * (the build-once / probe-many lifecycle) while different SF dirs get
    * disjoint indexes. The path is ALSO keyed on the source tables'
    * generation (size + mtime): a driver-side fixture regeneration must
    * invalidate every derived index, or a probe would compare a stale
    * index against a fresh oracle — the same silent-drift class as the
    * events-layout regeneration that once broke half the query surface.
    */
  /** The id offset under which media queries plant content copies. The
    * oracles hard-code the literal 1000000, so it cannot float with the
    * data — instead the builders assert id-disjointness per fixture dir: a
    * corpus whose doc_ids reach the shift would make the oracle's
    * GROUP BY doc_id merge an original with its planted copy while the
    * Scala side keeps them separate (a silent scale-dependent divergence).
    * Checked once per (JVM, dir): one column-pruned max() over parquet.
    */
  private val mediaShiftChecked = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private[queries] def mediaIdShift(s: SparkSession, dir: String): Long = {
    val shift = 1000000L
    mediaShiftChecked.computeIfAbsent(dir, { _ =>
      val mx = Tables.documents(s, dir).agg(max(col("doc_id"))).head.getLong(0)
      require(mx < shift,
        s"documents.doc_id max $mx >= planted-copy shift $shift in $dir — " +
          "copies would collide with corpus ids; raise the shift in BOTH " +
          "the media query builders and their oracles")
      mx
    })
    shift
  }

  private[queries] def annIndexPath(dir: String, tag: String): String = {
    // full-width md5 over (length, mtime, head+tail bytes) per source file:
    // a regenerated fixture with the same byte length inside the same
    // mtime-granularity tick still flips the key (parquet footers encode
    // row-group stats, so same-length different-content files differ in
    // their tail), and a missing fixture fails LOUDLY instead of keying
    // the index on a phantom 0_0 generation
    val md = java.security.MessageDigest.getInstance("MD5")
    Seq("documents", "embeddings").foreach { t =>
      val f = new java.io.File(s"$dir/$t.parquet")
      require(f.isFile, s"fixture $f is missing — cannot key a persisted index on it")
      md.update(s"$t:${f.length}:${f.lastModified}:".getBytes("UTF-8"))
      val in = new java.io.RandomAccessFile(f, "r")
      try {
        val head = new Array[Byte](math.min(4096L, f.length).toInt)
        in.readFully(head); md.update(head)
        if (f.length > 4096L) {
          val tail = new Array[Byte](math.min(4096L, f.length - 4096L).toInt)
          in.seek(f.length - tail.length); in.readFully(tail); md.update(tail)
        }
      } finally in.close()
    }
    val gen = md.digest().map("%02x".format(_)).mkString
    s"${sys.props("java.io.tmpdir")}/graft_ann_idx/${dir.replaceAll("[^A-Za-z0-9._-]", "_")}_$gen/$tag"
  }

  /** DuckDB oracle for IVF ANN with `iters` unrolled k-means iterations —
    * mirrors [[SimilarityOps.kmeansCentroidsQ]] step for step: max-cos
    * assignment with cid tie-break, element-wise floor-division mean
    * `(s - ((s % n + n) % n)) / n` (exact: numerator divisible, < 2^53),
    * empty clusters carry the previous centroid.
    */
  /** The k-means-iteration + final-assignment CTE prefix shared by the IVF
    * and semantic-dedup oracles: defines `cents0..cents$iters` and
    * `assigned` (vec_id, qv, nq, cid) after `iters` unrolled iterations.
    * `src` is the quantized source CTE the clustering learns over (default
    * the full corpus `n`; the semantic-probe oracle passes the pre-batch
    * corpus so the learning replays the BUILD-time input exactly).
    */
  private def kmeansAssignedSql(nCentroids: Int, iters: Int, src: String = "n"): String = {
    val steps = (0 until iters).map { t =>
      s"""kassign$t AS (SELECT vec_id, qv, cid FROM (
         |    SELECT n.vec_id, n.qv, c.cid,
         |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |        ${cosSql("n.qv", "n.nq", "c.cv", "c.cn")} DESC, c.cid) AS crk
         |    FROM $src n, cents$t c) WHERE crk = 1),
         |ksums$t AS (SELECT cid, i AS pos, sum(qv[i]) AS s, count(*) AS cnt
         |  FROM kassign$t, UNNEST(generate_series(1, len(qv))) AS u(i) GROUP BY 1, 2),
         |knewc$t AS (SELECT cid,
         |    list(CAST((s - (((s % cnt) + cnt) % cnt)) / cnt AS BIGINT) ORDER BY pos) AS cv
         |  FROM ksums$t GROUP BY 1),
         |cents${t + 1} AS (SELECT p.cid, coalesce(nc.cv, p.cv) AS cv,
         |    CAST(list_sum(list_transform(coalesce(nc.cv, p.cv), x -> x * x)) AS BIGINT) AS cn
         |  FROM cents$t p LEFT JOIN knewc$t nc ON p.cid = nc.cid)""".stripMargin
    }
    s"""cents0 AS (SELECT vec_id AS cid, qv AS cv, nq AS cn FROM $src WHERE vec_id < $nCentroids),
       |${steps.mkString(",\n")}${if (iters > 0) "," else ""}
       |assign0 AS (SELECT n.vec_id, n.qv, n.nq, c.cid,
       |    ${cosSql("n.qv", "n.nq", "c.cv", "c.cn")} AS ccos
       |  FROM $src n, cents$iters c),
       |assigned AS (SELECT vec_id, qv, nq, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk
       |    FROM assign0) WHERE crk = 1)""".stripMargin
  }

  private def ivfOracleSql(nCentroids: Int, probes: Int, topK: Int, iters: Int): String = {
    s"""WITH $quantSql,
       |${kmeansAssignedSql(nCentroids, iters)},
       |queries AS (SELECT vec_id AS query_id, qv AS want_qv, nq AS want_qn
       |  FROM assigned WHERE vec_id >= 100 AND vec_id < 120),
       |probed AS (SELECT query_id, want_qv, want_qn, cid FROM (
       |    SELECT q.query_id, q.want_qv, q.want_qn, c.cid,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        ${cosSql("q.want_qv", "q.want_qn", "c.cv", "c.cn")} DESC, c.cid) AS prk
       |    FROM queries q, cents$iters c) WHERE prk <= $probes),
       |scored AS (SELECT p.query_id, a.vec_id AS neighbor_id,
       |    ${cosSql("p.want_qv", "p.want_qn", "a.qv", "a.nq")} AS cos
       |  FROM probed p JOIN assigned a ON p.cid = a.cid AND a.vec_id <> p.query_id)
       |SELECT query_id, neighbor_id, cos, rk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
       |  FROM scored) WHERE rk <= $topK""".stripMargin
  }

  /** DuckDB oracle for PQ/ADC ANN — mirrors [[SimilarityOps.pqTopK]]: per
    * subspace, the same unrolled deterministic k-means as the IVF oracle
    * (max-cos assignment, floor-division means, empty clusters carry), then
    * code assignment, the ADC lookup table, and the int64 score join.
    */
  private def pqOracleSql(m: Int, kCodes: Int, subLen: Int, topK: Int, iters: Int): String = {
    def sliceOf(src: String, j: Int) = s"$src[${j * subLen + 1}:${(j + 1) * subLen}]"
    val subCtes = (0 until m).map { j =>
      val base =
        s"""nsub$j AS (SELECT vec_id, ${sliceOf("qv", j)} AS qv,
           |    CAST(list_sum(list_transform(${sliceOf("qv", j)}, x -> x*x)) AS BIGINT) AS nq
           |  FROM q),
           |c${j}_0 AS (SELECT vec_id AS cid, qv AS cv, nq AS cn FROM nsub$j WHERE vec_id < $kCodes)""".stripMargin
      val steps = (0 until iters).map { t =>
        s"""ka${j}_$t AS (SELECT vec_id, qv, cid FROM (
           |    SELECT n.vec_id, n.qv, c.cid,
           |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
           |        ${cosSql("n.qv", "n.nq", "c.cv", "c.cn")} DESC, c.cid) AS crk
           |    FROM nsub$j n, c${j}_$t c) WHERE crk = 1),
           |ks${j}_$t AS (SELECT cid, i AS pos, sum(qv[i]) AS s, count(*) AS cnt
           |  FROM ka${j}_$t, UNNEST(generate_series(1, len(qv))) AS u(i) GROUP BY 1, 2),
           |kn${j}_$t AS (SELECT cid,
           |    list(CAST((s - (((s % cnt) + cnt) % cnt)) / cnt AS BIGINT) ORDER BY pos) AS cv
           |  FROM ks${j}_$t GROUP BY 1),
           |c${j}_${t + 1} AS (SELECT p.cid, coalesce(nc.cv, p.cv) AS cv,
           |    CAST(list_sum(list_transform(coalesce(nc.cv, p.cv), x -> x * x)) AS BIGINT) AS cn
           |  FROM c${j}_$t p LEFT JOIN kn${j}_$t nc ON p.cid = nc.cid)""".stripMargin
      }
      val codes =
        s"""codes$j AS (SELECT vec_id, $j AS sub, cid AS code FROM (
           |    SELECT n.vec_id, c.cid,
           |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
           |        ${cosSql("n.qv", "n.nq", "c.cv", "c.cn")} DESC, c.cid) AS crk
           |    FROM nsub$j n, c${j}_$iters c) WHERE crk = 1)""".stripMargin
      (base +: steps :+ codes).mkString(",\n")
    }
    val codesUnion = (0 until m).map(j => s"SELECT * FROM codes$j").mkString(" UNION ALL ")
    val centsUnion = (0 until m)
      .map(j => s"SELECT $j AS sub, cid, cv FROM c${j}_$iters").mkString(" UNION ALL ")
    val qsubsUnion = (0 until m)
      .map(j => s"SELECT query_id, $j AS sub, ${sliceOf("qv", j)} AS qsub FROM queries")
      .mkString(" UNION ALL ")
    s"""WITH $quantSql,
       |${subCtes.mkString(",\n")},
       |codes AS ($codesUnion),
       |cents AS ($centsUnion),
       |queries AS (SELECT vec_id AS query_id, qv FROM q WHERE vec_id >= 100 AND vec_id < 110),
       |qsubs AS ($qsubsUnion),
       |adc AS (SELECT query_id, s.sub, s.cid AS code, ${dotSql("qsub", "s.cv")} AS d
       |  FROM qsubs JOIN cents s ON qsubs.sub = s.sub),
       |scored AS (SELECT a.query_id, c.vec_id AS neighbor_id, CAST(sum(a.d) AS BIGINT) AS adc_dot
       |  FROM codes c JOIN adc a ON a.sub = c.sub AND a.code = c.code
       |  WHERE c.vec_id <> a.query_id
       |  GROUP BY 1, 2)
       |SELECT query_id, rk, neighbor_id, adc_dot FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_dot DESC, neighbor_id) AS rk
       |  FROM scored) WHERE rk <= $topK""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // token counting: whitespace + BPE-ish regex
    "q_text_stats" -> ((s, dir) => {
      Tables.documents(s, dir).filter(col("doc_id") % 7 === 0).select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens_ws"),
        TextOps.regexTokenCount(col("text")).as("n_tokens_re"),
        length(col("text")).cast("long").as("n_chars"),
        size(array_distinct(TextOps.tokens(col("text")))).cast("long").as("n_distinct"))
    }),

    // language ID (stopword heuristic) vs. labeled lang: confusion counts
    "q_text_langid" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy(TextOps.langId(col("text")).as("langid"), col("lang"))
        .agg(count(lit(1)).as("n"))
    }),

    // quality features + composite score
    "q_text_quality" -> ((s, dir) => {
      val feats = TextOps.qualityFeatures(col("text")).map { case (nm, c) => c.as(nm) }
      Tables.documents(s, dir).filter(col("doc_id") % 11 === 0)
        .select(col("doc_id") +: feats: _*)
    }),

    // CCNet-style LM quality score: a bigram add-one model trained on the
    // corpus itself (top-40 vocab, count-desc/token-asc tie-break, OOV ->
    // <unk>) scores every document's average bigram log-probability. Model
    // tables are (K+1)-bounded and broadcast; scoring is map-only + one
    // doc-keyed agg; per-bigram log-probs quantize to int64 so the sum is
    // order-independent (ONE double conversion, one final IEEE exp)
    // gated on the exact columns: avg_logprob is integer-quantized all the
    // way, but the operator's derived perplexity = exp(-avg) differs from
    // DuckDB by 1 ulp on some inputs (Java Math.exp vs libm) — the one
    // column the bit-exact gate cannot hold cross-engine
    "q_lm_perplexity" -> ((s, dir) => {
      LmOps.lmScore(Tables.documents(s, dir), "doc_id", "text", 40)
        .select("doc_id", "n_bigrams", "avg_logprob")
    }),

    // CCNet's perplexity-bucket filter: terciles of the LM score split the
    // corpus into head/middle/tail (head = most natural text); CCNet keeps
    // head+middle. Thresholds from one exact percentile agg broadcast back
    "q_ccnet_buckets" -> ((s, dir) => {
      // persist the per-doc scores: the tercile agg AND the final select
      // both consume them — without it the whole LM chain (vocab top-k,
      // model joins, per-doc agg) runs twice
      val lm = LmOps.lmScore(Tables.documents(s, dir), "doc_id", "text", 40)
        .select(col("doc_id"), col("avg_logprob")).persist()
      val th = lm.agg(
        percentile(col("avg_logprob"), lit(1.0 / 3.0)).as("__t1"),
        percentile(col("avg_logprob"), lit(2.0 / 3.0)).as("__t2"))
      lm.crossJoin(broadcast(th))
        .select(col("doc_id"), col("avg_logprob"),
          when(col("avg_logprob") >= col("__t2"), "head")
            .when(col("avg_logprob") >= col("__t1"), "middle")
            .otherwise("tail").as("bucket"),
          (col("avg_logprob") >= col("__t1")).as("kept"))
    }),

    // corpus n-gram statistics: top-10 bigrams by document frequency.
    // Global top-k is orderBy().limit(k) — plans TakeOrderedAndProject
    // (per-partition bounded heap + tiny driver merge), NOT a global
    // single-partition window: at 100 TB the distinct-bigram table is
    // 1e8+ rows and an unpartitioned WindowExec would sort it on one task.
    // The rank is derived AFTER the limit, over the <=10 surviving rows.
    "q_text_ngrams" -> ((s, dir) => {
      val bigrams = DedupOps.shingles(Tables.documents(s, dir), "doc_id", "text", 2)
      // shingles() already emits DISTINCT (doc_id, shingle), so a plain
      // count IS the document frequency — no two-phase distinct aggregate
      val counts = bigrams.groupBy(col("shingle").as("bigram"))
        .agg(count(lit(1)).as("doc_freq"))
      val top = counts.orderBy(col("doc_freq").desc, col("bigram").asc).limit(10)
      // rank the <=10 survivors WITHOUT a window: an unpartitioned
      // WindowExec would warn (and partitionBy(lit) is constant-folded back
      // to unpartitioned), so the rank is a broadcast self-join count of
      // sort-order predecessors — 10x10 bounded pairs, zero shuffle.
      // (bigram is unique after the groupBy, so this IS row_number.)
      top.as("a")
        .join(broadcast(top.as("b")),
          col("b.doc_freq") > col("a.doc_freq") ||
            (col("b.doc_freq") === col("a.doc_freq") && col("b.bigram") <= col("a.bigram")))
        .groupBy(col("a.bigram").as("bigram"), col("a.doc_freq").as("doc_freq"))
        .agg(count(lit(1)).as("rk"))
        .select("bigram", "doc_freq", "rk")
    }),

    // order/whitespace-insensitive content fingerprint, dup stats per source
    "q_text_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(TextOps.fingerprint(col("text"))).as("n_unique"),
          (count(lit(1)) - countDistinct(TextOps.fingerprint(col("text")))).as("n_dups"))
    }),

    // exact dedup via normalized-text hash, per language
    "q_dedup_exact" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(DedupOps.exactKey(col("text"))).as("n_unique"),
          (count(lit(1)) - countDistinct(DedupOps.exactKey(col("text")))).as("n_dups"))
    }),

    // exact 3-gram Jaccard near-dup pairs (inverted-index join, complete)
    "q_dedup_jaccard" -> ((s, dir) => {
      DedupOps.jaccardPairs(Tables.documents(s, dir), "doc_id", "text", n = 3, tau = 0.5)
    }),

    // MinHash(12) + LSH(6 bands of 2) candidates, exact-Jaccard verified
    "q_dedup_minhash" -> ((s, dir) => {
      DedupOps.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, k = 12, bands = 6, tau = 0.5)
    }),

    // incremental dedup against a PERSISTED index: the base corpus
    // (doc_id % 10 != 0) is sketched once into band-bucket + shingle
    // TxLogTables; the "new batch" (doc_id % 10 == 0) probes without
    // re-shingling the base — pairs touching the batch, exact-verified.
    // The scale story of dedup-at-ingest: sketch cost is per-document-ever
    "q_dedup_incremental" -> ((s, dir) => {
      // tag bumped r19: the shingle index now stores the narrowed sh60
      // longs — a stale string-schema index under the old tag must not
      // be picked up by indexExists
      val idx = annIndexPath(dir, "mh60_12_6")
      if (!SimilarityOps.indexExists(s, idx, Seq("buckets", "shingles")))
        DedupOps.buildMinhashIndex(
          Tables.documents(s, dir).filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text", n = 3, k = 12, bands = 6, path = idx)
      DedupOps.minhashProbe(
        Tables.documents(s, dir).filter(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 3, k = 12, bands = 6, tau = 0.5, path = idx)
    }),

    // exact duplicated-substring spans (ExactSubstr dedup, Lee et al. 2022):
    // maximal char ranges covered by length-30 windows occurring >= 2 times
    // corpus-wide; one content-hash shuffle, never doc-pairwise
    "q_dedup_substring" -> ((s, dir) => {
      DedupOps.duplicateSpans(Tables.documents(s, dir), "doc_id", "text", minLen = 30)
    }),

    // the cleanup half of ExactSubstr dedup: duplicated spans excised from
    // every document; cleaned text compared by md5 (the q_pii_redact rule)
    "q_dedup_substring_clean" -> ((s, dir) => {
      DedupOps.removeDuplicateSpans(Tables.documents(s, dir), "doc_id", "text", minLen = 30)
        .select(col("doc_id"), length(col("clean")).cast("long").as("clean_len"),
          col("removed_chars"), col("n_spans"), md5(col("clean")).as("clean_md5"))
    }),

    // SimHash(60-bit) near-dup pairs, Hamming <= 3, 4x15-bit band blocking
    "q_dedup_simhash" -> ((s, dir) => {
      DedupOps.simhashPairs(Tables.documents(s, dir), "doc_id", "text", maxDist = 3)
    }),

    // transitive dedup clustering: connected components over simhash pairs
    // (A~B, B~C => one group even without an A~C edge) via min-label
    // propagation; component histogram per representative (min doc_id)
    "q_dedup_clusters" -> ((s, dir) => {
      val pairs = DedupOps.simhashPairs(Tables.documents(s, dir), "doc_id", "text", maxDist = 3)
        .select("i", "j")
      DedupOps.connectedComponents(pairs)
        .groupBy("component")
        .agg(count(lit(1)).as("n_docs"))
    }),

    // INCREMENTAL clustering: a deterministic ~25% of the corpus arrives
    // as a "new batch"; the old corpus clusters from scratch once, then
    // the batch's pairs fold in via DedupOps.mergeComponents (CC over the
    // batch-sized representative graph only). The oracle recomputes the
    // WHOLE clustering from scratch — the hash match IS the proof that
    // incremental maintenance equals full recomputation.
    "q_dedup_clusters_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      def isNew(c: org.apache.spark.sql.Column) =
        pmod(TextOps.hash60(concat(lit("ccinc"), c.cast("string"))), lit(4)) === lit(0)
      // one banded pipeline pass; per-doc signatures are input-subset
      // independent, so filtering the pair set to old-old endpoints equals
      // running the pipeline on the old corpus alone (a real deployment
      // gets newPairs from the persisted minhash/simhash index probe and
      // never recomputes the corpus — here both splits must come from the
      // same pipeline the oracle replays)
      val pairs = DedupOps.simhashPairs(docs, "doc_id", "text", maxDist = 3)
        .select("i", "j").localCheckpoint()
      val assign0 = DedupOps.connectedComponents(
        pairs.where(!isNew(col("i")) && !isNew(col("j"))))
      val newPairs = pairs.where(isNew(col("i")) || isNew(col("j")))
      // inputsMaterialized: pairs are checkpointed above, and assign0's
      // lineage ends in CC's own checkpointed frames — the merge skips its
      // four defensive localCheckpoint barriers (r19)
      DedupOps.mergeComponents(assign0, newPairs, inputsMaterialized = true)
        .groupBy("component")
        .agg(count(lit(1)).as("n_docs"))
    }),

    // embedding cosine near-dup pairs (exact quantized kernel, all pairs)
    "q_dedup_embedding" -> ((s, dir) => {
      SimilarityOps.brutePairs(Tables.embeddings(s, dir), tau = 0.5)
    }),

    // SemDeDup-style semantic dedup: deterministic k-means clusters the
    // embedding space, near-dup pairs are found ONLY within each cluster
    // (cid equi-join bounds the pair space — the sharding that makes
    // semantic dedup tractable at corpus scale), exact cosine verify
    "q_dedup_semantic" -> ((s, dir) => {
      SimilarityOps.semanticDedupPairs(Tables.embeddings(s, dir),
        nCentroids = 8, kmeansIters = 2, tau = 0.4)
    }),

    // SemDeDup with the build/probe split: centroids + cluster members are
    // learned ONCE from the pre-batch corpus (vec_id < 400) into persisted
    // ACID tables; the gated query probes the NEW batch (vec_id >= 400)
    // cluster-locally — assign to the FIXED centroids, verify exact cosine
    // vs indexed members and batch peers. No k-means stage, no indexed-
    // corpus rescan in the probe plan (PlanAuditSpec pins both).
    "q_dedup_semantic_probe" -> ((s, dir) => {
      val idx = annIndexPath(dir, "sem_8_2")
      if (!SimilarityOps.indexExists(s, idx, Seq("centroids", "members")))
        SimilarityOps.buildSemanticIndex(
          Tables.embeddings(s, dir).filter(col("vec_id") < 400),
          nCentroids = 8, kmeansIters = 2, path = idx)
      SimilarityOps.semanticDedupProbe(s, idx,
        Tables.embeddings(s, dir).filter(col("vec_id") >= 400), tau = 0.4)
    }),

    // embedding near-dup via the LSH scale path: bucket candidates (8
    // deterministic hyperplanes), exact cosine verify — oracle-checkable
    // because the bucketing itself is deterministic
    "q_dedup_embedding_lsh" -> ((s, dir) => {
      SimilarityOps.lshNearDupPairs(Tables.embeddings(s, dir), nPlanes = 8, dim = 64, tau = 0.4)
    }),

    // dedup survivor selection: one representative per fingerprint group,
    // highest quality score (doc_id tie-break) wins
    "q_dedup_survivor" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
        .withColumn("fp", TextOps.fingerprint(col("text")))
        .withColumn("q", TextOps.qualityFeatures(col("text")).last._2)
      val w = Window.partitionBy(col("fp")).orderBy(col("q").desc, col("doc_id").asc)
      docs.withColumn("rk", row_number().over(w))
        .groupBy("lang")
        .agg(count(when(col("rk") === 1, 1)).as("n_survivors"),
          count(when(col("rk") > 1, 1)).as("n_removed"))
    }),

    // brute-force cosine top-5 for 20 query vectors
    "q_ann_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      SimilarityOps.bruteTopK(emb.filter(col("vec_id") < 20), emb, k = 5)
    }),

    // MMR diversity rerank: top-12 neighbors of 3 queries, greedy k=4 with
    // lambda=0.7 — each pick trades relevance against max similarity to the
    // already-selected set. Oracle unrolls the 4 greedy stages as CTEs
    "q_mmr_rerank" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      SimilarityOps.mmrRerank(emb.filter(col("vec_id") < 3), emb, n = 12, k = 4)
    }),

    // L2 variant: integer-exact squared distances (|q|^2+|c|^2-2qc), no
    // division/sqrt anywhere — ranks equal true Euclidean ranks
    "q_ann_topk_l2" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      SimilarityOps.bruteTopKL2(emb.filter(col("vec_id") < 20), emb, k = 5)
    }),

    // hyperplane-LSH bucket histogram (8 planes over 64 dims)
    "q_ann_lsh_buckets" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .select(col("vec_id"),
          SimilarityOps.lshBucket(SimilarityOps.quantize(col("embedding")), 8, 64,
            SimilarityOps.mdSign).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec"),
          sum(col("vec_id")).as("sum_vec"))
    }),

    // IVF-partitioned ANN with LEARNED centroids: 2 deterministic k-means
    // iterations (integer floor-div means, first-8 init — oracle-able as
    // fixed arithmetic), then assign to max-cos centroid, probe 2 buckets,
    // score only bucket members
    "q_ann_ivf" -> ((s, dir) => {
      SimilarityOps.ivfTopK(Tables.embeddings(s, dir), nCentroids = 8, probes = 2, k = 3,
        isQuery = col("vec_id") >= 100 && col("vec_id") < 120, kmeansIters = 2)
        .select("query_id", "rk", "neighbor_id", "cos")
    }),

    // product-quantization ANN: 4 subspaces x 8 codes, 1 k-means iteration,
    // ADC scoring — the compressed-index family (codes, not vectors, at
    // scan time); deterministic codebooks make even this oracle-exact
    "q_ann_pq" -> ((s, dir) => {
      SimilarityOps.pqTopK(Tables.embeddings(s, dir), m = 4, kCodes = 8, dim = 64,
        k = 5, isQuery = col("vec_id") >= 100 && col("vec_id") < 110, kmeansIters = 1)
    }),

    // IVF with the build/probe split: the index (learned centroids + corpus
    // assignments) is built ONCE into persisted ACID tables; the gated
    // query is the PROBE ONLY — no k-means stage, no raw-corpus scan
    // (PlanAuditSpec pins both). Same math as q_ann_ivf, so same oracle.
    "q_ann_ivf_probe" -> ((s, dir) => {
      val idx = annIndexPath(dir, "ivf_8_2")
      if (!SimilarityOps.indexExists(s, idx, Seq("centroids", "assignments")))
        SimilarityOps.buildIvfIndex(Tables.embeddings(s, dir), nCentroids = 8,
          kmeansIters = 2, path = idx)
      SimilarityOps.ivfProbe(s, idx,
        Tables.embeddings(s, dir).filter(col("vec_id") >= 100 && col("vec_id") < 120),
        probes = 2, k = 3)
        .select("query_id", "rk", "neighbor_id", "cos")
    }),

    // PQ with the build/probe split: codebooks + codes persisted once; the
    // gated query is ADC probe only. Same math as q_ann_pq, same oracle.
    "q_ann_pq_probe" -> ((s, dir) => {
      val idx = annIndexPath(dir, "pq_4_8")
      if (!SimilarityOps.indexExists(s, idx, Seq("codebooks", "codes")))
        SimilarityOps.buildPqIndex(Tables.embeddings(s, dir), m = 4, kCodes = 8,
          dim = 64, kmeansIters = 1, path = idx)
      SimilarityOps.pqProbe(s, idx,
        Tables.embeddings(s, dir).filter(col("vec_id") >= 100 && col("vec_id") < 110),
        m = 4, dim = 64, k = 5)
    }),

    // the full training-data cleaning pipeline as ONE declarative plan:
    // quality gate -> language-ID agreement -> fingerprint near-dup
    // survivor selection -> per-language corpus stats. One scan, one
    // window shuffle on the (high-cardinality) fingerprint, one final agg.
    "q_pipeline_clean" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val q = TextOps.qualityFeatures(col("text")).last._2
      val kept = Tables.documents(s, dir)
        .withColumn("q", q)
        .filter(col("q") >= 0.5) // quality gate
        .withColumn("agree", (TextOps.langId(col("text")) === col("lang")).cast("long"))
        .withColumn("fp", TextOps.fingerprint(col("text")))
      val w = Window.partitionBy(col("fp")).orderBy(col("q").desc, col("doc_id").asc)
      kept.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("agree")).as("n_lang_agree"),
          sum(TextOps.tokenCount(col("text"))).as("n_tokens"),
          min(col("q")).as("min_q"),
          max(col("q")).as("max_q"))
    }),

    // deterministic dataset assembly: hash-based train/val/test split +
    // hash-Bernoulli subsampling of the train split — stable under dataset
    // growth and retries (never rand()), md5-derived so oracle-exact
    "q_sample_split" -> ((s, dir) => {
      val id = col("doc_id")
      Tables.documents(s, dir)
        .withColumn("split", SampleOps.splitAssign(id))
        .withColumn("sampled",
          (SampleOps.splitAssign(id) === "train" && SampleOps.sampleByRate(id, 0.5))
            .cast("long"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("sampled")).as("n_sampled"),
          sum(TextOps.tokenCount(col("text"))).as("n_tokens"))
    }),

    // deterministic epoch shuffle: every document's (shard, position) for
    // training shard files — a pure function of (seed, doc_id), so the
    // "shuffled" order is reproducible on any engine and stable under
    // retries; per-row exact against the oracle's replay
    "q_shuffle_shards" -> ((s, dir) => {
      SampleOps.deterministicShuffle(Tables.documents(s, dir),
        col("doc_id"), seed = "ep0", nShards = 8)
        .select(col("doc_id"), col("shard"), col("pos"))
    }),

    // token-budget sequence packing (streaming concat-and-cut, per source
    // shard): per-chunk document and token totals
    "q_pack_chunks" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("n_tok", TextOps.tokenCount(col("text")))
      SampleOps.packChunks(docs, col("source"), col("doc_id"), col("n_tok"), budget = 2000L)
        .groupBy("source", "chunk")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("chunk_tokens"))
    }),

    // sliding token-window chunking (40-token chunks, stride 30 -> 10-token
    // overlap): the RAG/pretraining chunk shape, hashed per chunk
    "q_text_chunks" -> ((s, dir) => {
      Tables.documents(s, dir).filter(col("doc_id") % 9 === 0)
        .select(col("doc_id"),
          explode(TextOps.slidingChunks(col("text"), chunkTokens = 40, stride = 30)).as("c"))
        .select(col("doc_id"), col("c.start").as("start"), col("c.n_tok").as("n_tok"),
          md5(col("c.chunk_text")).as("chunk_hash"))
    }),

    // crawl-to-corpus markup stripping: deterministic HTML built around
    // each document (script/style blocks with <,> inside, tags, entities),
    // stripped back to text — the md5 gate means both engines ran the
    // IDENTICAL RE2-compatible regex pipeline over every byte
    "q_text_strip_html" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><title>d</title><style type=\"text/css\">p { margin: 0; }" +
          "</style><script>var x = 1 < 2 && 3 > 2;</script></head><body><h1>Doc "),
        col("doc_id"),
        lit("</h1><p class=\"main\">"), col("text"),
        lit("</p><br/><div>Tom &amp; Jerry &lt;3 &quot;q&quot;&nbsp;&#39;s</div></body></html>"))
      Tables.documents(s, dir).filter(col("doc_id") % 8 === 0)
        .select(col("doc_id"), TextOps.stripMarkup(html).as("clean"))
        .select(col("doc_id"), md5(col("clean")).as("clean_md5"),
          length(col("clean")).cast("long").as("n_chars"),
          TextOps.tokenCount(col("clean")).as("n_tokens"))
    }),

    // data mixing: per-source keep rates hitting a token budget's weight
    // shares — INTEGER arithmetic end to end (budget*w div ΣW, then
    // target*1e6 div total), hash-Bernoulli keep, so the mixed subset is a
    // pure function of the corpus and reproduces bit-exactly in DuckDB
    "q_mixture_sample" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("toks", TextOps.tokenCount(col("text")))
        .withColumn("wt", substring(col("source"), 4, 10).cast("long") % 4 + 1)
      SampleOps.mixtureSample(docs, "source", col("wt"), col("doc_id"),
        col("toks"), budgetTokens = 5000L)
        .groupBy("source")
        .agg(min("rate_ppm").as("rate_ppm"), count(lit(1)).as("n_kept"),
          sum("toks").as("tokens_kept"))
    }),

    // leakage-safe split: a document's train/val/test assignment keys on
    // its near-dup cluster representative, so paraphrase clusters land in
    // ONE split (the contamination path a per-doc split cannot see) —
    // per-row exact against the oracle's recursive-CTE component replay
    "q_split_leakage_safe" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = DedupOps.simhashPairs(docs, "doc_id", "text", maxDist = 3)
        .select("i", "j")
      SampleOps.leakageSafeSplit(docs, col("doc_id"), pairs)
        .select(col("doc_id"), col("rep_id"), col("split"))
    }),

    // the repetition face of data mixing: a budget larger than the corpus
    // makes every source repeat (epochs of full passes + a hash-Bernoulli
    // tail), each copy tagged with its 0-based epoch — per-(source, epoch)
    // doc/token totals replayed exactly by the oracle's generate_series
    "q_mixture_epochs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("toks", TextOps.tokenCount(col("text")))
        .withColumn("wt", substring(col("source"), 4, 10).cast("long") % 4 + 1)
      SampleOps.mixtureOversample(docs, "source", col("wt"), col("doc_id"),
        col("toks"), budgetTokens = 1000000L)
        .groupBy("source", "epoch")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
    }),

    // real merge-table BPE: segmentation + token counts as ONE codegen'd
    // replace-chain expression (no UDF); the oracle unrolls the identical
    // merge steps in DuckDB SQL, so a single mis-applied rule anywhere in
    // the chain breaks the segment md5
    "q_text_bpe" -> ((s, dir) => {
      Tables.documents(s, dir).filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          md5(TextOps.bpeSegment(col("text"))).as("seg_md5"),
          TextOps.bpeTokenCount(col("text")).as("n_bpe"),
          TextOps.tokenCount(col("text")).as("n_ws"))
    }),

    // BPE tokenizer TRAINING in-engine (Sennrich et al. 2016): 6 rounds of
    // count-all-adjacent-pairs -> merge-the-most-frequent, each round one
    // distributed aggregation + a 1-row argmax collect. The oracle replays
    // the trajectory with every round's DATA-DEPENDENT choice made by its
    // own scalar subquery feeding the next round's replace pattern
    "q_bpe_train" -> ((s, dir) => {
      val merges = TextOps.bpeTrain(Tables.documents(s, dir), "text", nMerges = 6)
      import s.implicits._
      merges.zipWithIndex
        .map { case ((x, y, c), i) => ((i + 1).toLong, x, y, c) }
        .toDF("rank", "x", "y", "cnt")
    }),

    // Gopher-style repetition filter: duplicate 2/3-gram fractions + top
    // bigram share per document, verdict at the conventional thresholds —
    // one explode pass, two hash aggregations, oracle recomputes the same
    // n-gram arithmetic with DuckDB list functions
    "q_text_repetition" -> ((s, dir) => {
      TextOps.repetitionReport(
        Tables.documents(s, dir).filter(col("doc_id") % 9 === 0))
    }),

    // order-sensitive rolling (polynomial) fingerprint
    "q_text_rolling_fp" -> ((s, dir) => {
      Tables.documents(s, dir).filter(col("doc_id") % 13 === 0)
        .select(col("doc_id"), TextOps.rollingFingerprint(col("text")).as("roll_fp"))
    }),

    // REAL codec gate, audio: Spark synthesizes WAV bytes and decodes them
    // with the actual RIFF/PCM parser; the oracle recomputes every feature
    // in closed form from the synth parameters — a decode bug on either
    // side of the container roundtrip breaks the hash
    "q_audio_decode" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir).filter(col("doc_id") % 4 === 0)
        .select(col("doc_id")).as[Long]
        .map(id => MultimodalOps.MediaRow(id, MultimodalOps.synthWave(id), "audio"))
      MultimodalOps.decodeAudio(media).toDF()
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("n_frames"), col("duration_us"), col("rms"), col("peak"))
    }),

    // REAL codec gate, image: BMP encode -> parse -> feature-extract ->
    // 4x4 average-pooled thumbnail, vs the oracle's pixel-function
    // arithmetic over generate_series (no BMP parsing in DuckDB — the two
    // sides agree only if the byte-level roundtrip is faithful)
    "q_image_decode" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir).filter(col("doc_id") % 5 === 0)
        .select(col("doc_id")).as[Long]
        .map(id => MultimodalOps.MediaRow(id, MultimodalOps.synthImage(id), "image"))
      MultimodalOps.decodeImages(media).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("mean_lum"),
          md5(concat_ws("_", col("thumb").cast("array<string>"))).as("thumb_md5"))
    }),

    // REAL container gate, video: AVI header + movi frame-index parsing,
    // every 2nd frame sliced from the container and content-hashed; the
    // oracle recomputes the frame payload hashes in closed form
    "q_video_frames" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir).filter(col("doc_id") % 6 === 0)
        .select(col("doc_id")).as[Long]
        .map(id => MultimodalOps.MediaRow(id, MultimodalOps.synthVideo(id), "video"))
      MultimodalOps.decodeVideos(media, stride = 2).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("n_frames"),
          col("duration_us"), md5(concat_ws("_", col("sampled_hashes"))).as("frames_md5"))
    }),

    // REAL frame-PAYLOAD gate, video: every 2nd uncompressed (00db) frame
    // is located via the container index and pixel-decoded (gradient +
    // frame-shifted checker) — per-frame luminance + pooled thumbnail vs
    // the oracle's pixel-function arithmetic over generate_series
    "q_video_pixels" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir).filter(col("doc_id") % 6 === 0)
        .select(col("doc_id")).as[Long]
        .map(id => MultimodalOps.MediaRow(id, MultimodalOps.synthVideoDib(id), "video"))
      MultimodalOps.decodeVideoPixels(media, stride = 2).toDF()
        .filter(col("ok"))
        .select(col("doc_id"), col("frame_idx"), col("width"), col("height"), col("mean_lum"),
          md5(concat_ws("_", col("thumb").cast("array<string>"))).as("thumb_md5"))
    }),

    // REAL compressed-codec gate, video: every 2nd MJPEG (00dc) frame is
    // located via the container index and decoded through the ACTUAL
    // baseline-JPEG pipeline — Huffman entropy decode, dequant, IDCT. The
    // fixture frames are per-8x8-block-constant (DC-only, unit quant), the
    // one JPEG family that decodes bit-exactly, so the oracle recomputes
    // the features closed-form with no JPEG in DuckDB — the sides agree
    // only if the whole entropy-coded roundtrip is faithful
    "q_video_mjpeg" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir).filter(col("doc_id") % 6 === 3)
        .select(col("doc_id")).as[Long]
        .map(id => MultimodalOps.MediaRow(id, MultimodalOps.synthVideoMjpeg(id), "video"))
      MultimodalOps.decodeVideoPixels(media, stride = 2).toDF()
        .filter(col("ok"))
        .select(col("doc_id"), col("frame_idx"), col("width"), col("height"), col("mean_lum"),
          md5(concat_ws("_", col("thumb").cast("array<string>"))).as("thumb_md5"))
    }),

    // REAL codec gate, all modalities: each document's payload is genuine
    // container bytes (BMP / WAV / AVI per doc_id % 3) and every output
    // column is DECODER-derived — dimensions from the BMP/AVI headers,
    // frame counts and durations from the WAV/AVI containers. The oracle
    // recomputes the features closed-form from the synth parameters (no
    // codecs in DuckDB), so the two sides agree only if the byte-level
    // encode -> parse roundtrip is faithful for all three formats.
    "q_multimodal_meta" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir).filter(col("doc_id") % 5 === 0)
        .select(col("doc_id")).as[Long]
        .map(MultimodalOps.synthMedia)
      MultimodalOps.decodeMeta(media).toDF()
        .filter(col("ok"))
        .select(col("doc_id"), col("modality"), col("n_bytes"),
          col("width"), col("height"), col("n_frames"), col("duration_us"))
    }),

    // planted-copy media queries shift copies to doc_id + mediaIdShift(..);
    // the guard inside asserts the corpus can't collide with the shift
    // (a fixture grown past 1e6 ids fails loudly instead of silently
    // merging an original with its planted copy in the oracle's GROUP BY)

    // image near-dup dedup via integer pHash: REAL BMP decode -> 8x8 pooled
    // grayscale -> integer DCT sign hash (MultimodalOps.phash60) -> 4x15-bit
    // banded self-join (the SimHash shape) -> Hamming verify on candidates
    // only. The corpus plants an exact copy of every image under a shifted
    // id; the oracle recomputes pixels, pooling, DCT (same hardcoded cosine
    // table) and banding closed-form in SQL. Never image-pairwise: the only
    // shuffle is the (band index, band) equi-join.
    "q_image_phash" -> ((s, dir) => {
      import s.implicits._
      val shift = mediaIdShift(s, dir)
      val base = Tables.documents(s, dir).filter(col("doc_id") % 10 === 0)
        .select(col("doc_id")).as[Long]
      val corpus = base.flatMap(id => Seq(
        MultimodalOps.MediaRow(id, MultimodalOps.synthImage(id), "image"),
        MultimodalOps.MediaRow(id + shift, MultimodalOps.synthImage(id), "image")))
      bandedHammingPairs(
        MultimodalOps.imagePhash(corpus).toDF().filter(col("ok"))
          .select(col("doc_id"), col("phash").as("h")), maxHamming = 6)
    }),

    // audio near-dup dedup via acoustic fingerprint: REAL WAV decode ->
    // 60-bit polarity/periodicity contour hash (MultimodalOps
    // .audioFingerprint) -> the same 4x15-bit banded join + Hamming verify
    // as q_image_phash. Exact copies planted under shifted ids; the oracle
    // recomputes samples, frame contours, per-family medians and banding
    // closed-form from the square-wave synth parameters.
    "q_audio_fingerprint" -> ((s, dir) => {
      import s.implicits._
      val shift = mediaIdShift(s, dir)
      val base = Tables.documents(s, dir).filter(col("doc_id") % 8 === 0)
        .select(col("doc_id")).as[Long]
      val corpus = base.flatMap(id => Seq(
        MultimodalOps.MediaRow(id, MultimodalOps.synthWave(id), "audio"),
        MultimodalOps.MediaRow(id + shift, MultimodalOps.synthWave(id), "audio")))
      bandedHammingPairs(
        MultimodalOps.audioFingerprint(corpus).toDF().filter(col("ok"))
          .select(col("doc_id"), col("afp").as("h")), maxHamming = 6)
    }),

    // incremental image dedup: fingerprint index built ONCE (decode + DCT
    // per image paid once ever, persisted as TxLogTables), each new batch
    // probed against it via the band equi-join — the indexed corpus is
    // never re-decoded. The image analogue of q_dedup_incremental.
    "q_image_phash_probe" -> ((s, dir) => {
      import s.implicits._
      val idx = annIndexPath(dir, "phash")
      if (!SimilarityOps.indexExists(s, idx, Seq("hashes", "bands")))
        MultimodalOps.buildPhashIndex(
          Tables.documents(s, dir).filter(col("doc_id") % 10 === 0)
            .select(col("doc_id")).as[Long]
            .map(id => MultimodalOps.MediaRow(id, MultimodalOps.synthImage(id), "image")),
          idx)
      val shift = mediaIdShift(s, dir)
      val probe = Tables.documents(s, dir).filter(col("doc_id") % 20 === 0)
        .select(col("doc_id")).as[Long]
        .map(id => MultimodalOps.MediaRow(id + shift, MultimodalOps.synthImage(id), "image"))
      MultimodalOps.phashProbe(probe, idx, maxHamming = 6)
    }),

    // video near-dup dedup via per-frame pHash: REAL AVI container index ->
    // per-frame DIB pixel decode -> 8x8 pooled grayscale -> the SAME
    // integer-DCT phash60 as still images -> videos joined on exact frame
    // hashes (60-bit equi-join, no banding needed at frame granularity) ->
    // pairs sharing >= 2 distinct frame hashes. Candidates come from the
    // hash equi-join only — never video-pairwise.
    "q_video_phash" -> ((s, dir) => {
      import s.implicits._
      val shift = mediaIdShift(s, dir)
      val base = Tables.documents(s, dir).filter(col("doc_id") % 12 === 0)
        .select(col("doc_id")).as[Long]
      val corpus = base.flatMap(id => Seq(
        MultimodalOps.MediaRow(id, MultimodalOps.synthVideoDib(id), "video"),
        MultimodalOps.MediaRow(id + shift, MultimodalOps.synthVideoDib(id), "video")))
      val fp = MultimodalOps.decodeVideoPixels(corpus, stride = 1, poolSize = 8)
        .filter(_.ok)
        .map(v => (v.doc_id, MultimodalOps.phash60(v.thumb.toArray)))
        .toDF("doc_id", "phash").distinct()
      val a = fp.select(col("phash"), col("doc_id").as("doc_a"))
      val b = fp.select(col("phash"), col("doc_id").as("doc_b"))
      a.join(b, Seq("phash")).filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
    })
  )

  /** Banded near-dup candidate join over a 60-bit fingerprint column `h`:
    * 4x15-bit bands -> (band index, band) equi-join -> distinct pairs ->
    * Hamming verify on candidates only. The only shuffle is the band
    * equi-join — never fingerprint-pairwise (the SimHash blocking shape,
    * shared by the image pHash and audio fingerprint dedup).
    */
  private def bandedHammingPairs(hashed: DataFrame, maxHamming: Int): DataFrame = {
    val bands = hashed.select(col("doc_id"), col("h"),
      explode(array((0 until 4).map(k => struct(lit(k).as("k"),
        shiftright(col("h"), 15 * k).bitwiseAND(lit(32767L)).as("band"))): _*)).as("bk"))
      .select(col("doc_id"), col("h"), col("bk.k").as("k"), col("bk.band").as("band"))
    val a = bands.select(col("k"), col("band"), col("doc_id").as("doc_a"), col("h").as("ha"))
    val b = bands.select(col("k"), col("band"), col("doc_id").as("doc_b"), col("h").as("hb"))
    a.join(b, Seq("k", "band")).filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "ha", "hb").distinct()
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  def oracleSql: Map[String, String] = Map(
    "q_text_stats" ->
      s"""SELECT doc_id,
         |  len($toksSql) AS n_tokens_ws,
         |  len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_tokens_re,
         |  length(text) AS n_chars,
         |  len(list_distinct($toksSql)) AS n_distinct
         |FROM documents WHERE doc_id % 7 = 0""".stripMargin,

    "q_text_langid" ->
      s"""WITH t AS (SELECT lang, $toksSql AS toks FROM documents),
         |scored AS (SELECT lang, ${stopSql("de")} AS s_de, ${stopSql("en")} AS s_en,
         |    ${stopSql("es")} AS s_es, ${stopSql("fr")} AS s_fr FROM t)
         |SELECT CASE
         |    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
         |    WHEN s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
         |    WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
         |    WHEN s_fr > 0 THEN 'fr'
         |    ELSE 'und' END AS langid,
         |  lang, count(*) AS n
         |FROM scored GROUP BY 1, 2""".stripMargin,

    "q_text_quality" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents WHERE doc_id % 11 = 0)
         |SELECT doc_id,
         |  len(toks) AS n_tokens,
         |  length(text) AS n_chars,
         |  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS distinct_ratio,
         |  CAST(${stopSql("en")} AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS stop_ratio,
         |  0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
         |    + 0.4 * least(1.0, CAST(len(toks) AS DOUBLE) / 50.0)
         |    + 0.2 * (CAST(${stopSql("en")} AS DOUBLE) / CAST(len(toks) AS DOUBLE)) AS quality_score
         |FROM t""".stripMargin,

    "q_lm_perplexity" ->
      s"""WITH $lmAggSql
         |SELECT doc_id, n_bigrams, avg_logprob FROM agg""".stripMargin,

    "q_ccnet_buckets" ->
      s"""WITH $lmAggSql,
         |th AS (SELECT quantile_cont(avg_logprob, 1.0/3.0) AS t1,
         |    quantile_cont(avg_logprob, 2.0/3.0) AS t2 FROM agg)
         |SELECT doc_id, avg_logprob,
         |  CASE WHEN avg_logprob >= t2 THEN 'head'
         |       WHEN avg_logprob >= t1 THEN 'middle' ELSE 'tail' END AS bucket,
         |  avg_logprob >= t1 AS kept
         |FROM agg, th""".stripMargin,

    "q_text_ngrams" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |bg AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] AS bigram
         |  FROM d, UNNEST(generate_series(1, len(toks) - 1)) AS t(i)),
         |counts AS (SELECT bigram, count(DISTINCT doc_id) AS doc_freq FROM bg GROUP BY 1)
         |SELECT bigram, doc_freq, rk FROM (
         |  SELECT *, row_number() OVER (ORDER BY doc_freq DESC, bigram) AS rk FROM counts)
         |WHERE rk <= 10""".stripMargin,

    "q_text_fingerprint" ->
      """SELECT source, count(*) AS n_docs,
        |  count(DISTINCT md5(array_to_string(list_sort(list_distinct(string_split(lower(trim(text)), ' '))), ' '))) AS n_unique,
        |  count(*) - count(DISTINCT md5(array_to_string(list_sort(list_distinct(string_split(lower(trim(text)), ' '))), ' '))) AS n_dups
        |FROM documents GROUP BY 1""".stripMargin,

    "q_dedup_exact" ->
      """SELECT lang, count(*) AS n_docs,
        |  count(DISTINCT md5(lower(trim(text)))) AS n_unique,
        |  count(*) - count(DISTINCT md5(lower(trim(text)))) AS n_dups
        |FROM documents GROUP BY 1""".stripMargin,

    // joins on the 60-bit md5 shingle hash, mirroring the engine's
    // narrowed shuffle key (DedupOps.shingles60 — r19): identical results
    // up to the documented ~2^30 birthday bound, compared like-for-like
    "q_dedup_jaccard" ->
      s"""WITH $shinglesSql,
         |hh AS (SELECT doc_id, ${hash60Sql("shingle")} AS h60 FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS n FROM hh GROUP BY 1),
         |shared AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
         |  FROM hh a JOIN hh b ON a.h60 = b.h60 AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT i, j, CAST(c AS DOUBLE) / CAST(si.n + sj.n - c AS DOUBLE) AS jaccard
         |FROM shared JOIN sizes si ON si.doc_id = i JOIN sizes sj ON sj.doc_id = j
         |WHERE CAST(c AS DOUBLE) / CAST(si.n + sj.n - c AS DOUBLE) >= 0.5""".stripMargin,

    // verify joins on the 60-bit shingle hash — the engine's narrowed
    // shuffle/index key (DedupOps.shingles60, r19); sig takes h60 mod M
    // exactly as minhashSignatures takes pmod(sh60, M)
    "q_dedup_minhash" ->
      s"""WITH $shinglesSql,
         |hh AS (SELECT doc_id, ${hash60Sql("shingle")} AS h60 FROM sh),
         |h AS (SELECT doc_id, h60 % 1000000007 AS h FROM hh),
         |sig AS (SELECT doc_id, i, min(((7919*i + 17) * h + (104729*i + 31)) % 1000000007) AS mh
         |  FROM h, UNNEST(generate_series(0, 11)) AS t(i) GROUP BY 1, 2),
         |bands AS (SELECT doc_id, i // 2 AS band,
         |    md5(string_agg(CAST(mh AS VARCHAR), '_' ORDER BY i)) AS bv
         |  FROM sig GROUP BY doc_id, i // 2),
         |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, count(*) AS n FROM hh GROUP BY 1),
         |shared AS (SELECT c.i, c.j, count(*) AS c
         |  FROM cand c JOIN hh si ON si.doc_id = c.i
         |  JOIN hh sj ON sj.doc_id = c.j AND sj.h60 = si.h60 GROUP BY 1, 2)
         |SELECT i, j, CAST(c AS DOUBLE) / CAST(si.n + sj.n - c AS DOUBLE) AS jaccard
         |FROM shared JOIN sizes si ON si.doc_id = i JOIN sizes sj ON sj.doc_id = j
         |WHERE CAST(c AS DOUBLE) / CAST(si.n + sj.n - c AS DOUBLE) >= 0.5""".stripMargin,

    // the one-shot minhash pipeline with the candidate space restricted to
    // pairs touching the "new batch" — exactly what the persisted-index
    // probe computes (index = base corpus, probe = batch)
    "q_dedup_incremental" ->
      s"""WITH $shinglesSql,
         |hh AS (SELECT doc_id, ${hash60Sql("shingle")} AS h60 FROM sh),
         |h AS (SELECT doc_id, h60 % 1000000007 AS h FROM hh),
         |sig AS (SELECT doc_id, i, min(((7919*i + 17) * h + (104729*i + 31)) % 1000000007) AS mh
         |  FROM h, UNNEST(generate_series(0, 11)) AS t(i) GROUP BY 1, 2),
         |bands AS (SELECT doc_id, i // 2 AS band,
         |    md5(string_agg(CAST(mh AS VARCHAR), '_' ORDER BY i)) AS bv
         |  FROM sig GROUP BY doc_id, i // 2),
         |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
         |  WHERE a.doc_id % 10 = 0 OR b.doc_id % 10 = 0),
         |sizes AS (SELECT doc_id, count(*) AS n FROM hh GROUP BY 1),
         |shared AS (SELECT c.i, c.j, count(*) AS c
         |  FROM cand c JOIN hh si ON si.doc_id = c.i
         |  JOIN hh sj ON sj.doc_id = c.j AND sj.h60 = si.h60 GROUP BY 1, 2)
         |SELECT i, j, CAST(c AS DOUBLE) / CAST(si.n + sj.n - c AS DOUBLE) AS jaccard
         |FROM shared JOIN sizes si ON si.doc_id = i JOIN sizes sj ON sj.doc_id = j
         |WHERE CAST(c AS DOUBLE) / CAST(si.n + sj.n - c AS DOUBLE) >= 0.5""".stripMargin,

    "q_dedup_simhash" ->
      s"""WITH ${simhashCtes()}
         |$simhashPairSelect""".stripMargin,

    // duplicated-window offsets (length-30 windows with corpus count >= 2)
    // merged gaps-and-islands into maximal half-open spans — mirrors
    // DedupOps.duplicateSpans including the hash60 window key
    "q_dedup_substring" ->
      s"""WITH $substringSpansSql
         |SELECT doc_id, span_start, span_end, span_len FROM spans""".stripMargin,

    // the spans pipeline, then reconstruction: inter-span gaps in order
    // plus the tail — mirrors DedupOps.removeDuplicateSpans
    "q_dedup_substring_clean" ->
      s"""WITH $substringSpansSql,
         |pe AS (SELECT doc_id, span_start, span_end, span_len,
         |    coalesce(lag(span_end) OVER (PARTITION BY doc_id ORDER BY span_start), 0) AS prev_end
         |  FROM spans),
         |a AS (SELECT p.doc_id,
         |    string_agg(substr(d.text, CAST(p.prev_end + 1 AS INTEGER),
         |      CAST(p.span_start - p.prev_end AS INTEGER)), '' ORDER BY p.span_start) AS kept,
         |    max(p.span_end) AS last_end,
         |    CAST(count(*) AS BIGINT) AS n_spans,
         |    CAST(sum(p.span_len) AS BIGINT) AS removed_chars
         |  FROM pe p JOIN documents d ON d.doc_id = p.doc_id GROUP BY 1),
         |c AS (SELECT d.doc_id,
         |    CASE WHEN a.doc_id IS NULL THEN d.text
         |      ELSE a.kept || substr(d.text, CAST(a.last_end + 1 AS INTEGER)) END AS clean,
         |    coalesce(a.n_spans, 0) AS n_spans,
         |    coalesce(a.removed_chars, 0) AS removed_chars
         |  FROM documents d LEFT JOIN a ON a.doc_id = d.doc_id)
         |SELECT doc_id, CAST(length(clean) AS BIGINT) AS clean_len, removed_chars,
         |  n_spans, md5(clean) AS clean_md5
         |FROM c""".stripMargin,

    // the IVF oracle's unrolled k-means + assignment prefix, then
    // within-cluster pairs with exact quantized cosine — mirrors
    // SimilarityOps.semanticDedupPairs
    "q_dedup_semantic" ->
      s"""WITH $quantSql,
         |${kmeansAssignedSql(8, 2)}
         |SELECT a.cid, a.vec_id AS i, b.vec_id AS j,
         |  ${cosSql("a.qv", "a.nq", "b.qv", "b.nq")} AS cos
         |FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.qv", "a.nq", "b.qv", "b.nq")} >= 0.4""".stripMargin,

    // the semantic-probe oracle: replay the BUILD (k-means + assignment
    // over the pre-batch corpus only), assign the batch to the FINAL
    // centroids, then member↔batch and batch↔batch within-cluster pairs
    // with exact quantized cosine — mirrors SimilarityOps.semanticDedupProbe
    "q_dedup_semantic_probe" ->
      s"""WITH $quantSql,
         |old AS (SELECT vec_id, qv, nq FROM n WHERE vec_id < 400),
         |${kmeansAssignedSql(8, 2, src = "old")},
         |batch AS (SELECT vec_id, qv, nq FROM n WHERE vec_id >= 400),
         |bassign AS (SELECT vec_id, qv, nq, cid FROM (
         |    SELECT b.vec_id, b.qv, b.nq, c.cid,
         |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
         |        ${cosSql("b.qv", "b.nq", "c.cv", "c.cn")} DESC, c.cid) AS crk
         |    FROM batch b, cents2 c) WHERE crk = 1),
         |mb AS (SELECT a.cid, least(a.vec_id, b.vec_id) AS i,
         |    greatest(a.vec_id, b.vec_id) AS j,
         |    ${cosSql("a.qv", "a.nq", "b.qv", "b.nq")} AS cos
         |  FROM assigned a JOIN bassign b
         |    ON a.cid = b.cid AND a.vec_id <> b.vec_id),
         |bb AS (SELECT a.cid, a.vec_id AS i, b.vec_id AS j,
         |    ${cosSql("a.qv", "a.nq", "b.qv", "b.nq")} AS cos
         |  FROM bassign a JOIN bassign b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id)
         |SELECT cid, i, j, cos FROM (SELECT * FROM mb UNION ALL SELECT * FROM bb)
         |WHERE cos >= 0.4""".stripMargin,

    "q_dedup_clusters" ->
      s"""WITH RECURSIVE ${simhashCtes()},
         |pairs AS ($simhashPairSelect),
         |edges AS (SELECT i AS src, j AS dst FROM pairs UNION ALL SELECT j, i FROM pairs),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |reach(node, lbl) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
         |cc AS (SELECT node, min(lbl) AS component FROM reach GROUP BY 1)
         |SELECT component, count(*) AS n_docs FROM cc GROUP BY 1""".stripMargin,

    // the incremental query's oracle is the FROM-SCRATCH clustering over
    // the full pair set — identical SQL to q_dedup_clusters; the batch
    // split exists only on the Spark side, so a hash match proves
    // incremental fold == full recompute
    "q_dedup_clusters_incremental" ->
      s"""WITH RECURSIVE ${simhashCtes()},
         |pairs AS ($simhashPairSelect),
         |edges AS (SELECT i AS src, j AS dst FROM pairs UNION ALL SELECT j, i FROM pairs),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |reach(node, lbl) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
         |cc AS (SELECT node, min(lbl) AS component FROM reach GROUP BY 1)
         |SELECT component, count(*) AS n_docs FROM cc GROUP BY 1""".stripMargin,

    "q_dedup_embedding" ->
      s"""WITH $quantSql
         |SELECT a.vec_id AS i, b.vec_id AS j,
         |  CAST(${dotSql("a.qv", "b.qv")} AS DOUBLE)
         |    / sqrt(CAST(a.nq AS DOUBLE) * CAST(b.nq AS DOUBLE)) AS cos
         |FROM n a JOIN n b ON a.vec_id < b.vec_id
         |WHERE CAST(${dotSql("a.qv", "b.qv")} AS DOUBLE)
         |    / sqrt(CAST(a.nq AS DOUBLE) * CAST(b.nq AS DOUBLE)) >= 0.5""".stripMargin,

    "q_dedup_embedding_lsh" ->
      s"""WITH $quantSql,
         |planes AS (SELECT m, i,
         |    CASE WHEN ${hash60Sql("'hp' || CAST(m AS VARCHAR) || '_' || CAST(i AS VARCHAR)")} % 2 = 1
         |         THEN 1 ELSE -1 END AS s
         |  FROM UNNEST(generate_series(0, 7)) AS t(m), UNNEST(generate_series(0, 63)) AS u(i)),
         |dots AS (SELECT vec_id, m, sum(qv[i + 1] * s) AS dot FROM q, planes GROUP BY 1, 2),
         |buckets AS (SELECT vec_id, CAST(sum(CASE WHEN dot > 0 THEN 1::BIGINT << m ELSE 0 END) AS BIGINT) AS bucket
         |  FROM dots GROUP BY 1),
         |cand AS (SELECT ba.vec_id AS i, bb.vec_id AS j
         |  FROM buckets ba JOIN buckets bb ON ba.bucket = bb.bucket AND ba.vec_id < bb.vec_id)
         |SELECT c.i, c.j,
         |  CAST(${dotSql("a.qv", "b.qv")} AS DOUBLE)
         |    / sqrt(CAST(a.nq AS DOUBLE) * CAST(b.nq AS DOUBLE)) AS cos
         |FROM cand c JOIN n a ON a.vec_id = c.i JOIN n b ON b.vec_id = c.j
         |WHERE CAST(${dotSql("a.qv", "b.qv")} AS DOUBLE)
         |    / sqrt(CAST(a.nq AS DOUBLE) * CAST(b.nq AS DOUBLE)) >= 0.4""".stripMargin,

    "q_dedup_survivor" ->
      s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks,
         |    md5(array_to_string(list_sort(list_distinct(string_split(lower(trim(text)), ' '))), ' ')) AS fp
         |  FROM documents),
         |scored AS (SELECT doc_id, lang, fp,
         |    0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
         |      + 0.4 * least(1.0, CAST(len(toks) AS DOUBLE) / 50.0)
         |      + 0.2 * (CAST(${stopSql("en")} AS DOUBLE) / CAST(len(toks) AS DOUBLE)) AS q
         |  FROM t),
         |ranked AS (SELECT lang, row_number() OVER (PARTITION BY fp ORDER BY q DESC, doc_id) AS rk
         |  FROM scored)
         |SELECT lang, count(*) FILTER (WHERE rk = 1) AS n_survivors,
         |  count(*) FILTER (WHERE rk > 1) AS n_removed
         |FROM ranked GROUP BY 1""".stripMargin,

    "q_ann_topk" ->
      s"""WITH $quantSql,
         |scored AS (SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
         |    CAST(${dotSql("b.qv", "a.qv")} AS DOUBLE)
         |      / sqrt(CAST(b.nq AS DOUBLE) * CAST(a.nq AS DOUBLE)) AS cos
         |  FROM n a JOIN n b ON b.vec_id < 20 AND a.vec_id <> b.vec_id),
         |ranked AS (SELECT query_id, neighbor_id, cos,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM scored)
         |SELECT query_id, neighbor_id, cos, rk FROM ranked WHERE rk <= 5""".stripMargin,

    "q_mmr_rerank" ->
      s"""WITH $quantSql,
         |scored0 AS (SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
         |    CAST(${dotSql("b.qv", "a.qv")} AS DOUBLE)
         |      / sqrt(CAST(b.nq AS DOUBLE) * CAST(a.nq AS DOUBLE)) AS cos
         |  FROM n a JOIN n b ON b.vec_id < 3 AND a.vec_id <> b.vec_id),
         |cand AS (SELECT query_id, neighbor_id, cos, rk FROM (
         |    SELECT query_id, neighbor_id, cos, row_number() OVER (
         |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
         |    FROM scored0) WHERE rk <= 12),
         |pr AS (SELECT a.query_id, a.neighbor_id AS i, b.neighbor_id AS j,
         |    CAST(${dotSql("na.qv", "nb.qv")} AS DOUBLE)
         |      / sqrt(CAST(na.nq AS DOUBLE) * CAST(nb.nq AS DOUBLE)) AS sim
         |  FROM cand a JOIN cand b
         |    ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id
         |  JOIN n na ON na.vec_id = a.neighbor_id
         |  JOIN n nb ON nb.vec_id = b.neighbor_id),
         |s1 AS (SELECT query_id, neighbor_id AS sel_id, CAST(1 AS BIGINT) AS step,
         |    0.7 * cos - 0.3 * 0.0 AS score FROM cand WHERE rk = 1),
         |sel1 AS (SELECT query_id, sel_id FROM s1),
         |${mmrStageSql(2)},
         |${mmrStageSql(3)},
         |${mmrStageSql(4)}
         |SELECT query_id, step, sel_id, score FROM s1
         |UNION ALL SELECT query_id, step, sel_id, score FROM s2
         |UNION ALL SELECT query_id, step, sel_id, score FROM s3
         |UNION ALL SELECT query_id, step, sel_id, score FROM s4""".stripMargin,

    "q_ann_topk_l2" ->
      s"""WITH $quantSql,
         |scored AS (SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
         |    CAST(b.nq AS BIGINT) + CAST(a.nq AS BIGINT)
         |      - 2 * ${dotSql("b.qv", "a.qv")} AS dist2
         |  FROM n a JOIN n b ON b.vec_id < 20 AND a.vec_id <> b.vec_id),
         |ranked AS (SELECT query_id, neighbor_id, dist2,
         |    row_number() OVER (PARTITION BY query_id ORDER BY dist2, neighbor_id) AS rk
         |  FROM scored)
         |SELECT query_id, neighbor_id, CAST(dist2 AS BIGINT) AS dist2, rk
         |FROM ranked WHERE rk <= 5""".stripMargin,

    "q_ann_lsh_buckets" ->
      s"""WITH q AS (SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS qv FROM embeddings),
         |planes AS (SELECT m, i,
         |    CASE WHEN ${hash60Sql("'hp' || CAST(m AS VARCHAR) || '_' || CAST(i AS VARCHAR)")} % 2 = 1
         |         THEN 1 ELSE -1 END AS s
         |  FROM UNNEST(generate_series(0, 7)) AS t(m), UNNEST(generate_series(0, 63)) AS u(i)),
         |dots AS (SELECT vec_id, m, sum(qv[i + 1] * s) AS dot
         |  FROM q, planes GROUP BY 1, 2),
         |buckets AS (SELECT vec_id, CAST(sum(CASE WHEN dot > 0 THEN 1::BIGINT << m ELSE 0 END) AS BIGINT) AS bucket
         |  FROM dots GROUP BY 1)
         |SELECT bucket, count(*) AS n_vecs, min(vec_id) AS min_vec, CAST(sum(vec_id) AS BIGINT) AS sum_vec
         |FROM buckets GROUP BY 1""".stripMargin,

    "q_ann_ivf" -> ivfOracleSql(nCentroids = 8, probes = 2, topK = 3, iters = 2),

    "q_ann_pq" -> pqOracleSql(m = 4, kCodes = 8, subLen = 16, topK = 5, iters = 1),

    "q_text_strip_html" ->
      s"""WITH h AS (SELECT doc_id,
         |    '<html><head><title>d</title><style type="text/css">p { margin: 0; }'
         |      || '</style><script>var x = 1 < 2 && 3 > 2;</script></head><body><h1>Doc '
         |      || CAST(doc_id AS VARCHAR) || '</h1><p class="main">' || text
         |      || '</p><br/><div>Tom &amp; Jerry &lt;3 &quot;q&quot;&nbsp;&#39;s</div></body></html>'
         |      AS html
         |  FROM documents WHERE doc_id % 8 = 0),
         |s1 AS (SELECT doc_id, regexp_replace(html,
         |    '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM h),
         |s2 AS (SELECT doc_id, regexp_replace(t,
         |    '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
         |s3 AS (SELECT doc_id, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM s2),
         |s4 AS (SELECT doc_id, replace(replace(replace(replace(replace(replace(t,
         |    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         |    '&#39;', ''''), '&amp;', '&') AS t FROM s3),
         |c AS (SELECT doc_id, trim(regexp_replace(t, '[ \t\n\r\f]+', ' ', 'g')) AS clean
         |  FROM s4)
         |SELECT doc_id, md5(clean) AS clean_md5,
         |  CAST(length(clean) AS BIGINT) AS n_chars,
         |  CAST(len(string_split(clean, ' ')) AS BIGINT) AS n_tokens
         |FROM c""".stripMargin,

    "q_mixture_sample" ->
      s"""WITH t AS (SELECT doc_id, source, len($toksSql) AS toks FROM documents),
         |w AS (SELECT source, CAST(substr(source, 4) AS BIGINT) % 4 + 1 AS wt,
         |    CAST(sum(toks) AS BIGINT) AS total FROM t GROUP BY 1),
         |ws AS (SELECT CAST(sum(wt) AS BIGINT) AS wsum FROM w),
         |r AS (SELECT source, least(1000000,
         |      (((5000 * wt) // wsum) * 1000000) // total) AS rate_ppm
         |  FROM w, ws),
         |k AS (SELECT t.source, t.toks, r.rate_ppm
         |  FROM t JOIN r ON t.source = r.source
         |  WHERE ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 15))::BIGINT
         |          % 1000000 < r.rate_ppm)
         |SELECT source, min(rate_ppm) AS rate_ppm, count(*) AS n_kept,
         |  CAST(sum(toks) AS BIGINT) AS tokens_kept
         |FROM k GROUP BY 1""".stripMargin,

    "q_split_leakage_safe" ->
      s"""WITH RECURSIVE ${simhashCtes()},
         |pairs AS ($simhashPairSelect),
         |edges AS (SELECT i AS src, j AS dst FROM pairs UNION ALL SELECT j, i FROM pairs),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |reach(node, lbl) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
         |cc AS (SELECT node, min(lbl) AS component FROM reach GROUP BY 1),
         |rep AS (SELECT dd.doc_id,
         |    coalesce(cc.component, dd.doc_id) AS rep_id
         |  FROM documents dd LEFT JOIN cc ON cc.node = dd.doc_id),
         |hh AS (SELECT doc_id, rep_id,
         |    ${hash60Sql("CAST(rep_id AS VARCHAR)")} % 100 AS hb FROM rep)
         |SELECT doc_id, rep_id,
         |  CASE WHEN hb < 80 THEN 'train'
         |       WHEN hb < 90 THEN 'val' ELSE 'test' END AS split
         |FROM hh""".stripMargin,

    "q_mixture_epochs" ->
      s"""WITH t AS (SELECT doc_id, source, len($toksSql) AS toks,
         |    ${hash60Sql("CAST(doc_id AS VARCHAR)")} AS h FROM documents),
         |w AS (SELECT source, CAST(substr(source, 4) AS BIGINT) % 4 + 1 AS wt,
         |    CAST(sum(toks) AS BIGINT) AS total FROM t GROUP BY 1),
         |ws AS (SELECT CAST(sum(wt) AS BIGINT) AS wsum FROM w),
         |r AS (SELECT source, total, (1000000 * wt) // wsum AS target FROM w, ws),
         |e AS (SELECT source,
         |    CASE WHEN total > 0 THEN target // total ELSE 0 END AS epochs,
         |    CASE WHEN total > 0 THEN ((target % total) * 1000000) // total
         |         ELSE 0 END AS tail FROM r),
         |c AS (SELECT t.source, t.toks,
         |    e.epochs + CASE WHEN t.h % 1000000 < e.tail THEN 1 ELSE 0 END AS n_copies
         |  FROM t JOIN e ON t.source = e.source),
         |x AS (SELECT source, toks, unnest(generate_series(0, n_copies - 1)) AS ep
         |  FROM c)
         |SELECT source, CAST(ep AS BIGINT) AS epoch, count(*) AS n_docs,
         |  CAST(sum(toks) AS BIGINT) AS n_tokens
         |FROM x GROUP BY 1, 2""".stripMargin,

    "q_bpe_train" -> {
      // one training round: adjacent-pair counts from the cell rendering,
      // argmax by (count desc, pair asc) as a scalar CTE, then the chosen
      // rule applies as the replace pattern for the NEXT round's input
      def round(t: Int): String =
        s"""w$t AS (SELECT unnest(string_split_regex(seg, ' {2,}')) AS word FROM s${t - 1}),
           |sy$t AS (SELECT list_filter(string_split(word, ' '), s -> s <> '') AS syms FROM w$t),
           |pc$t AS (SELECT replace(syms[i], '|', '') AS x, replace(syms[i+1], '|', '') AS y,
           |    count(*) AS cnt
           |  FROM sy$t, UNNEST(generate_series(1, len(syms) - 1)) t(i) GROUP BY 1, 2),
           |m$t AS (SELECT x, y, cnt FROM pc$t ORDER BY cnt DESC, x, y LIMIT 1),
           |s$t AS (SELECT doc_id,
           |    replace(seg, '|' || x || ' |' || y || ' ', '|' || x || y || ' ') AS seg
           |  FROM s${t - 1}, m$t)""".stripMargin
      val rounds = (1 to 6).map(round).mkString(",\n")
      val out = (1 to 6).map(t =>
        s"SELECT CAST($t AS BIGINT) AS rank, x, y, CAST(cnt AS BIGINT) AS cnt FROM m$t")
        .mkString("\nUNION ALL ")
      s"""WITH s0 AS (SELECT doc_id,
         |    regexp_replace(regexp_replace(lower(text), '[^a-z]', ' ', 'g'),
         |      '([a-z])', '|\\1 ', 'g') AS seg FROM documents),
         |$rounds
         |$out""".stripMargin
    },

    "q_text_bpe" -> {
      // the SAME merge chain, unrolled: one replace() per rule in table
      // order over the |sym -rendered text
      val seg = TextOps.BpeMerges.foldLeft(
        """regexp_replace(regexp_replace(lower(text), '[^a-z]', ' ', 'g'), """ +
          """'([a-z])', '|\1 ', 'g')""") {
        case (acc, (x, y)) => s"replace($acc, '|$x |$y ', '|$x$y ')"
      }
      s"""WITH seg AS (SELECT doc_id, $seg AS s, text FROM documents WHERE doc_id % 7 = 0)
         |SELECT doc_id, md5(s) AS seg_md5,
         |  CAST(length(s) - length(replace(s, '|', '')) AS BIGINT) AS n_bpe,
         |  CAST(len($toksSql) AS BIGINT) AS n_ws
         |FROM seg""".stripMargin
    },

    "q_text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents WHERE doc_id % 9 = 0),
         |g AS (SELECT doc_id,
         |    list_transform(generate_series(0, len(toks) - 2),
         |      i -> '2|' || array_to_string(toks[i+1:i+2], ' ')) AS g2,
         |    list_transform(generate_series(0, len(toks) - 3),
         |      i -> '3|' || array_to_string(toks[i+1:i+3], ' ')) AS g3
         |  FROM t),
         |ex AS (SELECT doc_id, unnest(list_concat(g2, g3)) AS gram FROM g),
         |c AS (SELECT doc_id, gram, count(*) AS cnt FROM ex GROUP BY 1, 2),
         |s AS (SELECT doc_id,
         |    CAST(sum(CASE WHEN substr(gram, 1, 2) = '2|' THEN cnt END) AS BIGINT) AS total2,
         |    CAST(count(CASE WHEN substr(gram, 1, 2) = '2|' THEN 1 END) AS BIGINT) AS uniq2,
         |    CAST(max(CASE WHEN substr(gram, 1, 2) = '2|' THEN cnt END) AS BIGINT) AS max2,
         |    CAST(sum(CASE WHEN substr(gram, 1, 2) = '3|' THEN cnt END) AS BIGINT) AS total3,
         |    CAST(count(CASE WHEN substr(gram, 1, 2) = '3|' THEN 1 END) AS BIGINT) AS uniq3
         |  FROM c GROUP BY 1),
         |f AS (SELECT doc_id, coalesce(total2, 0) AS n2grams,
         |    CASE WHEN total2 > 0
         |      THEN 1.0 - CAST(uniq2 AS DOUBLE) / CAST(total2 AS DOUBLE) END AS rep2,
         |    CASE WHEN total2 > 0
         |      THEN CAST(max2 AS DOUBLE) / CAST(total2 AS DOUBLE) END AS top2_frac,
         |    CASE WHEN total3 > 0
         |      THEN 1.0 - CAST(uniq3 AS DOUBLE) / CAST(total3 AS DOUBLE) END AS rep3
         |  FROM s)
         |SELECT doc_id, n2grams, rep2, top2_frac, rep3,
         |  (coalesce(rep2, 0.0) > 0.3 OR coalesce(top2_frac, 0.0) > 0.2
         |    OR coalesce(rep3, 0.0) > 0.25) AS repetitive
         |FROM f""".stripMargin,

    "q_video_pixels" ->
      """WITH ids AS (SELECT doc_id, CAST(16 + doc_id % 9 AS BIGINT) AS w,
        |    CAST(12 + doc_id % 7 AS BIGINT) AS h, CAST(3 + doc_id % 4 AS INTEGER) AS nf
        |  FROM documents WHERE doc_id % 6 = 0),
        |fr AS (SELECT doc_id, w, h, k FROM ids, UNNEST(generate_series(0, nf - 1, 2)) AS t(k)),
        |px AS (SELECT doc_id, w, h, k, x, y,
        |    least((x * 255) // (w - 1), 255)
        |      + least(((y + k) * 255) // (h - 1), 255)
        |      + CASE WHEN ((x // 2) + (y // 2) + doc_id + k) % 2 = 0 THEN 32 ELSE 0 END AS gray,
        |    least((y * 4) // h, 3) * 4 + least((x * 4) // w, 3) AS cell
        |  FROM fr, UNNEST(generate_series(0, w - 1)) AS t(x),
        |    UNNEST(generate_series(0, h - 1)) AS u(y)),
        |cells AS (SELECT doc_id, k, cell, sum(gray) // count(*) AS tv FROM px GROUP BY 1, 2, 3),
        |thumbs AS (SELECT doc_id, k,
        |    md5(string_agg(CAST(tv AS VARCHAR), '_' ORDER BY cell)) AS thumb_md5
        |  FROM cells GROUP BY 1, 2),
        |lum AS (SELECT doc_id, k, CAST(min(w) AS INTEGER) AS width, CAST(min(h) AS INTEGER) AS height,
        |    CAST(sum(gray) AS DOUBLE) / (3.0 * min(w) * min(h)) AS mean_lum
        |  FROM px GROUP BY 1, 2)
        |SELECT l.doc_id, CAST(l.k AS INTEGER) AS frame_idx, l.width, l.height,
        |  l.mean_lum, t.thumb_md5
        |FROM lum l JOIN thumbs t ON l.doc_id = t.doc_id AND l.k = t.k""".stripMargin,

    "q_video_mjpeg" ->
      """WITH ids AS (SELECT doc_id, CAST(8 * (2 + doc_id % 3) AS BIGINT) AS w,
        |    CAST(8 * (2 + doc_id % 2) AS BIGINT) AS h, CAST(3 + doc_id % 4 AS INTEGER) AS nf
        |  FROM documents WHERE doc_id % 6 = 3),
        |fr AS (SELECT doc_id, w, h, k FROM ids, UNNEST(generate_series(0, nf - 1, 2)) AS t(k)),
        |px AS (SELECT doc_id, w, h, k, x, y,
        |    3 * (((x // 8) * 37 + (y // 8) * 59 + k * 17 + doc_id * 13) % 256) AS gray,
        |    least((y * 4) // h, 3) * 4 + least((x * 4) // w, 3) AS cell
        |  FROM fr, UNNEST(generate_series(0, w - 1)) AS t(x),
        |    UNNEST(generate_series(0, h - 1)) AS u(y)),
        |cells AS (SELECT doc_id, k, cell, sum(gray) // count(*) AS tv FROM px GROUP BY 1, 2, 3),
        |thumbs AS (SELECT doc_id, k,
        |    md5(string_agg(CAST(tv AS VARCHAR), '_' ORDER BY cell)) AS thumb_md5
        |  FROM cells GROUP BY 1, 2),
        |lum AS (SELECT doc_id, k, CAST(min(w) AS INTEGER) AS width, CAST(min(h) AS INTEGER) AS height,
        |    CAST(sum(gray) AS DOUBLE) / (3.0 * min(w) * min(h)) AS mean_lum
        |  FROM px GROUP BY 1, 2)
        |SELECT l.doc_id, CAST(l.k AS INTEGER) AS frame_idx, l.width, l.height,
        |  l.mean_lum, t.thumb_md5
        |FROM lum l JOIN thumbs t ON l.doc_id = t.doc_id AND l.k = t.k""".stripMargin,

    // the probe-only paths compute the same math as the inline paths (the
    // index persistence changes WHERE learning runs, not what it computes),
    // so they share the closed-form oracles
    "q_ann_ivf_probe" -> ivfOracleSql(nCentroids = 8, probes = 2, topK = 3, iters = 2),

    "q_ann_pq_probe" -> pqOracleSql(m = 4, kCodes = 8, subLen = 16, topK = 5, iters = 1),

    "q_pipeline_clean" ->
      s"""WITH t AS (SELECT doc_id, lang, text, $toksSql AS toks FROM documents),
         |scored AS (SELECT doc_id, lang, text, toks,
         |    0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
         |      + 0.4 * least(1.0, CAST(len(toks) AS DOUBLE) / 50.0)
         |      + 0.2 * (CAST(${stopSql("en")} AS DOUBLE) / CAST(len(toks) AS DOUBLE)) AS q,
         |    ${stopSql("de")} AS s_de, ${stopSql("en")} AS s_en,
         |    ${stopSql("es")} AS s_es, ${stopSql("fr")} AS s_fr
         |  FROM t),
         |kept AS (SELECT doc_id, lang, toks, q,
         |    CASE WHEN lang = CASE
         |      WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
         |      WHEN s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
         |      WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
         |      WHEN s_fr > 0 THEN 'fr'
         |      ELSE 'und' END THEN 1 ELSE 0 END AS agree,
         |    md5(array_to_string(list_sort(list_distinct(string_split(lower(trim(text)), ' '))), ' ')) AS fp
         |  FROM scored
         |  WHERE q >= 0.5),
         |ranked AS (SELECT lang, toks, q, agree,
         |    row_number() OVER (PARTITION BY fp ORDER BY q DESC, doc_id) AS rk
         |  FROM kept)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(agree) AS BIGINT) AS n_lang_agree,
         |  CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
         |  min(q) AS min_q, max(q) AS max_q
         |FROM ranked WHERE rk = 1 GROUP BY 1""".stripMargin,

    "q_sample_split" ->
      s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks,
         |    ${hash60Sql("CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents)
         |SELECT CASE WHEN h % 100 < 80 THEN 'train'
         |            WHEN h % 100 < 90 THEN 'val' ELSE 'test' END AS split,
         |  lang, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN h % 100 < 80 AND h % 1000000 < 500000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         |  CAST(sum(len(toks)) AS BIGINT) AS n_tokens
         |FROM t GROUP BY 1, 2""".stripMargin,

    "q_shuffle_shards" ->
      s"""WITH t AS (SELECT doc_id,
         |    ${hash60Sql("'ep0_' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents)
         |SELECT doc_id, h % 8 AS shard,
         |  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1
         |    AS BIGINT) AS pos
         |FROM t""".stripMargin,

    "q_pack_chunks" ->
      s"""WITH t AS (SELECT source, doc_id, len($toksSql) AS n_tok FROM documents),
         |c AS (SELECT source, n_tok,
         |    coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
         |  FROM t)
         |SELECT source, CAST(before // 2000 AS BIGINT) AS chunk,
         |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS chunk_tokens
         |FROM c GROUP BY 1, 2""".stripMargin,

    "q_text_chunks" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents WHERE doc_id % 9 = 0)
         |SELECT doc_id, s AS start,
         |  len(toks[s+1 : s+40]) AS n_tok,
         |  md5(array_to_string(toks[s+1 : s+40], ' ')) AS chunk_hash
         |FROM d, UNNEST(generate_series(0, len(toks) - 1, 30)) AS t(s)""".stripMargin,

    "q_text_rolling_fp" ->
      s"""SELECT doc_id,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split(lower(trim(text)), ' '),
         |        t -> ${hash60Sql("t")} % 1000000007)),
         |    (acc, h) -> (acc * 31 + h) % 1000000007) AS roll_fp
         |FROM documents WHERE doc_id % 13 = 0""".stripMargin,

    "q_audio_decode" ->
      """SELECT doc_id,
        |  CAST(8000 AS INTEGER) AS sample_rate,
        |  CAST(1 AS INTEGER) AS channels,
        |  CAST(800 + (doc_id % 23) * 37 AS BIGINT) AS n_frames,
        |  CAST((800 + (doc_id % 23) * 37) * 125 AS BIGINT) AS duration_us,
        |  CAST(1000 + doc_id % 9000 AS DOUBLE) AS rms,
        |  CAST(1000 + doc_id % 9000 AS INTEGER) AS peak
        |FROM documents WHERE doc_id % 4 = 0""".stripMargin,

    "q_image_decode" ->
      """WITH ids AS (SELECT doc_id, 16 + doc_id % 17 AS w, 16 + doc_id % 13 AS h
        |  FROM documents WHERE doc_id % 5 = 0),
        |px AS (SELECT doc_id, w, h,
        |    least((x * 255) // greatest(1, w - 1), 255)
        |      + least((y * 255) // greatest(1, h - 1), 255)
        |      + CASE WHEN ((x // 4) + (y // 4) + doc_id) % 2 = 0 THEN 64 ELSE 0 END AS gray,
        |    least((y * 4) // h, 3) * 4 + least((x * 4) // w, 3) AS cell
        |  FROM ids, UNNEST(generate_series(0, w - 1)) AS t(x),
        |    UNNEST(generate_series(0, h - 1)) AS u(y)),
        |cells AS (SELECT doc_id, cell, sum(gray) // count(*) AS tv FROM px GROUP BY 1, 2),
        |thumbs AS (SELECT doc_id,
        |    md5(string_agg(CAST(tv AS VARCHAR), '_' ORDER BY cell)) AS thumb_md5
        |  FROM cells GROUP BY 1),
        |lum AS (SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |    CAST(sum(gray) AS DOUBLE) / (3.0 * (w * h)) AS mean_lum
        |  FROM px GROUP BY doc_id, w, h)
        |SELECT l.doc_id, l.width, l.height, l.mean_lum, t.thumb_md5
        |FROM lum l JOIN thumbs t ON l.doc_id = t.doc_id""".stripMargin,

    // full closed-form pHash pipeline: pixels -> 8x8 pooling -> 2-D integer
    // DCT (the SAME hardcoded cosine table as MultimodalOps.DctK, rendered
    // into the VALUES list) -> sign-vs-lower-median 60-bit hash -> 4x15-bit
    // bands -> banded self-join -> Hamming. Copies are planted under
    // doc_id + 1000000 with `src` driving the pixel formula.
    "q_image_phash" ->
      s"""WITH ids AS (
         |  SELECT doc_id, doc_id AS src FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL
         |  SELECT doc_id + 1000000, doc_id FROM documents WHERE doc_id % 10 = 0),
         |dims AS (SELECT doc_id, src, 16 + src % 17 AS w, 16 + src % 13 AS h FROM ids),
         |px AS (SELECT doc_id, w, h,
         |    least((x * 255) // greatest(1, w - 1), 255)
         |      + least((y * 255) // greatest(1, h - 1), 255)
         |      + CASE WHEN ((x // 4) + (y // 4) + src) % 2 = 0 THEN 64 ELSE 0 END AS gray,
         |    least((y * 8) // h, 7) * 8 + least((x * 8) // w, 7) AS cell
         |  FROM dims, UNNEST(generate_series(0, w - 1)) AS t(x),
         |    UNNEST(generate_series(0, h - 1)) AS u(y)),
         |cells AS (SELECT doc_id, cell, sum(gray) // count(*) AS tv FROM px GROUP BY 1, 2),
         |kt(u, i, k) AS (VALUES ${MultimodalOps.dctKSqlValues}),
         |coef AS (SELECT c.doc_id, ku.u * 8 + kv.u AS idx,
         |    CAST(sum(c.tv * ku.k * kv.k) AS BIGINT) AS cv
         |  FROM cells c JOIN kt ku ON ku.i = c.cell // 8 JOIN kt kv ON kv.i = c.cell % 8
         |  WHERE ku.u * 8 + kv.u BETWEEN 1 AND 60
         |  GROUP BY 1, 2),
         |med AS (SELECT doc_id, max(cv) AS med FROM (
         |    SELECT doc_id, cv, row_number() OVER (PARTITION BY doc_id ORDER BY cv) AS rn
         |    FROM coef) WHERE rn <= 30 GROUP BY 1),
         |hashes AS (SELECT c.doc_id,
         |    CAST(sum(CASE WHEN c.cv > m.med THEN 1::BIGINT << (c.idx - 1) ELSE 0 END) AS BIGINT) AS phash
         |  FROM coef c JOIN med m ON c.doc_id = m.doc_id GROUP BY 1),
         |bands AS (SELECT doc_id, phash, k, (phash >> (15 * k)) & 32767 AS band
         |  FROM hashes, UNNEST([0, 1, 2, 3]) AS t(k)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.phash AS ha, b.phash AS hb
         |  FROM bands a JOIN bands b ON a.k = b.k AND a.band = b.band AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(ha, hb)) <= 6""".stripMargin,

    // the q_image_phash closed-form pipeline over index (originals, %10)
    // plus probe batch (%20 under doc_id + 1000000), with candidate pairs
    // restricted to probe-involving ones — mirrors phashProbe's contract
    "q_image_phash_probe" ->
      s"""WITH ids AS (
         |  SELECT doc_id, doc_id AS src FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL
         |  SELECT doc_id + 1000000, doc_id FROM documents WHERE doc_id % 20 = 0),
         |dims AS (SELECT doc_id, src, 16 + src % 17 AS w, 16 + src % 13 AS h FROM ids),
         |px AS (SELECT doc_id, w, h,
         |    least((x * 255) // greatest(1, w - 1), 255)
         |      + least((y * 255) // greatest(1, h - 1), 255)
         |      + CASE WHEN ((x // 4) + (y // 4) + src) % 2 = 0 THEN 64 ELSE 0 END AS gray,
         |    least((y * 8) // h, 7) * 8 + least((x * 8) // w, 7) AS cell
         |  FROM dims, UNNEST(generate_series(0, w - 1)) AS t(x),
         |    UNNEST(generate_series(0, h - 1)) AS u(y)),
         |cells AS (SELECT doc_id, cell, sum(gray) // count(*) AS tv FROM px GROUP BY 1, 2),
         |kt(u, i, k) AS (VALUES ${MultimodalOps.dctKSqlValues}),
         |coef AS (SELECT c.doc_id, ku.u * 8 + kv.u AS idx,
         |    CAST(sum(c.tv * ku.k * kv.k) AS BIGINT) AS cv
         |  FROM cells c JOIN kt ku ON ku.i = c.cell // 8 JOIN kt kv ON kv.i = c.cell % 8
         |  WHERE ku.u * 8 + kv.u BETWEEN 1 AND 60
         |  GROUP BY 1, 2),
         |med AS (SELECT doc_id, max(cv) AS med FROM (
         |    SELECT doc_id, cv, row_number() OVER (PARTITION BY doc_id ORDER BY cv) AS rn
         |    FROM coef) WHERE rn <= 30 GROUP BY 1),
         |hashes AS (SELECT c.doc_id,
         |    CAST(sum(CASE WHEN c.cv > m.med THEN 1::BIGINT << (c.idx - 1) ELSE 0 END) AS BIGINT) AS phash
         |  FROM coef c JOIN med m ON c.doc_id = m.doc_id GROUP BY 1),
         |bands AS (SELECT doc_id, phash, k, (phash >> (15 * k)) & 32767 AS band
         |  FROM hashes, UNNEST([0, 1, 2, 3]) AS t(k)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.phash AS ha, b.phash AS hb
         |  FROM bands a JOIN bands b ON a.k = b.k AND a.band = b.band AND a.doc_id < b.doc_id
         |  WHERE a.doc_id >= 1000000 OR b.doc_id >= 1000000)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(ha, hb)) <= 6""".stripMargin,

    // closed-form acoustic-fingerprint pipeline: square-wave samples ->
    // 30-frame signed-sum + lag-1 autocorrelation contours -> per-family
    // lower medians (rn <= 15) -> 60-bit hash -> 4x15-bit bands -> banded
    // self-join -> Hamming. Mirrors MultimodalOps.audioFingerprint bit for
    // bit; copies planted under doc_id + 1000000 with `src` driving synth.
    "q_audio_fingerprint" ->
      """WITH ids AS (
        |  SELECT doc_id, doc_id AS src FROM documents WHERE doc_id % 8 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id FROM documents WHERE doc_id % 8 = 0),
        |params AS (SELECT doc_id, 800 + (src % 23) * 37 AS n, 2 + src % 50 AS period,
        |    1000 + src % 9000 AS amp FROM ids),
        |smp AS (SELECT doc_id, n, i,
        |    CASE WHEN ((i // period) % 2) = 0 THEN amp ELSE -amp END AS s,
        |    least((i * 30) // n, 29) AS f
        |  FROM params, UNNEST(generate_series(0, n - 1)) AS t(i)),
        |lagd AS (SELECT doc_id, f, s, lead(s) OVER (PARTITION BY doc_id ORDER BY i) AS s1 FROM smp),
        |feats AS (
        |  SELECT doc_id, 0 AS fam, f AS j, CAST(sum(s) AS BIGINT) AS cv FROM smp GROUP BY 1, 3
        |  UNION ALL
        |  SELECT doc_id, 1, f, CAST(sum(s * s1) AS BIGINT) FROM lagd WHERE s1 IS NOT NULL GROUP BY 1, 3),
        |med AS (SELECT doc_id, fam, max(cv) AS med FROM (
        |    SELECT doc_id, fam, cv, row_number() OVER (PARTITION BY doc_id, fam ORDER BY cv) AS rn
        |    FROM feats) WHERE rn <= 15 GROUP BY 1, 2),
        |hashes AS (SELECT c.doc_id,
        |    CAST(sum(CASE WHEN c.cv > m.med THEN 1::BIGINT << (c.fam * 30 + c.j) ELSE 0 END) AS BIGINT) AS h
        |  FROM feats c JOIN med m ON c.doc_id = m.doc_id AND c.fam = m.fam GROUP BY 1),
        |bands AS (SELECT doc_id, h, k, (h >> (15 * k)) & 32767 AS band
        |  FROM hashes, UNNEST([0, 1, 2, 3]) AS t(k)),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.h AS ha, b.h AS hb
        |  FROM bands a JOIN bands b ON a.k = b.k AND a.band = b.band AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 6""".stripMargin,

    // closed-form per-frame pHash: the q_image_phash DCT pipeline applied
    // per (video, frame) over the DIB fixture's pixel formula, then videos
    // joined on exact frame hashes and kept at >= 2 shared distinct hashes
    "q_video_phash" ->
      s"""WITH ids AS (
         |  SELECT doc_id, doc_id AS src FROM documents WHERE doc_id % 12 = 0
         |  UNION ALL
         |  SELECT doc_id + 1000000, doc_id FROM documents WHERE doc_id % 12 = 0),
         |dims AS (SELECT doc_id, src, 16 + src % 9 AS w, 12 + src % 7 AS h, 3 + src % 4 AS n FROM ids),
         |fr AS (SELECT doc_id, src, w, h, fk FROM dims, UNNEST(generate_series(0, n - 1)) AS t(fk)),
         |px AS (SELECT doc_id, fk, w, h,
         |    least((x * 255) // (w - 1), 255)
         |      + least(((y + fk) * 255) // (h - 1), 255)
         |      + CASE WHEN ((x // 2) + (y // 2) + src + fk) % 2 = 0 THEN 32 ELSE 0 END AS gray,
         |    least((y * 8) // h, 7) * 8 + least((x * 8) // w, 7) AS cell
         |  FROM fr, UNNEST(generate_series(0, w - 1)) AS t(x), UNNEST(generate_series(0, h - 1)) AS u(y)),
         |cells AS (SELECT doc_id, fk, cell, sum(gray) // count(*) AS tv FROM px GROUP BY 1, 2, 3),
         |kt(u, i, kc) AS (VALUES ${MultimodalOps.dctKSqlValues}),
         |coef AS (SELECT c.doc_id, c.fk, ku.u * 8 + kv.u AS idx,
         |    CAST(sum(c.tv * ku.kc * kv.kc) AS BIGINT) AS cv
         |  FROM cells c JOIN kt ku ON ku.i = c.cell // 8 JOIN kt kv ON kv.i = c.cell % 8
         |  WHERE ku.u * 8 + kv.u BETWEEN 1 AND 60
         |  GROUP BY 1, 2, 3),
         |med AS (SELECT doc_id, fk, max(cv) AS med FROM (
         |    SELECT doc_id, fk, cv, row_number() OVER (PARTITION BY doc_id, fk ORDER BY cv) AS rn
         |    FROM coef) WHERE rn <= 30 GROUP BY 1, 2),
         |hashes AS (SELECT DISTINCT c.doc_id,
         |    CAST(sum(CASE WHEN c.cv > m.med THEN 1::BIGINT << (c.idx - 1) ELSE 0 END) AS BIGINT) AS phash
         |  FROM coef c JOIN med m ON c.doc_id = m.doc_id AND c.fk = m.fk GROUP BY c.doc_id, c.fk)
         |SELECT doc_a, doc_b, n_shared FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
         |  FROM hashes a JOIN hashes b ON a.phash = b.phash AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2) WHERE n_shared >= 2""".stripMargin,

    "q_video_frames" ->
      """WITH ids AS (SELECT doc_id, CAST(3 + doc_id % 5 AS INTEGER) AS nf
        |  FROM documents WHERE doc_id % 6 = 0),
        |fr AS (SELECT doc_id, k,
        |    md5(md5('f' || CAST(doc_id AS VARCHAR) || '_' || CAST(k AS VARCHAR))) AS fh
        |  FROM ids, UNNEST(generate_series(0, nf - 1, 2)) AS t(k)),
        |agg AS (SELECT doc_id, md5(string_agg(fh, '_' ORDER BY k)) AS frames_md5
        |  FROM fr GROUP BY 1)
        |SELECT i.doc_id,
        |  CAST(64 + i.doc_id % 64 AS INTEGER) AS width,
        |  CAST(48 + i.doc_id % 32 AS INTEGER) AS height,
        |  i.nf AS n_frames,
        |  CAST(i.nf AS BIGINT) * 33333 AS duration_us,
        |  a.frames_md5
        |FROM ids i JOIN agg a ON i.doc_id = a.doc_id""".stripMargin,

    // closed-form recompute of the container layouts: BMP = 54-byte headers
    // + height x 4-aligned rows; WAV = 44-byte header + 2 bytes/sample,
    // duration = len * 1e6 / 8000 us; AVI = 100 fixed bytes + 40/frame
    // (8-byte chunk header + 32-byte md5-hex payload), 33333 us/frame
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  CAST(CASE doc_id % 3
        |    WHEN 0 THEN 54 + (16 + doc_id % 13) * (((3 * (16 + doc_id % 17) + 3) // 4) * 4)
        |    WHEN 1 THEN 44 + 2 * (800 + (doc_id % 23) * 37)
        |    ELSE 100 + 40 * (3 + doc_id % 5) END AS BIGINT) AS n_bytes,
        |  CAST(CASE doc_id % 3
        |    WHEN 0 THEN 16 + doc_id % 17 WHEN 1 THEN 0
        |    ELSE 64 + doc_id % 64 END AS INTEGER) AS width,
        |  CAST(CASE doc_id % 3
        |    WHEN 0 THEN 16 + doc_id % 13 WHEN 1 THEN 0
        |    ELSE 48 + doc_id % 32 END AS INTEGER) AS height,
        |  CAST(CASE doc_id % 3
        |    WHEN 0 THEN 1 WHEN 1 THEN 800 + (doc_id % 23) * 37
        |    ELSE 3 + doc_id % 5 END AS BIGINT) AS n_frames,
        |  CAST(CASE doc_id % 3
        |    WHEN 0 THEN 0 WHEN 1 THEN (800 + (doc_id % 23) * 37) * 125
        |    ELSE (3 + doc_id % 5) * 33333 END AS BIGINT) AS duration_us
        |FROM documents WHERE doc_id % 5 = 0""".stripMargin
  )
}
