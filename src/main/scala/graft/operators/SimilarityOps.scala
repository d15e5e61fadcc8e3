package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextOps.hash60

/** Similarity search over embedding columns (`ARRAY<FLOAT>`).
  *
  * Numeric design: vectors are quantized to integers (`floor(x * 1e7)`), so
  * dot products and norms are EXACT int64 arithmetic — order-independent,
  * overflow-safe for dim * (|x| * 1e7)^2 < 2^63 (e.g. dim=128 needs
  * |x| <= ~26; dim=64 allows |x| <= ~38), and bit-identical in any engine.
  * The final cosine is a single double division/sqrt over exactly-represented
  * integers, so even cross-engine comparisons are exact. Quantization error
  * (1e-7 per component) is far below any meaningful similarity threshold.
  *
  * Scale design: brute-force top-k broadcasts the (small) query set against
  * the corpus — no shuffle of the corpus, one window per query for top-k.
  * The LSH path buckets vectors by deterministic hyperplane signs, turning
  * the O(N^2) pair space into per-bucket equi-joins; candidates are verified
  * with the exact kernel. IVF would follow the same shape with learned
  * centroids; hyperplane LSH keeps it deterministic and oracle-checkable.
  */
object SimilarityOps {

  val Scale = 1e7

  /** ARRAY<FLOAT> -> ARRAY<BIGINT> quantization. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(Scale)).cast("long"))

  /** Exact integer dot product of two quantized vectors — a native codegen
    * Catalyst expression (see [[graft.functions.VectorExpressions]]); the
    * HOF formulation ([[dotQHof]]) has identical semantics but interprets
    * its lambda per element.
    */
  def dotQ(a: Column, b: Column): Column = graft.functions.VectorExpressions.dot_q(a, b)

  /** Exact integer squared norm (codegen expression). */
  def normQ(a: Column): Column = graft.functions.VectorExpressions.norm_sq_q(a)

  /** Built-ins-only formulations, kept as the semantic reference. */
  def dotQHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
  def normQHof(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0L), (acc, x) => acc + x)

  /** Cosine from quantized ints: one double division over exact operands. */
  def cosineQ(dot: Column, n1: Column, n2: Column): Column =
    dot.cast("double") / sqrt(n1.cast("double") * n2.cast("double"))

  /** Brute-force cosine top-k: every query row against the whole corpus.
    * Query side is broadcast (it is the small side by construction), so the
    * corpus is scanned once with no shuffle; top-k is a per-query window.
    */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), quantize(col("embedding")).as("qv"))
      .withColumn("qn", normQ(col("qv")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), quantize(col("embedding")).as("cv"))
      .withColumn("cn", normQ(col("cv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineQ(dotQ(col("qv"), col("cv")), col("qn"), col("cn")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }

  /** Brute-force L2 (Euclidean) top-k: squared distance from the quantized
    * identity |q−c|² = |q|² + |c|² − 2·q·c — integer-exact end to end, no
    * division and no sqrt (the square is monotone, so ranks equal true
    * Euclidean ranks). Same plan shape as the cosine path: broadcast query
    * side, one corpus scan, per-query top-k window.
    */
  def bruteTopKL2(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), quantize(col("embedding")).as("qv"))
      .withColumn("qn", normQ(col("qv")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), quantize(col("embedding")).as("cv"))
      .withColumn("cn", normQ(col("cv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (col("qn") + col("cn") - lit(2L) * dotQ(col("qv"), col("cv"))).as("dist2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist2").asc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }

  /** Hyperplane-LSH bucket id (nPlanes bits) per vector. Plane signs are
    * md5-derived constants, computed once on the driver and baked into the
    * plan as literal arrays — zero per-row hashing cost; the per-plane dot
    * is a runtime array fold, not an unrolled expression tree.
    */
  def lshBucket(vecQ: Column, nPlanes: Int, dim: Int, signs: (Int, Int) => Int): Column = {
    val bits = (0 until nPlanes).map { m =>
      val planeArr = array((0 until dim).map(i => lit(signs(m, i).toLong)): _*)
      when(dotQ(vecQ, planeArr) > 0, lit(1L << m)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Signs via hash60 of "hp{m}_{i}": bit 0 decides +1/-1. Matches the
    * oracle's md5 expression exactly.
    */
  def mdSign(m: Int, i: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hp${m}_$i".getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.substring(0, 15)
    val h = java.lang.Long.parseLong(hex, 16)
    if ((h & 1L) == 1L) 1 else -1
  }

  /** LSH-bucketed near-neighbor pairs: vectors sharing a bucket are
    * candidates; exact quantized cosine filters at tau. The scale path for
    * pairwise similarity — pair space shrinks ~2^nPlanes-fold.
    */
  def lshNearDupPairs(vecs: DataFrame, nPlanes: Int, dim: Int, tau: Double): DataFrame = {
    val q = vecs.select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("qn", normQ(col("qv")))
      .withColumn("bucket", lshBucket(col("qv"), nPlanes, dim, mdSign))
    q.as("a").join(q.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        cosineQ(dotQ(col("a.qv"), col("b.qv")), col("a.qn"), col("b.qn")).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** Quantized corpus in the internal shape: (vec_id, qv, qn). */
  private def prepQ(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("qn", normQ(col("qv")))

  /** Assign each vector to its max-cosine centroid (explicit tie-break on
    * cid). Centroids are broadcast; the corpus is never shuffled — and the
    * argmax is a map-side-combinable hash aggregation, NOT a window: the
    * broadcast cross join fans the corpus out ×k, and a window partitioned
    * by vec_id would push all corpus×k rows through the exchange and sort
    * them per vector. `max_by` over struct(ccos, -cid) is the identical
    * total order (max cosine, then MIN cid — cid is unique per vector, so
    * the key has no ties; NaN sorts greatest in both forms) and its partial
    * aggregate collapses the ×k fan-out back to one row per vector BEFORE
    * the exchange — corpus×1 rows shuffled, no sort (r18, guide §2.3/2.4;
    * every k-means iteration and every build/probe assignment pays this
    * exchange, so the win multiplies across the ANN/SemDeDup family).
    */
  private def assignTo(q: DataFrame, cents: DataFrame): DataFrame =
    q.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("qv"), col("qn"), col("cid"),
        cosineQ(dotQ(col("qv"), col("cv")), col("qn"), col("cn")).as("ccos"))
      .groupBy("vec_id")
      .agg(max_by(struct(col("cid"), col("qv"), col("qn")),
        struct(col("ccos"), (-col("cid")).as("__nc"))).as("__w"))
      .select(col("vec_id"), col("__w.qv").as("qv"), col("__w.qn").as("qn"),
        col("__w.cid").as("cid"))

  /** Fixed-iteration Lloyd's k-means on quantized vectors, fully
    * deterministic and integer-exact so it is oracle-able as plain
    * arithmetic: init = first k vectors by id; assignment = max cosine with
    * cid tie-break; update = element-wise FLOOR-DIVISION mean
    * `(s - pmod(s, n)) / n` (no floating-point accumulation, so every
    * engine computes bit-identical centroids). Empty clusters carry their
    * previous centroid forward. Cosine is scale-invariant, so the floor
    * rounding (vs a real mean) perturbs assignments no more than
    * quantization itself.
    *
    * Scale: each iteration is one broadcast-join pass over the corpus plus
    * a (cid, pos)-grouped sum — k*dim rows on the shuffle, independent of
    * corpus size.
    */
  def kmeansCentroidsQ(q: DataFrame, k: Int, iters: Int): DataFrame = {
    // each round's centroid frame is k rows — localCheckpoint it (the GD
    // weights rule): without it every downstream use (the assignment
    // broadcast, the final codes pass, a second consumer) re-executes the
    // whole preceding k-means pipeline from the corpus scan up
    var cents = q.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("qv").as("cv"), col("qn").as("cn"))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      val assigned = assignTo(q, cents)
      val sums = assigned.select(col("cid"), posexplode(col("qv")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(sum(col("x")).as("s"), count(lit(1)).as("cnt"))
      // exact floor division in pure int arithmetic: numerator is divisible
      // by cnt, so the double division is exact (|s| < 2^53)
      val newc = sums
        .withColumn("c", ((col("s") - pmod(col("s"), col("cnt"))) / col("cnt")).cast("long"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          s => s.getField("c")).as("cv"))
      cents = cents.as("p").join(newc.as("nc"), Seq("cid"), "left")
        .select(col("cid"), coalesce(col("nc.cv"), col("p.cv")).as("cv"))
        .withColumn("cn", normQ(col("cv")))
        .localCheckpoint(true)
    }
    cents
  }

  /** IVF-style partitioned ANN. Centroids are either the first `nCentroids`
    * vectors (kmeansIters = 0, the trivial deterministic index) or learned
    * by [[kmeansCentroidsQ]] (kmeansIters > 0 — better-balanced buckets,
    * higher recall at the same probe budget).
    *
    * Every vector is assigned to its max-cosine centroid; a query probes the
    * `probes` nearest centroid buckets and scores only those vectors:
    * the pair space shrinks ~nCentroids/probes-fold, and the bucket join is
    * a plain equi-join on `cid`, so it scales like any hash join.
    */
  def ivfAssignments(vecs: DataFrame, nCentroids: Int, kmeansIters: Int = 0): DataFrame = {
    val q = prepQ(vecs)
    assignTo(q, ivfCentroids(q, nCentroids, kmeansIters))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    * embedding space with the deterministic k-means ([[kmeansCentroidsQ]]),
    * then find near-dup pairs ONLY within each cluster — the cid equi-join
    * bounds the pair space to cluster size (the SemDeDup sharding that
    * makes semantic dedup tractable at corpus scale; cross-cluster pairs
    * are sacrificed by construction, as in the paper). Exact quantized
    * cosine verifies every candidate. Returns (cid, i, j, cos), i < j,
    * cos >= tau; a curation pass drops j of each pair (keep-lowest-id).
    */
  /** @param maxClusterSize optional skew guard: within-cluster pairs are
    *        O(cluster²), so one degenerate cluster (a failed clustering
    *        collapsing everything onto one centroid, or a corpus of
    *        boilerplate embeddings) turns the cid equi-join into an
    *        all-pairs cross product. With a cap `m`, clusters larger than
    *        `m` are hash-salted into ceil(size/m) sub-shards and pairs are
    *        generated within a (cid, shard) only — fan-out per cluster
    *        drops from O(size²) to O(size·m). Cross-shard pairs are
    *        sacrificed by construction, the same trade SemDeDup already
    *        makes for cross-CLUSTER pairs (and [[graft.operators.DedupOps
    *        .jaccardPairs]] makes with maxShingleDf); clusters at or under
    *        the cap land in shard 0 unchanged, so normal inputs produce
    *        identical results with or without the cap.
    */
  def semanticDedupPairs(vecs: DataFrame, nCentroids: Int, kmeansIters: Int,
                         tau: Double, maxClusterSize: Option[Long] = None): DataFrame = {
    val assigned0 = ivfAssignments(vecs, nCentroids, kmeansIters)
    val assigned = maxClusterSize match {
      case None => assigned0.withColumn("__shard", lit(0L))
      case Some(m) =>
        require(m >= 2, s"maxClusterSize must be >= 2, got $m")
        // <= nCentroids rows: broadcast, no extra shuffle on the big side
        val sizes = assigned0.groupBy("cid").agg(count(lit(1)).as("__csz"))
        assigned0.join(broadcast(sizes), Seq("cid"))
          .withColumn("__shard",
            when(col("__csz") > m,
              pmod(col("vec_id"), ceil(col("__csz").cast("double") / m).cast("long")))
              .otherwise(lit(0L)))
          .drop("__csz")
    }
    assigned.as("a").join(assigned.as("b"),
        col("a.cid") === col("b.cid") && col("a.__shard") === col("b.__shard") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.cid").as("cid"), col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        cosineQ(dotQ(col("a.qv"), col("b.qv")), col("a.qn"), col("b.qn")).as("cos"))
      .filter(col("cos") >= tau)
  }

  private def ivfCentroids(q: DataFrame, nCentroids: Int, kmeansIters: Int): DataFrame =
    if (kmeansIters == 0)
      q.filter(col("vec_id") < nCentroids)
        .select(col("vec_id").as("cid"), col("qv").as("cv"), col("qn").as("cn"))
    else kmeansCentroidsQ(q, nCentroids, kmeansIters)

  def ivfTopK(vecs: DataFrame, nCentroids: Int, probes: Int, k: Int,
              isQuery: Column, kmeansIters: Int = 0): DataFrame = {
    val q = prepQ(vecs).persist()
    val cents = ivfCentroids(q, nCentroids, kmeansIters).persist()
    val assigned = assignTo(q, cents).persist()
    val queries = assigned.filter(isQuery)
      .select(col("vec_id").as("query_id"), col("qv").as("want_qv"), col("qn").as("want_qn"))
    val result = probeIvf(queries, cents, assigned, probes, k)
      // see pqTopK: eager-checkpoint the small result, then release the
      // session-lifetime pins on the cached corpus/centroids/assignments
      .localCheckpoint(true)
    Seq(q, cents, assigned).foreach(_.unpersist())
    result
  }

  /** The probe side of IVF, shared by the inline path ([[ivfTopK]]) and the
    * persisted-index path ([[ivfProbe]]): pick the `probes` max-cosine
    * centroid buckets per query (tiny broadcast cross join), then score
    * ONLY those buckets' members via a plain equi-join on `cid`. Contains
    * no learning — at 100 TB this is the entire per-query cost.
    */
  private def probeIvf(queries: DataFrame, cents: DataFrame, assigned: DataFrame,
                       probes: Int, k: Int): DataFrame =
    scoreBuckets(pickBuckets(queries, cents, probes), assigned, k)

  /** Bucket selection: the `probes` max-cosine centroids per query — a
    * tiny broadcast cross join, |queries|·probes output rows.
    */
  private def pickBuckets(queries: DataFrame, cents: DataFrame, probes: Int): DataFrame = {
    val probeCents = cents
      .select(col("cid").as("cid2"), col("cv"), col("cn"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("pcos").desc, col("cid2").asc)
    queries.crossJoin(broadcast(probeCents))
      .select(col("query_id"), col("want_qv"), col("want_qn"), col("cid2"),
        cosineQ(dotQ(col("want_qv"), col("cv")), col("want_qn"), col("cn")).as("pcos"))
      .withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= probes)
      .select(col("query_id"), col("want_qv"), col("want_qn"), col("cid2").as("cid"))
  }

  /** Scoring: exact cosine against ONLY the picked buckets' members (the
    * `cid` equi-join), then per-query top-k.
    */
  private def scoreBuckets(probed: DataFrame, assigned: DataFrame, k: Int): DataFrame = {
    val wTop = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    probed.join(assigned, Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineQ(dotQ(col("want_qv"), col("qv")), col("want_qn"), col("qn")).as("cos"))
      .withColumn("rk", row_number().over(wTop).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Product quantization (PQ) ANN with asymmetric-distance scoring — the
    * third standard index family next to hyperplane LSH and IVF. The vector
    * space is split into `m` subspaces; each subspace learns `kCodes`
    * centroids ([[kmeansCentroidsQ]] on the sub-vectors — deterministic,
    * integer-exact, so the whole index is oracle-able); every database
    * vector compresses to m small codes (m·log2(kCodes) bits instead of
    * dim·32 — the memory footprint that lets a 100 TB corpus keep its index
    * in RAM). Queries stay full-precision: ADC scores
    * `dot(q, v) ≈ Σ_m dot(q_m, centroid_{m, code_m(v)})` via a tiny
    * broadcast lookup table (|queries|·m·kCodes rows), so scoring the
    * corpus is one equi-join on (subspace, code) + an int64 sum — no
    * per-pair vector math at all.
    *
    * Scoring is raw quantized inner product (MIPS-style, exact int64) —
    * monotone in cosine for normalized embeddings.
    */
  def pqTopK(vecs: DataFrame, m: Int, kCodes: Int, dim: Int, k: Int,
             isQuery: Column, kmeansIters: Int = 1): DataFrame = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val subLen = dim / m
    val q = prepQ(vecs).persist()
    val (centsAll, codesAll) = pqCodebooks(q, m, kCodes, subLen, kmeansIters)
    val queries = q.filter(isQuery).select(col("vec_id").as("query_id"), col("qv"))
    val result = probePq(queries, centsAll, codesAll, m, subLen, k)
      // eager checkpoint of the (tiny, |queries|·k) result lets the big
      // cached corpus be released NOW — a bare persist would otherwise pin
      // it in the cache manager for the session lifetime
      .localCheckpoint(true)
    q.unpersist()
    result
  }

  /** PQ learning: per-subspace codebooks (max-cos k-means) + every corpus
    * vector's m codes. The BUILD side — runs once per corpus version.
    */
  private def pqCodebooks(q: DataFrame, m: Int, kCodes: Int, subLen: Int,
                          kmeansIters: Int): (DataFrame, DataFrame) = {
    // per-subspace: learned codebook + code assignment (max-cos, cid
    // tie-break). The m subspaces are INDEPENDENT (each slices its own
    // columns of the cached corpus), and their k-means rounds materialize
    // eagerly (localCheckpoint jobs) — so they run CONCURRENTLY from
    // driver threads (guide §2.6: overlap independent jobs; one subspace's
    // straggler tail back-fills with the next subspace's tasks instead of
    // idling the cluster m times). Each subspace's trajectory is
    // deterministic in isolation and results assemble in subspace order,
    // so the output is bit-identical to the sequential loop.
    import scala.concurrent.{Await, Future, blocking}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val perSub = Await.result(Future.sequence((0 until m).map { j =>
      // blocking{}: each future BLOCKS on Spark actions (the k-means
      // localCheckpoint jobs), and the shared global pool must compensate
      // with extra threads or a small machine / a pool shared with other
      // code silently caps the intended m-way overlap (ADVICE r18)
      Future { blocking {
        val sub = q.select(col("vec_id"), slice(col("qv"), j * subLen + 1, subLen).as("qv"))
          .withColumn("qn", normQ(col("qv")))
        val cents = kmeansCentroidsQ(sub, kCodes, kmeansIters)
        val codes = assignTo(sub, cents)
          .select(col("vec_id"), lit(j).as("sub"), col("cid").as("code"))
        (cents.withColumn("sub", lit(j)), codes)
      } }
    }), Duration.Inf)
    (perSub.map(_._1).reduce(_ unionByName _), perSub.map(_._2).reduce(_ unionByName _))
  }

  /** The probe side of PQ/ADC, shared by [[pqTopK]] and the persisted-index
    * path ([[pqProbe]]): build the tiny ADC lookup table (|queries|·m·kCodes
    * partial dots), equi-join it to the codes, sum. No learning, no
    * per-pair vector math.
    */
  private def probePq(queries: DataFrame, centsAll: DataFrame, codesAll: DataFrame,
                      m: Int, subLen: Int, k: Int): DataFrame = {
    // ADC lookup table: every (query, subspace, codebook entry) dot product.
    // Subspace slicing is an inline explode over ONE pass of the query set
    // (a per-subspace union would scan the query source m times).
    val qsubs = queries
      .select(col("query_id"), explode(array((0 until m).map(j =>
        struct(lit(j).as("sub"), slice(col("qv"), j * subLen + 1, subLen).as("qsub"))): _*)).as("se"))
      .select(col("query_id"), col("se.sub").as("sub"), col("se.qsub").as("qsub"))
    val adc = qsubs.join(broadcast(centsAll), Seq("sub"))
      .select(col("query_id"), col("sub"), col("cid").as("code"),
        dotQ(col("qsub"), col("cv")).as("d"))

    // score = exact int64 sum of the m looked-up partial dots
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dot").desc, col("neighbor_id").asc)
    codesAll.join(broadcast(adc), Seq("sub", "code"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("d")).as("adc_dot"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("rk", row_number().over(wTop).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id", "adc_dot")
  }

  // ------------- persisted index lifecycle: build once, probe many -------

  /** Build the IVF index ONCE and persist it as two ACID
    * ([[graft.storage.TxLogTable]]) tables under `path`: `centroids`
    * (cid, cv, cn) and `assignments` (vec_id, qv, qn, cid). At 100 TB the
    * k-means learning and the full-corpus assignment pass belong on the
    * ingest/maintenance path, amortized over every query; [[ivfProbe]]
    * then reads only these tables — no learning inside queries.
    */
  def buildIvfIndex(vecs: DataFrame, nCentroids: Int, kmeansIters: Int, path: String): Unit = {
    val spark = vecs.sparkSession
    val q = prepQ(vecs).persist()
    val cents = ivfCentroids(q, nCentroids, kmeansIters).persist()
    new graft.storage.TxLogTable(spark, s"$path/centroids").overwrite(cents)
    writeClustered(new graft.storage.TxLogTable(spark, s"$path/assignments"),
      assignTo(q, cents), nCentroids)
    Seq(q, cents).foreach(_.unpersist())
  }

  /** Index member tables write CID-CLUSTERED (range-partitioned dirs with
    * `cid` stats sidecars) so a probe's [[graft.storage.TxLogTable
    * .readKeysIn]] skips every directory outside its picked buckets — the
    * read-volume half of the probe-only contract (the plan half is the
    * cid equi-join). A rebuild over an existing table falls back to a
    * single-dir overwrite (correct, unpruned; fresh builds are the
    * production path — annIndexPath keys on the corpus generation).
    */
  private def writeClustered(t: graft.storage.TxLogTable, df: DataFrame,
                             nCentroids: Int): Unit = {
    if (t.version.isEmpty)
      t.appendClustered(df, "cid", nDirs = math.max(2, math.min(nCentroids, 64)))
    else t.overwrite(df)
    ()
  }

  /** The distinct bucket ids of a (checkpointed, tiny) picked-bucket or
    * assigned-batch frame — the driver-side key set [[graft.storage
    * .TxLogTable.readKeysIn]] prunes directories with. Bounded by
    * min(|frame|, nCentroids), control-plane sized by construction.
    */
  private def cidKeys(assigned: DataFrame): Seq[Long] =
    assigned.select(col("cid")).distinct().collect().map(_.getLong(0)).toSeq

  /** True iff a built IVF/PQ index exists at `path` (both tables committed). */
  def indexExists(spark: org.apache.spark.sql.SparkSession, path: String,
                  tables: Seq[String]): Boolean =
    tables.forall(t => new graft.storage.TxLogTable(spark, s"$path/$t").version.isDefined)

  /** Probe-only IVF ANN against a persisted index: quantize the (small)
    * query set map-side, pick probe buckets against the broadcast centroid
    * table, score only those buckets via the `cid` equi-join — reading
    * only the assignment DIRECTORIES those buckets live in (the picked
    * cids collect driver-side, |queries|·probes values, and prune the
    * cid-clustered table via readKeysIn). The plan contains NO k-means
    * stage, never scans the raw corpus, and its read volume is priced by
    * the probed buckets, not the corpus.
    */
  def ivfProbe(spark: org.apache.spark.sql.SparkSession, path: String,
               queries: DataFrame, probes: Int, k: Int): DataFrame = {
    val cents = new graft.storage.TxLogTable(spark, s"$path/centroids").read()
    val qs = queries.select(col("vec_id").as("query_id"),
        quantize(col("embedding")).as("want_qv"))
      .withColumn("want_qn", normQ(col("want_qv")))
    // ONE driver-side materialization of the picked buckets serves both
    // consumers: the cid set prunes the assignment read, and the rows
    // themselves become the scoring join's local (broadcast-sized) side —
    // queries are small by the ANN contract (bruteTopK already broadcasts
    // them), so this is |queries|·probes rows of query vectors, and the
    // probe pays one tiny job instead of a checkpoint plus a collect
    val picked = pickBuckets(qs, cents, probes)
    val rows = picked.collect()
    val probed = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), picked.schema)
    val cids = rows.map(_.getAs[Long]("cid")).distinct.toSeq
    val assigned = new graft.storage.TxLogTable(spark, s"$path/assignments")
      .readKeysIn("cid", cids)
    scoreBuckets(probed, assigned, k)
  }

  /** Build the SemDeDup index ONCE: the deterministic k-means centroids
    * (`centroids`: cid, cv, cn) plus every corpus vector's cluster
    * membership (`members`: vec_id, qv, qn, cid) as ACID tables under
    * `path`. Same learning as [[buildIvfIndex]] — the index shape is
    * shared; what differs is the probe: dedup pairs, not top-k.
    * At 100 TB the k-means and the full-corpus assignment pass run once on
    * the maintenance path; every ingest batch then probes cluster-locally
    * ([[semanticDedupProbe]]) and folds in ([[foldSemanticIndex]]) without
    * ever re-learning or re-scanning the indexed corpus.
    */
  def buildSemanticIndex(vecs: DataFrame, nCentroids: Int, kmeansIters: Int,
                         path: String): Unit = {
    val spark = vecs.sparkSession
    val q = prepQ(vecs).persist()
    val cents = ivfCentroids(q, nCentroids, kmeansIters).persist()
    new graft.storage.TxLogTable(spark, s"$path/centroids").overwrite(cents)
    writeClustered(new graft.storage.TxLogTable(spark, s"$path/members"),
      assignTo(q, cents), nCentroids)
    Seq(q, cents).foreach(_.unpersist())
  }

  /** Probe a NEW batch against a persisted SemDeDup index: assign each
    * batch vector to its max-cosine centroid (broadcast centroid table — no
    * k-means stage in the plan), then verify exact quantized cosine against
    * (a) the indexed members of that cluster and (b) the batch's own
    * same-cluster vectors. Returns (cid, i, j, cos) with i < j and
    * cos >= tau — i/j canonicalized by id, so member-vs-batch and
    * batch-vs-batch pairs carry the same shape as [[semanticDedupPairs]].
    *
    * Scale: per-batch cost is O(batch × cluster-size) — the indexed corpus
    * is touched only through the `cid` equi-join (never member-vs-member
    * pairs, never a re-cluster), so a 100 TB corpus prices each ingest
    * batch by its own size, not the corpus's.
    */
  def semanticDedupProbe(spark: org.apache.spark.sql.SparkSession, path: String,
                         batch: DataFrame, tau: Double): DataFrame = {
    val cents = new graft.storage.TxLogTable(spark, s"$path/centroids").read()
    // the assigned batch feeds three consumers (the cid collect, the
    // member leg, the batch self-join): persist once so the assignment
    // pass runs once, and prune the member read to the batch's own
    // clusters — a batch touching 3 of 1000 clusters reads 3 buckets'
    // directories, not the corpus
    val assignedB = assignTo(prepQ(batch), cents).persist()
    val members = new graft.storage.TxLogTable(spark, s"$path/members")
      .readKeysIn("cid", cidKeys(assignedB))
    def pairCos(a: String, b: String): Column =
      cosineQ(dotQ(col(s"$a.qv"), col(s"$b.qv")), col(s"$a.qn"), col(s"$b.qn"))
    // member ↔ batch: indexed side enters ONLY via the cid equi-join
    val mb = members.as("a").join(assignedB.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.cid").as("cid"),
        least(col("a.vec_id"), col("b.vec_id")).as("i"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("j"),
        pairCos("a", "b").as("cos"))
    // batch ↔ batch within the assigned cluster
    val bb = assignedB.as("a").join(assignedB.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.cid").as("cid"), col("a.vec_id").as("i"),
        col("b.vec_id").as("j"), pairCos("a", "b").as("cos"))
    mb.unionByName(bb).filter(col("cos") >= tau)
  }

  /** Fold a probed batch INTO the semantic index: assign to the persisted
    * centroids (fixed — SemDeDup learns once; members accrete) and append
    * the batch's membership rows, txn-fenced so an at-least-once replay of
    * the same (appId, seq) is a no-op. Pass the batch's SURVIVORS (post
    * keep-lowest curation) so the index holds exactly the retained corpus.
    */
  def foldSemanticIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                        batch: DataFrame, txn: Option[(String, Long)] = None): Unit = {
    val cents = new graft.storage.TxLogTable(spark, s"$path/centroids").read()
    // clustered append (a member table is cid-clustered since build): the
    // batch's own dirs carry cid stats, so probe pruning stays exact as
    // the corpus accretes; the txn fence makes replays no-ops as before
    new graft.storage.TxLogTable(spark, s"$path/members")
      .appendClustered(assignTo(prepQ(batch), cents), "cid",
        nDirs = 2, txn = txn)
    ()
  }

  /** Build the PQ index ONCE: `codebooks` (sub, cid, cv, cn) and `codes`
    * (vec_id, sub, code) as ACID tables — m·log2(kCodes) bits per corpus
    * vector, the footprint that keeps a 100 TB corpus's index in RAM.
    */
  def buildPqIndex(vecs: DataFrame, m: Int, kCodes: Int, dim: Int,
                   kmeansIters: Int, path: String): Unit = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val spark = vecs.sparkSession
    val q = prepQ(vecs).persist()
    val (centsAll, codesAll) = pqCodebooks(q, m, kCodes, dim / m, kmeansIters)
    new graft.storage.TxLogTable(spark, s"$path/codebooks").overwrite(centsAll)
    new graft.storage.TxLogTable(spark, s"$path/codes").overwrite(codesAll)
    q.unpersist()
  }

  /** Probe-only PQ/ADC ANN against a persisted index: no learning, no raw
    * corpus scan — the ADC table comes from the broadcast codebook table
    * and scoring is the (sub, code) equi-join over the codes table.
    */
  def pqProbe(spark: org.apache.spark.sql.SparkSession, path: String,
              queries: DataFrame, m: Int, dim: Int, k: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val centsAll = new graft.storage.TxLogTable(spark, s"$path/codebooks").read()
    val codesAll = new graft.storage.TxLogTable(spark, s"$path/codes").read()
    val qs = queries.select(col("vec_id").as("query_id"), quantize(col("embedding")).as("qv"))
    probePq(qs, centsAll, codesAll, m, dim / m, k)
  }

  /** Exact all-pairs cosine >= tau (the oracle-checkable baseline; at scale
    * use [[lshNearDupPairs]]).
    */
  def brutePairs(vecs: DataFrame, tau: Double): DataFrame = {
    val q = vecs.select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("qn", normQ(col("qv")))
    q.as("a").join(q.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        cosineQ(dotQ(col("a.qv"), col("b.qv")), col("a.qn"), col("b.qn")).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998 — the
    * diversity-aware retrieval idiom RAG pipelines use): from each query's
    * `n` nearest candidates, greedily select `k` where every next pick
    * maximizes `λ·sim(q, d) − (1−λ)·max_{s∈S} sim(d, s)` (relevance minus
    * redundancy). Ties break on id; λ is given in PERCENT so both engines
    * parse the identical double literal (1.0−0.7 in IEEE is NOT the parsed
    * 0.3 — the one-ulp trap this signature dodges).
    *
    * Scale posture (r18): the greedy is PER QUERY and parameter-bounded —
    * at most `n` candidates and an n² pair space per query — so it runs
    * IN-MEMORY inside one `flatMapGroups` over the candidate pull: ONE
    * shuffle on query_id, then O(k·n) exact-kernel dot products per query,
    * state bounded by n vectors. The round-based dataframe formulation
    * ([[mmrRerankRounds]], kept as the semantic reference) paid k−1
    * sequential driver barriers (anti-join + max-agg + window + checkpoint
    * per round) — pure fixed overhead per round locally, and k global
    * synchronization points on a cluster where millions of queries could
    * otherwise proceed independently. The in-memory fold replays the
    * identical IEEE steps (int64 dots, one sqrt+divide per pair,
    * `λ·cos − (1−λ)·maxsim` in doubles; NaN-greatest/total double order,
    * Spark's own sort semantics), so results are bit-identical
    * (SimilaritySpec asserts equality against the reference; the DuckDB
    * oracle gates it end-to-end). Emits (query_id, step, sel_id, score),
    * step 1..k; step 1's redundancy term is 0 by definition.
    */
  def mmrRerank(queries: DataFrame, corpus: DataFrame, n: Int, k: Int,
                lambdaPct: Int = 70): DataFrame = {
    require(k >= 1 && n >= k, s"need n >= k >= 1, got n=$n k=$k")
    require(lambdaPct >= 0 && lambdaPct <= 100, s"lambdaPct out of range: $lambdaPct")
    val lam = lambdaPct / 100.0
    val comp = (100 - lambdaPct) / 100.0
    val cand = bruteTopK(queries, corpus, n)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk"))
    val cv = corpus.select(col("vec_id"), quantize(col("embedding")).as("v"))
      .withColumn("nv", normQ(col("v")))
    val withVec = cand.join(cv, col("neighbor_id") === col("vec_id"))
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk"),
        col("v"), col("nv"))
    val spark = queries.sparkSession
    import spark.implicits._
    // total double order (java.lang.Double.compare): NaN greatest, the
    // ordering Spark's `max` aggregate and desc sort use — the in-memory
    // fold must break ties and handle degenerate (zero-norm) cosines
    // exactly like the dataframe reference
    val ord = Ordering.Double.TotalOrdering
    withVec.as[MmrCandidate].groupByKey(_.query_id)
      .flatMapGroups { (q: Long, it: Iterator[MmrCandidate]) =>
        val cands = it.toArray.sortBy(_.rk)
        // the same one-division exact kernel as cosineQ/dotQ: int64 dot,
        // one sqrt, one divide — bit-identical to the plan expression
        def cosQm(a: MmrCandidate, b: MmrCandidate): Double = {
          var d = 0L
          var i = 0
          while (i < a.v.length) { d += a.v(i) * b.v(i); i += 1 }
          d.toDouble / math.sqrt(a.nv.toDouble * b.nv.toDouble)
        }
        val selected = scala.collection.mutable.ArrayBuffer[MmrCandidate]()
        val remaining = scala.collection.mutable.ArrayBuffer[MmrCandidate]()
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double)]()
        cands.headOption.foreach { first =>
          selected += first
          out += ((q, first.neighbor_id, 1L, lam * first.cos - comp * 0.0))
          remaining ++= cands.tail
        }
        var t = 2
        while (t <= k && remaining.nonEmpty) {
          var bestIdx = -1
          var bestScore = 0.0
          var i = 0
          while (i < remaining.length) {
            val c = remaining(i)
            var maxsim = Double.NegativeInfinity
            selected.foreach { s =>
              val sim = cosQm(c, s)
              if (ord.gt(sim, maxsim)) maxsim = sim
            }
            val score = lam * c.cos - comp * maxsim
            val cmp = if (bestIdx < 0) 1 else ord.compare(score, bestScore)
            if (cmp > 0 || (cmp == 0 &&
                c.neighbor_id < remaining(bestIdx).neighbor_id)) {
              bestIdx = i
              bestScore = score
            }
            i += 1
          }
          val pick = remaining.remove(bestIdx)
          selected += pick
          out += ((q, pick.neighbor_id, t.toLong, bestScore))
          t += 1
        }
        out.iterator
      }.toDF("query_id", "sel_id", "step", "score")
  }

  /** The round-based dataframe formulation of [[mmrRerank]], kept as the
    * semantic reference (SimilaritySpec asserts the in-memory fold equals
    * it bit-for-bit): each of the k rounds is one anti-join + one
    * max-aggregation + one per-query window over <= n rows, with the
    * candidate pool, the n²-per-query pair sims and the growing selection
    * persisted so round t never re-runs rounds 1..t−1.
    */
  private[graft] def mmrRerankRounds(queries: DataFrame, corpus: DataFrame,
                                     n: Int, k: Int,
                                     lambdaPct: Int = 70): DataFrame = {
    require(k >= 1 && n >= k, s"need n >= k >= 1, got n=$n k=$k")
    require(lambdaPct >= 0 && lambdaPct <= 100, s"lambdaPct out of range: $lambdaPct")
    val lam = lit(lambdaPct / 100.0)
    val comp = lit((100 - lambdaPct) / 100.0)
    val cand = bruteTopK(queries, corpus, n)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk")).persist()
    val cv = corpus.select(col("vec_id"), quantize(col("embedding")).as("v"))
      .withColumn("nv", normQ(col("v")))
    val withVec = cand.join(cv, col("neighbor_id") === col("vec_id"))
      .select(col("query_id"), col("neighbor_id"), col("v"), col("nv"))
    val pairs = withVec.as("a").join(withVec.as("b"),
        col("a.query_id") === col("b.query_id") &&
          col("a.neighbor_id") =!= col("b.neighbor_id"))
      .select(col("a.query_id").as("query_id"),
        col("a.neighbor_id").as("i"), col("b.neighbor_id").as("j"),
        cosineQ(dotQ(col("a.v"), col("b.v")), col("a.nv"), col("b.nv")).as("sim"))
      .persist()
    // per-round selections are tiny (<= k x |queries|): localCheckpoint
    // truncates lineage so round t never replays rounds 1..t-1 and
    // planning stays O(1) in k (the connectedComponents rule)
    var selected = cand.filter(col("rk") === 1)
      .select(col("query_id"), col("neighbor_id").as("sel_id"), lit(1L).as("step"),
        (lam * col("cos") - comp * lit(0.0)).as("score"))
      .localCheckpoint(true)
    for (t <- 2 to k) {
      val selIds = selected.select(col("query_id").as("sq"), col("sel_id"))
      val remaining = cand.as("c").join(selIds,
        col("c.query_id") === col("sq") && col("c.neighbor_id") === col("sel_id"),
        "left_anti")
      val simToSel = pairs.as("p").join(selIds,
          col("p.query_id") === col("sq") && col("p.j") === col("sel_id"))
        .select(col("p.query_id").as("pq"), col("p.i").as("pi"), col("p.sim"))
      val scored = remaining.join(simToSel,
          col("query_id") === col("pq") && col("neighbor_id") === col("pi"))
        .groupBy(col("query_id"), col("neighbor_id"), col("cos"))
        .agg(max(col("sim")).as("maxsim"))
        .select(col("query_id"), col("neighbor_id"),
          (lam * col("cos") - comp * col("maxsim")).as("score"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("neighbor_id").asc)
      val pick = scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("neighbor_id").as("sel_id"),
          lit(t.toLong).as("step"), col("score"))
      selected = selected.unionByName(pick).localCheckpoint(true)
    }
    // the candidate pool and n^2-per-query pair cache must not outlive the
    // rerank; the selection is checkpointed blocks, so this costs nothing
    cand.unpersist()
    pairs.unpersist()
    selected
  }
}

/** Encoder row for [[SimilarityOps.mmrRerank]]'s per-query in-memory greedy
  * (top-level public — the engine's encoder-case-class rule).
  */
case class MmrCandidate(query_id: Long, neighbor_id: Long, cos: Double,
                        rk: Long, v: Array[Long], nv: Long)
