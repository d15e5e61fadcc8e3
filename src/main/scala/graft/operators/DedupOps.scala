package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextOps.{hash60, tokens}

/** Deduplication operators for training-data pipelines, in increasing
  * sophistication: exact (hash groupBy), n-gram Jaccard (inverted-index
  * self-join, exact), MinHash+LSH (banded signatures, candidate join + exact
  * verify), SimHash (bit-sliced blocking + Hamming verify).
  *
  * Cache note: the pairwise operators persist their shingle index for the
  * duration of the computation; the cache entries live until the session
  * clears them (`spark.catalog.clearCache()`) — a long-lived service should
  * materialize the shingle index as a table instead.
  *
  * Scale design: every algorithm is a sequence of narrow per-row transforms,
  * hash-partitioned self-joins on content keys, and hash aggregations — no
  * cross products, no driver-side state. Candidate generation (LSH bands /
  * SimHash bands / shared shingles) bounds the pair space; the exact
  * verification join only touches candidate pairs. All hashing is md5-derived
  * (`TextOps.hash60`) so results are deterministic and engine-independent.
  */
object DedupOps {

  val M: Long = 1000000007L // modulus for the affine minhash family

  def normText(c: Column): Column = lower(trim(c))

  /** Exact-dup key: hash of normalized text. */
  def exactKey(c: Column): Column = md5(normText(c))

  /** Distinct word n-gram shingles per document: (doc_id, shingle).
    * Documents shorter than n tokens contribute no shingles.
    */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val t = tokens(col(textCol))
    val grams = transform(
      sequence(lit(1), size(t) - lit(n - 1)),
      i => concat_ws(" ", slice(t, i, lit(n))))
    // shingling + downstream per-shingle md5 is CPU-dense map work: spread
    // a few-split corpus across the slots first (no-op on real tables)
    SkewOps.spreadSmall(docs).select(col(idCol).as("doc_id"),
        explode(array_distinct(when(size(t) >= n, grams).otherwise(array()))).as("shingle"))
  }

  /** Distinct shingles narrowed to their 60-bit md5 hash: (doc_id, sh60).
    * The banded dedup pipeline only ever compares shingles for EQUALITY
    * (inverted-index self-joins, the verify join, the minhash input), so an
    * 8-byte long replaces the ~30-byte string at every exchange, in the
    * persisted shingle cache and in the on-disk shingle index (guide §2.3
    * narrower shuffle types — the dominant shuffle-bytes cost at 100 TB).
    * Collision semantics: two DISTINCT shingles colliding in 60 bits merge
    * for counting purposes — the same ~2^30-distinct-shingles birthday
    * bound the engine already accepts for [[duplicateSpans]] and the
    * contamination keys; the DuckDB oracles mirror the hashed key exactly,
    * so the gate compares like with like. [[shingles]] keeps the string
    * form for consumers that need shingle CONTENT (q_text_ngrams).
    */
  def shingles60(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingles(docs, idCol, textCol, n)
      .select(col("doc_id"), hash60(col("shingle")).as("sh60"))

  /** Exact pairwise n-gram Jaccard >= tau. Complete for tau > 0: any pair
    * with J > 0 shares a shingle, so the inverted-index self-join on
    * `shingle` enumerates every qualifying pair without a cross product.
    *
    * Skew hazard: a shingle appearing in `df` documents contributes
    * O(df^2) rows to the self-join. One boilerplate phrase shared by 10^6
    * documents means 10^12 pairs from that single key. `maxShingleDf`
    * bounds this: shingles with document frequency above the cap are
    * excluded from CANDIDATE GENERATION only, and every surviving candidate
    * is then exact-verified against the FULL shingle index, so reported
    * jaccard values are always true values. Completeness caveat: a pair
    * whose shared shingles ALL exceed the cap is never considered — for
    * near-dup dedup that is the right trade (ubiquitous shingles carry no
    * dedup signal; at corpus scale prefer [[minhashLshPairs]], whose
    * banded buckets bound candidates by construction).
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String, n: Int, tau: Double,
                   maxShingleDf: Option[Long] = None): DataFrame = {
    // the shingle set feeds three plan branches (sizes + both join sides);
    // persist so the explode+md5 work runs once per job. At warehouse scale
    // the equivalent is materializing the shingle index as a table. The
    // cached rows are the NARROWED (doc_id, sh60) form — every exchange
    // below moves 8-byte longs, never shingle strings (§2.3).
    val sh = shingles60(docs, idCol, textCol, n).persist()
    maxShingleDf match {
      case None =>
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
        // shared-shingle counts come straight off the inverted-index self-join —
        // no candidate materialization + re-join (which re-explodes every
        // candidate by its full shingle list and dominated the benchmark)
        val shared = sh.as("a").join(sh.as("b"),
            col("a.sh60") === col("b.sh60") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
          .agg(count(lit(1)).as("c"))
        jaccardFromCounts(shared, sizes, tau)
      case Some(cap) =>
        require(cap >= 2, s"maxShingleDf < 2 can never produce a candidate pair, got $cap")
        // candidates only from rare shingles (df <= cap): the self-join's
        // per-key fan-out is bounded by cap^2 regardless of corpus skew
        val rare = sh.withColumn("__df", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("sh60"))))
          .filter(col("__df") <= cap).drop("__df")
        val candidates = rare.as("a").join(rare.as("b"),
            col("a.sh60") === col("b.sh60") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("i"), col("b.doc_id").as("j")).distinct()
        verifyJaccard(candidates, sh, tau)
    }
  }

  private def jaccardFromCounts(shared: DataFrame, sizes: DataFrame, tau: Double): DataFrame =
    shared
      .join(sizes.as("ni"), col("i") === col("ni.doc_id"))
      .join(sizes.as("nj"), col("j") === col("nj.doc_id"))
      .select(col("i"), col("j"),
        (col("c").cast("double") / (col("ni.n") + col("nj.n") - col("c")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= tau)

  /** Exact-Jaccard verification of candidate (i, j) pairs against the
    * hashed shingle inverted index (`sh` = (doc_id, sh60), the
    * [[shingles60]] form); emits (i, j, jaccard) for J >= tau. Both verify
    * exchanges carry the 8-byte sh60, never shingle strings (§2.3).
    * Integer-count division keeps the double bit-identical cross-engine.
    */
  def verifyJaccard(candidates: DataFrame, sh: DataFrame, tau: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shared = candidates
      .join(sh.as("si"), col("i") === col("si.doc_id"))
      .join(sh.as("sj"), col("j") === col("sj.doc_id") && col("si.sh60") === col("sj.sh60"))
      .groupBy("i", "j").agg(count(lit(1)).as("c"))
    jaccardFromCounts(shared, sizes, tau)
  }

  /** Affine minhash family h_i(x) = (a_i * x + b_i) mod M over 60-bit
    * md5-derived shingle hashes reduced mod M. Coefficients are fixed so the
    * signature is deterministic and reproducible in the oracle.
    */
  def minhashA(i: Int): Long = 7919L * i + 17L
  def minhashB(i: Int): Long = 104729L * i + 31L

  /** MinHash signature: (doc_id, mh0..mh{k-1}), computed by the one-pass
    * [[graft.functions.MinHashSketch]] TypedImperativeAggregate (single
    * k-slot buffer instead of k independent min-aggregates; bit-identical
    * results — MinHashSketchSpec asserts equivalence to the k-column form).
    * Input is the HASHED (doc_id, sh60) [[shingles60]] frame — the md5 is
    * computed once there, not re-derived from strings per consumer.
    */
  def minhashSignatures(sh: DataFrame, k: Int): DataFrame = {
    val h = pmod(col("sh60"), lit(M))
    val withSketch = sh.withColumn("__h", h)
      .groupBy("doc_id")
      .agg(graft.functions.MinHashSketch.minhash_sketch(col("__h"), k).as("sig"))
    withSketch.select(col("doc_id") +:
      (0 until k).map(i => element_at(col("sig"), i + 1).as(s"mh$i")): _*)
  }

  /** The k-column built-ins-only formulation, kept as semantic reference. */
  def minhashSignaturesCols(sh: DataFrame, k: Int): DataFrame = {
    val h = pmod(col("sh60"), lit(M))
    val aggs = (0 until k).map(i =>
      min(pmod(lit(minhashA(i)) * col("__h") + lit(minhashB(i)), lit(M))).as(s"mh$i"))
    sh.withColumn("__h", h).groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash-LSH near-dup pairs: k-hash signatures, banded into `bands`
    * groups of k/bands rows; documents sharing any band bucket become
    * candidates, then exact Jaccard filters at tau. Deterministic given the
    * fixed hash family (candidate recall is a property of (k, bands, tau),
    * not of run-time randomness).
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int, k: Int, bands: Int, tau: Double): DataFrame = {
    val sh = shingles60(docs, idCol, textCol, n).persist() // reused by sigs + verify
    val buckets = bandBuckets(minhashSignatures(sh, k), k, bands)
    val candidates = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j")).distinct()
    verifyJaccard(candidates, sh, tau)
  }

  /** LSH band buckets of a (doc_id, mh0..mh{k-1}) signature frame:
    * (doc_id, band, bv) with bv = md5 over the band's signature rows.
    */
  def bandBuckets(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val r = k / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("_", (0 until r).map(x => col(s"mh${b * r + x}")): _*)).as("bv"))
    }
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bv").as("bv"))
  }

  /** Persist (or incrementally extend) a MinHash-LSH dedup index: the band
    * buckets and the shingle inverted index of `docs` append to two
    * [[graft.storage.TxLogTable]]s under `path`. Calling it again with a
    * later batch folds that batch in — sketching cost is paid once per
    * document EVER, which is what makes dedup-at-ingest affordable on a
    * growing 100 TB corpus (the alternative re-sketches the whole corpus
    * per batch).
    */
  def buildMinhashIndex(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, k: Int, bands: Int, path: String,
                        txn: Option[(String, Long)] = None): Unit = {
    // `txn` fences BOTH appends on the same (appId, seq) — a foreachBatch
    // replay after a crash is a no-op per table, and a crash BETWEEN the
    // two appends heals on replay (the committed side's fence skips, the
    // missing side lands) — the index stays in lockstep with the stream
    val spark = docs.sparkSession
    // the stored shingle index carries the 8-byte sh60, not strings — at
    // corpus scale the index table is the probe's dominant read cost (§6)
    val sh = shingles60(docs, idCol, textCol, n).persist()
    new graft.storage.TxLogTable(spark, s"$path/buckets")
      .append(bandBuckets(minhashSignatures(sh, k), k, bands), txn)
    new graft.storage.TxLogTable(spark, s"$path/shingles").append(sh, txn)
    sh.unpersist()
  }

  /** Near-dup pairs of a NEW batch against a [[buildMinhashIndex]] index
    * plus within the batch itself: verified `(i, j, jaccard)` with
    * `i < j` where at least one side is from `newDocs`. The indexed corpus
    * is never re-shingled or re-sketched — its side of the work is two
    * table reads; only the batch is sketched, and the candidate join keys
    * on (band, bv) exactly like the one-shot path. Ids must be disjoint
    * from the indexed corpus (enforced by the caller's id scheme).
    */
  def minhashProbe(newDocs: DataFrame, idCol: String, textCol: String,
                   n: Int, k: Int, bands: Int, tau: Double,
                   path: String): DataFrame = {
    val spark = newDocs.sparkSession
    val newSh = shingles60(newDocs, idCol, textCol, n).persist()
    val newBuckets = bandBuckets(minhashSignatures(newSh, k), k, bands)
    val idxBuckets = new graft.storage.TxLogTable(spark, s"$path/buckets").read()
    val all = idxBuckets.unionByName(newBuckets)
    // a.doc_id =!= b.doc_id (not <): new-vs-old pairs must surface in both
    // orders here because only the batch side drives the join; least/
    // greatest canonicalizes, distinct collapses new-vs-new double hits
    val candidates = newBuckets.as("a").join(all.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("i"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("j")).distinct()
    val allSh = new graft.storage.TxLogTable(spark, s"$path/shingles").read()
      .unionByName(newSh)
    verifyJaccard(candidates, allSh, tau)
  }

  /** Connected components over an undirected pair list `(i, j)` — the
    * transitive-closure step a real dedup pipeline needs after candidate
    * pairs: if A~B and B~C, all three are one duplicate group even when
    * A~C was never emitted. Two phases: a map-side union-find first
    * contracts every within-partition component (no shuffle; most small
    * dedup clusters dissolve here), then min-label propagation (the
    * GraphX/Pregel CC algorithm) runs on the contracted root graph:
    * every node starts labeled with itself; each round takes
    * the min of its own and its neighbors' labels; fixpoint after at most
    * `diameter` rounds. Each round is one shuffle on node id — no driver
    * state beyond the convergence counter; each round's labels are eagerly
    * checkpointed so lineage (and Catalyst planning cost) stays flat
    * round-over-round.
    *
    * `checkpointDir = None` (default) uses `localCheckpoint`: blocks live
    * in executor storage — fastest, right for local / interactive runs,
    * but a lost executor loses blocks with no lineage to recompute them.
    * `Some(dir)` switches every round to a RELIABLE `checkpoint` into
    * `dir` (HDFS/object store on a cluster): each round survives executor
    * loss, the posture a 1000-executor multi-hour CC job needs.
    * Returns (node, component) where component = min node id reachable.
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 50,
      checkpointDir: Option[String] = None): DataFrame = {
    val ckpt: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        val sc = pairs.sparkSession.sparkContext
        // setCheckpointDir resolves to a fresh UUID subdir; only (re)set
        // when unset or pointed elsewhere so repeated calls share one root
        if (!sc.getCheckpointDir.exists(_.contains(dir))) sc.setCheckpointDir(dir)
        df => df.checkpoint(eager = true)
      case None => df => df.localCheckpoint(eager = true)
    }
    // Local-contraction pre-pass: a per-partition union-find collapses
    // every edge whose endpoints already share a partition BEFORE any
    // distributed round — one map-side pass, no shuffle. Each partition
    // emits (node, local root = min node of its partition-local
    // component); a node seen in several partitions carries several
    // roots, and those root sets ARE the contracted graph: roots r1, r2
    // of one node are connected iff the original nodes were. In a dedup
    // pair graph most components are small, so most of them contract to
    // a single root here and never enter the iterative loop at all —
    // the loop then propagates over the (much smaller) root graph only.
    val spark = pairs.sparkSession
    import spark.implicits._
    val localRoots = pairs
      .select(col("i").cast("long"), col("j").cast("long")).as[(Long, Long)]
      .mapPartitions { it =>
        val parent = new scala.collection.mutable.LongMap[Long]()
        def find(x0: Long): Long = {
          var x = x0
          var p = parent(x)
          while (p != x) { // path halving
            val g = parent(p)
            parent(x) = g
            x = g
            p = parent(x)
          }
          x
        }
        it.foreach { case (a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val ra = find(a); val rb = find(b)
          // min-union keeps the invariant root = min node of the local
          // component, so final labels stay the global min node id
          if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
        }
        parent.keysIterator.toArray.iterator.map(n => (n, find(n)))
      }.toDF("node", "root")
    // per-node root set across partitions (bounded by #partitions); rep =
    // min root. Checkpointed: it feeds both the contracted edges and the
    // final join-back, and must not re-run the union-find twice.
    val m = localRoots.groupBy("node")
      .agg(min(col("root")).as("rep"), collect_set(col("root")).as("roots"))
      .transform(ckpt)
    val contracted = m
      .select(col("rep").as("ci"), explode(col("roots")).as("cj"))
      .where(col("ci") =!= col("cj"))
    val edges = contracted.select(col("ci").as("src"), col("cj").as("dst"))
      .union(contracted.select(col("cj").as("src"), col("ci").as("dst")))
      .persist()
    // seed with min(node, min neighbor): the same exchange the plain
    // `distinct` node list costs, but it performs round 1's neighbor-min
    // inside it — one fewer propagation round for every input (invariants
    // hold: label <= node and label stays inside the component)
    var labels = edges.groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("__m"))
      .select(col("node"), least(col("node"), col("__m")).as("component"))
      .transform(ckpt)
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("node").as("src"), col("component").as("nbl")), Seq("src"))
        .groupBy(col("dst").as("node")).agg(min(col("nbl")).as("nbr_min"))
      // neighbor-min update; the old label rides along for change detection.
      // NOT checkpointed (r18): `next` references it twice (base + the
      // pointer-jump lookup), but both subtrees hang off the SAME
      // checkpointed `labels` / persisted `edges`, so per-round lineage
      // stays O(1) anyway, and the nbrMin exchange is canonically identical
      // on both sides — ReuseExchange computes it once inside next's single
      // materialization job. One eager round job instead of two. (The
      // round's ONE checkpoint below still cuts lineage: persist instead
      // would nest round N's plan inside all N-1 predecessors and Catalyst
      // analysis goes super-linear — the original rule, unchanged.)
      val step = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("component").as("__old"),
          least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"))
      // pointer jumping: also take the label OF the current label
      // (component <= node always holds, so label[label[node]] only ever
      // shrinks). This halves the remaining propagation distance per round
      // — O(log diameter) rounds instead of O(diameter), the
      // Shiloach-Vishkin-style shortcut
      val grand = step.select(col("node").as("component"), col("component").as("__grand"))
      val next = step.join(grand, Seq("component"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("__grand"), col("component"))).as("component"),
          (least(col("component"), coalesce(col("__grand"), col("component"))) < col("__old"))
            .cast("long").as("__moved"))
        .transform(ckpt)
      val changed = next.agg(coalesce(sum(col("__moved")), lit(0L))).head.getLong(0)
      labels.unpersist()
      labels = next.drop("__moved")
      converged = changed == 0
      iters += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds " +
          "(graph diameter exceeds maxIters) — raise maxIters; returning " +
          "mid-propagation labels would silently split components")
    // Join every original node back through its local root: component =
    // the root's propagated label; roots whose component stayed local
    // never entered the loop and label themselves (coalesce).
    m.select(col("node"), col("rep"))
      .join(labels.select(col("node").as("rep"), col("component")), Seq("rep"), "left")
      .select(col("node"), coalesce(col("component"), col("rep")).as("component"))
  }

  /** INCREMENTAL connected components: fold a batch of new near-dup pairs
    * into an existing `(node, component)` assignment without re-running
    * CC over the corpus-sized pair set — the clustering face of the
    * build-once / probe-per-batch index lifecycle ([[buildMinhashIndex]] /
    * [[minhashProbe]] produce exactly the `newPairs` this consumes, so
    * dedup-at-ingest keeps its transitive clusters current per batch).
    *
    * The existing assignment IS a contracted graph: each component is one
    * vertex named by its representative (the component's min node id, the
    * [[connectedComponents]] label convention). Each new pair maps its
    * endpoints to their representatives (a node not yet assigned
    * represents itself), and CC runs on that REPRESENTATIVE graph — sized
    * by the batch, not the corpus. The merged label of a representative
    * group is its min vertex = min over all member nodes of the merged
    * clusters, so labels stay the global min node id and the result is
    * IDENTICAL to a from-scratch CC over (old pairs ∪ new pairs) — the
    * q_dedup_clusters_incremental oracle recomputes exactly that from
    * scratch in DuckDB and hash-matches.
    *
    * Scale: one broadcast-sized relabel join against the corpus
    * assignment (component ids that merged, bounded by the batch's pair
    * count) + the batch-sized CC; the corpus pair set is never touched
    * again. Deterministic, so replayed batches converge (labels only ever
    * shrink toward the global min).
    *
    * PRECONDITION: `assign` labels MUST follow the min-node convention
    * (label = the component's minimum member id) — what
    * [[connectedComponents]] emits and what this function preserves. An
    * arbitrary labeling silently yields labels that differ from
    * from-scratch CC and can collide with real node ids; [[foldCcIndex]]
    * validates the convention on every row it touches at the persisted
    * boundary, where external tables could enter.
    */
  def mergeComponents(assign: DataFrame, newPairs: DataFrame,
      maxIters: Int = 50, checkpointDir: Option[String] = None,
      inputsMaterialized: Boolean = false): DataFrame = {
    val (a, _, repLabels, freshAssigned) =
      mergeParts(assign, newPairs, maxIters, checkpointDir, inputsMaterialized)
    // relabel existing components whose representative merged; everything
    // untouched keeps its label (left join + coalesce)
    val relabel = repLabels.select(col("node").as("component"), col("component").as("__new"))
    val updated = a.join(broadcast(relabel), Seq("component"), "left")
      .select(col("node"), coalesce(col("__new"), col("component")).as("component"))
    updated.unionByName(freshAssigned)
  }

  /** [[mergeComponents]]' BLAST RADIUS only: the rows a batch of new pairs
    * actually changes — members of components whose label shrank, plus the
    * batch's fresh nodes — computed DIRECTLY as one corpus scan against
    * the broadcast relabel map, never by diffing two corpus-sized frames.
    * [[foldCcIndex]] merges exactly this set, so the full-assignment
    * anti-join (a corpus×corpus shuffle per fold) never exists.
    */
  private[graft] def mergeComponentsDelta(assign: DataFrame, newPairs: DataFrame,
      maxIters: Int = 50, checkpointDir: Option[String] = None,
      inputsMaterialized: Boolean = false): DataFrame = {
    val (a, _, repLabels, freshAssigned) =
      mergeParts(assign, newPairs, maxIters, checkpointDir, inputsMaterialized)
    // only representatives whose label ACTUALLY shrank relabel members;
    // the inner broadcast join touches exactly those components' rows
    val relabel = repLabels
      .select(col("node").as("component"), col("component").as("__new"))
      .where(col("__new") =!= col("component"))
    val updatedChanged = a.join(broadcast(relabel), Seq("component"))
      .select(col("node"), col("__new").as("component"))
    updatedChanged.unionByName(freshAssigned)
  }

  // the shared head of mergeComponents/mergeComponentsDelta: normalized
  // inputs, CC over the representative graph, and the batch's fresh nodes.
  // `inputsMaterialized = true` is the caller's promise that assign and
  // newPairs are already cheap to consume repeatedly (table reads,
  // checkpointed frames, CC outputs whose lineage ends in checkpointed
  // blocks) — the defensive per-input localCheckpoints (eager jobs, ~4
  // driver barriers per merge) are then skipped. Default false keeps the
  // safety net for arbitrary pipelines (a banded candidate pipeline fed
  // directly in would otherwise re-execute once per consumer).
  private def mergeParts(assign: DataFrame, newPairs: DataFrame,
      maxIters: Int, checkpointDir: Option[String],
      inputsMaterialized: Boolean = false)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    // both inputs are consumed several times (the pair mapping, the fresh
    // anti-join, the relabel); cut their lineage once so an expensive
    // upstream (a banded candidate pipeline, a prior CC) never re-executes
    // per consumer — the engine's iterative-input rule
    def guard(df: DataFrame): DataFrame =
      if (inputsMaterialized) df else df.localCheckpoint()
    val a = guard(assign.select(col("node").cast("long").as("node"),
      col("component").cast("long").as("component")))
    val pi = guard(newPairs.select(col("i").cast("long").as("i"), col("j").cast("long").as("j"))
      .where(col("i") =!= col("j")))
    // endpoint -> its current representative (itself when unassigned).
    // NOT checkpointed (r19): connectedComponents consumes `mapped` exactly
    // once (the localRoots mapPartitions pass, fused into CC's first eager
    // `m` checkpoint job), so a checkpoint here was a pure extra barrier.
    val mapped = pi
      .join(a.select(col("node").as("i"), col("component").as("ci")), Seq("i"), "left")
      .join(a.select(col("node").as("j"), col("component").as("cj")), Seq("j"), "left")
      .select(coalesce(col("ci"), col("i")).as("i"), coalesce(col("cj"), col("j")).as("j"))
      .where(col("i") =!= col("j")).distinct()
    // CC over the representative graph: batch-sized, label = min vertex.
    // NOT checkpointed (r19): CC's output lineage is one small join over
    // its own checkpointed m/labels frames, so the two downstream
    // consumers (fresh join + relabel) each pay one cheap broadcast join,
    // not a pipeline re-execution.
    val repLabels = connectedComponents(mapped, maxIters, checkpointDir)
    // nodes the batch introduced: assign their representative-graph label
    // (themselves if their only pairs collapsed inside one old component)
    val fresh = pi.select(col("i").as("node")).union(pi.select(col("j").as("node")))
      .distinct().join(a, Seq("node"), "left_anti")
    val freshAssigned = fresh.join(repLabels, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
    (a, pi, repLabels, freshAssigned)
  }

  /** Persist a clustering as an ACID `(node, component)` table — the bulk
    * build of the clustering index [[foldCcIndex]] maintains per batch
    * (the [[buildMinhashIndex]] lifecycle, for components).
    *
    * The assignment is written RANGE-CLUSTERED on `node` into `nSlices`
    * directories, so each per-batch fold's granular MERGE rewrites only
    * the slices the batch's nodes land in — never the corpus (a
    * single-directory bulk load would overlap every batch). Build-once:
    * a second build on an initialized table REFUSES — a double build
    * would commit duplicate node rows with conflicting labels, silently
    * breaking every later fold (rebuild by dropping the table).
    */
  def buildCcIndex(pairs: DataFrame, path: String,
      checkpointDir: Option[String] = None, nSlices: Int = 64): Long = {
    val table = new graft.storage.TxLogTable(pairs.sparkSession, path)
    require(table.version.isEmpty,
      s"clustering index at $path is already built (build-once index; " +
        "drop the table to rebuild)")
    table.appendClustered(
      connectedComponents(pairs, checkpointDir = checkpointDir), "node", nSlices)
  }

  /** Fold one batch of new near-dup pairs into the persisted clustering
    * index: [[mergeComponents]] computes the incremental merge (CC over
    * the batch-sized representative graph only), an anti-join against the
    * committed assignment keeps ONLY the rows the batch actually changed —
    * relabeled members of merged components plus newly assigned nodes, the
    * batch's blast radius — and those MERGE in keyed on node (update wins;
    * labels move monotonically toward the global min and the recompute is
    * deterministic in (table, batch), so an at-least-once replay
    * converges, the CQ-sink argument). A batch that changes nothing
    * commits nothing (the no-empty-commits discipline). An uninitialized
    * index bootstraps from the first fold.
    *
    * Write cost is DIRECTORY-GRANULAR, not table-sized: the index is
    * range-clustered on `node` ([[buildCcIndex]] / the bootstrap below)
    * and the MERGE passes `rangeCol = node`, so only the slices holding
    * the batch's blast radius rewrite — the corpus-sized remainder of the
    * assignment is carried as metadata. Per-fold cost is then
    * O(slices touched), bounded by the batch, never the corpus.
    *
    * Precondition (validated on the blast radius every fold): `assign`
    * labels follow the min-node convention — label = the component's
    * minimum member id, which [[connectedComponents]] and every fold
    * maintain. A hand-built or migrated table with arbitrary labels would
    * silently diverge from from-scratch CC; any touched row violating
    * `component <= node` fails the fold loudly instead.
    *
    * Concurrency: the read → merge → anti-join recompute runs INSIDE the
    * conflict-retry loop. On a CommitConflict another writer has advanced
    * the assignment; re-merging the stale frame could overwrite a
    * concurrent label shrink with a stale larger label (update wins on
    * merge), so a conflicted retry recomputes from the new version.
    */
  def foldCcIndex(newPairs: DataFrame, path: String,
      checkpointDir: Option[String] = None): Long = {
    val spark = newPairs.sparkSession
    val table = new graft.storage.TxLogTable(spark, path)
    // checkpoint the caller's batch ONCE, outside the conflict-retry loop:
    // the merge consumes it several times and a retry re-merges — the old
    // per-merge defensive checkpoint re-materialized the (possibly
    // expensive banded-pipeline) batch on every retry (r19)
    val np = newPairs.select(col("i").cast("long").as("i"),
      col("j").cast("long").as("j")).localCheckpoint()
    graft.storage.TxLogTable.retryOnConflict() {
      val assign = table.version match {
        case Some(_) => table.read()
        case None => spark.range(0).select(col("id").as("node"), col("id").as("component"))
      }
      // the blast radius directly (one corpus scan against the broadcast
      // relabel map) — never merged-vs-assign, whose anti-join would
      // shuffle the whole corpus-sized assignment on every fold.
      // inputsMaterialized: assign is a table read (disk-materialized,
      // column-pruned scans per consumer beat an eager corpus-sized
      // localCheckpoint), np is checkpointed above.
      val changed = mergeComponentsDelta(assign, np,
          checkpointDir = checkpointDir, inputsMaterialized = true)
        .localCheckpoint()
      // one control-plane job answers both gates: is the fold a no-op,
      // and does any touched row break the min-node label convention
      val gate = changed.agg(count(lit(1)),
        coalesce(sum(when(col("component") > col("node"), 1L).otherwise(0L)), lit(0L))).head()
      require(gate.getLong(1) == 0L,
        s"clustering index at $path violates the min-node label convention " +
          "(a touched node got a label above itself) — the table was not " +
          "built by buildCcIndex/foldCcIndex")
      if (gate.getLong(0) == 0L) table.version.getOrElse(-1L)
      else if (table.version.isEmpty)
        // bootstrap from the first fold: range-clustered like the bulk
        // build, so the second fold already merges granularly
        table.appendClustered(changed, "node", 64)
      else table.merge(changed, Seq("node"), rangeCol = Some("node"))
    }
  }

  /** Benchmark-contamination report: for each eval document, how much of it
    * appears verbatim (at n-gram granularity) in the training corpus — the
    * decontamination check every LLM training pipeline runs before an eval
    * set can be trusted.
    *
    * Shape: both sides reduce to distinct (doc, shingle-hash) rows; the
    * train side collapses to an inverted index (shingle-hash -> document
    * frequency), so the join is a hash equi-join on a content key whose
    * cardinality grows with the corpus — parallelism scales with data, and
    * the train index is the ONLY thing the (small) eval side touches. No
    * pairwise doc×doc work at any point.
    *
    * Returns one row per eval doc: `n_shingles` (its distinct n-grams),
    * `n_hit` (how many also occur in training), `max_train_df` (document
    * frequency of its most common leaked n-gram; 0 when clean) and
    * `contamination` = n_hit / n_shingles.
    */
  def contaminationReport(train: DataFrame, eval: DataFrame,
                          idCol: String, textCol: String, n: Int): DataFrame = {
    val trainIdx = shingles60(train, idCol, textCol, n)
      .withColumnRenamed("sh60", "sh")
      .groupBy("sh").agg(count(lit(1)).as("train_df"))
    val evalSh = shingles60(eval, idCol, textCol, n)
      .select(col("doc_id").as("eval_id"), col("sh60").as("sh"))
    evalSh.join(trainIdx, Seq("sh"), "left")
      .groupBy("eval_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(col("train_df")).as("n_hit"),
        coalesce(max(col("train_df")), lit(0L)).as("max_train_df"))
      .withColumn("contamination",
        col("n_hit").cast("double") / col("n_shingles").cast("double"))
  }

  /** Persist the BENCHMARK side of decontamination once: the eval suite's
    * distinct n-gram hashes with per-hash benchmark document frequency, as
    * an ACID table at `<path>/ngrams` — the decontamination face of the
    * build-once / probe-per-batch index lifecycle. A training pipeline's
    * benchmark suite is small and FIXED while training data streams, so
    * the index builds once and every ingest batch probes it; `txn` fences
    * rebuilds the same way [[buildMinhashIndex]] fences its appends.
    */
  def buildDecontamIndex(evalDocs: DataFrame, idCol: String, textCol: String,
                         n: Int, path: String,
                         txn: Option[(String, Long)] = None): Unit = {
    val table = new graft.storage.TxLogTable(evalDocs.sparkSession, s"$path/ngrams")
    // build-once: a second build would duplicate every `sh` row, and the
    // probe's left join then multiplies per-shingle matches — silently
    // inflating n_hit/contamination on every later batch. Allowed only on
    // an uninitialized table, or as the txn-fenced REPLAY of the one build
    // (which append() then skips); rebuild by dropping the table.
    val replayFenced = txn.exists { case (a, s) =>
      table.txnHighWatermark(a).exists(_ >= s) }
    require(table.version.isEmpty || replayFenced,
      s"decontamination index at $path/ngrams is already built (build-once " +
        "index; the benchmark suite is fixed by design — drop the table to rebuild)")
    val idx = shingles60(evalDocs, idCol, textCol, n)
      .withColumnRenamed("sh60", "sh")
      .groupBy("sh").agg(count(lit(1)).as("eval_df"))
    table.append(idx, txn)
    ()
  }

  /** Decontaminate a training batch against a [[buildDecontamIndex]]
    * index: for each batch document, how many of its distinct n-gram
    * shingles appear in ANY benchmark document (`n_hit`, `contamination`
    * ratio, and the hottest leak's benchmark df). Only the BATCH shingles
    * — the benchmark is never re-shingled — and the join is a hash
    * equi-join against the (benchmark-sized, typically broadcastable)
    * index; callers gate on `contamination` to drop leaked documents
    * before they reach the training corpus ([[contaminationReport]] is
    * the same mathematics run offline with the roles swapped).
    */
  def decontamProbe(batch: DataFrame, idCol: String, textCol: String,
                    n: Int, path: String): DataFrame = {
    val idx = new graft.storage.TxLogTable(
      batch.sparkSession, s"$path/ngrams").read()
    shingles60(batch, idCol, textCol, n)
      .select(col("doc_id"), col("sh60").as("sh"))
      .join(idx, Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(col("eval_df")).as("n_hit"),
        coalesce(max(col("eval_df")), lit(0L)).as("max_eval_df"))
      .withColumn("contamination",
        col("n_hit").cast("double") / col("n_shingles").cast("double"))
  }

  /** Exact edit-distance verification of candidate pairs: SimHash banding
    * proposes candidates (bounded, no cross product), then Levenshtein runs
    * ONLY on those pairs. Direct pairwise Levenshtein over a corpus is
    * O(N²·len²) — never viable; candidate-then-verify is the standard
    * two-stage shape. Emits (i, j, hamming, lev, sim) with
    * sim = 1 - lev/max(len_i, len_j) for sim >= minSim.
    *
    * For `minSim > 0` the DP runs in Spark's BOUNDED threshold form
    * (`Levenshtein(l, r, Some(bound))`): any pair whose true distance
    * exceeds `ceil((1-minSim)·max_len)+1` cannot pass the sim filter, so
    * the kernel early-exits at the bound (O(len·bound) instead of
    * O(len²) per pair — the 100 TB path, since near-dup thresholds keep
    * the bound a small fraction of the text length). The +1 slack puts
    * the bound strictly above every distance that could pass the filter
    * even under worst-case FP rounding of the bound itself, so the
    * surviving rows and their exact distances are bit-identical to the
    * unbounded form (asserted by CurationSpec).
    *
    * Unicode caveat: Spark's levenshtein counts CODEPOINTS while DuckDB's
    * counts BYTES, so the q_edit_distance oracle is only bit-exact on
    * ASCII text (the fixture corpus is ASCII by construction). Non-ASCII
    * corpora still get correct Spark-side semantics — only the cross-engine
    * gate would need a byte-explicit oracle.
    */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
                        maxHamming: Int, minSim: Double): DataFrame = {
    val pairs = simhashPairs(docs, idCol, textCol, maxHamming)
    val txt = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    // The candidate set is SMALL IN BYTES but CPU-dense (an O(len^2) DP per
    // row), so AQE's byte-based coalescing would fold it onto one task and
    // run every DP serially. repartition-by-number is exempt from AQE
    // coalescing, so the DP work actually spreads across the cluster.
    val spread = pairs
      .join(txt.as("ti"), col("i") === col("ti.doc_id"))
      .join(txt.as("tj"), col("j") === col("tj.doc_id"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
    // stage the levenshtein behind an aliased projection so it is computed
    // once per pair for the derived similarity, not re-evaluated per use
    val maxLen = greatest(length(col("ti.text")), length(col("tj.text")))
    val lev: Column =
      if (minSim > 0.0) {
        val bound = (ceil(lit(1.0 - minSim) * maxLen) + lit(1)).cast("int")
        org.apache.spark.sql.graft.shim.column(
          org.apache.spark.sql.catalyst.expressions.Levenshtein(
            org.apache.spark.sql.graft.shim.toExpression(col("ti.text")),
            org.apache.spark.sql.graft.shim.toExpression(col("tj.text")),
            Some(org.apache.spark.sql.graft.shim.toExpression(bound))))
      } else levenshtein(col("ti.text"), col("tj.text"))
    val scored = spread
      .select(col("i"), col("j"), col("hamming"),
        lev.cast("long").as("lev"), maxLen.cast("double").as("__max_len"))
      .select(col("i"), col("j"), col("hamming"), col("lev"),
        (lit(1.0) - col("lev").cast("double") / col("__max_len")).as("sim"))
    // sim is always in [0, 1] (lev <= max_len), so a non-positive threshold
    // is vacuous — skipping it keeps the plan at exactly ONE DP per pair.
    // With a threshold, the filter must NOT see the raw expression: Catalyst
    // substitutes the alias and pushes the predicate below the repartition
    // into the join stage, where AQE's byte-based coalescing has already
    // folded the (small-in-bytes) candidates onto ~1 task — every DP then
    // runs serially (measured 19x on 32 cores at sf0.1). Materializing the
    // scored candidates (pair-bounded, tiny) pins each DP to exactly one
    // evaluation in the spread projection; the filter reads the cached
    // column. lev >= 0 drops the bounded kernel's -1 over-threshold marker
    // rows — exactly the rows the sim filter would drop (proof in the doc
    // above).
    if (minSim > 0.0)
      scored.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        .filter(col("lev") >= 0L && col("sim") >= minSim)
    else scored
  }

  /** 60-bit SimHash over distinct tokens: bit j of the signature is set when
    * the sum over tokens of (+1 if bit j of hash60(token) else -1) is > 0.
    * Computed by the one-pass [[graft.functions.SimHashSketch]]
    * TypedImperativeAggregate (bit-identical to
    * [[simhashSignaturesCols]], asserted by MinHashSketchSpec).
    */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    SkewOps.spreadSmall(docs).select(col(idCol).as("doc_id"),
        explode(array_distinct(tokens(col(textCol)))).as("tok"))
      .withColumn("__h", hash60(col("tok")))
      .groupBy("doc_id")
      .agg(graft.functions.SimHashSketch.simhash_sketch(col("__h")).as("simhash"))

  /** The 60-column built-ins-only formulation, kept as semantic reference. */
  def simhashSignaturesCols(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = SkewOps.spreadSmall(docs).select(col(idCol).as("doc_id"),
      explode(array_distinct(tokens(col(textCol)))).as("tok"))
      .withColumn("__h", hash60(col("tok")))
    val bitSums = (0 until 60).map(j =>
      sum(when(shiftright(col("__h"), j) % 2 === 1, 1L).otherwise(-1L)).as(s"s$j"))
    val agg = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 60).map(j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
    agg.select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist, blocked on
    * 4 x 15-bit bands (any pair within distance <= 3 must agree exactly on
    * at least one band — pigeonhole, so blocking is lossless for maxDist 3).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String, maxDist: Int): DataFrame = {
    // 4 bands are lossless only while maxDist < 4 (pigeonhole); a larger
    // threshold would silently miss pairs whose differing bits spread 1-per-band
    require(maxDist <= 3, s"4-band blocking is only complete for maxDist <= 3, got $maxDist")
    // persist the signatures: the band self-join consumes them on BOTH
    // sides, and the broadcast build side otherwise re-executes the whole
    // token-explode + per-token-md5 + sketch pipeline — the operator's
    // corpus-pass cost — a second time (r19; the q_edit_distance plan
    // showed the duplicated subtree). One row per doc, narrower than the
    // banded form; the cache follows the shingle-index convention (session
    // clearCache releases it).
    val sigs = simhashSignatures(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandCols = (0 until 4).map(b =>
      struct(lit(b).as("band"), (shiftright(col("simhash"), b * 15) % lit(32768L)).as("bv")))
    val buckets = sigs.select(col("doc_id"), col("simhash"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band").as("band"), col("bk.bv").as("bv"))
    buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Exact duplicated-substring spans (the ExactSubstr dedup of Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better",
    * re-expressed shuffle-first instead of suffix-array-first): for every
    * document, the maximal character ranges every position of which is
    * covered by some length-`minLen` window whose content occurs >= 2 times
    * across the corpus (counting same-document repeats, as the paper does).
    *
    * A substring of length >= minLen is duplicated iff all of its
    * length-minLen windows are duplicated, so the union of duplicated
    * windows — merged as gaps-and-islands over window start offsets, with
    * an island break when the next duplicated offset no longer overlaps or
    * touches the previous window's coverage (gap > minLen) — yields exactly
    * the maximal duplicated spans. Offsets are 0-based; spans are
    * half-open [span_start, span_end).
    *
    * Scale shape: one generate-and-project pass emits (hash60(window),
    * doc_id, offset) rows — 24 bytes per character position regardless of
    * minLen, the honest cost of exact-substring dedup (a suffix array is
    * likewise O(total chars)); one shuffle on the 60-bit content hash
    * (hash-uniform, skew-free) counts occurrences; the island merge is a
    * per-document window pass keyed by doc_id (corpus-cardinality key).
    * The 60-bit md5-derived hash keeps results engine-deterministic;
    * birthday collisions become plausible only past ~2^30 distinct
    * windows — at that corpus scale widen the key to the full md5.
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String, minLen: Int): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    val t = col(textCol)
    // one md5 per CHARACTER POSITION: the densest map pass in the engine —
    // spread a few-split corpus before it (no-op on real tables)
    val windows = SkewOps.spreadSmall(docs)
      .select(col(idCol).as("doc_id"), t.as("txt"))
      .select(col("doc_id"),
        explode(when(length(col("txt")) >= minLen,
          sequence(lit(0), length(col("txt")) - minLen)).otherwise(array())).as("off"),
        col("txt"))
      .select(col("doc_id"), col("off").cast("long").as("off"),
        hash60(substring(col("txt"), col("off") + 1, lit(minLen))).as("wh"))
    // occurrence count as a window over the hash partition: ONE exchange of
    // the (wh, doc_id, off) rows and ONE generate+md5 pass — a groupBy+join
    // formulation shuffles the same rows twice and recomputes the explode
    // (measured 2x slower at sf0.1); partial aggregation cannot compress
    // this key (most window hashes are unique)
    val dupOffsets = windows
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("wh")))
      .filter(col("df") >= 2).select("doc_id", "off")
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("off")
    val withBreak = dupOffsets.withColumn("brk",
      when(lag(col("off"), 1).over(byDoc).isNull ||
        col("off") - lag(col("off"), 1).over(byDoc) > minLen, 1L).otherwise(0L))
    val withIsland = withBreak.withColumn("isl",
      sum(col("brk")).over(byDoc.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    withIsland.groupBy(col("doc_id"), col("isl"))
      .agg(min(col("off")).as("span_start"), (max(col("off")) + minLen).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_len"))
  }

  /** Excise every duplicated span (the cleanup half of ExactSubstr dedup —
    * Lee et al. cut the spans out rather than drop whole documents):
    * (doc_id, clean, n_spans, removed_chars) for EVERY document, clean =
    * the original with [[duplicateSpans]] ranges removed.
    *
    * Reconstruction is the inter-span gaps in order plus the tail — a
    * per-document window pass over the spans (already disjoint and
    * strictly separated by construction) and one map-side string fold;
    * documents without spans pass through on the left join.
    */
  def removeDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                           minLen: Int): DataFrame = {
    val spans = duplicateSpans(docs, idCol, textCol, minLen)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("span_start")
    val pieces = spans
      .withColumn("prev_end", coalesce(lag(col("span_end"), 1).over(w), lit(0L)))
      .groupBy("doc_id")
      .agg(
        array_sort(collect_list(struct(col("span_start"), col("prev_end")))).as("gaps"),
        max(col("span_end")).as("last_end"),
        count(lit(1)).as("n_spans"),
        sum(col("span_len")).as("removed_chars"))
    docs.select(col(idCol).as("doc_id"), col(textCol).as("txt"))
      .join(pieces, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        when(col("gaps").isNull, col("txt")).otherwise(concat(
          array_join(transform(col("gaps"), g =>
            substring(col("txt"), (g.getField("prev_end") + 1).cast("int"),
              (g.getField("span_start") - g.getField("prev_end")).cast("int"))), ""),
          substring(col("txt"), (col("last_end") + 1).cast("int"),
            (length(col("txt")) - col("last_end")).cast("int")))).as("clean"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("removed_chars"), lit(0L)).as("removed_chars"))
  }
}
