package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{ClassifierOps, DedupOps, ImportanceOps, TextOps, UrlOps}
import graft.storage.TxLogTable

/** The END-TO-END curation-at-ingest drill: the per-batch probes that exist
  * individually (URL canonical dedup, line-level boilerplate dedup,
  * benchmark decontamination gate, minhash-index probe, incremental
  * clustering-index fold, DSIR probe, classifier score) composed as ONE
  * streaming service into an ACID MERGE
  * target — with a mid-stream replay asserting the two invariants a
  * restart must hold:
  *
  *   - REPLAY IDEMPOTENCE: re-running a committed micro-batch leaves the
  *     curated table byte-identical (URL anti-join + keyed MERGE), and
  *   - INDEX LOCKSTEP: the minhash index folds each batch's survivors in
  *     exactly once (txn-fenced appends), so a replay never double-indexes
  *     and later batches dedup against exactly the committed corpus.
  *
  * Every stage keeps its scale shape: the reference indexes are built once
  * and never re-scanned (probe paths), the batch is the only side sketched,
  * and the drill prints its rows/s for PROGRESS.
  */
class CurationDrillSpec extends SparkSuite {
  import spark.implicits._

  test("curation-at-ingest drill: full pipeline, replay idempotent, index in lockstep") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files.createTempDirectory("curation_drill").toString

    // ---- one-time reference index builds (the corpus is never re-scanned) ----
    val refDocs = Seq(
      (1L, "alpha beta gamma delta alpha beta gamma delta alpha beta", true),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", true),
      (3L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do", false),
      (4L, "lorem ipsum dolor sit amet something else entirely goes here", false))
      .toDF("doc_id", "text", "tgt")
    DedupOps.buildMinhashIndex(refDocs, "doc_id", "text", n = 2, k = 8,
      bands = 4, path = s"$root/mh")
    // the benchmark suite: fixed, indexed once; every batch probes it
    DedupOps.buildDecontamIndex(Seq((9000L,
      "which of the following statements best describes the capital of france paris"))
      .toDF("doc_id", "text"), "doc_id", "text", n = 3, path = s"$root/bench")
    ImportanceOps.buildDsirIndex(refDocs, "text", col("tgt"), buckets = 256,
      path = s"$root/dsir")
    ClassifierOps.buildClassifierIndex(refDocs, "doc_id", "text", col("tgt"),
      buckets = 64, iters = 2, lrNum = 10L, path = s"$root/clf")

    val curated = new TxLogTable(spark, s"$root/curated")
    val mhBuckets = new TxLogTable(spark, s"$root/mh/buckets")
    val mhShingles = new TxLogTable(spark, s"$root/mh/shingles")
    val processed = new java.util.concurrent.atomic.AtomicLong(0)

    /** The composed per-batch pipeline — what a deployment's foreachBatch
      * runs. Deterministic given (batch, table state), so an at-least-once
      * replay converges.
      */
    def curateBatch(batch0: DataFrame, batchId: Long): Unit = {
      if (batch0.isEmpty) return
      processed.addAndGet(batch0.count())
      // 1. URL canonical dedup: within the batch the smallest doc_id per
      // canonical URL wins (deterministic); URLs already curated drop
      val canon = batch0.withColumn("url_c", UrlOps.canonicalUrl(col("url")))
      val batchDedup = canon
        .withColumn("__rk", row_number().over(org.apache.spark.sql.expressions
          .Window.partitionBy(col("url_c")).orderBy(col("doc_id"))))
        .filter(col("__rk") === 1).drop("__rk")
      // 2. line-level boilerplate dedup (batch-common lines strip).
      // DELIBERATELY before the curated anti-join: both batch-local stages
      // depend only on the DELIVERED batch, so a replay — whose anti-join
      // set has grown by the batch's own commits — still cleans the same
      // text (replay determinism; df counts must not shrink under replay)
      val cleanedAll = TextOps.removeCommonLines(
          batchDedup.select("doc_id", "text"), "doc_id", "text", maxDf = 2)
        .select(col("doc_id"), col("clean").as("text"))
        .join(batchDedup.select("doc_id", "url_c"), Seq("doc_id"))
      // 3a. URLs already curated drop (the committed-state dedup)
      val cleaned =
        if (curated.version.isEmpty) cleanedAll
        else cleanedAll.join(curated.read().select("url_c"), Seq("url_c"), "left_anti")
      if (cleaned.isEmpty) return
      // 3b'. benchmark decontamination gate: a batch doc whose n-grams
      // leak the benchmark suite (probe-only — the suite is never
      // re-shingled) must not reach the training corpus
      val contam = DedupOps.decontamProbe(cleaned, "doc_id", "text",
        n = 3, path = s"$root/bench")
      val decon = cleaned.join(contam.where(col("contamination") >= 0.5)
        .select("doc_id"), Seq("doc_id"), "left_anti")
      // 3b. minhash probe vs the persisted index + within batch: a batch
      // doc that near-dups anything earlier (index ids and smaller batch
      // ids are both < it) drops; the indexed corpus is never re-shingled
      val pairs = DedupOps.minhashProbe(decon, "doc_id", "text",
        n = 2, k = 8, bands = 4, tau = 0.6, path = s"$root/mh")
        .localCheckpoint()
      // 3c. fold the probe's pairs into the persisted CLUSTERING index:
      // transitive duplicate groups stay current per batch (CC runs on
      // the batch-sized representative graph only); a batch that changes
      // no component commits nothing, so replays converge without a fence
      if (!pairs.isEmpty)
        DedupOps.foldCcIndex(pairs.select("i", "j"), s"$root/cc")
      val survivors = decon.join(
        pairs.select(col("j").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
        .persist()
      try {
        if (!survivors.isEmpty) {
          // 4. fold survivors into the index, FENCED on batchId (lockstep)
          DedupOps.buildMinhashIndex(survivors, "doc_id", "text", n = 2,
            k = 8, bands = 4, path = s"$root/mh",
            txn = Some(("curation-mh", batchId)))
          // 5. DSIR importance + classifier quality, both probe-only
          val dsir = ImportanceOps.dsirProbe(spark, s"$root/dsir",
            survivors, "doc_id", "text", 256).select("doc_id", "weight_q")
          val clf = ClassifierOps.classifierProbe(spark, s"$root/clf",
            survivors, "doc_id", "text", 64)
          val out = survivors.join(dsir, Seq("doc_id")).join(clf, Seq("doc_id"))
          // 6. ACID MERGE keyed on doc_id (replays converge)
          TxLogTable.retryOnConflict() {
            curated.merge(out, Seq("doc_id")); ()
          }
        }
      } finally survivors.unpersist()
    }

    // ---- the stream: (doc_id, url, text) ----
    val in = MemoryStream[(Long, String, String)]
    val t0 = System.nanoTime()
    val q = in.toDF().toDF("doc_id", "url", "text").writeStream
      .option("checkpointLocation", s"$root/ck")
      .foreachBatch(curateBatch _).start()
    val boiler = "subscribe to our newsletter"
    try {
      // batch 1: 101 is fresh; 102 duplicates 101's URL (trailing slash +
      // utm params — the canonicalization must collapse them); 103
      // near-dups reference doc 1 (index hit); 104 is fresh but carries
      // the boilerplate line three ways with 101 and 103
      in.addData(
        (101L, "https://example.com/a?b=2", s"$boiler\nquick brown fox jumps over the lazy dog today"),
        (102L, "https://example.com/a/?b=2&utm_source=x", "entirely different words that lose the url race"),
        (103L, "https://example.com/c", s"$boiler\nalpha beta gamma delta alpha beta gamma delta alpha beta"),
        (104L, "https://example.com/d", s"$boiler\nomega psi chi phi upsilon tau sigma rho pi omicron"),
        (105L, "https://example.com/leak", "which of the following statements best describes the capital of france paris extra"))
      q.processAllAvailable()
      val after1 = curated.read().select("doc_id").as[Long].collect().toSet
      assert(after1 == Set(101L, 104L),
        s"batch 1: 102 loses the URL race, 103 near-dups the index, 105 " +
          s"leaks the benchmark and the decontamination gate drops it: $after1")
      // the boilerplate line was stripped before anything downstream saw it
      val texts1 = curated.read().select("doc_id", "text")
        .as[(Long, String)].collect().toMap
      assert(!texts1.values.exists(_.contains(boiler)),
        s"boilerplate must strip: $texts1")

      // ---- the mid-stream crash: replay batch 1 against committed state ----
      val curatedV = curated.version.get
      val bv = mhBuckets.version.get
      val sv = mhShingles.version.get
      val wantRows = curated.read().collect().toSet
      curateBatch(Seq(
        (101L, "https://example.com/a?b=2", s"$boiler\nquick brown fox jumps over the lazy dog today"),
        (102L, "https://example.com/a/?b=2&utm_source=x", "entirely different words that lose the url race"),
        (103L, "https://example.com/c", s"$boiler\nalpha beta gamma delta alpha beta gamma delta alpha beta"),
        (104L, "https://example.com/d", s"$boiler\nomega psi chi phi upsilon tau sigma rho pi omicron"),
        (105L, "https://example.com/leak", "which of the following statements best describes the capital of france paris extra"))
        .toDF("doc_id", "url", "text"), 0L)
      assert(curated.version.contains(curatedV) &&
        curated.read().collect().toSet == wantRows,
        "replaying a committed batch must not change the curated table")
      assert(mhBuckets.version.contains(bv) && mhShingles.version.contains(sv),
        "the fenced index must not double-append on replay (lockstep)")

      // batch 2: 201 near-dups 101 (folded LAST batch — the index is the
      // memory, 101 is never re-sketched); 202 is fresh and positive-ish
      in.addData(
        (201L, "https://example.com/e", "quick brown fox jumps over the lazy dog today"),
        (202L, "https://example.com/f", "alpha beta epsilon zeta alpha beta epsilon zeta done now"))
      q.processAllAvailable()
      val after2 = curated.read().select("doc_id").as[Long].collect().toSet
      assert(after2 == Set(101L, 104L, 202L),
        s"batch 2: 201 must dedup against batch 1's indexed survivor: $after2")
      // the clustering index folded each batch's pairs incrementally:
      // 103 near-dups reference doc 1 (batch 1), 201 near-dups 101
      // (batch 2) — labels are the group's min id across batches
      val cc = new TxLogTable(spark, s"$root/cc").read()
        .as[(Long, Long)].collect().toMap
      assert(cc(103L) == 1L && cc(1L) == 1L, s"batch-1 cluster: $cc")
      assert(cc(201L) == 101L && cc(101L) == 101L, s"batch-2 cluster: $cc")
      // the scores carry model direction: 202 (target-like) above 104
      val w = curated.read().select("doc_id", "weight_q")
        .as[(Long, Long)].collect().toMap
      assert(w(202L) > w(104L), s"DSIR direction: $w")
      assert(curated.read().columns.toSet ==
        Set("doc_id", "url_c", "text", "weight_q", "score_q"))
    } finally q.stop()
    val wallS = (System.nanoTime() - t0) / 1e9
    val rows = processed.get()
    info(f"[curation-drill] rows=$rows wall_s=$wallS%.2f rows_per_s=${rows / wallS}%.1f")

    // ---- throughput phase: one bulk batch through the same pipeline ----
    // (the tiny streamed batches above measure correctness, not rate; this
    // is the number PROGRESS records as the drill's rows/s)
    val bulkN = 2000
    val words = Vector("alpha", "beta", "gamma", "delta", "omega", "lorem",
      "ipsum", "quick", "brown", "fox", "zeta", "sigma", "tau", "kappa")
    val bulk = (0 until bulkN).map { i =>
      val txt = (0 until 12).map(j => words((i * 31 + j * 7) % words.size))
        .mkString(" ")
      (1000L + i, s"https://bulk.example.com/p$i", s"$boiler\n$txt $i")
    }.toDF("doc_id", "url", "text")
    val tb = System.nanoTime()
    curateBatch(bulk, 10L)
    val bulkWall = (System.nanoTime() - tb) / 1e9
    val bulkRate = bulkN / bulkWall
    assert(curated.read().count() > 3, "bulk batch must have curated rows")
    info(f"[curation-drill] bulk_rows=$bulkN wall_s=$bulkWall%.2f rows_per_s=$bulkRate%.0f")
    println(f"[curation-drill] bulk_rows=$bulkN wall_s=$bulkWall%.2f rows_per_s=$bulkRate%.0f")
  }

  test("semantic dedup drill: build-once centroids -> cluster-local probe -> fenced member fold, replay lockstep") {
    import graft.operators.SimilarityOps
    val root = java.nio.file.Files.createTempDirectory("sem_drill").toString
    val idx = s"$root/sem"
    // reference corpus: two clean embedding directions (ids 0-3 along e1,
    // ids 4-7 along e2 — ids 0 and 1 seed the two k-means centroids); the
    // clustering is learned ONCE here and never again
    def e1(eps: Float) = Array(1.0f, eps, 0.0f, 0.0f)
    def e2(eps: Float) = Array(eps, 1.0f, 0.0f, 0.0f)
    val ref = Seq(
      0L -> e1(0.0f), 1L -> e2(0.0f), 2L -> e1(0.01f), 3L -> e1(0.02f),
      4L -> e2(0.01f), 5L -> e2(0.02f), 6L -> e1(0.03f), 7L -> e2(0.03f))
      .toDF("vec_id", "embedding")
    SimilarityOps.buildSemanticIndex(ref, nCentroids = 2, kmeansIters = 2, path = idx)
    val centroids = new TxLogTable(spark, s"$idx/centroids")
    val members = new TxLogTable(spark, s"$idx/members")
    val centroidsV = centroids.version.get

    /** The per-batch leg a deployment's foreachBatch runs: probe the batch
      * cluster-locally, drop every batch vector that near-dups a smaller id
      * (keep-lowest-id curation), fold the survivors into the member table
      * fenced on batchId. Deterministic given (batch, table state).
      */
    def dedupBatch(batch: DataFrame, batchId: Long): Set[Long] = {
      val pairs = SimilarityOps.semanticDedupProbe(spark, idx, batch, tau = 0.95)
        .localCheckpoint()
      // j is the pair's larger id: with batch ids above all indexed ids,
      // keep-lowest-id curation = drop every j
      val dups = pairs.select(col("j")).as[Long].collect().toSet
      val survivors = batch.filter(!col("vec_id").isin(dups.toSeq: _*))
      if (!survivors.isEmpty)
        SimilarityOps.foldSemanticIndex(spark, idx, survivors,
          txn = Some(("sem-drill", batchId)))
      survivors.select("vec_id").as[Long].collect().toSet
    }

    // batch 1: 100 duplicates ref id 2 (must pair against the INDEXED
    // members through the cid equi-join and drop); 101 is a fresh direction
    // (orthogonal to both clusters — no pair, survives, folds in)
    val batch1 = Seq(100L -> e1(0.01f), 101L -> Array(0.0f, 0.0f, 1.0f, 0.0f))
      .toDF("vec_id", "embedding")
    assert(dedupBatch(batch1, 1L) == Set(101L), "100 must dedup, 101 survive")
    val membersV1 = members.version.get
    val memberIds = members.read().select("vec_id").as[Long].collect().toSet
    assert(memberIds == (0L to 7L).toSet + 101L, s"fold must add 101 only: $memberIds")

    // replay batch 1 (a restarted foreachBatch redelivers): the probe is
    // read-only and the fold is fenced on batchId — same survivors, no
    // second member commit
    assert(dedupBatch(batch1, 1L) == Set(101L), "replay must converge")
    assert(members.version.contains(membersV1),
      "the fenced member fold must not double-apply on replay (lockstep)")

    // batch 2: 200 duplicates 101 — the BATCH-1 SURVIVOR, provable only if
    // the fold made 101 visible to later probes; 201 is fresh again
    val batch2 = Seq(200L -> Array(0.0f, 0.0f, 1.0f, 0.0f),
      201L -> Array(0.0f, 0.0f, 0.0f, 1.0f)).toDF("vec_id", "embedding")
    assert(dedupBatch(batch2, 2L) == Set(201L),
      "200 must dedup against the folded batch-1 survivor")
    // the centroids never re-learn: SemDeDup learns once, members accrete
    assert(centroids.version.contains(centroidsV),
      "probe/fold must never touch the centroid table")
    val finalIds = members.read().select("vec_id").as[Long].collect().toSet
    assert(finalIds == (0L to 7L).toSet ++ Set(101L, 201L), s"final corpus: $finalIds")
  }

  test("curated media drill: decode gate -> phash probe -> dedup gate -> fenced fold, replay byte-identical") {
    import graft.operators.MultimodalOps
    val root = java.nio.file.Files.createTempDirectory("media_drill").toString
    // the reference image corpus is decoded + pHashed ONCE; batches only
    // ever probe it (the 100 TB property: codec + DCT cost per image EVER)
    MultimodalOps.buildPhashIndex(
      spark.createDataset(Seq(1L, 2L, 3L))
        .map(id => MultimodalOps.MediaRow(id, MultimodalOps.synthImage(id), "image")),
      s"$root/phash")
    val curated = new TxLogTable(spark, s"$root/curated_media")
    val bands = new TxLogTable(spark, s"$root/phash/bands")
    val hashes = new TxLogTable(spark, s"$root/phash/hashes")

    /** The composed media leg — deterministic given (batch, table state):
      * already-curated ids drop, the REAL codec dead-letters corrupt
      * payloads, near-dups of the index or of a smaller batch id drop,
      * survivors fold into the index FENCED on batchId and MERGE with
      * their decoder-derived metadata.
      */
    def curateMedia(batch: Seq[(Long, Array[Byte])], batchId: Long): Unit = {
      val media = spark.createDataset(batch.map { case (id, bytes) =>
        MultimodalOps.MediaRow(id, bytes, "image") })
      // 0. committed-state dedup: a replayed batch re-converges here
      val fresh =
        if (curated.version.isEmpty) media
        else {
          val done = curated.read().select("doc_id").as[Long].collect().toSet
          media.filter(m => !done(m.doc_id))
        }
      if (fresh.isEmpty) return
      // 1. decode gate: only payloads the REAL codec accepts continue
      val meta = MultimodalOps.decodeMeta(fresh).toDF().filter(col("ok"))
        .select("doc_id", "n_bytes", "width", "height")
      val okIds = meta.select("doc_id").as[Long].collect().toSet
      val decoded = fresh.filter(m => okIds(m.doc_id))
      if (decoded.isEmpty) return
      // 2. near-dup gate: vs the persisted index AND within the batch —
      // doc_a < doc_b and index ids are smaller, so dropping doc_b keeps
      // the earliest copy everywhere
      val pairs = MultimodalOps.phashProbe(decoded, s"$root/phash", maxHamming = 0)
      val dupIds = pairs.select("doc_b").as[Long].collect().toSet
      val survivors = decoded.filter(m => !dupIds(m.doc_id))
      if (survivors.isEmpty) return
      // 3. fold survivors into the index, FENCED on batchId (lockstep)
      MultimodalOps.buildPhashIndex(survivors, s"$root/phash",
        Some(("media-mh", batchId)))
      // 4. ACID MERGE with decoder-derived metadata + the fingerprint
      val out = MultimodalOps.imagePhash(survivors).toDF()
        .select("doc_id", "phash").join(meta, Seq("doc_id"))
      TxLogTable.retryOnConflict() { curated.merge(out, Seq("doc_id")); () }
    }

    def img(contentOf: Long): Array[Byte] = MultimodalOps.synthImage(contentOf)
    // batch 1: 101 duplicates corpus image 1; 102 is fresh; 103 is corrupt
    // (dead-letters at decode); 104 duplicates 102 within the batch
    val batch1 = Seq((101L, img(1L)), (102L, img(44L)),
      (103L, Array[Byte](1, 2, 3)), (104L, img(44L)))
    curateMedia(batch1, 0L)
    val after1 = curated.read().select("doc_id").as[Long].collect().toSet
    assert(after1 == Set(102L),
      s"101 dups the index, 103 is corrupt, 104 loses to 102 in-batch: $after1")
    // decoder-derived metadata, never formulas: synthImage(44) is 26x21
    val m102 = curated.read().filter(col("doc_id") === 102L)
      .select("width", "height").as[(Int, Int)].head()
    assert(m102 == ((26, 21)), s"width/height must come from the BMP header: $m102")

    // ---- the crash replay: byte-identical table, no index double-fold ----
    val cv = curated.version.get
    val bv = bands.version.get
    val hv = hashes.version.get
    val wantRows = curated.read().collect().toSet
    val wantBytes = curated.dirPaths(cv).flatMap { d =>
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      try w.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => p.toString -> java.nio.file.Files.size(p)).toSeq
      finally w.close()
    }.toMap
    curateMedia(batch1, 0L)
    assert(curated.version.contains(cv) &&
      curated.read().collect().toSet == wantRows,
      "replaying a committed media batch must not change the curated table")
    val gotBytes = curated.dirPaths(curated.version.get).flatMap { d =>
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      try w.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => p.toString -> java.nio.file.Files.size(p)).toSeq
      finally w.close()
    }.toMap
    assert(gotBytes == wantBytes, "curated media table must be BYTE-identical under replay")
    assert(bands.version.contains(bv) && hashes.version.contains(hv),
      "the fenced phash index must not double-fold on replay (lockstep)")

    // batch 2: 201 duplicates 102 — folded LAST batch, never re-decoded —
    // and 202 is fresh; the index is the memory across batches
    curateMedia(Seq((201L, img(44L)), (202L, img(77L))), 1L)
    val after2 = curated.read().select("doc_id").as[Long].collect().toSet
    assert(after2 == Set(102L, 202L),
      s"201 must dedup against batch 1's folded survivor: $after2")
  }
}
