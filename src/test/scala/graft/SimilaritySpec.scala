package graft

import org.apache.spark.sql.functions._
import graft.operators.{MultimodalOps, SimilarityOps}

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)

  test("quantized cosine of identical vectors is 1.0 (within quantization)") {
    val df = Seq((1L, Array(0.5f, 0.5f, 0.1f)), (2L, Array(0.5f, 0.5f, 0.1f)))
      .toDF("vec_id", "embedding")
    val cos = SimilarityOps.brutePairs(df, 0.0).select("cos").as[Double].collect().head
    assert(math.abs(cos - 1.0) < 1e-9)
  }

  test("bruteTopK ranks by cosine desc with id tie-break, k rows per query") {
    val top = SimilarityOps.bruteTopK(emb.filter(col("vec_id") < 5), emb, 3)
    val byQuery = top.select("query_id", "rk", "cos")
      .as[(Long, Long, Double)].collect().groupBy(_._1)
    assert(byQuery.size == 5)
    byQuery.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == Seq(1L, 2L, 3L))
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sortBy(-_).toSeq)
    }
  }

  test("bruteTopKL2: dist2 equals the direct squared difference, ranks ascend") {
    val top = SimilarityOps.bruteTopKL2(emb.filter(col("vec_id") < 5), emb, 3)
    // the |q|^2+|c|^2-2qc identity must equal a literal sum of (q_i-c_i)^2
    // over the same quantized ints — join back to the raw vectors
    val qv = emb.select(col("vec_id"), SimilarityOps.quantize(col("embedding")).as("v"))
    val check = top
      .join(qv.select(col("vec_id").as("query_id"), col("v").as("a")), "query_id")
      .join(qv.select(col("vec_id").as("neighbor_id"), col("v").as("b")), "neighbor_id")
      .withColumn("direct", aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x))
    assert(check.filter(col("dist2") =!= col("direct")).count() == 0)
    assert(check.filter(col("dist2") < 0).count() == 0)
    val byQuery = top.select("query_id", "rk", "dist2")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    assert(byQuery.size == 5)
    byQuery.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == Seq(1L, 2L, 3L))
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq)
    }
  }

  test("ivf assignment argmax: exact cosine ties break to the MIN cid") {
    // r18: the assignment is a max_by hash aggregation (not a window) —
    // this pins the tie-break it must preserve. vec 2 = (1,1) has the
    // IDENTICAL cosine to both unit-axis centroids, so cid 0 must win.
    val df = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f)), (3L, Array(0.1f, 0.9f))).toDF("vec_id", "embedding")
    val got = SimilarityOps.ivfAssignments(df, 2, 0)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 1L),
      s"tie must break to min cid: $got")
  }

  test("LSH near-dup pairs are a subset of brute-force pairs") {
    val brute = SimilarityOps.brutePairs(emb, 0.4)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val lsh = SimilarityOps.lshNearDupPairs(emb, 8, 64, 0.4)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute))
  }

  test("IVF with learned centroids: recall vs brute-force top-k") {
    val isQ = col("vec_id") >= 100 && col("vec_id") < 120
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = pairs(SimilarityOps.bruteTopK(emb.filter(isQ), emb, 3))
    val learned = pairs(SimilarityOps.ivfTopK(emb, 8, 2, 3, isQ, kmeansIters = 2))
    val recall = (learned & brute).size.toDouble / brute.size
    info(f"ivf recall@3 (8 centroids, 2 probes, 2 kmeans iters): $recall%.2f")
    // 2-of-8 probes scans ~1/4 of the corpus; on the near-isotropic fixture
    // embeddings (no real cluster structure) measured recall is ~0.42
    // (learned) vs ~0.3 (first-N init). A floor well above the ~0.25 random
    // baseline keeps this a real assertion without overfitting the fixture.
    assert(recall >= 0.35, f"recall $recall%.2f below floor")
    // the learned index must not be WORSE than the untrained first-N one
    val firstN = pairs(SimilarityOps.ivfTopK(emb, 8, 2, 3, isQ, kmeansIters = 0))
    val recallFirstN = (firstN & brute).size.toDouble / brute.size
    info(f"first-N recall@3: $recallFirstN%.2f")
    assert(recall >= recallFirstN - 0.15, "learned centroids regressed recall materially")
  }

  test("ivfProbe reads only the probed buckets' directories and matches the inline path") {
    val root = java.nio.file.Files.createTempDirectory("ivf_prune").toString
    // 8 clean directions (ids 0-7 seed the centroids), 12 satellites each:
    // cluster structure is exact, so bucket membership is deterministic
    def dir8(c: Int, eps: Float): Array[Float] = {
      val v = Array.fill(8)(0.0f); v(c) = 1.0f; v((c + 1) % 8) = eps; v
    }
    val corpus = (0 until 8).flatMap(c => (0 until 13).map(s =>
      (c + 8L * s) -> dir8(c, 0.02f * s))).toDF("vec_id", "embedding")
    SimilarityOps.buildIvfIndex(corpus, nCentroids = 8, kmeansIters = 1, path = root)
    val asgFiles = new graft.storage.TxLogTable(spark, s"$root/assignments")
      .read().inputFiles.toSet
    assert(asgFiles.size >= 4, s"index not clustered: ${asgFiles.size} files")
    // one query near direction 3, one probe: the scoring scan must touch
    // only the directory slice holding cluster 3
    val q = Seq(1003L -> dir8(3, 0.01f)).toDF("vec_id", "embedding")
    val res = SimilarityOps.ivfProbe(spark, root, q, probes = 1, k = 3)
    val scanned = res.inputFiles.toSet & asgFiles
    assert(scanned.nonEmpty && scanned.size < asgFiles.size,
      s"probe read ${scanned.size} of ${asgFiles.size} assignment files — no pruning")
    // ... and the pruned result is the same top-k the inline path computes
    val inline = SimilarityOps.ivfTopK(
        corpus.unionByName(q), nCentroids = 8, probes = 1, k = 3,
        isQuery = col("vec_id") === 1003L, kmeansIters = 1)
      .select("neighbor_id", "rk").as[(Long, Long)].collect().toSet
    val probed = res.select("neighbor_id", "rk").as[(Long, Long)].collect().toSet
    assert(probed == inline, s"pruned probe diverged: $probed vs $inline")
  }

  test("PQ/ADC: top-1 self-hit sanity and recall vs brute-force") {
    val isQ = col("vec_id") >= 100 && col("vec_id") < 110
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = pairs(SimilarityOps.bruteTopK(emb.filter(isQ), emb, 5))
    val pq = pairs(SimilarityOps.pqTopK(emb, m = 8, kCodes = 16, dim = 64,
      k = 5, isQuery = isQ, kmeansIters = 2))
    val recall = (pq & brute).size.toDouble / brute.size
    info(f"pq recall@5 (8x16 codes): $recall%.2f")
    // 8x16 codes compress 64 float dims ~64x; the fixture embeddings are
    // near-isotropic (no cluster structure for PQ to exploit), so measured
    // recall is 0.22 — ~9x the 5-of-200 random baseline. Deterministic
    // codebooks make this exact run-over-run.
    assert(recall >= 0.2, f"recall $recall%.2f below floor")
    // every query returns exactly k rows with distinct neighbors
    val full = SimilarityOps.pqTopK(emb, 8, 16, 64, 5, isQ, 2)
      .select("query_id", "rk").as[(Long, Long)].collect()
    assert(full.groupBy(_._1).forall { case (_, rs) => rs.map(_._2).sorted.sameElements(1L to 5L) })
  }

  test("semantic dedup cluster cap: degenerate cluster bounded, normal inputs unchanged") {
    // normal input: real fixture embeddings across 8 learned clusters —
    // with every cluster under the cap, results must be IDENTICAL
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("cid", "i", "j", "cos").as[(Long, Long, Long, Double)].collect().toSet
    val uncapped = collect(SimilarityOps.semanticDedupPairs(emb, 8, 1, tau = 0.5))
    val capped = collect(SimilarityOps.semanticDedupPairs(emb, 8, 1, tau = 0.5,
      maxClusterSize = Some(100000L)))
    assert(capped == uncapped, "a cap no cluster reaches must not change results")
    // degenerate input: one identical vector repeated -> k-means puts all
    // N in ONE cluster -> uncapped pair space is N(N-1)/2; the cap
    // sub-shards it to ceil(N/m) shards of ~m
    val n = 60; val m = 10L
    val degen = spark.createDataset((0 until n).map(i => (i.toLong, Array(0.6f, 0.8f, 0.0f))))
      .toDF("vec_id", "embedding")
    val all = SimilarityOps.semanticDedupPairs(degen, 4, 1, tau = 0.9)
    assert(all.count() == n.toLong * (n - 1) / 2, "identical vectors: all-pairs without a cap")
    val sub = SimilarityOps.semanticDedupPairs(degen, 4, 1, tau = 0.9, maxClusterSize = Some(m))
    val subPairs = sub.select("cid", "i", "j", "cos").as[(Long, Long, Long, Double)].collect()
    // bounded: ceil(60/10)=6 shards of 10 -> 6 * C(10,2) = 270 pairs, not 1770
    assert(subPairs.length.toLong == 6L * m * (m - 1) / 2,
      s"expected 270 within-shard pairs, got ${subPairs.length}")
    // soundness: every capped pair exists in the uncapped set, same cos
    val allSet = collect(all)
    assert(subPairs.forall(allSet.contains), "cap must only DROP pairs, never invent or alter")
  }

  test("multimodal decodeMeta: every row routed through its modality's real codec") {
    val media = Tables.documents(spark, sf).limit(21)
      .select(col("doc_id")).as[Long].map(MultimodalOps.synthMedia)
    val decoded = MultimodalOps.decodeMeta(media).collect()
    assert(decoded.length == 21)
    assert(decoded.forall(_.ok), decoded.filterNot(_.ok).map(_.err).mkString("; "))
    decoded.foreach { d =>
      d.modality match {
        case "image" => assert(d.width >= 16 && d.height >= 16 && d.n_frames == 1)
        case "audio" => assert(d.width == 0 && d.n_frames >= 800 && d.duration_us == d.n_frames * 125)
        case "video" => assert(d.width >= 64 && d.n_frames >= 3 && d.duration_us == d.n_frames * 33333L)
      }
      assert(d.n_bytes > 0)
    }
    // a corrupt payload dead-letters instead of fabricating features
    val bad = MultimodalOps.decodeMeta(
      Seq(MultimodalOps.MediaRow(99L, Array[Byte](1, 2, 3), "image")).toDS()).head()
    assert(!bad.ok && bad.err.nonEmpty && bad.width == 0)
  }

  test("frame sampling emits stride-spaced offsets") {
    val media = MultimodalOps.withPayload(Tables.documents(spark, sf).limit(3))
    val frames = MultimodalOps.sampleFrames(media, frameBytes = 64, stride = 2)
      .select("doc_id", "frame_idx", "frame_offset")
      .as[(Long, Long, Long)].collect()
    assert(frames.nonEmpty)
    frames.foreach { case (_, idx, off) => assert(idx % 2 == 0 && off == idx * 64) }
  }

  test("frame count is exact for exact-multiple payloads (no phantom frame)") {
    val media = Seq((1L, "x" * 128), (2L, "y" * 100)).toDF("doc_id", "text")
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("modality", lit("image"))
    val frames = MultimodalOps.sampleFrames(media, frameBytes = 64, stride = 1)
      .groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(frames == Map(1L -> 2L, 2L -> 2L)) // 128/64 = exactly 2; ceil(100/64) = 2
  }

  test("mmrRerank: a redundant exact duplicate defers to the diverse pick") {
    // 10 and 11 are identical (pair sim 1.0); 12 is equally RELEVANT to the
    // query (all three at cos 1/sqrt(2)) but only half-similar to 10. Plain
    // top-3 orders by id tie-break [10, 11, 12]; MMR at lambda=0.7 must
    // interleave the diverse candidate: [10, 12, 11].
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (10L, Array(1f, 1f, 0f, 0f)),
      (11L, Array(1f, 1f, 0f, 0f)),
      (12L, Array(1f, 0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val got = SimilarityOps.mmrRerank(vecs.filter(col("vec_id") === 1), vecs, n = 3, k = 3)
    val order = got.orderBy("step").select("sel_id").as[Long].collect().toSeq
    assert(order == Seq(10L, 12L, 11L), s"got $order")
    // step-1 score carries a zero redundancy term: exactly 0.7 * cos
    val s1 = got.filter(col("step") === 1).select("score").as[Double].collect().head
    assert(s1 == 0.7 * (1e14 / math.sqrt(1e14 * 2e14)), s"step-1 score $s1")
    // rerun is bit-identical (deterministic ties, no rand anywhere)
    val again = SimilarityOps.mmrRerank(vecs.filter(col("vec_id") === 1), vecs, n = 3, k = 3)
      .orderBy("step").select("sel_id", "score").as[(Long, Double)].collect().toSeq
    assert(again == got.orderBy("step").select("sel_id", "score")
      .as[(Long, Double)].collect().toSeq)
  }

  test("mmrRerank: the in-memory greedy equals the round-based reference bit-for-bit") {
    // r18: mmrRerank folds the per-query greedy in one flatMapGroups pass;
    // mmrRerankRounds is the k-round dataframe reference it replaced —
    // every (query, step, pick, IEEE score) must agree exactly, on the
    // fixture AND on a degenerate tie-heavy corpus
    val qs = emb.filter(col("vec_id") < 3)
    val got = SimilarityOps.mmrRerank(qs, emb, n = 12, k = 4)
      .select("query_id", "step", "sel_id", "score")
      .as[(Long, Long, Long, Double)].collect().toSet
    val ref = SimilarityOps.mmrRerankRounds(qs, emb, n = 12, k = 4)
      .select("query_id", "step", "sel_id", "score")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == ref, s"greedy fold diverged from the round reference")
    val dup = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (10L, Array(1f, 1f, 0f, 0f)),
      (11L, Array(1f, 1f, 0f, 0f)), (12L, Array(1f, 0f, 1f, 0f)),
      (13L, Array(1f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val got2 = SimilarityOps.mmrRerank(dup.filter(col("vec_id") === 1), dup, n = 4, k = 4)
      .select("query_id", "step", "sel_id", "score")
      .as[(Long, Long, Long, Double)].collect().toSet
    val ref2 = SimilarityOps.mmrRerankRounds(dup.filter(col("vec_id") === 1), dup, n = 4, k = 4)
      .select("query_id", "step", "sel_id", "score")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got2 == ref2, s"tie-heavy corpus diverged: $got2 vs $ref2")
  }
}
