package graft

import org.apache.spark.sql.functions._
import graft.operators.{SampleOps, TextOps}

class SampleSpec extends SparkSuite {
  import spark.implicits._

  test("mixture sampling: integer rates hit weight shares, capped at keep-all") {
    val docs = Seq.tabulate(300)(i => (i.toLong, s"src${i % 3}", 10L))
      .toDF("doc_id", "source", "toks")
    val wt = substring(col("source"), 4, 10).cast("long") + 1 // 1, 2, 3
    val rates = SampleOps.mixtureRates(docs, "source", wt, col("toks"), 600L)
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // each source: 100 docs x 10 tokens = 1000; wsum 6; budget 600
    assert(rates("src0") == (("src0", 1L, 1000L, 100L, 100000L)))
    assert(rates("src1") == (("src1", 2L, 1000L, 200L, 200000L)))
    assert(rates("src2") == (("src2", 3L, 1000L, 300L, 300000L)))
    // a budget beyond the corpus caps every rate at keep-all
    assert(SampleOps.mixtureSample(docs, "source", wt, col("doc_id"), col("toks"),
      1000000L).count() == 300)
    // the kept set is a pure function of the inputs
    def kept() = SampleOps.mixtureSample(docs, "source", wt, col("doc_id"),
      col("toks"), 600L).select("doc_id").as[Long].collect().toSet
    val k = kept()
    assert(k == kept() && k.nonEmpty && k.size < 300)
  }

  test("mixture rates: huge weights never overflow, zero-token source gets rate 0") {
    // weight near Long.Max: the old long multiply budget*weight wrapped
    // negative; decimal(38,0) arithmetic keeps target = budget*w div ΣW exact
    val big = Seq((1L, "a", 100L), (2L, "b", 100L)).toDF("doc_id", "source", "toks")
    val hugeW = when(col("source") === "a", lit(Long.MaxValue / 2)).otherwise(lit(1L))
    val r1 = SampleOps.mixtureRates(big, "source", hugeW, col("toks"), 1000L)
      .select("source", "target_tokens", "rate_ppm")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(r1("a")._1 == 999L && r1("a")._2 > 0, s"overflowed: ${r1("a")}")
    assert(r1("b")._1 == 0L)
    // a zero-token source: the naive div-by-zero null was swallowed by
    // null-skipping least() into rate 1e6 (keep all); must be an explicit 0
    val z = Seq((1L, "full", 50L), (2L, "empty", 0L)).toDF("doc_id", "source", "toks")
    val r2 = SampleOps.mixtureRates(z, "source", lit(1L), col("toks"), 10L)
      .select("source", "rate_ppm").as[(String, Long)].collect().toMap
    assert(r2("empty") == 0L, s"zero-token source rate was ${r2("empty")}, not 0")
    assert(r2("full") == 100000L)
  }

  test("hash split: deterministic, stable under growth, roughly 80/10/10") {
    val docs = Tables.documents(spark, sf)
    val counts = docs.withColumn("split", SampleOps.splitAssign(col("doc_id")))
      .groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val total = counts.values.sum.toDouble
    assert(counts("train") / total > 0.65 && counts("train") / total < 0.95)
    assert(counts.getOrElse("val", 0L) + counts.getOrElse("test", 0L) > 0)
    // stability: the assignment of doc 0..9 is unchanged when more docs exist
    val first = docs.filter(col("doc_id") < 10)
      .select(col("doc_id"), SampleOps.splitAssign(col("doc_id")).as("s"))
      .as[(Long, String)].collect().toMap
    val again = docs.select(col("doc_id"), SampleOps.splitAssign(col("doc_id")).as("s"))
      .filter(col("doc_id") < 10).as[(Long, String)].collect().toMap
    assert(first == again)
  }

  test("pack chunks: streaming concat-and-cut boundaries on a handcrafted shard") {
    // budget 10; cumulative-before: 0,4,9,13,15,24 -> chunks 0,0,0,1,1,2
    val docs = Seq(("s", 1L, 4L), ("s", 2L, 5L), ("s", 3L, 4L),
      ("s", 4L, 2L), ("s", 5L, 9L), ("s", 6L, 1L)).toDF("source", "doc_id", "n_tok")
    val got = SampleOps.packChunks(docs, col("source"), col("doc_id"), col("n_tok"), 10L)
      .select("doc_id", "chunk").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L, 6L -> 2L))
  }

  test("BPE: expression chain matches an independent encoder; packing uses its budgets") {
    import graft.operators.TextOps
    // reference: classic list-based BPE — per word, apply each merge rule
    // in table order, leftmost-first, non-overlapping
    def refBpe(text: String): Seq[String] =
      text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq.flatMap { w =>
        var syms = w.map(_.toString).toVector
        for ((x, y) <- TextOps.BpeMerges) {
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
              out += x + y; i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
        }
        syms
      }
    // handcrafted chains: th+e and an+d need their prior merges
    assert(refBpe("theand") == Seq("the", "and"))
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 40)
    val got = docs.select(col("doc_id"), col("text"),
      TextOps.bpeTokenCount(col("text")).as("n")).as[(Long, String, Long)]
      .collect().sortBy(_._1)
    got.foreach { case (id, text, n) =>
      assert(n == refBpe(text).length.toLong, s"doc $id BPE count") }
    // the merges genuinely compress: fewer tokens than letters somewhere
    assert(got.exists { case (_, t, n) => n < t.count(_.isLetter) })
    // packing on BPE budgets: chunk boundaries from the expression equal
    // boundaries recomputed from the reference encoder's counts
    val packed = SampleOps.packChunks(
      docs.withColumn("n", TextOps.bpeTokenCount(col("text"))),
      lit("all"), col("doc_id"), col("n"), 500L)
      .select("doc_id", "chunk").as[(Long, Long)].collect().toMap
    var run = 0L
    val want = got.map { case (id, text, _) =>
      val c = run / 500L; run += refBpe(text).length.toLong; id -> c
    }.toMap
    assert(packed == want)
  }

  test("pack chunks: per-group windows, chunk ids contiguous from zero per source") {
    val docs = Tables.documents(spark, sf)
      .withColumn("n_tok", graft.operators.TextOps.tokenCount(col("text")))
    val chunks = SampleOps.packChunks(docs, col("source"), col("doc_id"), col("n_tok"), 2000L)
      .groupBy("source").agg(countDistinct("chunk").as("n_chunks"), max("chunk").as("max_chunk"))
      .as[(String, Long, Long)].collect()
    chunks.foreach { case (src, n, mx) =>
      assert(n == mx + 1, s"$src: chunk ids not contiguous (distinct=$n max=$mx)")
    }
  }

  test("mixture oversample: sources repeat by epochs + deterministic tail; zero-copy docs vanish") {
    // handcrafted corpus: src a = 100 tokens total, src b = 300; weights
    // 3:1 over a 400-token budget -> a targets 300 tokens = 3.0 epochs
    // exactly, b targets 100 = 1/3 of one pass (tail only)
    val docs = Seq(
      ("a", 1L, 50L), ("a", 2L, 50L),
      ("b", 3L, 100L), ("b", 4L, 100L), ("b", 5L, 100L))
      .toDF("source", "doc_id", "n_tok")
    val w = when(col("source") === "a", 3L).otherwise(1L)
    val rates = SampleOps.mixtureEpochRates(docs, "source", w, col("n_tok"), 400L)
      .select("source", "total_tokens", "epochs", "tail_rate_ppm")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(rates.toSeq == Seq(("a", 100L, 3L, 0L), ("b", 300L, 0L, 333333L)), rates.toSeq)
    val out = SampleOps.mixtureOversample(docs, "source", w, col("doc_id"),
      col("n_tok"), 400L).select("source", "doc_id", "epoch")
      .as[(String, Long, Long)].collect()
    // every a-doc appears exactly 3 times, epochs 0..2
    for (id <- Seq(1L, 2L))
      assert(out.filter(_._2 == id).map(_._3).sorted.toSeq == Seq(0L, 1L, 2L))
    // b-docs ride the 333333-ppm hash tail; ids 3/4/5 hash to buckets
    // 691823/719729/514164 — all above the tail, so every b-doc keeps 0
    // copies and VANISHES (the empty-sequence explode), deterministically
    assert(!out.exists(_._1 == "b"), out.filter(_._1 == "b").toSeq.toString)
    // a wider budget lifts the tail above every b hash: 1000 tokens gives
    // target_b = 250 -> tail 833333 ppm, admitting all three b-docs once
    val wider = SampleOps.mixtureOversample(docs, "source", w, col("doc_id"),
      col("n_tok"), 1000L)
      .select("source", "doc_id", "epoch").as[(String, Long, Long)].collect()
    assert(wider.count(_._1 == "b") == 3, wider.toSeq.toString)
    // pure function: re-evaluation is identical
    assert(out.toSet == SampleOps.mixtureOversample(docs, "source", w,
      col("doc_id"), col("n_tok"), 400L)
      .select("source", "doc_id", "epoch").as[(String, Long, Long)].collect().toSet)
  }

  test("leakage-safe split: near-dup clusters land in ONE split where the naive split tears them") {
    import graft.operators.DedupOps
    // two duplicate clusters whose members' NAIVE per-id splits disagree
    // (md5 buckets: id 1 -> train, 9 -> test; 10 -> train, 11 -> test,
    // 12 -> train) plus two singletons — the exact contamination shape:
    // per-doc assignment puts one copy in train and its twin in test
    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tB = "solar lunar stellar orbital cosmic nebula quasar pulsar comet meteor"
    val docs = Seq(
      (1L, tA), (9L, tA),
      (10L, tB), (11L, tB), (12L, tB),
      (100L, "completely different content about one unrelated subject"),
      (101L, "another standalone document covering separate material entirely"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .select("i", "j")
    assert(pairs.as[(Long, Long)].collect().toSet ==
      Set((1L, 9L), (10L, 11L), (10L, 12L), (11L, 12L)), "detector sanity")
    val out = SampleOps.leakageSafeSplit(docs, col("doc_id"), pairs)
      .select(col("doc_id"), col("rep_id"), col("split"))
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // the naive split WOULD have torn both clusters apart
    val naive = docs.select(col("doc_id"),
      SampleOps.splitAssign(col("doc_id")).as("s")).as[(Long, String)].collect().toMap
    assert(naive(1L) != naive(9L) && naive(11L) != naive(12L),
      "fixture must exhibit the leak under naive splitting")
    // every cluster keys on its min-id representative and moves as a unit
    assert(out(1L) == (1L, "train") && out(9L) == (1L, "train"))
    assert(Seq(10L, 11L, 12L).forall(out(_) == (10L, "train")))
    // singletons represent themselves, same assignment the naive split gives
    assert(out(100L) == (100L, naive(100L)) && out(101L) == (101L, naive(101L)))
  }

  test("deterministic shuffle: dense per-shard positions, seed-keyed permutation, growth-stable") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    def shuffle(d: org.apache.spark.sql.DataFrame, seed: String) =
      SampleOps.deterministicShuffle(d, col("doc_id"), seed, nShards = 8)
        .select(col("doc_id").cast("long"), col("shard"), col("pos"))
        .as[(Long, Long, Long)].collect()
    val a = shuffle(docs, "ep0")
    // shards in range; positions dense 0..n-1 within each shard
    assert(a.forall(r => r._2 >= 0 && r._2 < 8))
    a.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        s"shard $s positions not dense")
    }
    // pure function of (seed, id): re-evaluation is identical
    assert(a.toSet == shuffle(docs, "ep0").toSet)
    // the next epoch's seed is a genuinely different permutation
    val b = shuffle(docs, "ep1")
    val moved = a.toSet.diff(b.toSet).size
    assert(moved > a.length / 2, s"only $moved/${a.length} rows moved between seeds")
    // growth-stability: the corpus' first half keeps its relative order
    // (per shard) inside the full corpus' shuffle — appended documents
    // interleave, they never reshuffle what a prior run already laid out
    val ids = docs.select(col("doc_id").cast("long")).as[Long].collect().sorted
    val half = ids.take(ids.length / 2).toSet
    val subset = shuffle(docs.filter(col("doc_id").isin(half.toSeq: _*)), "ep0")
    for (s <- 0L until 8L) {
      val subOrder = subset.filter(_._2 == s).sortBy(_._3).map(_._1).toSeq
      val fullOrder = a.filter(r => r._2 == s && half(r._1)).sortBy(_._3).map(_._1).toSeq
      assert(subOrder == fullOrder, s"shard $s relative order changed under growth")
    }
  }

  test("curriculum order: quartile phases, dense per-(phase,shard) positions, determinism") {
    val docs = (1L to 16L).map(i => (i, i.toDouble)).toDF("doc_id", "score")
    val got = SampleOps.curriculumOrder(docs, col("doc_id"), col("score"), "s1", 4)
      .select("doc_id", "phase", "shard", "pos")
      .as[(Long, Long, Long, Long)].collect()
    val byDoc = got.map(r => r._1 -> r).toMap
    // quartiles of 1..16 (type-7): t25=4.75, t50=8.5, t75=12.25
    assert((13L to 16L).forall(byDoc(_)._2 == 0L), "top quartile is phase 0")
    assert((9L to 12L).forall(byDoc(_)._2 == 1L))
    assert((5L to 8L).forall(byDoc(_)._2 == 2L))
    assert((1L to 4L).forall(byDoc(_)._2 == 3L))
    // positions are dense from 0 within each (phase, shard)
    got.groupBy(r => (r._2, r._3)).foreach { case (ps, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (0L until rows.length).toSeq,
        s"positions not dense in $ps")
    }
    val again = SampleOps.curriculumOrder(docs, col("doc_id"), col("score"), "s1", 4)
      .select("doc_id", "phase", "shard", "pos")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("BPE training: hand-computed merge trajectory, tie-breaks, early exhaustion") {
    // corpus pairs round 1: (t,h)=5, (h,e)=5, (e,n)=1, (e,r)=1, (r,e)=1
    //   -> tie 5/5 breaks lexicographically: (h,e) first
    // round 2: (t,he)=5 dominates; round 3: all count 1, (r,e) < (the,*)
    val docs = Seq((1L, "the the the"), (2L, "then there")).toDF("doc_id", "text")
    val learned = TextOps.bpeTrain(docs, "text", nMerges = 3)
    assert(learned == Seq(("h", "e", 5L), ("t", "he", 5L), ("r", "e", 1L)), learned.toString)
    // the learned table plugs into the APPLY half and compresses the corpus
    val n = docs.select(
      TextOps.bpeTokenCount(col("text"), learned.map(m => (m._1, m._2))).as("bpe"),
      TextOps.bpeTokenCount(col("text"), Seq.empty).as("chars"))
      .as[(Long, Long)].collect()
    assert(n.forall { case (bpe, chars) => bpe < chars },
      s"learned merges must compress: ${n.toSeq}")
    // a corpus with fewer distinct pairs than requested merges stops early
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val t = TextOps.bpeTrain(tiny, "text", nMerges = 10)
    assert(t == Seq(("a", "b", 1L)), t.toString)
  }
}
