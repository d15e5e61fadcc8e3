package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, TextOps}

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  test("exact dedup key is whitespace-case-normalized") {
    val df = Seq((1L, "Hello World"), (2L, "  hello world "), (3L, "other"))
      .toDF("doc_id", "text")
    val groups = df.groupBy(DedupOps.exactKey(col("text")).as("k"))
      .count().select("count").as[Long].collect().sorted
    assert(groups.toSeq == Seq(1L, 2L))
  }

  test("fingerprint is token-order and duplicate-token insensitive") {
    val df = Seq((1L, "a b c"), (2L, "c b a a"), (3L, "a b d")).toDF("doc_id", "text")
    val fps = df.select(TextOps.fingerprint(col("text")).as("fp")).as[String].collect()
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("minhash LSH pairs are a subset of exact jaccard pairs (no false positives)") {
    val exact = DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val lsh = DedupOps.minhashLshPairs(docs, "doc_id", "text", 3, 12, 6, 0.5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
    // high-similarity pairs must be recalled: P(miss | J>=0.8) = (1-J^2)^6 < 3e-3
    val high = DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(high.subsetOf(lsh), s"LSH missed high-J pairs: ${high -- lsh}")
  }

  test("simhash near-dups include exact duplicates and respect hamming bound") {
    val df = Seq((1L, "spark join hash scan merge sort"), (2L, "spark join hash scan merge sort"),
      (3L, "completely different tokens entirely here now")).toDF("doc_id", "text")
    val pairs = DedupOps.simhashPairs(df, "doc_id", "text", 3)
      .select("i", "j", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 0L)))
  }

  test("df-capped jaccard: ubiquitous shingle generates no candidates, rare pairs stay exact") {
    // every doc shares one boilerplate shingle ("x y z"); docs 1/2 and 3/4
    // additionally share rare content. Uncapped, the hot shingle alone
    // fans out O(n^2) join rows; with the cap its bucket is skipped.
    val n = 40
    val boiler = (1 to n).map(d => (d.toLong, s"x y z unique$d filler$d pad$d"))
    val near = Seq(
      (101L, "x y z alpha beta gamma delta"),
      (102L, "x y z alpha beta gamma delta"),
      (103L, "x y z red green blue cyan"),
      (104L, "x y z red green blue cyan"))
    val df = (boiler ++ near).toDF("doc_id", "text")

    val capped = DedupOps.jaccardPairs(df, "doc_id", "text", 3, 0.5, maxShingleDf = Some(10L))
      .select("i", "j", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (i, j, v) => (i, j) -> v }.toMap
    assert(capped.keySet == Set((101L, 102L), (103L, 104L)))
    // values are TRUE jaccard (verified on the full index), not an estimate
    // over surviving shingles only
    val uncapped = DedupOps.jaccardPairs(df, "doc_id", "text", 3, 0.5)
      .select("i", "j", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (i, j, v) => (i, j) -> v }.toMap
    assert(capped == uncapped.view.filterKeys(capped.keySet).toMap)
    // bounded fan-out: candidate generation never touches the df=44 shingle,
    // so the candidate set is exactly the rare-shingle pairs
    val sh = DedupOps.shingles(df, "doc_id", "text", 3)
    val hotDf = sh.groupBy("shingle").count().agg(max("count")).as[Long].collect().head
    assert(hotDf == (n + 4).toLong) // the skew this test exists to exercise
  }

  test("connected components: transitive chains collapse, separate groups stay apart") {
    // chain 1-2, 2-3 (no 1-3 edge) plus disjoint pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("i", "j")
    val cc = DedupOps.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components: long path converges within the iteration bound") {
    val n = 20 // path 0-1-2-...-19: worst-case diameter for label propagation
    val pairs = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("i", "j")
    val cc = DedupOps.connectedComponents(pairs).as[(Long, Long)].collect()
    assert(cc.length == n && cc.forall(_._2 == 0L))
  }

  test("connected components: reliable checkpoint path writes to the dir and matches local") {
    val dir = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
    try {
      // multi-round shape (path graph) so the reliable branch checkpoints
      // repeatedly, not just the seed labels
      val pairs = (0 until 12).map(i => (i.toLong, (i + 1).toLong)).toDF("i", "j")
      val reliable = DedupOps.connectedComponents(pairs, checkpointDir = Some(dir))
        .as[(Long, Long)].collect().toMap
      val local = DedupOps.connectedComponents(pairs).as[(Long, Long)].collect().toMap
      assert(reliable == local && reliable.values.forall(_ == 0L))
      // the rounds really went through the reliable store, not block manager
      def rddFiles(p: java.io.File): Long =
        if (p.isFile) { if (p.getName.startsWith("part-")) 1L else 0L }
        else Option(p.listFiles).map(_.map(rddFiles).sum).getOrElse(0L)
      assert(rddFiles(new java.io.File(dir)) > 0, "no checkpoint part files written")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      ()
    }
  }

  test("merge components: bridges, fresh nodes and no-op pairs fold incrementally") {
    // existing clustering: {1, 2} and {5, 6}
    val assign = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L)).toDF("node", "component")
    // a bridge (2-5), a fresh node attaching to a cluster (6-9), and a
    // fresh-only pair (10-11)
    val merged = DedupOps.mergeComponents(assign,
      Seq((2L, 5L), (6L, 9L), (10L, 11L)).toDF("i", "j"))
      .as[(Long, Long)].collect().toMap
    assert(merged == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, 9L -> 1L,
      10L -> 10L, 11L -> 10L))
    // a within-component pair is a no-op; an empty batch returns the input
    val noop = DedupOps.mergeComponents(assign, Seq((2L, 1L)).toDF("i", "j"))
      .as[(Long, Long)].collect().toMap
    assert(noop == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))
    val empty = DedupOps.mergeComponents(assign,
      Seq.empty[(Long, Long)].toDF("i", "j")).as[(Long, Long)].collect().toMap
    assert(empty == noop)
  }

  test("merge components: seeded random edge splits equal from-scratch CC") {
    val rnd = new scala.util.Random(41L)
    val edges = Vector.fill(70)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2)
    val (first, second) = edges.splitAt(edges.size / 2)
    val full = DedupOps.connectedComponents(edges.toDF("i", "j"))
      .as[(Long, Long)].collect().toMap
    val inc = DedupOps.mergeComponents(
      DedupOps.connectedComponents(first.toDF("i", "j")), second.toDF("i", "j"))
      .as[(Long, Long)].collect().toMap
    // incremental covers every node of the full graph with identical labels
    assert(inc == full, s"incremental=$inc full=$full")
    // folding the SAME batch again converges (deterministic, idempotent)
    val again = DedupOps.mergeComponents(inc.toSeq.toDF("node", "component"),
      second.toDF("i", "j")).as[(Long, Long)].collect().toMap
    assert(again == full)
  }

  test("cc index: build, fold batches to from-scratch equality, refold commits nothing") {
    val dir = java.nio.file.Files.createTempDirectory("cc_idx").toString
    try {
      val rnd = new scala.util.Random(43L)
      val edges = Vector.fill(60)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
        .filter(e => e._1 != e._2)
      val (first, second) = edges.splitAt(edges.size / 2)
      DedupOps.buildCcIndex(first.toDF("i", "j"), dir)
      val v1 = DedupOps.foldCcIndex(second.toDF("i", "j"), dir)
      val table = new graft.storage.TxLogTable(spark, dir)
      val folded = table.read().as[(Long, Long)].collect().toMap
      val full = DedupOps.connectedComponents(edges.toDF("i", "j"))
        .as[(Long, Long)].collect().toMap
      assert(folded == full, s"folded=$folded full=$full")
      // refolding the same batch changes nothing and commits nothing
      assert(DedupOps.foldCcIndex(second.toDF("i", "j"), dir) == v1)
      assert(table.version.contains(v1))
      // an uninitialized index bootstraps from its first fold
      val dir2 = java.nio.file.Files.createTempDirectory("cc_idx2").toString
      try {
        DedupOps.foldCcIndex(edges.toDF("i", "j"), dir2)
        val boot = new graft.storage.TxLogTable(spark, dir2)
          .read().as[(Long, Long)].collect().toMap
        assert(boot == full)
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir2)); ()
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)); ()
    }
  }

  test("cc index: folds rewrite only touched slices; guards refuse misuse") {
    val dir = java.nio.file.Files.createTempDirectory("cc_gran").toString
    try {
      // bulk corpus: 400 isolated 2-node components spread over the id space
      val bulk = (0L until 400L).map(i => (i * 10, i * 10 + 1))
      DedupOps.buildCcIndex(bulk.toDF("i", "j"), dir, nSlices = 8)
      val table = new graft.storage.TxLogTable(spark, dir)
      val dirs0 = table.dirPaths(table.version.get).toSet
      assert(dirs0.size == 8, s"bulk build must range-slice: ${dirs0.size}")
      // a second bulk build refuses (duplicate labels would poison folds)
      val e = intercept[IllegalArgumentException](
        DedupOps.buildCcIndex(bulk.toDF("i", "j"), dir))
      assert(e.getMessage.contains("already built"))
      // a batch touching one narrow key range folds without rewriting the
      // rest: most bulk slices survive as the SAME directories
      DedupOps.foldCcIndex(Seq((11L, 20L), (21L, 30L)).toDF("i", "j"), dir)
      val dirs1 = table.dirPaths(table.version.get).toSet
      assert(dirs0.intersect(dirs1).size >= 6,
        s"fold rewrote ${dirs0.size - dirs0.intersect(dirs1).size} of 8 slices " +
          "for a 4-node batch — granular merge not engaged")
      // content still equals from-scratch CC over all pairs
      val full = DedupOps.connectedComponents(
        (bulk ++ Seq((11L, 20L), (21L, 30L))).toDF("i", "j"))
        .as[(Long, Long)].collect().toMap
      assert(table.read().as[(Long, Long)].collect().toMap == full)
      // a hand-built table violating the min-node label convention fails
      // the fold loudly at the touched rows instead of silently diverging
      val badDir = java.nio.file.Files.createTempDirectory("cc_bad").toString
      try {
        new graft.storage.TxLogTable(spark, badDir)
          .append(Seq((1L, 99L), (2L, 99L)).toDF("node", "component"))
        val bad = intercept[IllegalArgumentException](
          DedupOps.foldCcIndex(Seq((1L, 3L)).toDF("i", "j"), badDir))
        assert(bad.getMessage.contains("min-node label convention"), bad.getMessage)
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(badDir)); ()
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)); ()
    }
  }

  test("decontam index: a second unfenced build refuses instead of inflating probes") {
    val dir = java.nio.file.Files.createTempDirectory("dc_once").toString
    try {
      val bench = Seq((1L, "alpha beta gamma delta epsilon zeta"))
        .toDF("doc_id", "text")
      DedupOps.buildDecontamIndex(bench, "doc_id", "text", n = 5, path = dir,
        txn = Some(("bench-build", 0L)))
      val probe1 = DedupOps.decontamProbe(
        Seq((10L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"),
        "doc_id", "text", n = 5, path = dir).as[(Long, Long, Long, Long, Double)]
        .collect().toSet
      // a second (unfenced) build refuses...
      val e = intercept[IllegalArgumentException](
        DedupOps.buildDecontamIndex(bench, "doc_id", "text", n = 5, path = dir))
      assert(e.getMessage.contains("already built"))
      // ...but the txn-fenced REPLAY of the one build passes and no-ops
      DedupOps.buildDecontamIndex(bench, "doc_id", "text", n = 5, path = dir,
        txn = Some(("bench-build", 0L)))
      val probe2 = DedupOps.decontamProbe(
        Seq((10L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"),
        "doc_id", "text", n = 5, path = dir).as[(Long, Long, Long, Long, Double)]
        .collect().toSet
      assert(probe2 == probe1, "probe inflated after replayed build")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)); ()
    }
  }

  test("incremental minhash index: probe equals one-shot pairs touching the batch") {
    val idx = java.nio.file.Files.createTempDirectory("mh_idx").toString
    val base = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    DedupOps.buildMinhashIndex(base, "doc_id", "text", 3, 12, 6, idx)
    val probed = DedupOps.minhashProbe(batch, "doc_id", "text", 3, 12, 6, 0.5, idx)
      .select("i", "j").as[(Long, Long)].collect().toSet
    // ground truth: the one-shot pipeline over everything, restricted to
    // pairs with at least one side in the batch
    val oneShot = DedupOps.minhashLshPairs(docs, "doc_id", "text", 3, 12, 6, 0.5)
      .select("i", "j").as[(Long, Long)].collect().toSet
      .filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
    assert(probed == oneShot)
    assert(probed.nonEmpty, "fixture should contain cross-batch duplicates")
    // folding the batch in extends the index: a SECOND probe with fresh ids
    // (clones of batch docs) now pairs against the folded-in batch too
    DedupOps.buildMinhashIndex(batch, "doc_id", "text", 3, 12, 6, idx)
    val clones = batch.select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
    val probe2 = DedupOps.minhashProbe(clones, "doc_id", "text", 3, 12, 6, 0.5, idx)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val batchIds = batch.select("doc_id").as[Long].collect().toSet
    // every clone must rediscover its original (identical text, J = 1.0)
    assert(batchIds.forall(id => probe2.contains((id, id + 1000000L))))
  }

  test("shingling skips documents shorter than n tokens") {
    val df = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val sh = DedupOps.shingles(df, "doc_id", "text", 3)
    assert(sh.filter(col("doc_id") === 1).count() == 0)
    assert(sh.filter(col("doc_id") === 2).count() == 2)
  }

  test("duplicate spans: planted shared substring yields exactly its maximal range") {
    // unique-prefix + 40-char shared block + unique-suffix; minLen 10.
    // Every 10-window inside the shared block is duplicated; windows
    // straddling into the unique flanks are not. Expected span in each doc
    // covers exactly the 40 shared chars.
    val shared = "0123456789abcdefghijABCDEFGHIJklmnopqrst" // 40 chars
    val d1 = "XXXXXXXX" + shared + "YYYYYYYY"
    val d2 = "PPPPPPPPPP" + shared + "QQQQ"
    val d3 = "totally unrelated content with no repeats at all here"
    val df = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val spans = DedupOps.duplicateSpans(df, "doc_id", "text", minLen = 10)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect().toSet
    assert(spans == Set((1L, 8L, 48L), (2L, 10L, 50L)))
  }

  test("duplicate spans: within-document repeat counts as duplicated; disjoint islands split") {
    // one doc repeating a 12-char block twice with a long unique gap
    // (all-distinct chars, so the gap has no self-repeating windows):
    // both occurrences are spans, the gap is not
    val block = "ABCDEFGHIJKL"
    val txt = block + "mnopqrstuvwxyz0123456789!@#$%^" + block
    val df = Seq((7L, txt)).toDF("doc_id", "text")
    val spans = DedupOps.duplicateSpans(df, "doc_id", "text", minLen = 12)
      .select("span_start", "span_end").as[(Long, Long)].collect().toSet
    assert(spans == Set((0L, 12L), (42L, 54L)))
  }

  test("duplicate spans: documents shorter than minLen contribute nothing") {
    val df = Seq((1L, "short"), (2L, "short")).toDF("doc_id", "text")
    assert(DedupOps.duplicateSpans(df, "doc_id", "text", minLen = 10).count() == 0)
  }

  test("remove duplicate spans: cleaned text is the original minus the exact ranges") {
    val shared = "0123456789abcdefghijABCDEFGHIJklmnopqrst" // 40 chars
    val d1 = "XXXXXXXX" + shared + "YYYYYYYY"   // span [8, 48)
    val d2 = "PPPPPPPPPP" + shared + "QQQQ"     // span [10, 50)
    val d3 = "totally unrelated content with no repeats at all here"
    val df = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val got = DedupOps.removeDuplicateSpans(df, "doc_id", "text", minLen = 10)
      .select("doc_id", "clean", "n_spans", "removed_chars")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "XXXXXXXX" + "YYYYYYYY", 1L, 40L)))
    assert(got(2L) == ((2L, "PPPPPPPPPP" + "QQQQ", 1L, 40L)))
    assert(got(3L) == ((3L, d3, 0L, 0L)))
    // a fully-duplicated document cleans to the empty string
    val dup = Seq((1L, "ABCDEFGHIJKL"), (2L, "ABCDEFGHIJKL")).toDF("doc_id", "text")
    val cleaned = DedupOps.removeDuplicateSpans(dup, "doc_id", "text", minLen = 12)
      .select("clean").as[String].collect().toSeq
    assert(cleaned == Seq("", ""))
  }

  test("duplicate spans: adjacent duplicated windows at gap == minLen merge into one span") {
    // offsets p and p+minLen touch ([p, p+L) and [p+L, p+2L) are contiguous)
    // so they must merge even though the windows do not overlap
    val a = "AAAAAAAAAA" // 10
    val b = "BBBBBBBBBB" // 10
    val df = Seq((1L, a + b), (2L, a + "xxxxxxxxxx" + b)).toDF("doc_id", "text")
    // doc 1: dup windows at offsets 0 (a) and 10 (b) only? No — windows
    // inside a+b straddle; only offset 0 and 10 content recur in doc 2.
    val spans = DedupOps.duplicateSpans(df, "doc_id", "text", minLen = 10)
      .filter(col("doc_id") === 1)
      .select("span_start", "span_end").as[(Long, Long)].collect().toSet
    assert(spans == Set((0L, 20L)))
  }
}
