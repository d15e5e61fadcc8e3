package graft

import org.apache.spark.sql.functions._
import graft.operators.{ClassifierOps, ImportanceOps, SimilarityOps, TextOps}

/** Randomized differential net for the trajectory-shaped pipeline operators
  * (DSIR weighting + Gumbel resample, classifier GD training, MMR greedy,
  * BPE merge training): each seeded case runs the ENGINE against an exact
  * in-memory replay that mirrors every determinism pin literally — md5
  * hash60, truncating integer division, the fixed IEEE ln/cosine trees,
  * (desc, id) tie-breaks — so comparisons are bit-exact, never
  * tolerance-based. Corpora deliberately include double spaces (empty
  * tokens), repeated words, and tie-heavy distributions.
  */
class PipelineDifferentialSpec extends SparkSuite {
  import spark.implicits._

  private val diffScale: Int =
    sys.env.getOrElse("GRAFT_DIFF_SCALE", "1").toInt.max(1)

  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      md.map("%02x".format(_)).mkString.substring(0, 15), 16)
  }

  private val vocab = Vector("the", "cat", "dog", "runs", "fast", "a", "und",
    "blue", "ab", "abab", "zz", "data", "spark")

  /** Random text; occasionally a double space (Spark split keeps the empty
    * token — the replay must too).
    */
  private def randText(r: scala.util.Random): String = {
    val n = 2 + r.nextInt(8)
    (0 until n).map(_ => vocab(r.nextInt(vocab.size)))
      .mkString(if (r.nextInt(5) == 0) "  " else " ")
  }

  // ---- DSIR ----

  private def dsirReplay(docs: Seq[(Long, String, Boolean)], buckets: Int)
      : Map[Long, (Long, Long)] = {
    def feats(text: String): Seq[Long] = {
      val toks = text.split(" ", -1).toSeq
      val bi = if (toks.size >= 2)
        (0 until toks.size - 1).map(i => toks(i) + " " + toks(i + 1)) else Seq.empty
      (toks ++ bi).map(f => hash60(f) % buckets)
    }
    val all = docs.flatMap { case (id, t, tgt) => feats(t).map(b => (id, b, tgt)) }
    val cr = all.groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
    val ct = all.filter(_._3).groupBy(_._2)
      .map { case (b, xs) => b -> xs.size.toLong }.withDefaultValue(0L)
    val tr = cr.values.sum
    val tt = ct.values.sum
    // Spark's `log` is StrictMath.log, NOT Math.log — they differ by 1 ulp
    // on some inputs; and a ratio of exactly 1 answers 0 without touching
    // ln at all (the boundary case scale-5 seed 34 exposed)
    def ln(x: Double): Double = java.lang.StrictMath.log(x)
    val lw = cr.map { case (b, c) =>
      val ratioOne = BigInt(ct(b) + 1) * BigInt(tr + buckets) ==
        BigInt(c + 1) * BigInt(tt + buckets)
      b -> (if (ratioOne) 0L
      else math.floor(((ln(ct(b).toDouble + 1.0) -
        ln(tt.toDouble + buckets.toDouble)) -
        (ln(c.toDouble + 1.0) -
          ln(tr.toDouble + buckets.toDouble))) * 1e7).toLong)
    }
    docs.map { case (id, t, _) =>
      val fs = feats(t)
      id -> (fs.size.toLong, fs.map(lw).sum)
    }.toMap
  }

  test("differential: DSIR weights + Gumbel resample vs in-memory model") {
    for (seed <- 1 to 8 * diffScale) {
      val r = new scala.util.Random(seed * 101)
      val docs = (1L to (8 + r.nextInt(10)).toLong)
        .map(i => (i, randText(r), r.nextBoolean()))
      val df = docs.toDF("doc_id", "text", "tgt")
      val want = dsirReplay(docs, 64)
      val got = ImportanceOps.dsirWeights(df, "doc_id", "text", col("tgt"), 64)
        .as[(Long, Long, Long)].collect()
        .map(x => x._1 -> (x._2, x._3)).toMap
      assert(got == want, s"seed $seed: weights diverge\n got=$got\nwant=$want")
      val k = 1 + r.nextInt(docs.size)
      val wantSel = want.toSeq.map { case (id, (_, w)) =>
        val u = ((hash60(s"s${seed}_" + id) % 1000000L).toDouble + 0.5) / 1000000.0
        (id, w + math.floor(-java.lang.StrictMath.log(
          -java.lang.StrictMath.log(u)) * 1e7).toLong)
      }.sortBy { case (id, key) => (-key, id) }.take(k)
      val gotSel = ImportanceOps.dsirResample(
        ImportanceOps.dsirWeights(df, "doc_id", "text", col("tgt"), 64),
        "doc_id", k, s"s$seed")
        .select("doc_id", "key_q").as[(Long, Long)].collect().toSeq
        .sortBy { case (id, key) => (-key, id) }
      assert(gotSel == wantSel, s"seed $seed: resample diverges")
    }
  }

  // ---- classifier GD ----

  private def gdReplay(docs: Seq[(Long, String, Boolean)], buckets: Int,
                       iters: Int, lr: Long): Map[Long, Long] = {
    val S = 1000000L
    val x: Seq[(Long, Long, Long)] = docs.flatMap { case (id, t, _) =>
      val toks = t.split(" ", -1).toSeq
      val n = toks.size.toLong
      toks.groupBy(tok => hash60(tok) % buckets)
        .map { case (b, xs) => (id, b, xs.size.toLong * S / n) }.toSeq :+
        ((id, buckets.toLong, S))
    }
    val y = docs.map { case (id, _, l) => id -> (if (l) S else 0L) }.toMap
    val nn = docs.size.toLong
    var w = x.map(_._2).distinct.map(_ -> 0L).toMap
    for (_ <- 0 until iters) {
      val z = x.groupBy(_._1).map { case (id, xs) =>
        id -> xs.map { case (_, b, xq) => xq * w(b) }.sum / S
      }
      val e = z.map { case (id, zq) =>
        id -> ((500000L + (zq * S) / (2L * (S + math.abs(zq)))) - y(id))
      }
      val g = x.groupBy(_._2).map { case (b, xs) =>
        b -> xs.map { case (id, _, xq) => e(id) * xq }.sum
      }
      w = w.map { case (b, wq) => b -> (wq - (lr * (g(b) / nn)) / S) }
    }
    x.groupBy(_._1).map { case (id, xs) =>
      id -> xs.map { case (_, b, xq) => xq * w(b) }.sum / S
    }
  }

  test("differential: classifier GD trajectory vs in-memory model") {
    for (seed <- 1 to 5 * diffScale) {
      val r = new scala.util.Random(seed * 577)
      val docs = (1L to (6 + r.nextInt(8)).toLong)
        .map(i => (i, randText(r), r.nextBoolean()))
      val df = docs.toDF("doc_id", "text", "y")
      val iters = 1 + r.nextInt(3)
      val lr = Seq(1L, 10L, 50L)(r.nextInt(3))
      val w = ClassifierOps.trainLinearQ(df, "doc_id", "text", col("y"),
        buckets = 32, iters = iters, lrNum = lr)
      val got = ClassifierOps.scoreLinearQ(df, "doc_id", "text", w, 32)
        .as[(Long, Long)].collect().toMap
      val want = gdReplay(docs, 32, iters, lr)
      assert(got == want,
        s"seed $seed (iters=$iters lr=$lr): scores diverge\n got=$got\nwant=$want")
    }
  }

  // ---- MMR ----

  private def mmrReplay(vecs: Seq[(Long, Array[Float])], qIds: Set[Long],
                        n: Int, k: Int): Seq[(Long, Long, Long, Double)] = {
    val q = vecs.map { case (id, v) =>
      id -> v.map(f => math.floor(f.toDouble * 1e7).toLong)
    }.toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (q(a), q(b))
      dot(va, vb).toDouble / math.sqrt(
        dot(va, va).toDouble * dot(vb, vb).toDouble)
    }
    val (lam, comp) = (70 / 100.0, 30 / 100.0)
    qIds.toSeq.sorted.flatMap { qid =>
      val cand = vecs.map(_._1).filter(_ != qid)
        .map(c => c -> cos(qid, c))
        .sortBy { case (id, rel) => (-rel, id) }.take(n)
      var selected = Vector.empty[(Long, Long, Long, Double)] // (q, step, sel, score)
      for (t <- 1 to k) {
        val pool = cand.filterNot(c => selected.exists(_._3 == c._1))
        val scored = pool.map { case (id, rel) =>
          val red = if (t == 1) 0.0
            else selected.map(s => cos(id, s._3)).max
          (id, lam * rel - comp * red)
        }
        val (sel, score) = scored.sortBy { case (id, sc) => (-sc, id) }.head
        selected :+= ((qid, t.toLong, sel, score))
      }
      selected
    }
  }

  test("differential: MMR greedy vs in-memory model") {
    for (seed <- 1 to 6 * diffScale) {
      val r = new scala.util.Random(seed * 271)
      val dim = 4 + r.nextInt(4)
      val nVec = 8 + r.nextInt(8)
      // a few exact duplicates to force redundancy penalties and ties
      val base = (1L to nVec.toLong).map { i =>
        i -> Array.fill(dim)((r.nextInt(9) - 4).toFloat)
      }.filterNot(_._2.forall(_ == 0f))
      val vecs = base ++ base.take(2).map { case (id, v) => (id + 100L, v.clone) }
      val df = vecs.toDF("vec_id", "embedding")
      // one or two query points: the multi-query form exercises the
      // per-query independence of the greedy selection order
      val qIds: Set[Long] =
        if (r.nextBoolean()) Set(vecs.head._1)
        else Set(vecs.head._1, vecs(1 + r.nextInt(vecs.size - 1))._1)
      val n = 4 + r.nextInt(4)
      val k = 1 + r.nextInt(math.min(4, n))
      val got = SimilarityOps.mmrRerank(df.filter(col("vec_id").isin(qIds.toSeq: _*)),
          df, n, k)
        .select("query_id", "step", "sel_id", "score")
        .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(x => (x._1, x._2))
      val want = mmrReplay(vecs, qIds, n, k)
      assert(got == want, s"seed $seed (n=$n k=$k):\n got=$got\nwant=$want")
    }
  }

  // ---- connected components ----

  private def ccReplay(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val p = parent(c); parent(c) = r; c = p }
      r
    }
    edges.foreach { case (i, j) =>
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.groupBy(find).flatMap { case (_, ns) =>
      val m = ns.min; ns.map(_ -> m)
    }.toMap
  }

  test("differential: connected-component min-labels vs union-find") {
    import graft.operators.DedupOps
    for (seed <- 1 to 6 * diffScale) {
      val r = new scala.util.Random(seed * 443)
      val n = 10 + r.nextInt(30)
      // random sparse edges + a long CHAIN (the diameter stressor the
      // pointer-jumping bound exists for) + self-loops + duplicate edges
      val rand = (0 until n).map(_ =>
        ((r.nextInt(n) + 1).toLong, (r.nextInt(n) + 1).toLong))
      val chainLen = 9 + r.nextInt(8)
      val chain = (0 until chainLen).map(i => (1000L + i, 1000L + i + 1))
      val edges = rand ++ chain ++ Seq((5L, 5L)) ++ rand.take(3)
      val got = DedupOps.connectedComponents(edges.toDF("i", "j"))
        .as[(Long, Long)].collect().toMap
      val want = ccReplay(edges)
      assert(got == want, s"seed $seed (n=$n chain=$chainLen): labels diverge\n" +
        s" got=${got.toSeq.sorted}\nwant=${want.toSeq.sorted}")
    }
  }

  test("differential: multi-fold clustering index equals union-find after EVERY fold") {
    // the r14 surface the single-split draw never exercised: a batch that
    // bridges components formed by EARLIER folds — chains whose edges
    // scatter across 3-5 folds, so labels must keep collapsing toward the
    // global min across the persisted index's whole history
    import graft.operators.DedupOps
    for (seed <- 1 to 4 * diffScale) {
      val r = new scala.util.Random(seed * 877L)
      val n = 12 + r.nextInt(20)
      val rand = (0 until n).map(_ =>
        ((r.nextInt(n) + 1).toLong, (r.nextInt(n) + 1).toLong))
        .filter(e => e._1 != e._2)
      val chainLen = 10 + r.nextInt(8)
      val chain = (0 until chainLen).map(i => (500L + i, 500L + i + 1))
      // a bridge that eventually merges the chain region into the random
      // region — landing in whichever fold the shuffle puts it
      val bridge = Seq((1L, 500L + r.nextInt(chainLen)))
      val edges = r.shuffle((rand ++ chain ++ bridge).toVector)
      val nFolds = 3 + r.nextInt(3)
      val dir = java.nio.file.Files.createTempDirectory(s"ccfold$seed").toString
      try {
        val chunk = math.max(1, (edges.size + nFolds - 1) / nFolds)
        var soFar = Vector.empty[(Long, Long)]
        edges.grouped(chunk).zipWithIndex.foreach { case (b, k) =>
          soFar = soFar ++ b
          DedupOps.foldCcIndex(b.toDF("i", "j"), dir)
          val got = new graft.storage.TxLogTable(spark, dir)
            .read().as[(Long, Long)].collect().toMap
          val want = ccReplay(soFar)
          assert(got == want,
            s"seed $seed fold $k/${nFolds}: persisted labels diverge\n" +
              s" got=${got.toSeq.sorted}\nwant=${want.toSeq.sorted}")
        }
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)); ()
      }
    }
  }

  test("differential: decontamination index+probe vs in-memory n-gram model") {
    import graft.operators.DedupOps
    for (seed <- 1 to 6 * diffScale) {
      val r = new scala.util.Random(seed * 991L)
      val bench = (1L to (3 + r.nextInt(5)).toLong).map(i => (i, randText(r)))
      // batch docs: clean, a verbatim benchmark doc (full leak), or a
      // partial splice of benchmark text onto fresh text
      val batch = (100L to (104 + r.nextInt(6)).toLong).map { i =>
        val t = r.nextInt(3) match {
          case 0 => randText(r)
          case 1 => bench(r.nextInt(bench.size))._2
          case _ => randText(r) + " " +
            bench(r.nextInt(bench.size))._2.split(" ", -1).take(4).mkString(" ")
        }
        (i, t)
      }
      val n = 2 + r.nextInt(3)
      val dir = java.nio.file.Files.createTempDirectory(s"dc$seed").toString
      try {
        DedupOps.buildDecontamIndex(
          bench.toDF("doc_id", "text"), "doc_id", "text", n, dir)
        val got = DedupOps.decontamProbe(
            batch.toDF("doc_id", "text"), "doc_id", "text", n, dir)
          .collect().map(row => row.getLong(0) ->
            ((row.getLong(1), row.getLong(2), row.getLong(3), row.getDouble(4)))).toMap
        // replay: Spark split(" ") keeps empty tokens (randText plants
        // double spaces), shingles are DISTINCT per doc, concat_ws keeps
        // empties too; contamination is one IEEE long/long division
        def shingleSet(t: String): Set[String] = {
          val toks = t.split(" ", -1)
          if (toks.length < n) Set.empty
          else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" ")).toSet
        }
        val evalDf: Map[String, Long] = bench.flatMap(d => shingleSet(d._2))
          .groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
        val want = batch.flatMap { case (id, t) =>
          val sh = shingleSet(t)
          if (sh.isEmpty) None // no shingles -> no probe row, engine-identical
          else {
            val hits = sh.filter(evalDf.contains)
            val maxDf = if (hits.isEmpty) 0L else hits.map(evalDf).max
            Some(id -> ((sh.size.toLong, hits.size.toLong, maxDf,
              hits.size.toLong.toDouble / sh.size.toLong.toDouble)))
          }
        }.toMap
        assert(got == want, s"seed $seed n=$n: probe diverges\n got=$got\nwant=$want")
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)); ()
      }
    }
  }

  // ---- URL canonicalization ----

  private def canonReplay(u: String): String = {
    val noFrag = u.replaceAll("#.*$", "")
    def extract(s: String, re: String): String = {
      val m = re.r.findFirstMatchIn(s)
      m.map(_.group(1)).getOrElse("")
    }
    val scheme = extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://").toLowerCase
    val auth = extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)").toLowerCase
    val h = auth.replaceAll(":[0-9]+$", "").replaceAll("^www\\.", "")
    val port = extract(auth, ":([0-9]+)$")
    val keepPort = port.nonEmpty &&
      !(scheme == "http" && port == "80") && !(scheme == "https" && port == "443")
    val rest = noFrag.replaceAll("^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val rawPath = extract(rest, "^([^?]*)")
    val path = if (rawPath.isEmpty) "/" else rawPath.replaceAll("(.)/$", "$1")
    val qs = extract(rest, "\\?(.*)$")
    val cleanQs = qs.split("&", -1).filter(p =>
      p.nonEmpty && !p.matches("^(utm_[^=]*|fbclid|gclid)=.*")).mkString("&")
    scheme + "://" + h + (if (keepPort) ":" + port else "") + path +
      (if (cleanQs.nonEmpty) "?" + cleanQs else "")
  }

  test("differential: URL canonicalization vs in-memory replay") {
    for (seed <- 1 to 8 * diffScale) {
      val r = new scala.util.Random(seed * 31)
      def pick[A](xs: Seq[A]): A = xs(r.nextInt(xs.size))
      val urls = (1 to 30).map { _ =>
        val scheme = pick(Seq("http", "HTTP", "https", "HTTPS", "Ftp"))
        val www = pick(Seq("", "www.", "WWW."))
        val host = pick(Seq("site.com", "A.B.site.CO.UK", "x.io", "host.internal"))
        val port = pick(Seq("", ":80", ":443", ":8080", ":0443"))
        val path = pick(Seq("", "/", "/a", "/a/b/", "/a//b/", "//"))
        val qs = pick(Seq("", "?", "?a=1", "?utm_source=x", "?utm_a=1&b=2&gclid=3",
          "?b=2&&a=1", "?fbclid=9&utm_=0"))
        val frag = pick(Seq("", "#f", "#a?b=1", "##"))
        s"$scheme://$www$host$port$path$qs$frag"
      }
      val got = urls.toDF("u")
        .select(col("u"), graft.operators.UrlOps.canonicalUrl(col("u")).as("c"))
        .as[(String, String)].collect().toMap
      urls.foreach { u =>
        assert(got(u) == canonReplay(u), s"seed $seed: canon($u) = ${got(u)}")
      }
    }
  }

  // ---- BPE training ----

  private def bpeTrainReplay(texts: Seq[String], nMerges: Int)
      : Seq[(String, String, Long)] = {
    var words: Seq[Vector[String]] = texts.flatMap(
      _.toLowerCase.replaceAll("[^a-z]", " ").split(" +").filter(_.nonEmpty)
        .map(_.map(_.toString).toVector))
    val learned = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var done = false
    for (_ <- 0 until nMerges if !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for (w <- words; i <- 0 until w.size - 1)
        counts((w(i), w(i + 1))) = counts.getOrElse((w(i), w(i + 1)), 0L) + 1L
      if (counts.isEmpty) done = true
      else {
        val ((x, y), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        learned += ((x, y, c))
        words = words.map { w =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < w.size) {
            if (i + 1 < w.size && w(i) == x && w(i + 1) == y) { out += x + y; i += 2 }
            else { out += w(i); i += 1 }
          }
          out.result()
        }
      }
    }
    learned.toSeq
  }

  test("differential: BPE merge training vs in-memory trainer") {
    for (seed <- 1 to 6 * diffScale) {
      val r = new scala.util.Random(seed * 911)
      // letter-run corpus over a tiny alphabet: dense ties, overlapping
      // pairs (aaa…), and merges whose outputs re-enter later rounds
      // alternate a wider alphabet / longer words so merge CHOICES (the
      // (-count, a, b) argmin) face deeper tie ladders and re-entrant
      // merge outputs across more rounds
      val alpha = 3 + (seed % 2)
      val maxLen = 5 + 2 * (seed % 2)
      val docs = (1L to (5 + r.nextInt(6)).toLong).map { i =>
        i -> (0 until 2 + r.nextInt(4)).map(_ =>
          (0 until 1 + r.nextInt(maxLen)).map(_ => ('a' + r.nextInt(alpha)).toChar)
            .mkString).mkString(" ")
      }
      val df = docs.toDF("doc_id", "text")
      val nM = 2 + r.nextInt(5)
      val got = TextOps.bpeTrain(df, "text", nM)
      val want = bpeTrainReplay(docs.map(_._2), nM)
      assert(got == want, s"seed $seed (nMerges=$nM):\n got=$got\nwant=$want")
    }
  }
}
