package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, ImportanceOps, LmOps, SampleOps, SearchOps, TextOps, TimeSeriesOps, ValidateOps}

/** Data-curation operators: histogram binning, edit-distance verify,
  * decontamination, quotas, stratified sampling, PII redaction, validation,
  * BM25 relevance.
  */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  test("stripMarkup: scripts/styles drop wholesale, tags go, entities decode once") {
    val in = Seq(
      "<p>Hello <b>world</b></p>",
      "<script>if (a < b && c > d) alert('<p>not a tag</p>');</script>after",
      "<style>p > a { color: red }</style>kept",
      "A &amp;amp; B &lt;x&gt; &quot;y&quot;&nbsp;&#39;z&#39;",
      "  lots\n\nof\t whitespace  "
    ).toDF("text")
    val got = in.select(TextOps.stripMarkup(col("text")).as("t")).as[String].collect().toSeq
    assert(got(0) == "Hello world")
    assert(got(1) == "after", "script content (with tag-like text) must vanish wholesale")
    assert(got(2) == "kept")
    // &amp; decodes LAST: '&amp;amp;' becomes '&amp;' literally, not '&'
    assert(got(3) == "A &amp; B <x> \"y\" 'z'")
    assert(got(4) == "lots of whitespace")
  }

  test("repetition signals: duplicate n-gram fractions flag repetitious documents") {
    val docs = Seq(
      (1L, "spam spam spam spam"), // 3x "spam spam" bigram, 2x trigram
      (2L, "a b c d e f"),         // 5 distinct bigrams, top share exactly 0.2
      (3L, "x y x y x y"),         // "x y" 3 of 5 bigrams
      (4L, "solo")                 // no bigrams: absent from the report
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionReport(docs)
      .as[(Long, Long, Option[Double], Option[Double], Option[Double], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(!got.contains(4L), "a 1-token doc has no n-grams to report")
    val d1 = got(1L)
    assert(d1._2 == 3L && d1._3.contains(1.0 - 1.0 / 3.0) && d1._4.contains(1.0) &&
      d1._5.contains(0.5) && d1._6, s"spam doc: $d1")
    val d2 = got(2L)
    assert(d2._3.contains(0.0) && d2._4.contains(1.0 / 5.0) && !d2._6,
      s"diverse doc must pass (top share 0.2 is NOT > 0.2): $d2")
    val d3 = got(3L)
    assert(d3._3.contains(1.0 - 2.0 / 5.0) && d3._6, s"alternating doc: $d3")
  }

  test("histogram: bins partition the data with explicit overflow bins") {
    val df = Seq(-5.0, 0.0, 24.9, 25.0, 499.9, 500.0, 777.0).toDF("v")
    val got = TimeSeriesOps.fixedWidthHistogram(df, Seq.empty, col("v"), 0.0, 500.0, 20)
      .select("bin", "n").as[(Long, Long)].collect().toMap
    assert(got == Map(-1L -> 1L, 0L -> 2L, 1L -> 1L, 19L -> 1L, 20L -> 2L))
    assert(got.values.sum == 7L, "histogram must partition the input — nothing dropped")
  }

  test("edit distance: identical texts give lev 0 / sim 1; near-dups verified exactly") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base),                      // exact dup
      (3L, base.replace("tok7", "tok7x")),          // near dup (1 token edited)
      (4L, (101 to 130).map(i => s"zz$i").mkString(" "))) // unrelated
      .toDF("doc_id", "text")
    val pairs = DedupOps.editDistancePairs(docs, "doc_id", "text", maxHamming = 3, minSim = 0.0)
      .select("i", "j", "lev", "sim").as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(pairs((1L, 2L)) == (0L, 1.0))
    pairs.get((1L, 3L)).foreach { case (lev, sim) =>
      assert(lev == 1L && sim < 1.0 && sim > 0.9)
    }
    assert(!pairs.keySet.exists { case (i, j) => i == 4L || j == 4L },
      "unrelated doc must not appear in candidate pairs")
  }

  test("edit distance: the bounded-threshold kernel (minSim > 0) matches the unbounded form") {
    // minSim > 0 switches editDistancePairs onto Spark's early-exit
    // Levenshtein(l, r, threshold) — the 100 TB path. The surviving rows
    // and their exact distances must be bit-identical to filtering the
    // unbounded result, on the real fixture corpus.
    val docs = Tables.documents(spark, sf).filter(col("doc_id") % 9 === 0)
    val unAll = DedupOps.editDistancePairs(docs, "doc_id", "text",
        maxHamming = 3, minSim = 0.0)
      .select("i", "j", "hamming", "lev", "sim")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(unAll.nonEmpty, "fixture corpus must produce candidate pairs")
    // sweep thresholds that exercise both regimes (all/most pairs marked
    // -1 over-threshold, and a threshold at least one pair survives)
    val sims = unAll.map(_._5).filterNot(_.isNaN)
    for (minSim <- Seq(0.5, 0.9, sims.max)) {
      val bounded = DedupOps.editDistancePairs(docs, "doc_id", "text",
          maxHamming = 3, minSim = minSim)
        .select("i", "j", "hamming", "lev", "sim")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      assert(bounded == unAll.filter(_._5 >= minSim).toSet,
        s"bounded kernel diverged from unbounded at minSim=$minSim")
    }
    assert(unAll.exists(_._5 >= sims.max),
      "the max-sim threshold must keep at least one pair")
    // boundary exactness: sim EXACTLY equal to minSim must survive the
    // bounded form with the same exact distance. Same distinct-token set
    // -> identical simhash -> the candidate pair is proposed regardless of
    // string distance, so the DP actually decides.
    val edge = Seq((1L, "aa bb"), (2L, "bb aa")).toDF("doc_id", "text")
    val un = DedupOps.editDistancePairs(edge, "doc_id", "text", 3, minSim = 0.0)
      .select("lev", "sim").as[(Long, Double)].collect().head
    assert(un._1 > 0L, s"edge pair must have a nonzero distance, got $un")
    val b = DedupOps.editDistancePairs(edge, "doc_id", "text", 3, minSim = un._2)
      .select("lev", "sim").as[(Long, Double)].collect().toSeq
    assert(b == Seq(un), s"sim == minSim must survive the bounded form, got $b vs $un")
  }

  test("contamination: n-gram overlap against the train index, clean docs report 0") {
    val train = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"),        // 5-grams: {w1..w5, w2..w6}
      (2L, "x1 x2 x3 x4 x5")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "w1 w2 w3 w4 w5 q9"),       // shares exactly one 5-gram with train
      (11L, "y1 y2 y3 y4 y5 y6")).toDF("doc_id", "text")
    val got = DedupOps.contaminationReport(train, eval, "doc_id", "text", n = 5)
      .select("eval_id", "n_shingles", "n_hit", "max_train_df", "contamination")
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(10L) == ((10L, 2L, 1L, 1L, 0.5)))
    assert(got(11L) == ((11L, 2L, 0L, 0L, 0.0)))
  }

  test("decontamination index: probe equals the offline report with roles swapped") {
    val dir = java.nio.file.Files.createTempDirectory("decontam_idx").toString
    try {
      val bench = Seq(
        (900L, "alpha beta gamma delta epsilon zeta eta theta"),
        (901L, "one two three four five six seven eight")).toDF("doc_id", "text")
      val batch = Seq(
        (1L, "alpha beta gamma delta epsilon zeta eta theta iota"), // leaked
        (2L, "totally clean words nothing shared here at all ok"),
        (3L, "x one two three four five y z w")).toDF("doc_id", "text")
      DedupOps.buildDecontamIndex(bench, "doc_id", "text", n = 5, path = dir)
      val probe = DedupOps.decontamProbe(batch, "doc_id", "text", n = 5, path = dir)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      // the probe IS contaminationReport with the roles swapped: index the
      // benchmark, report per training doc
      val want = DedupOps.contaminationReport(bench, batch, "doc_id", "text", n = 5)
        .select(col("eval_id").as("doc_id"), col("n_shingles"), col("n_hit"),
          col("max_train_df").as("max_eval_df"), col("contamination"))
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(probe == want, s"probe=$probe want=$want")
      val byId = probe.map(r => r.head -> r).toMap
      assert(byId(1L)(4).asInstanceOf[Double] == 0.8, s"leaked doc: ${byId(1L)}")
      assert(byId(2L)(2) == 0L, s"clean doc must report zero hits: ${byId(2L)}")
      assert(byId(3L)(2).asInstanceOf[Long] >= 1L, s"partial leak: ${byId(3L)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)); ()
    }
  }

  test("quota sampling: salted two-stage result equals the plain window form") {
    val docs = Tables.documents(spark, sf)
    val salted = SampleOps.quotaPerGroup(docs, col("source"), col("doc_id"), k = 7)
      .select("source", "doc_id", "rk").as[(String, Long, Long)].collect().toSet
    val hv = TextOps.hash60(col("doc_id").cast("string"))
    val plain = TimeSeriesOps.topKPerGroup(docs, Seq(col("source")),
        Seq(hv.asc, col("doc_id").asc), 7)
      .select("source", "doc_id", "rk").as[(String, Long, Long)].collect().toSet
    assert(salted == plain)
    assert(salted.groupBy(_._1).values.forall(_.size <= 7))
  }

  test("stratified sampling: rate-1.0 stratum keeps everything, assignment deterministic") {
    val docs = Tables.documents(spark, sf)
    val kept = SampleOps.stratifiedSample(col("lang"), col("doc_id"),
      Map("en" -> 0.2, "zh" -> 1.0), defaultRate = 0.5)
    val byLang = docs.groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(kept.cast("long")).as("k"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val (nZh, kZh) = byLang("zh")
    assert(nZh == kZh, "rate 1.0 must keep every doc")
    val (nEn, kEn) = byLang("en")
    assert(kEn < nEn, "rate 0.2 must drop some docs")
  }

  test("PII redaction: every pattern counted, then scrubbed to zero residual matches") {
    val dirty = "reach me at jo.do+1@corp.example.org or admin@a.bc, " +
      "host 192.168.0.1 backup 10.0.0.255, call +1 555-123-4567 end"
    val df = Seq(dirty).toDF("t")
    val got = df.select(
        TextOps.piiCount(col("t"), "email").as("e"),
        TextOps.piiCount(col("t"), "ipv4").as("i"),
        TextOps.piiCount(col("t"), "phone").as("p"),
        TextOps.redactPii(col("t")).as("r"))
      .as[(Long, Long, Long, String)].head()
    assert((got._1, got._2, got._3) == ((2L, 2L, 1L)), got)
    val redacted = Seq(got._4).toDF("t")
    val residual = redacted.select(
        (TextOps.piiCount(col("t"), "email") + TextOps.piiCount(col("t"), "ipv4") +
          TextOps.piiCount(col("t"), "phone")).as("n"))
      .as[Long].head()
    assert(residual == 0L, s"PII survived redaction: ${got._4}")
    assert(got._4.contains("<EMAIL>") && got._4.contains("<IP>") && got._4.contains("<PHONE>"))
  }

  test("validation: one-pass profile metrics and constraints on a crafted table") {
    val df = Seq(
      (1L, Some(10.0), "a"), (2L, Some(20.0), "a"),
      (3L, None, "b"), (4L, Some(2000.0), "b")).toDF("id", "v", "g")
    val row = ValidateOps.check(df,
      metrics = Seq(
        "n_rows" -> count(lit(1)),
        "v_complete" -> ValidateOps.completeness(col("v")),
        "id_unique" -> ValidateOps.uniqueness(col("id")),
        "v_in_range" -> ValidateOps.inRangeRatio(col("v"), 0.0, 1000.0)),
      constraints = Seq(
        "chk_complete" -> (col("v_complete") === 1.0),
        "chk_key" -> (col("id_unique") === 1.0))).head()
    assert(row.getAs[Long]("n_rows") == 4L)
    assert(row.getAs[Double]("v_complete") == 0.75)
    assert(row.getAs[Double]("id_unique") == 1.0)
    assert(row.getAs[Double]("v_in_range") == 2.0 / 3.0)
    assert(!row.getAs[Boolean]("chk_complete") && row.getAs[Boolean]("chk_key"))
  }

  test("bigram LM score: counts, OOV mapping, and the quantized average") {
    // corpus: doc1 "a b a b c", doc2 "a b", doc3 "z" (one token -> no row)
    val docs = Seq((1L, "a b a b c"), (2L, "a b"), (3L, "z"))
      .toDF("doc_id", "text")
    // vocab K=2 by (count desc, tok asc): a(3), b(3) -> [a, b]; c,z -> <unk>
    // mapped bigrams: doc1 (a,b)(b,a)(a,b)(b,<unk>), doc2 (a,b)
    // ctx: a=3, b=2; pairs: (a,b)=3, (b,a)=1, (b,<unk>)=1; V = 2+1 = 3
    val got = LmOps.lmScore(docs, "doc_id", "text", 2)
      .select("doc_id", "n_bigrams", "avg_logprob", "perplexity")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    def q(c2: Long, c1: Long): Long =
      math.floor((math.log(c2 + 1.0) - math.log(c1 + 3.0)) * 1e7).toLong
    val ab = q(3, 3); val ba = q(1, 2); val bu = q(1, 2)
    val avg1 = (ab + ba + ab + bu).toDouble / 4.0 / 1e7
    assert(got(1L)._2 == 4L && got(1L)._3 == avg1)
    assert(got(1L)._4 == math.exp(-avg1))
    assert(got(2L)._2 == 1L && got(2L)._3 == ab.toDouble / 1.0 / 1e7)
    assert(!got.contains(3L), "a one-token document has no bigram evidence")
    // the common pair (a,b) is likelier than the rare (b,a): scoring ranks
    // the well-trodden doc2 above doc1
    assert(got(2L)._3 > got(1L)._3 && got(2L)._4 < got(1L)._4)
  }

  test("bigram LM incremental scoring: unseen bigrams back off, never crash") {
    val train = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val vocab = LmOps.vocabulary(train, "text", 2)
    val mapped = LmOps.mappedBigrams(train, "doc_id", "text", vocab)
    val ctx = mapped.groupBy("prev").agg(count(lit(1)).as("c1"))
    val pairs = mapped.groupBy("prev", "cur").agg(count(lit(1)).as("c2"))
    // new docs: "b a" is an unseen pair of seen tokens; "q q" maps wholly
    // to <unk> whose context count exists ((b,<unk>) trained once)
    val fresh = Seq((10L, "b a"), (11L, "q q")).toDF("doc_id", "text")
    val freshMapped = LmOps.mappedBigrams(fresh, "doc_id", "text", vocab)
    val got = LmOps.scoreAgainst(freshMapped, ctx, pairs, vTypes = 3)
      .select("doc_id", "avg_logprob").as[(Long, Double)].collect().toMap
    def q(c2: Long, c1: Long): Long =
      math.floor((math.log(c2 + 1.0) - math.log(c1 + 3.0)) * 1e7).toLong
    // ctx: a=3 (a->b x3), b=2 (b->a? no: pairs (a,b)=3, (b,a)=1, (b,c->unk)=1)
    // train bigrams: doc1 (a,b)(b,a)(a,b); doc2 (a,b)(b,<unk>)
    // so ctx a=3, b=2; (b,a) seen once -> q(1,2); (<unk>,<unk>) unseen,
    // <unk> never a context -> q(0,0)
    assert(got(10L) == q(1, 2).toDouble / 1.0 / 1e7)
    assert(got(11L) == q(0, 0).toDouble / 1.0 / 1e7)
  }

  test("bm25: term-dense docs outrank, termless docs absent, ranking deterministic") {
    val docs = Seq(
      (1L, "join join join filter"),
      (2L, "alpha beta gamma delta"),
      (3L, "join scan merge sort"),
      (4L, "join join alpha beta")).toDF("doc_id", "text")
    val got = SearchOps.bm25TopK(docs, "doc_id", "text", Seq("join"), k = 10)
      .as[(Long, Double)].collect()
    assert(!got.map(_._1).contains(2L), "doc without the term must score out")
    assert(got.map(_._1).take(2).toSet == Set(1L, 4L),
      s"higher tf must outrank: ${got.mkString(",")}")
    assert(got.map(_._2).sameElements(got.map(_._2).sorted(Ordering[Double].reverse)))
  }

  test("dsir: target-like docs weigh above raw-typical docs; features count unigrams+bigrams") {
    val tgt = ("alpha beta " * 30).trim
    val raw = ("gamma delta " * 30).trim
    val docs = Seq(
      (1L, tgt, true), (2L, tgt, true),       // the target subset
      (3L, raw, false), (4L, raw, false), (5L, raw, false),
      (6L, tgt, false),                        // raw doc that LOOKS like target
      (7L, "solo", false)                      // single token: no bigrams
    ).toDF("doc_id", "text", "is_tgt")
    val w = ImportanceOps.dsirWeights(docs, "doc_id", "text", col("is_tgt"), 512)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(w(7L)._1 == 1L, "1 token -> 1 unigram, 0 bigrams")
    assert(w(6L)._1 == 60L + 59L, "60 tokens -> 60 unigrams + 59 bigrams")
    assert(w(6L)._2 > 0L, s"target-like doc must score positive: ${w(6L)}")
    assert(w(3L)._2 < 0L, s"raw-typical doc must score negative: ${w(3L)}")
    assert(w(6L)._2 > w(3L)._2 + 180000000L,
      "margin must dominate the Gumbel noise span (~18 nats at 1e7 scale)")
  }

  test("dsir resample: Gumbel-top-k is reproducible and importance-directed") {
    val tgt = ("alpha beta " * 30).trim
    val raw = ("gamma delta " * 30).trim
    val docs = (Seq((1L, tgt, true), (2L, tgt, false)) ++
      (3L to 9L).map(i => (i, raw, false))).toDF("doc_id", "text", "is_tgt")
    val w = ImportanceOps.dsirWeights(docs, "doc_id", "text", col("is_tgt"), 512)
    val s1 = ImportanceOps.dsirResample(w, "doc_id", 2, "seedA")
      .select("doc_id").as[Long].collect().toSet
    val s2 = ImportanceOps.dsirResample(w, "doc_id", 2, "seedA")
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "same seed must draw the identical sample")
    // weights dwarf the noise span, so the two target-like docs must win
    assert(s1 == Set(1L, 2L), s"importance must dominate: $s1")
  }

  test("gopher rules: each rule fails its designed offender, clean doc passes") {
    val pass = ("the data " + "spark rows and tables with more things " * 7).trim
    val docs = Seq(
      (1L, pass),                                            // all rules pass
      (2L, "the and with just a few words"),                 // word count < 50
      (3L, ("x " * 60).trim),                                // 1-char words + no stops
      (4L, ("the and " + "### ## # " * 20).trim),            // symbol ratio
      (5L, pass + "\n- bullet\n- bullet\n- bullet"),         // bullets, but <= 0.9 passes
      (6L, "- b\n- b\n- b\n- b\n- b\n- b\n- b\n- b\n- b\n- b\nend") // > 0.9 bullets... 10/11 > 0.9? no: 0.909 > 0.9 fails
    ).toDF("doc_id", "text")
    val got = TextOps.gopherReport(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Boolean]("gopher_pass"), s"clean doc: ${got(1L)}")
    assert(!got(2L).getAs[Boolean]("gopher_pass"), "short doc must fail")
    val d3 = got(3L)
    assert(d3.getAs[Double]("mean_word_len") == 1.0 && d3.getAs[Long]("n_stop") == 0L
      && !d3.getAs[Boolean]("gopher_pass"))
    assert(got(4L).getAs[Double]("symbol_ratio") > 0.1 && !got(4L).getAs[Boolean]("gopher_pass"))
    assert(got(5L).getAs[Double]("bullet_frac") <= 0.9 && got(5L).getAs[Boolean]("gopher_pass") ==
      (got(5L).getAs[Long]("n_words") >= 50L), s"${got(5L)}")
    assert(got(6L).getAs[Double]("bullet_frac") > 0.9 && !got(6L).getAs[Boolean]("gopher_pass"))
  }

  test("count-min sketch: exact when collision-free, never undercounts when squeezed") {
    import graft.operators.SketchOps
    val rows = (1 to 100).flatMap(i => Seq.fill(i % 7 + 1)(s"k$i")).toDF("k")
    val exact = rows.groupBy("k").count().as[(String, Long)].collect().toMap
    // wide grid: 100 keys over 4x4096 cells — collisions vanish, estimates
    // must equal exact counts for EVERY key
    val wide = SketchOps.cmsEstimate(
      SketchOps.cmsCells(rows, col("k"), 4, 4096),
      rows.select("k").distinct(), "k", 4, 4096)
      .as[(String, Long)].collect().toMap
    assert(wide == exact, "collision-free grid must be exact")
    // squeezed grid: 4x8 cells for 100 keys — heavy collisions, but the
    // one-sided error guarantee must hold for every key
    val tight = SketchOps.cmsEstimate(
      SketchOps.cmsCells(rows, col("k"), 4, 8),
      rows.select("k").distinct(), "k", 4, 8)
      .as[(String, Long)].collect().toMap
    assert(exact.forall { case (k, n) => tight(k) >= n },
      "CMS must never undercount")
    assert(tight.exists { case (k, n) => n > exact(k) },
      "a 32-cell grid over 100 keys must actually collide")
    // the grid never exceeds depth x width rows regardless of input size
    assert(SketchOps.cmsCells(rows, col("k"), 4, 8).count() <= 32L)
  }

  test("line dedup: corpus-common lines drop, order survives, all-boilerplate doc empties") {
    val bp = "accept cookies"
    val docs = Seq(
      (1L, s"$bp\nalpha\nbeta"),
      (2L, s"$bp\ngamma\n$bp"),   // within-doc repeat counts ONCE for df
      (3L, s"beta\n$bp\ndelta"),  // 'beta' in 2 docs: at threshold, kept
      (4L, bp)                    // all boilerplate -> empty clean
    ).toDF("doc_id", "text")
    val got = TextOps.removeCommonLines(docs, "doc_id", "text", maxDf = 2)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "alpha\nbeta", 3L, 1L)))
    assert(got(2L) == ((2L, "gamma", 3L, 2L)), s"${got(2L)}")
    assert(got(3L) == ((3L, "beta\ndelta", 3L, 1L)), "df==maxDf keeps the line")
    assert(got(4L) == ((4L, "", 1L, 1L)), "fully-boilerplate doc must survive as empty")
  }

  test("url canonicalization: hostile hand cases") {
    import graft.operators.UrlOps
    val cases = Seq(
      // default port strips only when it matches the scheme
      ("http://Site.Com:80/a", "http://site.com/a"),
      ("https://site.com:80/a", "https://site.com:80/a"),
      ("https://WWW.site.com:443/a", "https://site.com/a"),
      // empty path -> /, root slash survives, one trailing slash drops
      ("https://site.com", "https://site.com/"),
      ("https://site.com/", "https://site.com/"),
      ("https://site.com/a/b/", "https://site.com/a/b"),
      // all-tracking query loses the '?' entirely; order of real params kept
      ("http://site.com/x?utm_source=a&utm_medium=b", "http://site.com/x"),
      ("http://site.com/x?b=2&utm_a=1&a=1", "http://site.com/x?b=2&a=1"),
      ("HTTPS://site.com/x#frag?fake=1", "https://site.com/x"))
    val df = cases.map(_._1).toDF("u")
      .select(col("u"), UrlOps.canonicalUrl(col("u")).as("c"))
    val got = df.as[(String, String)].collect().toMap
    cases.foreach { case (in, want) => assert(got(in) == want, s"canon($in)") }
    val doms = Seq(
      ("a.b.site.co.uk", "site.co.uk"),     // multi-label suffix wins
      ("deep.sub.site.com", "site.com"),
      ("site.com", "site.com"),
      ("host.internal", "host.internal"),   // unknown suffix: unchanged
      ("co.uk", "co.uk"))                   // bare suffix: conservative
    val gd = doms.map(_._1).toDF("h")
      .select(col("h"), UrlOps.registeredDomain(col("h")).as("d"))
      .as[(String, String)].collect().toMap
    doms.foreach { case (in, want) => assert(gd(in) == want, s"domain($in)") }
  }

  test("linear classifier: GD separates a separable corpus; scoring is deterministic") {
    import graft.operators.ClassifierOps
    val docs = ((1L to 6L).map(i => (i, "good great excellent fine", true)) ++
      (7L to 12L).map(i => (i, "bad awful terrible poor", false))).toDF("doc_id", "text", "y")
    val w = ClassifierOps.trainLinearQ(docs, "doc_id", "text", col("y"),
      buckets = 64, iters = 3, lrNum = 50L)
    val scores = ClassifierOps.scoreLinearQ(docs, "doc_id", "text", w, 64)
      .as[(Long, Long)].collect().toMap
    val pos = (1L to 6L).map(scores)
    val neg = (7L to 12L).map(scores)
    assert(pos.min > 0L && neg.max < 0L,
      s"3 GD passes must separate a separable corpus: pos=$pos neg=$neg")
    assert(pos.min > neg.max + 1000000L, "margin must be a real unit, not a tie-break")
    val again = ClassifierOps.scoreLinearQ(docs, "doc_id", "text", w, 64)
      .as[(Long, Long)].collect().toMap
    assert(again == scores, "training + scoring must be bit-deterministic")
    // a doc of entirely unseen tokens still scores, via the bias bucket
    val unseen = Seq((99L, "zzz qqq")).toDF("doc_id", "text")
    val u = ClassifierOps.scoreLinearQ(unseen, "doc_id", "text", w, 64)
      .as[(Long, Long)].collect()
    assert(u.length == 1 && u.head._1 == 99L, s"bias must keep unseen docs scored: ${u.toSeq}")
  }

  test("trainAndScoreQ: one shared feature pass scores exactly like train-then-score") {
    import graft.operators.ClassifierOps
    val docs = ((1L to 6L).map(i => (i, "good great excellent fine", true)) ++
      (7L to 12L).map(i => (i, "bad awful terrible poor", false))).toDF("doc_id", "text", "y")
    val w = ClassifierOps.trainLinearQ(docs, "doc_id", "text", col("y"),
      buckets = 64, iters = 3, lrNum = 50L)
    val want = ClassifierOps.scoreLinearQ(docs, "doc_id", "text", w, 64)
      .as[(Long, Long)].collect().toMap
    val got = ClassifierOps.trainAndScoreQ(docs, "doc_id", "text", col("y"),
      buckets = 64, iters = 3, lrNum = 50L)
      .as[(Long, Long)].collect().toMap
    assert(got == want,
      s"shared-feature-pass scoring must be bit-identical: got=$got want=$want")
  }

  test("classifier registry: a retrain REPLACES the model, stale buckets zero out") {
    import graft.operators.ClassifierOps
    val path = java.nio.file.Files.createTempDirectory("clfidx").toString + "/m"
    val buckets = 64
    // corpus A trains weights on tokens corpus B never mentions: a sparse
    // upsert would keep those buckets' OLD weights alive after the retrain
    // and scoreLinearQ's join would silently apply them
    val a = ((1L to 4L).map(i => (i, "alpha beta gamma", true)) ++
      (5L to 8L).map(i => (i, "delta epsilon zeta", false))).toDF("doc_id", "text", "y")
    val b = ((1L to 4L).map(i => (i, "one two three", true)) ++
      (5L to 8L).map(i => (i, "four five six", false))).toDF("doc_id", "text", "y")
    ClassifierOps.buildClassifierIndex(a, "doc_id", "text", col("y"), buckets, 2, 50L, path)
    ClassifierOps.buildClassifierIndex(b, "doc_id", "text", col("y"), buckets, 2, 50L, path)
    // probe docs written in corpus A's vocabulary: under the replaced
    // model their only live feature is the bias bucket
    val probeDocs = Seq((101L, "alpha beta gamma"), (102L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val got = ClassifierOps.classifierProbe(spark, path, probeDocs,
      "doc_id", "text", buckets).as[(Long, Long)].collect().toMap
    val freshW = ClassifierOps.trainLinearQ(b, "doc_id", "text", col("y"), buckets, 2, 50L)
    val want = ClassifierOps.scoreLinearQ(probeDocs, "doc_id", "text", freshW, buckets)
      .as[(Long, Long)].collect().toMap
    assert(got == want,
      s"retrained registry must score exactly like a fresh model: got=$got want=$want")
    // and the persisted frame is dense: every bucket row present
    val rows = new graft.storage.TxLogTable(spark, s"$path/weights").read()
    assert(rows.count() == buckets + 1L, "weight table must be dense over [0, buckets]")
  }
}
