package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting (whitespace + regex), language ID (stopword
  * n-gram heuristic), quality scoring, and document fingerprinting.
  *
  * Everything is pure `Column` expressions (higher-order array functions, no
  * UDFs) so the operators stay inside whole-stage codegen and distribute
  * trivially — per-document work, no shuffle, no driver state.
  *
  * Cross-engine determinism: hashing is md5-based (`hash60`), arithmetic is
  * integer or identically-shaped double expressions, so every operator here
  * is oracle-checkable against another SQL engine.
  */
object TextOps {

  def tokens(text: Column): Column = split(text, " ")

  /** 60-bit deterministic hash: first 15 hex chars of md5, as a long.
    * Reproducible in any engine with md5 + hex parsing (unlike xxhash64,
    * whose seed/implementation is engine-specific).
    */
  def hash60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish token count: word pieces + standalone punctuation. */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("""\w+|[^\w\s]""")).cast("long")

  /** The fixed merges table driving [[bpeSegment]] / [[bpeTokenCount]]:
    * REAL byte-pair encoding in miniature — an ordered vocabulary of
    * (left, right) merge rules over lowercase letters, English-bigram
    * shaped so it genuinely compresses the corpus. Rule order is the
    * rule PRIORITY, exactly like a production merges.txt; later rules
    * build on earlier merges ("t h"→"th" before "th e"→"the").
    */
  val BpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "e" -> "r", "a" -> "n",
    "o" -> "n", "r" -> "e", "in" -> "g", "an" -> "d", "o" -> "u",
    "e" -> "s", "o" -> "r", "s" -> "t", "e" -> "d", "a" -> "r", "a" -> "l")

  /** BPE segmentation as ONE codegen'd expression chain, no UDF. The text
    * renders as one `|<sym><space>` cell per letter (non-letters become
    * word boundaries: an extra space no rule pattern can cross), then each
    * merge rule (x, y) applies as a single global string replace of
    * `"|x |y "` with `"|xy "` — which IS the BPE rule step: leftmost-first,
    * non-overlapping, and boundary-safe because every symbol carries its
    * own `|` prefix and space suffix (a pattern can never match a partial
    * symbol). The merges are compiled into the plan as literals — cheaper
    * than a broadcast lookup, and constant-folded by Catalyst.
    *
    * Deterministic and engine-portable: the same regexp_replace + replace
    * chain unrolls in the DuckDB oracle verbatim (q_text_bpe).
    */
  def bpeSegment(text: Column, merges: Seq[(String, String)] = BpeMerges): Column = {
    require(merges.forall { case (x, y) =>
      (x + y).forall(c => c >= 'a' && c <= 'z') }, "BPE symbols must be [a-z]")
    val rendered = regexp_replace(
      regexp_replace(lower(text), "[^a-z]", " "), "([a-z])", "|$1 ")
    merges.foldLeft(rendered) { case (acc, (x, y)) =>
      replace(acc, lit(s"|$x |$y "), lit(s"|$x$y "))
    }
  }

  /** BPE token count under [[BpeMerges]]: one `|` per emitted token. The
    * real-tokenizer budget for [[SampleOps.packChunks]] / mixture shares —
    * map-only, stays inside whole-stage codegen at any scale.
    */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)] = BpeMerges): Column = {
    val seg = bpeSegment(text, merges)
    (length(seg) - length(replace(seg, lit("|"), lit("")))).cast("long")
  }

  /** LEARN a BPE merge table from the corpus — the tokenizer-training half
    * of the BPE surface ([[bpeSegment]]/[[bpeTokenCount]] are the apply
    * half and consume exactly what this emits). Classic Sennrich et al.
    * 2016 training: `nMerges` rounds of "count all adjacent symbol pairs,
    * merge the most frequent" — here each round is ONE distributed
    * aggregation over the corpus (explode adjacent pairs from the
    * boundary-marked cell rendering, hash-agg counts, TakeOrderedAndProject
    * argmax), the chosen rule (a 1-row control-plane collect, the k-means
    * centroid pattern) applies as the same single global replace the apply
    * path uses, and the re-segmented corpus persists per round so round t
    * never replays rounds 1..t−1.
    *
    * Deterministic: counts are exact, the argmax tie-breaks on (count desc,
    * left asc, right asc), and the whole trajectory — including every
    * round's data-dependent merge CHOICE — replays in the DuckDB oracle as
    * unrolled CTEs whose replace patterns come from scalar subqueries
    * (q_bpe_train). Stops early if the corpus runs out of pairs.
    * Returns the ordered rules with their winning counts.
    */
  def bpeTrain(docs: DataFrame, text: String, nMerges: Int): Seq[(String, String, Long)] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    var seg = SkewOps.spreadSmall(docs)
      .select(bpeSegment(col(text), Seq.empty).as("seg")).persist()
    // no materialization job per round (r18): each round's argmax collect
    // materializes the current seg's cache itself; the PARENT round's
    // blocks stay pinned until that has happened (prev unpersists at the
    // top of the next round, after its child is cached) — one corpus job
    // per merge round instead of two, identical trajectory
    var prev: Option[DataFrame] = None
    val learned = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var exhausted = false
    for (_ <- 0 until nMerges if !exhausted) {
      val words = split(col("seg"), "  +")
      val syms = transform(words, w => filter(split(w, " "), s => s =!= lit("")))
      val pairs = flatten(transform(syms, ss =>
        when(size(ss) >= 2, transform(sequence(lit(1), size(ss) - 1),
          i => concat(replace(element_at(ss, i), lit("|"), lit("")), lit(" "),
            replace(element_at(ss, i + 1), lit("|"), lit("")))))
          .otherwise(array().cast("array<string>"))))
      val top = seg.select(explode(pairs).as("pr"))
        .groupBy("pr").agg(count(lit(1)).as("cnt"))
        .select(split(col("pr"), " ").getItem(0).as("x"),
          split(col("pr"), " ").getItem(1).as("y"), col("cnt"))
        .orderBy(col("cnt").desc, col("x").asc, col("y").asc)
        .limit(1).collect()
      // the collect above cached this round's seg; the parent's blocks are
      // no longer reachable by any future plan — drop them now
      prev.foreach(_.unpersist())
      prev = None
      if (top.isEmpty) exhausted = true
      else {
        val (x, y, c) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        learned += ((x, y, c))
        prev = Some(seg)
        seg = seg.select(replace(col("seg"), lit(s"|$x |$y "), lit(s"|$x$y ")).as("seg"))
          .persist()
      }
    }
    prev.foreach(_.unpersist())
    seg.unpersist()
    learned.toSeq
  }

  /** Stopword lists per language for the n-gram language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in", "on"),
    "es" -> Seq("el", "la", "de", "los", "las", "y", "que", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein"),
    "fr" -> Seq("le", "les", "des", "et", "est", "une", "dans", "pour"))

  def stopScore(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(stopwords(lang): _*))).cast("long")

  /** Language ID: argmax of per-language stopword hit counts, deterministic
    * tie-break in fixed order de < en < es < fr, `und` when no stopword hits.
    */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val (de, en, es, fr) = (stopScore(t, "de"), stopScore(t, "en"), stopScore(t, "es"), stopScore(t, "fr"))
    when(de >= en && de >= es && de >= fr && de > 0, "de")
      .when(en >= es && en >= fr && en > 0, "en")
      .when(es >= fr && es > 0, "es")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Quality features + a composite score in [0, 1]. Expression shapes are
    * kept identical to the oracle SQL so double math is bit-identical.
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val t = tokens(text)
    val nTok = size(t).cast("long")
    val nChar = length(text).cast("long")
    val distinctRatio = size(array_distinct(t)).cast("double") / nTok.cast("double")
    val stopRatio = stopScore(t, "en").cast("double") / nTok.cast("double")
    val lenScore = least(lit(1.0), nTok.cast("double") / lit(50.0))
    Seq(
      "n_tokens" -> nTok,
      "n_chars" -> nChar,
      "distinct_ratio" -> distinctRatio,
      "stop_ratio" -> stopRatio,
      "quality_score" -> (lit(0.4) * distinctRatio + lit(0.4) * lenScore + lit(0.2) * stopRatio))
  }

  /** Content fingerprint: md5 over the sorted distinct token set of the
    * normalized text — whitespace- and order-insensitive, so reordered or
    * re-whitespaced copies collide (the "fingerprint dedup" idiom).
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(lower(trim(text)))))))

  /** Sliding token-window chunks: starts at 0, stride, 2*stride, ... while
    * start < n_tokens; each chunk takes up to `chunkTokens` tokens. The
    * overlap (chunkTokens - stride) preserves context across boundaries —
    * the standard RAG / pretraining chunking shape. Pure per-row array
    * expression (no explode until the caller wants rows, no shuffle).
    * Returns ARRAY<STRUCT<start, n_tok, chunk_text>>.
    */
  def slidingChunks(text: Column, chunkTokens: Int, stride: Int): Column = {
    require(chunkTokens > 0 && stride > 0, "chunk and stride must be positive")
    val t = tokens(text)
    val n = size(t)
    val starts = filter(sequence(lit(0), greatest(n - 1, lit(0)), lit(stride)), s => s < n)
    transform(starts, s => struct(
      s.cast("long").as("start"),
      least(lit(chunkTokens), n - s).cast("long").as("n_tok"),
      concat_ws(" ", slice(t, s + 1, lit(chunkTokens))).as("chunk_text")))
  }

  /** PII patterns for scrub/redact passes. Deliberately restricted to regex
    * features with identical semantics in Java regex and RE2 (character
    * classes, bounded quantifiers, ASCII word boundaries) so redaction is
    * oracle-checkable cross-engine.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>"),
    ("ipv4", """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""", "<IP>"),
    ("phone", """\+\d{1,2} \d{3}-\d{3}-\d{4}""", "<PHONE>"))

  /** Count of matches for one PII kind. */
  def piiCount(text: Column, kind: String): Column = {
    val pat = piiPatterns.collectFirst { case (`kind`, p, _) => p }
      .getOrElse(throw new IllegalArgumentException(s"unknown PII kind: $kind"))
    regexp_count(text, lit(pat)).cast("long")
  }

  /** Redact every PII occurrence (all kinds, fixed order so the result is
    * deterministic even where patterns could overlap). Pure per-row
    * expression — a scrub pass over 100 TB is a map-only job, no shuffle.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (acc, (_, pat, rep)) =>
      regexp_replace(acc, pat, rep)
    }

  /** Order-SENSITIVE rolling (polynomial) fingerprint over token hashes:
    * h = fold(h * 31 + hash60(tok) mod M). Complements [[fingerprint]]:
    * detects exact sequences, not bags. Pure fold, no shuffle.
    */
  val RollM: Long = 1000000007L
  /** Strip HTML/markup down to text — the crawl-to-corpus step: drop
    * script/style blocks wholesale, remove remaining tags, decode the
    * common entities, collapse whitespace. Map-only column expressions;
    * every pattern is RE2-compatible (no backreferences, inline (?is)
    * flags and lazy quantifiers only) so the exact same regexes run in
    * the DuckDB oracle.
    */
  def stripMarkup(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val entities = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&") // &amp; LAST: no double-decode
    val decoded = entities.foldLeft(noTags) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to)) // literal replace, mirrored 1:1 in the oracle
    }
    // explicit whitespace class: Java's \s includes \x0B, RE2's does not —
    // the one divergence that could split the engines on hostile input
    trim(regexp_replace(decoded, "[ \t\n\r\f]+", " "))
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1: repetitious
    * documents are low-quality pretraining data): per document, the
    * duplicate-bigram and duplicate-trigram fractions (1 − distinct/total)
    * and the most-frequent-bigram share, plus a `repetitive` verdict at
    * the conventional thresholds (rep2 > 0.3, top2 > 0.2, rep3 > 0.25).
    *
    * Distributed shape: n-grams of both orders explode in ONE pass (order
    * tag prefixed into the gram key), then two hash aggregations —
    * (doc, gram) counts, then per-doc conditional sums. Map-side partials
    * on both; the shuffle key (doc_id, gram) is high-cardinality and
    * unskewed, so the plan holds at corpus scale. Documents with fewer
    * than 2 tokens have no bigrams and are absent from the report.
    */
  def repetitionReport(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    def grams(k: Int): Column =
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(k)))))
        .otherwise(array().cast("array<string>"))
    def tag(k: Int): Column = transform(grams(k), g => concat(lit(s"$k|"), g))
    val counts = SkewOps.spreadSmall(docs)
      .select(col("doc_id"), explode(concat(tag(2), tag(3))).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("cnt"))
    val is2 = substring(col("gram"), 1, 2) === "2|"
    val sig = counts.groupBy("doc_id").agg(
      sum(when(is2, col("cnt"))).as("total2"),
      count(when(is2, lit(1))).as("uniq2"),
      max(when(is2, col("cnt"))).as("max2"),
      sum(when(!is2, col("cnt"))).as("total3"),
      count(when(!is2, lit(1))).as("uniq3"))
    def frac(a: Column, b: Column) = a.cast("double") / b.cast("double")
    val rep2 = when(col("total2") > 0, lit(1.0) - frac(col("uniq2"), col("total2")))
    val top2 = when(col("total2") > 0, frac(col("max2"), col("total2")))
    val rep3 = when(col("total3") > 0, lit(1.0) - frac(col("uniq3"), col("total3")))
    sig.select(col("doc_id"),
      coalesce(col("total2"), lit(0L)).as("n2grams"),
      rep2.as("rep2"), top2.as("top2_frac"), rep3.as("rep3"),
      (coalesce(rep2, lit(0.0)) > 0.3 || coalesce(top2, lit(0.0)) > 0.2 ||
        coalesce(rep3, lit(0.0)) > 0.25).as("repetitive"))
  }

  /** Gopher document-level quality rules (Rae et al. 2021, table A1 —
    * the STATS half; the duplicate-n-gram half is [[repetitionReport]]):
    * word-count bounds, mean word length, symbol-to-word ratio (`#` and
    * `...`), alphabetic-word fraction, required stop words, bullet- and
    * ellipsis-line fractions, and the conjunction verdict at the paper's
    * thresholds. Map-only expression chain; substring counts use
    * replace-length deltas so both engines count identically.
    */
  def gopherReport(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nW = size(toks).cast("long")
    val nWd = nW.cast("double")
    val sumLen = aggregate(transform(toks, t => length(t).cast("long")),
      lit(0L), (a, x) => a + x)
    val meanLen = sumLen.cast("double") / nWd
    val nHash = (length(col("text")) - length(replace(col("text"), lit("#"), lit("")))).cast("long")
    val nEll = ((length(col("text")) -
      length(replace(col("text"), lit("..."), lit("")))) / 3).cast("long")
    val symRatio = (nHash + nEll).cast("double") / nWd
    val alphaFrac = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / nWd
    val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val nStop = size(filter(toks, t => t.isin(gopherStops: _*))).cast("long")
    val lines = split(col("text"), "\n")
    val nL = size(lines).cast("double")
    val bulletFrac = size(filter(lines, l => trim(l).rlike("^[-*]"))).cast("double") / nL
    val ellLineFrac = size(filter(lines, l => l.rlike("\\.\\.\\.$"))).cast("double") / nL
    docs.select(col("doc_id"), nW.as("n_words"), meanLen.as("mean_word_len"),
      symRatio.as("symbol_ratio"), alphaFrac.as("alpha_frac"),
      nStop.as("n_stop"), bulletFrac.as("bullet_frac"),
      ellLineFrac.as("ellipsis_line_frac"),
      (nW >= 50L && nW <= 100000L &&
        meanLen >= 3.0 && meanLen <= 10.0 &&
        symRatio <= 0.1 && alphaFrac >= 0.8 && nStop >= 2L &&
        bulletFrac <= 0.9 && ellLineFrac <= 0.3).as("gopher_pass"))
  }

  /** Line-level boilerplate dedup (the RefinedWeb/CCNet pass): drop every
    * line occurring in MORE than `maxDf` documents — cookie banners, nav
    * bars, copyright footers repeat corpus-wide while real content lines do
    * not — and reassemble each document from its surviving lines in order.
    *
    * Distinct from the char-span ExactSubstr pass ([[graft.operators
    * .DedupOps.duplicateSpans]]): this keys on WHOLE lines (cheap, the
    * standard first boilerplate pass), that one finds arbitrary repeated
    * character windows.
    *
    * Shape: one explode (spread-protected: the per-line md5 is the map
    * cost), line document-frequencies on the 60-bit line hash (distinct
    * (doc, hash) first, so within-doc repeats count once), an anti-join on
    * the high-cardinality hash key — the common-line set is NOT assumed
    * broadcastable — and one per-doc reassembly agg. Emits
    * (id, clean, n_lines, n_removed) for EVERY input document (a fully
    * boilerplate doc comes back with `clean` empty).
    */
  def removeCommonLines(docs: DataFrame, id: String, text: String,
                        maxDf: Long): DataFrame = {
    // the exploded line stream feeds THREE consumers (the line-df agg, the
    // anti-join's kept side, the per-doc totals): persist it so the
    // explode runs once per job, not once per consumer (r18, guide §5 —
    // same rule as the dedup shingle indexes)
    val lines = SkewOps.spreadSmall(docs)
      .select(col(id).as("__id"),
        posexplode(split(col(text), "\n")).as(Seq("pos", "line")))
      .persist()
    val dfc = lines.select(col("__id"), hash60(col("line")).as("lh")).distinct()
      .groupBy("lh").agg(count(lit(1)).as("df"))
    val common = dfc.filter(col("df") > maxDf).select("lh")
    val kept = lines.withColumn("lh", hash60(col("line")))
      .join(common, Seq("lh"), "left_anti")
    val ag = kept.groupBy(col("__id"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")), "\n").as("clean"),
        count(lit(1)).as("n_kept"))
    val tot = lines.groupBy(col("__id")).agg(count(lit(1)).as("n_lines"))
    docs.select(col(id).as("__id")).join(tot, Seq("__id"), "left")
      .join(ag, Seq("__id"), "left")
      .select(col("__id").as(id),
        coalesce(col("clean"), lit("")).as("clean"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        (coalesce(col("n_lines"), lit(0L)) -
          coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(tokens(lower(trim(text))), t => pmod(hash60(t), lit(RollM))),
      lit(0L),
      (acc, h) => pmod(acc * lit(31L) + h, lit(RollM)))
}
