package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.ingest.Ingest
import graft.streaming.RegistryCdc

/** Property-based checks (SURVEY.md §5.2): inference precedence is a total
  * function matching a reference model, the narrow->wide->narrow roundtrip
  * preserves numeric points, and registry CDC is per-key order-insensitive
  * given event timestamps.
  */
object EngineProperties extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = {
    val s = GraftSession.builder("graft-props", cores = "4").master("local[4]").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  // --- baseline JPEG codec: randomized roundtrip laws ----------------------

  private val blockImageGen: Gen[(Int, Int, Array[Int])] = for {
    bw <- Gen.chooseNum(1, 6)
    bh <- Gen.chooseNum(1, 5)
    blocks <- Gen.listOfN(bw * bh, Gen.chooseNum(0, 255))
  } yield (bw * 8, bh * 8, blocks.toArray)

  property("jpeg: block-constant images roundtrip bit-exactly") =
    forAll(blockImageGen) { case (w, h, blocks) =>
      import graft.operators.JpegCodec
      def px(x: Int, y: Int): Int = blocks((y / 8) * (w / 8) + (x / 8))
      val img = JpegCodec.decode(JpegCodec.encodeGray(w, h, px))
      img.width == w && img.height == h &&
        (0 until h).forall(y => (0 until w).forall(x =>
          (img.rgb(y * img.width + x) & 0xff) == px(x, y)))
    }

  private val anyImageGen: Gen[(Int, Int, Long)] = for {
    w <- Gen.chooseNum(8, 50) // non-multiple-of-8 sizes exercise edge blocks
    h <- Gen.chooseNum(8, 40)
    seed <- Gen.chooseNum(0L, Long.MaxValue / 2)
  } yield (w, h, seed)

  property("jpeg: arbitrary images stay within the unit-quant error bound") =
    forAll(anyImageGen) { case (w, h, seed) =>
      import graft.operators.JpegCodec
      def px(x: Int, y: Int): Int = // deterministic pseudo-noise, full range
        (((x * 2654435761L + y * 40503L + seed) >>> 16) & 0xff).toInt
      val img = JpegCodec.decode(JpegCodec.encodeGray(w, h, px))
      // per-coefficient quant error <= 0.5 -> spatial error <= 8 worst-case
      img.width == w && img.height == h &&
        (0 until h).forall(y => (0 until w).forall(x =>
          math.abs((img.rgb(y * img.width + x) & 0xff) - px(x, y)) <= 8))
    }

  // --- inference precedence vs. a pure-Scala reference model ---------------

  private val payloadGen: Gen[String] = Gen.oneOf(
    Gen.chooseNum(-1e6, 1e6).map(_.toString),
    Gen.chooseNum(-1000000L, 1000000L).map(_.toString),
    Gen.oneOf("true", "True", "false", "False", "TRUE", "FALSE", "tRue"),
    Gen.alphaNumStr.suchThat(_.nonEmpty),
    Gen.oneOf("", " ", "3.14.15", "NaN-ish", "{\"k\": 1}", "héllo wörld"))

  /** The intended reference semantics (influx_service.py:149-181). */
  private def model(p: String): (Option[Double], Option[Boolean], Option[String]) = {
    val num = try Some(p.trim.toDouble).filter(_ => p.trim.nonEmpty) catch { case _: Exception => None }
    if (num.isDefined) (num, None, None)
    else if (p == "true" || p == "True") (None, Some(true), None)
    else if (p == "false" || p == "False") (None, Some(false), None)
    else (None, None, Some(p))
  }

  property("type inference matches the reference model and is total") =
    forAll(Gen.listOfN(30, payloadGen)) { payloads =>
      import spark.implicits._
      val rows = Ingest.inferTypes(payloads.toDF("payload"))
        .select("payload", "num", "bool", "str").collect()
      rows.forall { r =>
        val p = r.getString(0)
        val got = (Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[Boolean]),
          Option(r.get(3)).map(_.asInstanceOf[String]))
        val exp = model(p)
        // Spark's try_cast and Scala's toDouble may disagree on exotic
        // numerics (hex, d/f suffixes); restrict equivalence to the model's
        // branch CHOICE, and exactly-one-branch totality.
        val oneBranch = Seq(got._1, got._2, got._3).count(_.isDefined) == 1
        val boolAgrees = got._2 == exp._2
        oneBranch && boolAgrees
      }
    }

  // --- narrow -> wide -> narrow roundtrip ---------------------------------

  private val pointGen: Gen[(String, String, Int, Double)] = for {
    dev <- Gen.oneOf("d1", "d2", "d3")
    tr <- Gen.oneOf("temp", "hum", "co2", "lux")
    tsBucket <- Gen.chooseNum(0, 3)
    v <- Gen.chooseNum(-100.0, 100.0)
  } yield (dev, tr, tsBucket, v)

  property("narrow->wide(map)->narrow preserves numeric points") =
    forAll(Gen.listOfN(25, pointGen)) { pts0 =>
      import spark.implicits._
      // one value per (device, transducer, ts): keep the max like a last-write
      val pts = pts0.groupBy(p => (p._1, p._2, p._3)).map(_._2.maxBy(_._4)).toSeq
      val narrow = pts.toDF("device_id", "transducer", "tsb", "v")
        .select(col("device_id"), col("transducer"),
          timestamp_micros(col("tsb") * 1000000L).as("ts"),
          col("v").as("num"), lit(null).cast("boolean").as("bool"),
          lit(null).cast("string").as("str"))
      val back = Ingest.wideView(narrow)
        .select(col("device_id"), col("ts"), explode(col("fields")).as(Seq("transducer", "num")))
        .select("device_id", "transducer", "ts", "num")
        .as[(String, String, java.sql.Timestamp, Double)].collect().toSet
      val expected = narrow.select("device_id", "transducer", "ts", "num")
        .as[(String, String, java.sql.Timestamp, Double)].collect().toSet
      back == expected
    }

  // --- exact jaccard pairs vs pure model ----------------------------------

  private val docGen: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(2, 10)
    texts <- Gen.listOfN(n, Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d", "e", "f"))
      .map(_.mkString(" ")))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("exact jaccard pairs match a pure set model") =
    forAll(docGen) { docs =>
      import spark.implicits._
      def shingleSet(t: String): Set[String] =
        t.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val model = (for {
        (i, ti) <- docs; (j, tj) <- docs if i < j
        si = shingleSet(ti); sj = shingleSet(tj)
        inter = (si & sj).size if inter > 0
        jac = inter.toDouble / (si.size + sj.size - inter) if jac >= 0.3
      } yield (i, j, jac)).toSet
      val got = graft.operators.DedupOps
        .jaccardPairs(docs.toDF("doc_id", "text"), "doc_id", "text", 3, 0.3)
        .as[(Long, Long, Double)].collect().toSet
      got == model
    }

  // --- incremental CC == from-scratch CC, for ANY edge split --------------

  private val edgeSplitGen: Gen[(List[(Long, Long)], List[(Long, Long)])] = for {
    n1 <- Gen.chooseNum(0, 25)
    n2 <- Gen.chooseNum(1, 25)
    mk = Gen.zip(Gen.chooseNum(0L, 18L), Gen.chooseNum(0L, 18L))
    e1 <- Gen.listOfN(n1, mk)
    e2 <- Gen.listOfN(n2, mk)
  } yield (e1.filter(e => e._1 != e._2), e2.filter(e => e._1 != e._2))

  property("mergeComponents(cc(E1), E2) == cc(E1 ++ E2) for any split") =
    forAll(edgeSplitGen) { case (e1, e2) =>
      import spark.implicits._
      val all = e1 ++ e2
      if (all.isEmpty) true
      else {
        val full = graft.operators.DedupOps
          .connectedComponents(all.toDF("i", "j"))
          .as[(Long, Long)].collect().toMap
        val inc = graft.operators.DedupOps.mergeComponents(
          if (e1.isEmpty)
            spark.range(0).select(col("id").as("node"), col("id").as("component"))
          else graft.operators.DedupOps.connectedComponents(e1.toDF("i", "j")),
          e2.toDF("i", "j")).as[(Long, Long)].collect().toMap
        inc == full
      }
    }

  // --- CDC order-insensitivity --------------------------------------------

  private val eventsGen: Gen[List[RegistryCdc.ServiceEvent]] = for {
    n <- Gen.chooseNum(1, 8)
    actions <- Gen.listOfN(n, Gen.oneOf("new", "update", "delete"))
  } yield actions.zipWithIndex.map { case (a, i) =>
    RegistryCdc.ServiceEvent("dev", a, if (a == "delete") Nil else Seq(s"t$i", "temp"), (i + 1) * 100L)
  }

  // --- as-of join: physical operator vs composed form vs pure model --------

  private val asofGen = for {
    nl <- Gen.chooseNum(1, 15)
    nr <- Gen.chooseNum(0, 15)
    ls <- Gen.listOfN(nl, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(0L, 50L)))
    rs <- Gen.listOfN(nr, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(0L, 50L), Gen.chooseNum(0.0, 9.0)))
  } yield (ls.distinct, rs.groupBy(r => (r._1, r._2)).values.map(_.head).toList)

  property("physical as-of join matches composed form and a pure model") =
    forAll(asofGen) { case (ls, rs) =>
      import spark.implicits._
      val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "ts", "lid")
      val right = rs.toDF("k", "rts", "v")
      val gotExec = graft.plans.AsofJoinExecApi.asof(left, right, Seq("k"), "ts", "rts")
        .select("lid", "rts", "v").collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
      val gotComposed = graft.operators.AsofJoin.asof(left, right, Seq("k"), "ts", "rts", Seq("v"))
        .select("lid", "right_rts", "right_v").collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
      val model = ls.zipWithIndex.map { case ((k, t), i) =>
        val cand = rs.filter(r => r._1 == k && r._2 <= t)
        if (cand.isEmpty) (i.toLong, None, None)
        else { val best = cand.maxBy(_._2); (i.toLong, Some(best._2), Some(best._3)) }
      }.toSet
      gotExec == model && gotComposed == model
    }

  // --- TxLogTable merge: fold of merges equals a pure last-writer-wins map --

  private val mergeBatchesGen: Gen[List[List[(Long, String, Long)]]] = for {
    nBatches <- Gen.chooseNum(1, 4)
    batches <- Gen.listOfN(nBatches, for {
      n <- Gen.chooseNum(1, 6)
      rows <- Gen.listOfN(n, for {
        k <- Gen.chooseNum(0L, 4L)
        v <- Gen.oneOf("a", "b", "c", "d")
        ts <- Gen.chooseNum(1L, 9L)
      } yield (k, v, ts))
      // one row per (key, ts) within a batch: equal-ts rows in ONE batch
      // have no defined winner (the seam callers like RegistryMaintenance
      // never produce them — CDC emits one snapshot per key per batch)
    } yield rows.groupBy(r => (r._1, r._3)).values.map(_.head).toList)
  } yield batches

  property("TxLogTable merge fold equals last-writer-wins (ties favor later batch)") =
    forAll(mergeBatchesGen) { batches =>
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("txprop").toString + "/t"
      val t = new graft.storage.TxLogTable(spark, dir)
      batches.foreach(b => t.merge(b.toDF("k", "v", "ts"), Seq("k"), Some("ts")))
      val got = t.read().as[(Long, String, Long)].collect().toSet
      // pure model: per key, the row with max ts; among equal ts the row
      // from the LATEST batch wins (updates beat current state)
      val model = batches.zipWithIndex.flatMap { case (b, i) => b.map(r => (r, i)) }
        .groupBy(_._1._1)
        .map { case (_, rows) => rows.maxBy { case ((_, _, ts), i) => (ts, i) }._1 }
        .toSet
      got == model
    }

  property("registry CDC result is independent of arrival order") =
    forAll(eventsGen, Gen.chooseNum(0, 1000)) { (events, seed) =>
      import spark.implicits._
      val shuffled = new scala.util.Random(seed).shuffle(events)
      def result(evs: List[RegistryCdc.ServiceEvent]) =
        RegistryCdc.replayBatch(evs.toDS()).collect()
          .map(r => (r.deviceId, r.transducers.toSet, r.active)).toSet
      result(events) == result(shuffled)
    }

  // --- curation/storage operator properties --------------------------------

  property("zvalue2 is injective on the grid (interleave loses no bits)") =
    forAll(Gen.chooseNum(1, 8)) { bits =>
      import spark.implicits._
      val side = 1 << bits
      val grid = spark.range(0, side.toLong * side).select(
        (col("id") % side).as("x"), expr(s"id div $side").as("y"))
      val distinctZ = grid
        .select(graft.storage.ZOrder.zvalue2(col("x"), col("y"), bits).as("z"))
        .distinct().count()
      distinctZ == side.toLong * side
    }

  private val seriesGen: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0.0, 1000.0).map(v => math.rint(v * 100) / 100))

  property("EMA stays within [min, max] of the series prefix") =
    forAll(seriesGen) { vs =>
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("ts", "v")
      val w = Window.partitionBy(lit(1)).orderBy(col("ts"))
      val rows = df.select(col("ts"),
          graft.operators.TimeSeriesOps.exponentialMovingAverage(col("v"), w, 3, 8).as("ema"))
        .orderBy("ts").as[(Long, Double)].collect()
      rows.forall { case (i, ema) =>
        val prefix = vs.slice(math.max(0, i.toInt - 7), i.toInt + 1)
        // 1e-6 quantization of values bounds the EMA the same way
        ema >= prefix.min - 1e-6 && ema <= prefix.max + 1e-6
      }
    }

  property("histogram partitions the input: bin counts sum to row count") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-100.0, 700.0))) { vs =>
      import spark.implicits._
      val total = graft.operators.TimeSeriesOps
        .fixedWidthHistogram(vs.toDF("v"), Seq.empty, col("v"), 0.0, 500.0, 10)
        .agg(sum(col("n"))).as[Long].head()
      total == vs.length.toLong
    }

  property("quota sampling: at most k per group, selection is a stable function of id") =
    forAll(Gen.chooseNum(1, 10)) { k =>
      import spark.implicits._
      val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      val kept = graft.operators.SampleOps
        .quotaPerGroup(docs, col("source"), col("doc_id"), k)
        .select("source", "doc_id").as[(String, Long)].collect()
      val perGroup = kept.groupBy(_._1).view.mapValues(_.length)
      val again = graft.operators.SampleOps
        .quotaPerGroup(docs, col("source"), col("doc_id"), k)
        .select("source", "doc_id").as[(String, Long)].collect()
      perGroup.values.forall(_ <= k) && kept.toSet == again.toSet
    }

  property("WAV codec roundtrip: arbitrary PCM16 signals survive synth->decode exactly") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(Short.MinValue + 1, Short.MaxValue.toInt))) { vs =>
      val samples = vs.map(_.toShort).toArray
      val info = graft.operators.WavCodec.decode(graft.operators.WavCodec.synth(8000, samples))
      info.nFrames == samples.length.toLong &&
        info.peak == samples.map(v => math.abs(v.toInt)).max &&
        info.sampleRate == 8000 && info.channels == 1
    }

  // --- InfluxQL parser: render->parse is the identity on the AST ----------

  private object Iq {
    import graft.influxql.InfluxQL._

    private val aggPool = Seq("count", "sum", "mean", "min", "max", "first",
      "last", "median", "spread", "stddev", "mode")
    private val tagPool = Seq("device", "zone")
    private val fieldPool = Seq("value", "v2")

    private def aggCallGen(allowTransform: Boolean): Gen[Field] = for {
      fn <- Gen.oneOf(aggPool :+ "percentile")
      arg <- Gen.oneOf(fieldPool)
      pct <- Gen.chooseNum(0, 100).map(n => if (fn == "percentile") Some(n.toDouble) else None)
      tf <- if (allowTransform) Gen.option(Gen.oneOf(TransformFuncs.toSeq)) else Gen.const(None)
      targ <- Gen.chooseNum(2, 9)
    } yield {
      val t = tf.map {
        case d @ ("derivative" | "non_negative_derivative") => (d, Some(targ.toLong * 1000000L))
        case "moving_average" => ("moving_average", Some(targ.toLong))
        case ta if TaFuncs.contains(ta) => (ta, Some(targ.toLong))
        case other => (other, None)
      }
      Field(fn, arg, pct, t.map(_._1), t.flatMap(_._2))
    }

    // expression trees over aggregate calls: bare calls, binary arithmetic
    // with literals or a second call, unary minus, 1-arg scalar functions
    private def aggExprGen(allowTransform: Boolean): Gen[FExpr] = {
      val leaf = aggCallGen(allowTransform).map(FCall.apply)
      val numLeaf = Gen.chooseNum(1, 9999).map(n => FNum(n / 100.0))
      Gen.frequency(
        5 -> leaf,
        1 -> (for {
          op <- Gen.oneOf("+", "-", "*", "/")
          l <- leaf
          r <- Gen.oneOf(leaf, numLeaf)
        } yield FBin(op, l, r)),
        1 -> leaf.map(l => FFun("neg", Seq(l))),
        1 -> (for {
          fn <- Gen.oneOf("abs", "sqrt", "floor", "round")
          l <- leaf
        } yield FFun(fn, Seq(l))))
    }

    private def aggItemGen(i: Int, allowTransform: Boolean): Gen[Item] =
      aggExprGen(allowTransform).map(e => Item(e, Some(s"f$i")))

    private val simpleCondGen: Gen[Cond] = Gen.oneOf(
      for {
        op <- Gen.oneOf(">", ">=", "<", "<=")
        u <- Gen.chooseNum(0L, 2000000000000000L)
      } yield TimeCond(op, u),
      for {
        t <- Gen.oneOf(tagPool)
        eq <- Gen.oneOf(true, false)
        v <- Gen.alphaNumStr.map("v" + _.take(6))
      } yield TagCond(t, eq, v),
      for {
        f <- Gen.oneOf(fieldPool)
        op <- Gen.oneOf("=", "!=", "<", "<=", ">", ">=")
        v <- Gen.chooseNum(0, 99999).map(_ / 100.0)
      } yield FieldCond(f, op, v))

    private val orCondGen: Gen[Cond] = for {
      nb <- Gen.chooseNum(2, 3)
      branches <- Gen.listOfN(nb, Gen.chooseNum(1, 2).flatMap(Gen.listOfN(_, simpleCondGen)))
    } yield OrCond(branches.map(_.toSeq))

    private val condsGen: Gen[Seq[Cond]] = for {
      n <- Gen.chooseNum(0, 3)
      cs <- Gen.listOfN(n, Gen.frequency(4 -> simpleCondGen, 1 -> orCondGen))
    } yield cs

    private val aggQueryGen: Gen[Query] = for {
      groupTime <- Gen.option(Gen.chooseNum(1L, 7L).map(_ * 3600000000L))
      groupOff <- if (groupTime.isEmpty) Gen.const(0L)
        else Gen.chooseNum(0L, 3L).map(_ * 600000000L)
      n <- Gen.chooseNum(1, 3)
      fields <- Gen.sequence[Seq[Item], Item](
        (0 until n).map(i => aggItemGen(i, allowTransform = groupTime.nonEmpty)))
      conds <- condsGen
      tags <- Gen.someOf(tagPool).map(_.toSeq)
      star <- Gen.oneOf(true, false)
      fill <- if (groupTime.isEmpty) Gen.const(FillNull: Fill)
        else Gen.oneOf(Gen.const(FillNull: Fill), Gen.const(FillNone: Fill),
          Gen.const(FillPrevious: Fill), Gen.const(FillLinear: Fill),
          Gen.chooseNum(0, 99999).map(c => FillValue(c / 100.0): Fill))
      // a written FILL(...) clause parses with fillExplicit = true; a
      // non-null fill always renders, FILL(null) renders only when drawn
      // explicit (the r13 field the generator originally missed — the
      // mismatch surfaced as a flaky ~12%-pass property)
      fillExp <- if (groupTime.isEmpty) Gen.const(false)
        else if (fill == FillNull) Gen.oneOf(true, false)
        else Gen.const(true)
      desc <- Gen.oneOf(true, false)
      limit <- Gen.option(Gen.chooseNum(1, 500))
      offset <- Gen.option(Gen.chooseNum(0, 500))
      slimit <- if (tags.nonEmpty || star) Gen.option(Gen.chooseNum(1, 20))
        else Gen.const(None)
      soffset <- if (tags.nonEmpty || star) Gen.option(Gen.chooseNum(0, 20))
        else Gen.const(None)
    } yield Query(fields, "m1", conds, groupTime, tags, fill, desc, limit, star,
      offset = offset, slimit = slimit, soffset = soffset,
      groupTimeOffsetUs = groupOff, fillExplicit = fillExp)

    private val rawQueryGen: Gen[Query] = for {
      fields <- Gen.someOf(fieldPool).suchThat(_.nonEmpty)
      conds <- condsGen
      desc <- Gen.oneOf(true, false)
      limit <- Gen.option(Gen.chooseNum(1, 500))
    } yield Query(fields.toSeq.map(n => Item(FRef(n), None)), "m1", conds,
      None, Nil, FillNull, desc, limit)

    private val topQueryGen: Gen[Query] = for {
      fn <- Gen.oneOf("top", "bottom")
      arg <- Gen.oneOf(fieldPool)
      k <- Gen.chooseNum(1, 20)
      conds <- condsGen
      tags <- Gen.someOf(tagPool).map(_.toSeq)
      desc <- Gen.oneOf(true, false)
      limit <- Gen.option(Gen.chooseNum(1, 500))
    } yield Query(Seq(Item(FCall(Field(fn, arg, Some(k.toDouble))), Some("f0"))), "m1", conds,
      None, tags, FillNull, desc, limit)

    val queryGen: Gen[Query] = Gen.oneOf(aggQueryGen, rawQueryGen, topQueryGen)

    private def num(d: Double): String =
      if (d == math.floor(d) && !d.isInfinite) d.toLong.toString
      else BigDecimal(d).bigDecimal.toPlainString

    private def renderCall(f: Field): String = {
      val inner = s"${f.func}(${f.arg}${f.pct.fold("")(p => s", ${num(p)}")})"
      f.transform.fold(inner)(tf => s"$tf($inner${f.targ.fold("")(t => s", $t")})")
    }

    // full parenthesization keeps the rendered tree shape = the parsed one
    private def renderExpr(e: FExpr): String = e match {
      case FNum(v) => num(v)
      case FRef(n) => n
      case FCall(f) => renderCall(f)
      case FBin(op, l, r) => s"(${renderExpr(l)} $op ${renderExpr(r)})"
      case FFun("neg", Seq(x)) => s"(- ${renderExpr(x)})"
      case FFun(fn, args) => s"$fn(${args.map(renderExpr).mkString(", ")})"
    }

    private def renderItem(it: Item): String =
      renderExpr(it.expr) + it.alias.fold("")(a => s" AS $a")

    def render(q: Query): String = {
      val sb = new StringBuilder("SELECT ")
      sb ++= q.fields.map(renderItem).mkString(", ")
      sb ++= s" FROM ${q.measurement}"
      def cond(c: Cond): String = c match {
        case TimeCond(op, us) => s"time $op $us"
        case TagCond(t, true, v) => s"$t = '$v'"
        case TagCond(t, false, v) => s"$t != '$v'"
        case FieldCond(f, op, v) => s"$f $op ${num(v)}"
        // parenthesized so a top-level AND neighbor can't capture a branch
        case OrCond(bs) => bs.map(_.map(cond).mkString(" AND "))
          .mkString("((", ") OR (", "))")
      }
      if (q.conds.nonEmpty) sb ++= " WHERE " + q.conds.map(cond).mkString(" AND ")
      val groups = q.groupTimeUs.map(d =>
        if (q.groupTimeOffsetUs != 0L) s"time($d, ${q.groupTimeOffsetUs})"
        else s"time($d)").toSeq ++
        q.groupTags ++ (if (q.groupStar) Seq("*") else Nil)
      if (groups.nonEmpty) sb ++= " GROUP BY " + groups.mkString(", ")
      q.fill match {
        case FillNull => if (q.fillExplicit) sb ++= " FILL(null)"
        case FillNone => sb ++= " FILL(none)"
        case FillPrevious => sb ++= " FILL(previous)"
        case FillLinear => sb ++= " FILL(linear)"
        case FillValue(v) => sb ++= s" FILL(${num(v)})"
      }
      if (q.timeDesc) sb ++= " ORDER BY time DESC"
      q.limit.foreach(n => sb ++= s" LIMIT $n")
      q.offset.foreach(n => sb ++= s" OFFSET $n")
      q.slimit.foreach(n => sb ++= s" SLIMIT $n")
      q.soffset.foreach(n => sb ++= s" SOFFSET $n")
      sb.toString
    }
  }

  property("InfluxQL parser: render->parse is the identity on supported ASTs") =
    forAll(Iq.queryGen) { q =>
      val parsed = graft.influxql.InfluxQL.parse(Iq.render(q))
      if (parsed != q) println(s"RENDER: ${Iq.render(q)}\nGOT:    $parsed\nWANT:   $q")
      parsed == q
    }

  // statements whose TEXT hides ';' inside every container the splitter
  // must respect: string literals, regex literals (FROM and =~ position),
  // quoted identifiers, plus the division-slash trap that must NOT open a
  // regex — none of these may split
  private val trickyStmtGen: Gen[String] = for {
    m <- Gen.oneOf("temp", "hum", "m1")
    v <- Gen.choose(0, 5)
  } yield v match {
    case 0 => s"SELECT value FROM $m WHERE device != 'a;b'"
    case 1 => s"SELECT count(value) FROM /t;${m.take(1)}[0-9]/"
    case 2 => s"SELECT sum(value)/2 + mean(value)/4 FROM $m"
    case 3 => s"SELECT value FROM $m WHERE device =~ /x;y/ AND value > 1"
    case 4 => s"""SELECT value FROM "we;ird" WHERE device != 'q'"""
    case 5 => "SHOW MEASUREMENTS"
  }

  property("splitStatements: top-level-only ';' split inverts joining exactly") =
    forAll(Gen.nonEmptyListOf(trickyStmtGen), Gen.chooseNum(0, 2)) { (stmts, pad) =>
      // empty fragments (trailing ';', ';;') must drop, whitespace trims
      val joined = stmts.mkString(" ; ") + (";" * pad)
      graft.influxql.InfluxQL.splitStatements(joined) == stmts
    }

  property("BMP codec roundtrip: arbitrary solid-color images decode to the exact mean") =
    // dims >= the 4x4 pool grid: smaller images leave empty thumbnail
    // cells (correctly 0), which the all-cells assertion below would flag
    forAll(Gen.chooseNum(4, 40), Gen.chooseNum(4, 40),
      Gen.chooseNum(0, 255), Gen.chooseNum(0, 255), Gen.chooseNum(0, 255)) { (w, h, r, g, b) =>
      val info = graft.operators.BmpCodec.decode(
        graft.operators.BmpCodec.synth(w, h, (_, _) => (r, g, b)))
      info.width == w && info.height == h &&
        info.meanLum == (r + g + b).toDouble / 3.0 &&
        info.thumb.forall(_ == (r + g + b).toLong)
    }
}
