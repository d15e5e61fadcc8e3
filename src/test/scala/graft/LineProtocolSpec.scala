package graft

import graft.influxql.{InfluxQL, LineProtocol, LpPoint, Subscriptions}

class LineProtocolSpec extends SparkSuite {
  import spark.implicits._

  private def one(line: String): LpPoint = {
    val r = LineProtocol.parseLine(line)
    assert(r.isRight, s"$line -> $r")
    assert(r.toOption.get.size == 1, s"$line -> $r")
    r.toOption.get.head
  }
  private def bad(line: String): String = {
    val r = LineProtocol.parseLine(line)
    assert(r.isLeft, s"$line parsed: $r")
    r.swap.toOption.get
  }

  test("parseLine: the 1.x grammar — types, tags, timestamps, multi-field") {
    assert(one("cpu value=0.64") ==
      LpPoint("cpu", Map.empty, "value", Some(0.64), None, None, None))
    assert(one("cpu,host=h1,region=eu value=2 1556813561098000000") ==
      LpPoint("cpu", Map("host" -> "h1", "region" -> "eu"), "value",
        Some(2.0), None, None, Some(1556813561098000000L)))
    // integer suffix, booleans in every 1.x spelling, strings
    assert(one("m v=42i").num.contains(42.0))
    for (t <- Seq("t", "T", "true", "True", "TRUE"))
      assert(one(s"m v=$t").bool.contains(true), t)
    for (f <- Seq("f", "F", "false", "False", "FALSE"))
      assert(one(s"m v=$f").bool.contains(false), f)
    assert(one("""m v="hello world"""").str.contains("hello world"))
    assert(one("m v=-1.5e3").num.contains(-1500.0))
    // multi-field explodes to one row per field, sharing tags + ts
    val multi = LineProtocol.parseLine("m,host=a used=1,free=2i,up=t 99").toOption.get
    assert(multi.map(p => (p.field, p.num, p.bool)) == Seq(
      ("used", Some(1.0), None), ("free", Some(2.0), None), ("up", None, Some(true))))
    assert(multi.forall(p => p.tags == Map("host" -> "a") && p.ts_ns.contains(99L)))
    // comments and blank lines vanish
    assert(LineProtocol.parseLine("# a comment").toOption.get.isEmpty)
    assert(LineProtocol.parseLine("").toOption.get.isEmpty)
  }

  test("parseLine: escaping — measurements, tag keys/values, field keys, strings") {
    assert(one("""we\,ather temp=1""").measurement == "we,ather")
    assert(one("""we\ ather temp=1""").measurement == "we ather")
    val p = one("""m,ta\=g=va\,l\ ue fi\=eld=3""")
    assert(p.tags == Map("ta=g" -> "va,l ue") && p.field == "fi=eld")
    assert(one("""m v="say \"hi\" \\ there"""").str.contains("""say "hi" \ there"""))
    // a backslash before a non-delimiter stays literal (1.x rule)
    assert(one("""m,t=a\b v=1""").tags == Map("t" -> "a\\b"))
  }

  test("parseLine: malformed lines answer errors, never throw") {
    assert(bad(" v=1").contains("empty measurement"))
    assert(bad("m").contains("space before fields"))
    assert(bad("m,=x v=1").contains("empty tag key"))
    assert(bad("m,t v=1").contains("needs =value"))
    assert(bad("m,t=1,t=2 v=1").contains("duplicate tag"))
    assert(bad("m v=1,v=2").contains("duplicate field"))
    assert(bad("m v=").contains("no value"))
    assert(bad("m v=abc").contains("bad value"))
    assert(bad("m v=12xi").contains("bad integer"))
    assert(bad("""m v="open""").contains("unterminated"))
    assert(bad("m v=1 notatime").contains("bad timestamp"))
    // int64 beyond ±2^53 would silently round in the double value slot —
    // loud error instead (InfluxDB stores int64 exactly; this engine
    // refuses what it cannot hold)
    assert(bad("m v=9007199254740993i").contains("2^53"))
    assert(bad("m v=-9007199254740993i").contains("2^53"))
    assert(one("m v=9007199254740992i").num.contains(9007199254740992.0))
    assert(one("m v=-9007199254740992i").num.contains(-9007199254740992.0))
  }

  test("render -> parseLine roundtrips under seeded randomized escaping") {
    val rnd = new scala.util.Random(4242)
    // identifier alphabet includes every escapable delimiter; no trailing
    // backslash (the protocol's own ambiguity, preserved as-is)
    def ident(): String = {
      val cs = "ab9,= _" // comma, equals, space all require escapes
      val s = (0 until 1 + rnd.nextInt(6)).map(_ => cs(rnd.nextInt(cs.length))).mkString
      if (s.endsWith("\\")) s + "x" else s
    }
    def strVal(): String = {
      val cs = "a\"\\ ,=" // quote and backslash exercise the string escapes
      (0 until rnd.nextInt(8)).map(_ => cs(rnd.nextInt(cs.length))).mkString
    }
    for (it <- 0 until 300) {
      val tags = (0 until rnd.nextInt(3)).map(i => (s"${ident()}$i", ident())).toMap
      val p0 = LpPoint(ident(), tags, ident(),
        None, None, None, if (rnd.nextBoolean()) Some(rnd.nextLong()) else None)
      val p = rnd.nextInt(3) match {
        case 0 => p0.copy(num = Some(math.floor(rnd.nextDouble() * 1e6) / 1e3))
        case 1 => p0.copy(bool = Some(rnd.nextBoolean()))
        case _ => p0.copy(str = Some(strVal()))
      }
      val line = LineProtocol.render(p)
      val back = LineProtocol.parseLine(line)
      assert(back == Right(Seq(p)), s"iter $it: $p -> $line -> $back")
    }
  }

  test("parseLine never throws: 500 seeded random byte strings answer Either") {
    val rnd = new scala.util.Random(1313L)
    val alphabet = "abc,= \\\"0129i.#\t" + "é世"
    for (it <- 0 until 500) {
      val line = (0 until rnd.nextInt(40))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      // the contract is the Either, never an exception
      val r = try LineProtocol.parseLine(line) catch {
        case e: Throwable => fail(s"iter $it threw on '$line': $e")
      }
      // and whatever parses must re-render into something parseable
      r.foreach(_.foreach { p =>
        assert(LineProtocol.parseLine(LineProtocol.render(p)).isRight,
          s"iter $it rendered unparseable: $p")
      })
    }
  }

  test("distributed parse + errors partition the lines; narrow layout queries") {
    val lines = Seq(
      "temp,device=d1 value=21.5 5000000000",
      "temp,device=d2 value=23.0 6000000000",
      "hum,device=d1 value=40 7000000000",
      "note,device=d1 value=\"text only\" 8000000000", // string: not narrow
      "temp value=9 9000000000",                        // no device tag: not narrow
      "broken line here").toDS()
    assert(LineProtocol.parse(lines).count() == 5)
    val errs = LineProtocol.errors(lines).collect()
    assert(errs.map(_.line).toSeq == Seq("broken line here"), errs.toSeq.toString)
    val narrow = LineProtocol.narrowPoints(lines)
    assert(narrow.as[(String, String, Long, Double)].collect().toSet == Set(
      ("d1", "temp", 5000000L, 21.5), ("d2", "temp", 6000000L, 23.0),
      ("d1", "hum", 7000000L, 40.0)))
    // a REAL nanosecond epoch is above 2^53: the µs conversion must be
    // integer division, never the IEEE double `/` (256 ns ulp up there)
    val big = LineProtocol.narrowPoints(
      Seq("temp,device=d9 value=1 1700000000123456789").toDS())
    assert(big.select("ts_us").as[Long].collect().toSeq == Seq(1700000000123456L))
    // the InfluxQL dialect plans straight over the parsed narrow layout
    assert(InfluxQL.run(narrow, "SELECT count(value) FROM temp")
      .as[Long].collect().toSeq == Seq(2L))
    // named fields other than `value` must not COLLAPSE into one stream
    // (the narrow layout cannot tell used from free) — they surface as
    // dropped instead, every parsed point in exactly one bucket
    val named = Seq("mm,device=d used=1,free=2,value=3 99000").toDS()
    assert(LineProtocol.narrowPoints(named)
      .as[(String, String, Long, Double)].collect().toSeq ==
      Seq(("d", "mm", 99L, 3.0)), "only the value field lands")
    assert(LineProtocol.narrowDropped(named, serverTsAssigned = true)
      .collect().map(_.field).toSet == Set("used", "free"))
    // precision scaling (/write's `precision` param) is exact integer
    // math in every unit — no IEEE division anywhere near an epoch
    def us(line: String, unitNs: Long): Long =
      LineProtocol.narrowPoints(Seq(line).toDS(), tsUnitNs = unitNs)
        .select("ts_us").as[Long].collect().head
    assert(us("m,device=d value=1 1700000000123456789", 1L) == 1700000000123456L)
    assert(us("m,device=d value=1 1700000000123456", 1000L) == 1700000000123456L)
    assert(us("m,device=d value=1 1700000000123", 1000000L) == 1700000000123000L)
    assert(us("m,device=d value=1 1700000000", 1000000000L) == 1700000000000000L)
    assert(us("m,device=d value=1 28333333", 60L * 1000000000L) == 1699999980000000L)
    // the subscription fan-out's rendering parses back to the same point
    val rt = LineProtocol.parseLine(
      Subscriptions.lineProtocol("temp", "d1", 5000000L, 21.5)).toOption.get
    assert(rt == Seq(LpPoint("temp", Map("device" -> "d1"), "value",
      Some(21.5), None, None, Some(5000000000L))))
  }

  test("catalog writeLineProtocol: InfluxDB's /write face end to end") {
    val root = java.nio.file.Files.createTempDirectory("lp_write").toString
    val cat = new graft.influxql.InfluxCatalog(spark, root, defaultDb = "tele")
    cat.run("CREATE DATABASE tele")
    val res = cat.writeLineProtocol("tele", Seq(
      "temp,device=d1 value=20 1000000000",
      "temp,device=d1 value=22 2000000000",
      "note,device=d1 value=\"str\" 3000000000", // narrow can't hold strings
      "garbage!").toDS())
    assert(res.version == 0L && res.errors.count() == 1)
    // the string-field point is surfaced, not lost invisibly
    assert(res.dropped.collect().map(_.field).toSeq == Seq("value") &&
      res.dropped.collect().head.str.contains("str"))
    assert(cat.run("SELECT mean(value) FROM temp").as[Double].collect().toSeq == Seq(21.0))
    // a timestamp-less point gets write-receipt server time (InfluxDB's
    // rule), landing in the table instead of vanishing
    val before = System.currentTimeMillis() * 1000L
    val res2 = cat.writeLineProtocol("tele", Seq("temp,device=d7 value=5").toDS())
    val after = System.currentTimeMillis() * 1000L
    assert(res2.dropped.count() == 0)
    val ts = cat.run("SELECT value FROM temp WHERE device = 'd7'")
      .select("time").as[Long].collect()
    assert(ts.length == 1 && ts.head >= before && ts.head <= after)
    assert(intercept[IllegalArgumentException](
      cat.writeLineProtocol("ghost", Seq("m v=1").toDS()))
      .getMessage.contains("database not found"))
  }

  test("coarse-precision timestamps outside the scalable window error, never wrap") {
    import graft.influxql.LineProtocol
    // precision=h scales ts by 3.6e12/1e3 µs-per-unit: a raw wire ts that
    // parses as a Long but overflows the scaling must land in errors()
    // (the caller's 400 partial write), never commit a wrapped epoch
    val hourNs = 3600L * 1000000000L
    val lim = LineProtocol.maxRawTs(hourNs) // = Long.Max / 3.6e9
    assert(lim == Long.MaxValue / (hourNs / 1000L))
    val lines = Seq(
      s"m,device=a value=1 ${lim}",       // at the edge: representable
      s"m,device=a value=2 ${lim + 1}",   // one past: error
      s"m,device=a value=3 ${-lim - 1}",  // negative overflow too
      "m,device=a value=4 7").toDS()
    val pts = LineProtocol.narrowPoints(lines, tsUnitNs = hourNs)
      .select("ts_us").as[Long].collect().toSet
    assert(pts == Set(lim * (hourNs / 1000L), 7L * (hourNs / 1000L)),
      s"only in-range points scale: $pts")
    val errs = LineProtocol.errors(lines, tsUnitNs = hourNs).collect()
    assert(errs.length == 2 && errs.forall(_.error.contains("out of range")),
      errs.mkString("; "))
    // the exactly-once partition holds: offenders are in errors, NOT in
    // dropped, and ns precision (the default) never ranges out
    assert(LineProtocol.narrowDropped(lines, serverTsAssigned = true,
      tsUnitNs = hourNs).count() == 0)
    assert(LineProtocol.errors(lines).count() == 0, "ns precision: all parse")

    // end to end through the catalog: 400 partial write, good lines land
    val root = java.nio.file.Files.createTempDirectory("lp_range").toString
    val cat = new graft.influxql.InfluxCatalog(spark, root, defaultDb = "tele")
    cat.run("CREATE DATABASE tele")
    val res = cat.writeLineProtocol("tele",
      Seq("ok,device=a value=1 2", s"bad,device=a value=2 ${lim + 1}").toDS(),
      tsUnitNs = hourNs)
    assert(res.errors.count() == 1 &&
      res.errors.head().error.contains("out of range"))
    assert(cat.run("SELECT value FROM ok").count() == 1)
    assert(cat.run("SELECT value FROM bad").collect().isEmpty,
      "the overflowing point must not have committed garbage")
  }

  test("field type conflicts: first write fixes the type, a flip is a partial-write error") {
    import graft.influxql.LineProtocol
    val root = java.nio.file.Files.createTempDirectory("lp_ftype").toString
    val cat = new graft.influxql.InfluxCatalog(spark, root, defaultDb = "tele")
    cat.run("CREATE DATABASE tele")
    // write 1: float fixes (temp, value) = float
    val r1 = cat.writeLineProtocol("tele",
      Seq("temp,device=d1 value=20.5 1000").toDS())
    assert(r1.errors.count() == 0 && r1.dropped.count() == 0)
    // write 2: a bool on the SAME series conflicts — errors, not committed
    val r2 = cat.writeLineProtocol("tele",
      Seq("temp,device=d1 value=t 2000").toDS())
    val e2 = r2.errors.collect()
    assert(e2.length == 1 && e2.head.error.startsWith("field type conflict"),
      e2.mkString("; "))
    assert(e2.head.error.contains("is type boolean") &&
      e2.head.error.contains("already exists as type float"), e2.head.error)
    assert(r2.dropped.count() == 0, "a conflict is an error, never a silent drop")
    assert(cat.run("SELECT count(value) FROM temp").as[Long].collect().toSeq
      == Seq(1L), "the flipped point must not commit")
    // the registry persists: a fresh catalog on the same root still rejects
    val cat2 = new graft.influxql.InfluxCatalog(spark, root, defaultDb = "tele")
    assert(cat2.writeLineProtocol("tele",
      Seq("temp,device=d2 value=f 9000").toDS()).errors.count() == 1)
    // symmetric: boolean-first fixes boolean, float then conflicts
    assert(cat.writeLineProtocol("tele",
      Seq("door,device=d1 value=t 1000").toDS()).errors.count() == 0)
    val r3 = cat.writeLineProtocol("tele",
      Seq("door,device=d1 value=1.0 2000").toDS())
    assert(r3.errors.head().error.contains("is type float, already exists as type boolean"))
    // intra-batch: the FIRST line of one request fixes the type, the flip
    // later in the same request errors, the good line commits
    val r4 = cat.writeLineProtocol("tele", Seq(
      "hum,device=d1 value=0.4 1000",
      "hum,device=d2 value=true 2000").toDS())
    assert(r4.errors.count() == 1 &&
      r4.errors.head().error.startsWith("field type conflict"))
    assert(cat.run("SELECT count(value) FROM hum").as[Long].collect().toSeq == Seq(1L))
    // int literals fold into float (one double storage class — the ±2^53
    // guard owns exactness): 42i then 1.5 is NOT a conflict here
    assert(cat.writeLineProtocol("tele",
      Seq("rpm,device=d1 value=42i 1000").toDS()).errors.count() == 0)
    assert(cat.writeLineProtocol("tele",
      Seq("rpm,device=d1 value=1.5 2000").toDS()).errors.count() == 0)
    // a string-field first write registers string (InfluxDB's schema rule)
    // even though the narrow layout routes the point to dropped — a later
    // float write on that field conflicts exactly like upstream
    assert(cat.writeLineProtocol("tele",
      Seq("""note,device=d1 value="hi" 1000""").toDS()).dropped.count() == 1)
    assert(cat.writeLineProtocol("tele",
      Seq("note,device=d1 value=2.0 2000").toDS())
      .errors.head().error.contains("already exists as type string"))
    // DROP MEASUREMENT releases the type: a re-created measurement re-fixes
    cat.run("DROP MEASUREMENT door")
    assert(cat.writeLineProtocol("tele",
      Seq("door,device=d1 value=3.5 5000").toDS()).errors.count() == 0)
    assert(cat.run("SELECT value FROM door").select("value")
      .as[Double].collect().toSeq == Seq(3.5))
    // a conflicted LINE commits nothing, even its conforming fields
    val r5 = cat.writeLineProtocol("tele", Seq(
      "hum,device=d3 other=1.0,value=t 3000").toDS())
    assert(r5.errors.count() == 1)
    assert(cat.run("SELECT count(value) FROM hum").as[Long].collect().toSeq
      == Seq(1L), "no point of a conflicted line may land")
    // DROP DATABASE cascades the registry: a re-created db starts typeless
    cat.run("DROP DATABASE tele")
    cat.run("CREATE DATABASE tele")
    assert(cat.writeLineProtocol("tele",
      Seq("temp,device=d1 value=t 1000").toDS()).errors.count() == 0)
  }
}
