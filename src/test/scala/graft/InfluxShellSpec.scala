package graft

/** The shell's statement loop body ([[InfluxShell.process]]/render),
  * driven without a terminal: result rendering, error containment, and
  * credentialed enforcement.
  */
class InfluxShellSpec extends SparkSuite {
  import spark.implicits._

  test("process renders results, contains errors, and enforces credentials") {
    val root = java.nio.file.Files.createTempDirectory("shell").toString
    val cat = new graft.influxql.InfluxCatalog(spark, root, defaultDb = "db")
    cat.run("CREATE DATABASE db")
    cat.writePoints("db",
      Seq(("a", "temp", 10L, 1.5), ("b", "temp", 20L, 2.5), ("a", "hum", 30L, 3.0))
        .toDF("device", "transducer", "ts_us", "value"))

    // a SELECT renders as an aligned table with header + rule + count
    val sel = InfluxShell.process(cat, "SELECT sum(value) FROM temp")
    assert(sel.contains("sum"), s"header missing in:\n$sel")
    assert(sel.contains("4.0"), s"value missing in:\n$sel")
    assert(sel.endsWith("(1 row)"), s"row count missing in:\n$sel")

    // SHOW statements flow through the same path
    val meas = InfluxShell.process(cat, "SHOW MEASUREMENTS")
    assert(meas.contains("temp") && meas.contains("hum"))
    assert(meas.endsWith("(2 rows)"))

    // nulls print empty, like the influx CLI
    val fill = InfluxShell.process(cat,
      "SELECT mean(value) AS m FROM temp WHERE time >= 0 AND time < 40 GROUP BY time(10u)")
    assert(fill.contains("m"), fill)

    // errors are contained: the loop must survive a typo
    val err = InfluxShell.process(cat, "SELEKT broken")
    assert(err.startsWith("ERR:"), err)
    val err2 = InfluxShell.process(cat, "SELECT nosuch FROM temp")
    assert(err2.startsWith("ERR:"), err2)

    // truncation note past the row cap
    val big = (0 until 150).map(i => ("d", "m", i.toLong, i.toDouble))
      .toDF("device", "transducer", "ts_us", "value")
    cat.writePoints("db", big)
    val raw = InfluxShell.process(cat, "SELECT value FROM m")
    assert(raw.contains("showing first 100 rows"), raw.takeRight(120))

    // credentialed mode goes through runAs: denial is an ERR, not a crash
    cat.run("CREATE USER reader WITH PASSWORD 'pw'")
    cat.run("GRANT READ ON db TO reader")
    val ok = InfluxShell.process(cat, "SELECT sum(value) FROM temp",
      creds = Some(("reader", "pw")))
    assert(ok.endsWith("(1 row)"), ok)
    val deny = InfluxShell.process(cat, "DROP MEASUREMENT temp",
      creds = Some(("reader", "pw")))
    assert(deny.startsWith("ERR:") && deny.contains("WRITE"), deny)
    val badpw = InfluxShell.process(cat, "SELECT sum(value) FROM temp",
      creds = Some(("reader", "nope")))
    assert(badpw.startsWith("ERR:") && badpw.contains("authentication"), badpw)

    // an uncredentialed statement runs under the query registry (execute):
    // nothing should linger in SHOW QUERIES afterwards
    assert(cat.run("SHOW QUERIES").collect().isEmpty)

    // multi-statement input (`a; b`) runs every statement and prints the
    // LAST result — the InfluxDB /query contract through the shell
    val multi = InfluxShell.process(cat,
      "CREATE DATABASE scratch; SELECT count(value) FROM temp")
    assert(multi.endsWith("(1 row)") && multi.contains("2"), multi)
    assert(cat.run("SHOW DATABASES").as[String].collect().toSet
      .contains("scratch"), "first statement of the pair really ran")
    // a ';' inside a string literal stays one statement
    val strSemi = InfluxShell.process(cat,
      "SELECT count(value) FROM temp WHERE device != 'x;y'")
    assert(strSemi.endsWith("(1 row)"), strSemi)
  }

  test("backup/restore meta-commands: round-trip, admin-gated under credentials") {
    val root = java.nio.file.Files.createTempDirectory("shell_bak").toString
    val cat = new graft.influxql.InfluxCatalog(spark, root, defaultDb = "db")
    cat.run("CREATE DATABASE db")
    cat.writePoints("db", Seq(("a", "temp", 10L, 1.5), ("b", "temp", 20L, 2.5))
      .toDF("device", "transducer", "ts_us", "value"))
    val bak = java.nio.file.Files.createTempDirectory("shell_bakset").toString + "/set"
    assert(InfluxShell.process(cat, s"backup db $bak").startsWith("backed up"))
    // restore into a fresh root through a second shell
    val root2 = java.nio.file.Files.createTempDirectory("shell_bak2").toString
    val cat2 = new graft.influxql.InfluxCatalog(spark, root2, defaultDb = "db")
    assert(InfluxShell.process(cat2, s"restore $bak") == "restored database db")
    assert(InfluxShell.process(cat2, "SELECT sum(value) FROM temp").contains("4.0"))
    // restoring over the live db is a contained ERR, not a crash
    assert(InfluxShell.process(cat2, s"restore $bak").startsWith("ERR:"))
    // under credentials both demand ADMIN (a whole-db export outranks READ)
    cat.run("CREATE USER reader WITH PASSWORD 'pw'")
    cat.run("GRANT READ ON db TO reader")
    val deny = InfluxShell.process(cat, s"backup db ${bak}2",
      creds = Some(("reader", "pw")))
    assert(deny.startsWith("ERR:") && deny.toLowerCase.contains("admin"), deny)
    cat.run("CREATE USER boss WITH PASSWORD 'bpw' WITH ALL PRIVILEGES")
    assert(InfluxShell.process(cat, s"backup db ${bak}2",
      creds = Some(("boss", "bpw"))).startsWith("backed up"))
  }

  test("render consumes at most cap+1 rows — a big result never buffers on the driver") {
    val acc = spark.sparkContext.longAccumulator("render_consumed")
    val big = spark.range(0, 100000, 1, 8).map { x => acc.add(1); x }.toDF("v")
    val out = InfluxShell.render(big, max = 100)
    assert(out.contains("showing first 100 rows"), out.takeRight(120))
    // limit(cap+1) short-circuits each partition's scan: executor-side row
    // production is bounded by partitions * (cap+1) even across retries,
    // nowhere near the 100k rows a collect-then-trim would materialize
    assert(acc.value <= 8L * 101, s"render consumed ${acc.value} rows")
  }

  test("shell statements stay visible to SHOW QUERIES while their page streams") {
    val root = java.nio.file.Files.createTempDirectory("shellstream").toString
    val cat = new graft.influxql.InfluxCatalog(spark, root, defaultDb = "db")
    cat.run("CREATE DATABASE db")
    cat.writePoints("db", (0 until 150).map(i => ("d", "m", i.toLong, i.toDouble))
      .toDF("device", "transducer", "ts_us", "value"))
    // the registry window of the LAST statement spans consumption: SHOW
    // QUERIES (from the same thread — the registry is a map, not the job
    // group) lists it mid-stream, and the earlier statement's side effect
    // already landed
    val (listed, dbs, consumed) =
      cat.executeStreamed("CREATE DATABASE scratch3; SELECT value FROM m") { df =>
        val l = cat.run("SHOW QUERIES").select("query").as[String].collect().toSeq
        val d = cat.run("SHOW DATABASES").as[String].collect().toSet
        val it = df.limit(101).toLocalIterator()
        var n = 0
        while (it.hasNext && n <= 100) { it.next(); n += 1 }
        (l, d, n)
      }
    assert(listed == Seq("SELECT value FROM m"), listed)
    assert(dbs.contains("scratch3"), "init statement's side effect must precede the last")
    assert(consumed == 101, s"iterator page: $consumed")
    assert(cat.run("SHOW QUERIES").collect().isEmpty, "window must close on exit")
  }
}
