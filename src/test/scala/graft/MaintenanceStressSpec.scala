package graft

import scala.jdk.CollectionConverters._

import graft.storage.TxLogTable

/** The maintenance tick vs the write path, all at once: ServiceMain's
  * daemon runs retention + compaction + (opt-in) vacuum concurrently with
  * streaming appends and HTTP /write commits on the SAME points table.
  * TxLogTableSpec pins each pairwise conflict; this drill runs all four
  * against one table under load and asserts the whole-system invariants:
  *
  *   - no lost commits: every fresh row of every append survives every
  *     interleaving of expiry/compaction/vacuum (optimistic-concurrency
  *     losers retry, winners never clobber),
  *   - snapshot isolation: a reader pinned to a version answers the same
  *     result twice, whatever commits land in between,
  *   - a contiguous version chain: versions are dense 0..latest with a
  *     committed entry each — the EEXIST hard-link protocol admits no gap
  *     and no silent replacement,
  *   - liveness: sweeps that lose their commit race (CommitConflict after
  *     retries) simply wait for the next tick, exactly like the service's
  *     own sweep() wrapper — never an error surfaced to writers.
  */
class MaintenanceStressSpec extends SparkSuite {
  import spark.implicits._

  test("appends + compaction + retention + vacuum race one table without losing commits") {
    val root = java.nio.file.Files.createTempDirectory("maint_stress").toString
    val cat = new graft.influxql.InfluxCatalog(spark, root, defaultDb = "stress")
    cat.run("CREATE DATABASE stress")
    // a FINITE default policy so the retention sweep has real work
    cat.run("CREATE RETENTION POLICY keep ON stress DURATION 1h REPLICATION 1 DEFAULT")
    val nowUs = System.currentTimeMillis() * 1000L
    val oldUs = nowUs - 3L * 3600 * 1000000L // 3 h ago: expired by the 1 h policy
    val table = cat.pointsTable("stress")
    table.append(Seq(("seed", "m", nowUs, 0.0))
      .toDF("device", "transducer", "ts_us", "value"))

    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    def thread(name: String)(body: => Unit): Thread = {
      val t = new Thread(() => try body catch { case e: Throwable => errors.add(e) }, name)
      t.start(); t
    }

    val nWriters = 2
    val nAppends = 12
    val writers = (0 until nWriters).map { w =>
      thread(s"stress-writer-$w") {
        for (i <- 0 until nAppends) {
          // each append carries one fresh row (must survive) and one
          // already-expired row (must age out) — the retention sweep's
          // straddling-directory rewrite path runs against live appends
          val batch = Seq(
            (s"w$w-$i", "m", nowUs + (w * 1000 + i).toLong, 1.0),
            (s"old$w-$i", "m", oldUs + i, 1.0))
            .toDF("device", "transducer", "ts_us", "value")
          TxLogTable.retryOnConflict(maxAttempts = 100) { table.append(batch) }
        }
      }
    }
    val maintenance = thread("stress-maintenance") {
      // a sweep losing its commit race after retries waits for the next
      // tick — the service's own semantics (ServiceMain.start's sweep())
      def tick(body: => Unit): Unit =
        try body catch { case _: TxLogTable.CommitConflict => () }
      while (!stop.get()) {
        tick(ServiceMain.retentionSweep(spark, root))
        tick(ServiceMain.compactionSweep(spark, root, maxBytes = 1L << 20))
        // 60 s grace: an in-flight writer's fresh pre-commit dir must
        // never be eligible — the documented vacuum rule under load
        tick(ServiceMain.vacuumSweep(spark, root, graceMs = 60000L))
      }
    }
    val reader = thread("stress-reader") {
      while (!stop.get()) {
        table.version.foreach { v =>
          val a = table.readVersion(v).count()
          val b = table.readVersion(v).count()
          assert(a == b, s"snapshot isolation broke: version $v answered $a then $b")
        }
      }
    }

    writers.foreach(_.join(300000))
    stop.set(true)
    maintenance.join(300000)
    reader.join(300000)
    assert(errors.isEmpty,
      errors.asScala.map(e => s"${e.getClass.getSimpleName}: ${e.getMessage}").mkString("; "))

    // one more deterministic full pass, now that no writer is in flight
    ServiceMain.retentionSweep(spark, root)
    ServiceMain.compactionSweep(spark, root, maxBytes = 1L << 20)
    ServiceMain.vacuumSweep(spark, root, graceMs = 0L)

    // no lost commits: every fresh row of every append survived...
    val devices = table.read().select("device").as[String].collect().toSet
    val expected = (for (w <- 0 until nWriters; i <- 0 until nAppends)
      yield s"w$w-$i").toSet + "seed"
    assert(devices == expected,
      s"missing: ${expected -- devices}; unexpected: ${devices -- expected}")
    // ...and every expired row aged out (the sweep really ran)
    assert(!devices.exists(_.startsWith("old")), devices.filter(_.startsWith("old")))

    // contiguous version chain: dense 0..latest, each entry readable
    val latest = table.version.get
    assert(latest >= (nWriters * nAppends).toLong,
      s"at least the ${nWriters * nAppends + 1} appends must have committed, latest=$latest")
    val ops = (0L to latest).map(table.opOf) // throws on any gap
    assert(ops.count(_ == "append") == nWriters * nAppends + 1,
      s"every append commit is in the chain: $ops")
    assert(ops.contains("expire"), "the retention sweep committed under load")

    // the vacuumed table still answers exactly from its latest snapshot
    assert(table.read().count() == expected.size.toLong)
  }
}
