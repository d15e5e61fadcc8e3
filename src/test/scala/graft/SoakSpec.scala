package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.streaming.{InProcessTransport, MqttBus}

/** Sustained-ingest soak: the composed service ([[ServiceMain.start]] with
  * the continuous ProcessingTime trigger — ingest, CDC, auto-create,
  * status publish, subscription fan-out, a continuous query, AND the live
  * maintenance timer at a 2 s tick) under a steady publisher for
  * `SPARK_GRAFT_SOAK_S` seconds (default 20; raise for a standalone
  * drill). What a long-running deployment needs, asserted:
  *
  *   - exactly-once ingest under sustained load: every published
  *     registered point lands exactly once (fenced appends, no drops, no
  *     double-applies across dozens of micro-batches);
  *   - bounded streaming state: event time advances with the publisher,
  *     so the watermark closes CQ buckets continuously and the state
  *     operators' row totals stay series×open-windows-bounded instead of
  *     growing with runtime;
  *   - live compaction: the maintenance timer's compaction sweep folds
  *     the per-batch small appends, so shard count stays far below
  *     commit count;
  *   - bounded trigger latency: p99 micro-batch duration stays finite
  *     and sane on this box;
  *   - heap stability: used heap after the soak stays within a generous
  *     band of the mid-soak sample (the structural state bound above is
  *     the real leak check; the heap band catches gross regressions).
  *
  * The observed numbers append to PROGRESS.jsonl as a `soak` event, the
  * same evidence trail ScaleBench uses.
  */
class SoakSpec extends SparkSuite {
  import spark.implicits._

  private def usedHeapMb(): Long = {
    System.gc(); Thread.sleep(300)
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  test("sustained ingest soak: exactly-once, bounded state, live compaction, sane p99") {
    MqttBus.clear()
    val dir = Files.createTempDirectory("soak").toString
    val soakS = sys.env.getOrElse("SPARK_GRAFT_SOAK_S", "20").toInt
    val conf = Map(
      "service_id" -> "soak1",
      "data_dir" -> dir,
      "influx_database" -> "oc",
      "cq_lateness" -> "0 seconds",
      "retention_check_interval_ms" -> "2000", // maintenance tick LIVE
      // the UDP leg: a datagram front into its OWN database (so the MQTT
      // exactly-once count below stays exact), ephemeral port
      "udp_port" -> "0",
      "udp_database" -> "udpsoak",
      "udp_batch_size" -> "500",
      "udp_batch_timeout_ms" -> "100")
    // control plane before start: register the device, a CQ, a subscription
    val cat = new graft.influxql.InfluxCatalog(spark, dir, "oc")
    cat.run("CREATE DATABASE oc")
    cat.run("CREATE DATABASE udpsoak")
    // fill(linear): the CQ leg runs the RETROACTIVE fill machinery live —
    // d2 below reports sporadically, so its buckets commit as null edges
    // and interpolate when the next report closes them, every few batches,
    // for the whole soak (the r14 weak's motivating workload)
    cat.run("CREATE CONTINUOUS QUERY down ON oc BEGIN " +
      "SELECT mean(num) AS m, count(num) AS c INTO cnt FROM temp " +
      "GROUP BY time(5s), device_id FILL(linear) END")
    cat.run("CREATE SUBSCRIPTION fwd ON oc.autogen DESTINATIONS ALL 'soak/dest'")
    MqttBus.publish(ServiceMain.eventsTopic("soak1"),
      """{"action":"new","thing":{"id":"d1","transducers":[{"name":"Temp"}]}}""")
    MqttBus.publish(ServiceMain.eventsTopic("soak1"),
      """{"action":"new","thing":{"id":"d2","transducers":[{"name":"Temp"}]}}""")
    // bootstrap run: the CQ/subscription legs key on the registry AS OF
    // stream start, so the CDC registration must commit before the soak
    // run begins — the same register-then-restart sequence a deployment
    // (and ServiceMainSpec's phases) goes through
    val boot = ServiceMain.start(spark, conf, new InProcessTransport, rest = None,
      trigger = Trigger.AvailableNow())
    try boot.queries.foreach(q =>
      assert(q.awaitTermination(120000), s"bootstrap drain: ${q.id}"))
    finally ServiceMain.stop(boot)
    assert(graft.streaming.RegistryMaintenance
      .activeDevices(spark, s"$dir/registry").count() == 2, "d1+d2 must register")

    val triggerMs = new ConcurrentLinkedQueue[(Long, Long)]() // (wall ms, duration ms)
    val stateRows = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        Option(e.progress.durationMs.get("triggerExecution"))
          .foreach(d => triggerMs.add((System.currentTimeMillis(), d.longValue())))
        val rows = e.progress.stateOperators.map(_.numRowsTotal).sum
        stateRows.updateAndGet(m => math.max(m, rows)); ()
      }
    }
    spark.streams.addListener(listener)
    val h = ServiceMain.start(spark, conf, new InProcessTransport, rest = None,
      trigger = Trigger.ProcessingTime(0))
    val udp = h.udp.get
    val udpSock = new java.net.DatagramSocket()
    def udpSend(line: String): Unit = {
      val b = line.getBytes("UTF-8")
      udpSock.send(new java.net.DatagramPacket(b, b.length,
        java.net.InetAddress.getLoopbackAddress, udp.boundPort))
    }
    var published = 0L
    var udpSent = 0L
    var heapMidMb = 0L
    val t0 = System.nanoTime()
    try {
      // steady publisher: event time advances 1 s per message, so the
      // watermark closes a 5 s CQ bucket every 5 messages and streaming
      // state cannot accumulate with runtime
      val baseUs = 1704067200000000L
      val endAt = t0 + soakS.toLong * 1000000000L
      while (System.nanoTime() < endAt) {
        MqttBus.publish("openchirp/device/d1/Temp",
          s"${(published % 100)}.5".getBytes("UTF-8"),
          baseUs + published * 1000000L)
        published += 1
        // d2 reports sporadically (~1 in 23): its 5 s CQ buckets open as
        // null edges and retro-interpolate a few batches later — the
        // fill(linear) open-gap frontier stays non-empty all soak long
        if (published % 23 == 0) {
          MqttBus.publish("openchirp/device/d2/Temp",
            s"${(published % 50)}.25".getBytes("UTF-8"),
            baseUs + published * 1000000L)
          published += 1
        }
        // the UDP leg runs for the whole soak alongside the MQTT stream:
        // line-protocol datagrams into their own database; conservation
        // (sent == written + dropped == committed) asserted at drain
        if (published % 9 == 0) {
          udpSend(s"usoak,device=u${published % 4} value=${published % 100}.5 " +
            s"${(baseUs + published * 1000000L) * 1000L}")
          udpSent += 1
        }
        // a genuine mid-soak heap sample (half the wall), not an early one:
        // sampling at a fixed message count lands seconds into a long soak,
        // where the band compares steady state against warm-up
        if (heapMidMb == 0 &&
            System.nanoTime() >= t0 + soakS.toLong * 500000000L)
          heapMidMb = usedHeapMb()
        Thread.sleep(5)
      }
      if (heapMidMb == 0) heapMidMb = usedHeapMb()
      // drive to a commit-count floor with a generous deadline: the fixed
      // wall-clock phase above pins throughput/latency shape; this phase
      // makes the "micro-batched, not one giant drain" assert
      // load-INDEPENDENT — r17 showed a fixed 20 s wall yields 5 commits on
      // one loaded box and 4 on another, so a wall-derived count can never
      // be a sound bound. Publishing continues (event time keeps advancing,
      // the watermark keeps closing buckets) until the engine has visibly
      // committed `commitFloor` micro-batches or a generous deadline trips.
      def commitCount(): Long = cat.pointsTable("oc").version.map(_ + 1).getOrElse(0L)
      val commitFloor = 5L
      val extendDeadline = System.nanoTime() + 180L * 1000000000L
      while (commitCount() < commitFloor && System.nanoTime() < extendDeadline) {
        MqttBus.publish("openchirp/device/d1/Temp",
          s"${(published % 100)}.5".getBytes("UTF-8"),
          baseUs + published * 1000000L)
        published += 1
        Thread.sleep(50)
      }
      // drain: every published point must land EXACTLY once
      val drainDeadline = System.nanoTime() + 120L * 1000000000L
      def committed(): Long = cat.points("oc").count()
      while (committed() < published && System.nanoTime() < drainDeadline)
        Thread.sleep(500)
      val landed = committed()
      assert(landed == published,
        s"exactly-once under sustained load: published=$published landed=$landed")
      // let the UDP listener thread catch up with the last datagrams before
      // stop() closes the socket (delivery up to receipt is the kernel's;
      // the engine's conservation contract starts at received lines)
      val udpDeadline = System.nanoTime() + 60L * 1000000000L
      while (udp.received.get() < udpSent && System.nanoTime() < udpDeadline)
        Thread.sleep(100)
    } finally {
      ServiceMain.stop(h)
      spark.streams.removeListener(listener)
      udpSock.close()
    }
    // UDP-leg conservation at drain: every RECEIVED line either committed
    // or counted as a drop — nothing lost inside the engine, nothing
    // double-committed (stop() flushed the queue before this point)
    assert(udp.received.get() > 0, s"UDP leg never received (sent $udpSent)")
    assert(udp.written.get() + udp.dropped == udp.received.get(),
      s"UDP conservation: received=${udp.received.get()} " +
        s"written=${udp.written.get()} dropped=${udp.dropped}")
    val udpRows = cat.points("udpsoak").count()
    assert(udpRows == udp.written.get(),
      s"UDP committed rows ($udpRows) must equal the written gauge (${udp.written.get()})")
    val wallS = (System.nanoTime() - t0) / 1e9
    val heapEndMb = usedHeapMb()
    // the CQ leg really ran: event time advanced ~1 bucket per 5 messages,
    // so the downsample target holds many closed buckets by drain time
    val cqRows = new graft.storage.TxLogTable(spark, s"$dir/oc/cnt").read().count()
    assert(cqRows > 10, s"the CQ leg must have downsampled, got $cqRows buckets")
    // ... and the subscription leg forwarded points as line protocol
    val fwd = MqttBus.slice(0, MqttBus.size).count(_._1 == "soak/dest")
    assert(fwd > 0, "the subscription leg must have forwarded points")
    // bounded state: open windows per batch scale with the batch's EVENT
    // span (event time advances ~1 s/message, so a load-stretched batch
    // legitimately opens more 5 s buckets before the next watermark update)
    // — the bound must not encode this box's batch cadence. The structural
    // eviction property (numRowsTotal DROPS once the watermark passes) is
    // pinned by StreamingSpec; this net catches state growing WITH RUNTIME:
    // far below the published count at scale, constant-floored for short
    // soaks (observed 728 @ 3.4k published / 948 @ 55k published).
    val stateBound = math.max(2000L, published / 10)
    assert(stateRows.get() < stateBound,
      s"streaming state must stay watermark-bounded, got ${stateRows.get()} " +
        s"rows (bound $stateBound, published $published)")
    // live compaction: far fewer shards than commits
    val commits = cat.pointsTable("oc").version.map(_ + 1).getOrElse(0L)
    val shards = cat.run("SHOW SHARDS").count()
    // load-independent by construction: the publisher loop above extends
    // until commitCount() reached the floor (or a 180 s deadline — only a
    // genuinely stalled/one-giant-drain engine trips it). The dedicated
    // 300 s soak is the cadence evidence (184 commits, flat p99s); this
    // assert pins "micro-batched, not one giant drain".
    assert(commits >= 5, s"soak must commit many micro-batches, got $commits")
    assert(shards <= math.max(4L, commits / 2),
      s"compaction must fold small appends: $shards shards over $commits commits")
    // sane p99 trigger latency on this box
    val samples = triggerMs.toArray(Array.empty[(Long, Long)])
    assert(samples.nonEmpty, "no trigger progress observed")
    def p99Of(ds: Seq[Long]): Long = {
      val s = ds.sorted
      s(math.min(s.length - 1, (s.length * 99) / 100))
    }
    val p99 = p99Of(samples.map(_._2).toSeq)
    assert(p99 < 60000, s"p99 trigger ${p99}ms")
    // per-minute p99s: the CQ fill target grows for the whole soak, so a
    // per-batch cost that scales with target history shows up as an upward
    // trigger-latency trend (the r14 weak). With the bounded frontier the
    // minutes stay flat; assert the trend on soaks long enough to have one
    // (3+ full minutes), with generous box-noise slack.
    val soakStartMs = samples.map(_._1).min
    val byMinute = samples.groupBy(s => (s._1 - soakStartMs) / 60000L)
      .toSeq.sortBy(_._1)
      .map { case (m, xs) => (m, p99Of(xs.map(_._2).toSeq), xs.length) }
    val p99ByMin = byMinute.map(_._2)
    if (byMinute.size >= 3) {
      val first = p99ByMin.head.toDouble
      val last = p99ByMin.last.toDouble
      assert(last <= first * 3.0 + 2000.0,
        s"p99 trigger latency trends UP as the CQ target grows: " +
          s"per-minute p99s = ${p99ByMin.mkString(", ")} ms")
    }
    // heap band: the structural state bound above is the leak check; this
    // catches gross regressions only (shared-session heap is noisy)
    assert(heapEndMb < heapMidMb + 2048,
      s"heap grew ${heapMidMb}MB -> ${heapEndMb}MB over the soak")
    val line = s"""{"event":"soak","soak_s":$soakS,"published":$published,""" +
      s""""rows_per_s":${"%.1f".formatLocal(java.util.Locale.ROOT, published / wallS)},""" +
      s""""p99_trigger_ms":$p99,"p99_by_min":[${p99ByMin.mkString(",")}],""" +
      s""""cq_fill":"linear","max_state_rows":${stateRows.get()},""" +
      s""""udp_sent":$udpSent,"udp_received":${udp.received.get()},""" +
      s""""udp_written":${udp.written.get()},"udp_dropped":${udp.dropped},""" +
      s""""commits":$commits,"shards":$shards,""" +
      s""""heap_mid_mb":$heapMidMb,"heap_end_mb":$heapEndMb}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("PROGRESS.jsonl"),
      (line + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    catch { case scala.util.control.NonFatal(_) => () }
  }
}
