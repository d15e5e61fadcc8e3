package graft

import java.net.{DatagramPacket, DatagramSocket, InetAddress}

import graft.influxql.{InfluxCatalog, UdpWriteListener}

/** Seeded differential net over the UDP write face (r17): random datagram
  * splits, malformed-line mixes, layout rejects, out-of-range timestamps,
  * and precision knobs against an in-memory model of exactly which points
  * append and how many lines drop — the LineProtocol-net pattern applied
  * to the datagram front. A second phase tortures the bounded queue with
  * a burst and checks the conservation invariant (every line either
  * commits or counts as a drop; nothing is lost or duplicated), which
  * holds regardless of overflow timing.
  */
class UdpDifferentialSpec extends SparkSuite {
  import spark.implicits._

  private val diffScale: Int =
    sys.env.getOrElse("GRAFT_DIFF_SCALE", "1").toInt.max(1)

  private def send(port: Int, payload: String): Unit = {
    val s = new DatagramSocket()
    try {
      val bytes = payload.getBytes("UTF-8")
      s.send(new DatagramPacket(bytes, bytes.length,
        InetAddress.getLoopbackAddress, port))
    } finally s.close()
  }

  private def poll(desc: String)(ok: => Boolean): Unit = {
    val deadline = System.nanoTime() + 60000000000L
    while (!ok && System.nanoTime() < deadline) Thread.sleep(50)
    assert(ok, s"timed out waiting for: $desc")
  }

  test("8 seeded UDP ingests match the appended/dropped model") {
    for (seed <- 0 until 8 * diffScale) {
      val rnd = new scala.util.Random(8800L + seed)
      val root = java.nio.file.Files.createTempDirectory("udp_diff").toString
      val cat = new InfluxCatalog(spark, root, defaultDb = "db")
      cat.run("CREATE DATABASE db")
      // precision knob: wire unit in ns (ns / us / ms / s), the
      // narrowPoints conversion the model replays exactly (truncating
      // div for ns, exact multiply otherwise; out-of-range drops)
      val unitNs = Seq(1L, 1000L, 1000000L, 1000000000L)(rnd.nextInt(4))
      val maxRaw =
        if (unitNs >= 1000L) Long.MaxValue / (unitNs / 1000L) else Long.MaxValue
      val l = new UdpWriteListener(cat, "db", port = 0,
        batchSize = 1 + rnd.nextInt(40),
        flushIntervalMs = 20L + rnd.nextInt(60),
        tsUnitNs = unitNs)
      try {
        // a line and the row the model expects it to append (None = drop)
        case class ML(text: String, row: Option[(String, String, Long, Double)])
        var nextTs = 1L
        val lines: Seq[ML] = (0 until 20 + rnd.nextInt(40)).map { _ =>
          rnd.nextInt(10) match {
            case 0 => ML("garbage!!!", None) // malformed -> errors()
            case 1 => // no device tag -> narrowDropped
              ML(s"m${rnd.nextInt(2)},city=sf value=1.5 $nextTs", None)
            case 2 => // field key != value -> narrowDropped
              ML(s"m${rnd.nextInt(2)},device=d0 other=2.5 $nextTs", None)
            case 3 if unitNs >= 1000L => // out-of-range wire ts -> errors()
              ML(s"m0,device=d0 value=3.5 ${maxRaw + 1L}", None)
            case _ =>
              val m = s"m${rnd.nextInt(2)}"
              val d = s"d${rnd.nextInt(3)}"
              val v = rnd.nextInt(1000).toDouble + 0.5
              val raw = nextTs
              nextTs += 1 + rnd.nextInt(5)
              val us = if (unitNs >= 1000L) raw * (unitNs / 1000L) else raw / 1000L
              ML(s"$m,device=$d value=$v $raw", Some((d, m, us, v)))
          }
        }
        // random datagram splits: 1-4 lines per datagram, newline-joined
        val chunks = {
          var rest = lines
          val bufs = scala.collection.mutable.ArrayBuffer[Seq[ML]]()
          while (rest.nonEmpty) {
            val k = 1 + rnd.nextInt(4)
            bufs += rest.take(k)
            rest = rest.drop(k)
          }
          bufs.toSeq
        }
        chunks.foreach(c => send(l.boundPort, c.map(_.text).mkString("\n")))
        val wantRows = lines.flatMap(_.row)
        val wantDrops = lines.count(_.row.isEmpty).toLong
        poll(s"seed $seed: all datagrams received and lines accounted") {
          l.received.get() == chunks.size.toLong &&
            l.written.get() + l.dropped == lines.size.toLong
        }
        l.stop()
        assert(l.written.get() == wantRows.size.toLong, s"seed $seed written count")
        assert(l.dropped == wantDrops, s"seed $seed dropped count")
        val got = cat.points("db").as[(String, String, Long, Double)]
          .collect().sorted.toSeq
        assert(got == wantRows.sorted,
          s"seed $seed committed rows (unit ${unitNs}ns)")
      } finally l.stop()
    }
  }

  test("queue-overflow burst conserves lines: committed + dropped = sent") {
    // a tiny queue + slow flush cadence under a burst: whether or not the
    // queue overflows on this box's timing, the best-effort contract says
    // every line either commits or counts as a drop — none lost, none
    // double-committed. (Exact overflow timing is scheduler-dependent, so
    // this net checks the conservation invariant, not a fixed drop count.)
    val root = java.nio.file.Files.createTempDirectory("udp_burst").toString
    val cat = new InfluxCatalog(spark, root, defaultDb = "db")
    cat.run("CREATE DATABASE db")
    val l = new UdpWriteListener(cat, "db", port = 0,
      batchSize = 4, flushIntervalMs = 200L, queueCapacity = 8)
    try {
      val total = 300
      val lines = (0 until total).map(i => s"m0,device=d${i % 3} value=$i.5 ${i + 1}")
      val chunks = lines.grouped(5).toSeq
      chunks.foreach(c => send(l.boundPort, c.mkString("\n")))
      poll("burst received") { l.received.get() == chunks.size.toLong }
      l.stop()
      assert(l.written.get() + l.dropped == total.toLong,
        s"conservation: written=${l.written.get()} dropped=${l.dropped}")
      val committed = cat.points("db").count()
      assert(committed == l.written.get(),
        s"committed rows ($committed) must equal the written gauge (${l.written.get()})")
    } finally l.stop()
  }
}
