package graft

import java.net.{DatagramPacket, DatagramSocket, InetAddress}

import org.apache.spark.sql.functions._

import graft.influxql.{InfluxCatalog, UdpWriteListener}

/** The UDP write listener over REAL sockets: datagrams of line protocol
  * land in the database's points table through the same parse/type-enforce
  * path as HTTP /write; malformed and unrepresentable lines shed with a
  * counted drop (best-effort, InfluxDB's UDP service contract) surfaced in
  * SHOW STATS; a graceful stop drains everything already received.
  */
class UdpListenerSpec extends SparkSuite {
  import spark.implicits._

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
    while (!ok && System.nanoTime() < deadline) Thread.sleep(100)
    assert(ok, s"timed out waiting for: $desc")
  }

  test("UDP input service: datagrams write points; drops are counted and in SHOW STATS") {
    val root = java.nio.file.Files.createTempDirectory("udp_in").toString
    val cat = new InfluxCatalog(spark, root, defaultDb = "udpdb")
    cat.run("CREATE DATABASE udpdb")
    // an unknown database fails at BIND, not as eternal silent drops
    assert(intercept[IllegalArgumentException](
      new UdpWriteListener(cat, "nodb")).getMessage.contains("not found"))
    val l = new UdpWriteListener(cat, "udpdb", port = 0, batchSize = 100,
      flushIntervalMs = 50L)
    try {
      assert(l.boundPort > 0)
      // one datagram, two lines (newline-separated, the wire contract)
      send(l.boundPort,
        "temp,device=d1 value=1.5 1000000000\ntemp,device=d2 value=2.5 2000000000")
      poll("first datagram committed") {
        cat.points("udpdb").count() == 2L
      }
      assert(cat.points("udpdb").as[(String, String, Long, Double)]
        .collect().toSet ==
        Set(("d1", "temp", 1000000L, 1.5), ("d2", "temp", 2000000L, 2.5)))
      assert(l.received.get() == 1L && l.written.get() == 2L && l.dropped == 0L)
      // malformed + unrepresentable lines shed with a counted drop; the
      // good line in the same datagram still lands (per-line discipline)
      send(l.boundPort,
        "garbage!!!\nhum,city=sf value=3.0 1000000000\ntemp,device=d3 value=3.5 3000000000")
      poll("partial datagram committed") {
        cat.points("udpdb").count() == 3L && l.dropped >= 2L
      }
      assert(UdpWriteListener.droppedFor(root, "udpdb") == l.dropped)
      val stats = cat.run("SHOW STATS")
        .as[(String, Long, Long, Long, Long, Long, Long)].collect()
        .find(_._1 == "udpdb").get
      assert(stats._7 == l.dropped, s"SHOW STATS udp_dropped gauge: $stats")
      // UDP is precision-configurable like influxdb.conf's udp precision:
      // the default above is ns (1000000000 -> 1000000 us)
      // graceful stop: everything received before stop() still commits
      send(l.boundPort, "temp,device=d4 value=4.5 4000000000")
      poll("third datagram received")(l.received.get() == 3L)
      l.stop()
      assert(cat.points("udpdb").count() == 4L,
        "a graceful stop must drain the queue, not drop it")
    } finally l.stop() // idempotent
  }
}
