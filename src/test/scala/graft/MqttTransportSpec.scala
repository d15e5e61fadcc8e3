package graft

import org.apache.spark.sql.functions._
import graft.streaming._

class MqttTransportSpec extends SparkSuite {
  import spark.implicits._

  private def newManager(t: InProcessTransport,
                         sink: scala.collection.mutable.ArrayBuffer[(String, String, Long)]) =
    new MqttConnectionManager(t, Seq("openchirp/device/+/+", "openchirp/service/x/events"),
      log = (topic, payload, ts) => sink.synchronized {
        sink += ((topic, new String(payload, "UTF-8"), ts))
      },
      baseBackoffMs = 1, nowUs = () => 42L)

  test("connect subscribes once with the configured filters") {
    val t = new InProcessTransport
    val sink = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    val m = newManager(t, sink)
    m.start()
    assert(t.isConnected)
    assert(t.subscriptionHistory == Seq(Seq("openchirp/device/+/+", "openchirp/service/x/events")))
    assert(t.deliver("openchirp/device/d1/temp", "1.5"))
    assert(sink.toSeq == Seq(("openchirp/device/d1/temp", "1.5", 42L)))
    m.stop()
    assert(!t.isConnected)
  }

  test("connection loss: reconnect with backoff and RE-subscribe (filters never lost)") {
    val t = new InProcessTransport
    val sink = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    val m = newManager(t, sink)
    m.start()
    t.failNextConnects = 2 // two refused attempts before the broker recovers
    t.dropConnection("broker went away")
    assert(t.isConnected, "manager must have reconnected")
    assert(m.reconnectCount == 1)
    // the subscription was re-issued on the new session
    assert(t.subscriptionHistory.size == 2)
    assert(t.subscriptionHistory.last == Seq("openchirp/device/+/+", "openchirp/service/x/events"))
    assert(t.deliver("openchirp/device/d2/hum", "2.0"))
    assert(sink.map(_._1).toSeq == Seq("openchirp/device/d2/hum"))
    m.stop()
  }

  test("subscribe failure after reconnect: session torn down and retried, never connected-unsubscribed") {
    val t = new InProcessTransport
    val sink = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    val m = newManager(t, sink)
    m.start()
    t.failNextSubscribes = 1 // connect succeeds, SUBSCRIBE rejected once
    t.dropConnection("flap")
    // the half-open (connected, no filters) session must not survive:
    // the manager retries until connect AND subscribe both succeed
    assert(t.isConnected && m.reconnectCount == 1)
    assert(t.subscriptionHistory.size == 2, "filters must be re-issued after the failed SUBSCRIBE")
    assert(t.deliver("openchirp/device/d1/temp", "1.0"))
    assert(sink.size == 1)
    m.stop()
  }

  test("messages delivered while disconnected are dropped by the transport, not the log") {
    val t = new InProcessTransport
    val sink = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    val m = newManager(t, sink)
    m.start()
    t.disconnect()
    assert(!t.deliver("openchirp/device/d1/temp", "lost")) // QoS-0 semantics
    assert(sink.isEmpty)
  }

  test("stop() suppresses reconnection") {
    val t = new InProcessTransport
    val m = newManager(t, scala.collection.mutable.ArrayBuffer())
    m.start()
    m.stop()
    t.dropConnection("after stop")
    assert(!t.isConnected, "stopped manager must not reconnect")
    assert(m.reconnectCount == 0)
  }

  test("concurrent double drop: single-flight recovery, session restored, no interleaved loops") {
    val t = new InProcessTransport
    val sink = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    val m = newManager(t, sink)
    m.start()
    // two connection-lost callbacks fire from different transport threads
    // while the broker refuses a few attempts — without the single-flight
    // guard, two reconnect loops interleave connect/disconnect
    t.failNextConnects = 3
    val threads = (1 to 2).map(i => new Thread(() => t.dropConnection(s"drop $i")))
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    assert(t.isConnected, "session must end restored")
    // at most one recovery per drop signal — never an unbounded interleaving
    assert(m.reconnectCount >= 1 && m.reconnectCount <= 2, s"got ${m.reconnectCount}")
    // every restore re-issued the filters; history is whole Seqs, never torn
    assert(t.subscriptionHistory.forall(_ == Seq("openchirp/device/+/+", "openchirp/service/x/events")))
    assert(t.deliver("openchirp/device/d9/temp", "9.9"))
    assert(sink.map(_._1).toSeq == Seq("openchirp/device/d9/temp"))
    m.stop()
  }

  test("end-to-end: transport -> offset log -> DSv2 source micro-batches") {
    MqttBus.clear()
    val t = new InProcessTransport
    // default log sink: the MqttBus the DSv2 source reads
    val m = new MqttConnectionManager(t, Seq("#"), baseBackoffMs = 1)
    m.start()
    t.deliver("openchirp/device/d1/temp", "21.5")
    val stream = spark.readStream.format("graft.streaming.MqttLikeSource")
      .option("topics", "openchirp/device/+/+").load()
    val q = stream.selectExpr("topic", "cast(payload as string) AS p")
      .writeStream.format("memory").queryName("transport_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      // survive a broker outage mid-stream
      t.failNextConnects = 1
      t.dropConnection("flap")
      t.deliver("openchirp/device/d2/hum", "2.5")
      q.processAllAvailable()
      val got = spark.table("transport_out").as[(String, String)].collect().toSet
      assert(got == Set(
        ("openchirp/device/d1/temp", "21.5"),
        ("openchirp/device/d2/hum", "2.5")))
    } finally { q.stop(); m.stop() }
  }
}
