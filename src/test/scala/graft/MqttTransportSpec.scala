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

  private def awaitCond(timeoutMs: Long = 30000)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline && !cond) Thread.sleep(10)
    cond
  }

  test("wire codec: remaining-length varint boundaries roundtrip") {
    import graft.streaming.MqttWireCodec._
    // 127 / 128 / 16383 / 16384 are the 1->2 and 2->3 byte varint edges
    for (n <- Seq(0, 1, 127, 128, 16383, 16384)) {
      val payload = Array.fill[Byte](n)(7)
      val bytes = encodePublish("t", payload)
      val p = readPacket(new java.io.ByteArrayInputStream(bytes)).get
      assert(p.ptype == PUBLISH && p.flags == 0)
      val (topic, c) = readUtf8(p.body, 0)
      assert(topic == "t" && p.body.length - c == n, s"n=$n")
    }
    // truncated stream mid-packet must fail loudly, not read as clean EOF
    val trunc = encodePublish("topic", Array.fill[Byte](50)(1)).dropRight(10)
    intercept[MalformedPacket] {
      readPacket(new java.io.ByteArrayInputStream(trunc))
    }
  }

  test("wire codec: SUBSCRIBE carries filters + QoS, SUBACK carries codes") {
    import graft.streaming.MqttWireCodec._
    val sub = readPacket(new java.io.ByteArrayInputStream(
      encodeSubscribe(42, Seq("a/+/b", "#")))).get
    assert(sub.ptype == SUBSCRIBE && sub.flags == 2) // spec-mandated reserved flags
    assert(readPid(sub.body, 0) == 42)
    val (f1, c1) = readUtf8(sub.body, 2)
    val (f2, _) = readUtf8(sub.body, 2 + c1 + 1)
    assert(f1 == "a/+/b" && f2 == "#")
    val ack = readPacket(new java.io.ByteArrayInputStream(encodeSuback(42, Seq(0, 0x80)))).get
    assert(ack.ptype == SUBACK && readPid(ack.body, 0) == 42)
    assert(ack.body.drop(2).toSeq.map(_ & 0xff) == Seq(0, 0x80))
  }

  test("socket transport: real TCP handshake, wildcard routing, manager on top unchanged") {
    val broker = new MockMqttBroker
    val sink = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    val t = new SocketMqttTransport("127.0.0.1", broker.port, "graft-e2e")
    val m = new MqttConnectionManager(t, Seq("openchirp/device/+/+"),
      log = (topic, payload, ts) => sink.synchronized {
        sink += ((topic, new String(payload, "UTF-8"), ts))
      },
      baseBackoffMs = 1, nowUs = () => 42L)
    try {
      m.start()
      assert(t.isConnected && broker.sessionCount == 1)
      assert(broker.subscriptionHistory == Seq(Seq("openchirp/device/+/+")))
      // matching topic reaches the subscriber over the wire...
      assert(broker.publish("openchirp/device/d1/temp", "21.5") == 1)
      // ...non-matching topic is routed to nobody
      assert(broker.publish("other/stream/x", "no") == 0)
      assert(awaitCond()(sink.synchronized(sink.size == 1)))
      assert(sink.synchronized(sink.head) == (("openchirp/device/d1/temp", "21.5", 42L)))
      m.stop()
      assert(!t.isConnected)
      assert(awaitCond()(broker.sessionCount == 0))
    } finally { m.stop(); broker.close() }
  }

  test("socket transport: broker crash -> reconnect over a new session, filters re-issued") {
    val broker = new MockMqttBroker
    val sink = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    val t = new SocketMqttTransport("127.0.0.1", broker.port, "graft-reconnect")
    val m = new MqttConnectionManager(t, Seq("openchirp/device/+/+"),
      log = (topic, payload, ts) => sink.synchronized {
        sink += ((topic, new String(payload, "UTF-8"), ts))
      },
      baseBackoffMs = 1, nowUs = () => 7L)
    try {
      m.start()
      broker.refuseNextConnects(2) // two refused attempts exercise the backoff
      broker.dropAllConnections()  // hard kill: EOF on the reader, no DISCONNECT
      assert(awaitCond()(m.reconnectCount == 1 && t.isConnected))
      // the new session re-issued the filters (initial + post-reconnect)
      assert(awaitCond()(broker.subscriptionHistory.size == 2))
      assert(broker.subscriptionHistory.last == Seq("openchirp/device/+/+"))
      // delivered-count can transiently include a dying TCP session (writes
      // to a half-closed socket don't fail until the RST arrives), so gate
      // on AT LEAST the live subscriber and on the message arriving
      assert(awaitCond()(broker.publish("openchirp/device/d2/hum", "2.5") >= 1))
      assert(awaitCond()(sink.synchronized(sink.nonEmpty)))
      assert(sink.synchronized(sink.head) == (("openchirp/device/d2/hum", "2.5", 7L)))
    } finally { m.stop(); broker.close() }
  }

  test("socket transport: rejected SUBACK tears the session down and retries") {
    val broker = new MockMqttBroker
    val t = new SocketMqttTransport("127.0.0.1", broker.port, "graft-subfail")
    val m = new MqttConnectionManager(t, Seq("openchirp/service/x/events"),
      log = (_, _, _) => (), baseBackoffMs = 1)
    try {
      m.start()
      broker.failNextSubscribes(1) // next session connects but SUBSCRIBE is rejected
      broker.dropAllConnections()
      // recovery must not stop at connected-but-unsubscribed: it retries the
      // whole connect+subscribe until BOTH succeed
      assert(awaitCond()(m.reconnectCount == 1 && t.isConnected))
      assert(awaitCond()(broker.subscriptionHistory.size == 3)) // initial + rejected + granted
      assert(awaitCond()(broker.publish("openchirp/service/x/events", "ok") >= 1))
    } finally { m.stop(); broker.close() }
  }

  test("socket transport QoS 1: PUBACK drains pending; suppressed acks redeliver with DUP") {
    val broker = new MockMqttBroker
    val sink = scala.collection.mutable.ArrayBuffer[String]()
    val t = new SocketMqttTransport("127.0.0.1", broker.port, "graft-qos1",
      subscribeQos = 1)
    t.setCallbacks((_, payload) => sink.synchronized { sink += new String(payload, "UTF-8") },
      _ => ())
    try {
      t.connect()
      t.subscribe(Seq("openchirp/device/+/+"))
      // QoS-1 delivery: message arrives, transport PUBACKs, broker drains
      assert(broker.publish("openchirp/device/d1/temp", "21.5", qos = 1) == 1)
      assert(awaitCond()(sink.synchronized(sink.size) == 1))
      assert(awaitCond()(broker.pendingAckCount == 0), "PUBACK must drain the pending set")
      // min(publish QoS, granted QoS): a QoS-0 publish stays untracked
      broker.publish("openchirp/device/d1/temp", "ok")
      assert(awaitCond()(sink.synchronized(sink.size) == 2))
      assert(broker.pendingAckCount == 0)
    } finally { t.disconnect(); broker.close() }

    // suppressed acks: the broker keeps the delivery pending and redelivers
    // with DUP — at-least-once made visible
    val broker2 = new MockMqttBroker
    val sink2 = scala.collection.mutable.ArrayBuffer[String]()
    val t2 = new SocketMqttTransport("127.0.0.1", broker2.port, "graft-qos1-noack",
      subscribeQos = 1, autoAck = false)
    t2.setCallbacks((_, payload) => sink2.synchronized { sink2 += new String(payload, "UTF-8") },
      _ => ())
    try {
      t2.connect()
      t2.subscribe(Seq("openchirp/device/+/+"))
      assert(broker2.publish("openchirp/device/d1/temp", "v", qos = 1) == 1)
      assert(awaitCond()(sink2.synchronized(sink2.size) == 1))
      assert(broker2.pendingAckCount == 1, "no PUBACK -> still pending")
      broker2.redeliverPending()
      assert(awaitCond()(sink2.synchronized(sink2.size) == 2), "DUP redelivery arrives")
      assert(broker2.pendingAckCount == 1)
    } finally { t2.disconnect(); broker2.close() }
  }

  test("socket transport QoS 2: four-leg handshake completes, redelivery never double-delivers") {
    val broker = new MockMqttBroker
    val sink = scala.collection.mutable.ArrayBuffer[String]()
    val t = new SocketMqttTransport("127.0.0.1", broker.port, "graft-qos2",
      subscribeQos = 2)
    t.setCallbacks((_, payload) => sink.synchronized { sink += new String(payload, "UTF-8") },
      _ => ())
    try {
      t.connect()
      t.subscribe(Seq("openchirp/device/+/+"))
      // full PUBLISH -> PUBREC -> PUBREL -> PUBCOMP cycle: delivered once,
      // broker's in-flight state drains to zero
      assert(broker.publish("openchirp/device/d1/temp", "21.5", qos = 2) == 1)
      assert(awaitCond()(sink.synchronized(sink.size) == 1))
      assert(awaitCond()(broker.pendingAckCount == 0),
        "PUBREC/PUBREL/PUBCOMP must drain the in-flight state")
      assert(sink.synchronized(sink.size) == 1, "exactly one delivery after handshake")
      // several messages in sequence each deliver exactly once
      (0 until 5).foreach(i => broker.publish("openchirp/device/d1/temp", s"m$i", qos = 2))
      assert(awaitCond()(sink.synchronized(sink.size) == 6))
      assert(awaitCond()(broker.pendingAckCount == 0))
      assert(sink.synchronized(sink.toSeq).drop(1) == (0 until 5).map(i => s"m$i"))
    } finally { t.disconnect(); broker.close() }

    // suppressed PUBREC: the broker retries the PUBLISH with DUP, and the
    // receiver's in-flight set drops every retry — exactly-once even
    // though the wire carried the message three times
    val broker2 = new MockMqttBroker
    val sink2 = scala.collection.mutable.ArrayBuffer[String]()
    val t2 = new SocketMqttTransport("127.0.0.1", broker2.port, "graft-qos2-norec",
      subscribeQos = 2, autoAck = false)
    t2.setCallbacks((_, payload) => sink2.synchronized { sink2 += new String(payload, "UTF-8") },
      _ => ())
    try {
      t2.connect()
      t2.subscribe(Seq("openchirp/device/+/+"))
      assert(broker2.publish("openchirp/device/d1/temp", "v", qos = 2) == 1)
      assert(awaitCond()(sink2.synchronized(sink2.size) == 1))
      assert(broker2.pendingAckCount == 1, "no PUBREC -> PUBLISH still in flight")
      broker2.redeliverPending()
      broker2.redeliverPending()
      Thread.sleep(150) // give wrong double deliveries a chance to surface
      assert(sink2.synchronized(sink2.size) == 1,
        "redelivered PUBLISH of an in-flight id must not reach the callback")
      assert(broker2.pendingAckCount == 1)
    } finally { t2.disconnect(); broker2.close() }

    // min(publish QoS, granted QoS): a QoS-2 publish to a QoS-1 subscriber
    // downgrades to the PUBACK path
    val broker3 = new MockMqttBroker
    val sink3 = scala.collection.mutable.ArrayBuffer[String]()
    val t3 = new SocketMqttTransport("127.0.0.1", broker3.port, "graft-qos2-down",
      subscribeQos = 1)
    t3.setCallbacks((_, payload) => sink3.synchronized { sink3 += new String(payload, "UTF-8") },
      _ => ())
    try {
      t3.connect()
      t3.subscribe(Seq("openchirp/device/+/+"))
      assert(broker3.publish("openchirp/device/d1/temp", "w", qos = 2) == 1)
      assert(awaitCond()(sink3.synchronized(sink3.size) == 1))
      assert(awaitCond()(broker3.pendingAckCount == 0), "downgraded to QoS 1, PUBACK drains")
    } finally { t3.disconnect(); broker3.close() }
  }

  test("persistent session QoS 1: crash -> reconnect redelivers in-flight, no resubscribe") {
    val broker = new MockMqttBroker
    val sink = scala.collection.mutable.ArrayBuffer[String]()
    // autoAck=false keeps the delivery in flight across the crash
    val t = new SocketMqttTransport("127.0.0.1", broker.port, "graft-persist1",
      subscribeQos = 1, autoAck = false, cleanSession = false)
    t.setCallbacks((_, p) => sink.synchronized { sink += new String(p, "UTF-8") }, _ => ())
    try {
      t.connect()
      assert(!t.sessionPresent, "first contact stores, never resumes")
      t.subscribe(Seq("openchirp/device/+/+"))
      assert(broker.publish("openchirp/device/d1/temp", "v".getBytes("UTF-8"), qos = 1) == 1)
      assert(awaitCond()(sink.synchronized(sink.size) == 1))
      assert(broker.pendingAckCount == 1)
      broker.dropAllConnections() // broker-side crash, no DISCONNECT
      assert(awaitCond()(broker.sessionCount == 0 && !t.isConnected))
      assert(broker.pendingAckCount == 1, "in-flight state must survive the socket")
      t.connect() // resume: NO subscribe call follows
      assert(t.sessionPresent, "CONNACK must report the resumed session")
      assert(awaitCond()(sink.synchronized(sink.size) == 2),
        "un-PUBACKed delivery redelivered on resume without resubscribe")
      assert(broker.subscriptionHistory.size == 1, "exactly one SUBSCRIBE ever sent")
      // a new publish still routes via the persisted subscription
      assert(broker.publish("openchirp/device/d2/hum", "w".getBytes("UTF-8"), qos = 1) == 1)
      assert(awaitCond()(sink.synchronized(sink.size) == 3))
    } finally { t.disconnect(); broker.close() }
  }

  test("persistent session QoS 2: redelivery across reconnect stays exactly-once") {
    val broker = new MockMqttBroker
    val sink = scala.collection.mutable.ArrayBuffer[String]()
    val t = new SocketMqttTransport("127.0.0.1", broker.port, "graft-persist2",
      subscribeQos = 2, autoAck = false, cleanSession = false)
    t.setCallbacks((_, p) => sink.synchronized { sink += new String(p, "UTF-8") }, _ => ())
    try {
      t.connect()
      t.subscribe(Seq("openchirp/device/+/+"))
      assert(broker.publish("openchirp/device/d1/temp", "v".getBytes("UTF-8"), qos = 2) == 1)
      assert(awaitCond()(sink.synchronized(sink.size) == 1))
      assert(broker.pendingAckCount == 1, "no PUBREC -> PUBLISH in flight")
      broker.dropAllConnections()
      assert(awaitCond()(broker.sessionCount == 0 && !t.isConnected))
      t.connect()
      assert(t.sessionPresent)
      // the broker re-sends the PUBLISH with DUP on resume; the receiver's
      // in-flight set also survived the reconnect, so the callback must
      // NOT fire a second time — exactly-once across the crash
      assert(awaitCond()(broker.sessionCount == 1))
      Thread.sleep(200) // give a wrong double delivery a chance to surface
      assert(sink.synchronized(sink.size) == 1)
      assert(broker.pendingAckCount == 1)
    } finally { t.disconnect(); broker.close() }
  }

  test("persistent session: QoS >= 1 published while offline is queued, delivered on resume") {
    val broker = new MockMqttBroker
    val sink = scala.collection.mutable.ArrayBuffer[String]()
    val t = new SocketMqttTransport("127.0.0.1", broker.port, "graft-offline",
      subscribeQos = 1, cleanSession = false)
    t.setCallbacks((_, p) => sink.synchronized { sink += new String(p, "UTF-8") }, _ => ())
    try {
      t.connect()
      t.subscribe(Seq("openchirp/device/+/+"))
      t.disconnect() // clean detach; the session itself persists
      assert(awaitCond()(broker.sessionCount == 0))
      // no live delivery (returns 0), but the detached session queues it...
      assert(broker.publish("openchirp/device/d1/temp", "q1".getBytes("UTF-8"), qos = 1) == 0)
      // ...while a QoS-0 publish is dropped exactly like a real broker
      assert(broker.publish("openchirp/device/d1/temp", "q0".getBytes("UTF-8"), qos = 0) == 0)
      t.connect()
      assert(t.sessionPresent)
      assert(awaitCond()(sink.synchronized(sink.toSeq) == Seq("q1")),
        "queued QoS-1 message delivered on resume, QoS-0 one dropped")
      assert(awaitCond()(broker.pendingAckCount == 0), "resume delivery PUBACKed normally")
    } finally { t.disconnect(); broker.close() }
  }

  test("retained messages: replay to new subscribers, latest wins, empty payload clears") {
    val broker = new MockMqttBroker
    try {
      broker.publish("openchirp/device/d1/temp", "21.5".getBytes("UTF-8"), qos = 1, retain = true)
      // subscriber arriving AFTER the publish still receives the value
      val sink = scala.collection.mutable.ArrayBuffer[String]()
      val t = new SocketMqttTransport("127.0.0.1", broker.port, "graft-ret1", subscribeQos = 1)
      t.setCallbacks((_, p) => sink.synchronized { sink += new String(p, "UTF-8") }, _ => ())
      t.connect(); t.subscribe(Seq("openchirp/device/+/+"))
      assert(awaitCond()(sink.synchronized(sink.toSeq) == Seq("21.5")))
      assert(awaitCond()(broker.pendingAckCount == 0)) // retained replay acked per QoS
      t.disconnect()
      // latest retained value wins; an empty retained payload clears it
      broker.publish("openchirp/device/d1/temp", "22.0".getBytes("UTF-8"), retain = true)
      val sink2 = scala.collection.mutable.ArrayBuffer[String]()
      val t2 = new SocketMqttTransport("127.0.0.1", broker.port, "graft-ret2")
      t2.setCallbacks((_, p) => sink2.synchronized { sink2 += new String(p, "UTF-8") }, _ => ())
      t2.connect(); t2.subscribe(Seq("openchirp/device/d1/temp"))
      assert(awaitCond()(sink2.synchronized(sink2.toSeq) == Seq("22.0")))
      t2.disconnect()
      broker.publish("openchirp/device/d1/temp", Array.empty[Byte], retain = true)
      val sink3 = scala.collection.mutable.ArrayBuffer[String]()
      val t3 = new SocketMqttTransport("127.0.0.1", broker.port, "graft-ret3")
      t3.setCallbacks((_, p) => sink3.synchronized { sink3 += new String(p, "UTF-8") }, _ => ())
      t3.connect(); t3.subscribe(Seq("openchirp/device/#"))
      Thread.sleep(150)
      assert(sink3.synchronized(sink3.isEmpty), "cleared retained value must not replay")
      t3.disconnect()
    } finally broker.close()
  }

  test("clean-session reconnect discards persistent state") {
    val broker = new MockMqttBroker
    try {
      val t = new SocketMqttTransport("127.0.0.1", broker.port, "graft-clean",
        subscribeQos = 1, cleanSession = false)
      t.setCallbacks((_, _) => (), _ => ())
      t.connect(); t.subscribe(Seq("openchirp/device/+/+")); t.disconnect()
      broker.publish("openchirp/device/d1/temp", "lost".getBytes("UTF-8"), qos = 1)
      // same client id back with clean-session=1: stored state must go
      val t2 = new SocketMqttTransport("127.0.0.1", broker.port, "graft-clean")
      val sink = scala.collection.mutable.ArrayBuffer[String]()
      t2.setCallbacks((_, p) => sink.synchronized { sink += new String(p, "UTF-8") }, _ => ())
      t2.connect()
      assert(!t2.sessionPresent, "clean session must never resume")
      Thread.sleep(150)
      assert(sink.synchronized(sink.isEmpty), "queued state discarded with the session")
      assert(broker.publish("x/y", "n".getBytes("UTF-8"), qos = 1) == 0,
        "old subscription discarded too")
      t2.disconnect()
    } finally broker.close()
  }

  test("will message: published to subscribers on ungraceful disconnect") {
    val broker = new MockMqttBroker
    val sink = scala.collection.mutable.ArrayBuffer[(String, String)]()
    // watcher subscribed at QoS 1 so a QoS-1 will is delivered at QoS 1
    val watcher = new SocketMqttTransport("127.0.0.1", broker.port, "graft-watcher",
      subscribeQos = 1)
    try {
      watcher.setCallbacks((topic, payload) => sink.synchronized {
        sink += ((topic, new String(payload, "UTF-8")))
      }, _ => ())
      watcher.connect()
      watcher.subscribe(Seq("openchirp/status/+"))
      // dying client: raw socket so the test controls exactly how it ends —
      // an abrupt close with no DISCONNECT packet, a real crash on the wire
      val sock = new java.net.Socket("127.0.0.1", broker.port)
      sock.getOutputStream.write(MqttWireCodec.encodeConnect("graft-doomed",
        will = Some(("openchirp/status/doomed", "offline".getBytes("UTF-8"), 1, false))))
      sock.getOutputStream.flush()
      assert(MqttWireCodec.readPacket(sock.getInputStream)
        .exists(_.ptype == MqttWireCodec.CONNACK))
      sock.close() // no DISCONNECT: the broker must fire the will
      assert(awaitCond()(sink.synchronized(sink.nonEmpty)))
      assert(sink.synchronized(sink.head) == (("openchirp/status/doomed", "offline")))
      watcher.disconnect()
    } finally broker.close()
  }

  test("will message: suppressed on clean DISCONNECT; retained will persists for late subscribers") {
    val broker = new MockMqttBroker
    val sink = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val watcher = new SocketMqttTransport("127.0.0.1", broker.port, "graft-watcher2")
    try {
      watcher.setCallbacks((topic, payload) => sink.synchronized {
        sink += ((topic, new String(payload, "UTF-8")))
      }, _ => ())
      watcher.connect()
      watcher.subscribe(Seq("openchirp/status/+"))
      // clean exit: transport sends DISCONNECT, the will must NOT fire
      val polite = new SocketMqttTransport("127.0.0.1", broker.port, "graft-polite",
        will = Some(("openchirp/status/polite", "offline".getBytes("UTF-8"), 0, false)))
      polite.connect()
      polite.disconnect()
      assert(awaitCond()(broker.sessionCount == 1)) // only the watcher remains
      Thread.sleep(50) // give a wrong will time to arrive
      assert(sink.synchronized(sink.isEmpty), s"will fired on clean close: $sink")

      // a RETAINED will is stored like any retained publish: a subscriber
      // arriving after the crash still learns the device is gone
      val doomed = new SocketMqttTransport("127.0.0.1", broker.port, "graft-doomed2",
        will = Some(("openchirp/status/doomed2", "gone".getBytes("UTF-8"), 0, true)))
      doomed.connect()
      broker.dropAllConnections() // kills doomed AND watcher: both ungraceful
      assert(awaitCond()(broker.sessionCount == 0))
      val late = new SocketMqttTransport("127.0.0.1", broker.port, "graft-late")
      val lateSink = scala.collection.mutable.ArrayBuffer[String]()
      late.setCallbacks((_, payload) => lateSink.synchronized {
        lateSink += new String(payload, "UTF-8")
      }, _ => ())
      late.connect()
      late.subscribe(Seq("openchirp/status/doomed2"))
      assert(awaitCond()(lateSink.synchronized(lateSink.contains("gone"))))
      late.disconnect()
    } finally broker.close()
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

  test("CONNECT auth: good creds connect, bad creds rc 4, no creds rc 5, no session either way") {
    val broker = new MockMqttBroker
    broker.requireCredentials(Map("svc-1" -> "hunter2"))
    try {
      // wrong password: CONNACK rc 4 (bad user name or password)
      val bad = new SocketMqttTransport("127.0.0.1", broker.port, "graft-auth-bad",
        auth = Some(("svc-1", "wrong")))
      val e4 = intercept[java.io.IOException](bad.connect())
      assert(e4.getMessage.contains("rc=4"), s"expected rc 4: ${e4.getMessage}")
      assert(!bad.isConnected && broker.sessionCount == 0, "refused CONNECT leaves no session")
      // unknown username is the same rc 4 (the broker must not reveal
      // which half was wrong)
      val unknown = new SocketMqttTransport("127.0.0.1", broker.port, "graft-auth-unk",
        auth = Some(("nobody", "hunter2")))
      assert(intercept[java.io.IOException](unknown.connect()).getMessage.contains("rc=4"))
      // no credentials at all: rc 5 (not authorized)
      val anon = new SocketMqttTransport("127.0.0.1", broker.port, "graft-auth-anon")
      val e5 = intercept[java.io.IOException](anon.connect())
      assert(e5.getMessage.contains("rc=5"), s"expected rc 5: ${e5.getMessage}")
      assert(broker.sessionCount == 0)
      // correct credentials: full session, routing works
      val sink = scala.collection.mutable.ArrayBuffer[String]()
      val good = new SocketMqttTransport("127.0.0.1", broker.port, "graft-auth-ok",
        auth = Some(("svc-1", "hunter2")))
      good.setCallbacks((_, p) => sink.synchronized { sink += new String(p, "UTF-8") }, _ => ())
      good.connect()
      good.subscribe(Seq("openchirp/device/+/+"))
      assert(broker.publish("openchirp/device/d1/temp", "ok") == 1)
      assert(awaitCond()(sink.synchronized(sink.size) == 1))
      good.disconnect()
    } finally broker.close()
  }

  test("CONNECT auth: persistent-session resume still works under auth; failed auth never wipes it") {
    val broker = new MockMqttBroker
    broker.requireCredentials(Map("svc-1" -> "hunter2"))
    val sink = scala.collection.mutable.ArrayBuffer[String]()
    val t = new SocketMqttTransport("127.0.0.1", broker.port, "graft-auth-persist",
      subscribeQos = 1, cleanSession = false, auth = Some(("svc-1", "hunter2")))
    t.setCallbacks((_, p) => sink.synchronized { sink += new String(p, "UTF-8") }, _ => ())
    try {
      t.connect()
      assert(!t.sessionPresent)
      t.subscribe(Seq("openchirp/device/+/+"))
      t.disconnect()
      assert(awaitCond()(broker.sessionCount == 0))
      // an attacker failing auth against the same client id must NOT
      // disturb the stored session (a failed CONNECT joins nothing)
      val thief = new SocketMqttTransport("127.0.0.1", broker.port, "graft-auth-persist",
        cleanSession = true, auth = Some(("svc-1", "wrong")))
      intercept[java.io.IOException](thief.connect())
      // offline QoS-1 publish queues against the persisted subscription
      assert(broker.publish("openchirp/device/d1/temp", "q".getBytes("UTF-8"), qos = 1) == 0)
      t.connect() // authenticated resume
      assert(t.sessionPresent, "session survived the failed-auth attempt")
      assert(awaitCond()(sink.synchronized(sink.size) == 1), "offline message delivered on resume")
      assert(broker.subscriptionHistory.size == 1, "no resubscribe needed")
    } finally { t.disconnect(); broker.close() }
  }

  test("TLS transport: full handshake against a TLS broker, auth + routing over the encrypted session") {
    // server side: the checked-in self-signed PKCS12 keystore
    val ksIn = getClass.getResourceAsStream("/mqtt-test-keystore.p12")
    assert(ksIn != null, "test keystore resource missing")
    val ks = java.security.KeyStore.getInstance("PKCS12")
    ks.load(ksIn, "graft-test".toCharArray)
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, "graft-test".toCharArray)
    val serverCtx = javax.net.ssl.SSLContext.getInstance("TLS")
    serverCtx.init(kmf.getKeyManagers, null, null)
    val broker = new MockMqttBroker(sslContext = Some(serverCtx))
    broker.requireCredentials(Map("svc-1" -> "hunter2"))
    // client side: trust-only context from the exported CA pem, via the
    // same loader the enable_ssl/ssl_location config path uses
    val caPem = java.nio.file.Files.createTempFile("mqtt-ca", ".pem")
    java.nio.file.Files.copy(getClass.getResourceAsStream("/mqtt-test-ca.pem"), caPem,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val clientCtx = GraftConfig.sslContextFromCaFile(caPem.toString)
    try {
      // a client that does NOT trust the broker cert fails at connect()
      // (the explicit pre-CONNECT handshake), never half-opens a session
      val untrusting = new SocketMqttTransport("127.0.0.1", broker.port, "graft-tls-bad",
        sslContext = Some(javax.net.ssl.SSLContext.getDefault))
      intercept[Exception](untrusting.connect())
      assert(!untrusting.isConnected && broker.sessionCount == 0)
      // trusting client: handshake, authenticated CONNECT, routed delivery
      val sink = scala.collection.mutable.ArrayBuffer[String]()
      val t = new SocketMqttTransport("127.0.0.1", broker.port, "graft-tls",
        auth = Some(("svc-1", "hunter2")), sslContext = Some(clientCtx))
      t.setCallbacks((_, p) => sink.synchronized { sink += new String(p, "UTF-8") }, _ => ())
      t.connect()
      t.subscribe(Seq("openchirp/device/+/+"))
      assert(broker.publish("openchirp/device/d1/temp", "sealed") == 1)
      assert(awaitCond()(sink.synchronized(sink.size) == 1))
      assert(sink.synchronized(sink.head) == "sealed")
      t.disconnect()
    } finally broker.close()
  }

  test("config wiring: service.conf keys build an authenticated TLS transport end-to-end") {
    val ksIn = getClass.getResourceAsStream("/mqtt-test-keystore.p12")
    val ks = java.security.KeyStore.getInstance("PKCS12")
    ks.load(ksIn, "graft-test".toCharArray)
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, "graft-test".toCharArray)
    val serverCtx = javax.net.ssl.SSLContext.getInstance("TLS")
    serverCtx.init(kmf.getKeyManagers, null, null)
    val broker = new MockMqttBroker(sslContext = Some(serverCtx))
    broker.requireCredentials(Map("svc-x" -> "pw-x"))
    val caPem = java.nio.file.Files.createTempFile("mqtt-ca2", ".pem")
    java.nio.file.Files.copy(getClass.getResourceAsStream("/mqtt-test-ca.pem"), caPem,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    try {
      // the reference's service.conf shape (service.conf:14-22)
      val conf = GraftConfig.parseIni(
        s"""[DEFAULT]
           |client_id=mtss_service
           |service_id=svc-x
           |password=pw-x
           |mqtt_broker=127.0.0.1
           |mqtt_broker_port=${broker.port}
           |enable_ssl=True
           |ssl_location=$caPem
           |""".stripMargin)
      val t = GraftConfig.mqttTransport(conf)
      val sink = scala.collection.mutable.ArrayBuffer[String]()
      t.setCallbacks((_, p) => sink.synchronized { sink += new String(p, "UTF-8") }, _ => ())
      t.connect()
      t.subscribe(Seq("#"))
      assert(broker.publish("openchirp/device/d9/t", "conf-ok") == 1)
      assert(awaitCond()(sink.synchronized(sink.size) == 1))
      t.disconnect()
    } finally broker.close()
  }
}
