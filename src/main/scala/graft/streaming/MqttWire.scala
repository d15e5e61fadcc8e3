package graft.streaming

import java.io.{EOFException, IOException, InputStream}
import java.net.{InetAddress, InetSocketAddress, ServerSocket, Socket}
import java.util.concurrent.{ArrayBlockingQueue, ConcurrentHashMap, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable.ArrayBuffer

/** MQTT 3.1.1 wire codec — the minimal packet set a QoS-0 telemetry
  * subscriber needs (CONNECT/CONNACK, SUBSCRIBE/SUBACK, PUBLISH,
  * PINGREQ/PINGRESP, DISCONNECT), encoded per the OASIS spec: fixed header
  * of packet-type nibble + flags, then the 7-bits-per-byte remaining-length
  * varint, then the variable header/payload. This is the byte-level half of
  * what the reference delegates to paho (influx_service.py:47-97); the
  * session half lives in [[SocketMqttTransport]].
  */
object MqttWireCodec {

  val CONNECT = 1; val CONNACK = 2; val PUBLISH = 3; val PUBACK = 4
  val PUBREC = 5; val PUBREL = 6; val PUBCOMP = 7
  val SUBSCRIBE = 8; val SUBACK = 9
  val PINGREQ = 12; val PINGRESP = 13; val DISCONNECT = 14

  final class MalformedPacket(msg: String) extends IOException(msg)

  /** A decoded fixed header + raw body (variable header and payload). */
  final case class Packet(ptype: Int, flags: Int, body: Array[Byte])

  /** Len-prefixed UTF-8 (MQTT 1.5.3): two length bytes then the bytes. */
  private def utf8(s: String): Array[Byte] = {
    val b = s.getBytes("UTF-8")
    if (b.length > 0xffff) throw new MalformedPacket(s"string too long: ${b.length}")
    Array[Byte](((b.length >> 8) & 0xff).toByte, (b.length & 0xff).toByte) ++ b
  }

  /** Remaining-length varint (MQTT 2.2.3): 7 bits per byte, LSB group
    * first, high bit = continuation, at most 4 bytes (max 268 435 455).
    */
  private def varLen(n: Int): Array[Byte] = {
    if (n < 0 || n > 268435455) throw new MalformedPacket(s"bad remaining length $n")
    val out = ArrayBuffer[Byte]()
    var x = n
    var done = false
    while (!done) {
      var d = x % 128
      x /= 128
      if (x > 0) d |= 0x80 else done = true
      out += d.toByte
    }
    out.toArray
  }

  private def frame(ptype: Int, flags: Int, body: Array[Byte]): Array[Byte] =
    Array((((ptype << 4) | flags) & 0xff).toByte) ++ varLen(body.length) ++ body

  private def pid2(id: Int): Array[Byte] =
    Array(((id >> 8) & 0xff).toByte, (id & 0xff).toByte)

  /** CONNECT: protocol "MQTT" level 4. Connect-flags bit 1
    * (MQTT 3.1.2.4) selects clean session (true, the default) vs resuming
    * a broker-side persistent session keyed by client id. An optional will
    * (topic, payload, QoS, retain — MQTT 3.1.2.5-11) sets flag bit 2 plus
    * the QoS/retain bits and appends `willTopic willMessage` to the payload
    * after the client id; the broker publishes it if the connection ends
    * any way other than a DISCONNECT packet. Optional credentials
    * (MQTT 3.1.2.8/9 — the reference's `username_pw_set(service_id,
    * password)`, influx_service.py:56) set flag bits 7/6 and append
    * username then password at the END of the payload (3.1.3's field
    * order: client id, will topic, will message, username, password);
    * the password is a 2-byte-length BINARY field, not a UTF-8 string.
    */
  def encodeConnect(clientId: String, keepAliveSecs: Int = 0,
                    cleanSession: Boolean = true,
                    will: Option[(String, Array[Byte], Int, Boolean)] = None,
                    auth: Option[(String, Option[Array[Byte]])] = None): Array[Byte] = {
    val flags = (if (cleanSession) 2 else 0) | will.map { case (_, _, q, r) =>
      require(q >= 0 && q <= 2, s"bad will QoS $q")
      4 | ((q & 3) << 3) | (if (r) 0x20 else 0)
    }.getOrElse(0) | auth.map { case (_, pw) =>
      0x80 | (if (pw.isDefined) 0x40 else 0) // password without username is invalid (3.1.2-22)
    }.getOrElse(0)
    // will message is a 2-byte-length binary, NOT a UTF-8 string (3.1.3.3)
    val willBytes = will.map { case (t, p, _, _) => utf8(t) ++ pid2(p.length) ++ p }
      .getOrElse(Array.empty[Byte])
    val authBytes = auth.map { case (u, pw) =>
      utf8(u) ++ pw.map(p => pid2(p.length) ++ p).getOrElse(Array.empty[Byte])
    }.getOrElse(Array.empty[Byte])
    frame(CONNECT, 0, utf8("MQTT") ++
      Array[Byte](4, flags.toByte) ++ pid2(keepAliveSecs) ++ utf8(clientId) ++
      willBytes ++ authBytes)
  }

  def encodeConnack(sessionPresent: Boolean, returnCode: Int): Array[Byte] =
    frame(CONNACK, 0, Array((if (sessionPresent) 1 else 0).toByte, returnCode.toByte))

  /** SUBSCRIBE (reserved flags 0b0010 per spec); one entry per filter at
    * the requested QoS (0, 1 or 2).
    */
  def encodeSubscribe(packetId: Int, filters: Seq[String], qos: Int = 0): Array[Byte] = {
    require(qos >= 0 && qos <= 2, s"unsupported QoS $qos")
    frame(SUBSCRIBE, 2, pid2(packetId) ++ filters.toArray.flatMap(f => utf8(f) :+ qos.toByte))
  }

  /** SUBACK return codes: 0x00/0x01 = granted QoS, 0x80 = failure. */
  def encodeSuback(packetId: Int, codes: Seq[Int]): Array[Byte] =
    frame(SUBACK, 0, pid2(packetId) ++ codes.toArray.map(_.toByte))

  /** PUBLISH: topic, then (QoS >= 1 only) a packet id, then the payload.
    * Flags per MQTT 3.3.1: bit 3 = DUP (a redelivery), bits 1-2 = QoS,
    * bit 0 = RETAIN (broker keeps it as the topic's last known value;
    * set on deliveries that answer a new subscription from the retained
    * store, clear on normal fan-out — MQTT 3.3.1.3).
    */
  def encodePublish(topic: String, payload: Array[Byte], qos: Int = 0,
                    packetId: Int = 0, dup: Boolean = false,
                    retain: Boolean = false): Array[Byte] = {
    require(qos >= 0 && qos <= 2, s"unsupported QoS $qos")
    val flags = (if (dup) 8 else 0) | (qos << 1) | (if (retain) 1 else 0)
    val mid = if (qos >= 1) pid2(packetId) else Array.empty[Byte]
    frame(PUBLISH, flags, utf8(topic) ++ mid ++ payload)
  }

  /** PUBACK: the QoS-1 receiver's acknowledgement (MQTT 3.4). */
  def encodePuback(packetId: Int): Array[Byte] = frame(PUBACK, 0, pid2(packetId))

  /** QoS-2 handshake packets (MQTT 3.5/3.6/3.7): PUBREC acknowledges
    * receipt, PUBREL (reserved flags 0b0010) releases the packet id,
    * PUBCOMP completes — together the exactly-once delivery protocol.
    */
  def encodePubrec(packetId: Int): Array[Byte] = frame(PUBREC, 0, pid2(packetId))
  def encodePubrel(packetId: Int): Array[Byte] = frame(PUBREL, 2, pid2(packetId))
  def encodePubcomp(packetId: Int): Array[Byte] = frame(PUBCOMP, 0, pid2(packetId))

  def encodePingReq(): Array[Byte] = frame(PINGREQ, 0, Array.empty)
  def encodePingResp(): Array[Byte] = frame(PINGRESP, 0, Array.empty)
  def encodeDisconnect(): Array[Byte] = frame(DISCONNECT, 0, Array.empty)

  /** Blocking read of ONE packet. None on clean EOF at a packet boundary;
    * [[MalformedPacket]] on EOF mid-packet or an over-long length varint —
    * a truncated stream must never be silently treated as a clean close.
    */
  def readPacket(in: InputStream): Option[Packet] = {
    val first = in.read()
    if (first < 0) return None
    var mult = 1; var len = 0; var i = 0; var cont = true
    while (cont) {
      val b = in.read()
      if (b < 0) throw new MalformedPacket("EOF inside remaining length")
      len += (b & 0x7f) * mult
      mult *= 128
      i += 1
      if (i > 4) throw new MalformedPacket("remaining length exceeds 4 bytes")
      cont = (b & 0x80) != 0
    }
    val body = new Array[Byte](len)
    var off = 0
    while (off < len) {
      val r = in.read(body, off, len - off)
      if (r < 0) throw new MalformedPacket(s"EOF inside body at $off/$len")
      off += r
    }
    Some(Packet(first >> 4, first & 0x0f, body))
  }

  /** Parse a len-prefixed UTF-8 string at `off`; (value, bytes consumed). */
  def readUtf8(body: Array[Byte], off: Int): (String, Int) = {
    if (off + 2 > body.length) throw new MalformedPacket("truncated string length")
    val n = ((body(off) & 0xff) << 8) | (body(off + 1) & 0xff)
    if (off + 2 + n > body.length) throw new MalformedPacket("truncated string body")
    (new String(body, off + 2, n, "UTF-8"), 2 + n)
  }

  def readPid(body: Array[Byte], off: Int): Int = {
    if (off + 2 > body.length) throw new MalformedPacket("truncated packet id")
    ((body(off) & 0xff) << 8) | (body(off + 1) & 0xff)
  }
}

/** A real network [[MqttTransport]]: MQTT 3.1.1 over a TCP socket. The
  * session lifecycle mirrors the reference's paho client
  * (influx_service.py:47-97): connect = socket + CONNECT/CONNACK
  * handshake, subscribe = SUBSCRIBE/SUBACK rendezvous, arriving PUBLISH
  * packets fire the message callback from a dedicated reader thread, and
  * an unexpected EOF or socket error fires the connection-lost callback —
  * [[MqttConnectionManager]] drives reconnect/resubscribe on top,
  * unchanged from the in-process transport.
  */
/** @param subscribeQos requested subscription QoS:
  *                     0 (fire-and-forget);
  *                     1 (at-least-once — each inbound QoS-1 PUBLISH is
  *                     PUBACKed after the message callback returns, so a
  *                     crash before the callback completes leaves the
  *                     message unacked and the broker redelivers it with
  *                     DUP; duplicates are the downstream offset-log /
  *                     txn-fence layers' job, exactly like a replayed
  *                     micro-batch);
  *                     2 (exactly-once — the receiver half of the
  *                     PUBREC/PUBREL/PUBCOMP handshake, MQTT 4.3.3: the
  *                     callback fires on first receipt of a packet id,
  *                     redeliveries of the same unreleased id are dropped
  *                     by the in-flight set, and the id is forgotten only
  *                     on PUBREL — so the session never double-delivers)
  * @param autoAck     test seam: false suppresses PUBACK/PUBREC to
  *                    exercise broker redelivery
  * @param cleanSession true (default) starts every connect from a clean
  *                    broker-side session; false asks the broker to keep
  *                    subscriptions and in-flight QoS 1/2 state across
  *                    disconnects (MQTT 3.1.2.4) — on reconnect the CONNACK
  *                    session-present bit (exposed as [[sessionPresent]])
  *                    reports whether state was resumed, in which case no
  *                    resubscribe is needed and the broker redelivers
  *                    whatever was in flight
  * @param will        optional last-will (topic, payload, QoS, retain): the
  *                    broker publishes it when this client's connection dies
  *                    without a DISCONNECT packet (crash, network drop) and
  *                    suppresses it on a clean disconnect() — MQTT 3.1.2.5
  * @param auth        optional (username, password) credentials sent in
  *                    CONNECT (MQTT 3.1.2.8/9) — the reference's
  *                    service_id/password pair. A refused CONNACK (rc 4 bad
  *                    credentials, rc 5 not authorized) fails connect()
  *                    with the rc in the message and leaves no session.
  * @param sslContext  when set, the TCP socket is wrapped in TLS (an
  *                    [[javax.net.ssl.SSLSocket]] from this context, with
  *                    an explicit handshake before CONNECT so certificate
  *                    failures surface as connect() errors, not mid-session
  *                    write errors) — the reference's enable_ssl/
  *                    ssl_location path (influx_service.py:57-58); build
  *                    a context from a CA file with
  *                    [[graft.GraftConfig.sslContextFromCaFile]]
  */
class SocketMqttTransport(host: String, port: Int, clientId: String,
                          ioTimeoutMs: Int = 10000, subscribeQos: Int = 0,
                          autoAck: Boolean = true,
                          cleanSession: Boolean = true,
                          will: Option[(String, Array[Byte], Int, Boolean)] = None,
                          auth: Option[(String, String)] = None,
                          sslContext: Option[javax.net.ssl.SSLContext] = None)
    extends MqttTransport {
  import MqttWireCodec._

  @volatile private var onMessage: (String, Array[Byte]) => Unit = (_, _) => ()
  @volatile private var onLost: Throwable => Unit = _ => ()
  @volatile private var session: Option[Session] = None
  @volatile private var lastSessionPresent = false
  private val nextPid = new AtomicInteger(0)
  // QoS-2 packet ids received but not yet PUBRELed: the dedup set that
  // makes redelivered PUBLISHes of an in-flight id a no-op (MQTT 4.3.3).
  // Held at TRANSPORT level, not per socket session: a persistent session's
  // exactly-once guarantee spans reconnects (the broker re-sends the
  // PUBLISH with DUP on resume; a per-socket set would deliver it twice).
  // A clean-session connect wipes it — new session, fresh state (4.1).
  private val inboundQos2 = ConcurrentHashMap.newKeySet[Int]()

  private final class Session(val socket: Socket) {
    val out = socket.getOutputStream
    @volatile var closing = false // deliberate disconnect: EOF is not "lost"
    val pendingSubacks = new ConcurrentHashMap[Int, ArrayBlockingQueue[Seq[Int]]]()
    def send(bytes: Array[Byte]): Unit = out.synchronized { out.write(bytes); out.flush() }
  }

  /** Did the last CONNACK resume a broker-side persistent session? When
    * true, subscriptions are already in place and in-flight QoS 1/2
    * deliveries are being replayed — the caller may skip resubscribe.
    */
  def sessionPresent: Boolean = lastSessionPresent

  override def connect(): Unit = {
    if (session.isDefined) throw new IllegalStateException("already connected")
    val sock = sslContext match {
      case Some(ctx) => ctx.getSocketFactory.createSocket() // unconnected TLS socket
      case None => new Socket()
    }
    sock.connect(new InetSocketAddress(host, port), ioTimeoutMs)
    sock.setTcpNoDelay(true)
    sock.setSoTimeout(ioTimeoutMs) // bound the handshake + CONNACK wait
    val in = sock.getInputStream
    val s = new Session(sock)
    try {
      // explicit TLS handshake BEFORE any MQTT bytes: an untrusted broker
      // certificate must fail connect() here, not the first send()
      sock match {
        case ssl: javax.net.ssl.SSLSocket => ssl.startHandshake()
        case _ => ()
      }
      s.send(encodeConnect(clientId, cleanSession = cleanSession, will = will,
        auth = auth.map { case (u, p) => (u, Some(p.getBytes("UTF-8"))) }))
      val ack = readPacket(in).getOrElse(throw new EOFException("closed before CONNACK"))
      if (ack.ptype != CONNACK) throw new IOException(s"expected CONNACK, got type ${ack.ptype}")
      if (ack.body.length < 2) throw new MalformedPacket("short CONNACK")
      if (ack.body(1) != 0) throw new IOException(s"CONNECT refused rc=${ack.body(1)}")
      lastSessionPresent = (ack.body(0) & 1) != 0
      if (cleanSession) inboundQos2.clear() // fresh session, no carried state
    } catch {
      case e: Throwable => try sock.close() catch { case _: Exception => () }; throw e
    }
    sock.setSoTimeout(0) // the reader blocks indefinitely between packets
    session = Some(s)
    val reader = new Thread(() => readLoop(s, in), s"mqtt-reader-$clientId")
    reader.setDaemon(true)
    reader.start()
  }

  private def readLoop(s: Session, in: InputStream): Unit = {
    try {
      var live = true
      while (live) {
        readPacket(in) match {
          case None =>
            live = false
            lost(s, new EOFException("broker closed the connection"))
          case Some(p) => p.ptype match {
            case PUBLISH =>
              val qos = (p.flags >> 1) & 3
              val (topic, consumed) = readUtf8(p.body, 0)
              // a QoS >= 1 delivery carries a packet id between topic and payload
              val off = if (qos >= 1) consumed + 2 else consumed
              if (qos == 2) {
                val pid = readPid(p.body, consumed)
                // deliver on FIRST receipt only: a redelivered PUBLISH of an
                // id still in flight (we PUBRECed, broker missed it or is
                // retrying) must not reach the callback twice
                if (inboundQos2.add(pid))
                  onMessage(topic, java.util.Arrays.copyOfRange(p.body, off, p.body.length))
                if (autoAck) s.send(encodePubrec(pid))
              } else {
                onMessage(topic, java.util.Arrays.copyOfRange(p.body, off, p.body.length))
                // ack AFTER the callback: at-least-once, never at-most-once
                if (qos >= 1 && autoAck) s.send(encodePuback(readPid(p.body, consumed)))
              }
            case PUBREL =>
              // release the id (it may recur for a future message) and
              // complete the handshake; unknown ids still PUBCOMP (4.3.3's
              // idempotent responder rule)
              val pid = readPid(p.body, 0)
              inboundQos2.remove(pid)
              s.send(encodePubcomp(pid))
            case SUBACK =>
              val pid = readPid(p.body, 0)
              val codes: Seq[Int] = p.body.drop(2).toSeq.map(_ & 0xff)
              Option(s.pendingSubacks.get(pid)).foreach(_.offer(codes))
            case PINGRESP => ()
            case _ => () // packets this subscriber never receives
          }
        }
      }
    } catch {
      case e: Throwable => lost(s, e)
    }
  }

  /** Mark the session dead and fire the lost callback EXACTLY once, and
    * only for the session the failure belongs to (a stale reader noticing
    * its old socket die must not kill a newer session).
    */
  private def lost(s: Session, cause: Throwable): Unit = {
    // decide under the monitor, fire OUTSIDE it: the lost callback drives a
    // whole reconnect loop (sleeps included) and must not hold the lock
    // disconnect()/a racing lost() need
    val fire = synchronized {
      if (!s.closing && session.contains(s)) {
        session = None
        try s.socket.close() catch { case _: Exception => () }
        true
      } else false
    }
    if (fire) onLost(cause)
  }

  override def subscribe(filters: Seq[String]): Unit = {
    val s = session.getOrElse(throw new IllegalStateException("subscribe before connect"))
    // 1..65535, never 0; ids only repeat after 65535 allocations (the &0xfffe
    // form collided every other id, silently merging two in-flight entries).
    val pid = Math.floorMod(nextPid.getAndIncrement(), 0xffff) + 1
    val q = new ArrayBlockingQueue[Seq[Int]](1)
    s.pendingSubacks.put(pid, q)
    try {
      s.send(encodeSubscribe(pid, filters, subscribeQos))
      val codes = Option(q.poll(ioTimeoutMs, TimeUnit.MILLISECONDS))
        .getOrElse(throw new IOException(s"SUBACK timeout after $ioTimeoutMs ms"))
      if (codes.size != filters.size || codes.exists(_ >= 0x80))
        throw new IOException(s"SUBACK rejected: $codes")
    } finally s.pendingSubacks.remove(pid)
  }

  override def setCallbacks(m: (String, Array[Byte]) => Unit, l: Throwable => Unit): Unit = {
    onMessage = m; onLost = l
  }

  override def disconnect(): Unit = synchronized {
    session.foreach { s =>
      s.closing = true
      session = None
      try s.send(encodeDisconnect()) catch { case _: Exception => () }
      try s.socket.close() catch { case _: Exception => () }
    }
  }

  override def isConnected: Boolean = session.isDefined
}

/** In-process MQTT 3.1.1 broker over real TCP sockets (loopback only) —
  * the zero-egress stand-in for a production broker, so the WIRE transport
  * is exercised end-to-end: accept loop, CONNECT/CONNACK handshake with
  * protocol validation, per-session subscription state, wildcard-routed
  * QoS-0 fan-out, persistent sessions (clean-session=0: subscriptions +
  * in-flight QoS 1/2 state survive disconnects, CONNACK session-present on
  * resume, offline QoS >= 1 messages queued — MQTT 3.1.2.4), retained
  * messages (last value per topic replayed to new subscriptions — 3.3.1.3),
  * will messages (armed at CONNECT, published when a connection ends without
  * a DISCONNECT packet, discarded on clean close — 3.1.2.5/3.14.4),
  * username/password authentication (CONNACK rc 4 bad credentials / rc 5
  * not authorized — 3.1.4-2/3.2.2.3), optional TLS (pass an
  * [[javax.net.ssl.SSLContext]] holding the server key), and fault
  * injection (refused connects, rejected subscribes, hard connection
  * drops) for the reconnect machinery.
  */
class MockMqttBroker(sslContext: Option[javax.net.ssl.SSLContext] = None) {
  import MqttWireCodec._

  private val server = sslContext match {
    case Some(ctx) =>
      ctx.getServerSocketFactory.createServerSocket(0, 50, InetAddress.getLoopbackAddress)
    case None => new ServerSocket(0, 50, InetAddress.getLoopbackAddress)
  }
  // when set, CONNECT must carry matching credentials: absent credentials
  // are refused rc 5 (not authorized), wrong ones rc 4 (bad user name or
  // password) — the split real brokers (mosquitto) use
  @volatile private var credentials: Option[Map[String, String]] = None
  @volatile private var running = true
  private val refusals = new AtomicInteger(0)
  private val subFailures = new AtomicInteger(0)
  private val sessions = ConcurrentHashMap.newKeySet[ClientSession]()
  // clean-session=0 state by client id, surviving socket death; dropped
  // only when the same client id reconnects with clean-session=1
  private val persistent = new ConcurrentHashMap[String, SessionState]()
  // last retained message per topic: payload + its publish QoS
  private val retained = new ConcurrentHashMap[String, (Array[Byte], Int)]()
  private val subscribeLog = ArrayBuffer[Seq[String]]()

  def port: Int = server.getLocalPort

  /** Refuse the next `n` connection attempts (socket closed pre-CONNACK). */
  def refuseNextConnects(n: Int): Unit = refusals.set(n)

  /** Require CONNECT credentials from now on: `users` maps username to the
    * expected password. Connects without credentials get CONNACK rc 5,
    * wrong credentials rc 4; either way no session is created and any
    * stored persistent state is left untouched (a failed CONNECT must not
    * wipe a session it never joined).
    */
  def requireCredentials(users: Map[String, String]): Unit = credentials = Some(users)

  /** Reject the next `n` SUBSCRIBE packets with 0x80 return codes. */
  def failNextSubscribes(n: Int): Unit = subFailures.set(n)

  /** The session-scoped half of a client: everything MQTT says outlives
    * the network connection for a persistent session (3.1.2.4) —
    * subscriptions, the packet-id counter, sender/receiver in-flight
    * QoS state, and the queue of QoS >= 1 messages that matched while no
    * socket was attached. A clean session gets a fresh one per connect.
    */
  private final class SessionState {
    val filters = ArrayBuffer[(String, Int)]() // (filter, granted QoS)
    val nextPid = new AtomicInteger(0)
    // QoS-1 deliveries awaiting PUBACK: pid -> (topic, payload)
    val pendingAcks = new ConcurrentHashMap[Int, (String, Array[Byte])]()
    // QoS-2 sender state (MQTT 4.3.3): deliveries awaiting PUBREC carry
    // the message (PUBLISH redelivers with DUP); ids awaiting PUBCOMP
    // carry nothing (only PUBREL redelivers)
    val pendingRecs = new ConcurrentHashMap[Int, (String, Array[Byte])]()
    val pendingComps = ConcurrentHashMap.newKeySet[Int]()
    // QoS-2 receiver state for client-to-broker publishes: ids routed but
    // not yet PUBRELed (drop re-sent PUBLISHes of an in-flight id)
    val inboundQos2 = ConcurrentHashMap.newKeySet[Int]()
    // QoS >= 1 messages that matched this session's filters while it had
    // no live socket: (topic, payload, delivery QoS), drained on resume
    val offlineQueue = new java.util.concurrent.ConcurrentLinkedQueue[(String, Array[Byte], Int)]()
  }

  private final class ClientSession(val socket: Socket, val state: SessionState) {
    val out = socket.getOutputStream
    // the connection's will (MQTT 3.1.2.5): armed at CONNECT, cleared by a
    // clean DISCONNECT; whatever is still armed when the session ends fires
    @volatile var will: Option[(String, Array[Byte], Int, Boolean)] = None
    def send(bytes: Array[Byte]): Unit = out.synchronized { out.write(bytes); out.flush() }
  }

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), s"mock-broker-session-${sock.getPort}")
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => () } // server closed
    }
  }, "mock-broker-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(sock: Socket): Unit = {
    val in = sock.getInputStream
    try {
      readPacket(in) match {
        case Some(p) if p.ptype == CONNECT =>
          if (refusals.getAndUpdate(n => math.max(0, n - 1)) > 0) { sock.close(); return }
          val (proto, c) = readUtf8(p.body, 0)
          val level = p.body(c)
          val connFlags = p.body(c + 1) & 0xff
          val cleanFlag = (connFlags & 2) != 0 // connect flags, 3.1.2.4
          val (clientId, cidLen) = readUtf8(p.body, c + 4) // flags byte + 2 keepalive bytes
          // will fields follow the client id when flag bit 2 is set (3.1.3):
          // topic as UTF-8, message as 2-byte-length binary
          var off = c + 4 + cidLen
          val willOpt = if ((connFlags & 4) != 0) {
            val (wt, wc) = readUtf8(p.body, off); off += wc
            val wlen = readPid(p.body, off)
            if (off + 2 + wlen > p.body.length) throw new MalformedPacket("truncated will")
            off += 2 + wlen
            Some((wt, java.util.Arrays.copyOfRange(p.body, off - wlen, off),
              (connFlags >> 3) & 3, (connFlags & 0x20) != 0))
          } else None
          // credentials trail the will in the payload (3.1.3): username as
          // UTF-8 when flag bit 7, password as 2-byte-length binary when
          // flag bit 6
          val userOpt = if ((connFlags & 0x80) != 0) {
            val (u, uc) = readUtf8(p.body, off); off += uc
            Some(u)
          } else None
          val passOpt = if ((connFlags & 0x40) != 0) {
            val plen = readPid(p.body, off)
            if (off + 2 + plen > p.body.length) throw new MalformedPacket("truncated password")
            off += 2 + plen
            Some(new String(p.body, off - plen, plen, "UTF-8"))
          } else None
          val rc =
            if (proto != "MQTT" || level != 4) 1 // unacceptable protocol
            else credentials match {
              case Some(users) => userOpt match {
                case None => 5 // not authorized: no credentials offered
                case Some(u) =>
                  if (users.get(u).exists(p => passOpt.contains(p))) 0
                  else 4 // bad user name or password
              }
              case None => 0
            }
          if (rc != 0) {
            // a refused CONNECT creates no session, arms no will, and must
            // not touch stored persistent state; session-present is 0 on
            // every nonzero rc (3.2.2-4)
            val tmp = new ClientSession(sock, new SessionState)
            tmp.send(encodeConnack(sessionPresent = false, rc))
            sock.close(); return
          }
          // clean session: discard any stored state for this id and start
          // fresh; persistent: resume stored state (session-present) or
          // create-and-store on first contact
          val (state, present) =
            if (cleanFlag) { persistent.remove(clientId); (new SessionState, false) }
            else {
              val fresh = new SessionState
              persistent.putIfAbsent(clientId, fresh) match {
                case null => (fresh, false) // first contact: stored, not resumed
                case prior => (prior, true)
              }
            }
          val cs = new ClientSession(sock, state)
          cs.will = willOpt
          cs.send(encodeConnack(sessionPresent = present, rc))
          sessions.add(cs)
          if (present) resumeSession(cs)
          try sessionLoop(cs, in)
          finally {
            // remove BEFORE firing the will so the dying session can't
            // receive its own last testament
            sessions.remove(cs)
            try sock.close() catch { case _: Exception => () }
            // still armed => the session ended without DISCONNECT (socket
            // death, protocol error, broker shutdown): publish it (3.1.2.5)
            cs.will.foreach { case (t, pl, q, r) => publish(t, pl, q, r) }
          }
        case _ => sock.close() // first packet must be CONNECT (MQTT 3.1.1-0-1)
      }
    } catch {
      case _: Exception => try sock.close() catch { case _: Exception => () }
    }
  }

  private def sessionLoop(cs: ClientSession, in: InputStream): Unit = {
    var live = true
    while (live && running) {
      readPacket(in) match {
        case None => live = false
        case Some(p) => p.ptype match {
          case SUBSCRIBE =>
            val pid = readPid(p.body, 0)
            val fs = ArrayBuffer[(String, Int)]()
            var off = 2
            while (off < p.body.length) {
              val (f, c) = readUtf8(p.body, off)
              val reqQos = math.min(p.body(off + c) & 0xff, 2) // grant at most 2
              off += c + 1
              fs += ((f, reqQos))
            }
            subscribeLog.synchronized { subscribeLog += fs.map(_._1).toSeq }
            if (subFailures.getAndUpdate(n => math.max(0, n - 1)) > 0)
              cs.send(encodeSuback(pid, fs.map(_ => 0x80).toSeq))
            else {
              // upsert, not append: a persistent session resubscribing the
              // same filter REPLACES it (MQTT 3.8.4), never duplicates it
              cs.state.filters.synchronized {
                fs.foreach { case (f, g) =>
                  val i = cs.state.filters.indexWhere(_._1 == f)
                  if (i >= 0) cs.state.filters.remove(i)
                  cs.state.filters += ((f, g))
                }
              }
              cs.send(encodeSuback(pid, fs.map(_._2).toSeq))
              // retained replay (3.3.1.3): each new/refreshed subscription
              // receives the last retained message per matching topic, with
              // the RETAIN flag set, at min(stored QoS, granted QoS)
              fs.foreach { case (f, g) =>
                retained.forEach { (topic, pq) =>
                  if (topic.matches(MqttBus.patternToRegex(f)))
                    deliverTo(cs, topic, pq._1, math.min(pq._2, g), retainFlag = true)
                }
              }
            }
          case PUBLISH => // client-to-broker publish: ack per QoS, then route
            val qos = (p.flags >> 1) & 3
            val retainFlag = (p.flags & 1) != 0
            val (topic, c) = readUtf8(p.body, 0)
            val off = if (qos >= 1) c + 2 else c
            if (qos == 2) {
              val pid = readPid(p.body, c)
              // route on first receipt only; PUBREC either way
              if (cs.state.inboundQos2.add(pid))
                publish(topic, java.util.Arrays.copyOfRange(p.body, off, p.body.length),
                  qos, retainFlag)
              cs.send(encodePubrec(pid))
            } else {
              if (qos == 1) cs.send(encodePuback(readPid(p.body, c)))
              publish(topic, java.util.Arrays.copyOfRange(p.body, off, p.body.length),
                qos, retainFlag)
            }
          case PUBACK =>
            cs.state.pendingAcks.remove(readPid(p.body, 0))
          case PUBREC => // outbound QoS-2 leg 2: stop PUBLISH retries, release
            val pid = readPid(p.body, 0)
            cs.state.pendingRecs.remove(pid)
            cs.state.pendingComps.add(pid)
            cs.send(encodePubrel(pid))
          case PUBREL => // inbound QoS-2 leg 3: forget the id, complete
            val pid = readPid(p.body, 0)
            cs.state.inboundQos2.remove(pid)
            cs.send(encodePubcomp(pid))
          case PUBCOMP => // outbound QoS-2 leg 4: handshake done
            cs.state.pendingComps.remove(readPid(p.body, 0))
          case PINGREQ => cs.send(encodePingResp())
          case DISCONNECT =>
            // clean close: the will MUST be discarded, not published (3.14.4)
            cs.will = None
            live = false
          case _ => ()
        }
      }
    }
  }

  /** Broker-side fan-out: deliver to every live session with a matching
    * filter (`+` one level, `#` rest — [[MqttBus.patternToRegex]]).
    * Delivery QoS per MQTT 3.8.4: min(publish QoS, granted subscription
    * QoS). A QoS-1 delivery carries a fresh packet id and is tracked until
    * the subscriber PUBACKs; [[redeliverPending]] resends survivors with
    * DUP. Returns the number of sessions delivered to (QoS 0: disconnected
    * clients simply miss the message).
    */
  def publish(topic: String, payload: Array[Byte], qos: Int = 0,
              retain: Boolean = false): Int = {
    if (retain) {
      // a retained empty payload CLEARS the topic's retained value (3.3.1.3)
      if (payload.isEmpty) retained.remove(topic)
      else retained.put(topic, (payload, qos))
    }
    var n = 0
    val liveStates = ConcurrentHashMap.newKeySet[SessionState]()
    sessions.forEach { cs =>
      liveStates.add(cs.state)
      val granted = cs.state.filters.synchronized(
        cs.state.filters.collect {
          case (f, g) if topic.matches(MqttBus.patternToRegex(f)) => g
        }.maxOption)
      granted.foreach { g =>
        try { deliverTo(cs, topic, payload, math.min(qos, g), retainFlag = false); n += 1 }
        catch { case _: Exception => () } // session died mid-send
      }
    }
    // detached persistent sessions: queue QoS >= 1 matches for delivery on
    // resume (3.1.2.4's "store further QoS 1 and QoS 2 messages"); QoS 0
    // is dropped exactly like a real broker
    persistent.forEach { (_, st) =>
      if (!liveStates.contains(st)) {
        val granted = st.filters.synchronized(
          st.filters.collect {
            case (f, g) if topic.matches(MqttBus.patternToRegex(f)) => g
          }.maxOption)
        granted.foreach { g =>
          val dqos = math.min(qos, g)
          if (dqos >= 1) st.offlineQueue.add((topic, payload, dqos))
        }
      }
    }
    n
  }

  /** One delivery to one live session at `dqos`, tracking QoS 1/2 in-flight
    * state in the session (persistent sessions carry it across sockets).
    */
  private def deliverTo(cs: ClientSession, topic: String, payload: Array[Byte],
                        dqos: Int, retainFlag: Boolean): Unit = {
    if (dqos == 2) {
      val pid = Math.floorMod(cs.state.nextPid.getAndIncrement(), 0xffff) + 1
      cs.state.pendingRecs.put(pid, (topic, payload))
      cs.send(encodePublish(topic, payload, qos = 2, packetId = pid, retain = retainFlag))
    } else if (dqos == 1) {
      val pid = Math.floorMod(cs.state.nextPid.getAndIncrement(), 0xffff) + 1
      cs.state.pendingAcks.put(pid, (topic, payload))
      cs.send(encodePublish(topic, payload, qos = 1, packetId = pid, retain = retainFlag))
    } else cs.send(encodePublish(topic, payload, retain = retainFlag))
  }

  /** On persistent-session resume: retransmit every in-flight delivery
    * (MQTT 4.4 — reconnect is the one MANDATED retransmission point:
    * un-PUBACKed QoS 1 and un-PUBRECed QoS 2 PUBLISHes with DUP, PUBREL
    * for ids awaiting PUBCOMP), then drain the offline queue as fresh
    * deliveries — all without the client re-subscribing.
    */
  private def resumeSession(cs: ClientSession): Unit = {
    val st = cs.state
    try {
      st.pendingAcks.forEach { (pid, tp) =>
        cs.send(encodePublish(tp._1, tp._2, qos = 1, packetId = pid, dup = true))
      }
      st.pendingRecs.forEach { (pid, tp) =>
        cs.send(encodePublish(tp._1, tp._2, qos = 2, packetId = pid, dup = true))
      }
      st.pendingComps.forEach(pid => cs.send(encodePubrel(pid)))
      var m = st.offlineQueue.poll()
      while (m != null) {
        deliverTo(cs, m._1, m._2, m._3, retainFlag = false)
        m = st.offlineQueue.poll()
      }
    } catch { case _: Exception => () } // session died mid-resume
  }

  def publish(topic: String, payload: String): Int = publish(topic, payload.getBytes("UTF-8"))

  def publish(topic: String, payload: String, qos: Int): Int =
    publish(topic, payload.getBytes("UTF-8"), qos)

  /** In-flight deliveries across all sessions — live AND detached
    * persistent ones (0 = every handshake done): QoS-1 awaiting PUBACK,
    * plus QoS-2 awaiting PUBREC or PUBCOMP.
    */
  def pendingAckCount: Int = {
    val states = ConcurrentHashMap.newKeySet[SessionState]()
    sessions.forEach(cs => states.add(cs.state))
    persistent.forEach((_, st) => states.add(st))
    var n = 0
    states.forEach(st =>
      n += st.pendingAcks.size + st.pendingRecs.size + st.pendingComps.size)
    n
  }

  /** Resend every in-flight delivery — the broker's retry timer, as an
    * explicit test hook so redelivery is deterministic: unacked QoS-1 and
    * un-PUBRECed QoS-2 PUBLISHes go out with DUP; ids awaiting PUBCOMP
    * resend only PUBREL (the message itself is already released, 4.3.3).
    */
  def redeliverPending(): Unit =
    sessions.forEach { cs =>
      cs.state.pendingAcks.forEach { (pid, tp) =>
        try cs.send(encodePublish(tp._1, tp._2, qos = 1, packetId = pid, dup = true))
        catch { case _: Exception => () }
      }
      cs.state.pendingRecs.forEach { (pid, tp) =>
        try cs.send(encodePublish(tp._1, tp._2, qos = 2, packetId = pid, dup = true))
        catch { case _: Exception => () }
      }
      cs.state.pendingComps.forEach { pid =>
        try cs.send(encodePubrel(pid)) catch { case _: Exception => () }
      }
    }

  /** Hard-kill every live connection with no DISCONNECT — a broker crash. */
  def dropAllConnections(): Unit =
    sessions.forEach(cs => try cs.socket.close() catch { case _: Exception => () })

  def sessionCount: Int = sessions.size

  /** Every SUBSCRIBE's filter list, in arrival order. */
  def subscriptionHistory: Seq[Seq[String]] = subscribeLog.synchronized(subscribeLog.toSeq)

  def close(): Unit = {
    running = false
    try server.close() catch { case _: Exception => () }
    dropAllConnections()
  }
}
