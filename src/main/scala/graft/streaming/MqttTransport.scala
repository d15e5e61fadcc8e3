package graft.streaming

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

/** The broker transport seam (R1): the client surface a real MQTT library
  * exposes (connect / subscribe / message + connection-lost callbacks /
  * disconnect — the shape of the reference's paho client,
  * influx_service.py:47-97). The engine never talks to a transport
  * directly; [[MqttConnectionManager]] owns the lifecycle and pumps
  * arriving messages into the offset-indexed log ([[MqttBus]]) that the
  * DSv2 source reads, so broker jitter never reaches the query plan —
  * micro-batches only ever see the log.
  *
  * The zero-egress build ships [[InProcessTransport]]; a production build
  * implements this trait over a real client library and changes nothing
  * else.
  */
trait MqttTransport {
  def connect(): Unit // throws on failure
  def subscribe(filters: Seq[String]): Unit
  def setCallbacks(onMessage: (String, Array[Byte]) => Unit,
                   onConnectionLost: Throwable => Unit): Unit
  def disconnect(): Unit
  def isConnected: Boolean
}

/** Owns a transport's lifecycle the way the reference's client loop does:
  * connect, subscribe, and on EVERY (re)connect re-issue the subscriptions
  * — the reference resubscribes inside on_connect precisely so a dropped
  * session loses no topic filters (influx_service.py:66-76). Connection
  * loss triggers reconnect with exponential backoff (capped), then
  * resubscribe; arriving messages are stamped and appended to the log.
  *
  * Runs driver-side (one subscriber feeding the shared log). At larger
  * ingest volume, run several managers with disjoint topic filters — the
  * log is the scale point, not the subscriber.
  */
class MqttConnectionManager(transport: MqttTransport,
                            filters: Seq[String],
                            log: (String, Array[Byte], Long) => Unit =
                              (t, p, ts) => MqttBus.publish(t, p, ts),
                            baseBackoffMs: Long = 10,
                            maxBackoffMs: Long = 30000,
                            maxReconnectAttempts: Int = Int.MaxValue,
                            nowUs: () => Long = () => System.currentTimeMillis() * 1000L) {

  private val running = new AtomicBoolean(false)
  // connection-lost callbacks arrive on transport threads: the guard makes
  // recovery single-flight (a second drop during an in-progress reconnect
  // must not start a second interleaving loop), and the counter is atomic
  // because `+= 1` on a @volatile is a non-atomic read-modify-write
  private val reconnecting = new AtomicBoolean(false)
  private val pendingDrops = new AtomicInteger(0)
  private val reconnects = new AtomicInteger(0)

  def reconnectCount: Int = reconnects.get()

  def start(): Unit = {
    running.set(true)
    transport.setCallbacks(
      onMessage = (topic, payload) => log(topic, payload, nowUs()),
      onConnectionLost = _ => if (running.get()) guardedReconnect())
    connectAndSubscribe()
  }

  /** Single-flight recovery: exactly one thread drives the reconnect loop;
    * concurrent drops only bump `pendingDrops` and leave. The guard holder
    * clears the counter BEFORE probing the connection (a drop writes
    * connected=false before incrementing, so a wiped signal is always
    * visible as a dead connection on the next probe) and re-checks it both
    * inside the guard and after releasing it — the one window where a drop
    * could otherwise be lost is a signal that arrives between the holder's
    * last check and the CAS release, and the post-release re-check catches
    * exactly that interleaving.
    */
  private def guardedReconnect(): Unit = {
    pendingDrops.incrementAndGet()
    var more = true
    while (more && running.get()) {
      if (!reconnecting.compareAndSet(false, true)) return // holder will see our increment
      try {
        do {
          pendingDrops.set(0)
          if (!transport.isConnected) reconnectLoop()
        } while (running.get() && pendingDrops.get() > 0)
      } finally reconnecting.set(false)
      more = pendingDrops.get() > 0
    }
  }

  def stop(): Unit = {
    running.set(false)
    transport.disconnect()
  }

  private def connectAndSubscribe(): Unit = {
    transport.connect()
    transport.subscribe(filters) // re-issued on every connect: never lost
  }

  private def reconnectLoop(): Unit = {
    var attempt = 0
    var backoff = baseBackoffMs
    var restored = false
    // loop until connect AND subscribe both succeed: a session that
    // connects but fails to subscribe is worse than a dead one (silently
    // receives nothing), so it is torn down and retried, never kept
    while (running.get() && !restored) {
      if (attempt >= maxReconnectAttempts)
        throw new IllegalStateException(s"gave up reconnecting after $attempt attempts")
      try {
        connectAndSubscribe()
        reconnects.incrementAndGet()
        restored = true
      } catch {
        case _: Exception =>
          if (transport.isConnected) transport.disconnect() // half-open session
          attempt += 1
          Thread.sleep(backoff)
          backoff = math.min(backoff * 2, maxBackoffMs)
      }
    }
  }
}

/** In-process transport: a controllable stand-in for a broker connection
  * (the zero-egress environment has no broker). Tests drive connectivity
  * (`failNextConnects`, `dropConnection`) and message arrival (`deliver`)
  * to exercise the manager's reconnect/resubscribe machinery.
  */
class InProcessTransport extends MqttTransport {
  @volatile private var connected = false
  @volatile private var onMessage: (String, Array[Byte]) => Unit = (_, _) => ()
  @volatile private var onLost: Throwable => Unit = _ => ()
  @volatile var failNextConnects: Int = 0
  @volatile var failNextSubscribes: Int = 0
  private val subs = scala.collection.mutable.ArrayBuffer[Seq[String]]()

  override def connect(): Unit = synchronized {
    if (failNextConnects > 0) {
      failNextConnects -= 1
      throw new java.io.IOException("connect refused (simulated)")
    }
    connected = true
  }
  override def subscribe(filters: Seq[String]): Unit = synchronized {
    if (!connected) throw new IllegalStateException("subscribe before connect")
    if (failNextSubscribes > 0) {
      failNextSubscribes -= 1
      throw new java.io.IOException("SUBACK failure (simulated)")
    }
    subs += filters
  }
  override def setCallbacks(m: (String, Array[Byte]) => Unit, l: Throwable => Unit): Unit = {
    onMessage = m; onLost = l
  }
  override def disconnect(): Unit = { connected = false }
  override def isConnected: Boolean = connected

  /** All subscribe calls seen, in order — reconnects must re-subscribe. */
  def subscriptionHistory: Seq[Seq[String]] = synchronized(subs.toSeq)

  /** Broker-side: deliver a message to the client if connected (an MQTT
    * QoS-0 session drops messages while disconnected — recovery of the
    * processed prefix is the checkpoint's job, not the transport's).
    */
  def deliver(topic: String, payload: String): Boolean =
    if (connected) { onMessage(topic, payload.getBytes("UTF-8")); true } else false

  /** Broker-side: kill the connection and fire the lost callback. */
  def dropConnection(cause: String): Unit = {
    connected = false
    onLost(new java.io.IOException(cause))
  }
}
