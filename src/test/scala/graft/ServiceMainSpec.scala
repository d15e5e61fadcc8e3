package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{InProcessTransport, MqttBus}

/** End-to-end drill of the composed service ([[ServiceMain.start]]): the
  * identical wiring `main` runs, driven with the in-process transport and
  * Trigger.AvailableNow across two phases — a restart in the middle proves
  * the checkpoints resume and the fenced append stays exactly-once.
  */
class ServiceMainSpec extends SparkSuite {
  import spark.implicits._

  test("composed service: CDC registers, data ingests ACID + queryable, junk dead-letters, restart resumes") {
    MqttBus.clear()
    val dir = Files.createTempDirectory("svc_e2e").toString
    val conf = Map(
      "service_id" -> "svc1",
      "data_dir" -> dir,
      "influx_database" -> "oc",
      "stats_interval" -> "1 minute",
      "cq_lateness" -> "0 seconds")
    val ev = ServiceMain.eventsTopic("svc1")
    var published = Vector.empty[(String, String)]
    def runOnce(): Unit = {
      val h = ServiceMain.start(spark, conf, new InProcessTransport, rest = None,
        publish = (t, p) => synchronized { published :+= ((t, p)) },
        trigger = Trigger.AvailableNow())
      try h.queries.foreach(q => assert(q.awaitTermination(120000),
        s"query ${q.name} did not drain"))
      finally ServiceMain.stop(h)
    }

    // phase 1: control-plane only — d1 registers with inline transducers;
    // a continuous query registers through the catalog (the service starts
    // it on every subsequent run, like InfluxDB's CQ service)
    val cat0 = new graft.influxql.InfluxCatalog(spark, dir, "oc")
    cat0.run("CREATE DATABASE oc")
    cat0.run("CREATE CONTINUOUS QUERY down ON oc BEGIN " +
      "SELECT count(num) AS c INTO cnt FROM temp GROUP BY time(10u) END")
    // a subscription registers through the catalog; the service fans every
    // ingested numeric point out to it (InfluxDB's subscriber service)
    cat0.run("CREATE SUBSCRIPTION fwd ON oc.autogen DESTINATIONS ALL 'subsvc/dest'")
    MqttBus.publish(ev,
      """{"action":"new","thing":{"id":"d1","transducers":[{"name":"Temp"},{"name":"Hum"}]}}""")
    runOnce()
    val reg = graft.streaming.RegistryMaintenance
      .activeDevices(spark, s"$dir/registry").as[String].collect().toSeq
    assert(reg == Seq("d1"), s"d1 must be registered after phase 1, got $reg")

    // phase 2 (restart): data + junk + a CDC delete for later
    MqttBus.publish("openchirp/device/d1/Temp", "21.5")
    MqttBus.publish("openchirp/device/d1/Mode", "auto")
    MqttBus.publish("openchirp/device/d9/temp", "1.0") // unregistered: dropped
    MqttBus.publish("not/a/real/route/x", "junk")      // dead letter
    runOnce()

    // the ACID points table holds exactly d1's rows, value-typed
    val cat = new graft.influxql.InfluxCatalog(spark, dir, "oc")
    val pts = cat.points("oc")
      .select("device_id", "transducer", "num", "str")
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)))).toSet
    assert(pts == Set(
      ("d1", "temp", Some(21.5), None),
      ("d1", "mode", None, Some("auto"))), s"got $pts")
    // ... and answers InfluxQL directly (live table, no adapter)
    assert(cat.run("SELECT count(num) FROM temp").as[Long].collect().toSeq == Seq(1L))
    assert(cat.run("SHOW MEASUREMENTS").as[String].collect().toSeq == Seq("mode", "temp"))
    // the stats index tracked the append (one row per file per column set)
    assert(new graft.storage.TxLogTable(spark, s"$dir/oc/points_stats")
      .read().count() > 0, "stats index must cover the appended files")
    // junk is quarantined, not swallowed
    val dl = spark.read.parquet(s"$dir/dead_letter").select("topic")
      .as[String].collect().toSeq
    assert(dl == Seq("not/a/real/route/x"), s"got $dl")
    // auto-create cataloged the unseen keys once
    val catalogKeys = spark.read.parquet(s"$dir/transducer_catalog")
      .as[(String, String)].collect().toSet
    assert(catalogKeys == Set(("d1", "temp"), ("d1", "mode")))
    // the subscription forwarded d1's numeric point as line protocol;
    // the string-typed mode point stays local (numeric face only)
    val fwd = MqttBus.slice(0, MqttBus.size).filter(_._1 == "subsvc/dest")
      .map(m => new String(m._2, "UTF-8"))
    assert(fwd.exists(_.startsWith("temp,device=d1 value=21.5 ")), s"got $fwd")
    assert(!fwd.exists(_.startsWith("mode,")), s"got $fwd")

    // phase 2b/2c: two more temp points with EXPLICIT future event times —
    // each run's batch emits CQ windows closed by the PREVIOUS batch's
    // watermark, so after 2c every phase-2/2b bucket is deterministically
    // closed (2c's own bucket stays open, append-mode contract)
    val farUs = System.currentTimeMillis() * 1000L
    MqttBus.publish("openchirp/device/d1/Temp", "30.0".getBytes("UTF-8"),
      farUs + 120L * 1000000L)
    runOnce()
    MqttBus.publish("openchirp/device/d1/Temp", "40.0".getBytes("UTF-8"),
      farUs + 240L * 1000000L)
    runOnce()
    val cnt = new graft.storage.TxLogTable(spark, s"$dir/oc/cnt").read()
      .select("c").as[Long].collect()
    assert(cnt.toSeq == Seq(1L, 1L),
      s"CQ must have downsampled the phase-2 and 2b temp points (2c's own " +
        s"bucket stays open under the append-mode contract), got ${cnt.toSeq}")

    // phase 3 (restart again): delete d1, then more data — now dropped
    MqttBus.publish(ev, """{"action":"delete","thing":{"id":"d1"}}""")
    runOnce()
    MqttBus.publish("openchirp/device/d1/Temp", "22.5")
    runOnce()
    assert(cat.points("oc").count() == 4L,
      "post-delete data must not land (registry gate is per batch)")

    // restarts never double-applied: the fenced sink committed exactly one
    // append per non-empty data batch (phases 2, 2b, 2c) — versions 0..2
    assert(cat.pointsTable("oc").version.contains(2L),
      s"expected exactly three commits, got version ${cat.pointsTable("oc").version}")
  }

  test("full wire drill: authed TLS MQTT ingest + line protocol through HTTP, one InfluxQL surface answers both") {
    MqttBus.clear()
    // the broker end of the reference deployment: TLS listener + CONNECT
    // credential enforcement (service.conf:14-22)
    val ksIn = getClass.getResourceAsStream("/mqtt-test-keystore.p12")
    assert(ksIn != null, "test keystore resource missing")
    val ks = java.security.KeyStore.getInstance("PKCS12")
    ks.load(ksIn, "graft-test".toCharArray)
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, "graft-test".toCharArray)
    val serverCtx = javax.net.ssl.SSLContext.getInstance("TLS")
    serverCtx.init(kmf.getKeyManagers, null, null)
    val broker = new graft.streaming.MockMqttBroker(sslContext = Some(serverCtx))
    broker.requireCredentials(Map("svc-e2e" -> "wire-pw"))
    val caPem = Files.createTempFile("svc-ca", ".pem")
    Files.copy(getClass.getResourceAsStream("/mqtt-test-ca.pem"), caPem,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val dir = Files.createTempDirectory("svc_wire").toString
    val conf = Map(
      "service_id" -> "svc-e2e", "password" -> "wire-pw",
      "client_id" -> "svc-e2e-cli",
      "mqtt_broker" -> "127.0.0.1", "mqtt_broker_port" -> broker.port.toString,
      "enable_ssl" -> "True", "ssl_location" -> caPem.toString,
      "data_dir" -> dir, "influx_database" -> "oc",
      "http_port" -> "0")
    def await(what: String)(cond: => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(cond, s"timed out waiting for $what")
    }
    def busHas(topic: String): Boolean =
      MqttBus.slice(0, MqttBus.size).exists(_._1 == topic)
    try {
      // wrong credentials never get a session — the wire really is gated
      val thief = GraftConfig.mqttTransport(conf + ("password" -> "wrong"))
      intercept[Exception](thief.connect())
      assert(!thief.isConnected)

      // each phase runs the COMPOSED service over the real TLS socket
      // (GraftConfig.mqttTransport — the same construction main uses);
      // messages published while it is subscribed traverse the encrypted
      // wire into the offset log, and the NEXT phase's AvailableNow
      // queries deterministically ingest them
      def phase(drive: ServiceMain.Handles => Unit): Unit = {
        val h = ServiceMain.start(spark, conf, GraftConfig.mqttTransport(conf),
          rest = None, publish = (_, _) => (),
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
        try {
          drive(h)
          h.queries.foreach(q => assert(q.awaitTermination(120000)))
        } finally ServiceMain.stop(h)
      }
      val ev = ServiceMain.eventsTopic("svc-e2e")
      phase { _ =>
        broker.publish(ev,
          """{"action":"new","thing":{"id":"d1","transducers":[{"name":"Temp"}]}}""", 1)
        await("event over TLS")(busHas(ev))
      }
      phase { _ =>
        broker.publish("openchirp/device/d1/Temp", "21.5", 1)
        await("data over TLS")(busHas("openchirp/device/d1/Temp"))
      }
      // final phase: the MQTT point is in the ACID table; line protocol
      // enters as REAL TEXT through the service's own HTTP /write and the
      // one InfluxQL surface answers both doors
      phase { h =>
        val port = h.http.get.boundPort
        val cli = java.net.http.HttpClient.newHttpClient()
        def get(path: String) = cli.send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
        // DDL goes via POST (the GET gate refuses mutating statements)
        val mk = cli.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port/query"))
          .header("Content-Type", "application/x-www-form-urlencoded")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
            s"q=${enc("CREATE DATABASE lp")}")).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        assert(mk.statusCode() == 200, mk.body())
        val w = cli.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port/write?db=lp"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
            "pres,device=d1 value=900 8000000000\n")).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        assert(w.statusCode() == 204, w.body())
        val lpQ = get(s"/query?db=lp&epoch=u&q=${enc("SELECT value FROM pres")}")
        assert(lpQ.body().contains("[8000000, 900.0]"), lpQ.body())
        val mqttQ = get(s"/query?q=${enc("SELECT count(num) FROM temp")}")
        assert(mqttQ.body().contains("1"), mqttQ.body())
      }
      // the wire point really landed through parse -> registry -> ACID
      val cat = new graft.influxql.InfluxCatalog(spark, dir, "oc")
      assert(cat.run("SELECT count(num) FROM temp").as[Long].collect().toSeq
        == Seq(1L), "the TLS-ingested point answers InfluxQL")
    } finally broker.close()
  }

  test("wide-bind drill: http_bind=0.0.0.0 + http_auth + http_ssl compose with the full service") {
    // the hardened listener in one piece: bound beyond loopback, TLS on
    // the wire, credentials enforced — the deployment shape where all
    // three knobs must hold together (plaintext + 0.0.0.0 would put the
    // authenticated credentials on the open network)
    val combined = exportCombinedTlsPem()
    val caPem = exportCaPem()
    val dir = Files.createTempDirectory("svc_widebind").toString
    val conf = Map(
      "data_dir" -> dir, "influx_database" -> "oc",
      "http_port" -> "0", "http_bind" -> "0.0.0.0", "http_auth" -> "true",
      "http_ssl" -> "true", "http_ssl_cert" -> combined.toString)
    val h = ServiceMain.start(spark, conf, new graft.streaming.InProcessTransport,
      rest = None, publish = (_, _) => (),
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    try {
      val cat = new graft.influxql.InfluxCatalog(spark, dir, "oc")
      cat.run("CREATE USER ops WITH PASSWORD 'opw' WITH ALL PRIVILEGES")
      val port = h.http.get.boundPort
      val cli = java.net.http.HttpClient.newBuilder()
        .sslContext(GraftConfig.sslContextFromCaFile(caPem.toString)).build()
      val b = s"https://127.0.0.1:$port"
      def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
      // anonymous is refused (auth-enabled), even over valid TLS
      val anon = cli.send(java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"$b/query?q=${enc("SHOW DATABASES")}")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(anon.statusCode() == 401, s"${anon.statusCode()} ${anon.body()}")
      // credentialed write -> query round-trips over the encrypted wire
      val w = cli.send(java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"$b/write?db=oc&u=ops&p=opw"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          "wbm,device=d9 value=4 6000000000")).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(w.statusCode() == 204, w.body())
      val q = cli.send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(
        s"$b/query?db=oc&u=ops&p=opw&epoch=u&q=${enc("SELECT value FROM wbm")}"))
        .GET().build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(q.statusCode() == 200 && q.body().contains("[6000000, 4.0]"), q.body())
      // plaintext to the widened TLS port is refused outright
      intercept[java.io.IOException] {
        java.net.http.HttpClient.newHttpClient().send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:$port/ping")).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
      }
    } finally ServiceMain.stop(h)
  }

  test("udp input: udp_port wires the datagram face into the composed service") {
    val dir = Files.createTempDirectory("svc_udp").toString
    val conf = Map("data_dir" -> dir, "influx_database" -> "oc",
      "udp_port" -> "0", "udp_batch_timeout_ms" -> "50",
      "udp_precision" -> "u") // influxdb.conf's [[udp]] precision knob
    val h = ServiceMain.start(spark, conf, new graft.streaming.InProcessTransport,
      rest = None, publish = (_, _) => (),
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    try {
      val u = h.udp.get
      assert(u.boundPort > 0)
      val s = new java.net.DatagramSocket()
      try {
        val payload = "udpm,device=d7 value=7.5 7000000".getBytes("UTF-8")
        s.send(new java.net.DatagramPacket(payload, payload.length,
          java.net.InetAddress.getLoopbackAddress, u.boundPort))
      } finally s.close()
      val cat = new graft.influxql.InfluxCatalog(spark, dir, "oc")
      def landed() = cat.points("oc")
        .filter(org.apache.spark.sql.functions.col("transducer") === "udpm")
        .select("device", "ts_us", "value")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      val deadline = System.nanoTime() + 60000000000L
      while (landed().isEmpty && System.nanoTime() < deadline) Thread.sleep(100)
      // the µs wire timestamp lands as-is under udp_precision=u
      assert(landed() == Seq(("d7", 7000000L, 7.5)),
        s"the udp datagram must land at its µs precision: ${landed()}")
    } finally ServiceMain.stop(h)
  }

  test("maintenance compaction folds small streaming appends into one dir") {
    val dir = Files.createTempDirectory("svc_compact").toString
    val cat = new graft.influxql.InfluxCatalog(spark, dir, "oc")
    cat.run("CREATE DATABASE oc")
    for (i <- 0 until 5)
      cat.writePoints("oc", Seq(("a", "temp", i.toLong, i.toDouble))
        .toDF("device", "transducer", "ts_us", "value"))
    val t = cat.pointsTable("oc")
    assert(t.dirPaths(t.version.get).size == 5, "five appends = five dirs")
    val swept = ServiceMain.compactionSweep(spark, dir)
    assert(swept.map(_._1) == Seq("oc/points"), s"got $swept")
    assert(cat.pointsTable("oc").dirPaths(cat.pointsTable("oc").version.get).size == 1,
      "the tick folds the small files into one dir")
    assert(cat.points("oc").count() == 5, "content identical after the fold")
    // a second tick has nothing to fold — no empty commits
    assert(ServiceMain.compactionSweep(spark, dir).isEmpty)
    // vacuum (opt-in) reclaims the five unreferenced pre-compaction dirs
    // at grace 0; the live folded dir survives and stays readable
    val vacuumed = ServiceMain.vacuumSweep(spark, dir, graceMs = 0L)
    assert(vacuumed == Seq("oc" -> 5), s"got $vacuumed")
    assert(cat.points("oc").count() == 5, "live snapshot untouched by vacuum")
    assert(ServiceMain.vacuumSweep(spark, dir, graceMs = 0L).isEmpty)
  }

  test("retention service: the periodic sweep expires points past the default policy") {
    val dir = Files.createTempDirectory("svc_ret").toString
    val cat = new graft.influxql.InfluxCatalog(spark, dir, "oc")
    cat.run("CREATE DATABASE oc")
    cat.run("CREATE RETENTION POLICY keep1h ON oc DURATION 1h DEFAULT")
    val nowUs = System.currentTimeMillis() * 1000L
    cat.writePoints("oc", Seq(
      ("a", "temp", nowUs - 7200L * 1000000L, 1.0), // 2 h old: expired
      ("a", "temp", nowUs - 60L * 1000000L, 2.0))   // 1 min old: kept
      .toDF("device", "transducer", "ts_us", "value"))

    // the forced tick (the timer body): one expiry commit on oc
    val swept = ServiceMain.retentionSweep(spark, dir)
    assert(swept.map(_._1) == Seq("oc"), s"got $swept")
    assert(cat.points("oc").select("value").as[Double].collect().toSeq == Seq(2.0),
      "the 2 h-old point must be gone, the fresh one kept")

    // ... and the service's own timer runs the same sweep: seed another
    // expired point, start the composed service with a 100 ms check
    // interval, and watch the query surface lose it without any forced call
    cat.writePoints("oc", Seq(("b", "temp", nowUs - 7200L * 1000000L, 9.0))
      .toDF("device", "transducer", "ts_us", "value"))
    assert(cat.points("oc").count() == 2)
    val conf = Map("service_id" -> "svcret", "data_dir" -> dir,
      "influx_database" -> "oc", "retention_check_interval_ms" -> "100")
    val h = ServiceMain.start(spark, conf, new InProcessTransport, rest = None,
      publish = (_, _) => (), trigger = Trigger.AvailableNow())
    try {
      assert(h.retention.exists(_.isAlive), "retention timer must be running")
      val deadline = System.currentTimeMillis() + 30000
      while (cat.points("oc").count() != 1 &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(cat.points("oc").select("value").as[Double].collect().toSeq
        == Seq(2.0), "the timer tick must expire the seeded old point")
    } finally ServiceMain.stop(h)
    assert(h.retention.exists(!_.isAlive) || {
      Thread.sleep(500); h.retention.exists(!_.isAlive)
    }, "stop() must interrupt the timer")
  }
}
