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
      "stats_interval" -> "1 minute")
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

    // phase 1: control-plane only — d1 registers with inline transducers
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

    // phase 3 (restart again): delete d1, then more data — now dropped
    MqttBus.publish(ev, """{"action":"delete","thing":{"id":"d1"}}""")
    runOnce()
    MqttBus.publish("openchirp/device/d1/Temp", "22.5")
    runOnce()
    assert(cat.points("oc").count() == 2L,
      "post-delete data must not land (registry gate is per batch)")

    // restarts never double-applied: the fenced sink means the four runs
    // above appended the one non-empty data batch exactly once — the
    // table's whole history is that single commit (version numbering
    // starts at 0)
    assert(cat.pointsTable("oc").version.contains(0L),
      s"expected exactly one commit, got version ${cat.pointsTable("oc").version}")
  }
}
