package graft

import org.apache.spark.sql.functions._
import graft.ingest.Ingest

class IngestSpec extends SparkSuite {
  import spark.implicits._

  test("topic parse extracts device + lower-cased transducer (influx_service.py:130-139)") {
    val df = Ingest.parseTopic(Seq("openchirp/device/D42/TempC").toDF("topic"))
    val r = df.select("device_id", "transducer").as[(String, String)].collect().head
    assert(r == ("D42", "tempc"))
  }

  test("data topic wildcard matches exactly 4 non-empty segments (influx_service.py:389)") {
    val topics = Seq(
      "openchirp/device/d1/t1" -> true,
      "openchirp/device/d1" -> false,
      "openchirp/device/d1/t1/x" -> false,
      "openchirp/service/abc/thing/events" -> false,
      "openchirp/device//t1" -> false)
    val got = topics.map(_._1).toDF("topic")
      .withColumn("m", Ingest.dataTopicFilter).as[(String, Boolean)].collect().toMap
    topics.foreach { case (t, exp) => assert(got(t) == exp, t) }
  }

  test("registry filter keeps only registered devices (influx_service.py:134-137)") {
    val msgs = Seq(("d1", 1.0), ("d2", 2.0), ("d3", 3.0)).toDF("device_id", "v")
    val reg = Seq("d1", "d3").toDF("device_id")
    val kept = Ingest.registryFilter(msgs, reg).select("device_id").as[String].collect().sorted
    assert(kept.toSeq == Seq("d1", "d3"))
  }

  test("wide view maps transducer->num per (device, ts) (influx_service.py:191-197)") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val narrow = Seq(
      ("d1", "temp", ts, Some(21.5), None: Option[Boolean], None: Option[String]),
      ("d1", "hum", ts, Some(0.4), None: Option[Boolean], None: Option[String]))
      .toDF("device_id", "transducer", "ts", "num", "bool", "str")
    val wide = Ingest.wideView(narrow)
    assert(wide.count() == 1)
    val m = wide.select("fields").as[Map[String, Double]].collect().head
    assert(m == Map("temp" -> 21.5, "hum" -> 0.4))
  }

  test("wide view tolerates duplicate redelivered points (max wins, no crash)") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val narrow = Seq(
      ("d1", "temp", ts, Some(21.5), None: Option[Boolean], None: Option[String]),
      ("d1", "temp", ts, Some(21.5), None: Option[Boolean], None: Option[String]), // redelivery
      ("d1", "temp", ts, Some(22.0), None: Option[Boolean], None: Option[String])) // conflict
      .toDF("device_id", "transducer", "ts", "num", "bool", "str")
    val m = Ingest.wideView(narrow).select("fields").as[Map[String, Double]].collect().head
    assert(m == Map("temp" -> 22.0))
  }

  test("dead-letter routing: the three-way topic split is a partition") {
    val eventsTopic = "openchirp/service/s1/thing/events"
    val topics = Seq(
      "openchirp/device/d1/t1",          // data plane
      eventsTopic,                        // control plane
      "openchirp/device/d1",              // malformed -> dead letter
      "something/else/entirely/x/y")      // foreign -> dead letter
    val df = topics.toDF("topic")
    val data = df.filter(Ingest.dataTopicFilter).count()
    val ctrl = df.filter(Ingest.isEventTopic(eventsTopic)).count()
    val dead = df.filter(Ingest.isDeadLetter(eventsTopic)).count()
    assert((data, ctrl, dead) == (1L, 1L, 2L))
    assert(data + ctrl + dead == topics.size) // partition: nothing lost or duplicated
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
