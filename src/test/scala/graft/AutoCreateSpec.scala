package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.AutoCreate

class AutoCreateSpec extends SparkSuite {
  import spark.implicits._

  test("unseen keys: batch-local dedup + anti-join against catalog") {
    val batch = Seq(("d1", "t1"), ("d1", "t1"), ("d1", "t2"), ("d2", "t1"))
      .toDF("device_id", "transducer")
    val catalog = Seq(("d1", "t1")).toDF("device_id", "transducer")
    val unseen = AutoCreate.unseenKeys(batch, catalog)
      .as[(String, String)].collect().toSet
    assert(unseen == Set(("d1", "t2"), ("d2", "t1")))
  }

  test("streaming auto-create fires once per new key across micro-batches") {
    implicit val sq = spark.sqlContext
    val created = new ConcurrentLinkedQueue[(String, String)]()
    val catalogPath = Files.createTempDirectory("autocreate_cat").toString + "/catalog"
    val cp = Files.createTempDirectory("autocreate_cp").toString
    val in = MemoryStream[(String, String)]
    val points = in.toDF().toDF("device_id", "transducer")
    val q = AutoCreate.start(points, catalogPath, cp,
      create = (d, t) => created.add((d, t)), trigger = Trigger.ProcessingTime(0))
    try {
      in.addData(("d1", "temp"), ("d1", "temp"), ("d1", "hum"))
      q.processAllAvailable()
      in.addData(("d1", "temp"), ("d2", "temp")) // temp@d1 already known
      q.processAllAvailable()
      val calls = created.toArray(Array.empty[(String, String)]).toSeq
      assert(calls.toSet == Set(("d1", "temp"), ("d1", "hum"), ("d2", "temp")))
      assert(calls.size == 3, s"duplicate creation calls: $calls")
      val cat = spark.read.parquet(catalogPath).as[(String, String)].collect().toSet
      assert(cat == Set(("d1", "temp"), ("d1", "hum"), ("d2", "temp")))
    } finally q.stop()
  }

  test("approx aggregates stay within sketch error of exact values") {
    // the query itself compares each sketch against the exact value and
    // emits booleans (the oracle-able shape); every flag must be true
    val rows = SparkEntry.queries("q_approx_aggs")(spark, sf)
      .select("event_type", "users_ok", "p50_ok", "p95_ok")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (k, u, p50, p95) =>
      assert(u && p50 && p95, s"$k: users_ok=$u p50_ok=$p50 p95_ok=$p95")
    }
  }
}
