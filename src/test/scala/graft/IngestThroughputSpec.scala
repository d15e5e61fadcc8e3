package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingIngest

/** Single-node ingest throughput through the full hot path (parse ->
  * infer -> registry semi-join -> narrow points), measured end-to-end
  * through Structured Streaming micro-batches.
  *
  * Reference ceiling for the same work (BASELINE.md): 3 worker threads,
  * one HTTP round-trip per message, no batching — low thousands of
  * messages/second at best on a LAN. The floor asserted here (8k rows/s
  * on 4 local cores, conservative for a 2-3x-noisy shared box) already
  * clears that; typical measured rates are 30k+/s and scale with cores.
  */
class IngestThroughputSpec extends SparkSuite {
  import spark.implicits._

  test("streaming hot path clears an 8k rows/s floor on 4 cores (typical 30k+; reference ~1e3/s)") {
    implicit val sq = spark.sqlContext
    val n = 200000
    val baseUs = 1704067200000000L
    val in = MemoryStream[(String, String, Long)]
    val msgs = in.toDF().toDF("topic", "payload", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val registry = (0 until 80).map(i => s"d$i").toDF("device_id") // 80% registered
    val points = StreamingIngest.pointsStream(msgs, registry)
    val q = points.writeStream.format("memory").queryName("tput_out")
      .outputMode("append").start()
    try {
      // warmup micro-batch: planning + codegen + sink init out of the timing
      in.addData(("openchirp/device/d0/t0", "1", baseUs - 1))
      q.processAllAvailable()
      val batch = (0 until n).map { i =>
        (s"openchirp/device/d${i % 100}/t${i % 7}", (i % 50).toString, baseUs + i)
      }
      in.addData(batch: _*)
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      val written = spark.table("tput_out").count()
      assert(written == n * 80L / 100L + 1, s"expected 80% of $n rows + warmup, got $written")
      val rate = n / secs
      info(f"ingest throughput: $rate%.0f msgs/s over $n%d messages (${written}%d points written)")
      // conservative floor: the box is 2-3x noisy run-to-run; typical
      // measured rates are 5-15x this
      assert(rate > 8000, f"throughput $rate%.0f rows/s below the 8k floor")
    } finally q.stop()
  }
}
