package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingIngest

/** Streaming-ingest throughput main: rows/s through the full hot path
  * (topic parse -> type inference -> registry semi-join -> narrow points)
  * over Structured Streaming micro-batches — the pipeline the reference
  * service spends its life in (its own health metric is
  * points-written-per-interval, `influx_service.py:310-322`), which the
  * per-query Bench surface does not cover.
  *
  * Prints ONE JSON line:
  *   {"metric":"ingest_throughput","value":<rows_per_s>,...}
  * Recorded per round in PROGRESS.jsonl so the hot path has a trend.
  *
  * Methodology mirrors IngestThroughputSpec: a warmup micro-batch takes
  * planning + codegen + sink init out of the window, then one timed batch
  * at sf0.1-like volume. min-of-3 batches, same noise posture as Bench.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_INGEST_ROWS", "500000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.prepare(spark)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val baseUs = 1704067200000000L
    val in = MemoryStream[(String, String, Long)]
    val msgs = in.toDF().toDF("topic", "payload", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val registry = (0 until 800).map(i => s"d$i").toDF("device_id") // 80% registered
    val points = StreamingIngest.pointsStream(msgs, registry)
    val q = points.writeStream.format("noop")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ingest_bench_cp").toString)
      .outputMode("append").start()
    try {
      in.addData(("openchirp/device/d0/t0", "1", baseUs - 1)) // warmup batch
      q.processAllAvailable()
      val secs = (1 to 3).map { pass =>
        val batch = (0 until n).map { i =>
          (s"openchirp/device/d${i % 1000}/t${i % 7}", (i % 50).toString,
            baseUs + pass.toLong * n + i)
        }
        in.addData(batch: _*)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }.min
      val rate = n / secs
      println(f"""{"metric":"ingest_throughput","value":$rate%.0f,"unit":"rows_per_s","rows":$n%d,"secs":$secs%.3f,"cpus":$cpus%s}""")
    } finally {
      q.stop()
      spark.stop()
    }
  }
}
