package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line (driver contract).
  *
  * A full untimed warmup pass runs first so timings reflect steady state
  * (JIT-compiled codegen, loaded parquet footers) rather than JVM startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.prepare(spark)
    spark.sparkContext.setLogLevel("WARN")

    def runAll(): Map[String, Double] = {
      val r = SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        // noop sink forces evaluation of every projected expression;
        // count() would let Catalyst prune unused projections, so map-only
        // queries would measure scan+filter only
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
        name -> (System.nanoTime() - t0) / 1e9
      }
      spark.catalog.clearCache() // queries persist() internal indexes; no cross-run reuse
      System.gc()
      r
    }

    runAll() // warmup
    // min of three timed passes: run-to-run noise on a shared box is 2-3x,
    // which swamps real per-query cost at min-of-2 — a third pass makes
    // round-over-round deltas meaningful
    val passes = Seq(runAll(), runAll(), runAll())
    val results = passes.head.keys.map(k => k -> passes.map(_(k)).min).toMap

    // millisecond precision keeps the single JSON line short enough that
    // the per-query tail survives log truncation
    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v) // locale-proof decimal point
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // stdout is the driver contract, but its capture has truncated the
    // per-query tail in past rounds — persist the same line to a file so
    // every query's timing survives for round-over-round comparison
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(_) => () }
    spark.stop()
  }
}
