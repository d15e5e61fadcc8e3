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
      // codegen class cache sized for the full query surface (static conf,
      // so GraftSession.prepare cannot set it): the 100-entry default
      // churns across 162 queries and janino-recompiles every plan every
      // pass, defeating the warmup pass's purpose. Compiler cache only —
      // every timed pass still computes from the parquet inputs.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.prepare(spark)
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run to named queries — a
    // profiling aid only; the driver never sets it, so driver benches
    // always cover the full surface
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }

    // a failed query must NOT get a timing: an instantly-erroring engine
    // would otherwise "win" the bench with innocent 0.05 s rows (r8 lesson)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def runAll(): Map[String, Double] = {
      val r = selected.flatMap { case (name, fn) =>
        val t0 = System.nanoTime()
        // noop sink forces evaluation of every projected expression;
        // count() would let Catalyst prune unused projections, so map-only
        // queries would measure scan+filter only
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          // several operators persist() internal frames (shingle indexes,
          // normalized vectors) and cannot unpersist them — the returned
          // plan still references the blocks. Left in place they accumulate
          // across the pass and the storage pressure taxes every later
          // query (r9: q_contamination 2.9 s -> 10 s under a contended
          // box). Dropping cache after each query keeps timings independent
          // of query order; the clear itself runs outside the timed window.
          spark.catalog.clearCache()
          Some(name -> dt)
        } catch { case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator
            .next().take(200)
          errors(name) = msg
          System.err.println(s"[bench] $name FAILED: $msg")
          None
        }
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
    val results = passes.head.keys
      .filter(k => passes.forall(_.contains(k)))
      .map(k => k -> passes.map(_(k)).min).toMap

    // millisecond precision keeps the single JSON line short enough that
    // the per-query tail survives log truncation
    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v) // locale-proof decimal point
    // escape control chars too (a tab in an exception message must not
    // produce an invalid JSON line) — same contract as Verify's escaper
    def qstr(s: String) = "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < 0x20 => "\\u%04x".format(c.toInt)
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => qstr(k) + ":" + qstr(v) }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // per-query min/median/spread over the three passes for the slowest
    // queries: the box's run-to-run noise is 2-3x, and round-over-round
    // regressions on the heavies keep being re-litigated against it —
    // a committed spread turns "is 4.4 s real?" into a lookup
    val variance = results.toSeq.sortBy(-_._2).take(6).map { case (k, _) =>
      val ts = passes.map(_(k)).sorted
      s""""$k":{"min":${fmt(ts.head)},"median":${fmt(ts(ts.size / 2))},"spread":${fmt(ts.last - ts.head)}}"""
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_ok":${results.size},"n_failed":${errors.size},"errors":$errs,"variance":$variance,"queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // stdout is the driver contract, but its capture has truncated the
    // per-query tail in past rounds — persist the same line to a file so
    // every query's timing survives for round-over-round comparison
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(_) => () }
    // The full line above is ~4 KB and the driver's stdout capture keeps
    // only a ~2 KB TAIL, decapitating it (PERF parsed:null for two rounds).
    // Print a second, SHORT summary as the LAST line — <300 B, so any tail
    // capture retains one complete parseable record. Additions-only: the
    // full line (and its file copy) is unchanged, so round-over-round
    // per-query comparison stays valid.
    val shortLine = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_ok":${results.size},"n_failed":${errors.size},"errors":$errs,"sf":"$sfDir"}"""
    println(shortLine)
    spark.stop()
  }
}
