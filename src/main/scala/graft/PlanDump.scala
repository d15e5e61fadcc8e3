package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement aid: dump `.explain("formatted")` for
  * every SparkEntry query (or the SPARK_GRAFT_ONLY subset) to
  * `<outDir>/<query>_<suffix>.txt` — the plan evidence the optimization
  * deliverable commits (plans/r18/<q>_before.txt / _after.txt).
  *
  * Usage: sbt "runMain graft.PlanDump plans/r18 before"
  * Same env contract as Bench (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS /
  * SPARK_GRAFT_ONLY); plans are captured pre-execution (AQE shows
  * isFinalPlan=false — shape, exchanges, join strategy and PushedFilters
  * are all present, which is what the plan diffs claim).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = args.headOption.getOrElse("plans/r18")
    val suffix = if (args.length > 1) args(1) else "before"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.prepare(spark)
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val mode = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_(name))) {
        try {
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val t1 = System.nanoTime()
          val plan = df.queryExecution.explainString(mode)
          val t2 = System.nanoTime()
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
            plan.getBytes("UTF-8"))
          // construction (any eager operator work) vs analyze+optimize+plan
          // — the split that tells plan-time overhead from execution
          System.err.println(f"[plandump] $name construct=${(t1 - t0) / 1e9}%.3fs plan=${(t2 - t1) / 1e9}%.3fs")
          spark.catalog.clearCache()
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
