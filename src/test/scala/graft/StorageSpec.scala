package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.SkewOps
import graft.storage.PointStore

class StorageSpec extends SparkSuite {
  import spark.implicits._

  test("point store: date partitioning + partition pruning in the scan") {
    val path = Files.createTempDirectory("pointstore").toString + "/points"
    val points = Tables.events(spark, sf)
      .select(concat(lit("dev"), col("user_id")).as("device_id"),
        col("event_type").as("transducer"), col("ts"), col("value").as("num"))
    PointStore.write(points, path)

    // physical layout: one directory per date
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("p_date=")))

    val ranged = PointStore.readRange(spark, path, "2024-01-10", "2024-01-12")
    val p = ranged.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PartitionFilters") && p.contains("p_date"), p)

    // correctness of the range read vs. direct filter on the source
    val expected = points
      .filter(col("ts") >= lit("2024-01-10").cast("timestamp") &&
        col("ts") < lit("2024-01-12").cast("timestamp")).count()
    assert(ranged.count() == expected)
  }

  test("point store: retention expiry drops whole date partitions, no rewrite") {
    val path = Files.createTempDirectory("pointstore_ttl").toString + "/points"
    val points = Tables.events(spark, sf)
      .select(concat(lit("dev"), col("user_id")).as("device_id"),
        col("event_type").as("transducer"), col("ts"), col("value").as("num"))
    PointStore.write(points, path)
    val before = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    // remember a surviving file's mtime to prove nothing was rewritten
    val keptDir = new java.io.File(path, "p_date=2024-01-20")
    val mtimes = keptDir.listFiles().map(f => f.getName -> f.lastModified()).toMap

    val dropped = PointStore.expirePartitionsBefore(path, "2024-01-10")
    assert(dropped.toSet == before.filter(_ < "p_date=2024-01-10"), s"dropped $dropped")
    val after = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(after == before -- dropped)
    // surviving partitions untouched (pure directory deletes)
    assert(keptDir.listFiles().map(f => f.getName -> f.lastModified()).toMap == mtimes)
    // the table still reads, and only post-cutoff dates remain
    val minDate = spark.read.parquet(path).agg(min(col("p_date"))).head().getDate(0)
    assert(minDate.toString >= "2024-01-10")
    // idempotent: a second run drops nothing
    assert(PointStore.expirePartitionsBefore(path, "2024-01-10").isEmpty)
  }

  test("point store: expiry tombstones hide crashed half-deletes from readers") {
    val path = Files.createTempDirectory("pointstore_tomb").toString + "/points"
    val points = Tables.events(spark, sf)
      .select(concat(lit("dev"), col("user_id")).as("device_id"),
        col("event_type").as("transducer"), col("ts"), col("value").as("num"))
    PointStore.write(points, path)
    val full = spark.read.parquet(path).count()
    // simulate a crash mid-delete: a partition renamed to its tombstone but
    // not yet removed (exactly the state expirePartitionsBefore's rename
    // step leaves if the process dies before deleteTree)
    val victim = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("p_date=")).min
    val vDir = java.nio.file.Paths.get(path, victim)
    val vCount = spark.read.parquet(path)
      .filter(col("p_date") === victim.stripPrefix("p_date=")).count()
    java.nio.file.Files.move(vDir,
      vDir.resolveSibling(s"_expired-${victim.replace('=', '-')}-crash"))
    // a fresh scan sees a consistent table: the tombstone is invisible (no
    // live-looking partial partition), only the renamed partition is gone
    assert(spark.read.parquet(path).count() == full - vCount)
    // the next expiry call sweeps the leftover tombstone even when its own
    // cutoff drops nothing
    PointStore.expirePartitionsBefore(path, "1970-01-01")
    assert(!new java.io.File(path).listFiles().exists(_.getName.startsWith("_expired-")))
  }

  test("bucketed tables join with no exchange (co-located layout)") {
    import graft.storage.BucketedStore
    val base = Files.createTempDirectory("bucketed").toString
    BucketedStore.writeBucketed(Tables.lineitem(spark, sf), "li_b", s"$base/li",
      "l_orderkey", 4, sortCol = Some("l_orderkey"))
    BucketedStore.writeBucketed(Tables.orders(spark, sf), "o_b", s"$base/o",
      "o_orderkey", 4, sortCol = Some("o_orderkey"))
    val joined = BucketedStore.table(spark, "li_b")
      .join(BucketedStore.table(spark, "o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"), plan)
    if (plan.contains("SortMergeJoin")) {
      val shuffles = "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r.findAllIn(plan).size
      assert(shuffles == 0, s"bucketed join still shuffled:\n$plan")
    }
    // result parity with the unbucketed join
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
  }

  test("stats index: device-range read skips files and matches the full-scan result") {
    import graft.storage.StatsIndex
    val base = Files.createTempDirectory("statsidx").toString
    val path = s"$base/points"; val statsPath = s"$base/stats"
    val points = Tables.events(spark, sf)
      .select(col("user_id").as("device_id"), col("ts"), col("value").as("num"))
      // several files per date partition, each covering a tight device range
      .withColumn("p_date", to_date(col("ts")))
      .repartitionByRange(8, col("device_id"))
      .sortWithinPartitions("device_id", "ts")
    points.write.partitionBy("p_date").mode("overwrite").parquet(path)

    val stats = StatsIndex.build(spark.read.parquet(path), Seq("device_id"))
    StatsIndex.write(stats, statsPath)
    val nFiles = stats.count()

    val lo = lit(10L); val hi = lit(19L)
    val candidates = StatsIndex.candidateFiles(
      StatsIndex.read(spark, statsPath), "device_id", lo, hi)
    assert(candidates.nonEmpty && candidates.size < nFiles,
      s"no skipping: ${candidates.size} of $nFiles files")

    val pruned = StatsIndex.readRange(spark, statsPath, path, "device_id", lo, hi)
    // partition column survives the leaf-file read (basePath)
    assert(pruned.columns.contains("p_date"))
    val prunedSel = pruned.select("device_id", "ts", "num", "p_date")
    val full = spark.read.parquet(path)
      .filter(col("device_id") >= 10L && col("device_id") <= 19L)
      .select("device_id", "ts", "num", "p_date")
    assert(prunedSel.count() == full.count()
      && prunedSel.except(full).isEmpty && full.except(prunedSel).isEmpty)
    // empty candidate range: empty result with the table schema, no error
    val none = StatsIndex.readRange(spark, statsPath, path, "device_id", lit(-99L), lit(-50L))
    assert(none.count() == 0 && none.columns.contains("p_date"))
  }

  test("indexed point store: single-device range read skips files and matches direct filter") {
    val base = Files.createTempDirectory("psidx").toString
    val points = Tables.events(spark, sf)
      .select(concat(lit("dev"), lpad(col("user_id").cast("string"), 4, "0")).as("device_id"),
        col("ts"), col("value").as("num"))
    PointStore.writeIndexed(points, s"$base/points", s"$base/stats")
    val got = PointStore.readDeviceRange(spark, s"$base/points", s"$base/stats",
      "dev0007", "2024-01-05", "2024-01-20")
    val want = points.filter(col("device_id") === "dev0007" &&
      col("ts") >= lit("2024-01-05").cast("timestamp") &&
      col("ts") < lit("2024-01-20").cast("timestamp"))
    assert(got.count() == want.count() && want.count() > 0)
    // the stats index actually prunes: candidate files < total files
    import graft.storage.StatsIndex
    val stats = StatsIndex.read(spark, s"$base/stats")
    val cand = StatsIndex.candidateFiles(stats, "device_id", lit("dev0007"), lit("dev0007"))
    assert(cand.nonEmpty && cand.size < stats.count(),
      s"no file skipping: ${cand.size} of ${stats.count()}")
  }

  test("z-order layout skips files on BOTH dimensions; linear sort only on one") {
    import graft.storage.{StatsIndex, ZOrder}
    val base = Files.createTempDirectory("zorder").toString
    // 128x128 grid: two independent uniform dimensions
    val grid = spark.range(0, 16384).select(
      (col("id") % 128).as("x"), expr("id div 128").as("y"), col("id").as("v"))

    ZOrder.write(grid, col("x"), col("y"), bits = 7, nFiles = 16, s"$base/z")
    val zstats = StatsIndex.build(spark.read.parquet(s"$base/z"), Seq("x", "y"))
    StatsIndex.write(zstats, s"$base/zstats")
    val zN = zstats.count()
    val zx = StatsIndex.candidateFiles(
      StatsIndex.read(spark, s"$base/zstats"), "x", lit(0L), lit(15L))
    val zy = StatsIndex.candidateFiles(
      StatsIndex.read(spark, s"$base/zstats"), "y", lit(0L), lit(15L))
    assert(zx.size < zN && zy.size < zN,
      s"z-order must skip on both dims: x=${zx.size}, y=${zy.size} of $zN")

    // linear x-sort: tight on x, but every file spans the whole y domain
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$base/lin")
    val lstats = StatsIndex.build(spark.read.parquet(s"$base/lin"), Seq("x", "y"))
    StatsIndex.write(lstats, s"$base/lstats")
    val ly = StatsIndex.candidateFiles(
      StatsIndex.read(spark, s"$base/lstats"), "y", lit(0L), lit(15L))
    assert(ly.size == lstats.count(),
      "x-sorted layout should NOT skip on y — that asymmetry is what z-order removes")

    // pruned read equals the full-scan filter
    val pruned = StatsIndex.readRange(spark, s"$base/zstats", s"$base/z", "y", lit(0L), lit(15L))
    val full = spark.read.parquet(s"$base/z").filter(col("y") >= 0L && col("y") <= 15L)
    assert(pruned.count() == full.count() && full.count() == 16L * 128L)
  }

  test("BIGMIN z-range scan: box decomposition reads fewer files than the naive zv interval") {
    import graft.storage.{StatsIndex, ZOrder}
    val base = Files.createTempDirectory("zrange").toString
    val grid = spark.range(0, 16384).select(
      (col("id") % 128).as("x"), expr("id div 128").as("y"), col("id").as("v"))
    ZOrder.writeIndexed(grid, col("x"), col("y"), bits = 7, nFiles = 16,
      s"$base/z", s"$base/stats")
    // a y-band straddling the y=64 high-bit boundary: the naive zv interval
    // [z(xLo,yLo), z(xHi,yHi)] spans nearly the whole curve
    val (xLo, xHi, yLo, yHi) = (0L, 127L, 60L, 67L)
    val ranges = ZOrder.zRanges(xLo, xHi, yLo, yHi, bits = 7, maxRanges = 256)
    // uncoarsened decomposition covers EXACTLY the box's point count
    assert(ranges.map { case (lo, hi) => hi - lo + 1 }.sum ==
      (xHi - xLo + 1) * (yHi - yLo + 1))
    val stats = StatsIndex.read(spark, s"$base/stats")
    val boxFiles = ZOrder.candidateFilesForRanges(stats, ranges)
    val naive = ZOrder.candidateFilesForRanges(stats,
      Seq((ZOrder.zvalue2Long(xLo, yLo, 7), ZOrder.zvalue2Long(xHi, yHi, 7))))
    assert(boxFiles.nonEmpty && boxFiles.size < naive.size,
      s"z-run pruning must beat the naive interval: ${boxFiles.size} vs ${naive.size} files")
    // the pruned read is exact: equals the full-scan box filter
    val pruned = ZOrder.readBox(spark, s"$base/stats", s"$base/z", "x", "y",
      xLo, xHi, yLo, yHi, bits = 7, maxRanges = 256)
      .agg(count(lit(1)), sum(col("v"))).as[(Long, Long)].head()
    val full = spark.read.parquet(s"$base/z")
      .filter(col("x").between(xLo, xHi) && col("y").between(yLo, yHi))
      .agg(count(lit(1)), sum(col("v"))).as[(Long, Long)].head()
    assert(pruned == full && pruned._1 == 128L * 8L)
    // a coarsened (budget-capped) decomposition stays correct, just wider
    val coarse = ZOrder.readBox(spark, s"$base/stats", s"$base/z", "x", "y",
      xLo, xHi, yLo, yHi, bits = 7, maxRanges = 4)
      .agg(count(lit(1)), sum(col("v"))).as[(Long, Long)].head()
    assert(coarse == full)
  }

  test("TxLogTable OPTIMIZE ZORDER: content preserved, both-dim skipping, rewrite fences the append feed") {
    import graft.storage.{StatsIndex, TxLogTable}
    val t = new TxLogTable(spark, Files.createTempDirectory("txz").toString + "/t")
    val grid = spark.range(0, 4096).select(
      (col("id") % 64).as("x"), expr("id div 64").as("y"), col("id").as("v"))
    t.append(grid)                                        // v0
    t.optimizeZOrder(col("x"), col("y"), bits = 6, nFiles = 8) // v1 (rewrite)
    // content identical
    assert(t.read().as[(Long, Long, Long)].collect().toSet ==
      grid.as[(Long, Long, Long)].collect().toSet)
    // the clustered files skip on BOTH dimensions
    val stats = StatsIndex.build(t.read(), Seq("x", "y"))
    val n = stats.count()
    val cx = StatsIndex.candidateFiles(stats, "x", lit(0L), lit(7L))
    val cy = StatsIndex.candidateFiles(stats, "y", lit(0L), lit(7L))
    assert(cx.size < n && cy.size < n, s"x=${cx.size}, y=${cy.size} of $n")
    // the rewrite fences the O(delta) append feed
    val e = intercept[IllegalStateException](t.appendsBetween(0L, 1L))
    assert(e.getMessage.contains("not appends"))
  }

  test("dynamic partition pruning: dim-side filter prunes fact date partitions at runtime") {
    val base = Files.createTempDirectory("dpp").toString
    val points = Tables.events(spark, sf)
      .select(col("user_id").as("device_id"), col("ts"), col("value").as("num"))
    PointStore.write(points, s"$base/points")
    val fact = PointStore.read(spark, s"$base/points")
    // calendar dimension with a non-partition attribute to filter on
    fact.select(col("p_date")).distinct()
      .withColumn("day_tag", dayofmonth(col("p_date")))
      .write.parquet(s"$base/dim")
    val dim = spark.read.parquet(s"$base/dim")
    val joined = fact.join(dim.filter(col("day_tag") <= 3), Seq("p_date"))
      .groupBy("p_date").agg(count(lit(1)).as("n"))
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"no runtime partition pruning on the fact scan:\n$p")
  }

  test("gap fill keeps data in a trailing partial bucket") {
    import graft.operators.TimeSeriesOps
    val df = Seq(("s1", 0L, 1.0), ("s1", 2_200_000L, 5.0)) // second point in partial bucket 2
      .toDF("k", "ts_us", "v")
    val out = TimeSeriesOps.gapFillLocf(df, col("k"), col("ts_us"), col("v"),
        fromUs = 0L, untilUs = 2_500_000L, stepUs = 1_000_000L)
      .select("bucket", "bucket_sum", "filled_sum")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(out == Set(
      (0L, Some(1.0), Some(1.0)),
      (1L, None, Some(1.0)),        // LOCF carries bucket 0's value
      (2L, Some(5.0), Some(5.0))))  // partial bucket retained
  }

  test("salted join equals plain join on skewed data") {
    // hot key: 90% of rows share one key
    val big = spark.range(0, 10000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 50).as("k"),
        col("id").as("v"))
    val small = spark.range(0, 50).select(col("id").as("k"), (col("id") * 100).as("w"))
    val plain = big.join(small, "k").agg(count(lit(1)), sum(col("v") + col("w")))
      .as[(Long, Long)].collect().head
    val salted = SkewOps.saltedJoin(big, small, "k", 8).agg(count(lit(1)), sum(col("v") + col("w")))
      .as[(Long, Long)].collect().head
    assert(plain == salted)
  }

  test("spreadSmall: few-file scan spreads to session slots, shuffled/in-memory frames untouched") {
    val target = spark.sparkContext.defaultParallelism
    val dir = java.nio.file.Files.createTempDirectory("spread").toString + "/t"
    spark.range(0, 1000).select(col("id"), (col("id") * 3).as("v"))
      .coalesce(1).write.parquet(dir)
    val one = spark.read.parquet(dir)
    val spread = SkewOps.spreadSmall(one)
    assert(one.rdd.getNumPartitions == 1)
    assert(spread.rdd.getNumPartitions == target, "single-file scan must fan out")
    // content-neutral: keyed aggregation identical either way
    assert(spread.groupBy(col("id") % 7).agg(sum("v")).as[(Long, Long)].collect().toSet ==
      one.groupBy(col("id") % 7).agg(sum("v")).as[(Long, Long)].collect().toSet)
    // a frame with NO file scan (in-memory / post-shuffle) passes through —
    // the probe must not call .rdd, which would eagerly run AQE stages
    val shuffled = spark.range(0, 1000).repartition(target + 5).toDF()
    assert(SkewOps.spreadSmall(shuffled) eq shuffled,
      "a fileless frame must pass through untouched")
    // a filter on top of the scan keeps the scan's file count visible
    assert(SkewOps.spreadSmall(one.filter(col("id") % 2 === 0))
      .rdd.getNumPartitions == target)
  }
}
