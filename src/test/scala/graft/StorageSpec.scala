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
}
