package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout for co-located joins: both sides pre-hashed into
  * the same number of buckets on the join key join with NO exchange at
  * query time — the 100 TB answer to repeated large-fact joins (vs. paying
  * a shuffle per query). Bucket count is a layout decision: it bounds task
  * count for bucketed scans, so size it to data volume / target partition
  * size (here small for the local harness).
  *
  * Tables are registered with explicit paths (external), so no metastore
  * warehouse directory is involved.
  */
object BucketedStore {

  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, nBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
