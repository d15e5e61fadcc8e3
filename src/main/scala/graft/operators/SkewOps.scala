package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed (a hot
  * device producing most points is the expected failure mode at fleet
  * scale). AQE's skew-join split handles sort-merge cases at runtime; this
  * explicit salting utility covers the planned-for case and works for any
  * join type.
  */
object SkewOps {

  /** Salted equi-join: the big side gets a per-row salt in [0, salt); the
    * small side is replicated `salt` ways. The hot key's rows then spread
    * over `salt` reducers instead of one. Result set is identical to
    * `big.join(small, key)` (asserted by SkewSpec).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    // salt must be DETERMINISTIC per row content: a monotonically_increasing_id
    // based salt changes on task retry, re-routing rows to different reducers
    // mid-shuffle (lost/duplicated join rows — the SPARK-23207 failure class)
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salt)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit((salt - 1).toLong))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Spread a SMALL input across the session's task slots before CPU-dense
    * map work (per-token md5 hashing, window hashing, codec decodes). Spark
    * sizes scan partitions by BYTES (`maxPartitionBytes`), which is the
    * right model for IO-bound plans — but a small, CPU-dense corpus (one
    * parquet split of text whose per-row work is hashing, not scanning)
    * lands on ONE task and serializes the whole stage: measured 4.2 s ->
    * 1.1 s at 32 slots for the DSIR feature explode on the sf0.1 fixture.
    *
    * Adaptive, so it is scale-safe: only a frame with FEWER partitions than
    * the session's parallelism is repartitioned (a tiny shuffle by
    * construction — the input fits in few splits); a corpus that already
    * arrives in many splits (any real 100 TB table) passes through with NO
    * shuffle. Round-robin repartition is content-neutral: every downstream
    * operator here aggregates or joins by key, so results are unchanged
    * (and task-retry determinism concerns do not arise — unlike salting,
    * nothing routes by the assignment).
    */
  def spreadSmall(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // partition-count probe WITHOUT executing anything: `df.rdd
    // .getNumPartitions` on an AQE plan with upstream shuffles would
    // materialize those stages eagerly (running the query's work twice),
    // and throws on streaming frames. File count from the leaf scan is
    // side-effect-free and is the right signal anyway — the few-split
    // hazard IS a few-file scan. Frames with no input files (in-memory
    // relations, streams, post-shuffle compositions) pass through: a
    // shuffle-bearing frame already has shuffle-determined parallelism,
    // and a stream must never be batch-repartitioned here.
    val nFiles = df.inputFiles.length
    if (nFiles > 0 && nFiles < target) df.repartition(target) else df
  }
}
