package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, TextOps}

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  test("exact dedup key is whitespace-case-normalized") {
    val df = Seq((1L, "Hello World"), (2L, "  hello world "), (3L, "other"))
      .toDF("doc_id", "text")
    val groups = df.groupBy(DedupOps.exactKey(col("text")).as("k"))
      .count().select("count").as[Long].collect().sorted
    assert(groups.toSeq == Seq(1L, 2L))
  }

  test("fingerprint is token-order and duplicate-token insensitive") {
    val df = Seq((1L, "a b c"), (2L, "c b a a"), (3L, "a b d")).toDF("doc_id", "text")
    val fps = df.select(TextOps.fingerprint(col("text")).as("fp")).as[String].collect()
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("minhash LSH pairs are a subset of exact jaccard pairs (no false positives)") {
    val exact = DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val lsh = DedupOps.minhashLshPairs(docs, "doc_id", "text", 3, 12, 6, 0.5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
    // high-similarity pairs must be recalled: P(miss | J>=0.8) = (1-J^2)^6 < 3e-3
    val high = DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(high.subsetOf(lsh), s"LSH missed high-J pairs: ${high -- lsh}")
  }

  test("simhash near-dups include exact duplicates and respect hamming bound") {
    val df = Seq((1L, "spark join hash scan merge sort"), (2L, "spark join hash scan merge sort"),
      (3L, "completely different tokens entirely here now")).toDF("doc_id", "text")
    val pairs = DedupOps.simhashPairs(df, "doc_id", "text", 3)
      .select("i", "j", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 0L)))
  }

  test("shingling skips documents shorter than n tokens") {
    val df = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val sh = DedupOps.shingles(df, "doc_id", "text", 3)
    assert(sh.filter(col("doc_id") === 1).count() == 0)
    assert(sh.filter(col("doc_id") === 2).count() == 2)
  }
}
