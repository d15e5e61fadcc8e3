package graft

import graft.operators.DedupOps

class MinHashSketchSpec extends SparkSuite {
  import spark.implicits._

  test("TypedImperativeAggregate sketch equals the k-column min formulation") {
    val sh = DedupOps.shingles60(Tables.documents(spark, sf), "doc_id", "text", 3)
    val viaSketch = DedupOps.minhashSignatures(sh, 12)
      .collect().map(r => r.getLong(0) -> (1 to 12).map(r.getLong)).toMap
    val viaCols = DedupOps.minhashSignaturesCols(sh, 12)
      .collect().map(r => r.getLong(0) -> (1 to 12).map(r.getLong)).toMap
    assert(viaSketch == viaCols)
    assert(viaSketch.nonEmpty)
  }

  test("SimHash TypedImperativeAggregate equals the 60-column formulation") {
    val docs = Tables.documents(spark, sf)
    val viaSketch = DedupOps.simhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCols = DedupOps.simhashSignaturesCols(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSketch == viaCols)
    assert(viaSketch.nonEmpty)
  }
}
