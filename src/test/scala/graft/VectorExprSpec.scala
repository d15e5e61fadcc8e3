package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

class VectorExprSpec extends SparkSuite {
  import spark.implicits._

  test("codegen dot/norm match the HOF reference on real embeddings") {
    val q = Tables.embeddings(spark, sf)
      .select(col("vec_id"), SimilarityOps.quantize(col("embedding")).as("qv"))
    val cmp = q.select(
      SimilarityOps.dotQ(col("qv"), col("qv")).as("dot_cg"),
      SimilarityOps.dotQHof(col("qv"), col("qv")).as("dot_hof"),
      SimilarityOps.normQ(col("qv")).as("n_cg"),
      SimilarityOps.normQHof(col("qv")).as("n_hof"))
    assert(cmp.filter(col("dot_cg") =!= col("dot_hof") || col("n_cg") =!= col("n_hof")).count() == 0)
    assert(cmp.filter(col("dot_cg") =!= col("n_cg")).count() == 0) // self-dot == norm^2
  }

  test("null propagation") {
    val df = Seq((Some(Array(1L, 2L)), None: Option[Array[Long]]))
      .toDF("a", "b")
    val r = df.select(SimilarityOps.dotQ(col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
  }
}
