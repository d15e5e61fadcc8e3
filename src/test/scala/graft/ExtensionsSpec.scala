package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps
import graft.plans.{GraftExtensions, RewriteSelfDot}

class ExtensionsSpec extends SparkSuite {
  import spark.implicits._

  test("RewriteSelfDot turns dot_q(x, x) into the one-pass norm kernel") {
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
      .select(SimilarityOps.quantize(col("embedding")).as("qv"))
      .select(SimilarityOps.dotQ(col("qv"), col("qv")).as("selfdot"),
        SimilarityOps.dotQ(col("qv"), SimilarityOps.quantize(col("qv"))).as("otherdot"))
    val rewritten = RewriteSelfDot(df.queryExecution.analyzed).toString
    assert(rewritten.contains("norm_sq_q"), rewritten)          // self dot rewritten
    assert(rewritten.contains("dot_q"), rewritten)              // genuine dot untouched
    // semantics preserved by the rewrite target
    assert(df.collect().head.getLong(0) ==
      Seq(10000000L, 20000000L, 30000000L).map(v => v * v).sum)
  }

  test("GraftExtensions registers against the public extensions hook") {
    new GraftExtensions().apply(new SparkSessionExtensions) // must not throw
  }

  test("custom functions are callable from SQL after registration") {
    graft.plans.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT dot_q(array(1L, 2L), array(3L, 4L)) AS d,
        |       norm_sq_q(array(3L, 4L)) AS n""".stripMargin).collect().head
    assert(r.getLong(0) == 11L && r.getLong(1) == 25L)
    val agg = spark.sql(
      """SELECT simhash_sketch(h) AS s, minhash_sketch(h, 4) AS m
        |FROM VALUES (5L), (9L) AS t(h)""".stripMargin).collect().head
    assert(agg.getLong(0) >= 0L && agg.getSeq[Long](1).length == 4)
  }
}
