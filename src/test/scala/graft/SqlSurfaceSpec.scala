package graft

/** The raw-SQL entry point (BASELINE: "query via Spark SQL"): every fixture
  * as a view, engine functions callable from SQL, answers identical to the
  * DataFrame formulations.
  */
class SqlSurfaceSpec extends SparkSuite {
  import spark.implicits._

  Tables.registerViews(spark, sf)

  test("relational SQL over the views matches the DataFrame plan") {
    val sql = spark.sql(
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1""".stripMargin)
      .as[(String, Long)].collect().toSet
    val df = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .filter(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING")
      .groupBy("o_orderpriority")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .as[(String, Long)].collect().toSet
    assert(sql == df && sql.nonEmpty)
  }

  test("time-series SQL uses the dual ts surface (ns pushdown column + timestamp)") {
    val n = spark.sql(
      """SELECT count(*) FROM events
        |WHERE ts_ns >= 1704844800000000000 AND ts >= TIMESTAMP '2024-01-10 00:00:00'
        |""".stripMargin).as[Long].collect().head
    assert(n > 0)
  }

  test("custom codegen expressions are callable from raw SQL") {
    val rows = spark.sql(
      """SELECT a.vec_id,
        |  dot_q(transform(a.embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)),
        |        transform(a.embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT))) AS d,
        |  norm_sq_q(transform(a.embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT))) AS nsq
        |FROM embeddings a WHERE a.vec_id < 5""".stripMargin)
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 5)
    // dot_q(x, x) must equal norm_sq_q(x) — also exercises the RewriteSelfDot rule path
    rows.foreach { case (_, d, nsq) => assert(d == nsq && nsq > 0) }
  }

  test("curation operators are callable from raw SQL and match the Column forms") {
    import org.apache.spark.sql.functions._
    val sql = spark.sql(
      """SELECT doc_id, lang_id(text) AS lid, quality_score(text) AS q,
        |  fingerprint(text) AS fp, split_assign(doc_id) AS sp
        |FROM documents WHERE doc_id < 40""".stripMargin)
      .as[(Long, String, Double, String, String)].collect().toSet
    val df = Tables.documents(spark, sf).filter(col("doc_id") < 40)
      .select(col("doc_id"),
        graft.operators.TextOps.langId(col("text")).as("lid"),
        graft.operators.TextOps.qualityFeatures(col("text")).last._2.as("q"),
        graft.operators.TextOps.fingerprint(col("text")).as("fp"),
        graft.operators.SampleOps.splitAssign(col("doc_id")).as("sp"))
      .as[(Long, String, Double, String, String)].collect().toSet
    assert(sql == df && sql.nonEmpty)
    // zvalue: interleaving in SQL matches the storage-layer expression
    val z = spark.sql("SELECT zvalue(5, 3, 3)").as[Long].head()
    assert(z == 27L) // 5=101, 3=011 -> interleaved y1x1 y0x0: 011011
  }

  test("sketch aggregates are callable from raw SQL") {
    val sig = spark.sql(
      """SELECT doc_id % 3 AS g, minhash_sketch(CAST(doc_id AS BIGINT), 4) AS sig
        |FROM documents GROUP BY 1""".stripMargin)
      .select("sig").as[Seq[Long]].collect()
    assert(sig.length == 3 && sig.forall(_.length == 4))
  }
}
