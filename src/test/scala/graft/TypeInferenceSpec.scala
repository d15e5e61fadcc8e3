package graft

import org.apache.spark.sql.functions._
import graft.ingest.Ingest

/** Pins the *intended* type-inference precedence of the reference
  * (influx_service.py:149-181; see SURVEY.md §1.2 for the bytes-vs-str bug
  * that makes the reference's boolean branch dead code): float first, exact
  * true/True/false/False boolean, raw-string fallback.
  */
class TypeInferenceSpec extends SparkSuite {
  import spark.implicits._

  private def infer(payload: String): (Option[Double], Option[Boolean], Option[String]) = {
    val df = Ingest.inferTypes(Seq(payload).toDF("payload"))
    val r = df.select("num", "bool", "str").collect().head
    (Option(r.get(0)).map(_.asInstanceOf[Double]),
     Option(r.get(1)).map(_.asInstanceOf[Boolean]),
     Option(r.get(2)).map(_.asInstanceOf[String]))
  }

  test("float parses first") { assert(infer("3.14") == (Some(3.14), None, None)) }
  test("ints collapse to double (influx_service.py:157-159)") {
    assert(infer("7") == (Some(7.0), None, None))
  }
  test("exact-match booleans (influx_service.py:173-178)") {
    assert(infer("true") == (None, Some(true), None))
    assert(infer("True") == (None, Some(true), None))
    assert(infer("false") == (None, Some(false), None))
    assert(infer("False") == (None, Some(false), None))
  }
  test("TRUE is a string — match is exact, not case-insensitive") {
    assert(infer("TRUE") == (None, None, Some("TRUE")))
  }
  test("fallback to raw string (influx_service.py:179-181)") {
    assert(infer("hello") == (None, None, Some("hello")))
    assert(infer("""{"k": 1}""") == (None, None, Some("""{"k": 1}""")))
  }
  test("exactly one branch is non-null") {
    val payloads = Seq("1", "-2.5", "1e3", "true", "False", "TRUE", "x", "")
    val df = Ingest.inferTypes(payloads.toDF("payload"))
    val counts = df.select(
      (col("num").isNotNull.cast("int") + col("bool").isNotNull.cast("int") +
        col("str").isNotNull.cast("int")).as("n")).collect().map(_.getInt(0))
    assert(counts.forall(_ == 1))
  }
}
