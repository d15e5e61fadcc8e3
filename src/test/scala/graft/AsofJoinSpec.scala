package graft

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSuite {

  test("binned range join equals the naive theta join") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pts = Seq((1L, 100L), (2L, 250L), (3L, 999L), (4L, 1000L), (5L, 1500L))
      .toDF("pid", "ts_us")
    val ivs = Seq((10L, 0L, 300L), (11L, 250L, 1000L), (12L, 900L, 2000L))
      .toDF("iv", "s_us", "e_us")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iv").as[(Long, Long)].collect().toSet
    val naive = rows(pts.join(ivs, col("ts_us") >= col("s_us") && col("ts_us") < col("e_us")))
    // bin width deliberately misaligned with interval boundaries
    val binned = rows(graft.operators.RangeJoin.pointInInterval(
      pts, "ts_us", ivs, "s_us", "e_us", binUs = 77L))
    assert(binned == naive && naive.nonEmpty)
    // boundary semantics: start inclusive (250 joins [250,1000)),
    // end exclusive (1000 does NOT join [250,1000) but does join [900,2000))
    assert(naive.contains((2L, 10L)) && naive.contains((2L, 11L)))
    assert(naive.contains((3L, 11L)))
    assert(!naive.contains((4L, 11L)) && naive.contains((4L, 12L)))
  }
  import spark.implicits._

  test("asof picks most recent right row at or before left ts, per key") {
    val left = Seq(("a", 10L, "l1"), ("a", 25L, "l2"), ("b", 5L, "l3"))
      .toDF("k", "ts", "tag")
    val right = Seq(("a", 5L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0), ("b", 9L, 9.0))
      .toDF("k", "rts", "v")
    val got = AsofJoin.asof(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .select("tag", "right_rts", "right_v").collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(got == Set(
      ("l1", Some(5L), Some(1.0)),   // 5 <= 10 < 20
      ("l2", Some(20L), Some(2.0)),  // 20 <= 25 < 30
      ("l3", None, None)))           // b has no click at/before 5
  }

  test("right row at exactly left ts is visible") {
    val left = Seq(("a", 10L, "l")).toDF("k", "ts", "tag")
    val right = Seq(("a", 10L, 7.0)).toDF("k", "rts", "v")
    val got = AsofJoin.asof(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .select("right_v").collect().head.getDouble(0)
    assert(got == 7.0)
  }
}
