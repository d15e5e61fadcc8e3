package graft

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSuite {
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
