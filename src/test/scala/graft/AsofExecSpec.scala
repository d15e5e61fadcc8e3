package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin
import graft.plans.AsofJoinExecApi

class AsofExecSpec extends SparkSuite {
  import spark.implicits._

  test("physical as-of operator matches the composed union+window form on real data") {
    val ev = Tables.events(spark, sf).withColumn("ts_us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("click_ts"), col("value").as("click_value"))

    val composed = AsofJoin.asof(purchases, clicks, Seq("user_id"), "ts_us", "click_ts",
        Seq("click_value"))
      .select(col("event_id"), col("right_click_ts"), col("right_click_value"))
      .as[(Long, Option[Long], Option[Double])].collect().toSet

    val execDf = AsofJoinExecApi.asof(purchases, clicks, Seq("user_id"), "ts_us", "click_ts")
    val got = execDf
      .select(col("event_id"), col("click_ts"), col("click_value"))
      .as[(Long, Option[Long], Option[Double])].collect().toSet

    assert(got == composed)
  }

  test("physical as-of: unmatched lefts pad nulls, ties at equal ts are visible") {
    val left = Seq(("a", 10L, "l1"), ("a", 25L, "l2"), ("b", 5L, "l3"))
      .toDF("k", "ts", "tag")
    val right = Seq(("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0), ("b", 9L, 9.0))
      .toDF("k", "rts", "v")
    val got = AsofJoinExecApi.asof(left, right, Seq("k"), "ts", "rts")
      .select("tag", "rts", "v").collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(got == Set(
      ("l1", Some(10L), Some(1.0)),  // equal ts visible
      ("l2", Some(20L), Some(2.0)),
      ("l3", None, None)))
  }

  test("physical as-of: null keys and null timestamps never match") {
    val left = Seq((Some("a"), Some(10L), "lk"), (None, Some(10L), "lnull"),
      (Some("a"), None, "lts")).toDF("k", "ts", "tag")
    val right = Seq((Some("a"), Some(5L), 1.0), (None, Some(1L), 9.0),
      (Some("a"), None, 8.0)).toDF("k", "rts", "v")
    val got = AsofJoinExecApi.asof(left, right, Seq("k"), "ts", "rts")
      .select("tag", "v").collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toSet
    assert(got == Set(
      ("lk", Some(1.0)),   // only the non-null right row matches
      ("lnull", None),     // null left key: padded
      ("lts", None)))      // null left ts: padded
  }
}
