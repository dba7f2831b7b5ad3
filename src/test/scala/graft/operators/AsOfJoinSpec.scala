package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches the latest right row at-or-before each left ts, left-outer") {
    val left = Seq((1L, 10L, "l10"), (1L, 20L, "l20"), (2L, 5L, "l5"))
      .toDF("k", "ts", "lv")
    val right = Seq((1L, 8L, "a"), (1L, 15L, "b"), (3L, 1L, "z"))
      .toDF("k", "ts", "rv")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts")
      .select("k", "ts", "lv", "r_ts", "r_rv").orderBy("k", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4))))
    assert(got.toSeq === Seq(
      (1L, 10L, "l10", Some(8L), Some("a")),
      (1L, 20L, "l20", Some(15L), Some("b")),
      (2L, 5L, "l5", None, None)))
  }

  test("equal timestamps match; nulls inside the matched row are preserved") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    // the AT-ts row carries a null payload value; a correct as-of must NOT
    // skip back to the older non-null row's payload
    val right = Seq((1L, 5L, Some("old")), (1L, 10L, None))
      .toDF("k", "ts", "rv")
    val row = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts")
      .select("r_ts", "r_rv").collect()(0)
    assert(row.getLong(0) === 10L)
    assert(row.isNullAt(1))
  }

  test("tolerance nulls out stale matches") {
    val left = Seq((1L, 100L), (1L, 200L)).toDF("k", "ts")
    val right = Seq((1L, 95L, 9.5)).toDF("k", "ts", "rv")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts",
        tolerance = Some(10L))
      .select("ts", "r_ts").orderBy("ts")
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(got.toSeq === Seq((100L, Some(95L)), (200L, None)))
  }

  test("plan: one key exchange + sort, no cartesian/nested-loop join") {
    val left = Seq((1L, 10L, 1.0)).toDF("k", "ts", "lv")
    val right = Seq((1L, 8L, 2.0)).toDF("k", "ts", "rv")
    val plan = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not plan a product join:\n$plan")
  }
}
