package graft.operators

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("rolling window, lag and gap: hand-computed per-key history") {
    val df = Seq(
      (1L, 1L, 10L, 1.0), (2L, 1L, 20L, 2.0), (3L, 1L, 30L, 4.0),
      (4L, 2L, 5L, 10.0))
      .toDF("event_id", "k", "ts", "value")
    val got = TimeSeries.rollingFeatures(df, Seq("k"), "ts", "value",
        lastN = 2, tieCol = "event_id")
      .orderBy("event_id")
      .select("event_id", "roll_n", "roll_sum", "roll_mean", "prev_value", "gap")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        Option(r.get(4)), Option(r.get(5))))
    assert(got.toSeq === Seq(
      (1L, 1L, 1.0, 1.0, None, None),            // frame start: just itself
      (2L, 2L, 3.0, 1.5, Some(1.0), Some(10L)),  // last-2 window
      (3L, 2L, 6.0, 3.0, Some(2.0), Some(10L)),  // row 1 fell out of frame
      (4L, 1L, 10.0, 10.0, None, None)))         // other key: fresh history
  }

  test("duplicate timestamps stay deterministic via the tie column") {
    val df = Seq((2L, 1L, 10L, 5.0), (1L, 1L, 10L, 3.0))
      .toDF("event_id", "k", "ts", "value")
    val got = TimeSeries.rollingFeatures(df, Seq("k"), "ts", "value",
        lastN = 2, tieCol = "event_id")
      .orderBy("event_id").select("event_id", "prev_value")
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(got.toSeq === Seq((1L, None), (2L, Some(3.0))))
  }

  test("null values don't drag rolling means or group moments") {
    val df = Seq(
      (1L, 1L, 10L, Some(2.0)), (2L, 1L, 20L, None), (3L, 1L, 30L, Some(4.0)))
      .toDF("event_id", "k", "ts", "value")
    val roll = TimeSeries.rollingFeatures(df, Seq("k"), "ts", "value",
        lastN = 3, tieCol = "event_id")
      .orderBy("event_id").select("roll_n", "roll_mean").collect()
    assert(roll(2).getLong(0) === 3L)       // the null event still counts
    assert(roll(2).getDouble(1) === 3.0)    // mean over non-null values only
    val z = TimeSeries.zScores(df, Seq("k"), "value")
      .orderBy("event_id").select("z").collect()
    assert(z(1).isNullAt(0))                // null measurement: no z
    assert(!z(0).isNullAt(0))               // moments from the 2 real values
  }

  test("zScores: hand-computed z per group; zero-variance yields null") {
    val df = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), // mean 2, var 2/3
      (4L, "b", 5.0), (5L, "b", 5.0))                 // constant group
      .toDF("event_id", "grp", "value")
    val got = TimeSeries.zScores(df, Seq("grp"), "value")
      .orderBy("event_id").select("event_id", "z")
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Double])))
    // replicate the operator's exact float formula (sq/n - mean^2), not
    // the algebraically-equal 2/3 — they differ in the last ulp
    val sd = math.sqrt(14.0 / 3.0 - 2.0 * 2.0)
    assert(got(0)._2.get === -1.0 / sd)
    assert(got(1)._2.get === 0.0)
    assert(got(2)._2.get === 1.0 / sd)
    assert(got(3)._2.isEmpty && got(4)._2.isEmpty) // no divide-by-zero artifact
  }

  test("zScores: null group keys form a group and keep their rows (null-safe join)") {
    val df = Seq(
      (1L, Some("a"), 1.0), (2L, Some("a"), 3.0),
      (3L, None, 10.0), (4L, None, 20.0), (5L, None, 30.0))
      .toDF("event_id", "grp", "value")
    val got = TimeSeries.zScores(df, Seq("grp"), "value")
      .orderBy("event_id").select("event_id", "grp", "z").collect()
    assert(got.length === 5, "rows with a null key must not vanish")
    val sd = math.sqrt(1400.0 / 3.0 - 20.0 * 20.0)
    assert(got(2).isNullAt(1) && got(2).getDouble(2) === -10.0 / sd)
    assert(got(4).getDouble(2) === 10.0 / sd)
  }

  test("zScores hugeGroups: no broadcast hint, identical results") {
    val df = (1L to 40L).map(i => (i, s"g${i % 8}", (i % 5).toDouble))
      .toDF("event_id", "grp", "value")
    val small = TimeSeries.zScores(df, Seq("grp"), "value")
    val huge = TimeSeries.zScores(df, Seq("grp"), "value", hugeGroups = true)
    // the high-cardinality path must not plant a broadcast hint in the
    // LOGICAL plan (AQE may still upgrade at runtime when stats are small
    // — that is the point: the decision becomes size-driven, not forced)
    assert(!huge.queryExecution.optimizedPlan.toString.contains("ResolvedHint"))
    val key = (r: org.apache.spark.sql.Row) => r.getLong(0)
    assert(small.collect().sortBy(key).toSeq === huge.collect().sortBy(key).toSeq)
  }

  test("plan: a single exchange+sort serves all features") {
    val df = Seq((1L, 1L, 10L, 1.0)).toDF("event_id", "k", "ts", "value")
    val plan = TimeSeries.rollingFeatures(df, Seq("k"), "ts", "value", 5, "event_id")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning", -1).length - 1 === 1, plan)
    assert(!plan.contains("Join"), plan)
  }
}
