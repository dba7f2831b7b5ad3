package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def noCartesian(df: DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("pointInInterval matches the naive theta join, keyless") {
    val points = Seq.tabulate(200)(i => (i.toLong, i.toLong * 7)).toDF("pid", "t")
    val ivals = Seq((100L, 0L, 50L), (101L, 49L, 120L), (102L, 900L, 1000L),
        (103L, 1393L, 1393L)) // degenerate single-point interval
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivals, "t", "lo", "hi", binWidth = 64)
      .select("pid", "i_iid").as[(Long, Long)].collect().toSet
    val want = points.as[(Long, Long)].collect().flatMap { case (p, t) =>
      ivals.as[(Long, Long, Long)].collect()
        .filter { case (_, lo, hi) => t >= lo && t <= hi }
        .map { case (i, _, _) => (p, i) }
    }.toSet
    assert(want.nonEmpty && got === want)
    // boundary rows themselves: inclusive both ends, degenerate interval hit
    assert(got.contains((0L, 100L)) && got.contains((7L, 101L)))
    assert(got.contains((199L, 103L)))
  }

  test("pointInInterval respects equality keys and emits each pair once") {
    val points = Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("pid", "k", "t")
    val ivals = Seq(("a", 0L, 100L), ("b", 50L, 100L)).toDF("k", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivals, "t", "lo", "hi",
        binWidth = 3, keys = Seq("k")) // width << interval: heavy replication
      .select("pid").as[Long].collect().toSeq
    assert(got === Seq(1L)) // key b's interval starts after t=10; no dupes
  }

  test("intervalOverlap matches naive overlap, exactly once per pair") {
    val left = Seq((1L, 0L, 10L), (2L, 20L, 30L), (3L, 5L, 25L)).toDF("lid", "ls", "le")
    val right = Seq((10L, 10L, 12L), (11L, 31L, 40L), (12L, 0L, 100L)).toDF("rid", "rs", "re")
    val rows = RangeJoin.intervalOverlap(left, right, "ls", "le", "rs", "re", binWidth = 4)
      .select("lid", "r_rid").as[(Long, Long)].collect().toSeq
    // touch counts: l1 [0,10] meets r10 [10,12]
    assert(rows.sorted === Seq((1L, 10L), (1L, 12L), (2L, 12L), (3L, 10L), (3L, 12L)).sorted)
    assert(rows.size === rows.toSet.size) // canonical-bin rule: no duplicates
  }

  test("long-range bins stay exact where double arithmetic would not") {
    // epoch-nano scale: 1.7e18 is NOT representable in a double's mantissa
    val base = 1700000000000000000L
    val points = Seq((1L, base + 1L), (2L, base + 599999999999L)).toDF("pid", "t")
    val ivals = Seq((9L, base, base + 599999999999L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivals, "t", "lo", "hi",
        binWidth = 600000000000L).select("pid").as[Long].collect().toSet
    assert(got === Set(1L, 2L))
  }

  test("inverted and malformed intervals are dropped, not exploded descending") {
    val points = Seq((1L, 5L)).toDF("pid", "t")
    val ivals = Seq((1L, 10L, 0L)).toDF("iid", "lo", "hi") // start > end
    assert(RangeJoin.pointInInterval(points, ivals, "t", "lo", "hi", 4).count() === 0L)
    val l = Seq((1L, 10L, 0L)).toDF("lid", "ls", "le")
    val r = Seq((2L, 0L, 100L)).toDF("rid", "rs", "re")
    assert(RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re", 4).count() === 0L)
  }

  test("plan: binned joins are equi-joins — no cartesian/nested-loop") {
    val points = Seq((1L, 5L)).toDF("pid", "t")
    val ivals = Seq((1L, 0L, 10L)).toDF("iid", "lo", "hi")
    noCartesian(RangeJoin.pointInInterval(points, ivals, "t", "lo", "hi", 4))
    val l = Seq((1L, 0L, 10L)).toDF("lid", "ls", "le")
    val r = Seq((2L, 5L, 15L)).toDF("rid", "rs", "re")
    noCartesian(RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re", 4))
  }
}
