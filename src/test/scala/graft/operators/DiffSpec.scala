package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DiffSpec extends SparkSpec {
  import spark.implicits._

  private def oldDf = Seq(
    (1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40))
    .toDF("k", "name", "v")
  private def newDf = Seq(
    (1L, "a", 10),   // unchanged
    (2L, "B", 20),   // name changed
    (3L, "c", 31),   // v changed
    (5L, "e", 50))   // added; 4 removed
    .toDF("k", "name", "v")

  test("snapshotDiff classifies added/removed/changed/unchanged with per-column flags") {
    val got = Diff.snapshotDiff(oldDf, newDf, Seq("k"))
      .orderBy("k")
      .select("k", "status", "name_changed", "v_changed")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getBoolean(3)))
    assert(got.toSeq === Seq(
      (1L, "unchanged", false, false),
      (2L, "changed", true, false),
      (3L, "changed", false, true),
      (4L, "removed", false, false),
      (5L, "added", false, false)))
  }

  test("null keys and null values diff null-safely") {
    val o = Seq((Some(1L), Some("x")), (None, Some("y"))).toDF("k", "name")
    val n = Seq((Some(1L), None: Option[String]), (None, Some("y"))).toDF("k", "name")
    val got = Diff.snapshotDiff(o, n, Seq("k"))
      .select("k", "status", "name_changed").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(1), r.getBoolean(2))).toSet
    // the null-key row pairs up (null <=> null) and is unchanged;
    // key 1's name went x -> null, a real change
    assert(got === Set(
      (Some(1L), "changed", true),
      (None, "unchanged", false)))
  }

  test("diffSummary aggregates counts per status and per column") {
    val sum = Diff.diffSummary(Diff.snapshotDiff(oldDf, newDf, Seq("k")))
      .collect()(0)
    assert(sum.getAs[Long]("n_added") === 1L)
    assert(sum.getAs[Long]("n_removed") === 1L)
    assert(sum.getAs[Long]("n_changed") === 2L)
    assert(sum.getAs[Long]("n_unchanged") === 1L)
    assert(sum.getAs[Long]("n_name_changed") === 1L)
    assert(sum.getAs[Long]("n_v_changed") === 1L)
  }
}
