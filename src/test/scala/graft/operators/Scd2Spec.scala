package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val kind = RowKindOps.RowKindCol

  private def changelog(rows: (Long, String, Long, String)*) =
    rows.toSeq.toDF("k", "v", "ord", kind)

  test("insert/update/delete/reinsert produce half-open version chains") {
    val ch = changelog(
      (1L, "a1", 10L, "+I"), (1L, "a2", 20L, "+U"), (1L, "a2", 30L, "-U"),
      (1L, "a3", 30L, "+U"),
      (2L, "b1", 5L, "+I"), (2L, null, 8L, "-D"), (2L, "b2", 40L, "+I"),
      (3L, "c1", 1L, "+I"))
    val got = Scd2.fromChangelog(ch, Seq("k"), "ord")
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)), r.getBoolean(4))).toSet
    assert(got === Set(
      (1L, "a1", 10L, Some(20L), false),
      (1L, "a2", 20L, Some(30L), false),
      (1L, "a3", 30L, None, true),
      (2L, "b1", 5L, Some(8L), false), // closed by the delete, not emitted
      (2L, "b2", 40L, None, true),     // reinsert opens a fresh version
      (3L, "c1", 1L, None, true)))
  }

  test("-U before-images neither open nor close versions") {
    // before-image at ord 15 sits between open(10) and close(20): if it
    // took part in the lead window the first version would close at 15
    val ch = changelog(
      (1L, "a1", 10L, "+I"), (1L, "a1", 15L, "-U"), (1L, "a2", 20L, "+U"))
    val got = Scd2.fromChangelog(ch, Seq("k"), "ord")
      .select("valid_from", "valid_to").orderBy("valid_from")
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(got.toSeq === Seq((10L, Some(20L)), (20L, None)))
  }

  test("a key whose last change is a delete has no current version") {
    val ch = changelog((1L, "a1", 1L, "+I"), (1L, null, 2L, "-D"))
    val got = Scd2.fromChangelog(ch, Seq("k"), "ord")
    assert(got.where(col("is_current")).count() === 0L)
    assert(got.count() === 1L)
  }

  test("plan: one key exchange + window, no join") {
    val ch = changelog((1L, "a", 1L, "+I"))
    val plan = Scd2.fromChangelog(ch, Seq("k"), "ord")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }
}
