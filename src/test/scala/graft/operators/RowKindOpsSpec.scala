package graft.operators

import graft.SparkSpec

class RowKindOpsSpec extends SparkSpec {
  import spark.implicits._

  private def changelog = Seq(
    (1, "+I"), (2, "-U"), (3, "+U"), (4, "-D")
  ).toDF("id", RowKindOps.RowKindCol)

  test("tagInserts adds +I only when missing") {
    val df = Seq((1, "x")).toDF("id", "v")
    val tagged = RowKindOps.tagInserts(df)
    assert(tagged.select(RowKindOps.RowKindCol).collect()(0).getString(0) == "+I")
    assert(RowKindOps.tagInserts(changelog).collect().length == 4) // unchanged
  }

  test("filterRowKind include / exclude") {
    assert(RowKindOps.filterRowKind(changelog, Seq("+I", "+U"))
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
    assert(RowKindOps.filterRowKindExclude(changelog, Seq("-U"))
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3, 4))
  }

  test("extractRowKind short and full formats") {
    val short = RowKindOps.extractRowKind(changelog, "k").orderBy("id")
      .select("k").collect().map(_.getString(0)).toSeq
    assert(short == Seq("+I", "-U", "+U", "-D"))
    val full = RowKindOps.extractRowKind(changelog, "k", full = true).orderBy("id")
      .select("k").collect().map(_.getString(0)).toSeq
    assert(full == Seq("INSERT", "UPDATE_BEFORE", "UPDATE_AFTER", "DELETE"))
  }
}
