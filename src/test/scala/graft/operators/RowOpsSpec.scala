package graft.operators

import graft.SparkSpec

class RowOpsSpec extends SparkSpec {
  import spark.implicits._

  test("filterRows applies SQL predicate") {
    val df = Seq((1, 5.0), (2, 50.0)).toDF("id", "v")
    assert(RowOps.filterRows(df, "v > 10").collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("splitField pads missing parts with null and handles regex metachars") {
    val df = Seq(Tuple1("a.b.c"), Tuple1("x")).toDF("s")
    val out = RowOps.splitField(df, ".", "s", Seq("p1", "p2", "p3"))
      .select("p1", "p2", "p3").collect()
    assert(out(0).toSeq == Seq("a", "b", "c"))
    assert(out(1).toSeq == Seq("x", null, null))
  }

  test("splitField keeps the unsplit tail in the last output field (String.split limit)") {
    val df = Seq(Tuple1("a b c d")).toDF("s")
    val out = RowOps.splitField(df, " ", "s", Seq("p1", "p2")).select("p1", "p2").collect()
    assert(out(0).toSeq == Seq("a", "b c d"))
  }

  test("replaceField literal replaces all occurrences, no regex interpretation") {
    val df = Seq(Tuple1("a.b.a")).toDF("s")
    val out = RowOps.replaceField(df, "s", ".", "-").collect()
    assert(out(0).getString(0) == "a-b-a")
  }

  test("replaceField regex mode, replace-all vs replace-first") {
    val df = Seq(Tuple1("x11y222z")).toDF("s")
    assert(RowOps.replaceField(df, "s", "[0-9]+", "#", isRegex = true)
      .collect()(0).getString(0) == "x#y#z")
    assert(RowOps.replaceField(df, "s", "[0-9]+", "#", isRegex = true, replaceFirst = true)
      .collect()(0).getString(0) == "x#y222z")
  }
}
