package graft.operators

import graft.SparkSpec

/** The reference documentation's own worked examples, verbatim
  * (docs/en/transform-v2/split.md, replace.md, copy.md, field-mapper.md) —
  * Graft must produce exactly the tables those docs show.
  */
class ReferenceExamplesSpec extends SparkSpec {
  import spark.implicits._

  private def people = Seq(
    ("Joy Ding", 20, 123), ("May Ding", 20, 123),
    ("Kin Dom", 20, 123), ("Joy Dom", 20, 123)
  ).toDF("name", "age", "card")

  test("split.md example: name -> first_name, second_name appended") {
    val out = RowOps.splitField(people, " ", "name", Seq("first_name", "second_name"))
    assert(out.columns.toSeq == Seq("name", "age", "card", "first_name", "second_name"))
    val rows = out.collect().map(r => (r.getString(0), r.getString(3), r.getString(4)))
    assert(rows.toSeq == Seq(
      ("Joy Ding", "Joy", "Ding"), ("May Ding", "May", "Ding"),
      ("Kin Dom", "Kin", "Dom"), ("Joy Dom", "Joy", "Dom")))
  }

  test("replace.md example: blank to underscore in name") {
    val out = RowOps.replaceField(people, "name", " ", "_", isRegex = true)
    assert(out.select("name").collect().map(_.getString(0)).toSeq ==
      Seq("Joy_Ding", "May_Ding", "Kin_Dom", "Joy_Dom"))
  }

  test("replace.md regex example: '.+' -> 'b' replaces whole value") {
    val out = RowOps.replaceField(people, "name", ".+", "b", isRegex = true)
    assert(out.select("name").collect().map(_.getString(0)).toSeq == Seq("b", "b", "b", "b"))
  }

  test("copy.md example: copy name and age into new fields") {
    val out = FieldOps.copyFields(people, Seq("name" -> "name1", "age" -> "age1"))
    val r = out.collect()(0)
    assert(r.getAs[String]("name1") == "Joy Ding" && r.getAs[Int]("age1") == 20)
  }

  test("field-mapper.md example: select id/card, rename name to new_name") {
    val df = Seq((1, "Joy Ding", 123)).toDF("id", "name", "card")
    val out = FieldOps.fieldMapper(df, Seq("id" -> "id", "card" -> "card", "name" -> "new_name"))
    assert(out.columns.toSeq == Seq("id", "card", "new_name"))
    assert(out.collect()(0).toSeq == Seq(1, 123, "Joy Ding"))
  }
}
