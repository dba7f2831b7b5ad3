package graft.operators

import graft.SparkSpec

class FieldOpsSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("id", "name", "score")

  test("fieldMapper selects, renames and reorders") {
    val out = FieldOps.fieldMapper(base, Seq("name" -> "label", "id" -> "key"))
    assert(out.columns.toSeq == Seq("label", "key"))
    assert(out.collect().map(_.getString(0)).toSeq == Seq("a", "b"))
  }

  test("renameFields renames listed, passes through rest") {
    val out = FieldOps.renameFields(base, Map("id" -> "pk"))
    assert(out.columns.toSeq == Seq("pk", "name", "score"))
  }

  test("renameCase and renameAffix rewrite all names") {
    assert(FieldOps.renameCase(base, upper = true).columns.toSeq == Seq("ID", "NAME", "SCORE"))
    assert(FieldOps.renameAffix(base, prefix = "p_", suffix = "_s").columns.toSeq ==
      Seq("p_id_s", "p_name_s", "p_score_s"))
  }

  test("copyFields appends copies preserving values") {
    val out = FieldOps.copyFields(base, Seq("name" -> "name2", "id" -> "id2"))
    assert(out.columns.toSet == Set("id", "name", "score", "name2", "id2"))
    val r = out.orderBy("id").collect()
    assert(r.map(x => x.getAs[String]("name2")).toSeq == Seq("a", "b"))
    assert(r.map(x => x.getAs[Int]("id2")).toSeq == Seq(1, 2))
  }

  test("keepFields / dropFields") {
    assert(FieldOps.keepFields(base, Seq("score", "id")).columns.toSeq == Seq("score", "id"))
    assert(FieldOps.dropFields(base, Seq("score")).columns.toSeq == Seq("id", "name"))
  }
}
