package graft.operators

import graft.SparkSpec

class TableOpsSpec extends SparkSpec {
  import spark.implicits._

  test("mergeTables unions matching tables by name, null-filling missing columns") {
    val a = Seq((1, "x")).toDF("id", "a_only")
    val b = Seq((2, 9.0)).toDF("id", "b_only")
    val c = Seq((3, true)).toDF("id", "keep")
    val out = TableOps.mergeTables(Map("t_a" -> a, "t_b" -> b, "other" -> c), "t_.*", "merged")
    assert(out.keySet == Set("other", "merged"))
    val m = out("merged").orderBy("id").collect()
    assert(m.length == 2)
    assert(out("merged").columns.toSet == Set("id", "a_only", "b_only"))
    assert(m(0).getAs[String]("a_only") == "x" && m(0).isNullAt(m(0).fieldIndex("b_only")))
  }

  test("mergeTables tags source table when asked") {
    val a = Seq((1, "x")).toDF("id", "v")
    val b = Seq((2, "y")).toDF("id", "v")
    val m = TableOps.mergeTables(Map("s1" -> a, "s2" -> b), "s[12]", "m", tagSourceTable = true)("m")
    assert(m.orderBy("id").collect().map(_.getAs[String]("__meta_table")).toSeq == Seq("s1", "s2"))
  }

  test("renameTables and filterTables") {
    val cat = Map("a" -> Seq(1).toDF("x"), "b" -> Seq(2).toDF("x"))
    // an explicit rename wins outright (reference FieldRenameTransform
    // specific-modify semantics); affixes only touch non-mapped names
    assert(TableOps.renameTables(cat, Map("a" -> "z"), prefix = "p_").keySet == Set("z", "p_b"))
    assert(TableOps.filterTables(cat, Seq("a")).keySet == Set("a"))
  }

  test("renameTables follows reference convertName order (match, case, splice, affix)") {
    val cat = Map("test.abc" -> Seq(1).toDF("x"), "test.xyz" -> Seq(2).toDF("x"))
    val out = TableOps.renameTables(cat, prefix = "P1_", suffix = "_S1",
      convertCase = "UPPER", replacements = Seq("c" -> "CC"))
    // db part gets case conversion only; replacement text survives UPPER
    assert(out.keySet == Set("TEST.P1_ABCC_S1", "TEST.P1_XYZ_S1"))
  }
}
