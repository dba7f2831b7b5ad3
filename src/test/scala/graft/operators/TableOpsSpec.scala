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
    assert(TableOps.renameTables(cat, Map("a" -> "z"), prefix = "p_").keySet == Set("p_z", "p_b"))
    assert(TableOps.filterTables(cat, Seq("a")).keySet == Set("a"))
  }
}
