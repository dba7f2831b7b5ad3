package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile computes per-column stats in one pass") {
    val df = Seq(
      (1L, Some("a"), Some(1.5)), (2L, None, Some(2.5)), (3L, Some("c"), None)
    ).toDF("id", "s", "d")
    val out = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("id", "s", "d"))
    assert(out("id").getAs[Long]("n_rows") == 3 && out("id").getAs[Long]("n_nulls") == 0)
    assert(out("s").getAs[Long]("n_nulls") == 1)
    assert(out("s").getAs[String]("min_str") == "a" && out("s").getAs[String]("max_str") == "c")
    assert(out("d").getAs[Double]("mean_numeric") == 2.0)
    assert(out("s").get(out("s").fieldIndex("mean_numeric")) == null) // non-numeric
    assert(out("id").getAs[Long]("approx_distinct") == 3)
  }

  test("profileExact matches hand-computed values") {
    val df = Seq((5L, "x"), (7L, "y")).toDF("k", "v")
    val rows = Profile.profileExact(df, Seq("k", "v")).orderBy("column").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("k", "v"))
    assert(rows(0).getAs[String]("min_str") == "5" && rows(0).getAs[String]("max_str") == "7")
    assert(rows.forall(_.getAs[Long]("n_rows") == 2))
  }
}
