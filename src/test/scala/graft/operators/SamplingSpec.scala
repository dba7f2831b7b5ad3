package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = (1L to 2000L).toDF("id")

  test("hashSample is deterministic, repartition-stable, and near the target fraction") {
    val a = Sampling.hashSample(ids, "id", 0.3).select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(ids.repartition(13), "id", 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05)
    // monotone: larger fraction is a superset (same salt)
    val bigger = Sampling.hashSample(ids, "id", 0.6).select("id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(bigger))
    // different salt draws a different subset
    val other = Sampling.hashSample(ids, "id", 0.3, salt = "other")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a != other)
    assert(Sampling.hashSample(ids, "id", 1.0).count() == 2000)
  }

  test("assignSplit covers every row exactly once with ~weighted shares") {
    val out = Sampling.assignSplit(ids, "id", Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
    assert(out.count() == 2000)
    val shares = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(shares.keySet == Set("train", "valid", "test"))
    assert(math.abs(shares("train") / 2000.0 - 0.8) < 0.05)
    // membership agrees with hashSample thresholds: train == first 80%
    val trainIds = out.where($"split" === "train").select("id")
      .collect().map(_.getLong(0)).toSet
    val sampled80 = Sampling.hashSample(ids, "id", 0.8)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(trainIds == sampled80)
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(ids, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("stratifiedSample keeps per-group fractions deterministically, superset-stable") {
    val df = spark.range(0, 2000).selectExpr("id AS k",
      "CASE WHEN id % 2 = 0 THEN 'heavy' ELSE 'light' END AS grp")
    val kept = Sampling.stratifiedSample(df, "k", "grp",
      Map("light" -> 0.2), defaultFraction = 1.0)
    val byGrp = kept.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp("heavy") == 1000) // default fraction 1.0 keeps all
    assert(byGrp("light") > 100 && byGrp("light") < 300) // ~20%
    // a larger fraction yields a superset for the same salt
    val more = Sampling.stratifiedSample(df, "k", "grp", Map("light" -> 0.5))
    val keptLight = kept.where("grp = 'light'").select("k").collect().map(_.getLong(0)).toSet
    val moreLight = more.where("grp = 'light'").select("k").collect().map(_.getLong(0)).toSet
    assert(keptLight.subsetOf(moreLight))
  }

  test("assignSplit keyed on a group column is leakage-safe by construction") {
    val df = spark.range(0, 300).selectExpr("id", "concat('src_', id % 7) AS source")
    val splits = Sampling.assignSplit(df, "source",
      Seq("train" -> 0.6, "valid" -> 0.2, "test" -> 0.2))
    // every source maps to exactly ONE split: no group straddles the cut
    val perSource = splits.groupBy("source")
      .agg(org.apache.spark.sql.functions.countDistinct("split").as("n"))
      .collect().map(_.getAs[Long]("n"))
    assert(perSource.forall(_ == 1L))
  }

  test("sampleKPerGroup: exact quotas, monotone in k, repartition-stable, WindowGroupLimit plan") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val k10 = Sampling.sampleKPerGroup(df, "id", "grp", 10)
    val counts = k10.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("g0" -> 10L, "g1" -> 10L, "g2" -> 10L))
    // small groups keep everything
    val tiny = Sampling.sampleKPerGroup(df.where(col("id") <= 4), "id", "grp", 10)
    assert(tiny.count() === 4)
    // monotone: k=10 is a subset of k=20
    val ids10 = k10.select("id").collect().map(_.getLong(0)).toSet
    val ids20 = Sampling.sampleKPerGroup(df, "id", "grp", 20)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids10.subsetOf(ids20))
    // repartition-stable
    val idsRep = Sampling.sampleKPerGroup(df.repartition(13), "id", "grp", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(idsRep === ids10)
    // the rank filter compiles to WindowGroupLimit (map-side top-k)
    assert(k10.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }
}
