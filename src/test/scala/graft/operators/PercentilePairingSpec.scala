package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The percentile pairing (SURVEY §2.6 length-distribution row; VERDICT
  * r10 #8 / r11 #7): `percentile` (exact, linear-interpolated) is the
  * oracle-checkable path used by q_length_percentiles — its aggregation
  * state is proportional to the DISTINCT value domain per group, which is
  * fine for token counts (small bounded ints, partial-agg-combinable)
  * and WRONG for unbounded continuous columns at corpus scale. The scale
  * path for those is `approx_percentile` (GK sketch): state bounded by
  * the accuracy parameter, mergeable, rank error <= 1/accuracy — but it
  * returns an actual element of the domain, so it is deliberately NOT on
  * the cross-engine hash path (DuckDB's approx_quantile is a different
  * sketch with different picks).
  */
class PercentilePairingSpec extends SparkSpec {
  import spark.implicits._

  test("bounded integer domain: exact percentile interpolates, approx lands within rank error") {
    val df = (1 to 100).map(_.toDouble).toDF("n")
    val row = df.agg(
      expr("percentile(n, 0.25)").as("exact"),
      expr("approx_percentile(n, 0.25, 10000)").as("approx")).collect()(0)
    assert(row.getDouble(0) === 25.75) // (n-1)*p interpolation, the oracle contract
    // approx returns an element of the domain within 1/accuracy rank error
    assert(math.abs(row.getDouble(1) - 25.75) <= 1.5)
  }

  test("continuous domain: approx_percentile state is accuracy-bounded, not domain-bounded") {
    // 50k distinct continuous values: the exact path's state would carry
    // all 50k per group; the sketch carries O(accuracy) regardless
    val df = spark.range(0, 50000)
      .select((hash(col("id")).cast("double") / 1e6).as("v"))
    val Array(p25, p50, p75) = df
      .agg(expr("approx_percentile(v, array(0.25, 0.5, 0.75), 1000)").as("p"))
      .collect()(0).getSeq[Double](0).toArray
    assert(p25 < p50 && p50 < p75)
    // hash() is ~uniform over +/-2^31 -> /1e6 spans ~[-2147, 2147]:
    // quartiles near -1073, 0, +1073 with 1/accuracy rank slack
    assert(math.abs(p50) < 25 && math.abs(p25 + 1073) < 25 && math.abs(p75 - 1073) < 25)
  }

  test("grouped percentile pairing agrees within rank tolerance on a skewed group") {
    val df = (Seq.fill(900)(10.0) ++ Seq.fill(100)(1000.0)).zipWithIndex
      .map { case (v, i) => (i % 2, v) }.toDF("g", "v")
    val rows = df.groupBy("g").agg(
        expr("percentile(v, 0.5)").as("exact"),
        expr("approx_percentile(v, 0.5, 10000)").as("approx"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(1) === 10.0 && math.abs(r.getDouble(2) - 10.0) < 1e-9)
    }
  }
}
