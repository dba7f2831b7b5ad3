package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId picks the language with most marker hits; und when none") {
    val df = Seq(
      (1, "the cat and the dog of the house is here"),
      (2, "der hund und die katze ist da"),
      (3, "el perro es que la casa"),
      (4, "xyz qqq zzz")
    ).toDF("id", "text")
    val out = df.select(col("id"), TextAnalysis.langId(col("text")).as("lang"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out == Map(1 -> "en", 2 -> "de", 3 -> "es", 4 -> "und"))
  }

  test("qualityFeatures computes ratios") {
    val df = Seq((1, "the the cat! sat.")).toDF("id", "text")
    val r = TextAnalysis.qualityFeatures(df, "text").collect()(0)
    assert(r.getAs[Int]("n_words") == 4)
    assert(r.getAs[Double]("punct_ratio") > 0)
    assert(r.getAs[Double]("distinct_ratio") == 0.75)
  }

  test("tokenCounts whitespace and BPE-ish") {
    val df = Seq((1, "hello world42 foo-bar")).toDF("id", "text")
    val r = TextAnalysis.tokenCounts(df, "text").collect()(0)
    assert(r.getAs[Int]("ws_tokens") == 3)
    // hello | world | 42 | foo | - | bar
    assert(r.getAs[Int]("bpe_tokens") == 6)
  }

  test("fingerprint is normalization-invariant and 16 hex chars") {
    val df = Seq((1, "  Hello   World "), (2, "hello world")).toDF("id", "text")
    val fps = df.select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0).matches("[0-9a-f]{16}"))
  }
}
