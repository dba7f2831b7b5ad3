package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val chainMerges = Seq(
    "t a", "b l", "ta bl", "tabl e", // t a b l e -> table
    "s c", "a n", "sc an",           // s c a n -> scan
    "k e", "ke y")                   // k e y -> key

  test("encode applies merges in order, chains included") {
    val df = Seq((1L, "table scan key x")).toDF("id", "text")
    val toks = df.select(Bpe.encode(col("text"), chainMerges).as("t"))
      .as[Seq[String]].collect()(0)
    assert(toks === Seq("table", "scan", "key", "x"))
  }

  test("one canonical left-to-right pass per merge") {
    val df = Seq((1L, "abab aaa ab")).toDF("id", "text")
    val toks = df.select(Bpe.encode(col("text"), Seq("a b", "a a")).as("t"))
      .as[Seq[String]].collect()(0)
    // abab: both (a,b) pairs merge in ONE pass; aaa: first two a's merge,
    // the third survives (non-overlapping)
    assert(toks === Seq("ab", "ab", "aa", "a", "ab"))
  }

  test("train learns count-ranked merges with deterministic tie-breaks") {
    val df = Seq("low low low", "lower").toDF("text")
    val merges = Bpe.train(df, "text", numMerges = 3)
    // (l,o) and (o,w) both count 4: lexicographic tie-break picks (l,o);
    // then (lo,w) dominates; then (e,r) vs (low,e) ties at 1 -> (e,r)
    assert(merges === Seq("l o", "lo w", "e r"))
  }

  test("trained encode reconstructs the input words") {
    val docs = Seq("spark rows and keys", "scan the table", "agg agg agg")
    val df = docs.toDF("text")
    val merges = Bpe.train(df, "text", numMerges = 20)
    val joined = df.select(
        concat_ws("", Bpe.encode(lower(col("text")), merges)).as("r"),
        regexp_replace(lower(col("text")), "\\s+", "").as("w"))
      .collect()
    joined.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("encode runs without merges at all (pure char split)") {
    val df = Seq((1L, "  ab  c ")).toDF("id", "text")
    val toks = df.select(Bpe.encode(col("text"), Nil).as("t"))
      .as[Seq[String]].collect()(0)
    assert(toks === Seq("a", "b", "c"))
  }

  test("plan: native expression, no ScalaUDF") {
    val df = Seq((1L, "x")).toDF("id", "text")
    val plan = df.select(Bpe.encode(col("text"), chainMerges))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
  }
}
