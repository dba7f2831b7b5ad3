package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def estimateOf(df: org.apache.spark.sql.DataFrame): Long =
    df.select(Sketches.estimate(col("sketch")).as("n")).collect()(0).getLong(0)

  test("hllAgg estimate is exact at small cardinality and repartition-invariant") {
    val df = (1 to 1000).map(i => (i % 37, s"g${i % 3}")).toDF("v", "g")
    assert(estimateOf(Sketches.hllAgg(df, "v", Nil)) == 37L)
    // partition layout must not change the estimate (mergeable partials)
    assert(estimateOf(Sketches.hllAgg(df.repartition(13), "v", Nil)) == 37L)
    val perGroup = Sketches.hllAgg(df, "v", Seq("g"))
      .select(col("g"), Sketches.estimate(col("sketch")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // each residue class mod 3 hits a fixed distinct-set size of v=i%37
    val want = (1 to 1000).groupBy(i => s"g${i % 3}")
      .map { case (g, is) => g -> is.map(_ % 37).distinct.size.toLong }
    assert(perGroup == want)
  }

  test("sketch merge is associative, commutative, and equals the one-shot sketch") {
    val a = (1 to 300).map(i => i % 29).toDF("v")
    val b = (200 to 600).map(i => i % 41).toDF("v")
    val c = (500 to 900).map(i => i % 53).toDF("v")
    def sk(df: org.apache.spark.sql.DataFrame) = Sketches.hllAgg(df, "v", Nil)

    // one-shot over the union == merge of per-source sketches
    val oneShot = estimateOf(Sketches.hllAgg(a.union(b).union(c), "v", Nil))
    val merged = estimateOf(Sketches.hllMerge(
      sk(a).union(sk(b)).union(sk(c)), "sketch", Nil))
    assert(merged == oneShot)

    // associativity/commutativity of pairwise union
    val Seq(sa, sb, sc) = Seq(a, b, c).map(d => sk(d).collect()(0).getAs[Array[Byte]](0))
    val rows = Seq((sa, sb, sc)).toDF("a", "b", "c")
    val r = rows.select(
      Sketches.estimate(Sketches.union(Sketches.union(col("a"), col("b")), col("c"))).as("l"),
      Sketches.estimate(Sketches.union(col("a"), Sketches.union(col("b"), col("c")))).as("r"),
      Sketches.estimate(Sketches.union(Sketches.union(col("c"), col("a")), col("b"))).as("p"))
      .collect()(0)
    assert(r.getLong(0) == r.getLong(1) && r.getLong(1) == r.getLong(2))
    assert(r.getLong(0) == oneShot)
  }
}
