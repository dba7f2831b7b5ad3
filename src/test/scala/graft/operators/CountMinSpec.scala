package graft.operators

import graft.SparkSpec
import graft.plans.CountMin
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def items = (Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++
    Seq.fill(5)("gamma") ++ Seq("delta")).map(Tuple1(_)).toDF("w")

  test("estimates are >= exact counts and exact when no row collides") {
    val sketch = Sketches.countMinAgg(items, "w", width = 1024, depth = 4)
    val got = items.distinct()
      .crossJoin(broadcast(sketch))
      .select(col("w"), Sketches.cmsEstimate(col("cms"), col("w")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("alpha" -> 50L, "beta" -> 20L, "gamma" -> 5L, "delta" -> 1L)
    exact.foreach { case (w, c) =>
      assert(got(w) >= c, s"$w: estimate ${got(w)} below exact $c")
    }
    // 4 items in 1024*4 cells: no collision, estimates are exact
    assert(got === exact)
  }

  test("sketch bytes are independent of partitioning (deterministic merge)") {
    val a = Sketches.countMinAgg(items.repartition(1), "w", width = 256, depth = 3)
      .collect()(0).getAs[Array[Byte]](0)
    val b = Sketches.countMinAgg(items.repartition(7), "w", width = 256, depth = 3)
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b),
      "cell sums are order-independent; bytes must match across partitionings")
  }

  test("cmsMerge of per-part sketches equals the whole-corpus sketch") {
    val parts = items.withColumn("part", (monotonically_increasing_id() % 3).cast("int"))
    val perPart = Sketches.countMinAgg(parts, "w", width = 256, depth = 3,
      byCols = Seq("part"))
    val merged = Sketches.cmsMerge(perPart, "cms")
      .collect()(0).getAs[Array[Byte]](0)
    val whole = Sketches.countMinAgg(items, "w", width = 256, depth = 3)
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(merged, whole))
  }

  test("Buffer/bytes estimate agrees with a brute-force replay of the hash schedule") {
    val buf = new CountMin.Buffer(64, 4, 42)
    val hs = Seq("x", "y", "z").map(graft.dedup.TextHashing.hash64)
    hs.foreach(h => buf.add(h, 7))
    val bytes = buf.serialize()
    hs.foreach { h =>
      val cells = (0 until 4).map { d =>
        // independent replay of the published schedule
        val v = graft.dedup.TextHashing.fmix64(
          h ^ graft.dedup.TextHashing.fmix64((42L << 32) + d))
        java.lang.Long.remainderUnsigned(v, 64L).toInt
      }
      assert(cells === (0 until 4).map(d => CountMin.cellIndex(h, 42, d, 64)))
      assert(CountMin.estimate(bytes, h) >= 7L)
    }
    // round trip
    val back = CountMin.deserialize(bytes)
    assert(back.width === 64 && back.depth === 4 && back.seed === 42)
    assert(back.cells.toSeq === buf.cells.toSeq)
  }

  test("ops work with no function registration and on backtick-hostile column names") {
    // a fresh session that never ran NativeExpressions.register: the ops
    // build expressions directly, so a persisted sketch still probes
    val fresh = spark.newSession()
    import fresh.implicits._
    val odd = (Seq.fill(9)("a") ++ Seq.fill(4)("b")).map(Tuple1(_))
      .toDF("the word") // space: breaks naive SQL-string interpolation
    val sketch = Sketches.countMinAgg(odd, "the word", width = 128, depth = 3)
    val got = odd.distinct()
      .crossJoin(broadcast(sketch))
      .select(col("the word"),
        Sketches.cmsEstimate(col("cms"), col("the word")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 9L, "b" -> 4L))
    val merged = Sketches.cmsMerge(sketch, "cms").collect()(0).getAs[Array[Byte]](0)
    assert(merged.nonEmpty)
  }

  test("merge rejects shape mismatches") {
    val a = new CountMin.Buffer(64, 4, 42)
    val b = new CountMin.Buffer(32, 4, 42)
    intercept[IllegalArgumentException](a.mergeInPlace(b))
  }
}
