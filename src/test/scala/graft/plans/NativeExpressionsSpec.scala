package graft.plans

import graft.SparkSpec
import graft.dedup.TextHashing
import org.apache.spark.sql.functions.expr

class NativeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val registered = { NativeExpressions.register(spark); spark }

  test("simhash64 expression matches the Scala primitive, codegen path") {
    registered
    val texts = Seq("spark shuffles data", "the quick brown fox", "")
    val df = texts.toDF("t")
    val got = df.select(expr("simhash64(t)")).collect().map(_.getLong(0))
    assert(got.toSeq == texts.map(TextHashing.simHash64))
  }

  test("minhash_bands expression matches the Scala primitives") {
    registered
    val t = "a b c d e f g h i j"
    val df = Seq(t).toDF("t")
    val got = df.select(expr("minhash_bands(t, 3, 64, 16, 42)")).collect()(0)
      .getSeq[Long](0)
    val want = TextHashing.bandHashes(
      TextHashing.minHashSignature(TextHashing.shingleHashes(t, 3), 64, 42), 16, 4)
    assert(got.toSeq == want.toSeq)
    // default-arg form
    assert(df.select(expr("minhash_bands(t)")).collect()(0).getSeq[Long](0).toSeq == want.toSeq)
  }

  test("rolling_hash is deterministic and order-sensitive") {
    registered
    val df = Seq(("abc", "acb")).toDF("x", "y")
    val r = df.select(expr("rolling_hash(x)"), expr("rolling_hash(y)"), expr("rolling_hash(x)"))
      .collect()(0)
    assert(r.getLong(0) != r.getLong(1))
    assert(r.getLong(0) == r.getLong(2))
  }

  test("null inputs propagate null") {
    registered
    val df = Seq(Option.empty[String]).toDF("t")
    val r = df.selectExpr("simhash64(t)", "minhash_bands(t)", "rolling_hash(t)").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }
}
