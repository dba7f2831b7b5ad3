package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

class MiscOpsSpec extends SparkSpec {
  import spark.implicits._

  test("JsonPathOp extracts nested paths with casts") {
    val df = Seq(Tuple1("""{"a":{"b":7},"arr":[1,2,3],"s":"hi"}""")).toDF("j")
    val out = JsonPathOp.extract(df, Seq(
      JsonPathOp.PathSpec("j", "$.a.b", "b", Some(IntegerType)),
      JsonPathOp.PathSpec("j", "$.arr[1]", "second", Some(LongType)),
      JsonPathOp.PathSpec("j", "$.s", "s")))
    val r = out.select("b", "second", "s").collect()(0)
    assert(r.toSeq == Seq(7, 2L, "hi"))
  }

  test("JsonPathOp parseWithSchema single-pass struct parse") {
    val df = Seq(Tuple1("""{"k":5,"v":"x"}""")).toDF("j")
    val schema = StructType(Seq(StructField("k", IntegerType), StructField("v", StringType)))
    val out = JsonPathOp.parseWithSchema(df, "j", schema, "parsed")
    assert(out.select("parsed.k").collect()(0).getInt(0) == 5)
  }

  test("JsonPathOp error_handle_way SKIP_ROW drops unextractable rows, keeps null sources") {
    val df = Seq((1, """{"f":"a"}"""), (2, """{"g":"b"}"""), (3, null))
      .toDF("id", "j")
    val out = JsonPathOp.extract(df,
      Seq(JsonPathOp.PathSpec("j", "$.f", "f")),
      rowErrorHandleWay = JsonPathOp.ErrorHandleWay.SkipRow)
    // row 2 ($.f missing) dropped; row 3 (null source) kept per reference
    assert(out.select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
  }

  test("JsonPathOp error_handle_way FAIL raises on unextractable row; column override wins") {
    val df = Seq((1, """{"f":"a"}"""), (2, """{"g":"b"}""")).toDF("id", "j")
    val failing = JsonPathOp.extract(df,
      Seq(JsonPathOp.PathSpec("j", "$.f", "f")),
      rowErrorHandleWay = JsonPathOp.ErrorHandleWay.Fail)
    val e = intercept[Exception](failing.collect())
    assert(e.getMessage.contains("JsonPath FAIL") ||
      Option(e.getCause).exists(_.getMessage.contains("JsonPath FAIL")))
    // per-column SKIP overrides the row-level FAIL default
    val skipped = JsonPathOp.extract(df,
      Seq(JsonPathOp.PathSpec("j", "$.f", "f",
        errorHandleWay = Some(JsonPathOp.ErrorHandleWay.Skip))),
      rowErrorHandleWay = JsonPathOp.ErrorHandleWay.Fail)
    assert(skipped.count() == 2)
  }

  test("MetadataOp injects database/table/rowkind/event-time") {
    val df = Seq((1, "2024-01-01 00:00:00")).toDF("id", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = MetadataOp.inject(df,
      Map("Database" -> "db", "Table" -> "tbl", "RowKind" -> "kind", "EventTime" -> "et"),
      MetadataOp.MetaConfig(database = Some("d1"), table = Some("t1"), eventTimeField = Some("ts")))
    val r = out.select("db", "tbl", "kind", "et").collect()(0)
    assert(r.getString(0) == "d1" && r.getString(1) == "t1" && r.getString(2) == "+I")
    assert(r.getTimestamp(3) != null)
  }

  test("DynamicOp typed map and row-level map") {
    val ds = Seq(NationRowT(1, "A"), NationRowT(2, "B")).toDS()
    val out = DynamicOp.applyTyped(ds, (n: NationRowT) => n.copy(k = n.k * 10))
    assert(out.collect().map(_.k).sorted.toSeq == Seq(10, 20))

    val df = Seq((1, "a")).toDF("id", "v")
    val schema = StructType(Seq(StructField("id", IntegerType), StructField("v", StringType)))
    val rows = DynamicOp.applyRows(df, schema, r => Row(r.getInt(0) + 1, r.getString(1) + "!"))
    assert(rows.collect()(0).toSeq == Seq(2, "a!"))
  }

  test("DynamicOp.applyCompiled hot-compiles Scala source per JVM") {
    val df = Seq((1, "ab"), (2, "cd")).toDF("n", "s")
    val schema = StructType(Seq(StructField("n", IntegerType), StructField("s", StringType)))
    val src =
      """(r: org.apache.spark.sql.Row) =>
        |  org.apache.spark.sql.Row(r.getInt(0) * 10, r.getString(1).toUpperCase)""".stripMargin
    val out = DynamicOp.applyCompiled(df, schema, src).orderBy("n").collect()
    assert(out.map(_.toSeq.toList).toList == List(List(10, "AB"), List(20, "CD")))
    // second run hits the executor-side cache (same source key)
    assert(DynamicOp.applyCompiled(df, schema, src).count() == 2)
  }

  test("EmbeddingOp deterministic, unit-norm, cosine self-similarity 1") {
    val a = EmbeddingOp.embedText("spark join data spark", 32)
    val b = EmbeddingOp.embedText("spark join data spark", 32)
    assert(a.toSeq == b.toSeq)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)

    val df = Seq(Tuple1("spark join"), Tuple1("filter scan")).toDF("text")
    val emb = EmbeddingOp.embed(df, "text", "vec", dim = 16)
    val sim = emb.select(EmbeddingOp.cosine(col("vec"), col("vec")).as("c")).collect()
    sim.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-6))
  }

  test("LlmOp RuleProvider deterministic batched classification") {
    val df = Seq((1L, "spark spark join"), (2L, "data data data join"), (3L, "zzz")).toDF("id", "text")
    val out = LlmOp.transform(df, "text", "label", LlmOp.RuleProvider(Seq("data", "join", "spark")), batchSize = 2)
    val m = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m == Map(1L -> "spark", 2L -> "data", 3L -> "data"))
  }
}

case class NationRowT(k: Int, name: String)
