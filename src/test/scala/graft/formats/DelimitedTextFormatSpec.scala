package graft.formats

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class DelimitedTextFormatSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_textd_$tag").toString + "/out"

  test("round-trips scalars with the default Hive separators") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("ok", BooleanType),
      StructField("day", DateType)))
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, java.sql.Date.valueOf("2024-03-01")),
      Row(2L, "beta with spaces", -0.25, false, java.sql.Date.valueOf("2020-12-31")),
      Row(3L, null, null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val path = tmp("scalars")
    DelimitedTextFormat.write(df, path)
    val back = DelimitedTextFormat.read(spark, path, schema)
    assert(back.schema == schema)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("custom field delimiter and null format") {
    val schema = StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1, "x"), Row(null, "NULLISH?"), Row(3, null)), 1),
      schema)
    val path = tmp("delim")
    // the read delimiter is a REGEX (reference String.split semantics),
    // so the pipe needs escaping; writes unwrap it to the literal char
    val cfg = DelimitedTextFormat.Config(fieldDelimiter = "\\|", nullFormat = "\\N")
    DelimitedTextFormat.write(df, path, cfg)
    val lines = spark.read.text(path).collect().map(_.getString(0)).sorted
    assert(lines.contains("1|x") && lines.contains("\\N|NULLISH?") && lines.contains("3|\\N"))
    val back = DelimitedTextFormat.read(spark, path, schema, cfg)
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("nested arrays and maps use the level-2/3 separators") {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("xs", ArrayType(IntegerType)),
      StructField("m", MapType(StringType, IntegerType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1, Seq(1, 2, 3), Map("a" -> 1, "b" -> 2)), Row(2, Seq(7), Map("z" -> 9))), 1),
      schema)
    val path = tmp("nested")
    DelimitedTextFormat.write(df, path)
    val back = DelimitedTextFormat.read(spark, path, schema)
    val r = back.orderBy("id").collect()
    assert(r(0).getSeq[Int](1) == Seq(1, 2, 3))
    assert(r(0).getMap[String, Int](2) == Map("a" -> 1, "b" -> 2))
    assert(r(1).getSeq[Int](1) == Seq(7))
  }

  test("unparseable scalar tokens degrade to null instead of failing the scan") {
    val dir = Files.createTempDirectory("graft_textd_bad").toString
    Files.write(java.nio.file.Paths.get(dir, "part-0.txt"),
      "1|ok\nnot_a_number|still_read\n".getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("n", IntegerType), StructField("s", StringType)))
    val back = DelimitedTextFormat.read(spark, dir, schema,
      DelimitedTextFormat.Config(fieldDelimiter = "\\|")) // regex, like the reference
    val rows = back.orderBy($"s").collect()
    assert(rows.map(r => (Option(r.get(0)), r.getString(1))).toSet ==
      Set((Some(1), "ok"), (None, "still_read")))
  }

  test("multi-column text routes through FileSources/Sinks by field_delimiter") {
    import graft.sinks.Sinks
    import graft.sources.FileSources
    val df = Seq((10L, "x", 1.25), (20L, "y", -3.5)).toDF("k", "s", "v")
    val path = tmp("route")
    Sinks.writeFile(df, Sinks.FileSinkConfig(path, "text",
      options = Map("field_delimiter" -> "\t")))
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("s", StringType), StructField("v", DoubleType)))
    val back = FileSources.read(spark, FileSources.FileSourceConfig(
      path, "text", Some(schema), Map("field_delimiter" -> "\t")))
    assert(back.orderBy("k").collect().toSeq == df.orderBy("k").collect().toSeq)
    // single-column frames still take Spark's raw text path
    val single = Seq("raw1", "raw2").toDF("value")
    val p2 = tmp("raw")
    Sinks.writeFile(single, Sinks.FileSinkConfig(p2, "text"))
    assert(spark.read.text(p2).count() == 2)
  }
}
