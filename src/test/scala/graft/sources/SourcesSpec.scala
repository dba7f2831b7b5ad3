package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.types._

import graft.sinks.Sinks

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("FakeSource generates deterministic schema-driven rows on the cluster") {
    val df = FakeSource.generate(spark,
      Seq("id_str" -> "string", "n" -> "int", "flag" -> "boolean", "ts" -> "timestamp"), 100, slices = 4)
    assert(df.count() == 100)
    assert(df.schema.map(f => f.name -> f.dataType.typeName).toMap ==
      Map("id_str" -> "string", "n" -> "integer", "flag" -> "boolean", "ts" -> "timestamp"))
    val again = FakeSource.generate(spark,
      Seq("id_str" -> "string", "n" -> "int", "flag" -> "boolean", "ts" -> "timestamp"), 100, slices = 4)
    assert(df.collect().map(_.toString).sorted.sameElements(again.collect().map(_.toString).sorted))
  }

  test("file round-trip: csv/json/orc/parquet/text through FileSources/Sinks") {
    val dir = Files.createTempDirectory("graft-files").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "s", "v")
    for (fmt <- Seq("parquet", "orc", "json", "csv")) {
      Sinks.writeFile(df, Sinks.FileSinkConfig(s"$dir/$fmt", fmt))
      val schema = if (fmt == "csv" || fmt == "json")
        Some(StructType(Seq(StructField("k", LongType), StructField("s", StringType), StructField("v", DoubleType))))
      else None
      val back = FileSources.read(spark, FileSources.FileSourceConfig(
        s"$dir/$fmt", fmt, schema, if (fmt == "csv") Map("header" -> "true") else Map.empty))
      assert(back.orderBy("k").collect().map(_.toSeq.toList).toList ==
        List(List(1L, "a", 1.5), List(2L, "b", 2.5)), s"round-trip failed for $fmt")
    }
    // text is single-column
    Sinks.writeFile(df.selectExpr("concat(k, ',', s) AS value"), Sinks.FileSinkConfig(s"$dir/text", "text"))
    val txt = FileSources.read(spark, FileSources.FileSourceConfig(s"$dir/text", "text"))
    assert(txt.count() == 2)
    // xml (Spark 4 native)
    Sinks.writeFile(df, Sinks.FileSinkConfig(s"$dir/xml", "xml", options = Map("rowTag" -> "row")))
    val xml = FileSources.read(spark, FileSources.FileSourceConfig(s"$dir/xml", "xml",
      options = Map("rowTag" -> "row")))
    assert(xml.orderBy("k").collect().map(_.getAs[Long]("k")).toSeq == Seq(1L, 2L))
  }

  test("archived CSV with skip_header_row_number keeps every data row (ADVICE r6)") {
    val dir = Files.createTempDirectory("graft-csv-skip").toFile
    val zipF = new java.io.File(dir, "data.zip")
    val z = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(zipF))
    z.putNextEntry(new java.util.zip.ZipEntry("m.csv"))
    z.write("id,name\n1,a\n2,b\n3,c\n".getBytes)
    z.closeEntry(); z.finish(); z.close()
    val schema = StructType(Seq(StructField("id", IntegerType), StructField("name", StringType)))
    val rows = FileSources.read(spark, FileSources.FileSourceConfig(zipF.getAbsolutePath,
      "csv", Some(schema),
      Map("archive_compress_codec" -> "zip", "skip_header_row_number" -> "1")))
      .orderBy("id").collect()
    // the member pre-drops the header line; the csv reader must not eat row 1 too
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "a"), (2, "b"), (3, "c")))
    // and skip_header_row_number > 1 drops exactly that many rows on plain files
    val plainDir = new java.io.File(dir, "plain"); plainDir.mkdirs()
    Files.write(new java.io.File(plainDir, "m.csv").toPath, "junk line\nid,name\n1,a\n2,b\n".getBytes)
    val rows2 = FileSources.read(spark, FileSources.FileSourceConfig(plainDir.toString,
      "csv", Some(schema), Map("skip_header_row_number" -> "2"))).orderBy("id").collect()
    assert(rows2.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "a"), (2, "b")))
  }

  test("archived XML parses per task without driver staging (VERDICT r6)") {
    // fragment scanner: attributes, self-closing rows, name-prefix tags
    assert(FileSources.xmlFragments(
      "<rows><row a=\"1\">x</row><rowset>no</rowset><row/><row>y</row></rows>", "row").toList
      == List("<row a=\"1\">x</row>", "<row/>", "<row>y</row>"))
    val dir = Files.createTempDirectory("graft-xml-arch").toFile
    val zipF = new java.io.File(dir, "docs.zip")
    val z = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(zipF))
    def member(name: String, body: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name)); z.write(body.getBytes); z.closeEntry()
    }
    member("m1.xml",
      """<?xml version="1.0"?><root><row><id>1</id><s>a</s></row><row><id>2</id><s>b</s></row></root>""")
    member("m2.xml", """<root><row><id>3</id><s>c</s></row></root>""")
    z.finish(); z.close()
    val tmpRoot = new java.io.File(System.getProperty("java.io.tmpdir"))
    def stagedDirs = tmpRoot.list().count(_.startsWith("graft-xml-archive"))
    val before = stagedDirs
    val out = FileSources.read(spark, FileSources.FileSourceConfig(zipF.getAbsolutePath,
      "xml", None, Map("archive_compress_codec" -> "zip", "xml_row_tag" -> "row")))
      .orderBy("id").collect()
    assert(out.map(r => (r.getAs[Any]("id").toString.toLong, r.getAs[String]("s"))).toSeq
      == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // no driver-side scratch staging happened (the old collect() path)
    assert(stagedDirs == before, "archive XML must not stage via the driver")
  }

  test("compress_codec option maps to the writer compression") {
    val dir = Files.createTempDirectory("graft-codec").toString
    val df = Seq((1L, "a")).toDF("k", "s")
    Sinks.writeFile(df, Sinks.FileSinkConfig(s"$dir/gz", "parquet",
      options = Map("compress_codec" -> "gzip")))
    val files = new java.io.File(s"$dir/gz").listFiles().map(_.getName)
    assert(files.exists(_.contains(".gz.parquet")), files.mkString(","))
    assert(spark.read.parquet(s"$dir/gz").count() == 1)
  }

  test("file stream source: readStream json -> transform -> memory sink") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    spark.range(0, 5).selectExpr("id", "concat('n', id) AS name")
      .coalesce(1).write.mode("overwrite").json(dir)
    val stream = spark.readStream.schema(schema).json(dir)
    assert(stream.isStreaming)
    val transformed = graft.operators.FieldOps.renameFields(
      graft.operators.RowOps.filterRows(stream, "id >= 2"), Map("name" -> "label"))
    val q = transformed.writeStream.format("memory").queryName("filestream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("filestream").collect()
      assert(rows.length == 3)
      assert(spark.table("filestream").columns.toSeq == Seq("id", "label"))
    } finally q.stop()
  }

  private val userSchema = new StructType().add("id", LongType).add("name", StringType)

  test("parseDebezium emits row-kind-tagged change rows") {
    val rows = Seq(
      """{"before":null,"after":{"id":1,"name":"a"},"op":"c"}""",
      """{"before":{"id":1,"name":"a"},"after":{"id":1,"name":"b"},"op":"u"}""",
      """{"before":{"id":1,"name":"b"},"after":null,"op":"d"}""").toDF("json")
    val out = CdcFormats.parseDebezium(rows, "json", userSchema)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("name"), r.getAs[String]("__row_kind")))
    assert(out.toSet == Set((1L, "a", "+I"), (1L, "a", "-U"), (1L, "b", "+U"), (1L, "b", "-D")))
  }

  test("parseCanal reconstructs update pre-image from old[] patch") {
    val rows = Seq(
      """{"data":[{"id":1,"name":"x"},{"id":2,"name":"y"}],"old":null,"type":"INSERT"}""",
      """{"data":[{"id":1,"name":"x2"}],"old":[{"name":"x"}],"type":"UPDATE"}""",
      """{"data":[{"id":2,"name":"y"}],"old":null,"type":"DELETE"}""").toDF("json")
    val out = CdcFormats.parseCanal(rows, "json", userSchema)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("name"), r.getAs[String]("__row_kind")))
    assert(out.toSet == Set(
      (1L, "x", "+I"), (2L, "y", "+I"),
      (1L, "x", "-U"), (1L, "x2", "+U"),
      (2L, "y", "-D")))
  }

  test("parseMaxwell handles single-row envelopes") {
    val rows = Seq(
      """{"data":{"id":5,"name":"n"},"old":null,"type":"insert"}""",
      """{"data":{"id":5,"name":"m"},"old":{"name":"n"},"type":"update"}""").toDF("json")
    val out = CdcFormats.parseMaxwell(rows, "json", userSchema)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("name"), r.getAs[String]("__row_kind")))
    assert(out.toSet == Set((5L, "n", "+I"), (5L, "n", "-U"), (5L, "m", "+U")))
  }

  test("parseConnectJson unwraps schema+payload envelopes, object or array") {
    val rows = Seq(
      """{"schema":{"type":"struct"},"payload":{"id":1,"name":"a"}}""",
      """{"schema":{"type":"struct"},"payload":[{"id":2,"name":"b"},{"id":3,"name":"c"}]}""")
      .toDF("json")
    val out = CdcFormats.parseConnectJson(rows, "json", userSchema)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("name"), r.getAs[String]("__row_kind")))
    assert(out.toSet == Set((1L, "a", "+I"), (2L, "b", "+I"), (3L, "c", "+I")))
  }

  test("CDC serialization round-trips through the matching parser") {
    val changes = Seq(
      (1L, "a", "+I"), (2L, "b", "+U"), (3L, "c", "-U"), (4L, "d", "-D"))
      .toDF("id", "name", "__row_kind")
    // reference serializers collapse +U to the insert op and -U to the
    // delete op, so kinds come back as +I / -D
    val expect = Set((1L, "a", "+I"), (2L, "b", "+I"), (3L, "c", "-D"), (4L, "d", "-D"))
    def got(parsed: org.apache.spark.sql.DataFrame): Set[(Long, String, String)] =
      parsed.collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("name"),
        r.getAs[String]("__row_kind"))).toSet

    assert(got(CdcFormats.parseDebezium(
      CdcFormats.toDebeziumJson(changes), "json", userSchema)) == expect)
    assert(got(CdcFormats.parseCanal(
      CdcFormats.toCanalJson(changes), "json", userSchema)) == expect)
    assert(got(CdcFormats.parseMaxwell(
      CdcFormats.toMaxwellJson(changes), "json", userSchema)) ==
      expect.map { case (i, n, k) => (i, n, if (k == "+I") "+I" else "-D") })
    assert(got(CdcFormats.parseOgg(
      CdcFormats.toOggJson(changes), "json", userSchema)) == expect)
    // explicit data column selection keeps extra columns out of the envelope
    val withExtra = changes.withColumn("extra",
      org.apache.spark.sql.functions.lit("x"))
    val json = CdcFormats.toDebeziumJson(withExtra, Seq("id", "name"))
      .collect().map(_.getString(0))
    assert(json.forall(!_.contains("extra")))
  }

  test("assert sink: one-pass rules, failures reported") {
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String])).toDF("k", "s")
    Sinks.assertRules(df, Seq(Sinks.RowCountBetween(1, 5), Sinks.MinValue("k", 0)))
    val err = intercept[Sinks.AssertionFailed] {
      Sinks.assertRules(df, Seq(Sinks.NotNull("s"), Sinks.RowCountBetween(3, 5)))
    }
    assert(err.getMessage.contains("nulls") && err.getMessage.contains("row count"))
  }

  test("assert sink: length, equality, and field-type rules") {
    val df = Seq(("abc", 1), ("defg", 1)).toDF("s", "one")
    Sinks.assertRules(df, Seq(
      Sinks.MinLength("s", 3), Sinks.MaxLength("s", 4),
      Sinks.EqualsValue("one", 1), Sinks.FieldType("s", "string"),
      Sinks.FieldType("one", "int")))
    val lenErr = intercept[Sinks.AssertionFailed] {
      Sinks.assertRules(df, Seq(Sinks.MinLength("s", 4), Sinks.MaxLength("s", 3)))
    }
    assert(lenErr.getMessage.contains("min(length(s))") &&
      lenErr.getMessage.contains("max(length(s))"))
    val eqErr = intercept[Sinks.AssertionFailed] {
      Sinks.assertRules(df, Seq(Sinks.EqualsValue("s", "abc")))
    }
    assert(eqErr.getMessage.contains("!= abc"))
    // schema rules fail fast without a scan
    val tyErr = intercept[Sinks.AssertionFailed] {
      Sinks.assertRules(df, Seq(Sinks.FieldType("one", "bigint")))
    }
    assert(tyErr.getMessage.contains("expected bigint"))
    val missErr = intercept[Sinks.AssertionFailed] {
      Sinks.assertRules(df, Seq(Sinks.FieldType("nope", "string")))
    }
    assert(missErr.getMessage.contains("missing"))
  }
}
