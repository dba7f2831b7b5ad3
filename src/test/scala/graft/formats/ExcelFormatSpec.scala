package graft.formats

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}

class ExcelFormatSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_xlsx_$tag").toString + "/out"

  test("writes valid xlsx parts and reads them back with a schema") {
    val df = Seq(
      (1L, "alpha", 1.5, true),
      (2L, "be<ta> & \"quotes\"", -2.25, false),
      (3L, null.asInstanceOf[String], 0.0, true)).toDF("id", "name", "x", "flag")
    val path = tmpDir("types")
    ExcelFormat.write(df, path, header = true)
    val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".xlsx"))
    assert(files.nonEmpty)
    // each part is a real zip with the mandatory OOXML entries
    val zf = new java.util.zip.ZipFile(files.head)
    val entries = Iterator.continually(zf.entries())
      .take(1).flatMap(e => Iterator.continually(e.nextElement()).takeWhile(_ => e.hasMoreElements))
      .map(_.getName).toSet
    zf.close()
    assert(Set("[Content_Types].xml", "xl/workbook.xml", "xl/worksheets/sheet1.xml")
      .subsetOf(entries + "xl/worksheets/sheet1.xml"))

    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType),
      StructField("x", DoubleType), StructField("flag", BooleanType)))
    val back = ExcelFormat.read(spark, path, Some(schema), header = true)
      .orderBy("id").collect()
    assert(back.length == 3)
    assert(back(0).toSeq == Seq(1L, "alpha", 1.5, true))
    assert(back(1).toSeq == Seq(2L, "be<ta> & \"quotes\"", -2.25, false))
    assert(back(2).toSeq == Seq(3L, null, 0.0, true))
  }

  test("a configured sheet_name that is absent fails loudly (ADVICE r6)") {
    val path = tmpDir("sheetmiss")
    ExcelFormat.write(Seq((1L, "a")).toDF("id", "name"), path, header = true)
    val f = new java.io.File(path).listFiles().filter(_.getName.endsWith(".xlsx")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    // the writer names its one sheet "Sheet1": that resolves...
    assert(ExcelFormat.parseXlsx(bytes, Some("Sheet1")).nonEmpty)
    // ...but a missing name must throw, not silently read the first sheet
    val ex = intercept[IllegalArgumentException](
      ExcelFormat.parseXlsx(bytes, Some("NoSuchSheet")))
    assert(ex.getMessage.contains("NoSuchSheet"))
  }

  test("reads shared-string cells (the form other writers emit)") {
    // hand-build an xlsx with sharedStrings.xml to cover the non-inline path
    val bos = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(bos)
    def entry(n: String, c: String): Unit = {
      zip.putNextEntry(new java.util.zip.ZipEntry(n))
      zip.write(c.getBytes("UTF-8")); zip.closeEntry()
    }
    entry("xl/sharedStrings.xml",
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><si><t>hello</t></si><si><t>world</t></si></sst>""")
    entry("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
      """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>42</v></c></row>""" +
      """<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>7.5</v></c></row>""" +
      """</sheetData></worksheet>""")
    zip.close()
    val rows = ExcelFormat.parseXlsx(bos.toByteArray)
    assert(rows == Seq(Seq("hello", "42"), Seq("world", "7.5")))
  }

  test("round-trips a real table through source/sink plumbing") {
    import graft.sinks.Sinks
    import graft.sources.FileSources
    val nation = Tables.load(spark, "/root/testdata/sf0.001", "nation")
    val path = tmpDir("nation")
    Sinks.writeFile(nation, Sinks.FileSinkConfig(path, "excel"))
    val schema = StructType(Seq(StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType), StructField("n_regionkey", IntegerType)))
    val back = FileSources.read(spark,
      FileSources.FileSourceConfig(path, "excel", Some(schema)))
    assert(back.count() == nation.count())
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey").collect().toSeq)
  }

  test("sparse rows with missing cells read as nulls") {
    val bos = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(bos)
    zip.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
    zip.write(
      ("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
       """<row r="1"><c r="C1"><v>3</v></c></row>""" +
       """</sheetData></worksheet>""").getBytes("UTF-8"))
    zip.closeEntry(); zip.close()
    assert(ExcelFormat.parseXlsx(bos.toByteArray) == Seq(Seq(null, null, "3")))
  }
}
