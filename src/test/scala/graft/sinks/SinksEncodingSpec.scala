package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.FileSources

/** Charset-aware sink writes (reference `encoding` option): non-UTF8
  * text/json lines must land in the configured charset and round-trip
  * through the matching source-side decode.
  */
class SinksEncodingSpec extends SparkSpec {
  import spark.implicits._

  test("text sink with encoding=gbk writes real GBK bytes; source reads them back") {
    val dir = Files.createTempDirectory("graft-gbk").toString + "/out"
    val df = Seq((1L, "你好，世界"), (2L, "海底隧道ABC")).toDF("id", "s")
    Sinks.writeFile(df, Sinks.FileSinkConfig(dir, "text",
      options = Map("encoding" -> "gbk", "field_delimiter" -> ",")))
    // the bytes on disk are GBK, not UTF-8 (rows may spread over several
    // part files — assert over their concatenation, not an arbitrary head)
    val fs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
    val bytes = fs.flatMap(f => Files.readAllBytes(f.toPath))
    val gbkText = new String(bytes, "GBK")
    assert(gbkText.contains("你好，世界"))
    assert(!new String(bytes, "UTF-8").contains("你好")) // really not UTF-8
    // round trip through the source-side charset decode
    val back = FileSources.read(spark, FileSources.FileSourceConfig(dir, "text",
      Some(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType)))),
      Map("encoding" -> "gbk", "field_delimiter" -> ",")))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq == Seq((1L, "你好，世界"), (2L, "海底隧道ABC")))
  }

  test("charset sink: append adds files without clobbering, partition_by fails fast (ADVICE r6)") {
    val dir = Files.createTempDirectory("graft-gbka").toString + "/out"
    def write(rows: Seq[(Long, String)], mode: String): Unit =
      Sinks.writeFile(rows.toDF("id", "s"), Sinks.FileSinkConfig(dir, "text", mode = mode,
        options = Map("encoding" -> "gbk", "field_delimiter" -> ",")))
    write(Seq((1L, "一")), "overwrite")
    write(Seq((2L, "二")), "append")
    val files = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
    assert(files.length >= 2, "append must add files, not overwrite")
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".tmp")),
      "task-commit temp files must not survive")
    val all = files.flatMap(f => new String(Files.readAllBytes(f.toPath), "GBK").split("\n"))
    assert(all.toSet == Set("1,一", "2,二"))
    // partition_by on the charset path is unsupported: loud error, not silent drop
    val ex = intercept[IllegalArgumentException] {
      Sinks.writeFile(Seq((1L, "x")).toDF("id", "s"), Sinks.FileSinkConfig(dir, "text",
        partitionBy = Seq("id"), options = Map("encoding" -> "gbk")))
    }
    assert(ex.getMessage.contains("partition_by"))
  }

  test("json sink with encoding=gbk round-trips") {
    val dir = Files.createTempDirectory("graft-gbkj").toString + "/out"
    val df = Seq((1L, "测试")).toDF("id", "s")
    Sinks.writeFile(df, Sinks.FileSinkConfig(dir, "json",
      options = Map("encoding" -> "gbk")))
    val back = FileSources.read(spark, FileSources.FileSourceConfig(dir, "json",
      None, Map("encoding" -> "gbk"))).collect()
    assert(back.length == 1 && back(0).getAs[String]("s") == "测试")
  }
}
