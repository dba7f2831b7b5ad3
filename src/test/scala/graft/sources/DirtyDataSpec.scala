package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

import graft.SparkSpec

class DirtyDataSpec extends SparkSpec {

  test("readWithDeadLetter routes unparseable json to the DLQ, returns clean rows") {
    val dir = Files.createTempDirectory("graft_dlq_in").toString
    val dlq = Files.createTempDirectory("graft_dlq_out").toString + "/dlq"
    Files.write(Paths.get(dir, "data.json"),
      """{"id": 1, "name": "ok"}
        |this is not json at all
        |{"id": "NaN-ish", "name": {"nested": "wrong shape"}}
        |{"id": 3, "name": "fine"}
        |""".stripMargin.getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val clean = FileSources.readWithDeadLetter(spark,
      FileSources.FileSourceConfig(dir, "json", Some(schema)), dlq)
    val rows = clean.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "ok"), (3L, "fine")))
    val dead = spark.read.text(dlq).collect().map(_.getString(0))
    assert(dead.length == 2)
    assert(dead.exists(_.contains("not json")))
    assert(dead.exists(_.contains("wrong shape")))
  }

  test("compact rewrites a many-small-file directory into few files, same rows") {
    import graft.sinks.Sinks
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    val df = spark.range(0, 10000).toDF("id")
    df.repartition(40).write.parquet(dir)
    val before = new java.io.File(dir).listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(before >= 40)
    val (reportedBefore, after) = Sinks.compact(spark, dir, "parquet",
      targetFileBytes = 10L * 1024 * 1024)
    assert(reportedBefore == before && after == 1)
    val back = spark.read.parquet(dir)
    assert(back.count() == 10000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).collect()(0).getLong(0)
      == (0L until 10000L).sum)
    // no leftover tmp/old dirs
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(_.contains("__compact")))
  }
}
