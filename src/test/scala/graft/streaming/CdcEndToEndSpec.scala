package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.CdcFormats

/** End-to-end CDC integration: a file stream of raw debezium-json
  * envelopes is parsed into row-kind-tagged changes and merged into the
  * durable snapshot store — the full capture -> parse -> apply path a
  * CDC sync job runs, across three subsystems (formats, streaming,
  * snapshot store).
  */
class CdcEndToEndSpec extends SparkSpec {

  test("debezium file stream merges into a durable snapshot") {
    val base = Files.createTempDirectory("graft-cdc-e2e").toString
    val inDir = s"$base/in"
    new java.io.File(inDir).mkdirs()
    val dataSchema = new StructType().add("id", LongType).add("name", StringType)

    def writeBatch(name: String, lines: Seq[String]): Unit = {
      val tmp = new java.io.File(base, name)
      java.nio.file.Files.write(tmp.toPath,
        String.join("\n", lines: _*).getBytes("UTF-8"))
      // atomic move into the watched dir so the stream never sees partials
      java.nio.file.Files.move(tmp.toPath, new java.io.File(inDir, name).toPath)
    }

    writeBatch("b0.json", Seq(
      """{"before":null,"after":{"id":1,"name":"a"},"op":"c"}""",
      """{"before":null,"after":{"id":2,"name":"b"},"op":"c"}"""))

    val raw = spark.readStream.schema(new StructType().add("value", StringType))
      .text(inDir).toDF("json")
    // ord would come from the envelope's ts_ms in production; each key has
    // at most one effective change per batch here, so a constant works
    val changes = CdcFormats.parseDebezium(raw, "json", dataSchema)
      .withColumn("ord", lit(0L))
    val initial = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      dataSchema.add("__row_kind", StringType).add("ord", LongType))

    val q = StreamingOps.applyCdcStream(changes, initial, Seq("id"), "ord",
      s"$base/ckpt", s"$base/state")(_ => ()).start()
    try {
      q.processAllAvailable()
      writeBatch("b1.json", Seq(
        """{"before":{"id":1,"name":"a"},"after":{"id":1,"name":"a2"},"op":"u"}""",
        """{"before":{"id":2,"name":"b"},"after":null,"op":"d"}""",
        """{"before":null,"after":{"id":3,"name":"c"},"op":"r"}"""))
      q.processAllAvailable()
    } finally q.stop()

    val snap = StreamingOps.currentSnapshot(spark, s"$base/state").get
      .select("id", "name").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(snap == Map(1L -> "a2", 3L -> "c"))
  }
}
