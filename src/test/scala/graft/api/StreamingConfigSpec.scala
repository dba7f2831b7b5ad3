package graft.api

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Config-level streaming fidelity: reference STREAMING job configs run
  * verbatim through runStreaming (bounded micro-batch runs).
  */
class StreamingConfigSpec extends SparkSpec {

  private def load(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8")

  private val engineE2e = "/root/reference/seatunnel-e2e/seatunnel-engine-e2e/" +
    "connector-seatunnel-e2e-base/src/test/resources/"

  test("reference e2e stream_fakesource_to_console.conf runs verbatim (full type vocabulary)") {
    val job = Pipeline.parseHocon(load(engineE2e + "stream_fakesource_to_console.conf"))
    assert(job.isStreaming)
    assert(job.env("checkpoint.interval") == "5000")
    val queries = Pipeline.runStreaming(spark, job)
    try {
      val q = queries.head
      val deadline = System.currentTimeMillis() + 30000
      var rows = 0L
      while (rows == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        rows = q.recentProgress.map(_.numInputRows).sum
      }
      assert(rows > 0, "no rows flowed through the streaming FakeSource within 30s")
      assert(q.exception.isEmpty)
    } finally queries.foreach(_.stop())
  }

  test("STREAMING FakeSource feeds a Memory sink with deterministic generated fields") {
    val conf =
      """env { job.mode = "STREAMING" }
        |source {
        |  FakeSource {
        |    row.num = 50
        |    plugin_output = "fake"
        |    schema = { fields { name = "string", age = "int" } }
        |  }
        |}
        |transform {
        |  Filter { plugin_input = "fake", plugin_output = "fake1", fields = [name] }
        |}
        |sink { Memory { query_name = "stream_fake_mem" } }
        |""".stripMargin
    val job = Pipeline.parseHocon(conf)
    val queries = Pipeline.runStreaming(spark, job)
    try {
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        n = spark.table("stream_fake_mem").count()
      }
      assert(n > 0)
      val row = spark.table("stream_fake_mem").limit(1).collect()(0)
      assert(row.schema.fieldNames.toSeq == Seq("name"))
      assert(row.getString(0).startsWith("name_")) // batch-path generator shape
    } finally queries.foreach(_.stop())
  }
}
