package graft.api

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Fidelity check: the reference's OWN example job configs run verbatim
  * through Graft's HOCON front end — the "switch engines without touching
  * your configs" claim, executed.
  */
class ReferenceConfigSpec extends SparkSpec {

  private def load(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8")

  test("reference fake_to_console.conf runs verbatim") {
    val conf = load("/root/reference/seatunnel-examples/seatunnel-engine-examples/" +
      "src/main/resources/examples/fake_to_console.conf")
    val job = Pipeline.parseHocon(conf)
    assert(job.env("job.mode") == "BATCH")
    assert(job.sources.head.plugin == "FakeSource")
    assert(job.sinks.head.plugin == "Console")
    val catalog = Pipeline.run(spark, job)
    val fake = catalog("fake")
    assert(fake.count() == 10) // reference row.num default
    assert(fake.columns.sorted.toSeq == Seq("age", "name"))
  }

  test("reference spark.batch.conf (full type-vocabulary FakeSource + sql) runs verbatim") {
    val conf = load("/root/reference/seatunnel-examples/seatunnel-spark-connector-v2-example/" +
      "src/main/resources/examples/spark.batch.conf")
    val job = Pipeline.parseHocon(conf)
    assert(job.sources.head.options.contains("schema"))
    val catalog = Pipeline.run(spark, job)
    val out = catalog("sql")
    assert(out.count() == 16) // row.num = 16
    // the sql transform's FROM dual projection binds to the fake input
    assert(out.columns.toSeq == Seq("c_map", "c_array", "c_string", "c_boolean",
      "c_tinyint", "c_smallint", "c_int", "c_bigint", "c_float", "c_double",
      "c_null", "c_bytes", "c_date", "c_timestamp"))
    val r = out.collect()(0)
    assert(r.getAs[scala.collection.Map[String, String]]("c_map").size == 2)
    assert(r.getAs[scala.collection.Seq[Int]]("c_array").length == 3)
  }

  test("hocon parser handles comments, commas, arrays, quoted strings, repeats") {
    val o = Hocon.parse(
      """# leading comment
        |a = 1, b: "two words" // trailing
        |list = [x, "y z", 3]
        |blk { inner = true
        |  nested { deep = "#notcomment" } }
        |blk { inner = false }
        |""".stripMargin)
    assert(o.get("a").contains(Hocon.Scalar("1")))
    assert(o.get("b").contains(Hocon.Scalar("two words")))
    assert(o.get("list").contains(Hocon.Arr(Seq(
      Hocon.Scalar("x"), Hocon.Scalar("y z"), Hocon.Scalar("3")))))
    // repeated keys preserved in order
    assert(o.entries.count(_._1 == "blk") == 2)
    val nested = o.entries.collect { case ("blk", v: Hocon.Obj) => v }.head
    assert(nested.get("nested").exists(_.isInstanceOf[Hocon.Obj]))
  }
}
