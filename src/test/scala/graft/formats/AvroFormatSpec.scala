package graft.formats

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}

class AvroFormatSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_avro_$tag").toString + "/out"

  test("round-trips every supported Spark type") {
    val schema = StructType(Seq(
      StructField("s", StringType),
      StructField("i", IntegerType),
      StructField("l", LongType),
      StructField("f", FloatType),
      StructField("d", DoubleType),
      StructField("b", BooleanType),
      StructField("bin", BinaryType),
      StructField("ts", TimestampType),
      StructField("dt", DateType),
      StructField("dec", DecimalType(10, 2)),
      StructField("arr", ArrayType(IntegerType)),
      StructField("m", MapType(StringType, StringType)),
      StructField("st", StructType(Seq(
        StructField("x", IntegerType), StructField("y", StringType))))))
    val ts = java.sql.Timestamp.valueOf("2024-03-01 10:20:30.123456")
    val rows = Seq(
      Row("hello", 1, 2L, 1.5f, 2.5, true, Array[Byte](1, 2, 3), ts,
        java.sql.Date.valueOf("2024-03-01"), new java.math.BigDecimal("123.45"),
        Seq(1, 2, 3), Map("k" -> "v"), Row(7, "inner")),
      Row(null, null, null, null, null, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

    val path = tmpDir("types")
    AvroFormat.write(df, path, compression = "deflate")
    val back = AvroFormat.read(spark, path)

    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.orderBy(org.apache.spark.sql.functions.col("s").desc_nulls_last)
      .collect()
    assert(got.length == 2)
    val r = got(0)
    assert(r.getAs[String]("s") == "hello")
    assert(r.getAs[java.sql.Timestamp]("ts") == ts)
    assert(r.getAs[java.sql.Date]("dt") == java.sql.Date.valueOf("2024-03-01"))
    assert(r.getAs[java.math.BigDecimal]("dec").compareTo(new java.math.BigDecimal("123.45")) == 0)
    assert(r.getAs[scala.collection.Seq[Int]]("arr").toSeq == Seq(1, 2, 3))
    assert(r.getAs[scala.collection.Map[String, String]]("m").toMap == Map("k" -> "v"))
    assert(r.getAs[Row]("st") == Row(7, "inner"))
    assert(r.getAs[Array[Byte]]("bin").toSeq == Seq[Byte](1, 2, 3))
    assert(got(1).toSeq.forall(_ == null))
  }

  test("round-trips a real table through source/sink plumbing with snappy") {
    import graft.sinks.Sinks
    import graft.sources.FileSources
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    val path = tmpDir("orders")
    Sinks.writeFile(orders, Sinks.FileSinkConfig(path, "avro"))
    val back = FileSources.read(spark, FileSources.FileSourceConfig(path, "avro"))
    assert(back.count() == orders.count())
    val a = orders.orderBy("o_orderkey").collect()
    val b = back.orderBy("o_orderkey").collect()
    assert(a.toSeq == b.toSeq)
    // wire-format check: files are standard .avro containers
    val files = new java.io.File(path).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".avro")))
  }

  test("decodes timestamp-millis logical types from files written by other tooling") {
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"ts","type":{"type":"long","logicalType":"timestamp-millis"}},
        |{"name":"lts","type":{"type":"long","logicalType":"local-timestamp-millis"}},
        |{"name":"tsu","type":{"type":"long","logicalType":"timestamp-micros"}}]}""".stripMargin)
    val dir = new java.io.File(tmpDir("millis")); dir.mkdirs()
    val w = new org.apache.avro.file.DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(dir, "m.avro"))
    val millis = 1709288430123L // 2024-03-01T10:20:30.123Z
    val rec = new GenericData.Record(schema)
    rec.put("ts", millis); rec.put("lts", millis); rec.put("tsu", millis * 1000L)
    w.append(rec); w.close()

    val r = AvroFormat.read(spark, dir.toString).collect()(0)
    assert(r.getAs[java.sql.Timestamp]("ts").getTime == millis)
    assert(r.getAs[java.sql.Timestamp]("tsu").getTime == millis)
    assert(r.getAs[java.time.LocalDateTime]("lts") ==
      java.time.LocalDateTime.ofEpochSecond(millis / 1000,
        (millis % 1000).toInt * 1000000, java.time.ZoneOffset.UTC))
  }

  test("write refuses existing path unless mode=overwrite") {
    import graft.sinks.Sinks
    val df = spark.range(3).toDF("id")
    val path = tmpDir("mode")
    Sinks.writeFile(df, Sinks.FileSinkConfig(path, "avro"))
    intercept[IllegalArgumentException] {
      Sinks.writeFile(df, Sinks.FileSinkConfig(path, "avro", mode = "error"))
    }
    Sinks.writeFile(df, Sinks.FileSinkConfig(path, "avro", mode = "overwrite"))
    assert(graft.formats.AvroFormat.read(spark, path).count() == 3)
  }
}
