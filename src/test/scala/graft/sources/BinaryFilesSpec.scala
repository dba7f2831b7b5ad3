package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BinaryFilesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_bin_$tag").toString

  test("reads whole files as (data, relativePath, partIndex) rows") {
    val dir = tmp("read")
    Files.write(Paths.get(dir, "a.bin"), Array[Byte](1, 2, 3))
    Files.createDirectories(Paths.get(dir, "sub"))
    Files.write(Paths.get(dir, "sub", "b.bin"), Array[Byte](9))
    val rows = BinaryFiles.read(spark, dir).orderBy("relativePath").collect()
    assert(rows.map(_.getAs[String]("relativePath")).toSeq == Seq("a.bin", "sub/b.bin"))
    assert(rows(0).getAs[Array[Byte]]("data").toSeq == Seq[Byte](1, 2, 3))
    assert(rows.forall(_.getAs[Long]("partIndex") == 0L))
  }

  test("chunk_size splits content into reference-style bounded parts") {
    val dir = tmp("chunk")
    Files.write(Paths.get(dir, "c.bin"), (1 to 10).map(_.toByte).toArray)
    val parts = BinaryFiles.read(spark, dir, Map("chunk_size" -> "4"))
      .orderBy("partIndex").collect()
    assert(parts.length == 3)
    assert(parts.map(_.getAs[Array[Byte]]("data").length).toSeq == Seq(4, 4, 2))
    assert(parts.map(_.getAs[Long]("partIndex")).toSeq == Seq(0L, 1L, 2L))
    // 0-byte files yield no rows — same as the reference's read loop
    // (BinaryReadStrategy emits a row per read chunk; an empty stream
    // emits none) and Spark's binaryFile listing
    Files.write(Paths.get(dir, "empty.bin"), Array.empty[Byte])
    val all = BinaryFiles.read(spark, dir, Map("chunk_size" -> "4"))
    assert(all.where($"relativePath" === "empty.bin").count() == 0)
  }

  test("chunked read -> write is a lossless distributed file copy") {
    val src = tmp("copy_src")
    val rnd = new scala.util.Random(7)
    val payload = Array.fill[Byte](2500)(rnd.nextInt().toByte)
    Files.write(Paths.get(src, "big.dat"), payload)
    Files.write(Paths.get(src, "small.dat"), Array[Byte](42))

    val dst = tmp("copy_dst")
    BinaryFiles.write(BinaryFiles.read(spark, src, Map("chunk_size" -> "512")), dst)
    assert(Files.readAllBytes(Paths.get(dst, "big.dat")).toSeq == payload.toSeq)
    assert(Files.readAllBytes(Paths.get(dst, "small.dat")).toSeq == Seq[Byte](42))
  }

  test("metadata-only projections prune file content from the scan") {
    val dir = tmp("prune")
    Files.write(Paths.get(dir, "x.bin"), Array[Byte](1))
    val plan = BinaryFiles.read(spark, dir).select("relativePath")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("content#"))
  }

  test("routes through FileSources/Sinks as format binary") {
    import graft.sinks.Sinks
    import graft.sources.FileSources
    val out = tmp("route")
    val df = Seq(("hello".getBytes("UTF-8"), "h.txt")).toDF("data", "relativePath")
    Sinks.writeFile(df, Sinks.FileSinkConfig(out, "binary"))
    val back = FileSources.read(spark, FileSources.FileSourceConfig(out, "binary",
      options = Map("path_glob" -> "*.txt")))
    assert(back.select(decode(col("data"), "UTF-8")).as[String].collect().toSeq == Seq("hello"))
  }
}
