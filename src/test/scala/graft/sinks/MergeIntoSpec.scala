package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.RowKindOps

class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private val kind = RowKindOps.RowKindCol

  test("mergeInto upserts and deletes set-wise with last-change-wins") {
    val dir = java.nio.file.Files.createTempDirectory("graft-merge").toString + "/t"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .write.parquet(dir)
    val changes = Seq(
      (2L, "b2", "+U", 1L),  // update
      (3L, null, "-D", 1L),  // delete
      (4L, "d", "+I", 1L),   // insert
      (2L, "b3", "+U", 2L))  // later update wins over b2
      .toDF("k", "v", kind, "__ord")
    Sinks.mergeInto(spark, dir, changes, Seq("k"), "__ord")
    val got = spark.read.parquet(dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "a"), (2L, "b3"), (4L, "d")))
  }

  test("mergeInto leaves no tmp/old directories behind") {
    val base = java.nio.file.Files.createTempDirectory("graft-merge2").toString
    val dir = s"$base/t"
    Seq((1L, "a")).toDF("k", "v").write.parquet(dir)
    val changes = Seq((1L, "a2", "+U", 1L)).toDF("k", "v", kind, "__ord")
    Sinks.mergeInto(spark, dir, changes, Seq("k"), "__ord")
    val leftovers = new java.io.File(base).list().toSeq.filterNot(_ == "t")
    assert(leftovers.isEmpty, leftovers.toString)
  }
}
