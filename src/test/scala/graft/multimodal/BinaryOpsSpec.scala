package graft.multimodal

import graft.SparkSpec

class BinaryOpsSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, BinaryOps.fakeImage(4, 3, 10)),
    (2L, BinaryOps.fakeImage(8, 8, 1)),
    (3L, Array[Byte](1, 2, 3)) // undecodable
  ).toDF("media_id", "content")

  test("decodeMeta parses headers batch-wise; undecodable -> null struct") {
    val out = BinaryOps.decodeMeta(media, "content", "meta").orderBy("media_id").collect()
    val m1 = out(0).getStruct(out(0).fieldIndex("meta"))
    assert(m1.getString(0) == "image/x-graft" && m1.getInt(1) == 4 && m1.getInt(2) == 3 && m1.getInt(3) == 10)
    assert(out(2).isNullAt(out(2).fieldIndex("meta")))
  }

  test("resize rewrites header and payload deterministically") {
    val out = BinaryOps.resize(media, "content", 2, 2)
    val decoded = BinaryOps.decodeMeta(out, "content", "meta").orderBy("media_id").collect()
    val m1 = decoded(0).getStruct(decoded(0).fieldIndex("meta"))
    assert(m1.getInt(1) == 2 && m1.getInt(2) == 2 && m1.getInt(3) == 10) // frames kept
  }

  test("sampleFrames explodes stride-sampled frame indices") {
    val withMeta = BinaryOps.decodeMeta(media.where($"media_id" === 1L), "content", "meta")
    val frames = BinaryOps.sampleFrames(withMeta, "meta", stride = 3)
      .select("frame_idx").collect().map(_.getInt(0))
    assert(frames.toSeq == Seq(0, 3, 6, 9))
  }

  test("repartitionForMedia sizes partitions by row budget") {
    val df = BinaryOps.repartitionForMedia(media, totalRows = 3, rowsPerPartition = 1)
    assert(df.rdd.getNumPartitions == 3)
  }
}
