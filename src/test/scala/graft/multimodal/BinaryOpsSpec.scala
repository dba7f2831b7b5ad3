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

  test("sniffMeta reads real container headers: PNG, JPEG, GIF, BMP, WAV") {
    // minimal PNG: signature + IHDR length/tag + 640x480 dims
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 2, 0x80.toByte, /* 640 */ 0, 0, 1, 0xe0.toByte /* 480 */) ++ Array.fill[Byte](8)(0)
    assert(BinaryOps.sniffMeta(png) == org.apache.spark.sql.Row("image/png", 640, 480, 1))

    // minimal JPEG: SOI, APP0 (len 4), SOF0 with height=100 width=200
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xe0.toByte, 0, 4, 0, 0, // APP0, skipped
      0xff.toByte, 0xc0.toByte, 0, 11, 8, 0, 100, 0, 200.toByte, 3, 0, 0, 0)
    assert(BinaryOps.sniffMeta(jpeg) == org.apache.spark.sql.Row("image/jpeg", 200, 100, 1))

    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x40, 0x01 /* 320 LE */, 0xc8.toByte, 0x00 /* 200 LE */) ++ Array.fill[Byte](6)(0)
    assert(BinaryOps.sniffMeta(gif) == org.apache.spark.sql.Row("image/gif", 320, 200, 1))

    val bmp = new Array[Byte](26)
    bmp(0) = 'B'; bmp(1) = 'M'
    bmp(18) = 0x20; bmp(19) = 0x03 // 800 LE
    bmp(22) = 0x58; bmp(23) = 0x02 // 600 LE
    assert(BinaryOps.sniffMeta(bmp) == org.apache.spark.sql.Row("image/bmp", 800, 600, 1))

    // minimal WAV: RIFF/WAVE + fmt (stereo, 44100 Hz, blockAlign 4) + data 8 bytes
    val bb = java.nio.ByteBuffer.allocate(52).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(44).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(2).putInt(44100)
      .putInt(44100 * 4).putShort(4).putShort(16)
    bb.put("data".getBytes).putInt(8)
    assert(BinaryOps.sniffMeta(bb.array()) ==
      org.apache.spark.sql.Row("audio/wav", 44100, 2, 2)) // 8 bytes / blockAlign 4

    // graft fake header still decodes; garbage stays null
    assert(BinaryOps.sniffMeta(BinaryOps.fakeImage(4, 3, 2)) ==
      org.apache.spark.sql.Row("image/x-graft", 4, 3, 2))
    assert(BinaryOps.sniffMeta(Array.fill[Byte](20)(0x55)) == null)
  }

  test("resize rewrites header and payload deterministically") {
    val out = BinaryOps.resize(media, "content", 2, 2)
    val decoded = BinaryOps.decodeMeta(out, "content", "meta").orderBy("media_id").collect()
    val m1 = decoded(0).getStruct(decoded(0).fieldIndex("meta"))
    assert(m1.getInt(1) == 2 && m1.getInt(2) == 2 && m1.getInt(3) == 10) // frames kept
  }

  test("resize is REAL for JDK-decodable images: decode, resample, re-encode") {
    import spark.implicits._
    val srcRgb = BinaryOps.rawRgbFrame(4, 4)
    val png = BinaryOps.encodeImage("png", 4, 4, srcRgb)
    val jpg = BinaryOps.encodeImage("jpg", 4, 4, srcRgb)
    val df = Seq((1L, png), (2L, jpg), (3L, Array[Byte](1, 2, 3, 4))).toDF("id", "content")
    val out = BinaryOps.resize(df, "content", 2, 2).orderBy("id").collect()
    // PNG is lossless: resized pixels must equal resizeNearest of the source
    val Some((pw, ph, prgb)) = BinaryOps.decodeImageRgbBytes(out(0).getAs[Array[Byte]](1))
    assert((pw, ph) == (2, 2))
    assert(java.util.Arrays.equals(prgb, BinaryOps.resizeNearest(srcRgb, 4, 4, 2, 2)))
    // JPEG keeps its container and the new dimensions
    val jb = out(1).getAs[Array[Byte]](1)
    assert((jb(0) & 0xff) == 0xff && (jb(1) & 0xff) == 0xd8)
    val Some((jw, jh, _)) = BinaryOps.decodeImageRgbBytes(jb)
    assert((jw, jh) == (2, 2))
    // non-image payloads become null
    assert(out(2).isNullAt(1))
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

  test("resizeRawRgb nearest-neighbor produces exact expected pixels") {
    // 2x2 RGB source with distinct pixels
    val src = Array[Byte](
      10, 11, 12,  20, 21, 22,
      30, 31, 32,  40, 41, 42)
    // upscale 2x2 -> 4x4: each source pixel repeats in a 2x2 block
    val up = BinaryOps.resizeNearest(src, 2, 2, 4, 4)
    assert(up.length == 4 * 4 * 3)
    assert(up.slice(0, 3).toSeq == Seq[Byte](10, 11, 12))
    assert(up.slice(6, 9).toSeq == Seq[Byte](20, 21, 22)) // x=2 maps to sx=1
    assert(up.slice((3 * 4 + 3) * 3, (3 * 4 + 3) * 3 + 3).toSeq == Seq[Byte](40, 41, 42))
    // downscale 4x4 -> 2x2 returns the stride-sampled originals
    val down = BinaryOps.resizeNearest(up, 4, 4, 2, 2)
    assert(down.toSeq == src.toSeq)

    // through the DataFrame op with metadata
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("img", BinaryType),
      StructField("meta", BinaryOps.mediaMetaType)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(src, Row("image/raw", 2, 2, 1))), schema)
    val out = BinaryOps.resizeRawRgb(df, "img", "meta", 4, 4).collect()(0)
    assert(out.getAs[Array[Byte]]("img").toSeq == up.toSeq)
    assert(out.getAs[Row]("meta").getAs[Int]("width") == 4)
  }

  test("toGrayscale and rgbChannelMeans compute exact BT.601/means") {
    val img = Array[Byte](0, 0, 0, 127, 127, 127, -1, -1, -1) // black, mid, white
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      java.util.List.of(Row(img)), StructType(Seq(StructField("img", BinaryType))))
    val g = BinaryOps.toGrayscale(df, "img", "gray").collect()(0).getAs[Array[Byte]]("gray")
    assert((g(0) & 0xff) == 0)
    assert((g(1) & 0xff) == (77 * 127 + 150 * 127 + 29 * 127) >> 8)
    assert((g(2) & 0xff) == (77 * 255 + 150 * 255 + 29 * 255) >> 8)
    val m = BinaryOps.rgbChannelMeans(df, "img", "m").collect()(0)
      .getAs[scala.collection.Seq[Double]]("m")
    assert(m.toSeq == Seq((0 + 127 + 255) / 3.0, (0 + 127 + 255) / 3.0, (0 + 127 + 255) / 3.0))
  }
}
