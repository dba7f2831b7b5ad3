package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MJPEG-in-AVI video decode (JDK-only: RIFF container walk + the
  * ImageIO JPEG codec per frame). Checks the container round-trip
  * ([[BinaryOps.fakeAvi]] → [[BinaryOps.decodeAvi]]), real pixel
  * content with the JPEG bounded-error contract, metadata sniffing,
  * the stride-sampled DataFrame explode shape, and that RIFF/WAVE
  * audio is never misrouted through the video path.
  */
class AviDecodeSpec extends SparkSpec {

  test("fakeAvi round-trips through decodeAvi with real JPEG frame pixels") {
    val (w, h, n) = (32, 24, 5)
    val avi = BinaryOps.fakeAvi(w, h, n)
    val Some((dw, dh, total, frames)) = BinaryOps.decodeAvi(avi)
    assert((dw, dh, total) == (w, h, n))
    assert(frames.length == n)
    frames.zipWithIndex.foreach { case (jpeg, i) =>
      val Some((fw, fh, rgb)) = BinaryOps.decodeImageRgbBytes(jpeg)
      assert((fw, fh) == (w, h), s"frame $i dims")
      val src = BinaryOps.rawRgbFrame(w, h, i)
      // JPEG is lossy: same bounded-error contract as JpegWavDecodeSpec,
      // looser here because rawRgbFrame is high-frequency content
      var sumErr = 0L
      var j = 0
      while (j < rgb.length) {
        sumErr += math.abs((rgb(j) & 0xff) - (src(j) & 0xff)); j += 1
      }
      assert(sumErr.toDouble / rgb.length <= 48, s"frame $i mean error")
      // frames must be distinguishable: content varies with the seed
      if (i > 0) {
        val prev = BinaryOps.decodeImageRgbBytes(frames(i - 1)).get._3
        assert(!java.util.Arrays.equals(rgb, prev), s"frame $i equals frame ${i - 1}")
      }
    }
  }

  test("malformed chunk sizes terminate the walk instead of looping") {
    // a chunk claiming len 0xFFFFFFFF (negative as i32) must not hang or throw
    val bb = java.nio.ByteBuffer.allocate(32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(24).put("AVI ".getBytes("US-ASCII"))
    bb.put("avih".getBytes("US-ASCII")).putInt(-1) // corrupt size
    assert(BinaryOps.decodeAvi(bb.array()).isEmpty)
    // truncated container: declared RIFF size exceeds the byte array
    val ok = BinaryOps.fakeAvi(8, 8, 2)
    val truncated = java.util.Arrays.copyOf(ok, ok.length / 2)
    BinaryOps.decodeAvi(truncated) // must return (possibly fewer frames), not throw
  }

  test("sniffMeta reports video/avi with avih dims and frame count") {
    val meta = BinaryOps.sniffMeta(BinaryOps.fakeAvi(16, 8, 3))
    assert(meta.getString(0) == "video/avi")
    assert((meta.getInt(1), meta.getInt(2), meta.getInt(3)) == (16, 8, 3))
    // RIFF/WAVE still routes to audio, not video
    val wav = BinaryOps.sniffMeta(BinaryOps.fakeWav(8000, 1, 100))
    assert(wav.getString(0) == "audio/wav")
    assert(BinaryOps.decodeAvi(BinaryOps.fakeWav(8000, 1, 100)).isEmpty)
  }

  test("decodeVideoFrames stride-samples and explodes to real RGB frames") {
    import spark.implicits._
    val df = Seq((1L, BinaryOps.fakeAvi(16, 12, 6)), (2L, BinaryOps.fakeAvi(8, 8, 2)))
      .toDF("id", "video")
    val out = BinaryOps.decodeVideoFrames(df, "video", "frames", stride = 2)
      .select(col("id"), explode(col("frames")).as("f"))
      .select(col("id"), col("f.frame_idx"), col("f.width"), col("f.height"),
        length(col("f.rgb")).as("nbytes"))
      .orderBy("id", "frame_idx")
      .collect()
    val got = out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(got.toSeq == Seq(
      (1L, 0, 16, 12, 16 * 12 * 3), (1L, 2, 16, 12, 16 * 12 * 3), (1L, 4, 16, 12, 16 * 12 * 3),
      (2L, 0, 8, 8, 8 * 8 * 3)))
    // non-AVI payloads yield null, not an error
    val nulls = BinaryOps.decodeVideoFrames(
      Seq((3L, Array[Byte](1, 2, 3))).toDF("id", "video"), "video", "frames")
      .where(col("frames").isNull).count()
    assert(nulls == 1)
  }
}
