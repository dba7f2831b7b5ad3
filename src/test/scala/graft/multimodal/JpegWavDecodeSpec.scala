package graft.multimodal

import graft.SparkSpec

/** The JDK-codec decode paths (VERDICT r6 #1): JPEG via javax.imageio,
  * WAV PCM via javax.sound.sampled. JPEG checks bounded per-pixel error
  * (lossy codec) on smooth content plus exact flat-color DC behavior;
  * GIF/BMP round-trip pixel-exactly (lossless); WAV is sample-exact for
  * PCM16 and conversion-exact for 8-bit unsigned sources.
  */
class JpegWavDecodeSpec extends SparkSpec {

  /** Smooth gradient (low-frequency content so JPEG error stays small). */
  private def smoothRgb(w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        out(i) = (x * 255 / math.max(1, w - 1)).toByte
        out(i + 1) = (y * 255 / math.max(1, h - 1)).toByte
        out(i + 2) = ((x + y) * 255 / math.max(1, w + h - 2)).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  test("decodeJpeg: dims exact, bounded per-pixel error on smooth content") {
    val (w, h) = (48, 32)
    val src = smoothRgb(w, h)
    val jpeg = BinaryOps.encodeImage("jpg", w, h, src)
    val Some((dw, dh, rgb)) = BinaryOps.decodeJpeg(jpeg)
    assert((dw, dh) == (w, h))
    assert(rgb.length == w * h * 3)
    var maxErr = 0
    var i = 0
    while (i < rgb.length) {
      maxErr = math.max(maxErr, math.abs((rgb(i) & 0xff) - (src(i) & 0xff)))
      i += 1
    }
    assert(maxErr <= 32, s"JPEG per-pixel error $maxErr too large for smooth content")
    // header sniffer agrees with the codec on dimensions
    val meta = BinaryOps.sniffMeta(jpeg)
    assert(meta.getInt(1) == w && meta.getInt(2) == h)
  }

  test("decodeJpeg: flat-color image decodes near-exactly (DC-only blocks)") {
    val (w, h) = (24, 24)
    val flat = Array.fill(w * h * 3)(130.toByte)
    val Some((_, _, rgb)) = BinaryOps.decodeJpeg(BinaryOps.encodeImage("jpg", w, h, flat))
    rgb.foreach(b => assert(math.abs((b & 0xff) - 130) <= 2, s"flat decode ${b & 0xff}"))
  }

  test("decodeImageRgbBytes: GIF and BMP round-trip pixel-exactly; dispatch is magic-based") {
    // <=256 colors so GIF's palette quantizer is lossless: grayscale ramp
    val (w, h) = (19, 11)
    val gray = new Array[Byte](w * h * 3)
    var p = 0
    while (p < w * h) {
      val g = ((p * 7) & 0xff).toByte
      gray(p * 3) = g; gray(p * 3 + 1) = g; gray(p * 3 + 2) = g
      p += 1
    }
    for (fmt <- Seq("gif", "bmp")) {
      val bytes = BinaryOps.encodeImage(fmt, w, h, gray)
      val Some((dw, dh, rgb)) = BinaryOps.decodeImageRgbBytes(bytes)
      assert((dw, dh) == (w, h), fmt)
      assert(rgb.sameElements(gray), s"$fmt not lossless")
    }
    // PNG routes through the in-repo decoder and is also exact
    val png = BinaryOps.encodeImage("png", w, h, gray)
    assert(BinaryOps.decodeImageRgbBytes(png).get._3.sameElements(gray))
    // JPEG magic rejected by decodePng-style strictness but decoded by dispatch
    assert(BinaryOps.decodeImageRgbBytes(BinaryOps.encodeImage("jpg", w, h, gray)).isDefined)
    assert(BinaryOps.decodeImageRgbBytes("not an image at all".getBytes).isEmpty)
    assert(BinaryOps.decodeImageRgbBytes(null).isEmpty)
  }

  test("decodeWav: PCM16 synthesis round-trips sample-exactly") {
    val wav = BinaryOps.fakeWav(sampleRate = 8000, channels = 2, nFrames = 777)
    val Some((rate, ch, pcm)) = BinaryOps.decodeWav(wav)
    assert(rate == 8000 && ch == 2)
    assert(pcm.length == 777 * 2 * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < 777 * 2) {
      val expected = ((i * 1103 + 7) % 65536 - 32768).toShort
      assert(bb.getShort(i * 2) == expected, s"sample $i")
      i += 1
    }
    // header sniffer agrees on (rate, channels, frames)
    val meta = BinaryOps.sniffMeta(wav)
    assert(meta.getInt(1) == 8000 && meta.getInt(2) == 2 && meta.getInt(3) == 777)
  }

  test("decodeWav: 8-bit unsigned PCM converts to signed 16-bit (javax.sound path)") {
    // hand-build an 8-bit unsigned mono WAV: values 0,1,...,255
    val n = 256
    val bb = java.nio.ByteBuffer.allocate(44 + n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + n).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1).putInt(4000)
      .putInt(4000).putShort(1).putShort(8)
    bb.put("data".getBytes).putInt(n)
    (0 until n).foreach(i => bb.put(i.toByte))
    val Some((rate, ch, pcm)) = BinaryOps.decodeWav(bb.array())
    assert(rate == 4000 && ch == 1 && pcm.length == n * 2)
    val out = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // the JDK float converter normalizes asymmetrically: negatives scale by
    // 32768/128 (= <<8), positives by 32767/127 (so 255 hits +32767 exactly)
    (0 until n).foreach { i =>
      val c = i - 128
      val expected = if (c < 0) c << 8 else c * 32767 / 127
      assert(out.getShort(i * 2) == expected.toShort, s"u8 $i")
    }
  }

  test("decodeWav rejects garbage and truncated payloads") {
    assert(BinaryOps.decodeWav(null).isEmpty)
    assert(BinaryOps.decodeWav("RIFFgarbage".getBytes).isEmpty)
    val wav = BinaryOps.fakeWav(8000, 1, 100)
    assert(BinaryOps.decodeWav(java.util.Arrays.copyOf(wav, 30)).isEmpty)
  }

  test("decodeImageRgb + decodeWavSamples operators over mixed media rows") {
    import spark.implicits._
    val (w, h) = (9, 7)
    val src = smoothRgb(w, h)
    val rows = Seq(
      ("jpg", BinaryOps.encodeImage("jpg", w, h, src)),
      ("png", BinaryOps.encodeImage("png", w, h, src)),
      ("wav", BinaryOps.fakeWav(16000, 1, 50)),
      ("junk", Array[Byte](9, 9, 9, 9)))
    val df = rows.toDF("kind", "data")
    val out = BinaryOps.decodeWavSamples(
      BinaryOps.decodeImageRgb(df, "data", "pixels"), "data", "wav")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("jpg").getAs[Array[Byte]]("pixels").length == w * h * 3)
    assert(out("png").getAs[Array[Byte]]("pixels").sameElements(src))
    assert(out("jpg").getAs[Any]("wav") == null)
    val wavRow = out("wav").getAs[org.apache.spark.sql.Row]("wav")
    assert(wavRow.getInt(0) == 16000 && wavRow.getInt(1) == 1 && wavRow.getInt(2) == 50)
    assert(out("wav").getAs[Any]("pixels") == null)
    assert(out("junk").getAs[Any]("pixels") == null && out("junk").getAs[Any]("wav") == null)
    // decoded JPEG pixels feed the raw-RGB operator family end-to-end
    val pix = out("jpg").getAs[Array[Byte]]("pixels")
    assert(BinaryOps.resizeNearest(pix, w, h, 4, 4).length == 4 * 4 * 3)
  }
}
