package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.SparkSpec

/** The real PNG decoder against two independent oracles: the JDK's own
  * ImageIO codec (pixel-exact comparison over generated images covering
  * every filter/color-type path the encoder emits) and the reference
  * e2e's golden cat.png fixture (dims must agree with the header
  * sniffer, payload must be a full RGB888 frame).
  */
class PngDecodeSpec extends SparkSpec {

  private def pngBytes(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def gradient(w: Int, h: Int, typ: Int): BufferedImage = {
    val img = new BufferedImage(w, h, typ)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 7 + y) & 0xff; val g = (x + y * 13) & 0xff; val b = (x * y) & 0xff
        val a = (255 - ((x + y) & 0x3f))
        img.setRGB(x, y, (a << 24) | (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  test("decodePng matches ImageIO pixel-exactly (RGB and RGBA sources)") {
    for (typ <- Seq(BufferedImage.TYPE_INT_RGB, BufferedImage.TYPE_INT_ARGB)) {
      val img = gradient(41, 23, typ) // odd dims exercise filter edges
      val bytes = pngBytes(img)
      val Some((w, h, rgb)) = BinaryOps.decodePng(bytes)
      assert((w, h) == (41, 23))
      assert(rgb.length == w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val expected = img.getRGB(x, y)
          val i = (y * w + x) * 3
          assert((rgb(i) & 0xff) == ((expected >> 16) & 0xff), s"R at ($x,$y) type $typ")
          assert((rgb(i + 1) & 0xff) == ((expected >> 8) & 0xff), s"G at ($x,$y) type $typ")
          assert((rgb(i + 2) & 0xff) == (expected & 0xff), s"B at ($x,$y) type $typ")
          x += 1
        }
        y += 1
      }
    }
  }

  test("decodePng matches ImageIO on grayscale sources") {
    val img = gradient(17, 9, BufferedImage.TYPE_BYTE_GRAY)
    val Some((w, h, rgb)) = BinaryOps.decodePng(pngBytes(img))
    assert((w, h) == (17, 9))
    var i = 0
    while (i < w * h) {
      // raw raster sample: getRGB would apply gray->sRGB color conversion
      val expected = img.getRaster.getSample(i % w, i / w, 0)
      assert((rgb(i * 3) & 0xff) == expected && rgb(i * 3) == rgb(i * 3 + 1) &&
        rgb(i * 3 + 1) == rgb(i * 3 + 2), s"pixel $i")
      i += 1
    }
  }

  test("reference golden cat.png decodes; dims agree with the header sniffer") {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/" +
        "connector-file-local-e2e/src/test/resources/binary/cat.png"))
    val meta = BinaryOps.sniffMeta(bytes)
    val Some((w, h, rgb)) = BinaryOps.decodePng(bytes)
    assert(w == meta.getInt(1) && h == meta.getInt(2), s"dims ($w,$h) vs header $meta")
    assert(rgb.length == w * h * 3)
    // the decoded frame feeds the raw-RGB operator family
    assert(BinaryOps.resizeNearest(rgb, w, h, 8, 8).length == 8 * 8 * 3)
  }

  test("decodePngRgb operator: PNG rows gain pixel buffers, others null") {
    import spark.implicits._
    val png = pngBytes(gradient(5, 4, BufferedImage.TYPE_INT_RGB))
    val df = Seq(("a", png), ("b", Array[Byte](1, 2, 3))).toDF("id", "data")
    val out = BinaryOps.decodePngRgb(df, "data", "pixels").orderBy("id").collect()
    assert(out(0).getAs[Array[Byte]]("pixels").length == 5 * 4 * 3)
    assert(out(1).getAs[Array[Byte]]("pixels") == null)
  }

  test("non-supported PNG variants return None, not garbage") {
    // truncated payload
    val img = gradient(12, 12, BufferedImage.TYPE_INT_RGB)
    val bytes = pngBytes(img)
    assert(BinaryOps.decodePng(java.util.Arrays.copyOf(bytes, bytes.length / 2)).isEmpty)
    assert(BinaryOps.decodePng("nonsense".getBytes).isEmpty)
  }
}
