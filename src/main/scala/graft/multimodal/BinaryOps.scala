package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoder, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing (SURVEY §2.6).
  *
  * Media payloads travel as opaque `binary` columns next to a typed
  * metadata struct — the schema, partition sizing, and per-partition batch
  * decode shape are the scale-tested parts. Header metadata (PNG/JPEG/
  * GIF/BMP/WAV) parses from the raw byte layouts. Pixel/sample decode is
  * REAL for every container the JDK can read: PNG via [[decodePng]]
  * (JDK Inflater + spec unfiltering), JPEG/GIF/BMP via
  * `javax.imageio.ImageIO` ([[decodeJpeg]]/[[decodeImageRgb]] — the JDK
  * ships these codecs), and WAV PCM samples via
  * `javax.sound.sampled.AudioSystem` ([[decodeWav]], any PCM sub-format
  * normalized to 16-bit signed LE). Video: MJPEG-in-AVI decodes for REAL
  * ([[decodeAvi]] walks the RIFF container, [[decodeVideoFrames]] decodes
  * sampled frames to RGB888 through the JDK JPEG codec); inter-frame
  * codecs (H.264 etc.) need native libraries this container doesn't ship,
  * so for those frame *sampling* operates on header metadata
  * ([[sampleFrames]]) and the decode seam is the same batched
  * mapPartitions shape the image/audio paths use.
  */
object BinaryOps {

  /** Typed metadata carried with every media column. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Deterministic fake "image": 16-byte header [magic, w, h, frames] as
    * 4 big-endian ints, then (w*h) pseudo-pixel bytes.
    */
  def fakeImage(w: Int, h: Int, frames: Int = 1): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + w * h)
    bb.putInt(0x47524654).putInt(w).putInt(h).putInt(frames)
    var i = 0
    while (i < w * h) { bb.put(((i * 31 + 7) & 0xff).toByte); i += 1 }
    bb.array()
  }

  /** Parser for the Graft fake test container above; returns
    * (mime, width, height, n_frames) or null for undecodable.
    */
  private def decodeStub(bytes: Array[Byte]): Row =
    if (bytes == null || bytes.length < 16) null
    else {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      if (bb.getInt() != 0x47524654) null
      else Row("image/x-graft", bb.getInt(), bb.getInt(), bb.getInt())
    }

  // ---------- real container-header metadata (no codec libraries) ----------

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u16le(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def u32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def u32le(b: Array[Byte], i: Int): Int =
    ((b(i + 3) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) | ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  /** REAL header-level metadata extraction for common containers — PNG
    * (IHDR), JPEG (SOF marker scan), GIF, BMP (BITMAPINFOHEADER), and WAV
    * (RIFF fmt/data chunks) — parsed straight from the public byte
    * layouts, no image/audio libraries required. Pixel/sample DECODING
    * remains the stub above; header metadata is what partition sizing,
    * filtering, and routing need at 100 TB anyway. For audio, `width` is
    * the sample rate, `height` the channel count, and `n_frames` the
    * sample-frame count. Falls back to the Graft fake header, else null.
    */
  private[multimodal] def sniffMeta(b: Array[Byte]): Row = {
    if (b == null || b.length < 16) return null
    // PNG: 8-byte signature, then IHDR chunk: len(4) "IHDR" w(4) h(4)
    if (b.length >= 24 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      return Row("image/png", u32be(b, 16), u32be(b, 20), 1)
    // JPEG: SOI then marker scan for SOF0..SOF15 (not DHT/DAC/RST):
    // FF Cx len(2) precision(1) height(2) width(2)
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 9 < b.length && (b(i) & 0xff) == 0xff) {
        val marker = b(i + 1) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
          return Row("image/jpeg", u16be(b, i + 7), u16be(b, i + 5), 1)
        i += 2 + u16be(b, i + 2)
      }
      return null
    }
    // GIF: "GIF87a"/"GIF89a" then w(2 LE) h(2 LE)
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      return Row("image/gif", u16le(b, 6), u16le(b, 8), 1)
    // BMP: "BM", BITMAPINFOHEADER width@18 (4 LE), height@22 (4 LE)
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      return Row("image/bmp", u32le(b, 18), math.abs(u32le(b, 22)), 1)
    // AVI: "RIFF"...."AVI ", dims + frame count from the avih header
    // (metadata-only walk: no frame-byte copies)
    if (b.length >= 24 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F'
        && b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ')
      return aviWalk(b, copyFrames = false).map { case (w, h, total, nChunks, _) =>
        Row("video/avi", w, h, if (total > 0) total else nChunks)
      }.orNull
    // WAV: "RIFF"...."WAVE", then chunk scan for "fmt " and "data"
    if (b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F'
        && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      var i = 12
      var channels = 0; var sampleRate = 0; var blockAlign = 0; var dataLen = -1
      while (i + 8 <= b.length && (channels == 0 || dataLen < 0)) {
        val id = new String(b, i, 4, "US-ASCII")
        val len = u32le(b, i + 4)
        if (id == "fmt " && i + 22 <= b.length) {
          channels = u16le(b, i + 10)
          sampleRate = u32le(b, i + 12)
          blockAlign = u16le(b, i + 20)
        } else if (id == "data") dataLen = len
        i += 8 + len + (len & 1)
      }
      if (channels > 0)
        return Row("audio/wav", sampleRate, channels,
          if (blockAlign > 0 && dataLen > 0) dataLen / blockAlign else 0)
    }
    decodeStub(b)
  }

  /** Decode a binary media column into a metadata struct, batch-wise per
    * partition (the decoder is constructed once per partition — the shape a
    * JNI/codec handle needs).
    */
  def decodeMeta(df: DataFrame, binCol: String, outCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, mediaMetaType))
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // per-partition decoder setup would go here (JNI handle, etc.)
      rows.map(r => Row.fromSeq(r.toSeq :+ sniffMeta(r.getAs[Array[Byte]](idx))))
    }
  }

  /** Resize a binary image column to (outW, outH): real images
    * (PNG/JPEG/GIF/BMP) decode through the JDK codecs, resample
    * nearest-neighbor ([[resizeNearest]]), and re-encode in their
    * original container format; the Graft fake test container rewrites
    * its header (its payload is synthetic). Non-image or undecodable
    * payloads become null.
    */
  def resize(df: DataFrame, binCol: String, outW: Int, outH: Int): DataFrame = {
    val resizeUdf = udf { (bytes: Array[Byte]) =>
      if (bytes == null || bytes.length < 4) null
      else if (bytes.length >= 16
          && java.nio.ByteBuffer.wrap(bytes).getInt(0) == 0x47524654)
        fakeImage(outW, outH, java.nio.ByteBuffer.wrap(bytes).getInt(12))
      else {
        val fmt =
          if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') "png"
          else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpg"
          else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') "gif"
          else if (bytes(0) == 'B' && bytes(1) == 'M') "bmp"
          else null
        if (fmt == null) null
        else decodeImageRgbBytes(bytes).map { case (w, h, rgb) =>
          encodeImage(fmt, outW, outH, resizeNearest(rgb, w, h, outW, outH))
        }.orNull
      }
    }
    df.withColumn(binCol, resizeUdf(col(binCol)))
  }

  // ---------- real PNG pixel decode (JDK Inflater, no codec library) ----------

  /** REAL PNG decode to raw interleaved RGB888: IDAT zlib streams inflate
    * with `java.util.zip.Inflater`, scanlines un-filter per the PNG spec
    * (None/Sub/Up/Average/Paeth), and 8-bit gray / gray+alpha / RGB /
    * RGBA / palette images normalize to the w*h*3 buffer the raw-RGB
    * operators consume. Interlaced (Adam7) and 16-bit images return null
    * (rare in training corpora; the metadata path still covers them).
    * This closes the decode stub for PNG — the format's container IS
    * zlib + byte filters, both fully available in the JDK.
    */
  private[graft] def decodePng(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b == null || b.length < 33 || (b(0) & 0xff) != 0x89 ||
        b(1) != 'P' || b(2) != 'N' || b(3) != 'G') return None
    var width = 0; var height = 0; var bitDepth = 0; var colorType = 0; var interlace = 0
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    while (i + 8 <= b.length) {
      val len = u32be(b, i)
      val name = new String(b, i + 4, 4, "US-ASCII")
      val data = i + 8
      name match {
        case "IHDR" =>
          width = u32be(b, data); height = u32be(b, data + 4)
          bitDepth = b(data + 8) & 0xff; colorType = b(data + 9) & 0xff
          interlace = b(data + 12) & 0xff
        case "PLTE" => palette = java.util.Arrays.copyOfRange(b, data, data + len)
        case "IDAT" => idat.write(b, data, math.min(len, b.length - data))
        case _ =>
      }
      if (name == "IEND") i = b.length else i = data + len + 4 // skip CRC
    }
    if (width <= 0 || height <= 0 || bitDepth != 8 || interlace != 0) return None
    val channels = colorType match {
      case 0 => 1 // gray
      case 2 => 3 // rgb
      case 3 => 1 // palette index
      case 4 => 2 // gray + alpha
      case 6 => 4 // rgba
      case _ => return None
    }
    // inflate the concatenated IDAT payload
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    var off = 0
    try {
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        if (n == 0 && inflater.needsInput()) return None // truncated
        off += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    if (off < raw.length) return None

    // per-scanline unfilter (PNG spec 9. Filtering)
    val img = new Array[Byte](stride * height)
    val bpp = channels
    var y = 0
    while (y < height) {
      val ft = raw(y * (stride + 1)) & 0xff
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val rawV = raw(src + x) & 0xff
        val a = if (x >= bpp) img(dst + x - bpp) & 0xff else 0 // left
        val up = if (y > 0) img(dst - stride + x) & 0xff else 0 // above
        val c = if (x >= bpp && y > 0) img(dst - stride + x - bpp) & 0xff else 0
        val v = ft match {
          case 0 => rawV
          case 1 => rawV + a
          case 2 => rawV + up
          case 3 => rawV + ((a + up) / 2)
          case 4 => // Paeth predictor
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
            rawV + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
          case _ => return None
        }
        img(dst + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }

    // normalize to RGB888
    val rgb = new Array[Byte](width * height * 3)
    var p = 0
    while (p < width * height) {
      colorType match {
        case 0 =>
          val g = img(p)
          rgb(p * 3) = g; rgb(p * 3 + 1) = g; rgb(p * 3 + 2) = g
        case 2 =>
          rgb(p * 3) = img(p * 3); rgb(p * 3 + 1) = img(p * 3 + 1); rgb(p * 3 + 2) = img(p * 3 + 2)
        case 3 =>
          if (palette == null) return None
          val idx = (img(p) & 0xff) * 3
          if (idx + 2 >= palette.length) return None
          rgb(p * 3) = palette(idx); rgb(p * 3 + 1) = palette(idx + 1); rgb(p * 3 + 2) = palette(idx + 2)
        case 4 =>
          val g = img(p * 2)
          rgb(p * 3) = g; rgb(p * 3 + 1) = g; rgb(p * 3 + 2) = g
        case 6 =>
          rgb(p * 3) = img(p * 4); rgb(p * 3 + 1) = img(p * 4 + 1); rgb(p * 3 + 2) = img(p * 4 + 2)
      }
      p += 1
    }
    Some((width, height, rgb))
  }

  /** Decode PNG binary columns to raw RGB888 pixel buffers (+ null for
    * non-PNG / undecodable payloads) — the real end-to-end bridge from
    * container bytes to the raw-RGB operator family below.
    */
  def decodePngRgb(df: DataFrame, binCol: String, outCol: String): DataFrame = {
    val f = udf { (bytes: Array[Byte]) =>
      decodePng(bytes).map(_._3).orNull
    }
    df.withColumn(outCol, f(col(binCol)))
  }

  // ---------- real JPEG/GIF/BMP decode (javax.imageio — JDK codecs) ----------

  /** REAL JPEG (and GIF/BMP) decode to raw interleaved RGB888 via the
    * JDK's own `javax.imageio.ImageIO` codecs — no native libraries
    * needed; the JRE ships readers for jpeg/gif/bmp/png/wbmp. Colors are
    * normalized through the default sRGB conversion (`getRGB`), matching
    * what any downstream vision pipeline consumes. Returns None for
    * undecodable/truncated payloads.
    */
  private[graft] def decodeImageIo(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b == null || b.length < 4) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      catch { case _: Exception => null }
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0) return None
    val rgb = new Array[Byte](w * h * 3)
    val rowPx = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, rowPx, 0, w) // row-wise: bounded temp memory
      var x = 0
      while (x < w) {
        val v = rowPx(x)
        val i = (y * w + x) * 3
        rgb(i) = ((v >> 16) & 0xff).toByte
        rgb(i + 1) = ((v >> 8) & 0xff).toByte
        rgb(i + 2) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, rgb))
  }

  /** JPEG-only entry: rejects non-JPEG magic before handing to ImageIO. */
  private[graft] def decodeJpeg(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    if (b == null || b.length < 3 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) None
    else decodeImageIo(b)

  /** Unified image decode: PNG through the in-repo Inflater decoder
    * (pixel-exact, spec'd vs ImageIO), JPEG/GIF/BMP through the JDK
    * ImageIO codecs. One dispatch per payload on the magic bytes.
    */
  private[graft] def decodeImageRgbBytes(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b == null || b.length < 4) return None
    if ((b(0) & 0xff) == 0x89 && b(1) == 'P') decodePng(b).orElse(decodeImageIo(b))
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) decodeJpeg(b)
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') decodeImageIo(b)
    else if (b(0) == 'B' && b(1) == 'M') decodeImageIo(b)
    else None
  }

  /** Decode any JDK-supported image column (PNG/JPEG/GIF/BMP) to raw
    * RGB888 pixel buffers; null for non-image / undecodable payloads.
    */
  def decodeImageRgb(df: DataFrame, binCol: String, outCol: String): DataFrame = {
    val f = udf { (bytes: Array[Byte]) => decodeImageRgbBytes(bytes).map(_._3).orNull }
    df.withColumn(outCol, f(col(binCol)))
  }

  /** Encode a raw RGB888 buffer via ImageIO ("png"/"jpg"/"gif"/"bmp") —
    * deterministic fixture + round-trip synthesis helper (the JDK writers
    * are deterministic for fixed input on a fixed JRE).
    */
  def encodeImage(fmt: String, w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        img.setRGB(x, y,
          ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  /** Deterministic 9x8 grayscale PNG keyed by id for the perceptual-hash
    * near-dup path: consecutive ids share a base pattern (grp = id/2) with
    * a few perturbed pixels on the odd id — planted near-dup pairs. Gray
    * (r=g=b) makes the BT.601 luma the pixel value exactly, and the 9x8
    * source makes the dHash grid sampling the identity, so every stage
    * downstream is integer-exact.
    */
  def neardupFixturePng(id: Long): Array[Byte] = {
    // Long + floorMod throughout: `(id / 2).toInt` overflowed for ids
    // beyond 2^32 (the sf1 replica offsets are i*1e9), turning the moduli
    // negative and silently diverging from the DuckDB oracle's
    // exact-integer closed form. The old Int arithmetic also overflowed at
    // `grp * 11` for grp > ~195M, i.e. ids above ~3.9e8 — equivalence with
    // it holds only below that boundary, which still covers all driver
    // testdata scales, so the hash contract at the gate is unchanged.
    val grp = id / 2
    val odd = id % 2 == 1
    val px = new Array[Byte](72 * 3)
    var i = 0
    while (i < 72) {
      var v = Math.floorMod(i * i * 3 + i * Math.floorMod(grp, 97L) + grp * 11L, 256L).toInt
      if (odd && Math.floorMod(i * 7 + grp, 13L) == 0L) v = (v + 5) % 256
      px(i * 3) = v.toByte; px(i * 3 + 1) = v.toByte; px(i * 3 + 2) = v.toByte
      i += 1
    }
    encodeImage("png", 9, 8, px)
  }

  // ---------- real WAV PCM sample decode (javax.sound.sampled) ----------

  /** REAL WAV sample decode via `javax.sound.sampled.AudioSystem`: any
    * PCM sub-format the JDK reads (8-bit unsigned, 16/24/32-bit signed,
    * big/little endian) is converted to interleaved 16-bit signed
    * little-endian PCM. Returns (sampleRate, channels, pcm16le bytes).
    */
  private[graft] def decodeWav(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    if (b == null || b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F')
      return None
    try {
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(b))
      try {
        val base = in.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          base.getSampleRate, 16, base.getChannels, base.getChannels * 2,
          base.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(target, in)
        val bytes = pcm.readAllBytes()
        Some((base.getSampleRate.toInt, base.getChannels, bytes))
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Decoded-WAV struct shape; a case class so the UDF return type is
    * encoder-derived (codegen-friendly serialization, no legacy untyped UDF).
    */
  case class WavSamples(sample_rate: Int, channels: Int, n_samples: Int, pcm: Array[Byte])

  /** Decode a WAV binary column into a (sample_rate, channels, n_samples,
    * pcm16le) struct — real samples, normalized to 16-bit signed LE.
    * n_samples counts sample *frames* (all channels together).
    */
  def decodeWavSamples(df: DataFrame, binCol: String, outCol: String): DataFrame = {
    val f = udf { (bytes: Array[Byte]) =>
      decodeWav(bytes).map { case (rate, ch, pcm) =>
        WavSamples(rate, ch, pcm.length / (2 * ch), pcm)
      }
    }
    df.withColumn(outCol, f(col(binCol)))
  }

  /** Audio feature struct (encoder-derived, like [[WavSamples]]).
    * Integer/exact fields (`peak`, `zero_crossings`, `energy_sumsq`, the
    * per-window arrays) are recomputable by any engine from the raw
    * samples; `rms` is sqrt(exact/exact) so it is bit-reproducible too;
    * `spectral_centroid` involves libm cosines and is spec-verified
    * rather than oracle-hashed.
    */
  case class AudioFeatures(sample_rate: Int, channels: Int, n_samples: Int,
      peak: Int, zero_crossings: Int, energy_sumsq: Long, rms: Double,
      spectral_centroid: Double, win_sumsq: Array[Long], win_zc: Array[Int])

  /** Compute [[AudioFeatures]] from a decodable WAV payload. Channels mix
    * to mono by floor-divided frame sum (matches SQL `//` semantics on
    * negatives); a zero crossing is a sign-bit change between consecutive
    * mono samples; windows are FULL `window`-frame spans (a trailing
    * partial window is excluded, so window stats are length-invariant);
    * the spectral centroid is a direct 32-bin DFT over the first
    * min(n, 1024) mono samples (magnitude-weighted mean bin frequency).
    */
  private[graft] def audioFeaturesOf(b: Array[Byte], window: Int): Option[AudioFeatures] =
    decodeWav(b).map { case (rate, ch, pcm) =>
      val nFrames = pcm.length / (2 * ch)
      val mono = new Array[Int](nFrames)
      var f = 0
      while (f < nFrames) {
        var s = 0; var c = 0
        while (c < ch) {
          val o = (f * ch + c) * 2
          s += ((pcm(o) & 0xff) | (pcm(o + 1) << 8)).toShort.toInt
          c += 1
        }
        mono(f) = Math.floorDiv(s, ch)
        f += 1
      }
      var peak = 0; var zc = 0; var sumsq = 0L
      f = 0
      while (f < nFrames) {
        val m = mono(f)
        if (math.abs(m) > peak) peak = math.abs(m)
        if (f > 0 && (m < 0) != (mono(f - 1) < 0)) zc += 1
        sumsq += m.toLong * m
        f += 1
      }
      val rms = if (nFrames == 0) 0.0 else math.sqrt(sumsq.toDouble / nFrames)
      val nWin = if (window > 0) nFrames / window else 0
      val winSumsq = new Array[Long](nWin)
      val winZc = new Array[Int](nWin)
      var w = 0
      while (w < nWin) {
        var ss = 0L; var z = 0
        var i = w * window
        val end = (w + 1) * window
        while (i < end) {
          val m = mono(i)
          ss += m.toLong * m
          if (i > w * window && (m < 0) != (mono(i - 1) < 0)) z += 1
          i += 1
        }
        winSumsq(w) = ss; winZc(w) = z
        w += 1
      }
      // direct DFT at bins 1..32 over the first min(n, 1024) samples;
      // centroid = sum(f_k * |X_k|) / sum(|X_k|), 0 for silence
      val n = math.min(nFrames, 1024)
      var num = 0.0; var den = 0.0
      var k = 1
      while (k <= 32 && n > 0) {
        var re = 0.0; var im = 0.0
        var i = 0
        while (i < n) {
          val a = -2.0 * math.Pi * k * i / n
          re += mono(i) * math.cos(a); im += mono(i) * math.sin(a)
          i += 1
        }
        val mag = math.sqrt(re * re + im * im)
        num += (k.toDouble * rate / n) * mag
        den += mag
        k += 1
      }
      AudioFeatures(rate, ch, nFrames, peak, zc, sumsq, rms,
        if (den == 0.0) 0.0 else num / den, winSumsq, winZc)
    }

  /** Feature-extract a WAV binary column in one row pass: decode + fold
    * to the fixed-size [[AudioFeatures]] struct (the multimodal analog of
    * [[imageDHash]] — bounded bytes per clip enter the plan, never raw
    * samples). Null for undecodable payloads.
    */
  def audioFeatures(df: DataFrame, binCol: String, outCol: String,
      window: Int = 512): DataFrame = {
    val f = udf { (bytes: Array[Byte]) => audioFeaturesOf(bytes, window) }
    df.withColumn(outCol, f(col(binCol)))
  }

  /** Deterministic 16-bit PCM WAV synthesis (RIFF writer) for tests and
    * pipeline fixtures: interleaved samples straight from the given
    * generator. The inverse of [[decodeWav]] for PCM16-LE content.
    */
  def fakeWav(sampleRate: Int, channels: Int, nFrames: Int,
      sample: Int => Short = i => ((i * 1103 + 7) % 65536 - 32768).toShort): Array[Byte] = {
    val dataLen = nFrames * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nFrames * channels) { bb.putShort(sample(i)); i += 1 }
    bb.array()
  }

  // ---------- real MJPEG/AVI video decode (RIFF walk + ImageIO, JDK-only) ----------

  /** Parse an AVI (RIFF) container: (width, height, total-frame count
    * from `avih`, per-frame compressed payloads in stream order from the
    * `movi` list). MJPEG payloads ('NNdc'/'NNdb' chunks holding JPEG
    * bytes) are what the JDK can then decode — the one video family
    * fully readable without native codec libraries. Returns None for
    * non-AVI input. Chunk ids inside `idx1` are data, not chunks — the
    * walk never recurses into non-LIST chunks, so indexes are skipped.
    */
  private[graft] def decodeAvi(b: Array[Byte]): Option[(Int, Int, Int, Vector[Array[Byte]])] =
    aviWalk(b, copyFrames = true).map { case (w, h, total, _, frames) =>
      (w, h, total, frames)
    }

  /** Shared RIFF walk. `copyFrames = false` is the metadata-only pass
    * ([[sniffMeta]]): counts frame chunks without copying their bytes —
    * a metadata scan over large videos must stay allocation-light.
    * Negative or truncated chunk sizes (malformed input) stop the walk
    * instead of looping.
    */
  private def aviWalk(b: Array[Byte], copyFrames: Boolean)
      : Option[(Int, Int, Int, Int, Vector[Array[Byte]])] = {
    if (b == null || b.length < 24 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F'
        || b(8) != 'A' || b(9) != 'V' || b(10) != 'I' || b(11) != ' ') return None
    var w = 0; var h = 0; var total = 0; var nChunks = 0
    val frames = Vector.newBuilder[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var i = start
      while (i + 8 <= end) {
        val id = new String(b, i, 4, "US-ASCII")
        val len = u32le(b, i + 4)
        if (len < 0) return // >2 GiB or corrupt size: malformed, stop
        val body = i + 8
        val bodyEnd = math.min(end, body + len)
        if (id == "LIST" && len >= 4) walk(body + 4, bodyEnd)
        else if (id == "avih" && len >= 40 && body + 40 <= b.length) {
          total = u32le(b, body + 16); w = u32le(b, body + 32); h = u32le(b, body + 36)
        } else if (len > 0 && id.length == 4 && id(0).isDigit && id(1).isDigit
            && (id.substring(2) == "dc" || id.substring(2) == "db")) {
          nChunks += 1
          if (copyFrames) frames += java.util.Arrays.copyOfRange(b, body, bodyEnd)
        }
        i = body + len + (len & 1)
      }
    }
    val riffLen = u32le(b, 4)
    walk(12, if (riffLen < 0) b.length else math.min(b.length, 8 + riffLen))
    if (w > 0 && h > 0) Some((w, h, total, nChunks, frames.result())) else None
  }

  /** One decoded video frame (stream index + raw RGB888 pixels). */
  case class VideoFrame(frame_idx: Int, width: Int, height: Int, rgb: Array[Byte])

  /** REAL video frame decode for MJPEG AVI: stride-sample the container's
    * frames and decode each sampled JPEG payload to raw RGB888. Output is
    * an array<struct> column the caller explodes — the video →
    * training-frames shape with actual pixels (cf. [[sampleFrames]],
    * which strides on header metadata only and works for any container).
    */
  def decodeVideoFrames(df: DataFrame, binCol: String, outCol: String,
      stride: Int = 1): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val f = udf { (bytes: Array[Byte]) =>
      decodeAvi(bytes).map { case (_, _, _, frames) =>
        (0 until frames.length by stride).flatMap { i =>
          decodeImageRgbBytes(frames(i)).map { case (fw, fh, rgb) =>
            VideoFrame(i, fw, fh, rgb)
          }
        }
      }.orNull
    }
    df.withColumn(outCol, f(col(binCol)))
  }

  /** Deterministic MJPEG AVI synthesis (RIFF writer): `nFrames` JPEG
    * frames of [[rawRgbFrame]] content (seed = frame index) in a minimal
    * but spec-complete container (hdrl with avih + vids/MJPG strl, movi
    * with word-aligned 00dc chunks). The inverse of [[decodeAvi]].
    */
  def fakeAvi(w: Int, h: Int, nFrames: Int): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val jpegs = (0 until nFrames).map(i => encodeImage("jpg", w, h, rawRgbFrame(w, h, i)))
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array() // trailing pad byte (if odd) stays zero
    }
    def list(listType: String, bodies: Seq[Array[Byte]]): Array[Byte] = {
      val inner = bodies.map(_.length).sum
      val bb = ByteBuffer.allocate(12 + inner).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("LIST".getBytes("US-ASCII")).putInt(4 + inner).put(listType.getBytes("US-ASCII"))
      bodies.foreach(bb.put)
      bb.array()
    }
    val maxJpeg = if (jpegs.isEmpty) 0 else jpegs.map(_.length).max
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(33333).putInt(0).putInt(0).putInt(0) // usec/frame, maxBytesPerSec, padding, flags
      .putInt(nFrames).putInt(0).putInt(1).putInt(maxJpeg) // totalFrames, initial, streams, sugBuf
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0).array()
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
      .putInt(0).putShort(0).putShort(0).putInt(0) // flags, priority, language, initialFrames
      .putInt(1).putInt(30).putInt(0).putInt(nFrames) // scale, rate, start, length
      .putInt(maxJpeg).putInt(-1).putInt(0) // sugBuf, quality, sampleSize
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort).array() // rcFrame
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .put("MJPG".getBytes("US-ASCII")).putInt(w * h * 3)
      .putInt(0).putInt(0).putInt(0).putInt(0).array()
    val hdrl = list("hdrl", Seq(chunk("avih", avih),
      list("strl", Seq(chunk("strh", strh), chunk("strf", strf)))))
    val movi = list("movi", jpegs.map(j => chunk("00dc", j)))
    val inner = hdrl.length + movi.length
    val bb = ByteBuffer.allocate(12 + inner).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + inner).put("AVI ".getBytes("US-ASCII"))
    bb.put(hdrl).put(movi)
    bb.array()
  }

  // ---------- raw RGB888 pixel operators (REAL math, no codec) ----------
  //
  // Decoders produce raw interleaved RGB buffers; everything downstream of
  // the (stubbed) codec call operates on those. These operators do the
  // actual pixel arithmetic on w*h*3-byte buffers, so the only stub left
  // in the multimodal path is the container-format decode itself. UDFs are
  // appropriate here: the payloads are opaque blobs with no columnar
  // representation for codegen to exploit, and each UDF is one
  // allocation + tight primitive loop per row.

  /** Deterministic raw RGB test frame (w*h*3 bytes, gradient pattern). */
  def rawRgbFrame(w: Int, h: Int, seed: Int = 0): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      out(i * 3) = ((i + seed) & 0xff).toByte
      out(i * 3 + 1) = ((i * 2 + seed) & 0xff).toByte
      out(i * 3 + 2) = ((i * 3 + seed) & 0xff).toByte
      i += 1
    }
    out
  }

  private[graft] def resizeNearest(src: Array[Byte], srcW: Int, srcH: Int,
      outW: Int, outH: Int): Array[Byte] = {
    val out = new Array[Byte](outW * outH * 3)
    var y = 0
    while (y < outH) {
      val sy = y * srcH / outH
      var x = 0
      while (x < outW) {
        val sx = x * srcW / outW
        val si = (sy * srcW + sx) * 3
        val di = (y * outW + x) * 3
        out(di) = src(si); out(di + 1) = src(si + 1); out(di + 2) = src(si + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Nearest-neighbor resize of raw RGB888 buffers; source dimensions come
    * from the metadata struct (see [[decodeMeta]]). Null-safe: wrong-sized
    * buffers pass through as null.
    */
  def resizeRawRgb(df: DataFrame, binCol: String, metaCol: String,
      outW: Int, outH: Int): DataFrame = {
    val f = udf { (bytes: Array[Byte], w: Int, h: Int) =>
      if (bytes == null || w <= 0 || h <= 0 || bytes.length != w * h * 3) null
      else resizeNearest(bytes, w, h, outW, outH)
    }
    df.withColumn(binCol, f(col(binCol), col(s"$metaCol.width"), col(s"$metaCol.height")))
      .withColumn(metaCol, struct(col(s"$metaCol.mime").as("mime"),
        lit(outW).as("width"), lit(outH).as("height"),
        col(s"$metaCol.n_frames").as("n_frames")))
  }

  /** Classic 64-bit difference hash (dHash) of a raw RGB888 buffer: the
    * image is sampled onto a 9-wide x 8-tall grayscale grid (nearest
    * neighbor, same index arithmetic as [[resizeNearest]]; BT.601 integer
    * luma, same as [[toGrayscale]]) and bit r*8+c is set iff the grid cell
    * to the right is strictly brighter. Near-duplicate images — resizes,
    * re-encodes, small edits — land within a few bits of Hamming distance,
    * so image near-dup reduces to the same banded signature blocking the
    * text family uses. All-integer arithmetic, so an independent engine
    * can recompute hashes exactly (the `q_image_neardup` oracle does).
    */
  private[graft] def dHash64(rgb: Array[Byte], w: Int, h: Int): Long = {
    var bits = 0L
    var r = 0
    while (r < 8) {
      val sy = r * h / 8
      var c = 0
      while (c < 8) {
        val i0 = (sy * w + c * w / 9) * 3
        val i1 = (sy * w + (c + 1) * w / 9) * 3
        val g0 = (77 * (rgb(i0) & 0xff) + 150 * (rgb(i0 + 1) & 0xff) + 29 * (rgb(i0 + 2) & 0xff)) >> 8
        val g1 = (77 * (rgb(i1) & 0xff) + 150 * (rgb(i1 + 1) & 0xff) + 29 * (rgb(i1 + 2) & 0xff)) >> 8
        if (g1 > g0) bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** Perceptual-hash column: decode (PNG/JPEG/GIF/BMP) and fold straight
    * to the 64-bit dHash in one row pass — 8 bytes out per image, so the
    * downstream near-dup plan never carries pixel buffers through an
    * exchange. Null for non-image / undecodable payloads.
    */
  def imageDHash(df: DataFrame, binCol: String, outCol: String): DataFrame = {
    val f = udf { (bytes: Array[Byte]) =>
      decodeImageRgbBytes(bytes).map { case (w, h, rgb) => dHash64(rgb, w, h) }
    }
    df.withColumn(outCol, f(col(binCol)))
  }

  /** BT.601 integer luma: raw RGB888 -> single-channel grayscale bytes. */
  def toGrayscale(df: DataFrame, binCol: String, outCol: String): DataFrame = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null || bytes.length % 3 != 0) null
      else {
        val out = new Array[Byte](bytes.length / 3)
        var i = 0
        while (i < out.length) {
          val r = bytes(i * 3) & 0xff
          val g = bytes(i * 3 + 1) & 0xff
          val b = bytes(i * 3 + 2) & 0xff
          out(i) = ((77 * r + 150 * g + 29 * b) >> 8).toByte
          i += 1
        }
        out
      }
    }
    df.withColumn(outCol, f(col(binCol)))
  }

  /** Per-image channel means (normalization statistics), exact integer
    * sums divided once — (mean_r, mean_g, mean_b) doubles.
    */
  def rgbChannelMeans(df: DataFrame, binCol: String, outCol: String): DataFrame = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null || bytes.length % 3 != 0 || bytes.isEmpty) null
      else {
        var (sr, sg, sb) = (0L, 0L, 0L)
        var i = 0
        val n = bytes.length / 3
        while (i < n) {
          sr += bytes(i * 3) & 0xff; sg += bytes(i * 3 + 1) & 0xff; sb += bytes(i * 3 + 2) & 0xff
          i += 1
        }
        Array(sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
      }
    }
    df.withColumn(outCol, f(col(binCol)))
  }

  /** Frame sampling: emit one row per sampled frame index (stride
    * sampling), the video -> training-frames explode shape.
    */
  def sampleFrames(df: DataFrame, metaCol: String, stride: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0), coalesce(col(s"$metaCol.n_frames"), lit(1)) - 1, lit(stride))))

  /** Partition-size guard: media rows are large; repartition so a target
    * row-count per partition bounds executor memory.
    */
  def repartitionForMedia(df: DataFrame, totalRows: Long, rowsPerPartition: Long): DataFrame =
    df.repartition(math.max(1, (totalRows / math.max(1, rowsPerPartition)).toInt))
}
