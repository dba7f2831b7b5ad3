package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoder, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing (SURVEY §2.6).
  *
  * Media payloads travel as opaque `binary` columns next to a typed
  * metadata struct — the schema, partition sizing, and per-partition batch
  * decode shape are the real, scale-tested parts. The decode itself is a
  * STUB (no image/audio libraries ship in this container): a deterministic
  * fake decoder parses Graft's test header instead of pixels. Swap
  * `decodeStub` for an actual codec call; everything around it is
  * production-shaped (batched mapPartitions, one decoder instance per
  * partition, bounded batch memory).
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

  /** STUB decoder ??? replace with a real codec. Parses the fake header;
    * returns (mime, width, height, n_frames) or null for undecodable.
    */
  private def decodeStub(bytes: Array[Byte]): Row =
    if (bytes == null || bytes.length < 16) null
    else {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      if (bb.getInt() != 0x47524654) null
      else Row("image/x-graft", bb.getInt(), bb.getInt(), bb.getInt())
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
      rows.map(r => Row.fromSeq(r.toSeq :+ decodeStub(r.getAs[Array[Byte]](idx))))
    }
  }

  /** "Resize": deterministic stub that rewrites the header to the target
    * size and truncates/pads the payload — real implementations swap the
    * body; the batching and schema contract are identical.
    */
  def resize(df: DataFrame, binCol: String, outW: Int, outH: Int): DataFrame = {
    val resizeUdf = udf { (bytes: Array[Byte]) =>
      if (bytes == null || bytes.length < 16) null
      else {
        val bb = java.nio.ByteBuffer.wrap(bytes)
        if (bb.getInt() != 0x47524654) null
        else { bb.getInt(); bb.getInt(); val frames = bb.getInt(); fakeImage(outW, outH, frames) }
      }
    }
    df.withColumn(binCol, resizeUdf(col(binCol)))
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
