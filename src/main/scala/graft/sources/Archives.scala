package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream, InputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Archive / whole-file-codec expansion for file sources.
  *
  * Reference: connector-file `archive_compress_codec` (zip / tar / tar_gz /
  * gz / none) and `compress_codec` (lzo) — BaseFileSourceConfig resolves
  * the codec per FILE, so the distributed shape is a `binaryFile` scan
  * (one archive per task, splittable across files) followed by a
  * flatMap that inflates entries in the executor. Entry payloads are
  * materialized per entry — the same bound as the reference's
  * ArchiveCompressFormat readers — so archive members should be
  * file-sized, not partition-sized. Plain directories of .gz text/json
  * don't need any of this (Hadoop's extension-based codecs handle them);
  * this path exists for archives and for compressed payloads whose file
  * extension lies (the reference e2e stages lzo bytes under `e2e.txt`).
  */
object Archives {

  /** One archive member: which archive it came from, the member name
    * (the file's own name for single-file codecs), and the raw bytes.
    */
  final case class Entry(path: String, entry: String, content: Array[Byte])

  private def drain(in: InputStream): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** Inflate one archive file into its member entries. */
  private[sources] def expand(path: String, bytes: Array[Byte], codec: String): Iterator[Entry] = {
    import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
    import org.apache.commons.compress.compressors.gzip.GzipCompressorInputStream
    def tarEntries(in: InputStream): Iterator[Entry] = {
      val tar = new TarArchiveInputStream(in)
      Iterator.continually(tar.getNextEntry).takeWhile(_ != null)
        .filterNot(_.isDirectory)
        .map(e => Entry(path, e.getName, drain(tar)))
        .toIndexedSeq.iterator
    }
    codec.toLowerCase match {
      case "zip" =>
        val zip = new java.util.zip.ZipInputStream(new ByteArrayInputStream(bytes))
        Iterator.continually(zip.getNextEntry).takeWhile(_ != null)
          .filterNot(_.isDirectory)
          .map(e => Entry(path, e.getName, drain(zip)))
          .toIndexedSeq.iterator
      case "tar" => tarEntries(new ByteArrayInputStream(bytes))
      case "tar_gz" | "tgz" => tarEntries(
        new GzipCompressorInputStream(new ByteArrayInputStream(bytes), true))
      case "gz" | "gzip" =>
        val name = path.split('/').last.stripSuffix(".gz")
        Iterator.single(Entry(path, name, drain(
          new GzipCompressorInputStream(new ByteArrayInputStream(bytes), true))))
      case "lzo" =>
        // lzop framing via aircompressor's Hadoop codec adapter (already
        // on Spark's classpath)
        val name = path.split('/').last
        Iterator.single(Entry(path, name, drain(
          new io.airlift.compress.lzo.LzopCodec().createInputStream(
            new BufferedInputStream(new ByteArrayInputStream(bytes))))))
      case "none" | "" => Iterator.single(Entry(path, path.split('/').last, bytes))
      case other => throw new IllegalArgumentException(s"unsupported archive codec: $other")
    }
  }

  /** All member entries of the archives under `path` as (path, entry,
    * content) rows — one binaryFile scan, per-task inflation.
    */
  def entries(spark: SparkSession, path: String, codec: String): Dataset[Entry] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => expand(p, bytes, codec) }
  }

  /** Archive members decoded to text lines (`value`), the input shape of
    * the line-oriented formats (text/csv/json-lines).
    */
  def lines(spark: SparkSession, path: String, codec: String,
      charset: String = "UTF-8"): DataFrame = {
    import spark.implicits._
    entries(spark, path, codec)
      .flatMap(e => new String(e.content, charset)
        .split("\r?\n", -1).iterator.filter(_.nonEmpty))
      .toDF("value")
  }
}
