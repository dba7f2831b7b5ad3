package graft.api

import java.io.{File, FileOutputStream}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.zip.{GZIPOutputStream, ZipEntry, ZipOutputStream}

/** Stages the reference connector-e2e fixture files into a local
  * directory tree that mirrors the container filesystem its configs
  * address — the same layout LocalFileIT.java:88-295 builds with
  * ContainerUtil.copyFileIntoContainers (including the zip/tar/tar.gz/
  * gz/lzo conversions it performs at test time). `Pipeline.rebasePaths`
  * then maps each config's absolute container paths onto this root, so
  * the configs themselves run VERBATIM.
  */
object ConnectorFixtures {

  val refRes: String = "/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/" +
    "connector-file-local-e2e/src/test/resources"

  lazy val root: String = stage()

  private def res(rel: String): File = new File(refRes, rel)

  private def copy(src: File, dstRel: String, dir: File): Unit = {
    val dst = new File(dir, dstRel)
    dst.getParentFile.mkdirs()
    Files.copy(src.toPath, dst.toPath, StandardCopyOption.REPLACE_EXISTING)
  }

  private def write(dstRel: String, dir: File)(f: FileOutputStream => Unit): Unit = {
    val dst = new File(dir, dstRel)
    dst.getParentFile.mkdirs()
    val out = new FileOutputStream(dst)
    try f(out) finally out.close()
  }

  /** Unique member names with preserved suffix, like the reference's
    * addToZipFile randomized naming (LocalFileIT.java:498-517).
    */
  private def entryName(src: File, i: Int): String = {
    val (base, suffix) = src.getName.span(_ != '.')
    s"${i}_$base$suffix"
  }

  private def zip(dstRel: String, dir: File, srcs: Seq[File]): Unit =
    write(dstRel, dir) { out =>
      val z = new ZipOutputStream(out)
      srcs.zipWithIndex.foreach { case (s, i) =>
        z.putNextEntry(new ZipEntry(entryName(s, i)))
        z.write(Files.readAllBytes(s.toPath))
        z.closeEntry()
      }
      z.finish()
    }

  private def tar(dstRel: String, dir: File, srcs: Seq[File], gzip: Boolean): Unit =
    write(dstRel, dir) { out =>
      import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
      val base: java.io.OutputStream = if (gzip) new GZIPOutputStream(out) else out
      val t = new TarArchiveOutputStream(base)
      srcs.zipWithIndex.foreach { case (s, i) =>
        val e = new TarArchiveEntry(s, entryName(s, i))
        t.putArchiveEntry(e)
        t.write(Files.readAllBytes(s.toPath))
        t.closeArchiveEntry()
      }
      t.finish()
      base match { case g: GZIPOutputStream => g.finish(); case _ => }
    }

  private def gz(dstRel: String, dir: File, src: File): Unit =
    write(dstRel, dir) { out =>
      val g = new GZIPOutputStream(out)
      g.write(Files.readAllBytes(src.toPath))
      g.finish()
    }

  private def lzo(dstRel: String, dir: File, src: File): Unit =
    write(dstRel, dir) { out =>
      val l = new io.airlift.compress.lzo.LzopCodec().createOutputStream(out)
      l.write(Files.readAllBytes(src.toPath))
      l.close()
    }

  private def stage(): String = {
    val dir = Files.createTempDirectory("graft-connector-e2e").toFile
    dir.deleteOnExit()
    val txt = res("text/e2e.txt")
    val json = res("json/e2e.json")
    val xml = res("xml/e2e.xml")
    val xlsx = res("excel/e2e.xlsx")
    val xls = res("excel/e2e.xls")

    copy(txt, "seatunnel/read/text/name=tyrantlucifer/hobby=coding/e2e.txt", dir)
    copy(res("text/e2e_gbk.txt"), "seatunnel/read/encoding/text/e2e_gbk.txt", dir)
    copy(res("text/e2e_delimiter.txt"), "seatunnel/read/text_delimiter/e2e.txt", dir)
    copy(res("text/e2e_time_format.txt"), "seatunnel/read/text_time_format/e2e.txt", dir)
    copy(res("text/e2e_null_format.txt"),
      "seatunnel/read/e2e_null_format/e2e_null_format.txt", dir)
    zip("seatunnel/read/zip/txt/single/e2e-txt.zip", dir, Seq(txt))
    zip("seatunnel/read/zip/txt/multifile/multiZip.zip", dir, Seq(txt, txt))
    tar("seatunnel/read/tar/txt/single/e2e-txt.tar", dir, Seq(txt), gzip = false)
    tar("seatunnel/read/tar/txt/multifile/multiTar.tar", dir, Seq(txt, txt), gzip = false)
    tar("seatunnel/read/tar_gz/txt/single/e2e-txt.tar.gz", dir, Seq(txt), gzip = true)
    tar("seatunnel/read/tar_gz/txt/multifile/multiTarGz.tar.gz", dir, Seq(txt, txt), gzip = true)
    gz("seatunnel/read/gz/txt/single/e2e-txt-gz.gz", dir, txt)
    lzo("seatunnel/read/lzo_text/e2e.txt", dir, txt)

    copy(json, "seatunnel/read/json/name=tyrantlucifer/hobby=coding/e2e.json", dir)
    copy(res("json/e2e_gbk.json"), "seatunnel/read/encoding/json/e2e_gbk.json", dir)
    lzo("seatunnel/read/lzo_json/e2e.json", dir, json)
    zip("seatunnel/read/zip/json/single/e2e-json.zip", dir, Seq(json))
    zip("seatunnel/read/zip/json/multifile/multiJson.zip", dir, Seq(json, json))
    gz("seatunnel/read/gz/json/single/e2e-json-gz.gz", dir, json)

    copy(xml, "seatunnel/read/xml/e2e.xml", dir)
    zip("seatunnel/read/zip/xml/single/e2e-xml.zip", dir, Seq(xml))
    gz("seatunnel/read/gz/xml/single/e2e-xml-gz.gz", dir, xml)

    copy(xlsx, "seatunnel/read/excel/name=tyrantlucifer/hobby=coding/e2e.xlsx", dir)
    copy(xls, "seatunnel/read/excel/name=tyrantlucifer/hobby=coding/e2e.xls", dir)
    copy(xlsx,
      "seatunnel/read/excel_filter/name=tyrantlucifer/hobby=coding/e2e_filter.xlsx", dir)
    zip("seatunnel/read/zip/excel/single/e2e-xlsx.zip", dir, Seq(xlsx))
    zip("seatunnel/read/zip/excel/multifile/multiZip.zip", dir, Seq(xlsx, xlsx))
    gz("seatunnel/read/gz/excel/single/e2e-gz.xlsx.gz", dir, xlsx)
    gz("seatunnel/read/gz/excel/single/e2e-gz.xls.gz", dir, xls)

    copy(res("orc/e2e.orc"), "seatunnel/read/orc/name=tyrantlucifer/hobby=coding/e2e.orc", dir)
    copy(res("orc/orc_for_cast.orc"), "seatunnel/read/orc_cast/e2e.orc", dir)
    copy(res("parquet/e2e.parquet"),
      "seatunnel/read/parquet/name=tyrantlucifer/hobby=coding/e2e.parquet", dir)
    copy(res("binary/cat.png"), "seatunnel/read/binary/cat.png", dir)
    new File(dir, "tmp/fake_empty").mkdirs()

    dir.getAbsolutePath
  }
}
