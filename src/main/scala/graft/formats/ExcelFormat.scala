package graft.formats

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Excel (.xlsx) file format, implemented directly over the OOXML
  * SpreadsheetML structure (ECMA-376): an .xlsx is a zip of XML parts, so
  * read/write need only JDK zip + StAX — no POI on this classpath.
  *
  * Reference: connector-file ExcelReadStrategy / ExcelWriteStrategy
  * (connector-file-base/.../reader/ExcelReadStrategy.java:60).
  *
  * Scope: first worksheet, inline + shared strings, numbers, booleans;
  * writes numbers/booleans natively and everything else as inline
  * strings (header row optional). Excel is a small-file format — files
  * are not splittable, so the read parallelizes per file
  * (`binaryFiles`), which is the honest scale story for .xlsx inputs.
  */
// Serializable: read-path lambdas call local parse helpers that compile to
// instance methods of this (stateless) module, so tasks serialize it
object ExcelFormat extends Serializable {

  // ---------- write ----------

  def write(df: DataFrame, path: String, header: Boolean = true): Unit = {
    val schema = df.schema
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val names = schema.fieldNames
    df.rdd.mapPartitionsWithIndex { (idx, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val bytes = sheetBytes(if (header) Some(names.toSeq) else None, it, schema)
        val fs = new Path(path).getFileSystem(conf.value)
        fs.mkdirs(new Path(path))
        val out = fs.create(new Path(path, f"part-$idx%05d.xlsx"), true)
        try out.write(bytes) finally out.close()
        Iterator.single(1)
      }
    }.count()
    ()
  }

  private def colRef(i: Int): String = {
    var n = i; val sb = new StringBuilder
    while (n >= 0) { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
    sb.toString
  }

  private def esc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ""
      case c => c.toString
    }

  private def cellXml(ref: String, v: Any): String = v match {
    case null => ""
    case n: Byte => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Short => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Float => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Double => s"""<c r="$ref"><v>$n</v></c>"""
    case n: java.math.BigDecimal => s"""<c r="$ref"><v>${n.toPlainString}</v></c>"""
    case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
    case other => s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(other.toString)}</t></is></c>"""
  }

  private def sheetBytes(header: Option[Seq[String]], rows: Iterator[Row],
      schema: StructType): Array[Byte] = {
    val sheet = new StringBuilder
    sheet.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sheet.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    var r = 1
    def appendRow(values: Seq[Any]): Unit = {
      sheet.append(s"""<row r="$r">""")
      values.zipWithIndex.foreach { case (v, i) =>
        sheet.append(cellXml(s"${colRef(i)}$r", v))
      }
      sheet.append("</row>")
      r += 1
    }
    header.foreach(h => appendRow(h))
    rows.foreach(row => appendRow(row.toSeq))
    sheet.append("</sheetData></worksheet>")

    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
      """</Types>""")
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      """</Relationships>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
      """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
      """</Relationships>""")
    entry("xl/worksheets/sheet1.xml", sheet.toString)
    zip.close()
    bos.toByteArray
  }

  // ---------- read ----------

  /** Parse one .xlsx byte blob into raw string rows (first sheet, or the
    * named sheet when `sheet` is set — resolved through workbook.xml +
    * its rels, the OOXML name->part indirection).
    */
  private[formats] def parseXlsx(bytes: Array[Byte],
      sheet: Option[String] = None): Seq[Seq[String]] = {
    val parts = mutable.Map[String, Array[Byte]]()
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    var e = zin.getNextEntry
    while (e != null) {
      if (e.getName == "xl/sharedStrings.xml" || e.getName == "xl/workbook.xml" ||
          e.getName == "xl/_rels/workbook.xml.rels" ||
          e.getName.matches("xl/worksheets/sheet\\d+\\.xml")) {
        val bos = new ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = zin.read(buf)
        while (n > 0) { bos.write(buf, 0, n); n = zin.read(buf) }
        parts(e.getName) = bos.toByteArray
      }
      e = zin.getNextEntry
    }
    zin.close()
    val shared = parts.get("xl/sharedStrings.xml").map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    val sheetPart: Option[String] = sheet.flatMap { want =>
      for {
        wb <- parts.get("xl/workbook.xml")
        rels <- parts.get("xl/_rels/workbook.xml.rels")
        rid <- sheetRelId(wb, want)
        target <- relTarget(rels, rid)
      } yield if (target.startsWith("/")) target.stripPrefix("/") else "xl/" + target
    }
    // a configured sheet that doesn't exist fails loudly like the
    // reference ExcelReadStrategy — falling back to the first sheet would
    // silently return the wrong data (ADVICE r6)
    if (sheet.isDefined && sheetPart.isEmpty)
      throw new IllegalArgumentException(
        s"xlsx: sheet_name '${sheet.get}' not found in workbook")
    val sheetName = sheetPart
      .orElse(parts.keys.filter(_.startsWith("xl/worksheets/")).toSeq.sorted.headOption)
      .getOrElse(throw new IllegalArgumentException("xlsx: no worksheet found"))
    parseSheet(parts(sheetName), shared)
  }

  /** workbook.xml: `<sheet name=".." r:id="rIdN"/>` for the named sheet. */
  private def sheetRelId(wb: Array[Byte], name: String): Option[String] = {
    val r = xmlReader(wb)
    try {
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "sheet" &&
            Option(r.getAttributeValue(null, "name")).contains(name)) {
          (0 until r.getAttributeCount).find(i => r.getAttributeLocalName(i) == "id")
            .foreach(i => return Some(r.getAttributeValue(i)))
        }
      }
      None
    } finally r.close()
  }

  /** workbook.xml.rels: rId -> worksheet part target. */
  private def relTarget(rels: Array[Byte], rid: String): Option[String] = {
    val r = xmlReader(rels)
    try {
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship" &&
            Option(r.getAttributeValue(null, "Id")).contains(rid))
          return Option(r.getAttributeValue(null, "Target"))
      }
      None
    } finally r.close()
  }

  private def xmlReader(bytes: Array[Byte]) = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes), "UTF-8")
  }

  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val out = mutable.ArrayBuffer[String]()
    val r = xmlReader(bytes)
    var current: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => current = new StringBuilder
            case "t" => inT = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS =>
          if (inT && current != null) current.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => out += current.toString; current = null
            case "t" => inT = false
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.toIndexedSeq
  }

  private def parseSheet(bytes: Array[Byte], shared: IndexedSeq[String]): Seq[Seq[String]] = {
    val rows = mutable.ArrayBuffer[Seq[String]]()
    val r = xmlReader(bytes)
    var cells: mutable.ArrayBuffer[String] = null
    var cellIdx = -1
    var cellType = ""
    var inV = false
    var inT = false
    val text = new StringBuilder
    def colIndex(ref: String): Int = {
      var n = 0
      ref.takeWhile(_.isLetter).foreach(c => n = n * 26 + (c - 'A' + 1))
      n - 1
    }
    def put(idx: Int, v: String): Unit = {
      while (cells.length <= idx) cells += null
      cells(idx) = v
    }
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => cells = mutable.ArrayBuffer[String]()
            case "c" =>
              val ref = Option(r.getAttributeValue(null, "r"))
              cellIdx = ref.map(colIndex).getOrElse(cells.length)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
            case "v" => inV = true; text.clear()
            case "t" => inT = true; text.clear()
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS =>
          if (inV || inT) text.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "row" => rows += cells.toSeq; cells = null
            case "v" =>
              inV = false
              val raw = text.toString
              val v = cellType match {
                case "s" => shared(raw.trim.toInt)
                case "b" => (raw.trim == "1").toString
                case _ => raw
              }
              put(cellIdx, v)
            case "t" =>
              inT = false
              if (cellType == "inlineStr") put(cellIdx, text.toString)
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.toSeq
  }

  /** Read a directory of .xlsx files (or one file). With `header`, the
    * first row of each file names the columns; a user `schema` drives
    * casts from the raw cell strings (numbers arrive as Excel doubles:
    * integral targets are cast via DECIMAL to avoid "1.0" parse failures).
    */
  def read(spark: SparkSession, path: String, schema: Option[StructType] = None,
      header: Boolean = true): DataFrame =
    readWithOptions(spark, path, schema, skipRows = if (header) 1 else 0)

  /** Reference ExcelReadStrategy option surface: `skip_header_row_number`
    * rows dropped per file, `sheet_name` selects the worksheet, archive
    * `entries` feed decompressed members (e2e stages .xlsx.gz / zipped
    * workbooks), and complex-typed cells (map/array/row) hold JSON text.
    */
  def readWithOptions(spark: SparkSession, path: String,
      schema: Option[StructType] = None, skipRows: Int = 1,
      sheetName: Option[String] = None,
      namePattern: Option[String] = None,
      entries: Option[org.apache.spark.sql.Dataset[graft.sources.Archives.Entry]] = None): DataFrame = {
    val nameRe = namePattern.map(_.r)
    // OOXML .xlsx parses via JDK zip + StAX; legacy BIFF .xls via the
    // direct OLE2/BIFF8 reader (graft.formats.BiffFormat)
    def wanted(n: String) = {
      val base = n.split('/').last
      (base.endsWith(".xlsx") || base.endsWith(".xls")) &&
        nameRe.forall(_.pattern.matcher(base).matches())
    }
    def parseAny(name: String, bytes: Array[Byte]): Seq[Seq[String]] =
      if (name.endsWith(".xls")) BiffFormat.parseXls(bytes)
      else parseXlsx(bytes, sheetName)
    // (name, bytes, partition-dir values) — Hive-style `k=v` directory
    // fields surface as row fields, like the other file formats
    val (files, partNames) = entries match {
      case Some(ds) =>
        (ds.rdd.map(e => (e.entry, e.content, Seq.empty[String]))
          .filter(f => wanted(f._1)), Seq.empty[String])
      case None =>
        val base = spark.read.format("binaryFile").load(path)
        val parts = base.columns.filterNot(
          Set("path", "modificationTime", "length", "content")).toSeq
        val rdd = base.select((Seq(col("path"), col("content")) ++ parts.map(col)): _*)
          .rdd.map(r => (r.getString(0), r.getAs[Array[Byte]](1),
            parts.indices.map(i => Option(r.get(i + 2)).map(_.toString).orNull)))
          .filter(f => wanted(f._1))
        (rdd, parts)
    }
    val raw = files.flatMap { case (name, bytes, parts) =>
      parseAny(name, bytes).drop(skipRows).map(cells => (cells, parts))
    }
    val names: Seq[String] = schema.map(_.fieldNames.toSeq).getOrElse {
      val first = files.map(f => (f._1, f._2)).take(1).headOption
        .map { case (n, b) => parseAny(n, b) }.getOrElse(Seq.empty)
      if (skipRows > 0 && first.nonEmpty) first.head.map(Option(_).getOrElse("_c"))
      else first.headOption.map(r => r.indices.map(i => s"_c$i")).getOrElse(Seq.empty)
    }
    val width = names.length
    val rowRdd = raw.map { case (cells, parts) =>
      Row.fromSeq((0 until width).map(i =>
        if (i < cells.length) cells(i) else null) ++ parts)
    }
    val strDf = spark.createDataFrame(rowRdd,
      StructType((names ++ partNames).map(n => StructField(n, StringType))))
    schema match {
      case None => strDf
      case Some(st) =>
        strDf.select(st.fields.toSeq.map { f =>
          val c = col(f.name)
          f.dataType match {
            // Excel numbers serialize as doubles ("1.0"); direct string->
            // long cast would null out, so go through decimal
            case ByteType | ShortType | IntegerType | LongType =>
              c.cast(DecimalType(38, 9)).cast(f.dataType).as(f.name)
            // complex cells carry JSON (reference ExcelReadStrategy
            // convert(): map/array parse via JsonUtils)
            case _: MapType | _: ArrayType | _: StructType =>
              from_json(c, f.dataType).as(f.name)
            case _ => c.cast(f.dataType).as(f.name)
          }
        } ++ partNames.map(col): _*)
    }
  }
}
