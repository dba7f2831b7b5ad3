package graft.formats

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** BIFF8 .xls reader against the reference e2e's golden fixtures: the
  * corpus stages e2e.xls and e2e.xlsx with the same table, so the
  * OOXML parser (independently spec'd) serves as the oracle for the
  * OLE2/BIFF path.
  */
class BiffFormatSpec extends SparkSpec {

  private val res = "/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/" +
    "connector-file-local-e2e/src/test/resources/excel/"

  private def bytes(p: String): Array[Byte] = Files.readAllBytes(Paths.get(p))

  test("reference golden e2e.xls parses; shape and strings match the e2e.xlsx twin") {
    val xls = BiffFormat.parseXls(bytes(res + "e2e.xls"))
    val xlsx = ExcelFormat.parseXlsx(bytes(res + "e2e.xlsx"))
    assert(xls.nonEmpty, "no rows out of the BIFF parse")
    assert(xls.length == xlsx.length, s"row count ${xls.length} vs xlsx ${xlsx.length}")
    assert(xls.head.length == xlsx.head.length,
      s"column count ${xls.head.length} vs xlsx ${xlsx.head.length}")
    // header row is all shared strings — must match exactly
    assert(xls.head.map(Option(_).getOrElse("")) ==
      xlsx.head.map(Option(_).getOrElse("")))
    // every SST-backed cell in the body agrees wherever the xlsx cell is
    // non-numeric (number formatting differs: BIFF yields raw doubles)
    xls.tail.zip(xlsx.tail).zipWithIndex.foreach { case ((a, b), r) =>
      a.zip(b).zipWithIndex.foreach { case ((va, vb), c) =>
        if (vb != null && vb.nonEmpty && vb.exists(ch => ch.isLetter && ch != 'E')
            && !Set("TRUE", "FALSE", "true", "false").contains(vb))
          assert(va == vb, s"cell ($r,$c): biff=$va xlsx=$vb")
      }
    }
    // numeric cells arrive as parseable doubles
    val headerIdx = xls.head.zipWithIndex.toMap
    val dblCol = headerIdx.collectFirst { case (h, i) if h != null && h.contains("double") => i }
    dblCol.foreach { i =>
      xls.tail.foreach(row => assert(row(i) == null || row(i).toDouble.isFinite))
    }
  }

  test("booleans decode from BOOLERR records") {
    val xls = BiffFormat.parseXls(bytes(res + "e2e.xls"))
    val boolIdx = xls.head.indexWhere(h => h != null && h.contains("boolean"))
    if (boolIdx >= 0)
      xls.tail.foreach(row =>
        assert(row(boolIdx) == null || Set("true", "false").contains(row(boolIdx)),
          s"boolean cell: ${row(boolIdx)}"))
  }

  test("garbage input is rejected, not misparsed") {
    intercept[IllegalArgumentException] {
      BiffFormat.parseXls("not an ole2 file at all, clearly".getBytes)
    }
  }
}
