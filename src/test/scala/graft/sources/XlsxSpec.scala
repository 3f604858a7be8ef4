package graft.sources

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class XlsxSpec extends AnyFunSuite with SparkSuite {

  /** Build a minimal real .xlsx (zip of XML) — shared strings + one sheet
    * with shared-string, inline-number and gap cells.
    */
  private lazy val workbook: String = {
    val path = java.nio.file.Files.createTempFile("graft", ".xlsx").toString
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def entry(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(body.getBytes("UTF-8"))
      zos.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
        |<si><t>Year</t></si><si><t>GDP</t></si><si><t>Q1</t></si></sst>""".stripMargin)
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2"><v>1995</v></c><c r="C2"><v>8.1</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>2</v></c><c r="C3"><v>7.2</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    path
  }

  test("readSheet decodes shared strings, numbers, and column gaps") {
    val rows = Xlsx.readSheet(workbook)
    assert(rows.length == 3)
    assert(rows(0) == Seq("Year", "", "GDP"))
    assert(rows(1) == Seq("1995", "", "8.1"))
    assert(rows(2) == Seq("Q1", "", "7.2"))
  }

  test("readSheetDf lands in the readRawCsv shape (_c0.._cN + _idx)") {
    val df = Xlsx.readSheetDf(spark, workbook)
    assert(df.columns.toSeq == Seq("_c0", "_c1", "_c2", "_idx"))
    val got = df.orderBy("_idx").collect()
    assert(got(0).getString(0) == "Year")
    assert(got(1).getString(2) == "8.1")
    assert(got(2).getString(0) == "Q1")
    assert(got(0).isNullAt(1)) // gap cell -> null, like a missing CSV field
  }
}
