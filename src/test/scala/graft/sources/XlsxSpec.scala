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

  /** The GDP mini fixture re-encoded as a real workbook (inline strings). */
  private lazy val gdpWorkbook: String = {
    val lines = scala.io.Source.fromFile(fixture("gdp_raw_mini.csv")).getLines().toSeq
    val rowsXml = lines.zipWithIndex.map { case (line, i) =>
      val cells = line.split(",", -1).zipWithIndex.collect {
        case (v, j) if v.nonEmpty =>
          val ref = ('A' + j).toChar.toString + (i + 1)
          s"""<c r="$ref" t="inlineStr"><is><t>$v</t></is></c>"""
      }.mkString
      s"""<row r="${i + 1}">$cells</row>"""
    }.mkString
    val path = java.nio.file.Files.createTempFile("graft_gdp", ".xlsx").toString
    val zos = new ZipOutputStream(new FileOutputStream(path))
    zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    zos.write(
      (s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$rowsXml</sheetData></worksheet>""")
        .getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    path
  }

  test("gdpTransform over the XLSX path reproduces the CSV-path goldens (B3 via S2)") {
    import graft.pipeline.Npl
    import spark.implicits._
    val fromXlsx = Npl.gdpTransformXlsx(spark, gdpWorkbook)
      .orderBy("Quarter").as[(String, Double)].collect()
    val fromCsv = Npl.gdpTransform(spark, fixture("gdp_raw_mini.csv"))
      .orderBy("Quarter").as[(String, Double)].collect()
    assert(fromXlsx.toSeq == fromCsv.toSeq)
    assert(math.abs(fromXlsx.toMap.apply("1995-Q1") - 0.072) < 1e-9)
  }

  /** Legal-but-hostile sheet: empty shared-string cell (`<c t="s"/>`),
    * out-of-order refs, and a duplicate ref (ADVICE r1).
    */
  private lazy val hostileWorkbook: String = {
    val path = java.nio.file.Files.createTempFile("graft_hostile", ".xlsx").toString
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def entry(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><si><t>hello</t></si></sst>""")
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"/><c r="B1" t="s"><v>0</v></c></row>
        |<row r="2"><c r="C2"><v>3</v></c><c r="A2"><v>1</v></c></row>
        |<row r="3"><c r="A3"><v>old</v></c><c r="A3"><v>new</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    path
  }

  test("hostile cells: empty shared-string ref, out-of-order refs, duplicate refs") {
    val rows = Xlsx.readSheet(hostileWorkbook)
    assert(rows(0) == Seq("", "hello"))         // <c t="s"/> with no <v> -> ""
    assert(rows(1) == Seq("1", "", "3"))        // C2 then A2: placed, not appended
    assert(rows(2) == Seq("new"))               // duplicate A3: last write wins
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

  test("writeSheet round-trips through readSheet, including XML-hostile text") {
    val path = java.nio.file.Files.createTempDirectory("graft_xlsx_w")
      .resolve("out.xlsx").toString
    val data = Seq(
      Seq("id", "name"),
      Seq("1", "a & b <c> \"d\""),
      Seq("2", "plain"))
    Xlsx.writeSheet(path, data)
    assert(Xlsx.readSheet(path) == data)
  }
}
