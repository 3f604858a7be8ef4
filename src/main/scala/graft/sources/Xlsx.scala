package graft.sources

import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal XLSX sheet reader (SURVEY.md §2.1 S2: the reference reads the
  * NESDC GDP workbook via `pd.read_excel(path, sheet_name=...)`,
  * src/ETL-NPL-Pipeline.py:48-54,513). Zero-egress environment ⇒ no
  * spark-excel dependency; XLSX is a zip of XML, so the JDK's ZipFile +
  * StAX suffice for the string/number grid the pipeline needs (no styles,
  * dates-as-serials, formulas evaluated to cached values).
  *
  * Driver-side by design: workbook ingestion is the same class of
  * ingest-sized positional input as the hostile CSV headers (§7.4.1-2) —
  * the output lands in a DataFrame with an explicit `_idx` ordinal so the
  * positional transforms (header promotion, fill-down) run in-engine.
  */
object Xlsx {

  private val factory = XMLInputFactory.newInstance()
  factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
  factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)

  /** All cell texts of one sheet as dense rows (empty string for gaps). */
  def readSheet(path: String, sheet: String = "sheet1"): Seq[Seq[String]] = {
    val zip = new ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e)))
        .getOrElse(IndexedSeq.empty)
      val entry = Option(zip.getEntry(s"xl/worksheets/$sheet.xml"))
        .getOrElse(throw new IllegalArgumentException(s"no worksheet $sheet in $path"))
      parseSheet(zip.getInputStream(entry), shared)
    } finally zip.close()
  }

  /** Sheet -> DataFrame of strings `_c0.._cN` + `_idx` row ordinal, the
    * same shape Normalize.readRawCsv produces — so XLSX and hostile CSV
    * share every downstream transform.
    */
  def readSheetDf(s: SparkSession, path: String, sheet: String = "sheet1"): DataFrame = {
    val rows = readSheet(path, sheet)
    val nCols = if (rows.isEmpty) 0 else rows.map(_.length).max
    val schema = StructType(
      (0 until nCols).map(i => StructField(s"_c$i", StringType)) :+
        StructField("_idx", org.apache.spark.sql.types.LongType, nullable = false))
    val data = rows.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.padTo(nCols, "").map(v => if (v.isEmpty) null else v) :+ i.toLong)
    }
    s.createDataFrame(new java.util.ArrayList[Row](scala.jdk.CollectionConverters
      .SeqHasAsJava(data).asJava), schema)
  }

  /** 0-based column index -> "A", "B", ..., "AA". */
  private def colRef(idx: Int): String = {
    var i = idx
    var s = ""
    while (i >= 0) { s = ('A' + i % 26).toChar.toString + s; i = i / 26 - 1 }
    s
  }

  /** Minimal XLSX writer (inline-string cells): enough of the OPC package
    * that [[readSheet]] — and any standards-compliant reader — can open
    * it. Same zero-dependency rationale as the reader; used to round-trip
    * engine output through the workbook format (q_scan_xlsx).
    */
  def writeSheet(path: String, rows: Seq[Seq[String]], sheet: String = "sheet1"): Unit = {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    def esc(v: String): String =
      v.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val sheetXml = {
      val sb = new StringBuilder
      sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
      sb ++= "<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>"
      rows.zipWithIndex.foreach { case (r, i) =>
        sb ++= s"""<row r="${i + 1}">"""
        r.zipWithIndex.foreach { case (v, j) =>
          sb ++= s"""<c r="${colRef(j)}${i + 1}" t="inlineStr"><is><t>${esc(v)}</t></is></c>"""
        }
        sb ++= "</row>"
      }
      sb ++= "</sheetData></worksheet>"
      sb.toString
    }
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    try {
      put("[Content_Types].xml",
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
          "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">" +
          "<Default Extension=\"rels\" ContentType=\"application/vnd.openxmlformats-package.relationships+xml\"/>" +
          "<Default Extension=\"xml\" ContentType=\"application/xml\"/>" +
          "<Override PartName=\"/xl/workbook.xml\" ContentType=\"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml\"/>" +
          s"<Override PartName=\"/xl/worksheets/$sheet.xml\" ContentType=\"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml\"/>" +
          "</Types>")
      put("_rels/.rels",
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
          "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
          "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument\" Target=\"xl/workbook.xml\"/>" +
          "</Relationships>")
      put("xl/workbook.xml",
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
          "<workbook xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\" " +
          "xmlns:r=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships\">" +
          s"<sheets><sheet name=\"$sheet\" sheetId=\"1\" r:id=\"rId1\"/></sheets></workbook>")
      put("xl/_rels/workbook.xml.rels",
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
          "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
          "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet\" " +
          s"Target=\"worksheets/$sheet.xml\"/>" +
          "</Relationships>")
      put(s"xl/worksheets/$sheet.xml", sheetXml)
    } finally zos.close()
  }

  private def parseSharedStrings(in: InputStream): IndexedSeq[String] = {
    val out = ArrayBuffer.empty[String]
    val r = factory.createXMLStreamReader(in)
    var cur: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur = new StringBuilder
            case "t" => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT && cur != null =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => out += cur.toString; cur = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.toIndexedSeq
  }

  /** "C3" -> 2 (0-based column index). */
  private def colIndex(cellRef: String): Int =
    cellRef.takeWhile(_.isLetter).foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1

  private def parseSheet(in: InputStream, shared: IndexedSeq[String]): Seq[Seq[String]] = {
    val rows = ArrayBuffer.empty[Seq[String]]
    val r = factory.createXMLStreamReader(in)
    var row: ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var inV = false
    var value = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = ArrayBuffer.empty[String]
            case "c" =>
              // A malformed/duplicate ref must not land at a negative or
              // stale index — fall back to "next free column".
              cellCol = Option(r.getAttributeValue(null, "r")).map(colIndex)
                .filter(_ >= 0).getOrElse(row.length)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
            case "v" | "t" => inV = true; value = new StringBuilder
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV => value.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" => inV = false
            case "c" =>
              // Legal-but-hostile cells: `<c t="s"/>` with no <v> has an
              // empty shared-string index (toIntOption, not toInt), and an
              // out-of-order or duplicate r= ref must be PLACED at its
              // column, not appended past it (last write wins).
              val text = cellType match {
                case "s" =>
                  value.toString.trim.toIntOption.flatMap(shared.lift).getOrElse("")
                case _ => value.toString
              }
              while (row.length <= cellCol) row += ""
              row(cellCol) = text
              value = new StringBuilder
            case "row" => rows += row.toSeq; row = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.toSeq
  }
}
