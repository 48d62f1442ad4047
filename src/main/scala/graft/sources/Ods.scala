package graft.sources

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** OpenDocument spreadsheet (.ods) reader — pure JDK, like [[Xlsx]]:
  * an .ods is a zip with `content.xml` holding `table:table` elements
  * (import_utils.py:371-421 reads these via pandas/odfpy; this parses
  * them directly). Supported: typed cells via `office:value-type` +
  * `office:value` / `date-value` / `time-value` / `boolean-value`,
  * `text:p` string content, `number-columns-repeated` /
  * `number-rows-repeated` expansion (with trailing-padding trim —
  * LibreOffice pads rows to 1024 columns), sheet selection by name.
  * Cells canonicalize to strings and flow through the shared
  * [[Xlsx.gridToDf]] inference, so csv/xlsx/ods parity holds.
  */
object Ods {

  private val factory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  private val maxRepeat = 16384 // cap padding expansion

  private def attr(r: javax.xml.stream.XMLStreamReader, local: String): Option[String] =
    (0 until r.getAttributeCount)
      .find(i => r.getAttributeLocalName(i) == local)
      .map(r.getAttributeValue)

  /** PT13H37M12S → "13:37:12" (office:time-value durations). */
  private def durationToTime(s: String): String = {
    val m = java.util.regex.Pattern
      .compile("PT(?:(\\d+)H)?(?:(\\d+)M)?(?:(\\d+(?:\\.\\d+)?)S)?").matcher(s)
    if (m.matches()) {
      def g(i: Int): Long = Option(m.group(i)).map(_.takeWhile(_ != '.').toLong).getOrElse(0L)
      f"${g(1)}%02d:${g(2)}%02d:${g(3)}%02d"
    } else s
  }

  private def canonical(valueType: String, r: javax.xml.stream.XMLStreamReader,
      textOf: () => String): String = valueType match {
    case "float" | "percentage" | "currency" =>
      attr(r, "value").map { v =>
        val d = v.toDouble
        if (d == math.rint(d) && math.abs(d) < 1e15 && !v.contains(".") &&
          !v.toLowerCase.contains("e")) v
        else if (d == math.rint(d) && math.abs(d) < 1e15) math.round(d).toString
        else d.toString
      }.getOrElse(textOf())
    case "boolean" => attr(r, "boolean-value").getOrElse(textOf())
    case "date" =>
      attr(r, "date-value").map { dv =>
        if (dv.contains("T")) {
          val norm = dv.replace("T", " ")
          if (norm.endsWith(" 00:00:00")) norm.dropRight(9) else norm
        } else dv
      }.getOrElse(textOf())
    case "time" => attr(r, "time-value").map(durationToTime).getOrElse(textOf())
    case _ => textOf() // string and friends
  }

  private def readGrid(zip: ZipFile, sheet: Option[String]): Seq[Array[String]] = {
    val entry = Option(zip.getEntry("content.xml"))
      .getOrElse(throw new IllegalArgumentException("no content.xml — not an .ods?"))
    gridFromStream(zip.getInputStream(entry), sheet)
  }

  /** The content-XML grid parser, shared by the zipped (.ods) and FLAT
    * (.fods — the whole file is one content XML document) containers.
    */
  private def gridFromStream(in: java.io.InputStream,
      sheet: Option[String]): Seq[Array[String]] = {
    val r = factory.createXMLStreamReader(in)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    try {
      var inTargetTable = false
      var seenTarget = false
      var tableDepth = 0
      var cells: scala.collection.mutable.ArrayBuffer[String] = null
      var rowRepeat = 1
      // cell capture state
      var cellRepeat = 1
      var cellType = ""
      var cellText: StringBuilder = null
      var cellValue: String = null
      var inText = false
      while (r.hasNext && !(seenTarget && !inTargetTable)) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "table" if !seenTarget =>
              val name = attr(r, "name")
              if (sheet.forall(name.contains(_)) || (sheet.isEmpty && !seenTarget)) {
                val matches = sheet match {
                  case Some(want) => name.contains(want)
                  case None       => true
                }
                if (matches) { inTargetTable = true; seenTarget = true }
              }
              tableDepth += 1
            case "table-row" if inTargetTable =>
              cells = scala.collection.mutable.ArrayBuffer.empty
              rowRepeat = attr(r, "number-rows-repeated").map(_.toInt).getOrElse(1)
            case "table-cell" if inTargetTable && cells != null =>
              cellRepeat = attr(r, "number-columns-repeated").map(_.toInt).getOrElse(1)
              cellType = attr(r, "value-type").getOrElse("")
              cellText = new StringBuilder
              cellValue = canonical(cellType, r, () => null)
            case "p" if cellText != null =>
              if (cellText.nonEmpty) cellText.append('\n')
              inText = true
            case _ =>
          }
          case XMLStreamConstants.CHARACTERS if inText && cellText != null =>
            cellText.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "p" => inText = false
            case "table-cell" if cells != null =>
              val v =
                if (cellValue != null) cellValue
                else if (cellText != null && cellText.nonEmpty) cellText.toString
                else null
              val n = math.min(cellRepeat, maxRepeat)
              var i = 0
              while (i < n) { cells += v; i += 1 }
              cellText = null; cellValue = null
            case "table-row" if cells != null =>
              // trim the trailing null padding LibreOffice adds
              var end = cells.length
              while (end > 0 && cells(end - 1) == null) end -= 1
              val arr = cells.take(end).toArray
              val n = math.min(rowRepeat, maxRepeat)
              var i = 0
              while (i < n) { rows += arr; i += 1 }
              cells = null
            case "table" =>
              if (inTargetTable) inTargetTable = false
              tableDepth -= 1
            case _ =>
          }
          case _ =>
        }
      }
    } finally { r.close(); in.close() }
    // trim trailing fully-empty rows (row padding)
    var end = rows.length
    while (end > 0 && rows(end - 1).isEmpty) end -= 1
    rows.take(end).toSeq
  }

  def readOds(
      spark: SparkSession,
      path: String,
      sheet: Option[String] = None,
      firstRowHasHeaders: Boolean = true,
      headerRowIndex: Int = 0,
      skipEmpty: String = "NONE",
      guessDatatypes: Boolean = true,
      start: Int = 0,
      limit: Int = Int.MaxValue,
      columns: Seq[String] = Nil): DataFrame = {
    val zip = new ZipFile(path)
    try {
      val grid = readGrid(zip, sheet)
      Xlsx.gridToDf(spark, grid, firstRowHasHeaders, headerRowIndex, skipEmpty, guessDatatypes,
        start, limit, columns)
    } finally zip.close()
  }

  /** Flat OpenDocument spreadsheet (.fods): the reference's readers
    * dict dispatches it to the same ods loader (import_utils.py:633-650)
    * — the file is the content XML itself, no zip container.
    */
  def readFods(
      spark: SparkSession,
      path: String,
      sheet: Option[String] = None,
      firstRowHasHeaders: Boolean = true,
      headerRowIndex: Int = 0,
      skipEmpty: String = "NONE",
      guessDatatypes: Boolean = true,
      start: Int = 0,
      limit: Int = Int.MaxValue,
      columns: Seq[String] = Nil): DataFrame = {
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
    val grid = try gridFromStream(in, sheet) finally in.close()
    Xlsx.gridToDf(spark, grid, firstRowHasHeaders, headerRowIndex, skipEmpty, guessDatatypes,
      start, limit, columns)
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Pure-JDK `.ods` writer (the reference's `excel_writer` emits ods via
    * pyexcel for the .ods suffix — export_utils.py:108-136): one sheet,
    * header row as strings, typed cells (float / boolean / date with the
    * proper `office:*-value` attributes). Driver-side with a row cap,
    * same posture as the xlsx writer.
    */
  def writeOds(df: DataFrame, path: String, sheetName: String = "Sheet1",
      maxRows: Int = 1000000): Unit = {
    val body = spreadsheetXml(df, sheetName, maxRows, "writeOds")
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8"?>""")
    sb.append("""<office:document-content""")
    sb.append(""" xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"""")
    sb.append(""" xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"""")
    sb.append(""" xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" office:version="1.2">""")
    sb.append(body)
    sb.append("""</office:document-content>""")
    writeOdsZip(path, sb.toString)
  }

  /** Flat `.fods` writer — the zipless sibling of [[writeOds]]: the
    * whole file is ONE content XML document (ODF 1.2 part 3 §2.1.4,
    * `office:document` root with an `office:mimetype` attribute), which
    * [[readFods]] streams straight through the shared grid parser.
    */
  def writeFods(df: DataFrame, path: String, sheetName: String = "Sheet1",
      maxRows: Int = 1000000): Unit = {
    val body = spreadsheetXml(df, sheetName, maxRows, "writeFods")
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8"?>""")
    sb.append("""<office:document""")
    sb.append(""" xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"""")
    sb.append(""" xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"""")
    sb.append(""" xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"""")
    sb.append(""" office:version="1.2"""")
    sb.append(""" office:mimetype="application/vnd.oasis.opendocument.spreadsheet">""")
    sb.append(body)
    sb.append("""</office:document>""")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  /** `<office:body>…</office:body>` spreadsheet fragment shared by the
    * zipped and flat writers.
    */
  private def spreadsheetXml(
      df: DataFrame, sheetName: String, maxRows: Int, opName: String): String = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows, s"$opName is a driver-side op capped at $maxRows rows")
    val cols = df.columns
    val sb = new StringBuilder
    sb.append("""<office:body><office:spreadsheet>""")
    sb.append(s"""<table:table table:name="${xmlEscape(sheetName)}">""")
    def stringCell(v: String): String =
      s"""<table:table-cell office:value-type="string"><text:p>${xmlEscape(v)}</text:p></table:table-cell>"""
    sb.append("<table:table-row>")
    cols.foreach(c => sb.append(stringCell(c)))
    sb.append("</table:table-row>")
    rows.foreach { row =>
      sb.append("<table:table-row>")
      cols.indices.foreach { i =>
        if (row.isNullAt(i)) sb.append("<table:table-cell/>")
        else row.get(i) match {
          case b: Boolean =>
            sb.append(s"""<table:table-cell office:value-type="boolean" office:boolean-value="$b"><text:p>$b</text:p></table:table-cell>""")
          case n: java.lang.Number =>
            val d = n.doubleValue()
            if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
              // office:value cannot carry NaN/Infinity — write as string
              // rather than emit an attribute strict consumers reject
              sb.append(stringCell(n.toString))
            else {
              // decimal notation, not scientific: "1.0E22" is not a
              // valid office:value for every validator
              val s = n match {
                case bd: java.math.BigDecimal => bd.toPlainString
                // toString keeps the shortest decimal repr for the value's
                // OWN width (Float 0.1f stays "0.1" — widening to double
                // first would print 0.10000000149011612); toPlainString
                // expands 1.0E22 to digits
                case _ => new java.math.BigDecimal(n.toString).toPlainString
              }
              sb.append(s"""<table:table-cell office:value-type="float" office:value="$s"><text:p>$s</text:p></table:table-cell>""")
            }
          case d: java.sql.Date =>
            sb.append(s"""<table:table-cell office:value-type="date" office:date-value="$d"><text:p>$d</text:p></table:table-cell>""")
          case t: java.sql.Timestamp =>
            val iso = t.toLocalDateTime.toLocalDate.toString + "T" +
              t.toLocalDateTime.toLocalTime.toString
            sb.append(s"""<table:table-cell office:value-type="date" office:date-value="$iso"><text:p>$iso</text:p></table:table-cell>""")
          case other => sb.append(stringCell(other.toString))
        }
      }
      sb.append("</table:table-row>")
    }
    sb.append("""</table:table></office:spreadsheet></office:body>""")
    sb.toString
  }

  /** ODF zip container around a full content.xml document. */
  private def writeOdsZip(path: String, contentXml: String): Unit = {
    val zip = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    try {
      // mimetype must be the FIRST entry and STORED (uncompressed) per the
      // ODF package spec, so sniffers can read it at a fixed offset
      val mime = "application/vnd.oasis.opendocument.spreadsheet"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val me = new java.util.zip.ZipEntry("mimetype")
      me.setMethod(java.util.zip.ZipOutputStream.STORED)
      me.setSize(mime.length)
      val crc = new java.util.zip.CRC32
      crc.update(mime)
      me.setCrc(crc.getValue)
      zip.putNextEntry(me)
      zip.write(mime)
      zip.closeEntry()
      def put(name: String, content: String): Unit = {
        zip.putNextEntry(new java.util.zip.ZipEntry(name))
        zip.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        zip.closeEntry()
      }
      put("META-INF/manifest.xml",
        """<?xml version="1.0" encoding="UTF-8"?>""" +
          """<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0" manifest:version="1.2">""" +
          """<manifest:file-entry manifest:full-path="/" manifest:media-type="application/vnd.oasis.opendocument.spreadsheet"/>""" +
          """<manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>""" +
          """</manifest:manifest>""")
      put("content.xml", contentXml)
    } finally zip.close()
  }
}
