package graft.sources

import java.time.LocalDate
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal pure-JDK xlsx reader (import_utils.py:180-368 semantics; the
  * container has no POI, but .xlsx is just a zip of XML — ZipFile +
  * StAX suffice). Driver-side by design, exactly like the reference's
  * openpyxl row iteration: spreadsheets are small-data inputs; the
  * result becomes a distributed DataFrame afterwards.
  *
  * Supported: shared + inline strings, booleans, numbers, Excel serial
  * DATES/DATETIMES (cell style → numFmt, builtin date ids 14-22/45-47
  * and custom formats with y/m/d/h/s tokens; serial epoch 1899-12-30),
  * sheet selection by name, header_row_index, skip_empty. Cells
  * stringify canonically and flow through the SAME rank-based
  * `TypeInference` pass as the CSV reader, so an xlsx and its csv
  * export infer identical schemas (book1.csv/xlsx parity,
  * FIXTURES.md §1).
  */
object Xlsx {

  private val factory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  private def entryBytes(zip: ZipFile, name: String): Option[Array[Byte]] =
    Option(zip.getEntry(name)).map { e =>
      val in = zip.getInputStream(e)
      try in.readAllBytes() finally in.close()
    }

  private def parse(bytes: Array[Byte]) =
    factory.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))

  /** sheet name → worksheet entry path, in workbook order. */
  private def sheetTargets(zip: ZipFile): Seq[(String, String)] = {
    val rels = scala.collection.mutable.Map.empty[String, String]
    entryBytes(zip, "xl/_rels/workbook.xml.rels").foreach { b =>
      val r = parse(b)
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship") {
          val id = r.getAttributeValue(null, "Id")
          val target = r.getAttributeValue(null, "Target")
          if (id != null && target != null)
            rels(id) = if (target.startsWith("/")) target.drop(1) else "xl/" + target
        }
      }
      r.close()
    }
    val sheets = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    entryBytes(zip, "xl/workbook.xml").foreach { b =>
      val r = parse(b)
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          val name = r.getAttributeValue(null, "name")
          val rid = (0 until r.getAttributeCount)
            .find(i => r.getAttributeLocalName(i) == "id").map(r.getAttributeValue)
          rid.flatMap(rels.get).foreach(t => sheets += (name -> t))
        }
      }
      r.close()
    }
    sheets.toSeq
  }

  private def sharedStrings(zip: ZipFile): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    entryBytes(zip, "xl/sharedStrings.xml").foreach { b =>
      val r = parse(b)
      var cur: StringBuilder = null
      var inT = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            if (r.getLocalName == "si") cur = new StringBuilder
            else if (r.getLocalName == "t") inT = true
          case XMLStreamConstants.CHARACTERS if inT && cur != null =>
            cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            if (r.getLocalName == "t") inT = false
            else if (r.getLocalName == "si" && cur != null) { out += cur.toString; cur = null }
          case _ =>
        }
      }
      r.close()
    }
    out.toIndexedSeq
  }

  private[sources] val builtinDateOnly = Set(14, 15, 16, 17)
  private[sources] val builtinDateTime = Set(18, 19, 20, 21, 22, 45, 46, 47)

  /** style index → 0 (not temporal) / 1 (date-only) / 2 (datetime) via
    * cellXfs numFmtId resolution; custom formats classified by tokens
    * (time tokens h/s ⇒ datetime).
    */
  private def dateStyles(zip: ZipFile): IndexedSeq[Int] = {
    val customKind = scala.collection.mutable.Map.empty[Int, Int]
    val xfs = scala.collection.mutable.ArrayBuffer.empty[Int]
    entryBytes(zip, "xl/styles.xml").foreach { b =>
      val r = parse(b)
      var inCellXfs = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "numFmt" =>
              val id = Option(r.getAttributeValue(null, "numFmtId")).map(_.toInt)
              val code = Option(r.getAttributeValue(null, "formatCode")).getOrElse("")
              // strip quoted literals and color tags before token sniffing
              val bare = code.replaceAll("\"[^\"]*\"", "").replaceAll("\\[[^\\]]*\\]", "")
              val hasDate = bare.exists(c => "ymd".contains(c.toLower))
              val hasTime = bare.exists(c => "hs".contains(c.toLower))
              id.foreach { i =>
                if (hasTime) customKind(i) = 2
                else if (hasDate) customKind(i) = 1
              }
            case "cellXfs" => inCellXfs = true
            case "xf" if inCellXfs =>
              xfs += Option(r.getAttributeValue(null, "numFmtId")).map(_.toInt).getOrElse(0)
            case _ =>
          }
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
            inCellXfs = false
          case _ =>
        }
      }
      r.close()
    }
    xfs.map { id =>
      if (builtinDateOnly(id)) 1
      else if (builtinDateTime(id)) 2
      else customKind.getOrElse(id, 0)
    }.toIndexedSeq
  }

  private def colIndex(ref: String): Int = {
    var i = 0
    var n = 0
    while (i < ref.length && ref.charAt(i).isLetter) { n = n * 26 + (ref.charAt(i) - 'A' + 1); i += 1 }
    n - 1
  }

  /** Excel serial → canonical ISO string; `kind` 1 = date-only style,
    * 2 = datetime style (midnight still renders "00:00:00" so a
    * datetime-styled column stays uniformly timestamp-typed). Serial
    * epoch 1899-12-30 (the 1900-leap-bug-adjusted base every modern
    * reader uses).
    */
  private[sources] def serialToIso(serial: Double, kind: Int): String = {
    val days = math.floor(serial).toLong
    val frac = serial - days
    val date = LocalDate.of(1899, 12, 30).plusDays(days)
    val totalSec = math.round(frac * 86400.0)
    if (kind == 1 && totalSec == 0L) date.toString
    else {
      val h = totalSec / 3600; val m = (totalSec % 3600) / 60; val s = totalSec % 60
      f"$date $h%02d:$m%02d:$s%02d"
    }
  }

  private[sources] def numToString(s: String): String = {
    if (!s.toLowerCase.contains("e") && !s.contains("."))
      s // integral literal is exact AS TEXT at any magnitude (a >2^53
        // digit string canonicalized through double would lose digits)
    else {
      val d = s.toDouble
      if (d == math.rint(d) && math.abs(d) < 1e15) math.round(d).toString
      else d.toString
    }
  }

  /** Read one sheet as rows of Option[String] cells (canonical string
    * forms; None = empty cell).
    */
  private def sheetRows(zip: ZipFile, target: String, shared: IndexedSeq[String],
      isDateStyle: IndexedSeq[Int]): Seq[Array[String]] = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    entryBytes(zip, target).foreach { b =>
      val r = parse(b)
      var cells: scala.collection.mutable.ArrayBuffer[(Int, String)] = null
      var cellCol = -1
      var cellType = ""
      var cellStyle = -1
      var inV = false
      var inIs = false
      val text = new StringBuilder
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" => cells = scala.collection.mutable.ArrayBuffer.empty
            case "c" =>
              cellCol = Option(r.getAttributeValue(null, "r")).map(colIndex)
                .getOrElse(if (cells.isEmpty) 0 else cells.last._1 + 1)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              cellStyle = Option(r.getAttributeValue(null, "s")).map(_.toInt).getOrElse(-1)
            case "v" => inV = true; text.clear()
            case "is" => inIs = true
            case "t" if inIs => inV = true; text.clear()
            case _ =>
          }
          case XMLStreamConstants.CHARACTERS if inV => text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "v" | "t" if inV =>
              inV = false
              val raw = text.toString
              val value = cellType match {
                case "s"   => shared(raw.toInt)
                case "b"   => if (raw == "1") "true" else "false"
                case "e"   => null
                case "str" => raw
                case _ if inIs => raw
                case _ => // number; maybe a date by style
                  if (cellStyle >= 0 && cellStyle < isDateStyle.length &&
                      isDateStyle(cellStyle) > 0)
                    serialToIso(raw.toDouble, isDateStyle(cellStyle))
                  else numToString(raw)
              }
              if (value != null && cells != null) cells += (cellCol -> value)
            case "is" => inIs = false
            case "row" =>
              val width = if (cells.isEmpty) 0 else cells.map(_._1).max + 1
              val arr = new Array[String](width)
              cells.foreach { case (i, v) => arr(i) = v }
              rows += arr
              cells = null
            case _ =>
          }
          case _ =>
        }
      }
      r.close()
    }
    rows.toSeq
  }

  /** The reader. Mirrors `readCsv`'s option semantics where they apply. */
  def readXlsx(
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
      val sheets = sheetTargets(zip)
      require(sheets.nonEmpty, s"no sheets in $path")
      val target = sheet match {
        case Some(name) => sheets.find(_._1 == name)
          .getOrElse(throw new IllegalArgumentException(
            s"sheet '$name' not found; have ${sheets.map(_._1).mkString(", ")}"))._2
        case None => sheets.head._2
      }
      val all = sheetRows(zip, target, sharedStrings(zip), dateStyles(zip))
      gridToDf(spark, all, firstRowHasHeaders, headerRowIndex, skipEmpty, guessDatatypes,
        start, limit, columns)
    } finally zip.close()
  }

  /** Shared grid-of-strings → typed DataFrame plumbing (header row,
    * padding, skip_empty, rank-based inference) — used by the xlsx and
    * ods readers so every spreadsheet format infers like the CSV path.
    * `start`/`limit` window the DATA rows (post-header, pre-skip_empty —
    * the reference's excel_reader start/limit, import_utils.py:180-368);
    * `columns` subsets by resolved header name, reference order.
    */
  private[sources] def gridToDf(
      spark: SparkSession,
      rows: Seq[Array[String]],
      firstRowHasHeaders: Boolean,
      headerRowIndex: Int,
      skipEmpty: String,
      guessDatatypes: Boolean,
      start: Int = 0,
      limit: Int = Int.MaxValue,
      columns: Seq[String] = Nil): DataFrame = {
    val all = rows.drop(headerRowIndex)
    // width = the table's full extent, not the header row's (an empty
    // header row still yields the data's columns — reference behavior,
    // test_filereader_formats.py:793-813); empty/duplicate header cells
    // uniquify as "", "_1", "_2" ... (utils.py unique_name)
    val width = all.map(_.length).maxOption.getOrElse(0)
    val (headers, data) =
      if (firstRowHasHeaders && all.nonEmpty) {
        var taken = Set.empty[String]
        val h = (0 until width).map { i =>
          val raw = if (i < all.head.length) Option(all.head(i)).getOrElse("") else ""
          val n = graft.operators.Joins.uniqueName(raw, taken)
          taken += n
          n
        }
        (h, all.tail)
      } else ((0 until width).map(i => s"_$i"), all)
    val keepIdx: Seq[Int] =
      if (columns.isEmpty) 0 until width
      else columns.map { c =>
        val i = headers.indexOf(c)
        require(i >= 0, s"columns: '$c' not in headers ${headers.mkString(", ")}")
        i
      }
    val outHeaders = keepIdx.map(headers)
    val windowed = data.slice(start,
      if (limit >= Int.MaxValue - start) Int.MaxValue else start + limit)
    val padded = windowed.map { r =>
      Row.fromSeq(keepIdx.map(i => if (i < r.length) r(i) else null))
    }
    val w = keepIdx.length
    val filtered = skipEmpty.toUpperCase match {
      case "ANY" => padded.filter(row => (0 until w).forall(i => row.get(i) != null))
      case "ALL" => padded.filter(row => (0 until w).exists(i => row.get(i) != null))
      case _     => padded
    }
    val schema = StructType(outHeaders.map(h => StructField(h, StringType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(filtered.toSeq, math.max(1, filtered.length / 10000 + 1)),
      schema)
    if (guessDatatypes) graft.functions.TypeInference.applyBestTypes(df) else df
  }

  /** Sheet names, workbook order. */
  def sheetNames(path: String): Seq[String] = {
    val zip = new ZipFile(path)
    try sheetTargets(zip).map(_._1) finally zip.close()
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** Pure-JDK xlsx writer (export_utils.py:108-136 semantics): one
    * sheet, header row, inline strings, numeric/bool cells typed,
    * date/timestamp as serials with date/datetime styles. Driver-side
    * with a row cap, same as the reference (which stringifies >2^32−1
    * ints — we keep longs numeric; Excel shows 15 significant digits).
    */
  def writeXlsx(df: DataFrame, path: String, sheetName: String = "Sheet1",
      maxRows: Int = 1000000): Unit = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows, s"writeXlsx is a driver-side op capped at $maxRows rows")
    val cols = df.columns
    val epoch = LocalDate.of(1899, 12, 30)
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    sb.append("<row r=\"1\">")
    cols.zipWithIndex.foreach { case (c, i) =>
      sb.append(s"""<c r="${colRef(i)}1" t="inlineStr"><is><t>${xmlEscape(c)}</t></is></c>""")
    }
    sb.append("</row>")
    rows.zipWithIndex.foreach { case (row, ri) =>
      val rn = ri + 2
      sb.append(s"""<row r="$rn">""")
      cols.indices.foreach { i =>
        if (!row.isNullAt(i)) {
          val ref = s"${colRef(i)}$rn"
          row.get(i) match {
            case b: Boolean =>
              sb.append(s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>""")
            case n: java.lang.Number =>
              sb.append(s"""<c r="$ref"><v>$n</v></c>""")
            case d: java.sql.Date =>
              val serial = java.time.temporal.ChronoUnit.DAYS.between(epoch, d.toLocalDate)
              sb.append(s"""<c r="$ref" s="1"><v>$serial</v></c>""")
            case t: java.sql.Timestamp =>
              val ldt = t.toLocalDateTime
              val serial = java.time.temporal.ChronoUnit.DAYS.between(epoch, ldt.toLocalDate) +
                ldt.toLocalTime.toSecondOfDay / 86400.0
              sb.append(s"""<c r="$ref" s="2"><v>$serial</v></c>""")
            case other =>
              sb.append(s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(other.toString)}</t></is></c>""")
          }
        }
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")

    val zip = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    def put(name: String, content: String): Unit = {
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    try {
      put("[Content_Types].xml",
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
          """</Types>""")
      put("_rels/.rels",
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
      put("xl/workbook.xml",
        s"""<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>""")
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
      put("xl/styles.xml",
        """<?xml version="1.0"?><styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
          """<cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/><xf numFmtId="22" applyNumberFormat="1"/></cellXfs></styleSheet>""")
      put("xl/worksheets/sheet1.xml", sb.toString)
    } finally zip.close()
  }
}
