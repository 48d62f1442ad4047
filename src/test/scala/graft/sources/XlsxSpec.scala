package graft.sources

import graft.SparkSpec
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

class XlsxSpec extends SparkSpec {
  import spark.implicits._

  /** Build a minimal real xlsx (zip of XML parts) — no libraries, which
    * is exactly why the reader can exist in this container at all.
    */
  private def writeXlsx(): String = {
    val f = Files.createTempFile("graft", ".xlsx")
    val zip = new ZipOutputStream(Files.newOutputStream(f))
    def put(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    put("xl/workbook.xml",
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="orders" sheetId="1" r:id="rId1"/>
        |<sheet name="extra" sheetId="2" r:id="rId2"/></sheets></workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="t" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?>
        |<sst count="7" uniqueCount="7"><si><t>name</t></si><si><t>qty</t></si>
        |<si><t>flag</t></si><si><t>when</t></si><si><t>widget</t></si>
        |<si><t>gad</t><t>get</t></si><si><t>day</t></si></sst>""".stripMargin) // rich-text runs concat
    put("xl/styles.xml",
      """<?xml version="1.0"?>
        |<styleSheet><numFmts count="1">
        |<numFmt numFmtId="164" formatCode="yyyy\-mm\-dd hh:mm"/></numFmts>
        |<cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="14"/>
        |<xf numFmtId="164"/></cellXfs></styleSheet>""".stripMargin)
    // serial 45292 = 2024-01-01; 45292.5 = noon; style 1 = date-only
    // (numFmtId 14), style 2 = datetime (custom 164 with hh:mm)
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?>
        |<worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>
        |  <c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c>
        |  <c r="E1" t="s"><v>6</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>4</v></c><c r="B2"><v>5</v></c>
        |  <c r="C2" t="b"><v>1</v></c><c r="D2" s="2"><v>45292</v></c>
        |  <c r="E2" s="1"><v>45292</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>5</v></c><c r="B3"><v>2.5</v></c>
        |  <c r="C3" t="b"><v>0</v></c><c r="D3" s="2"><v>45292.5</v></c>
        |  <c r="E3" s="1"><v>45293</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    put("xl/worksheets/sheet2.xml",
      """<?xml version="1.0"?>
        |<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>k</t></is></c></row>
        |<row r="2"><c r="A2" t="inlineStr"><is><t>inline-value</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zip.close()
    f.toString
  }

  test("xlsx: shared/rich/inline strings, bools, serial dates, typed inference") {
    val p = writeXlsx()
    assert(Xlsx.sheetNames(p) === Seq("orders", "extra"))
    val df = Xlsx.readXlsx(spark, p)
    assert(df.columns.toSeq === Seq("name", "qty", "flag", "when", "day"))
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("qty") === "double")    // 5 and 2.5 → double
    assert(types("flag") === "boolean")
    assert(types("when") === "timestamp") // datetime-styled serials
    assert(types("day") === "date")       // date-only-styled serials
    val rows = df.orderBy("name").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("gadget", "widget")) // rich-text concat
    assert(rows.map(_.getDouble(1)).toSeq === Seq(2.5, 5.0))
    assert(rows.map(_.getBoolean(2)).toSeq === Seq(false, true))
    assert(rows.map(_.getTimestamp(3).toString).toSeq ===
      Seq("2024-01-01 12:00:00.0", "2024-01-01 00:00:00.0"))
    assert(rows.map(_.getDate(4).toString).toSeq === Seq("2024-01-02", "2024-01-01"))
    // sheet selection + inline strings
    val extra = Xlsx.readXlsx(spark, p, sheet = Some("extra"), guessDatatypes = false)
    assert(extra.columns.toSeq === Seq("k"))
    assert(extra.as[String].collect() === Array("inline-value"))
  }

  test("real Excel-produced file parses with the documented shape (book1.xlsx)") {
    // FIXTURES.md §1: a:int, b..f:float, 6 cols, 45 rows. Real files
    // carry namespaces/attrs the generated fixture lacks — this guards
    // the parser against them. Skipped when the fixture isn't present.
    val p = "/root/reference/tests/data/book1.xlsx"
    assume(new java.io.File(p).exists())
    val df = Xlsx.readXlsx(spark, p)
    assert(df.count() === 45)
    assert(df.columns.length === 6)
    val types = df.schema.fields.map(_.dataType.simpleString)
    assert(types.head === "bigint", types.mkString(","))
    assert(types.tail.forall(t => t == "double" || t == "bigint"), types.mkString(","))
    // csv/xlsx parity: same file in csv form infers the same shape
    val csv = "/root/reference/tests/data/book1.csv"
    assume(new java.io.File(csv).exists())
    val viaCsv = Readers.readCsv(spark, csv)
    assert(viaCsv.count() === df.count())
    assert(viaCsv.columns.toSeq === df.columns.toSeq)
  }

  test("real fixture sweep: excel_dates / gdocs1 / simple header offset") {
    val base = "/root/reference/tests/data"
    assume(new java.io.File(s"$base/excel_dates.xlsx").exists())
    // serial-date decoding against a real Excel file: 42674 = 2016-10-31
    val dates = Xlsx.readXlsx(spark, s"$base/excel_dates.xlsx")
    val types = dates.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("Date") === "date")
    assert(dates.select("Date").collect().map(_.getDate(0).toString).sorted ===
      Array("1920-01-01", "2016-10-31"))
    // Google-Docs-produced file: 45x6 numeric grid
    val gdocs = Xlsx.readXlsx(spark, s"$base/gdocs1.xlsx")
    assert(gdocs.count() === 45 && gdocs.columns.toSeq === Seq("a", "b", "c", "d", "e", "f"))
    assert(gdocs.schema.fields.forall(_.dataType.simpleString == "bigint"))
    // header_row_index skips the junk row, like the csv path
    val simple = Xlsx.readXlsx(spark, s"$base/simple.xlsx", headerRowIndex = 1)
    assert(simple.columns.toSeq === Seq("header"))
    assert(simple.count() === 5)
  }

  test("xlsx write/read roundtrip preserves types and values") {
    val out = Files.createTempFile("graftout", ".xlsx").toString
    val src = Seq(
      ("widget", 5L, 2.5, true, java.sql.Date.valueOf("2024-01-01"),
        java.sql.Timestamp.valueOf("2024-01-01 12:30:00")),
      ("<&gadget>", 7L, 0.25, false, java.sql.Date.valueOf("1999-12-31"),
        java.sql.Timestamp.valueOf("2000-02-29 23:59:59"))
    ).toDF("name", "n", "x", "flag", "day", "at")
    Xlsx.writeXlsx(src, out)
    val back = Xlsx.readXlsx(spark, out)
    assert(back.columns.toSeq === src.columns.toSeq)
    val types = back.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("n") === "bigint" && types("x") === "double")
    assert(types("flag") === "boolean")
    assert(types("day") === "date" && types("at") === "timestamp")
    val rows = back.orderBy("n").collect()
    assert(rows(0).getString(0) === "widget" && rows(1).getString(0) === "<&gadget>")
    assert(rows(0).getDate(4).toString === "2024-01-01")
    assert(rows(1).getTimestamp(5).toString === "2000-02-29 23:59:59.0") // leap day
  }

  test("xlsx through the Tab.fromFile dispatch") {
    val p = writeXlsx()
    val t = graft.Tab.fromFile(spark, p)
    assert(t.rows === 2L)
    assert(t.columns === Seq("name", "qty", "flag", "when", "day"))
  }
}
