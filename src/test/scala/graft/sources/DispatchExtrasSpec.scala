package graft.sources

import graft.SparkSpec
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Closes the r10 dispatch gaps: `.fods` and `.html` in `Tab.fromFile`
  * (reference readers dict, import_utils.py:633-650), and the excel
  * reader's `start`/`limit`/`columns` options
  * (import_utils.py:180-368 signature).
  */
class DispatchExtrasSpec extends SparkSpec {
  import spark.implicits._

  private val base = "/root/reference/tests/data"

  /** Flat-ODS fixture = the content.xml of a real .ods, standalone —
    * exactly what LibreOffice's "Flat XML ODF Spreadsheet" emits.
    */
  private def fodsFromOds(odsPath: String): String = {
    val zip = new java.util.zip.ZipFile(odsPath)
    val xml = try {
      val in = zip.getInputStream(zip.getEntry("content.xml"))
      try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
    } finally zip.close()
    val f = Files.createTempFile("graft", ".fods")
    Files.writeString(f, xml)
    f.toString
  }

  test(".fods dispatch: flat XML parses identically to its zipped twin") {
    assume(new java.io.File(s"$base/gdocs1.ods").exists())
    val flat = fodsFromOds(s"$base/gdocs1.ods")
    val viaDispatch = graft.Tab.fromFile(spark, flat).df
    val zipped = Ods.readOds(spark, s"$base/gdocs1.ods")
    assert(viaDispatch.columns.toSeq === zipped.columns.toSeq)
    assert(viaDispatch.count() === zipped.count())
    assert(viaDispatch.collect().toSet === zipped.collect().toSet)
  }

  test(".html dispatch: Writers.toHtml output reads back through fromFile") {
    val src = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name")
    val html = Writers.toHtml(src)
    val f = Files.createTempFile("graft", ".html")
    Files.writeString(f, html)
    // toHtml emits a dtype subheader row under the headers — skip it
    val back = Readers.readHtml(spark, f.toString, skipDataRows = 1)
    assert(back.columns.toSeq === Seq("id", "name"))
    assert(back.count() === 2)
    // and the DISPATCH routes .html at all (first data row is the dtype
    // subheader here, so just assert shape)
    val t = graft.Tab.fromFile(spark, f.toString)
    assert(t.columns === Seq("id", "name"))
  }

  test("excel start/limit window the data rows; columns subsets by name") {
    assume(new java.io.File(s"$base/gdocs1.xlsx").exists())
    val full = Xlsx.readXlsx(spark, s"$base/gdocs1.xlsx")
    assert(full.count() === 45)
    val windowed = Xlsx.readXlsx(spark, s"$base/gdocs1.xlsx", start = 10, limit = 5)
    assert(windowed.count() === 5)
    // the window slices data rows in sheet order: rows 10..14
    val expect = full.collect().map(_.getLong(0)).slice(10, 15).sorted
    assert(windowed.collect().map(_.getLong(0)).sorted === expect)
    val subset = Xlsx.readXlsx(spark, s"$base/gdocs1.xlsx", columns = Seq("c", "a"))
    assert(subset.columns.toSeq === Seq("c", "a")) // caller's order
    assert(subset.count() === 45)
    intercept[IllegalArgumentException](
      Xlsx.readXlsx(spark, s"$base/gdocs1.xlsx", columns = Seq("nope")))
    // ods shares the same plumbing
    val odsW = Ods.readOds(spark, s"$base/gdocs1.ods", start = 40, limit = 100,
      columns = Seq("f"))
    assert(odsW.columns.toSeq === Seq("f"))
    assert(odsW.count() === 5) // only 45 data rows → 40..44
  }

  test("fromFile threads start/limit/columns from CsvOptions into the excel path") {
    assume(new java.io.File(s"$base/gdocs1.xlsx").exists())
    val t = graft.Tab.fromFile(spark, s"$base/gdocs1.xlsx",
      Readers.CsvOptions(start = 2, limit = 3, columns = Seq("b")))
    assert(t.columns === Seq("b"))
    assert(t.rows === 3L)
  }
  test("fromFile threads the sheet option into every spreadsheet reader") {
    import java.nio.file.Files
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val b = Seq((10L, "p")).toDF("id", "v")
    // two-sheet xlsx is not part of our writer surface (one sheet per
    // file, like the reference's exporter) — so pin the option by
    // writing two single-sheet files with DIFFERENT sheet names and
    // verifying name-addressed reads resolve (and a wrong name fails)
    val d = Files.createTempDirectory("sheetopt").toString
    Xlsx.writeXlsx(a, s"$d/a.xlsx", sheetName = "Alpha")
    Ods.writeOds(b, s"$d/b.ods", sheetName = "Beta")
    Ods.writeFods(b, s"$d/b.fods", sheetName = "Gamma")
    Xls.writeXls(a, s"$d/a.xls", sheetName = "Delta")
    assert(graft.Tab.fromFile(spark, s"$d/a.xlsx",
      Readers.CsvOptions(sheet = Some("Alpha"), guessDatatypes = false)).rows == 2)
    assert(graft.Tab.fromFile(spark, s"$d/b.ods",
      Readers.CsvOptions(sheet = Some("Beta"), guessDatatypes = false)).rows == 1)
    assert(graft.Tab.fromFile(spark, s"$d/b.fods",
      Readers.CsvOptions(sheet = Some("Gamma"), guessDatatypes = false)).rows == 1)
    assert(graft.Tab.fromFile(spark, s"$d/a.xls",
      Readers.CsvOptions(sheet = Some("Delta"), guessDatatypes = false)).rows == 2)
    intercept[Exception] {
      graft.Tab.fromFile(spark, s"$d/a.xlsx",
        Readers.CsvOptions(sheet = Some("NoSuchSheet"))).rows
    }
    assert(Xls.sheetNames(s"$d/a.xls") == Seq("Delta"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
  }
}
