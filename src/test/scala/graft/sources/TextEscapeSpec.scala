package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** tablite's bracket-escape CSV dialect (core.py:66-67 options,
  * file_reader_utils.py TextEscape docstring: "nail (75 x 4 mm,
  * 3" x 3/12")" stays ONE field when ( ) are escapes) — the r11
  * "what's missing" #2 item. The current reference ACCEPTS the options
  * but its rewritten split path no longer honors them; this engine
  * implements the documented semantics for real.
  */
class TextEscapeSpec extends SparkSpec {

  private def csvOf(content: String): String = {
    val p = Files.createTempFile("tesc", ".csv")
    Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  test("unit: delimiter inside brackets does not split; quotes untouched inside") {
    val line = """nail (75 x 4 mm, 3" x 3/12"),7,loose"""
    val got = Readers.splitBracketEscaped(line, ',', '"', "(", ")")
    assert(got.toSeq == Seq("""nail (75 x 4 mm, 3" x 3/12")""", "7", "loose"))
    // without escapes the same line splits at the inner comma and the
    // quote would open a region — the dialect genuinely changes parsing
    val plain = Readers.splitBracketEscaped(line, ',', '"', "", "")
    assert(plain.length != 3)
  }

  test("unit: nesting, unbalanced closures, quoted delimiters, doubled quotes") {
    assert(Readers.splitBracketEscaped("a[b{c,d},e],f", ',', '"', "([{", "}])").toSeq ==
      Seq("a[b{c,d},e]", "f"))
    // unbalanced closure degrades to a plain char, later split still works
    assert(Readers.splitBracketEscaped("a),b", ',', '"', "(", ")").toSeq ==
      Seq("a)", "b"))
    // quoted region still swallows delimiters and doubled quotes
    assert(Readers.splitBracketEscaped("\"x,y\"\"z\",w", ',', '"', "(", ")").toSeq ==
      Seq("x,y\"z", "w"))
  }

  test("from_file with text_escape_openings/closures: bracketed commas survive") {
    val p = csvOf(
      "name,qty,note\n" +
        "nail (75 x 4 mm, 3 inch),7,ok\n" +
        "screw,2,(a, b, c)\n" +
        "plain,1,\n")
    try {
      val t = graft.Tab.fromFile(spark, p, Readers.CsvOptions(
        textEscapeOpenings = "(", textEscapeClosures = ")", guessDatatypes = false))
      assert(t.df.columns.toSeq == Seq("name", "qty", "note"))
      val rows = t.df.orderBy("name").collect()
      assert(rows.length == 3)
      assert(rows(0).getString(0) == "nail (75 x 4 mm, 3 inch)" && rows(0).getString(1) == "7")
      assert(rows(2).getString(2) == "(a, b, c)")
      assert(rows(1).getString(2) == null) // empty field -> null, like Spark csv
    } finally { Files.deleteIfExists(java.nio.file.Paths.get(p)); () }
  }

  test("bracket dialect composes with header synthesis, start/limit window and types") {
    val p = csvOf((1 to 20).map(i => s"(a, $i),$i").mkString("\n"))
    try {
      val df = Readers.readCsv(spark, p, Readers.CsvOptions(
        firstRowHasHeaders = false, textEscapeOpenings = "(", textEscapeClosures = ")",
        start = 5, limit = 3))
      assert(df.columns.toSeq == Seq("_0", "_1"))
      assert(df.count() == 3)
      // guessDatatypes typed the numeric column
      assert(df.schema("_1").dataType.typeName == "long")
      assert(df.orderBy("_1").collect().map(_.getLong(1)).toSeq == Seq(6L, 7L, 8L))
    } finally { Files.deleteIfExists(java.nio.file.Paths.get(p)); () }
  }

  test("qualifier inside openings/closures is refused loudly") {
    val p = csvOf("a,b\n1,2\n")
    try {
      val e = intercept[IllegalArgumentException] {
        Readers.readCsv(spark, p, Readers.CsvOptions(
          textEscapeOpenings = "(\"", textEscapeClosures = ")"))
      }
      assert(e.getMessage.contains("qualifier"))
    } finally { Files.deleteIfExists(java.nio.file.Paths.get(p)); () }
  }
}
