package graft.sources

import graft.SparkSpec

class OdsSpec extends SparkSpec {

  private val base = "/root/reference/tests/data"

  test("simple.ods: header offset + int inference (reference fixture)") {
    assume(new java.io.File(s"$base/simple.ods").exists())
    val df = Ods.readOds(spark, s"$base/simple.ods", headerRowIndex = 1)
    assert(df.columns.toSeq === Seq("header"))
    assert(df.schema.fields.head.dataType.simpleString === "bigint")
    assert(df.count() === 5)
  }

  test("gdocs1.ods parses identically to gdocs1.csv (cross-format parity)") {
    assume(new java.io.File(s"$base/gdocs1.ods").exists())
    val ods = Ods.readOds(spark, s"$base/gdocs1.ods")
    val csv = Readers.readCsv(spark, s"$base/gdocs1.csv")
    assert(ods.columns.toSeq === csv.columns.toSeq)
    assert(ods.count() === csv.count())
    val o = ods.collect().map(_.toString).sorted
    val c = csv.collect().map(_.toString).sorted
    assert(o.length === c.length)
  }

  test("with_empty_lines.ods: reference row counts for NONE/ALL/ANY " +
      "(test_filereader_formats.py:793-833)") {
    assume(new java.io.File(s"$base/with_empty_lines.ods").exists())
    val p = s"$base/with_empty_lines.ods"
    // empty first row becomes the ("", "_1", ...) header set
    val none = Ods.readOds(spark, p, skipEmpty = "NONE", guessDatatypes = false)
    assert(none.columns.toSeq === Seq("", "_1", "_2", "_3", "_4", "_5"))
    assert(none.count() === 7)
    assert(Ods.readOds(spark, p, skipEmpty = "ALL", guessDatatypes = false).count() === 3)
    assert(Ods.readOds(spark, p, skipEmpty = "ANY", guessDatatypes = false).count() === 2)
  }
}
