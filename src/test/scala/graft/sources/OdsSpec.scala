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

  test("writeOds keeps the shortest float repr (0.1f stays \"0.1\", 1e22 expands)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((0.1f, 1.0e22)).toDF("f", "big")
      .withColumn("f", col("f").cast("float"))
    val p = java.nio.file.Files.createTempFile("graft_float", ".ods").toString
    Ods.writeOds(df, p)
    val zf = new java.util.zip.ZipFile(p)
    val xml = try {
      val e = zf.getEntry("content.xml")
      new String(zf.getInputStream(e).readAllBytes, java.nio.charset.StandardCharsets.UTF_8)
    } finally zf.close()
    // widening 0.1f to double before formatting would print
    // 0.10000000149011612; scientific notation must expand to digits
    assert(xml.contains("office:value=\"0.1\""), xml.take(2000))
    assert(xml.contains("office:value=\"10000000000000000000000\""), xml.take(2000))
    new java.io.File(p).delete()
  }

  test("writeOds roundtrip: typed columns survive write → read → infer") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("widget", 7L, 1.5, true, "2023-03-15", "2023-03-15 18:00:00"),
      ("gadget", 9L, 8.25, false, "2023-03-16", "2023-03-16 06:30:00"))
      .toDF("name", "qty", "price", "flag", "d", "ts")
      .withColumn("d", col("d").cast("date"))
      .withColumn("ts", col("ts").cast("timestamp"))
    val p = java.nio.file.Files.createTempFile("graft", ".ods").toString
    Ods.writeOds(df, p)
    val back = Ods.readOds(spark, p)
    assert(back.columns.toSeq === df.columns.toSeq)
    assert(back.schema.fields.map(_.dataType.simpleString).toSeq ===
      Seq("string", "bigint", "double", "boolean", "date", "timestamp"))
    val a = df.orderBy("name").collect().map(_.toSeq)
    val b = back.orderBy("name").collect().map(_.toSeq)
    assert(a === b)
    // the package is a spec-conforming ODF zip: mimetype first + stored
    val zf = new java.util.zip.ZipFile(p)
    try {
      val first = zf.entries().nextElement()
      assert(first.getName === "mimetype")
      assert(first.getMethod === java.util.zip.ZipEntry.STORED)
    } finally zf.close()
  }
}
