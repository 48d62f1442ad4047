package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import java.sql.{Date, Timestamp}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Writer-side roundtrips for the round-12 codecs: BIFF8 `.xls`
  * (writeXls), flat ODF `.fods` (writeFods) and the html table writer
  * (writeHtml). Each writes through the clean-room encoder and reads
  * back through the INDEPENDENT reader implementation, so a layout bug
  * on either side breaks the identity.
  */
class CodecWritersSpec extends SparkSpec {

  private def typedDf = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("price", DoubleType),
      StructField("ok", BooleanType),
      StructField("d", DateType),
      StructField("ts", TimestampType)))
    val rows = Seq(
      Row(1L, "widget", 9.5, true, Date.valueOf("2024-02-29"), Timestamp.valueOf("2024-02-29 13:45:30")),
      Row(2L, "gizmo & <tag>", -0.25, false, Date.valueOf("1999-12-31"), Timestamp.valueOf("2000-01-01 00:00:01")),
      Row(3L, null, 1.0e6, null, null, null),
      Row(4L, "ünïcødé ✓", 42.0, true, Date.valueOf("2024-01-01"), Timestamp.valueOf("2024-06-15 06:07:08")))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  private def tmp(suffix: String): String = {
    val p = Files.createTempFile("codecw", suffix)
    Files.delete(p)
    p.toString
  }

  test("writeXls -> readXls roundtrips typed cells (strings/num/bool/date/ts/null)") {
    val p = tmp(".xls")
    try {
      Xls.writeXls(typedDf, p, sheetName = "Data")
      assert(Xls.sheetNames(p) == Seq("Data"))
      val back = Xls.readXls(spark, p, guessDatatypes = false)
      assert(back.columns.toSeq == Seq("id", "name", "price", "ok", "d", "ts"))
      val rows = back.orderBy(col("id").cast("long")).collect()
      assert(rows.length == 4)
      assert(rows(0).getString(1) == "widget")
      assert(rows(1).getString(1) == "gizmo & <tag>")
      assert(rows(2).getString(1) == null)
      assert(rows(3).getString(1) == "ünïcødé ✓")
      assert(rows(0).getString(2).toDouble == 9.5)
      assert(rows(1).getString(2).toDouble == -0.25)
      assert(rows(2).getString(2).toDouble == 1.0e6)
      assert(rows(0).getString(3) == "true" && rows(1).getString(3) == "false")
      assert(rows(2).getString(3) == null)
      assert(rows(0).getString(4) == "2024-02-29")
      assert(rows(0).getString(5) startsWith "2024-02-29 13:45:30")
      assert(rows(1).getString(5) startsWith "2000-01-01 00:00:01")
    } finally { Files.deleteIfExists(java.nio.file.Paths.get(p)); () }
  }

  test("writeXls SST CONTINUE split: strings past the 8224-byte record boundary") {
    val p = tmp(".xls")
    try {
      // one 9000-char ASCII string (must split mid-string with a fresh
      // grbit), one 5000-char UTF-16 string (2-byte chars, grbit 1 on
      // the continuation), and enough fill strings to cross several
      // record boundaries at string edges too
      val big = "x" * 9000 + "END"
      val wide = ("日" * 5000) + "端"
      val fills = (0 until 800).map(i => s"fill_${i}_" + ("ab" * 40))
      import spark.implicits._
      val df = (Seq(big, wide) ++ fills).zipWithIndex
        .map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
      Xls.writeXls(df, p)
      val back = Xls.readXls(spark, p, guessDatatypes = false)
        .orderBy(col("id").cast("long")).collect()
      assert(back.length == 802)
      assert(back(0).getString(1) == big)
      assert(back(1).getString(1) == wide)
      assert(back(801).getString(1) == fills.last)
    } finally { Files.deleteIfExists(java.nio.file.Paths.get(p)); () }
  }

  test("writeFods -> readFods roundtrips typed cells") {
    val p = tmp(".fods")
    try {
      Ods.writeFods(typedDf, p, sheetName = "Flat")
      val back = Ods.readFods(spark, p, guessDatatypes = false)
      assert(back.columns.toSeq == Seq("id", "name", "price", "ok", "d", "ts"))
      val rows = back.orderBy(col("id").cast("long")).collect()
      assert(rows.length == 4)
      assert(rows(1).getString(1) == "gizmo & <tag>")
      assert(rows(3).getString(1) == "ünïcødé ✓")
      assert(rows(0).getString(3) == "true")
      assert(rows(0).getString(4) == "2024-02-29")
      assert(rows(2).getString(1) == null && rows(2).getString(3) == null)
    } finally { Files.deleteIfExists(java.nio.file.Paths.get(p)); () }
  }

  test("fods dispatches through Tab.fromFile like the reference's readers dict") {
    val p = tmp(".fods")
    try {
      Ods.writeFods(typedDf.select(col("id"), col("name")), p)
      val t = graft.Tab.fromFile(spark, p)
      assert(t.df.columns.toSeq == Seq("id", "name"))
      assert(t.df.count() == 4)
    } finally { Files.deleteIfExists(java.nio.file.Paths.get(p)); () }
  }

  test("writeHtml -> readHtml roundtrips incl. entity-escaped cells") {
    val p = tmp(".html")
    try {
      Writers.writeHtml(typedDf, p, maxRows = 100)
      // skipDataRows = 1 drops the dtype presentation row toHtml emits
      val back = Readers.readHtml(spark, p, skipDataRows = 1, guessDatatypes = false)
      assert(back.columns.toSeq == Seq("id", "name", "price", "ok", "d", "ts"))
      val rows = back.orderBy(col("id").cast("long")).collect()
      assert(rows.length == 4)
      assert(rows(1).getString(1) == "gizmo & <tag>") // escape + unescape
      assert(rows(3).getString(1) == "ünïcødé ✓")
      assert(rows(2).getString(1) == null)            // None -> null
      assert(rows(0).getString(2).toDouble == 9.5)
    } finally { Files.deleteIfExists(java.nio.file.Paths.get(p)); () }
  }

  test("writeXls DIFAT chaining: container past the 109-FAT header bound") {
    val p = tmp(".xls")
    try {
      import spark.implicits._
      // ~9 MB of SST → >109 FAT sectors → chained DIFAT sectors
      // SST stores UNIQUE strings, so each row needs its own text
      val df = spark.range(30000)
        .selectExpr("id", "repeat(concat('w', cast(id as string), ' '), 60) AS s")
      Xls.writeXls(df.as[(Long, String)].toDF("id", "s"), p)
      assert(Files.size(java.nio.file.Paths.get(p)) > 109L * 128 * 512)
      val back = Xls.readXls(spark, p, guessDatatypes = false)
      assert(back.count() == 30000)
      val r = back.filter(col("id") === "29999").head
      assert(r.getString(1) == "w29999 " * 60)
    } finally { Files.deleteIfExists(java.nio.file.Paths.get(p)); () }
  }

  test("writeXls caps rows loudly and readXls survives zero-pad tail") {
    val p = tmp(".xls")
    try {
      import spark.implicits._
      val e = intercept[IllegalArgumentException] {
        Xls.writeXls(spark.range(10).toDF("id"), p, maxRows = 5)
      }
      assert(e.getMessage.contains("capped"))
      // tiny frame: workbook stream far below the 4096-byte mini cutoff,
      // exercising the zero-padding path end to end
      Xls.writeXls(Seq((1L, "a")).toDF("id", "s"), p)
      val back = Xls.readXls(spark, p, guessDatatypes = false).collect()
      assert(back.length == 1 && back(0).getString(1) == "a")
    } finally { Files.deleteIfExists(java.nio.file.Paths.get(p)); () }
  }
}
