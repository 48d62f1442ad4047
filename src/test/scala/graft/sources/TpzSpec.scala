package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

class TpzSpec extends SparkSpec {

  private val pagesDir = "/root/reference/tests/data/pages"

  /** Assemble a real .tpz: the reference's own numpy page files + a
    * table.yml manifest in the reference's save format (base.py:1350).
    */
  private def buildTpz(cols: Seq[(String, Seq[String])]): String = {
    val f = Files.createTempFile("graft", ".tpz").toString
    val zip = new ZipOutputStream(Files.newOutputStream(Paths.get(f)))
    val yml = "columns:\n" + cols.map { case (name, pages) =>
      s"  $name:\n    pages: [${pages.mkString(", ")}]"
    }.mkString("\n") + "\n"
    zip.putNextEntry(new ZipEntry("table.yml"))
    zip.write(yml.getBytes("UTF-8"))
    zip.closeEntry()
    cols.flatMap(_._2).distinct.foreach { p =>
      zip.putNextEntry(new ZipEntry(p))
      zip.write(Files.readAllBytes(Paths.get(s"$pagesDir/$p")))
      zip.closeEntry()
    }
    zip.close()
    f
  }

  test("tpz with the reference's real numpy pages: typed columns decode") {
    assume(new java.io.File(s"$pagesDir/int.npy").exists())
    val p = buildTpz(Seq(
      "n" -> Seq("int.npy"), "x" -> Seq("float.npy"), "flag" -> Seq("boolean.npy"),
      "day" -> Seq("date.npy"), "at" -> Seq("datetime.npy")))
    val df = Tpz.readTpz(spark, p)
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types === Map("n" -> "bigint", "x" -> "double", "flag" -> "boolean",
      "day" -> "date", "at" -> "timestamp"))
    assert(df.count() === 8)
    val r = df.orderBy("n", "day").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(0L, 0L, 1L, 1L, 2L, 2L, 3L, 3L))
    assert(r.head.getBoolean(2) === true)
    assert(r.map(_.getDate(3).toString).distinct.sorted ===
      Array("2000-01-01", "2000-06-01", "2001-06-01", "2002-01-01"))
    assert(r.head.getTimestamp(4).toString === "2000-01-01 00:00:00.0")
  }

  test("multi-page columns concatenate; object pages reject clearly") {
    assume(new java.io.File(s"$pagesDir/int.npy").exists())
    val multi = Tpz.readTpz(spark, buildTpz(Seq("n" -> Seq("int.npy", "int.npy"))))
    assert(multi.count() === 16)
    val err = intercept[Exception] {
      Tpz.readTpz(spark, buildTpz(Seq("m" -> Seq("mixed.npy")))).count()
    }
    assert(err.getMessage.contains("object") || err.getMessage.contains("pickled"),
      err.getMessage)
  }

  test("writeTpz roundtrip: readTpz(writeTpz(t)) == t across types and nulls") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Some(1.5), Some("alpha"), true, Some("2023-03-15"), Some("2023-03-15 18:00:00.123456")),
      (2L, None, Some("beta"), false, None, None),
      (3L, Some(8.25), None, true, Some("2023-03-17"), Some("2023-03-17 06:30:00")))
      .toDF("n", "x", "s", "flag", "d", "ts")
      .withColumn("d", col("d").cast("date"))
      .withColumn("ts", col("ts").cast("timestamp"))
    val p = Files.createTempFile("graft", ".tpz").toString
    Tpz.writeTpz(df, p)
    val back = Tpz.readTpz(spark, p)
    assert(back.columns.toSeq === df.columns.toSeq)
    assert(back.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap ===
      Map("n" -> "bigint", "x" -> "double", "s" -> "string",
        "flag" -> "boolean", "d" -> "date", "ts" -> "timestamp"))
    assert(back.orderBy("n").collect().map(_.toSeq).toSeq ===
      df.orderBy("n").collect().map(_.toSeq).toSeq)
    // manifest structurally matches the reference's save layout
    val zf = new java.util.zip.ZipFile(p)
    try {
      val yml = new String(zf.getInputStream(zf.getEntry("table.yml")).readAllBytes, "UTF-8")
      assert(yml.startsWith("columns:\n"))
      val cols = Tpz.parseManifest(yml)
      assert(cols.map(_._1) === Seq("n", "x", "s", "flag", "d", "ts"))
      cols.flatMap(_._2).foreach(pg => assert(zf.getEntry(pg) != null, s"page $pg missing"))
    } finally zf.close()
  }

  test("writeTpz pages split at pageSize and concatenate back") {
    import spark.implicits._
    val df = (1 to 2500).map(_.toLong).toDF("v")
    val p = Files.createTempFile("graft", ".tpz").toString
    Tpz.writeTpz(df, p, pageSize = 1000)
    val zf = new java.util.zip.ZipFile(p)
    val nPages = try Tpz.parseManifest(
      new String(zf.getInputStream(zf.getEntry("table.yml")).readAllBytes, "UTF-8"))
      .head._2.length finally zf.close()
    assert(nPages === 3)
    val back = Tpz.readTpz(spark, p)
    assert(back.count() === 2500)
    assert(back.agg(org.apache.spark.sql.functions.sum("v")).head.getLong(0) === 2500L * 2501 / 2)
  }
}
