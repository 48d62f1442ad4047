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
}
