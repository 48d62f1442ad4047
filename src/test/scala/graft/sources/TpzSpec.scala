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

  test("readTpzDistributed: >1M rows decode as one task per page stripe, equal to serial") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val n = 1200000
    val df = spark.range(n)
      .select(col("id").as("v"), (col("id") % 97 * 0.5).as("x"),
        concat(lit("s"), (col("id") % 1000).cast("string")).as("s"))
    val p = Files.createTempFile("graftbig", ".tpz").toString
    Tpz.writeTpz(df, p, pageSize = 200000)
    val dist = Tpz.readTpzDistributed(spark, p)
    assert(dist.rdd.getNumPartitions === 6, "one task per page stripe")
    assert(dist.count() === n)
    // content equality with the serial reader, Spark-side (no collect)
    val serial = Tpz.readTpz(spark, p)
    assert(dist.schema === serial.schema)
    assert(dist.exceptAll(serial).isEmpty && serial.exceptAll(dist).isEmpty)
  }

  test("readTpzDistributed rejects non-uniform interior pages with a clear error") {
    // col a: two 8-row pages; col b: one 16-row page — a's NON-FINAL
    // page doesn't fill the 16-row stripe, so stripe reads would
    // mis-align rows across columns (hand-built layout, not the
    // reference writer's)
    def intNpy(n: Int): Array[Byte] = {
      val dict = s"{'descr': '<i8', 'fortran_order': False, 'shape': ($n,), }"
      val pad = 64 - ((10 + dict.length + 1) % 64)
      val h = dict + (" " * pad) + "\n"
      val out = new java.io.ByteArrayOutputStream()
      out.write(0x93); out.write("NUMPY".getBytes("ASCII"))
      out.write(1); out.write(0)
      out.write(h.length & 0xFF); out.write((h.length >> 8) & 0xFF)
      out.write(h.getBytes("ASCII"))
      val bb = java.nio.ByteBuffer.allocate(8 * n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until n).foreach(i => bb.putLong(i.toLong))
      out.write(bb.array())
      out.toByteArray
    }
    val f = Files.createTempFile("graftrag", ".tpz").toString
    val zip = new ZipOutputStream(Files.newOutputStream(Paths.get(f)))
    val yml = "columns:\n  a:\n    pages: [p8a.npy, p8b.npy]\n  b:\n    pages: [p16.npy]\n"
    zip.putNextEntry(new ZipEntry("table.yml")); zip.write(yml.getBytes("UTF-8")); zip.closeEntry()
    for ((name, n) <- Seq(("p8a.npy", 8), ("p8b.npy", 8), ("p16.npy", 16))) {
      zip.putNextEntry(new ZipEntry(name)); zip.write(intNpy(n)); zip.closeEntry()
    }
    zip.close()
    val ex = intercept[IllegalArgumentException](
      Tpz.readTpzDistributed(spark, f).collect())
    assert(ex.getMessage.contains("readTpz"), ex.getMessage)
    // the serial reader handles the same archive (table-level padding)
    assert(Tpz.readTpz(spark, f).count() === 16)
  }
}
