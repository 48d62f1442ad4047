package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.time.LocalDate
import java.util.zip.ZipFile

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** `.tpz` compatibility reader — the reference's native table format
  * (base.py:1350-1453): a zip of `table.yml` (column → page-file list)
  * plus numpy `.npy` pages. The `.npy` format is a simple header +
  * little-endian buffer, parseable in pure JVM for every PRIMITIVE
  * dtype the reference writes (bool, int8-64, float32/64,
  * datetime64[D/s/ms/us/ns], fixed-width unicode `<U n`). Pages with
  * dtype `|O` are PICKLED Python objects (mixed-type / None-bearing
  * pages) and are rejected with a clear error — re-export such tables
  * from the reference with typed columns, or use parquet (the native
  * format here). Values canonicalize to strings and run through the
  * same rank-based inference as every other reader.
  */
object Tpz {

  /** Parse one .npy page to canonical string values (null for NaT)
    * plus the page's Spark type (the npy dtype is authoritative — no
    * re-inference for typed pages).
    */
  private[sources] def readNpy(bytes: Array[Byte]): (Array[String], String) = {
    require(bytes.length > 10 && bytes(0) == 0x93.toByte &&
      new String(bytes, 1, 5, StandardCharsets.US_ASCII) == "NUMPY", "not an .npy page")
    val major = bytes(6)
    val (headerLen, dataStart) =
      if (major == 1) {
        val n = ((bytes(9) & 0xFF) << 8) | (bytes(8) & 0xFF)
        (n, 10 + n)
      } else {
        val b = ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN)
        val n = b.getInt
        (n, 12 + n)
      }
    val header = new String(bytes, dataStart - headerLen, headerLen, StandardCharsets.US_ASCII)
    val descr = "'descr':\\s*'([^']+)'".r.findFirstMatchIn(header)
      .map(_.group(1)).getOrElse(sys.error(s"no descr in npy header: $header"))
    val shape = "'shape':\\s*\\((\\d*)".r.findFirstMatchIn(header)
      .map(m => if (m.group(1).isEmpty) 1 else m.group(1).toInt)
      .getOrElse(sys.error(s"no shape in npy header: $header"))
    val buf = ByteBuffer.wrap(bytes, dataStart, bytes.length - dataStart)
      .order(ByteOrder.LITTLE_ENDIAN)
    val epoch = LocalDate.of(1970, 1, 1)

    def dt(unitDiv: Long, toIso: Long => String): Array[String] =
      Array.tabulate(shape) { _ =>
        val v = buf.getLong
        if (v == Long.MinValue) null else toIso(v / unitDiv) // NaT
      }
    def tsIso(micros: Long): String = {
      val days = Math.floorDiv(micros, 86400000000L)
      val rem = Math.floorMod(micros, 86400000000L)
      val sec = rem / 1000000L
      val us = rem % 1000000L
      val base = f"${epoch.plusDays(days)} ${sec / 3600}%02d:${sec % 3600 / 60}%02d:${sec % 60}%02d"
      if (us == 0) base else f"$base.$us%06d"
    }

    descr.stripPrefix("<").stripPrefix("|").stripPrefix(">") match {
      case "b1" =>
        (Array.tabulate(shape)(_ => if (buf.get() != 0) "true" else "false"), "boolean")
      case "i1" => (Array.tabulate(shape)(_ => buf.get().toString), "bigint")
      case "i2" => (Array.tabulate(shape)(_ => buf.getShort.toString), "bigint")
      case "i4" => (Array.tabulate(shape)(_ => buf.getInt.toString), "bigint")
      case "i8" => (Array.tabulate(shape)(_ => buf.getLong.toString), "bigint")
      case "u1" => (Array.tabulate(shape)(_ => (buf.get() & 0xFF).toString), "bigint")
      case "f4" =>
        (Array.tabulate(shape)(_ => { val v = buf.getFloat; if (v.isNaN) null else v.toString }), "double")
      case "f8" =>
        (Array.tabulate(shape)(_ => { val v = buf.getDouble; if (v.isNaN) null else v.toString }), "double")
      case "M8[D]"  => (dt(1L, d => epoch.plusDays(d).toString), "date")
      case "M8[s]"  => (dt(1L, s => tsIso(s * 1000000L)), "timestamp")
      case "M8[ms]" => (dt(1L, ms => tsIso(ms * 1000L)), "timestamp")
      case "M8[us]" => (dt(1L, tsIso), "timestamp")
      case "M8[ns]" => (dt(1000L, tsIso), "timestamp") // floor to µs
      case u if u.startsWith("U") =>
        val width = u.drop(1).toInt
        (Array.tabulate(shape) { _ =>
          val cps = Array.fill(width)(buf.getInt)
          val len = cps.indexOf(0) match { case -1 => width; case i => i }
          val s = new String(cps, 0, len)
          if (s.isEmpty) null else s
        }, "string")
      case "O" => throw new UnsupportedOperationException(
        "npy page has dtype object (pickled python values) — typed pages only; " +
          "re-export with typed columns or use parquet")
      case other => throw new UnsupportedOperationException(s"npy dtype: $other")
    }
  }

  /** Parse the machine-generated table.yml: column name → page files. */
  private[sources] def parseManifest(yml: String): Seq[(String, Seq[String])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
    var current: String = null
    def unq(s: String): String = {
      val t = s.trim
      if ((t.startsWith("\"") && t.endsWith("\"")) || (t.startsWith("'") && t.endsWith("'")))
        t.substring(1, t.length - 1)
      else t
    }
    yml.linesIterator.foreach { line =>
      val t = line.trim
      if (line.startsWith("  ") && !line.startsWith("    ") && t.endsWith(":"))
        current = unq(t.dropRight(1))
      else if (t.startsWith("pages:") && current != null) {
        val inside = t.stripPrefix("pages:").trim.stripPrefix("[").stripSuffix("]")
        val pages = inside.split(",").map(unq).filter(_.nonEmpty).toSeq
        out += (current -> pages)
        current = null
      }
    }
    out.toSeq
  }

  /** Load a .tpz archive as a typed DataFrame. */
  def readTpz(spark: SparkSession, path: String, guessDatatypes: Boolean = true): DataFrame = {
    val zip = new ZipFile(path)
    try {
      val yml = Option(zip.getEntry("table.yml"))
        .map { e =>
          val in = zip.getInputStream(e)
          try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
        }
        .getOrElse(throw new IllegalArgumentException("no table.yml — not a .tpz?"))
      val columns = parseManifest(yml)
      require(columns.nonEmpty, "empty .tpz manifest")
      val colValues: Seq[(String, Array[String], String)] = columns.map { case (name, pages) =>
        val parsed = pages.map { p =>
          val e = Option(zip.getEntry(p))
            .getOrElse(throw new IllegalArgumentException(s"page $p missing from archive"))
          val in = zip.getInputStream(e)
          try readNpy(in.readAllBytes()) finally in.close()
        }
        val kinds = parsed.map(_._2).distinct
        // page dtype is authoritative; mixed int/float pages promote to
        // double, any other mix falls back to string (caller may infer)
        val kind = kinds match {
          case Seq(k) => k
          case ks if ks.toSet == Set("bigint", "double") => "double"
          case _ => "string"
        }
        (name, parsed.toArray.flatMap(_._1), kind)
      }
      // ragged columns pad with null (len(Table) = max column length,
      // base.py:1289-1318)
      val height = colValues.map(_._2.length).max
      val rows = (0 until height).map { r =>
        Row.fromSeq(colValues.map { case (_, v, _) => if (r < v.length) v(r) else null })
      }
      val schema = StructType(colValues.map(c => StructField(c._1, StringType, nullable = true)))
      val raw = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, math.max(1, height / 100000 + 1)), schema)
      val typed = colValues.foldLeft(raw) { case (df, (name, _, kind)) =>
        if (kind == "string") df
        else df.withColumn(name, org.apache.spark.sql.functions.col(name).cast(kind))
      }
      // rank-based inference only for the residual string columns
      // (e.g. <U pages holding dates) — typed pages stay authoritative
      if (guessDatatypes) graft.functions.TypeInference.applyBestTypes(typed) else typed
    } finally zip.close()
  }
}
