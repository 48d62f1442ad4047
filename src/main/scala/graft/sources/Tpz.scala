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
  /** Parse just the .npy magic + header dict: (descr, shape, dataStart).
    * The header lives in the first few hundred bytes, so kind/shape
    * planning (the distributed stripe reader) never pulls page bodies.
    */
  private[sources] def npyHeader(bytes: Array[Byte]): (String, Int, Int) = {
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
    (descr, shape, dataStart)
  }

  /** The Spark kind an .npy descr decodes to (must agree with
    * [[readNpy]]'s returned kind — the stripe planner uses this to type
    * columns without touching page bodies).
    */
  private[sources] def descrKind(descr: String): String =
    descr.stripPrefix("<").stripPrefix("|").stripPrefix(">") match {
      case "b1"                                    => "boolean"
      case "i1" | "i2" | "i4" | "i8" | "u1"        => "bigint"
      case "f4" | "f8"                             => "double"
      case "M8[D]"                                 => "date"
      case "M8[s]" | "M8[ms]" | "M8[us]" | "M8[ns]" => "timestamp"
      case u if u.startsWith("U")                  => "string"
      case "O" => throw new UnsupportedOperationException(
        "npy page has dtype object (pickled python values) — typed pages only; " +
          "re-export with typed columns or use parquet")
      case other => throw new UnsupportedOperationException(s"npy dtype: $other")
    }

  private[sources] def readNpy(bytes: Array[Byte]): (Array[String], String) = {
    val (descr, shape, dataStart) = npyHeader(bytes)
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

  /** Distributed `.tpz` read — one task per PAGE STRIPE (the manifest's
    * natural parallel unit: the reference itself pages every column at a
    * fixed row count, so stripe `s` is the same row window in every
    * column). Each task reads only its own stripe's `.npy` entries, so a
    * multi-GB archive decodes on every core instead of serializing on
    * the driver like [[readTpz]].
    *
    * Planning is header-only (descr + shape from the first few hundred
    * bytes of each entry — page bodies never reach the driver). Kinds
    * follow [[readNpy]]'s promote rule per column. Requirements, checked
    * up front with clear errors: every non-final page of every column
    * must have the uniform page height (the reference writer's layout;
    * anything else would mis-align rows across columns — fall back to
    * [[readTpz]] for hand-built ragged archives), and `path` must be
    * readable from every executor (a shared filesystem — the zip
    * central directory forces local `ZipFile` opens; HDFS/S3 users
    * should unpack or use parquet).
    */
  def readTpzDistributed(spark: SparkSession, path: String,
      guessDatatypes: Boolean = true): DataFrame = {
    val (columns, kinds, stripeHeights) = {
      val zip = new ZipFile(path)
      try {
        val yml = Option(zip.getEntry("table.yml"))
          .map { e =>
            val in = zip.getInputStream(e)
            try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
          }
          .getOrElse(throw new IllegalArgumentException("no table.yml — not a .tpz?"))
        val cols = parseManifest(yml)
        require(cols.nonEmpty, "empty .tpz manifest")
        // header-only scan: per page (descr, shape)
        val heads: Seq[(String, Seq[(String, Int)])] = cols.map { case (name, pages) =>
          name -> pages.map { p =>
            val e = Option(zip.getEntry(p))
              .getOrElse(throw new IllegalArgumentException(s"page $p missing from archive"))
            val in = zip.getInputStream(e)
            val head = try in.readNBytes(4096) finally in.close()
            val (descr, shape, _) = npyHeader(head)
            (descr, shape)
          }
        }
        val kinds = heads.map { case (name, ph) =>
          val ks = ph.map(h => descrKind(h._1)).distinct
          name -> (ks match {
            case Seq(k)                                    => k
            case s if s.toSet == Set("bigint", "double")   => "double"
            case _                                         => "string"
          })
        }
        val nStripes = heads.map(_._2.size).max
        val stripeHeights = (0 until nStripes).map { s =>
          heads.flatMap(_._2.lift(s)).map(_._2).max
        }
        // row alignment: every column's non-final pages must fill their
        // stripe completely (the reference's fixed page_size layout)
        heads.foreach { case (name, ph) =>
          ph.zipWithIndex.dropRight(1).foreach { case ((_, shape), s) =>
            require(shape == stripeHeights(s),
              s"column '$name' page $s has $shape rows but the stripe holds " +
                s"${stripeHeights(s)} — non-uniform paging mis-aligns rows across " +
                "columns; read this archive with readTpz")
          }
        }
        (cols, kinds, stripeHeights)
      } finally zip.close()
    }
    val names = columns.map(_._1)
    val pagesByStripe: Seq[(Int, Seq[Option[String]])] = stripeHeights.indices.map { s =>
      s -> columns.map { case (_, pages) => pages.lift(s) }
    }
    val heightsArr = stripeHeights.toArray
    val rdd = spark.sparkContext
      .parallelize(pagesByStripe, math.max(1, pagesByStripe.size))
      .flatMap { case (s, pageNames) =>
        val zip = new ZipFile(path) // executor-local open (shared FS)
        try {
          val colVals: Seq[Array[String]] = pageNames.map {
            case Some(p) =>
              val in = zip.getInputStream(zip.getEntry(p))
              try readNpy(in.readAllBytes())._1 finally in.close()
            case None => Array.empty[String]
          }
          val h = heightsArr(s)
          (0 until h).map { r =>
            Row.fromSeq(colVals.map(v => if (r < v.length) v(r) else null))
          }.iterator
        } finally zip.close()
      }
    val schema = StructType(names.map(n => StructField(n, StringType, nullable = true)))
    val raw = spark.createDataFrame(rdd, schema)
    val typed = kinds.foldLeft(raw) { case (df, (name, kind)) =>
      if (kind == "string") df
      else df.withColumn(name, org.apache.spark.sql.functions.col(name).cast(kind))
    }
    if (guessDatatypes) graft.functions.TypeInference.applyBestTypes(typed) else typed
  }

  // ---- writer ---------------------------------------------------------

  /** NPY v1 page: magic + padded header dict + little-endian buffer. */
  private def npyBytes(descr: String, n: Int, body: ByteBuffer): Array[Byte] = {
    val dict = s"{'descr': '$descr', 'fortran_order': False, 'shape': ($n,), }"
    // total header (magic 8 + len 2 + dict + pad + \n) must be a multiple of 64
    val unpadded = 10 + dict.length + 1
    val pad = (64 - unpadded % 64) % 64
    val header = dict + (" " * pad) + "\n"
    val out = ByteBuffer.allocate(10 + header.length + body.position())
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(0x93.toByte).put("NUMPY".getBytes(StandardCharsets.US_ASCII))
      .put(1.toByte).put(0.toByte)
      .putShort(header.length.toShort)
      .put(header.getBytes(StandardCharsets.US_ASCII))
    body.flip()
    out.put(body)
    out.array()
  }

  private val NaT = Long.MinValue

  /** One column of collected values → an .npy page. Type mapping follows
    * numpy's own None coercion where the reference would fall back to a
    * pickled object page (which [[readNpy]] rejects): null-bearing ints
    * promote to f8/NaN, null-bearing bools/strings become `<U` pages
    * with the empty string as null; dates/timestamps carry NaT natively.
    */
  private def columnPage(values: Array[Any], dt: org.apache.spark.sql.types.DataType): Array[Byte] = {
    import org.apache.spark.sql.types._
    val n = values.length
    val hasNull = values.exists(_ == null)
    dt match {
      case LongType | IntegerType | ShortType | ByteType if !hasNull =>
        val b = ByteBuffer.allocate(8 * n).order(ByteOrder.LITTLE_ENDIAN)
        values.foreach(v => b.putLong(v.asInstanceOf[Number].longValue))
        npyBytes("<i8", n, b)
      case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType | _: DecimalType =>
        val b = ByteBuffer.allocate(8 * n).order(ByteOrder.LITTLE_ENDIAN)
        values.foreach(v => b.putDouble(
          if (v == null) Double.NaN else v.asInstanceOf[Number].doubleValue))
        npyBytes("<f8", n, b)
      case BooleanType if !hasNull =>
        val b = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
        values.foreach(v => b.put(if (v.asInstanceOf[Boolean]) 1.toByte else 0.toByte))
        npyBytes("|b1", n, b)
      case DateType =>
        val b = ByteBuffer.allocate(8 * n).order(ByteOrder.LITTLE_ENDIAN)
        values.foreach(v => b.putLong(
          if (v == null) NaT else v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay))
        npyBytes("<M8[D]", n, b)
      case TimestampType =>
        val b = ByteBuffer.allocate(8 * n).order(ByteOrder.LITTLE_ENDIAN)
        values.foreach { v =>
          if (v == null) b.putLong(NaT)
          else {
            val t = v.asInstanceOf[java.sql.Timestamp]
            b.putLong(t.getTime * 1000L + (t.getNanos / 1000L) % 1000L)
          }
        }
        npyBytes("<M8[us]", n, b)
      case _ => // strings, null-bearing bools, everything else: fixed-width unicode
        val strs = values.map(v => if (v == null) "" else v.toString)
        val cps = strs.map(s => s.codePoints().toArray)
        val width = math.max(1, cps.map(_.length).maxOption.getOrElse(1))
        val b = ByteBuffer.allocate(4 * width * n).order(ByteOrder.LITTLE_ENDIAN)
        cps.foreach { a =>
          var i = 0
          while (i < width) { b.putInt(if (i < a.length) a(i) else 0); i += 1 }
        }
        npyBytes(s"<U$width", n, b)
    }
  }

  /** `.tpz` writer (base.py:1350-1418): `table.yml` manifest + one `.npy`
    * page per (column, pageSize) chunk, in the reference's layout so a
    * tablite user can `Table.load` the file. Driver-side with a row cap —
    * the reference's save materializes pages the same way; parquet is the
    * scale format here.
    */
  def writeTpz(df: DataFrame, path: String, pageSize: Int = 1000000,
      maxRows: Int = 10000000): Unit = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows, s"writeTpz is a driver-side op capped at $maxRows rows")
    val fields = df.schema.fields
    val zip = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    try {
      val colPages = fields.zipWithIndex.map { case (f, ci) =>
        val values = rows.map(_.get(ci))
        val chunks = if (values.isEmpty) Seq(values) else values.grouped(pageSize).toSeq
        f.name -> chunks.zipWithIndex.map { case (chunk, pi) =>
          s"page_${ci}_$pi.npy" -> columnPage(chunk, f.dataType)
        }
      }
      val yml = "columns:\n" + colPages.map { case (name, pages) =>
        s"  $name:\n    pages: [${pages.map(_._1).mkString(", ")}]"
      }.mkString("\n") + "\n"
      zip.putNextEntry(new java.util.zip.ZipEntry("table.yml"))
      zip.write(yml.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
      colPages.foreach { case (_, pages) =>
        pages.foreach { case (pname, bytes) =>
          zip.putNextEntry(new java.util.zip.ZipEntry(pname))
          zip.write(bytes)
          zip.closeEntry()
        }
      }
    } finally zip.close()
  }
}
