package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** File ingestion with the reference CSV reader's option surface
  * (tablite/core.py:50-218 `from_file`, nimlite text_reader
  * `nimlite/funcs/text_reader/text_reader.nim:144-274`).
  *
  * Spark's csv source does the heavy lifting (partitioned scan, quote/
  * escape handling, schema inference); this layer adds the tablite-only
  * semantics: header_row_index, start/limit row windows, skip_empty
  * ANY/ALL, delimiter/encoding sniffing, and rank-based type guessing
  * (TypeInference) beyond Spark's first-conflict-wins inference.
  */
// Serializable: executor-side closures (the bracket-escape tokenizer)
// call module methods, which captures the module reference
object Readers extends Serializable {

  final case class CsvOptions(
      firstRowHasHeaders: Boolean = true,
      headerRowIndex: Int = 0,
      columns: Seq[String] = Nil,          // subset to import (Nil = all)
      delimiter: Option[String] = None,    // None = sniff
      textQualifier: String = "\"",
      encoding: Option[String] = None,     // None = sniff BOM
      guessDatatypes: Boolean = true,
      stripWhitespace: Boolean = true,
      skipEmpty: String = "NONE",          // NONE | ANY | ALL
      start: Int = 0,                      // data-row window
      limit: Int = Int.MaxValue,
      multiLine: Boolean = false,          // quoted embedded newlines
      sheet: Option[String] = None,        // spreadsheet readers only
      // tablite's bracket-escape variant (core.py:66-67,141-146 —
      // "nail (75 x 4 mm, 3\" x 3/12\")" splits as ONE field when ( )
      // are escapes): delimiters inside opening/closure pairs do not
      // split. Empty = off (the standard qualifier path).
      textEscapeOpenings: String = "",
      textEscapeClosures: String = "")

  /** `get_headers`-style peek (file_reader_utils.py:273-316): first
    * `linecount` parsed rows + the sniffed delimiter.
    */
  def getHeaders(spark: SparkSession, path: String, linecount: Int = 10)
      : (String, Seq[Seq[String]]) = {
    val lines = spark.read.textFile(path).limit(linecount + 5).collect().toSeq
    val delim = sniffDelimiter(lines)
    (delim, lines.take(linecount).map(_.split(java.util.regex.Pattern.quote(delim), -1).toSeq))
  }

  /** Frequency-consistency delimiter sniffing (file_reader_utils.py:114-144):
    * the candidate whose per-line count is highest and most consistent.
    */
  def sniffDelimiter(lines: Seq[String]): String = {
    val candidates = Seq(",", ";", "\t", "|")
    candidates.maxBy { d =>
      val counts = lines.filter(_.nonEmpty).map(_.count(_.toString == d))
      if (counts.isEmpty || counts.max == 0) -1.0
      else counts.min.toDouble // consistent high minimum wins
    }
  }

  /** BOM-based encoding sniff (chardet stand-in — deterministic, covers
    * the encodings in the reference's fixtures: utf-8-sig, utf-16 le/be).
    */
  def sniffEncoding(spark: SparkSession, path: String): String =
    try {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path match { case p if p.startsWith("/") => s"file:$p"; case p => p }),
        spark.sparkContext.hadoopConfiguration)
      var p = new org.apache.hadoop.fs.Path(path)
      if (fs.getFileStatus(p).isDirectory) {
        // directory of part files (a distributed write): sniff the first data file
        p = fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
          .map(_.getPath).headOption.getOrElse(p)
      }
      val in = fs.open(p)
      val bom = new Array[Byte](4)
      val n = in.read(bom)
      in.close()
      if (n >= 3 && bom(0) == 0xEF.toByte && bom(1) == 0xBB.toByte && bom(2) == 0xBF.toByte) "UTF-8"
      else if (n >= 2 && bom(0) == 0xFF.toByte && bom(1) == 0xFE.toByte) "UTF-16LE"
      else if (n >= 2 && bom(0) == 0xFE.toByte && bom(1) == 0xFF.toByte) "UTF-16BE"
      else "UTF-8"
    } catch { case _: Exception => "UTF-8" }

  /** `from_html` (import_utils.py:125-174): scrape the first table's
    * `<tr>` rows, cells from `<th>`/`<td>`; first row = headers, rest =
    * data, types guessed like the CSV path. Driver-side, same as the
    * reference's serial scan. `skipDataRows` drops presentation rows
    * after the header (e.g. the dtype subheader `Writers.toHtml` emits).
    */
  def readHtml(spark: SparkSession, path: String, skipDataRows: Int = 0,
      guessDatatypes: Boolean = true): DataFrame = {
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    def unescape(s: String): String = s
      .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&apos;", "'").replace("&nbsp;", " ")
      .replace("&amp;", "&")
    val rowRe = "(?s)<tr[^>]*>(.*?)</tr>".r
    val cellRe = "(?s)<t[hd][^>]*>(.*?)</t[hd]>".r
    val tagRe = "(?s)<[^>]*>".r
    val grid = rowRe.findAllMatchIn(text).map { m =>
      cellRe.findAllMatchIn(m.group(1))
        .map(c => unescape(tagRe.replaceAllIn(c.group(1), "")).trim)
        .map(v => if (v.isEmpty || v == "None") null else v)
        .toArray
    }.filter(_.nonEmpty).toSeq
    val windowed = grid match {
      case head +: tail => head +: tail.drop(skipDataRows)
      case empty        => empty
    }
    Xlsx.gridToDf(spark, windowed, firstRowHasHeaders = true, headerRowIndex = 0,
      skipEmpty = "NONE", guessDatatypes = guessDatatypes)
  }

  /** The CSV/TSV/TXT reader. Returns string-typed columns unless
    * `guessDatatypes` (then TypeInference casts each column to its
    * best-ranked type).
    */
  def readCsv(spark: SparkSession, path: String, opts: CsvOptions = CsvOptions()): DataFrame = {
    import spark.implicits._
    // quoted embedded newlines can't survive the line-oriented window
    // path (spark.read.text splits records at every newline), so
    // multiLine routes to the direct csv scan. SCALE NOTE: multiLine
    // parsing is per-file single-task (a record may span split
    // boundaries) — keep such inputs in many small files.
    if (opts.multiLine) {
      require(opts.headerRowIndex == 0,
        "multiLine does not compose with header_row_index (line semantics)")
      val delimiter = opts.delimiter.getOrElse(
        sniffDelimiter(spark.read.textFile(path).take(10).toSeq))
      var df = spark.read
        .option("header", opts.firstRowHasHeaders)
        .option("sep", delimiter)
        .option("quote", opts.textQualifier)
        // RFC-4180 / tablite escape a quote by DOUBLING it; Spark's csv
        // default escape is backslash, which mis-splits """x,y""" at the
        // comma (bad_empty.csv golden) — escape = the qualifier restores
        // doubled-quote semantics
        .option("escape", opts.textQualifier)
        .option("multiLine", true)
        .option("encoding", opts.encoding.getOrElse(sniffEncoding(spark, path)))
        .option("ignoreLeadingWhiteSpace", opts.stripWhitespace)
        .option("ignoreTrailingWhiteSpace", opts.stripWhitespace)
        .csv(path)
      if (opts.columns.nonEmpty) df = df.select(opts.columns.map(col): _*)
      if (opts.start > 0) df = df.offset(opts.start)
      if (opts.limit != Int.MaxValue) df = df.limit(opts.limit)
      return if (opts.guessDatatypes)
        graft.functions.TypeInference.applyBestTypes(df) else df
    }
    val encoding = opts.encoding.getOrElse(sniffEncoding(spark, path))
    // textFile is UTF-8-only; splittable charsets (UTF-16 and every
    // single-byte codepage) decode DISTRIBUTED by byte range; only
    // stateful/shift encodings fall back to one task per file
    val raw: Dataset[String] =
      if (encoding.equalsIgnoreCase("UTF-8")) spark.read.textFile(path)
      else if (splittableCharset(encoding))
        decodeTextDistributed(spark, path, encoding)
      else {
        val cs = encoding
        spark.sparkContext.binaryFiles(path).values
          .flatMap { pds =>
            new String(pds.toArray(), java.nio.charset.Charset.forName(cs))
              .stripPrefix("﻿").split("\r?\n", -1).iterator
          }
          .filter(_.nonEmpty)
          .toDS()
      }

    // header_row_index / start / limit are LINE-window semantics
    // (text_reader.nim:162-219): zipWithIndex is exact and preserves
    // partitioning better than a global window
    import spark.implicits._
    val needsWindow = opts.headerRowIndex > 0 || opts.start > 0 || opts.limit != Int.MaxValue
    val windowed: Dataset[String] =
      if (!needsWindow) raw
      else {
        val headerAdj = if (opts.firstRowHasHeaders) 1 else 0
        val from = opts.headerRowIndex
        val dataFrom = from + headerAdj + opts.start
        val dataTo = // exclusive
          if (opts.limit == Int.MaxValue) Long.MaxValue
          else dataFrom.toLong + opts.limit
        raw.rdd.zipWithIndex().flatMap { case (line, ix) =>
          // keep the header line itself + the requested data window
          if ((opts.firstRowHasHeaders && ix == from) ||
              (ix >= dataFrom && ix < dataTo)) Some(line) else None
        }.toDS()
      }

    val delimiter = opts.delimiter.getOrElse(
      sniffDelimiter(windowed.take(10).toSeq))

    var df =
      if (opts.textEscapeOpenings.nonEmpty || opts.textEscapeClosures.nonEmpty)
        bracketEscapedCsv(spark, windowed, delimiter, opts)
      else spark.read
        .option("header", opts.firstRowHasHeaders)
        .option("sep", delimiter)
        .option("quote", opts.textQualifier)
        .option("escape", opts.textQualifier) // doubled-quote escapes (RFC-4180)
        .option("ignoreLeadingWhiteSpace", opts.stripWhitespace)
        .option("ignoreTrailingWhiteSpace", opts.stripWhitespace)
        .csv(windowed)

    if (opts.columns.nonEmpty) df = df.select(opts.columns.map(col): _*)

    df = opts.skipEmpty.toUpperCase match {
      // qcol: raw headers may contain dots (sap.txt "SOrg.")
      case "ANY" => df.filter(!df.columns.map(c =>
        graft.functions.TypeInference.qcol(c).isNull).reduce(_ || _))
      case "ALL" => df.filter(!df.columns.map(c =>
        graft.functions.TypeInference.qcol(c).isNull).reduce(_ && _))
      case _     => df
    }

    if (opts.guessDatatypes) graft.functions.TypeInference.applyBestTypes(df) else df
  }

  /** One line → fields under tablite's bracket-escape dialect: a
    * delimiter inside an UNQUOTED opening/closure pair does not split
    * (the "(75 x 4 mm, 3-inch)" case), quoted regions behave like the
    * standard path (qualifier toggles, doubled qualifier = literal),
    * and bracket depth is only tracked OUTSIDE quotes. Depth floors at
    * zero so an unbalanced closure degrades to a plain character
    * rather than poisoning the rest of the line.
    */
  private[graft] def splitBracketEscaped(
      line: String, delimiter: Char, qualifier: Char,
      openings: String, closures: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder()
    var inQuote = false
    var depth = 0
    var i = 0
    val n = line.length
    while (i < n) {
      val c = line.charAt(i)
      if (inQuote) {
        if (c == qualifier) {
          if (i + 1 < n && line.charAt(i + 1) == qualifier) { cur.append(qualifier); i += 1 }
          else inQuote = false
        } else cur.append(c)
      } else if (c == qualifier && depth == 0) {
        inQuote = true
      } else if (openings.indexOf(c.toInt) >= 0) {
        depth += 1; cur.append(c)
      } else if (closures.indexOf(c.toInt) >= 0) {
        if (depth > 0) depth -= 1
        cur.append(c)
      } else if (c == delimiter && depth == 0) {
        out += cur.toString; cur.setLength(0)
      } else cur.append(c)
      i += 1
    }
    out += cur.toString
    out.toArray
  }

  /** The bracket-escape CSV branch: a distributed per-line tokenize
    * (the standard path hands line-splitting to Spark's csv parser,
    * which has no bracket dialect). Same downstream surface: header
    * from row 0 or synthesized `_N`, short rows null-padded, empty
    * unquoted fields null like Spark's csv reader.
    */
  private def bracketEscapedCsv(
      spark: SparkSession, lines: Dataset[String], delimiter: String,
      opts: CsvOptions): DataFrame = {
    require(delimiter.length == 1,
      s"text escape brackets need a single-char delimiter, got '$delimiter'")
    require(!opts.textEscapeOpenings.contains(opts.textQualifier) &&
      !opts.textEscapeClosures.contains(opts.textQualifier),
      "text qualifier must not appear in escape openings/closures")
    val delim = delimiter.charAt(0)
    val qual = if (opts.textQualifier.isEmpty) ' ' else opts.textQualifier.charAt(0)
    val openings = opts.textEscapeOpenings
    val closures = opts.textEscapeClosures
    val strip = opts.stripWhitespace
    def tokenize(line: String): Array[String] =
      splitBracketEscaped(line, delim, qual, openings, closures)
        .map(t => if (strip) t.trim else t)
        .map(t => if (t.isEmpty) null else t)
    val indexed = lines.rdd.zipWithIndex()
    val headTokens = tokenize(
      indexed.filter(_._2 == 0L).map(_._1).first())
    val headers: Seq[String] =
      if (opts.firstRowHasHeaders) headTokens.toSeq
      else headTokens.indices.map(i => s"_$i")
    val width = headers.length
    val dataRows = indexed
      .filter { case (_, ix) => !(opts.firstRowHasHeaders && ix == 0L) }
      .map { case (line, _) =>
        val t = tokenize(line)
        org.apache.spark.sql.Row.fromSeq(
          (0 until width).map(i => if (i < t.length) t(i) else null))
      }
    spark.createDataFrame(dataRows,
      org.apache.spark.sql.types.StructType(headers.map(h =>
        org.apache.spark.sql.types.StructField(h,
          org.apache.spark.sql.types.StringType, nullable = true))))
  }

  /** A charset whose byte stream can be SPLIT at newline boundaries
    * without decoder state: every single-byte codepage (each byte is one
    * char — 0x0A is always '\n'), and UTF-16LE/BE (code units are
    * 2 bytes and '\n' = U+000A cannot be half a surrogate pair —
    * surrogate code units live in D800–DFFF — so a 0x0A/0x00 unit at an
    * even offset IS a newline). Stateful/shift encodings (ISO-2022,
    * UTF-7) and unmarked multi-byte DBCS stay on the per-file path.
    */
  private[sources] def splittableCharset(name: String): Boolean = {
    val up = name.toUpperCase
    if (up == "UTF-16LE" || up == "UTF-16BE" || up == "UTF-16") true
    else
      try {
        val cs = java.nio.charset.Charset.forName(name)
        cs.canEncode && cs.newEncoder().maxBytesPerChar() == 1.0f
      } catch { case _: Exception => false }
  }

  /** Distributed line decode for non-UTF-8 text: files are split into
    * `splitBytes` byte ranges (the 10 GB UTF-16 export that used to
    * serialize on one core now decodes on every executor), each task
    * aligns itself to the charset's code-unit grid and to record
    * boundaries with the classic split contract — a task owns every
    * line that STARTS inside its range, skipping to the first newline
    * when it doesn't start the file and reading past its end until the
    * line it began closes. Works on any Hadoop filesystem.
    */
  private[sources] def decodeTextDistributed(
      spark: SparkSession, path: String, charset: String,
      splitBytes: Long = 32L << 20): Dataset[String] = {
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    val uri = new java.net.URI(
      path match { case p if p.startsWith("/") => s"file:$p"; case p => p })
    val fs = org.apache.hadoop.fs.FileSystem.get(uri, hconf)
    val root = new org.apache.hadoop.fs.Path(path)
    val files: Seq[(String, Long)] = {
      val st = fs.globStatus(root) match {
        case null => Array(fs.getFileStatus(root))
        case gs   => gs
      }
      st.flatMap { s =>
        if (s.isDirectory)
          fs.listStatus(s.getPath)
            .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
              && !f.getPath.getName.startsWith("."))
        else Array(s)
      }.map(s => (s.getPath.toString, s.getLen)).toSeq
    }
    // "UTF-16" (endianness from BOM) must be pinned to LE/BE up front:
    // chunks past the first have no BOM, and the bare UTF-16 decoder
    // would default them to BE — silently mis-decoding an LE file's
    // tail. The BOM lives in the file; read it once.
    val unitSize = charset.toUpperCase match {
      case "UTF-16" | "UTF-16LE" | "UTF-16BE" => 2
      case _                                  => 1
    }
    val cs0 = charset.toUpperCase match {
      case "UTF-16" =>
        val in = fs.open(new org.apache.hadoop.fs.Path(files.head._1))
        val bom = new Array[Byte](2)
        val n = in.read(bom); in.close()
        if (n >= 2 && bom(0) == 0xFF.toByte && bom(1) == 0xFE.toByte) "UTF-16LE"
        else "UTF-16BE" // BOM-less UTF-16 is big-endian per the standard
      case other => other
    }
    val le = cs0.equalsIgnoreCase("UTF-16LE")
    val splits: Seq[(String, Long, Long, Long)] = files.flatMap { case (f, len) =>
      val n = math.max(1L, (len + splitBytes - 1) / splitBytes)
      (0L until n).map { i =>
        // align to the code-unit grid (BOM is one unit, so the grid is
        // offset-0-anchored either way)
        val s = (i * splitBytes) / unitSize * unitSize
        val e = if (i == n - 1) len else ((i + 1) * splitBytes) / unitSize * unitSize
        (f, s, e, len)
      }.filter { case (_, s, e, _) => s < e }
    }
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(hconf))
    spark.sparkContext.parallelize(splits, math.max(splits.size, 1))
      .flatMap { case (file, start, end, fileLen) =>
        val p = new org.apache.hadoop.fs.Path(file)
        val tfs = p.getFileSystem(confBc.value.value)
        val in = tfs.open(p)
        try {
          def isNl(b0: Byte, b1: Byte): Boolean =
            if (unitSize == 1) b0 == 0x0A
            else if (le) b0 == 0x0A && b1 == 0x00
            else b0 == 0x00 && b1 == 0x0A
          // read [start, end) plus overshoot to the newline that closes
          // the last line this split started (bounded only by EOF; a
          // pathological newline-free tail costs one task its memory,
          // same as the per-file path would)
          val base = (end - start).toInt
          var buf = new Array[Byte](base + (64 << 10))
          in.seek(start)
          in.readFully(start, buf, 0, base)
          var have = base
          var stop = -1
          // find the first newline at-or-after `end` (scanning the grid)
          var i = 0
          while (stop < 0 && start + have < fileLen) {
            // extend until a newline shows up past `end`
            val want = math.min(fileLen - start, have.toLong + (1 << 20)).toInt
            if (want > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(want, buf.length * 2))
            in.readFully(start + have, buf, have, want - have)
            i = base
            while (i + unitSize <= want && stop < 0) {
              if (isNl(buf(i), if (unitSize == 2) buf(i + 1) else 0)) stop = i + unitSize
              i += unitSize
            }
            have = want
          }
          if (stop < 0) {
            // no newline past end before EOF — take everything to EOF;
            // also scan the tail of [start,end) itself below
            stop = have
          }
          // a split that doesn't start its file begins at the first
          // newline INSIDE it; if none, every line here started in an
          // earlier split — emit nothing
          var begin = 0
          if (start > 0) {
            begin = -1
            var j = 0
            while (j + unitSize <= stop && begin < 0) {
              if (isNl(buf(j), if (unitSize == 2) buf(j + 1) else 0)) begin = j + unitSize
              j += unitSize
            }
            // the newline must be within OUR range — one at/after `end`
            // closes a line owned by a predecessor
            if (begin < 0 || begin > base) begin = -1
          }
          if (begin < 0) Iterator.empty
          else {
            val text = new String(buf, begin, stop - begin,
              java.nio.charset.Charset.forName(cs0))
            val noBom = if (start == 0 && begin == 0) text.stripPrefix("﻿") else text
            noBom.split("\r?\n", -1).iterator
              .map(l => if (l.endsWith("\r")) l.dropRight(1) else l)
              .filter(_.nonEmpty)
          }
        } finally in.close()
      }
      .toDS()
  }

  /** Distributed JSONL / NDJSON read — the scale path for JSON ingest
    * (one object per line; files split by line across executors, so a
    * 100 TB corpus reads with full parallelism — unlike the reference's
    * driver-side envelope, import_utils.py:112-122). With `schema`
    * provided the scan is single-pass; otherwise Spark runs its
    * inference pass first (2 reads). PERMISSIVE mode: a malformed line
    * never fails the scan. Note Spark's contract here: corrupt lines
    * surface in `_corrupt_record` only when that column is IN the
    * schema — with a plain user schema, fields parsed before the error
    * survive and the rest silently go null. Pass `keepCorrupt = true`
    * to get the audit column appended explicitly.
    */
  def readJsonl(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType = null,
      guessDatatypes: Boolean = false,
      keepCorrupt: Boolean = false): DataFrame = {
    val reader = spark.read.option("mode", "PERMISSIVE")
    val effSchema =
      if (schema != null && keepCorrupt && !schema.fieldNames.contains("_corrupt_record"))
        schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
      else schema
    val df = (if (effSchema != null) reader.schema(effSchema) else reader).json(path)
    if (guessDatatypes) graft.functions.TypeInference.applyBestTypes(df) else df
  }

  /** `.json` dispatch: sniff the head for the reference's columnar
    * envelope (`{"columns": {...}, "total_rows": n}`); anything else is
    * treated as JSONL. The envelope may be compact or pretty-printed
    * and its keys may come in either order, so the test is structural,
    * not a fixed prefix: a first line that is just `{` cannot be JSONL
    * (every JSONL line is a complete object), and a one-line document
    * carrying BOTH `"columns"` and `"total_rows"` keys is the compact
    * envelope in either key order.
    */
  def readJsonAuto(spark: SparkSession, path: String): DataFrame = {
    val head = spark.read.textFile(path).limit(1).collect().headOption.getOrElse("")
    val compact = head.replaceAll("\\s", "")
    val isEnvelope =
      compact == "{" || // pretty-printed JSON document, never a JSONL line
      (compact.startsWith("{") &&
        compact.contains("\"columns\":") && compact.contains("\"total_rows\":"))
    if (isEnvelope) {
      // the envelope codec is driver-side with a byte cap; on a
      // compressed file the cap would measure COMPRESSED bytes while
      // the driver materializes the decompressed text (20-100× for
      // repetitive JSON) — the exact OOM the cap exists to prevent
      if (path.toLowerCase.endsWith(".gz"))
        throw new IllegalArgumentException(
          s"compressed columnar-envelope JSON unsupported ($path): the driver-side " +
            "byte cap cannot see the decompressed size — decompress first " +
            "(JSONL .gz streams fine)")
      readColumnarJson(spark, path)
    } else readJsonl(spark, path)
  }

  /** tablite's column-oriented JSON envelope
    * (`{"columns": {name: [values]}, "total_rows": n}`,
    * import_utils.py:112-122) — a compat codec, driver-side by design.
    * Guarded like the other driver-side codecs (`transpose`/`toSql`'s
    * maxRows): the whole envelope is collected to the driver, so the
    * input size is capped (`maxBytes`, default 256 MB) with a clear
    * error instead of a driver OOM.
    */
  def readColumnarJson(spark: SparkSession, path: String,
      maxBytes: Long = 256L << 20): DataFrame = {
    val sizes = spark.read.format("binaryFile").load(path)
      .select("length").collect().map(_.getLong(0))
    val total = sizes.sum
    require(total <= maxBytes,
      s"columnar JSON at $path is $total bytes > cap $maxBytes: the " +
        "envelope is a driver-side compat codec; for data this large " +
        "use parquet/csv, or raise maxBytes explicitly")
    val text = spark.read.textFile(path).collect().mkString("\n")
    val parsed = spark.read.json(spark.createDataset(Seq(text))(
      org.apache.spark.sql.Encoders.STRING))
    // columns struct -> per-field arrays -> zip into rows via posexplode
    val colNames = parsed.select("columns.*").columns
    val exploded = parsed.select(posexplode(col(s"columns.${colNames.head}")).as(Seq("__i", colNames.head)))
    colNames.tail.foldLeft(exploded) { (acc, c) =>
      acc.join(parsed.select(posexplode(col(s"columns.$c")).as(Seq("__i", c))), Seq("__i"))
    }.drop("__i")
  }
}
