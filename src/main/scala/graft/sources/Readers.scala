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
object Readers {

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
      multiLine: Boolean = false)          // quoted embedded newlines

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
    // textFile is UTF-8-only; other charsets decode per FILE (one task per
    // file — the parallelism tradeoff for exotic encodings; re-encode to
    // UTF-8 upstream for multi-GB single files)
    val raw: Dataset[String] =
      if (encoding.equalsIgnoreCase("UTF-8")) spark.read.textFile(path)
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

    var df = spark.read
      .option("header", opts.firstRowHasHeaders)
      .option("sep", delimiter)
      .option("quote", opts.textQualifier)
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
