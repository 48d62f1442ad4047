package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-table readers for the reference's three pyexcel-text formats —
  * its readers dict routes the `.simple`, `.rst` and `.mediawiki`
  * suffixes through `excel_reader` (tablite import_utils.py:632-648),
  * i.e. pyexcel with the text plugin. These are interchange renderings
  * (a table drawn as text), parsed driver-side like the other
  * spreadsheet codecs and distributed from the resulting grid.
  *
  *  - `simple`: header line, a dash-run separator, space-aligned rows —
  *    column extents come from the separator's dash runs, so values may
  *    contain single spaces;
  *  - `rst`: reStructuredText simple table — `=`-run separator lines
  *    above the header, below the header and after the body;
  *  - `mediawiki`: `{| … |}` wiki table with `!` header cells and
  *    `|-` row separators.
  */
object TextTables {

  /** Column character spans [start, end) from a separator line's runs
    * of `marker` characters; the final span is open-ended so a last
    * column wider than its separator still captures fully.
    */
  private def spansOf(sep: String, marker: Char): Seq[(Int, Int)] = {
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    while (i < sep.length) {
      if (sep(i) == marker) {
        val start = i
        while (i < sep.length && sep(i) == marker) i += 1
        spans += ((start, i))
      } else i += 1
    }
    spans.toSeq.zipWithIndex.map { case ((s, e), idx) =>
      if (idx == spans.length - 1) (s, Int.MaxValue) else (s, e)
    }
  }

  private def slice(line: String, spans: Seq[(Int, Int)]): Array[String] =
    spans.map { case (s, e) =>
      val v =
        if (s >= line.length) ""
        else line.substring(s, math.min(e, line.length)).trim
      if (v.isEmpty) null else v
    }.toArray

  private[sources] def parseSimple(text: String): Seq[Array[String]] = {
    val lines = text.split("\r?\n").toSeq
    val sepIdx = lines.indexWhere(l =>
      l.trim.nonEmpty && l.trim.forall(c => c == '-' || c == ' ') && l.contains('-'))
    require(sepIdx > 0, "simple table: no dash separator line under a header")
    val spans = spansOf(lines(sepIdx), '-')
    val header = slice(lines(sepIdx - 1), spans)
    val body = lines.drop(sepIdx + 1)
      .filterNot(l => l.trim.isEmpty ||
        (l.trim.forall(c => c == '-' || c == ' ') && l.contains('-')))
      .map(slice(_, spans))
    header +: body
  }

  private[sources] def parseRst(text: String): Seq[Array[String]] = {
    val lines = text.split("\r?\n").toSeq
    def isSep(l: String): Boolean =
      l.trim.nonEmpty && l.trim.forall(c => c == '=' || c == ' ') && l.contains('=')
    val sepIdx = lines.indexWhere(isSep)
    require(sepIdx >= 0, "rst table: no '=' separator line")
    val spans = spansOf(lines(sepIdx), '=')
    lines.drop(sepIdx + 1)
      .filterNot(l => isSep(l) || l.trim.isEmpty)
      .map(slice(_, spans))
  }

  private[sources] def parseMediawiki(text: String): Seq[Array[String]] = {
    val lines = text.split("\r?\n").toSeq
    val rows = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    var cells: scala.collection.mutable.ArrayBuffer[String] = null
    def cellValues(payload: String, sep: String): Seq[String] =
      payload.split(java.util.regex.Pattern.quote(sep), -1).toSeq
        .map(_.trim).map(v => if (v.isEmpty) null else v)
    def flush(): Unit = {
      if (cells != null && cells.nonEmpty) rows += cells.toArray
      cells = scala.collection.mutable.ArrayBuffer.empty
    }
    lines.map(_.trim).foreach {
      case l if l.startsWith("{|") || l.startsWith("|+") => // table open / caption
      case "|}" => flush()
      case "|-" => flush()
      case l if l.startsWith("!") =>
        if (cells == null) cells = scala.collection.mutable.ArrayBuffer.empty
        cells ++= cellValues(l.drop(1), "!!")
      case l if l.startsWith("|") =>
        if (cells == null) cells = scala.collection.mutable.ArrayBuffer.empty
        cells ++= cellValues(l.drop(1), "||")
      case _ =>
    }
    flush()
    rows.toSeq
  }

  /** Shared option surface with the other spreadsheet readers; the grid
    * types through the same inference as csv/xlsx.
    */
  def readTextTable(
      spark: SparkSession,
      path: String,
      format: String,
      firstRowHasHeaders: Boolean = true,
      headerRowIndex: Int = 0,
      skipEmpty: String = "NONE",
      guessDatatypes: Boolean = true,
      start: Int = 0,
      limit: Int = Int.MaxValue,
      columns: Seq[String] = Nil): DataFrame = {
    val parse: String => Seq[Array[String]] = format match {
      case "simple"    => parseSimple
      case "rst"       => parseRst
      case "mediawiki" => parseMediawiki
      case other => throw new IllegalArgumentException(
        s"readTextTable: unknown format '$other' (simple, rst, mediawiki)")
    }
    val grid = parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
    Xlsx.gridToDf(spark, grid, firstRowHasHeaders, headerRowIndex, skipEmpty,
      guessDatatypes, start, limit, columns)
  }

  /** Text-table writers (the rendering direction pyexcel-text actually
    * ships): enough to round-trip our own readers and to export a frame
    * for docs/wikis. Driver-side, row-capped like toHtml.
    */
  def renderSimple(df: DataFrame, maxRows: Int = 100000): String = {
    val rows = df.limit(maxRows).collect()
    val cols = df.columns
    val cells = rows.map(r => cols.indices.map(i =>
      Option(r.get(i)).map(_.toString).getOrElse("")).toArray)
    val widths = cols.indices.map(i =>
      (cols(i).length +: cells.map(_(i).length).toSeq).max.max(1))
    def line(vals: Seq[String]): String =
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString("  ").replaceAll("\\s+$", "")
    (Seq(line(cols.toSeq), widths.map("-" * _).mkString("  ")) ++
      cells.map(c => line(c.toSeq))).mkString("\n") + "\n"
  }

  def renderRst(df: DataFrame, maxRows: Int = 100000): String = {
    val rows = df.limit(maxRows).collect()
    val cols = df.columns
    val cells = rows.map(r => cols.indices.map(i =>
      Option(r.get(i)).map(_.toString).getOrElse("")).toArray)
    val widths = cols.indices.map(i =>
      (cols(i).length +: cells.map(_(i).length).toSeq).max.max(1))
    val sep = widths.map("=" * _).mkString("  ")
    def line(vals: Seq[String]): String =
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString("  ").replaceAll("\\s+$", "")
    (Seq(sep, line(cols.toSeq), sep) ++ cells.map(c => line(c.toSeq)) :+ sep).mkString("\n") + "\n"
  }

  def renderMediawiki(df: DataFrame, maxRows: Int = 100000): String = {
    val rows = df.limit(maxRows).collect()
    val cols = df.columns
    val sb = new StringBuilder("{| class=\"wikitable\"\n")
    sb.append("! ").append(cols.mkString(" !! ")).append('\n')
    rows.foreach { r =>
      sb.append("|-\n| ")
      sb.append(cols.indices.map(i =>
        Option(r.get(i)).map(_.toString).getOrElse("")).mkString(" || "))
      sb.append('\n')
    }
    sb.append("|}\n")
    sb.toString
  }
}
