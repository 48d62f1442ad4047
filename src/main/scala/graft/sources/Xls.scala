package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Legacy Excel 97-2003 `.xls` reader: BIFF8 records inside an OLE2
  * compound-file (CFB) container, pure JDK — a clean-room implementation
  * from the public MS-CFB / MS-XLS specifications. The reference
  * dispatches `.xls`/`.xlsm` alongside `.xlsx` (tablite
  * import_utils.py:633-650, core.py:50-218); `.xlsm` is zip/XML like
  * xlsx and routes through [[Xlsx.readXlsx]], so this file only covers
  * the binary BIFF8 generation.
  *
  * Like the xlsx/ods readers this parses driver-side: spreadsheets are
  * interchange files (bounded by Excel's 1,048,576-row ceiling), not
  * scale inputs; the resulting DataFrame distributes from there.
  *
  * Supported records: SST/CONTINUE (with the per-CONTINUE grbit rule for
  * strings split across records), LABELSST, LABEL, NUMBER, RK, MULRK,
  * BOOLERR, FORMULA cached results (+ STRING), BLANK/MULBLANK,
  * BOUNDSHEET, FORMAT/XF for serial-date detection (builtin ids + custom
  * y/m/d/h/s token sniffing, matching the xlsx reader's rules).
  */
object Xls {

  // ---- OLE2 / CFB container -----------------------------------------

  private final val EndOfChain = 0xFFFFFFFE
  private final val FreeSect = 0xFFFFFFFF

  private class Cfb(bytes: Array[Byte]) {
    require(bytes.length >= 512 &&
      (bytes(0) & 0xFF) == 0xD0 && (bytes(1) & 0xFF) == 0xCF &&
      (bytes(2) & 0xFF) == 0x11 && (bytes(3) & 0xFF) == 0xE0,
      "not an OLE2 compound file (bad magic)")

    private def u16(off: Int): Int = (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8)
    private def i32(off: Int): Int =
      (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8) |
      ((bytes(off + 2) & 0xFF) << 16) | ((bytes(off + 3) & 0xFF) << 24)

    val sectorSize: Int = 1 << u16(30)
    val miniSectorSize: Int = 1 << u16(32)
    val miniCutoff: Int = i32(56)
    private val firstDirSector = i32(48)
    private val firstMiniFatSector = i32(60)
    private val numMiniFatSectors = i32(64)
    private val firstDifatSector = i32(68)
    private val numDifatSectors = i32(72)

    private def sectorOff(sid: Int): Int = (sid + 1) * sectorSize

    // FAT sector list: 109 header DIFAT entries + chained DIFAT sectors
    private val fat: Array[Int] = {
      val fatSectors = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < 109) {
        val s = i32(76 + i * 4)
        if (s != FreeSect && s != EndOfChain) fatSectors += s
        i += 1
      }
      var difat = firstDifatSector
      var guard = 0
      while (difat != EndOfChain && difat != FreeSect && guard <= numDifatSectors) {
        val base = sectorOff(difat)
        val perSector = sectorSize / 4 - 1
        var j = 0
        while (j < perSector) {
          val s = i32(base + j * 4)
          if (s != FreeSect && s != EndOfChain) fatSectors += s
          j += 1
        }
        difat = i32(base + perSector * 4)
        guard += 1
      }
      val entries = new Array[Int](fatSectors.length * (sectorSize / 4))
      var k = 0
      fatSectors.foreach { fs =>
        val base = sectorOff(fs)
        var j = 0
        while (j < sectorSize / 4) { entries(k) = i32(base + j * 4); j += 1; k += 1 }
      }
      entries
    }

    private def chainBytes(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var sid = start
      var guard = 0
      val maxSectors = bytes.length / sectorSize + 2
      while (sid != EndOfChain && sid != FreeSect && guard < maxSectors) {
        val off = sectorOff(sid)
        out.write(bytes, off, math.min(sectorSize, bytes.length - off))
        sid = fat(sid)
        guard += 1
      }
      val all = out.toByteArray
      if (size >= 0 && size < all.length) java.util.Arrays.copyOf(all, size.toInt) else all
    }

    // directory entries: (name, objType, startSector, size)
    private val dirEntries: Seq[(String, Int, Int, Long)] = {
      val dir = chainBytes(firstDirSector, -1L)
      (0 until dir.length / 128).map { e =>
        val base = e * 128
        val nameLen = (dir(base + 64) & 0xFF) | ((dir(base + 65) & 0xFF) << 8)
        val name = if (nameLen >= 2)
          new String(dir, base, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
        else ""
        val objType = dir(base + 66) & 0xFF
        val start = (dir(base + 116) & 0xFF) | ((dir(base + 117) & 0xFF) << 8) |
          ((dir(base + 118) & 0xFF) << 16) | ((dir(base + 119) & 0xFF) << 24)
        val size = (0 until 8).map(i => (dir(base + 120 + i) & 0xFFL) << (8 * i)).sum
        (name, objType, start, size)
      }
    }

    private lazy val miniFat: Array[Int] = {
      val mf = chainBytes(firstMiniFatSector, numMiniFatSectors.toLong * sectorSize)
      Array.tabulate(mf.length / 4)(i =>
        (mf(i * 4) & 0xFF) | ((mf(i * 4 + 1) & 0xFF) << 8) |
        ((mf(i * 4 + 2) & 0xFF) << 16) | ((mf(i * 4 + 3) & 0xFF) << 24))
    }

    private lazy val miniStream: Array[Byte] = {
      val root = dirEntries.find(_._2 == 5).getOrElse(
        throw new IllegalArgumentException("CFB: no root directory entry"))
      chainBytes(root._3, root._4)
    }

    def stream(names: Seq[String]): Option[Array[Byte]] =
      dirEntries.find(e => e._2 == 2 && names.contains(e._1)).map { case (_, _, start, size) =>
        if (size >= miniCutoff) chainBytes(start, size)
        else {
          // mini-FAT chain over the root's mini stream (64-byte sectors)
          val out = new java.io.ByteArrayOutputStream()
          var sid = start
          var guard = 0
          while (sid != EndOfChain && sid != FreeSect && guard < miniFat.length + 2) {
            val off = sid * miniSectorSize
            out.write(miniStream, off, math.min(miniSectorSize, miniStream.length - off))
            sid = if (sid < miniFat.length) miniFat(sid) else EndOfChain
            guard += 1
          }
          val all = out.toByteArray
          if (size < all.length) java.util.Arrays.copyOf(all, size.toInt) else all
        }
      }
  }

  // ---- BIFF8 record stream ------------------------------------------

  private def u16(b: Array[Byte], off: Int): Int = (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) | ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def f64(b: Array[Byte], off: Int): Double = {
    var bits = 0L
    var i = 7
    while (i >= 0) { bits = (bits << 8) | (b(off + i) & 0xFFL); i -= 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  /** RK number: 30-bit payload, bit0 = ÷100, bit1 = integer-vs-float. */
  private def rkValue(rk: Int): Double = {
    val base =
      if ((rk & 2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) base / 100.0 else base
  }

  private case class Record(id: Int, data: Array[Byte])

  private def records(stream: Array[Byte], from: Int): Iterator[Record] = new Iterator[Record] {
    private var pos = from
    def hasNext: Boolean = pos + 4 <= stream.length
    def next(): Record = {
      val id = u16(stream, pos)
      val len = u16(stream, pos + 2)
      val data = java.util.Arrays.copyOfRange(stream, pos + 4, math.min(pos + 4 + len, stream.length))
      pos += 4 + len
      Record(id, data)
    }
  }

  /** Cursor over the SST record's data followed by its CONTINUE records'
    * data. Strings may split across the record boundary — at character
    * granularity only, and each CONTINUE restarts with a fresh grbit
    * byte that re-declares the compression of the REMAINDER of the
    * in-flight string (MS-XLS 2.5.293).
    */
  private class SegCursor(segs: Array[Array[Byte]]) {
    private var si = 0
    private var off = 0
    private def seg = segs(si)
    private def ensure(): Unit = {
      while (off >= seg.length && si < segs.length - 1) { si += 1; off = 0 }
    }
    def hasMore: Boolean = { ensure(); off < seg.length }
    def atSegBoundary: Boolean = { ensure(); off == 0 && si > 0 }
    def u8(): Int = { ensure(); val v = seg(off) & 0xFF; off += 1; v }
    def u16v(): Int = u8() | (u8() << 8)
    def i32v(): Int = u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)
    def skip(n: Int): Unit = { var i = 0; while (i < n) { u8(); i += 1 } }

    /** XLUnicodeRichExtendedString (the SST entry form). */
    def readString(): String = {
      val cch = u16v()
      val flags = u8()
      var high = (flags & 1) != 0
      val rich = (flags & 8) != 0
      val ext = (flags & 4) != 0
      val cRun = if (rich) u16v() else 0
      val cbExt = if (ext) i32v() else 0
      val sb = new java.lang.StringBuilder(cch)
      var remaining = cch
      while (remaining > 0) {
        ensure()
        if (atSegBoundary) high = (u8() & 1) != 0 // fresh grbit after CONTINUE split
        val c = if (high) (u8() | (u8() << 8)).toChar else u8().toChar
        sb.append(c)
        remaining -= 1
      }
      skip(cRun * 4)
      skip(cbExt)
      sb.toString
    }
  }

  /** Short string (BOUNDSHEET sheet name): u8 length + grbit + chars. */
  private def shortString(b: Array[Byte], off: Int): String = {
    val cch = b(off) & 0xFF
    val high = (b(off + 1) & 1) != 0
    if (high) new String(b, off + 2, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
    else new String(b, off + 2, cch, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** Long string inline in a record (LABEL, FORMAT, STRING). */
  private def longString(b: Array[Byte], off: Int): String = {
    val cch = u16(b, off)
    val high = (b(off + 2) & 1) != 0
    // clamp to the record's actual payload: a >8224-byte inline string
    // spills into a CONTINUE record this path does not stitch (only the
    // SST path does) — better a truncated cell than an
    // IndexOutOfBounds crash on a legitimate file
    val want = if (high) cch * 2 else cch
    val len = math.min(want, b.length - (off + 3))
    if (high) new String(b, off + 3, len - (len % 2), java.nio.charset.StandardCharsets.UTF_16LE)
    else new String(b, off + 3, len, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  // ---- the reader ----------------------------------------------------

  private case class Globals(
      sst: IndexedSeq[String],
      sheets: Seq[(String, Int)],           // name -> BOF offset
      xfKind: IndexedSeq[Int])              // xf index -> 0/1/2 (like dateStyles)

  private def parseGlobals(wb: Array[Byte]): Globals = {
    val sst = scala.collection.mutable.ArrayBuffer.empty[String]
    val sheets = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    val formats = scala.collection.mutable.Map.empty[Int, Int] // ifmt -> kind
    val xfFmts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val it = records(wb, 0)
    val pending = scala.collection.mutable.ArrayBuffer.empty[Record]
    var collectingSst = false
    def flushSst(): Unit = if (pending.nonEmpty) {
      val cur = new SegCursor(pending.map(_.data).toArray)
      cur.i32v() // total refs
      val unique = cur.i32v()
      var i = 0
      while (i < unique && cur.hasMore) { sst += cur.readString(); i += 1 }
      pending.clear()
    }
    var depth = 0
    while (it.hasNext) {
      val r = it.next()
      if (collectingSst && r.id != 0x003C) { collectingSst = false; flushSst() }
      r.id match {
        case 0x0809 => depth += 1           // BOF (globals, then each sheet)
        case 0x000A => depth -= 1; if (depth <= 0) return Globals(sst.toIndexedSeq, sheets.toSeq, xfFmts.map(f =>
          if (Xlsx.builtinDateOnly(f)) 1
          else if (Xlsx.builtinDateTime(f)) 2
          else formats.getOrElse(f, 0)).toIndexedSeq)
        case 0x00FC => pending += r; collectingSst = true   // SST
        case 0x003C if collectingSst => pending += r        // CONTINUE
        case 0x0085 =>                       // BOUNDSHEET
          sheets += shortString(r.data, 6) -> i32(r.data, 0)
        case 0x041E =>                       // FORMAT
          val ifmt = u16(r.data, 0)
          val code = longString(r.data, 2)
          val bare = code.replaceAll("\"[^\"]*\"", "").replaceAll("\\[[^\\]]*\\]", "")
          val hasDate = bare.exists(c => "ymd".contains(c.toLower))
          val hasTime = bare.exists(c => "hs".contains(c.toLower))
          if (hasTime) formats(ifmt) = 2 else if (hasDate) formats(ifmt) = 1
        case 0x00E0 =>                       // XF
          xfFmts += u16(r.data, 2)
        case _ =>
      }
    }
    flushSst()
    Globals(sst.toIndexedSeq, sheets.toSeq, xfFmts.map(f =>
      if (Xlsx.builtinDateOnly(f)) 1
      else if (Xlsx.builtinDateTime(f)) 2
      else formats.getOrElse(f, 0)).toIndexedSeq)
  }

  private def parseSheet(wb: Array[Byte], bofOff: Int, g: Globals): Seq[Array[String]] = {
    val cells = scala.collection.mutable.Map.empty[(Int, Int), String]
    def kind(ixfe: Int): Int = if (ixfe >= 0 && ixfe < g.xfKind.length) g.xfKind(ixfe) else 0
    def putNum(row: Int, c: Int, ixfe: Int, v: Double): Unit =
      cells((row, c)) =
        if (kind(ixfe) > 0) Xlsx.serialToIso(v, kind(ixfe))
        else Xlsx.numToString(if (v == math.rint(v) && math.abs(v) < 1e15) math.round(v).toString else v.toString)
    val it = records(wb, bofOff)
    var depth = 0
    var pendingStringCell: (Int, Int) = null
    var started = false
    while (it.hasNext) {
      val r = it.next()
      r.id match {
        case 0x0809 => depth += 1; started = true
        case 0x000A => depth -= 1; if (started && depth <= 0) return toGrid(cells)
        case 0x00FD => // LABELSST
          val isst = i32(r.data, 6)
          if (isst >= 0 && isst < g.sst.length)
            cells((u16(r.data, 0), u16(r.data, 2))) = g.sst(isst)
        case 0x0204 => // LABEL (inline string, pre-SST producers)
          cells((u16(r.data, 0), u16(r.data, 2))) = longString(r.data, 6)
        case 0x0203 => // NUMBER
          putNum(u16(r.data, 0), u16(r.data, 2), u16(r.data, 4), f64(r.data, 6))
        case 0x027E => // RK
          putNum(u16(r.data, 0), u16(r.data, 2), u16(r.data, 4), rkValue(i32(r.data, 6)))
        case 0x00BD => // MULRK: rw, colFirst, (ixfe+rk)*, colLast
          val row = u16(r.data, 0)
          val colFirst = u16(r.data, 2)
          val n = (r.data.length - 6) / 6
          var i = 0
          while (i < n) {
            putNum(row, colFirst + i, u16(r.data, 4 + i * 6), rkValue(i32(r.data, 6 + i * 6)))
            i += 1
          }
        case 0x0205 => // BOOLERR: rw, col, ixfe, bBoolErr, fError
          val isBool = (r.data(7) & 0xFF) == 0
          if (isBool)
            cells((u16(r.data, 0), u16(r.data, 2))) = if (r.data(6) != 0) "true" else "false"
        case 0x0006 => // FORMULA: cached result in bytes 6..13
          val row = u16(r.data, 0); val c = u16(r.data, 2); val ixfe = u16(r.data, 4)
          if (u16(r.data, 12) == 0xFFFF) {
            (r.data(6) & 0xFF) match {
              case 0 => pendingStringCell = (row, c)   // value in next STRING record
              case 1 => cells((row, c)) = if (r.data(8) != 0) "true" else "false"
              case _ =>                                // error / empty string
            }
          } else putNum(row, c, ixfe, f64(r.data, 6))
        case 0x0207 if pendingStringCell != null => // STRING (formula result)
          cells(pendingStringCell) = longString(r.data, 0)
          pendingStringCell = null
        case _ => // BLANK/MULBLANK/ROW/DIMENSIONS etc: no value
      }
    }
    toGrid(cells)
  }

  private def toGrid(cells: scala.collection.mutable.Map[(Int, Int), String]): Seq[Array[String]] = {
    if (cells.isEmpty) return Seq.empty
    val maxRow = cells.keys.map(_._1).max
    val width = cells.keys.map(_._2).max + 1
    // single placement pass — a per-row rescan of the cell map is
    // O(rows × cells) and melts down on big sheets
    val grid = Array.fill(maxRow + 1)(new Array[String](width))
    cells.foreach { case ((rr, cc), v) => grid(rr)(cc) = v }
    grid.toSeq
  }

  def sheetNames(path: String): Seq[String] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val wb = new Cfb(bytes).stream(Seq("Workbook", "Book")).getOrElse(
      throw new IllegalArgumentException(s"no Workbook stream in $path"))
    parseGlobals(wb).sheets.map(_._1)
  }

  /** The reader — same option surface as [[Xlsx.readXlsx]]; shares its
    * grid→typed-DataFrame plumbing so xls infers exactly like xlsx/csv.
    */
  def readXls(
      spark: SparkSession,
      path: String,
      sheet: Option[String] = None,
      firstRowHasHeaders: Boolean = true,
      headerRowIndex: Int = 0,
      skipEmpty: String = "NONE",
      guessDatatypes: Boolean = true,
      start: Int = 0,
      limit: Int = Int.MaxValue,
      columns: Seq[String] = Nil): DataFrame = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val wb = new Cfb(bytes).stream(Seq("Workbook", "Book")).getOrElse(
      throw new IllegalArgumentException(s"no Workbook stream in $path"))
    val g = parseGlobals(wb)
    require(g.sheets.nonEmpty, s"no sheets in $path")
    val bof = sheet match {
      case Some(name) => g.sheets.find(_._1 == name).getOrElse(
        throw new IllegalArgumentException(
          s"sheet '$name' not found; have ${g.sheets.map(_._1).mkString(", ")}"))._2
      case None => g.sheets.head._2
    }
    val grid = parseSheet(wb, bof, g)
    Xlsx.gridToDf(spark, grid, firstRowHasHeaders, headerRowIndex, skipEmpty, guessDatatypes,
      start, limit, columns)
  }

  // ---- the writer -----------------------------------------------------

  /** Little-endian record/stream builder. */
  private final class Buf {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def i32(v: Int): Unit = { u16(v); u16(v >> 16) }
    def f64(v: Double): Unit = {
      var bits = java.lang.Double.doubleToLongBits(v)
      var i = 0
      while (i < 8) { u8((bits & 0xFF).toInt); bits >>= 8; i += 1 }
    }
    def bytes(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    def size: Int = out.size()
    def toArray: Array[Byte] = out.toByteArray
  }

  private def record(id: Int, body: Buf => Unit): Array[Byte] = {
    val b = new Buf
    body(b)
    val data = b.toArray
    require(data.length <= 8224, s"BIFF record 0x${id.toHexString} over 8224 bytes")
    val r = new Buf
    r.u16(id); r.u16(data.length); r.bytes(data)
    r.toArray
  }

  private def bof(dt: Int): Array[Byte] = record(0x0809, b => {
    b.u16(0x0600); b.u16(dt); b.u16(0x0DBB); b.u16(0x07CC); b.i32(0); b.i32(0)
  })
  private val eofRec: Array[Byte] = record(0x000A, _ => ())

  /** SST + CONTINUE encoder. Strings are XLUnicodeRichExtendedStrings
    * (no rich/ext runs); a string whose header would not fit with at
    * least its first character starts a fresh CONTINUE, and a string
    * split mid-characters re-declares its grbit at the CONTINUE start —
    * the MS-XLS 2.5.293 rule [[SegCursor.readString]] decodes.
    */
  private def sstRecords(strings: IndexedSeq[String], totalRefs: Int): Array[Byte] = {
    val MaxData = 8224
    val recs = new Buf
    var cur = new Buf
    var first = true
    def flush(): Unit = {
      val data = cur.toArray
      val r = new Buf
      r.u16(if (first) 0x00FC else 0x003C); r.u16(data.length); r.bytes(data)
      recs.bytes(r.toArray)
      first = false
      cur = new Buf
    }
    cur.i32(totalRefs)
    cur.i32(strings.length)
    strings.foreach { s =>
      val high = s.exists(_ > 0xFF)
      val chw = if (high) 2 else 1
      require(s.length <= 0xFFFF, s"xls string over 65535 chars (${s.length})")
      // header (cch + grbit) plus the first char must share a segment:
      // the reader's fresh-grbit rule fires only inside the char loop
      if (cur.size + 3 + chw > MaxData) flush()
      cur.u16(s.length)
      cur.u8(if (high) 1 else 0)
      var i = 0
      while (i < s.length) {
        if (cur.size + chw > MaxData) {
          flush()
          cur.u8(if (high) 1 else 0) // fresh grbit for the remainder
        }
        val c = s.charAt(i)
        if (high) { cur.u8(c & 0xFF); cur.u8((c >> 8) & 0xFF) } else cur.u8(c & 0xFF)
        i += 1
      }
    }
    flush()
    recs.toArray
  }

  /** Pure-JDK BIFF8 `.xls` writer — the binary sibling of
    * [[Xlsx.writeXlsx]] with the same cell conventions (header row as
    * strings, numerics as NUMBER doubles, booleans as BOOLERR,
    * date/timestamp as 1899-12-30-epoch serials carrying builtin date
    * XFs 14/22, strings through the SST). Clean-room from the public
    * MS-XLS / MS-CFB specs; emits exactly the record set [[readXls]]
    * parses. Driver-side with the legacy 65,535-row sheet cap; longs
    * beyond 2^53 lose precision (BIFF numbers are IEEE doubles) — use
    * xlsx/parquet for id-bearing exports at that range.
    */
  def writeXls(df: DataFrame, path: String, sheetName: String = "Sheet1",
      maxRows: Int = 65535): Unit = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows, s"writeXls is a driver-side op capped at $maxRows rows")
    val cols = df.columns
    val epoch = java.time.LocalDate.of(1899, 12, 30)

    // collect SST strings (header + string cells) with first-seen ids
    val sstIndex = new java.util.LinkedHashMap[String, Integer]()
    var totalRefs = 0
    def sstId(s: String): Int = {
      totalRefs += 1
      val got = sstIndex.get(s)
      if (got != null) got.intValue()
      else { val id = sstIndex.size(); sstIndex.put(s, id); id }
    }

    // sheet substream first (cell records reference SST ids); XFs:
    // 0 = general, 1 = builtin date (ifmt 14), 2 = builtin datetime (22)
    val sheet = new Buf
    sheet.bytes(bof(0x0010))
    def label(r: Int, c: Int, s: String): Unit =
      sheet.bytes(record(0x00FD, b => { b.u16(r); b.u16(c); b.u16(0); b.i32(sstId(s)) }))
    def number(r: Int, c: Int, ixfe: Int, v: Double): Unit =
      sheet.bytes(record(0x0203, b => { b.u16(r); b.u16(c); b.u16(ixfe); b.f64(v) }))
    cols.zipWithIndex.foreach { case (name, c) => label(0, c, name) }
    rows.zipWithIndex.foreach { case (row, ri) =>
      val r = ri + 1
      cols.indices.foreach { c =>
        if (!row.isNullAt(c)) row.get(c) match {
          case bl: Boolean =>
            sheet.bytes(record(0x0205, b => {
              b.u16(r); b.u16(c); b.u16(0); b.u8(if (bl) 1 else 0); b.u8(0)
            }))
          case n: java.lang.Number => number(r, c, 0, n.doubleValue())
          case d: java.sql.Date =>
            number(r, c, 1,
              java.time.temporal.ChronoUnit.DAYS.between(epoch, d.toLocalDate).toDouble)
          case t: java.sql.Timestamp =>
            val ldt = t.toLocalDateTime
            number(r, c, 2,
              java.time.temporal.ChronoUnit.DAYS.between(epoch, ldt.toLocalDate) +
                ldt.toLocalTime.toNanoOfDay / 86400.0e9)
          case other => label(r, c, other.toString)
        }
      }
    }
    sheet.bytes(eofRec)
    val sheetBytes = sheet.toArray

    // globals substream; BOUNDSHEET's lbPlyPos needs the final globals
    // size, which depends only on fixed records + the SST — assemble
    // those first, then patch nothing: build globals fully, measure,
    // and the sheet offset is its length.
    val globals = new Buf
    globals.bytes(bof(0x0005))
    globals.bytes(record(0x0042, _.u16(1200))) // CODEPAGE utf-16
    globals.bytes(record(0x00E0, b => { b.u16(0); b.u16(0); b.u16(0xFFF5); b.u16(0x20); b.i32(0); b.i32(0x20C0) }))
    globals.bytes(record(0x00E0, b => { b.u16(0); b.u16(14); b.u16(0xFFF5); b.u16(0x20); b.i32(0); b.i32(0x20C0) }))
    globals.bytes(record(0x00E0, b => { b.u16(0); b.u16(22); b.u16(0xFFF5); b.u16(0x20); b.i32(0); b.i32(0x20C0) }))
    // BOUNDSHEET: name as a compressed-or-utf16 short string
    val nameHigh = sheetName.exists(_ > 0xFF)
    val bsheet = record(0x0085, b => {
      b.i32(0) // lbPlyPos placeholder, patched below
      b.u16(0) // visible worksheet
      b.u8(math.min(sheetName.length, 31))
      b.u8(if (nameHigh) 1 else 0)
      sheetName.take(31).foreach { c =>
        if (nameHigh) { b.u8(c & 0xFF); b.u8((c >> 8) & 0xFF) } else b.u8(c & 0xFF)
      }
    })
    val bsheetOff = globals.size
    globals.bytes(bsheet)
    globals.bytes(sstRecords(
      {
        val arr = new Array[String](sstIndex.size())
        sstIndex.forEach((s, i) => arr(i.intValue()) = s)
        scala.collection.immutable.ArraySeq.unsafeWrapArray(arr)
      }, totalRefs))
    globals.bytes(eofRec)
    val wbBuf = globals.toArray ++ sheetBytes
    // patch lbPlyPos (record data starts 4 bytes after the record header)
    val sheetOff = globals.size
    wbBuf(bsheetOff + 4) = (sheetOff & 0xFF).toByte
    wbBuf(bsheetOff + 5) = ((sheetOff >> 8) & 0xFF).toByte
    wbBuf(bsheetOff + 6) = ((sheetOff >> 16) & 0xFF).toByte
    wbBuf(bsheetOff + 7) = ((sheetOff >> 24) & 0xFF).toByte

    java.nio.file.Files.write(java.nio.file.Paths.get(path), cfbContainer(wbBuf))
    ()
  }

  /** Minimal MS-CFB v3 container holding one "Workbook" stream in
    * regular (512-byte) sectors. The stream is zero-padded past the
    * 4096-byte mini-stream cutoff so no mini-FAT is needed (trailing
    * zeros parse as empty BIFF records past the substreams' EOFs).
    * Sector layout: [DIFAT sectors][FAT sectors][directory][stream];
    * the first 109 FAT ids ride the header DIFAT, the rest chain
    * through DIFAT sectors (127 ids + next pointer each), so the
    * container scales to BIFF's own 65,535-row sheet ceiling rather
    * than a 6.9 MB header-only bound.
    */
  private def cfbContainer(stream: Array[Byte]): Array[Byte] = {
    val sector = 512
    val padded = {
      val len = math.max(stream.length, 4096)
      val full = (len + sector - 1) / sector * sector
      java.util.Arrays.copyOf(stream, full)
    }
    val s = padded.length / sector            // stream sectors
    // FAT must cover d + f + 1 + s sectors with f*128 entries, where
    // d DIFAT sectors hold the FAT ids past the header's 109; solve by
    // fixed point (d grows only when f does — converges in ≤2 rounds)
    var f = (s + 1 + 126) / 127
    var d = math.max(0, f - 109 + 126) / 127
    var settled = false
    while (!settled) {
      val f2 = (d + s + 1 + 126) / 127
      val d2 = if (f2 <= 109) 0 else (f2 - 109 + 126) / 127
      settled = f2 == f && d2 == d
      f = f2; d = d2
    }
    val fatStart = d
    val dirSid = d + f
    val streamStart = dirSid + 1
    val total = d + f + 1 + s
    val out = new Buf
    // ---- header ----
    out.bytes(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    (0 until 16).foreach(_ => out.u8(0))      // CLSID
    out.u16(0x003E); out.u16(0x0003)          // minor, major (v3)
    out.u16(0xFFFE)                           // little-endian marker
    out.u16(9); out.u16(6)                    // sector 512, mini 64
    (0 until 6).foreach(_ => out.u8(0))
    out.i32(0)                                // dir sector count (v3: 0)
    out.i32(f)                                // FAT sector count
    out.i32(dirSid)                           // first dir sector
    out.i32(0)                                // txn signature
    out.i32(4096)                             // mini cutoff
    out.i32(EndOfChain); out.i32(0)           // no mini FAT
    out.i32(if (d > 0) 0 else EndOfChain)     // first DIFAT sector
    out.i32(d)                                // DIFAT sector count
    (0 until 109).foreach(i => out.i32(if (i < f) fatStart + i else FreeSect))
    // ---- DIFAT sectors (FAT ids 109.., 127 per sector + next ptr) ----
    (0 until d).foreach { j =>
      (0 until 127).foreach { k =>
        val fi = 109 + j * 127 + k
        out.i32(if (fi < f) fatStart + fi else FreeSect)
      }
      out.i32(if (j == d - 1) EndOfChain else j + 1)
    }
    // ---- FAT sectors ----
    val FatSect = 0xFFFFFFFD
    val DifSect = 0xFFFFFFFC
    (0 until f * 128).foreach { sid =>
      val v =
        if (sid < d) DifSect
        else if (sid < d + f) FatSect
        else if (sid == dirSid) EndOfChain
        else if (sid >= streamStart && sid < streamStart + s)
          (if (sid == streamStart + s - 1) EndOfChain else sid + 1)
        else FreeSect
      out.i32(v)
    }
    // ---- directory sector (4 entries) ----
    def dirEntry(name: String, objType: Int, color: Int, child: Int,
        start: Int, size: Long): Unit = {
      val chars = name.toCharArray
      chars.foreach { c => out.u8(c & 0xFF); out.u8((c >> 8) & 0xFF) }
      ((chars.length * 2) until 64).foreach(_ => out.u8(0))
      out.u16(if (name.isEmpty) 0 else chars.length * 2 + 2)
      out.u8(objType); out.u8(color)
      out.i32(-1); out.i32(-1); out.i32(child)  // left, right, child
      (0 until 16).foreach(_ => out.u8(0))       // CLSID
      out.i32(0)                                 // state bits
      out.i32(0); out.i32(0)                     // create/modify time lo
      out.i32(0); out.i32(0)                     // (8 bytes each: two i32s)
      out.i32(start)
      out.i32(size.toInt); out.i32((size >> 32).toInt)
    }
    dirEntry("Root Entry", 5, 1, 1, EndOfChain, 0L)
    dirEntry("Workbook", 2, 1, -1, streamStart, padded.length.toLong)
    dirEntry("", 0, 0, -1, FreeSect, 0L)
    dirEntry("", 0, 0, -1, FreeSect, 0L)
    // ---- stream sectors ----
    out.bytes(padded)
    val all = out.toArray
    require(all.length == (1 + total) * sector,
      s"cfb layout bug: ${all.length} vs ${(1 + total) * sector}")
    all
  }
}
