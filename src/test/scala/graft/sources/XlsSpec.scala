package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** BIFF8 `.xls` reader conformance. The reference repo ships no `.xls`
  * fixtures (its dispatch delegates to openpyxl), so the fixture here is
  * built record-by-record from the public MS-CFB/MS-XLS specs — which
  * also pins the container/record layout assumptions independently of
  * the reader's own parsing code paths.
  */
class XlsSpec extends SparkSpec {

  // ---- little-endian byte builders ----------------------------------
  private def u16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def i32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def f64(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    Array.tabulate(8)(i => ((bits >> (8 * i)) & 0xFF).toByte)
  }
  private def rec(id: Int, data: Array[Byte]): Array[Byte] = u16(id) ++ u16(data.length) ++ data
  private def ascii(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  /** Long XLUnicodeString, compressed (8-bit) form. */
  private def xstr(s: String): Array[Byte] = u16(s.length) ++ Array(0.toByte) ++ ascii(s)

  // ---- BIFF8 workbook stream ----------------------------------------

  /** Returns the workbook stream. SST holds 5 strings; the LAST one is
    * split across a CONTINUE record mid-string (fresh grbit byte at the
    * continue start — the fiddly rule this spec exists to pin).
    */
  private def workbookStream(): Array[Byte] = {
    val bofGlobals = rec(0x0809, u16(0x0600) ++ u16(0x0005) ++ Array.fill(12)(0.toByte))
    val bofSheet = rec(0x0809, u16(0x0600) ++ u16(0x0010) ++ Array.fill(12)(0.toByte))

    // FORMAT: custom datetime format id 164
    val fmt = rec(0x041E, u16(164) ++ xstr("yyyy-mm-dd hh:mm"))
    // XF table: indices 0-15 general; 16 = date (ifmt 14); 17 = custom datetime (164)
    val xfs = (0 until 16).map(_ => rec(0x00E0, u16(0) ++ u16(0) ++ Array.fill(16)(0.toByte))) ++
      Seq(rec(0x00E0, u16(0) ++ u16(14) ++ Array.fill(16)(0.toByte)),
          rec(0x00E0, u16(0) ++ u16(164) ++ Array.fill(16)(0.toByte)))

    // SST: 5 strings, last split across CONTINUE after "spli"
    val s0 = xstr("name"); val s1 = xstr("qty"); val s2 = xstr("price")
    val s3 = xstr("widget")
    val s4head = u16(10) ++ Array(0.toByte) ++ ascii("spli") // cch=10, 4 chars here
    val sstData = i32(5) ++ i32(5) ++ s0 ++ s1 ++ s2 ++ s3 ++ s4head
    val sst = rec(0x00FC, sstData)
    val cont = rec(0x003C, Array(0.toByte) ++ ascii("t_tail"))  // grbit + remaining 6 chars

    // boundsheet (offset patched below); sheet name via short string
    val sheetName = "legacy"
    val boundsheetLen = 4 + 2 + (1 + 1 + sheetName.length)
    def boundsheet(off: Int) = rec(0x0085,
      i32(off) ++ u16(0) ++ Array(sheetName.length.toByte, 0.toByte) ++ ascii(sheetName))

    val globalsPre = bofGlobals ++ fmt ++ xfs.flatten ++ sst ++ cont
    val globalsLen = globalsPre.length + (4 + boundsheetLen) + 4 /*EOF*/
    val eof = rec(0x000A, Array.empty)

    // sheet cells (6 columns — name, qty, price, when, flag, at):
    //   row0: headers via LABELSST (name, qty, price) + inline LABELs
    //   row1: widget | RK int 7 | NUMBER 1.5 | date serial | bool T | dt serial
    //   row2: split string | MULRK 8.25 | MULRK 8.25(/100) | date | bool F | dt
    val serialDate = 45000.0        // 2023-03-15
    val serialDt = 45000.75         // 2023-03-15 18:00:00
    val rkInt = (7 << 2) | 2
    val rkFloat825 = {              // 8.25: double whose mantissa fits 30 bits
      val bits = java.lang.Double.doubleToLongBits(8.25)
      ((bits >>> 32) & 0xFFFFFFFCL).toInt
    }
    val sheetFull = bofSheet ++
      rec(0x00FD, u16(0) ++ u16(0) ++ u16(0) ++ i32(0)) ++            // A1 "name"
      rec(0x00FD, u16(0) ++ u16(1) ++ u16(0) ++ i32(1)) ++            // B1 "qty"
      rec(0x00FD, u16(0) ++ u16(2) ++ u16(0) ++ i32(2)) ++            // C1 "price"
      rec(0x0204, u16(0) ++ u16(3) ++ u16(0) ++ xstr("when")) ++      // D1 inline LABEL
      rec(0x0204, u16(0) ++ u16(4) ++ u16(0) ++ xstr("flag")) ++      // E1
      rec(0x0204, u16(0) ++ u16(5) ++ u16(0) ++ xstr("at")) ++        // F1
      rec(0x00FD, u16(1) ++ u16(0) ++ u16(0) ++ i32(3)) ++            // A2 "widget"
      rec(0x027E, u16(1) ++ u16(1) ++ u16(0) ++ i32(rkInt)) ++        // B2 RK 7
      rec(0x0203, u16(1) ++ u16(2) ++ u16(0) ++ f64(1.5)) ++          // C2 1.5
      rec(0x0203, u16(1) ++ u16(3) ++ u16(16) ++ f64(serialDate)) ++  // D2 date
      rec(0x0205, u16(1) ++ u16(4) ++ u16(0) ++ Array(1.toByte, 0.toByte)) ++ // E2 true
      rec(0x0203, u16(1) ++ u16(5) ++ u16(17) ++ f64(serialDt)) ++    // F2 datetime
      rec(0x00FD, u16(2) ++ u16(0) ++ u16(0) ++ i32(4)) ++            // A3 split string
      rec(0x00BD, u16(2) ++ u16(1) ++                                  // B3,C3 MULRK
        u16(0) ++ i32(rkFloat825) ++ u16(0) ++ i32((825 << 2) | 3) ++  // 8.25, 8.25(int/100)
        u16(2)) ++
      rec(0x0203, u16(2) ++ u16(3) ++ u16(16) ++ f64(serialDate + 1)) ++ // D3 date
      rec(0x0205, u16(2) ++ u16(4) ++ u16(0) ++ Array(0.toByte, 0.toByte)) ++ // E3 false
      rec(0x0203, u16(2) ++ u16(5) ++ u16(17) ++ f64(serialDt + 1)) ++ // F3 datetime
      eof

    val globals = globalsPre ++ boundsheet(globalsLen) ++ eof
    assert(globals.length == globalsLen, s"${globals.length} != $globalsLen")
    val stream = globals ++ sheetFull
    // pad past the 4096-byte mini-stream cutoff so the regular FAT path
    // carries the stream (the builder doesn't implement a mini stream)
    stream ++ Array.fill(math.max(0, 4097 - stream.length))(0.toByte)
  }

  // ---- CFB container -------------------------------------------------

  private def cfb(wb: Array[Byte]): Array[Byte] = {
    val sectorSize = 512
    val wbSectors = (wb.length + sectorSize - 1) / sectorSize
    // sector 0: FAT; sector 1: directory; sectors 2..: workbook
    val totalSectors = 2 + wbSectors
    val out = java.nio.ByteBuffer.allocate(512 + totalSectors * sectorSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // header
    out.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    out.position(24)
    out.putShort(0x3E.toShort); out.putShort(0x3.toShort) // minor/major
    out.putShort(0xFFFE.toShort)                          // byte order
    out.putShort(9.toShort)                               // sector shift
    out.putShort(6.toShort)                               // mini shift
    out.position(44)
    out.putInt(1)            // FAT sector count
    out.putInt(1)            // first directory sector
    out.putInt(0)            // transaction
    out.putInt(4096)         // mini cutoff
    out.putInt(-2)           // first minifat sector (end of chain)
    out.putInt(0)            // minifat count
    out.putInt(-2)           // first difat sector
    out.putInt(0)            // difat count
    out.putInt(0)            // DIFAT[0] -> FAT sector 0
    for (_ <- 1 until 109) out.putInt(-1)
    // FAT sector (sector 0)
    assert(out.position() == 512)
    out.putInt(-3)           // sector 0 = FATSECT
    out.putInt(-2)           // sector 1 (dir) = end of chain
    for (i <- 0 until wbSectors)
      out.putInt(if (i == wbSectors - 1) -2 else 3 + i)   // workbook chain
    for (_ <- (2 + wbSectors) until sectorSize / 4) out.putInt(-1)
    // directory (sector 1)
    def dirEntry(name: String, objType: Int, start: Int, size: Int): Array[Byte] = {
      val e = java.nio.ByteBuffer.allocate(128).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = name.getBytes("UTF-16LE")
      e.put(n, 0, math.min(n.length, 62))
      e.position(64); e.putShort((n.length + 2).toShort)
      e.put(objType.toByte)
      e.put(1.toByte)         // color
      e.putInt(-1); e.putInt(-1); e.putInt(-1) // siblings/child
      e.position(116)
      e.putInt(start)
      e.putLong(size.toLong)
      e.array()
    }
    out.put(dirEntry("Root Entry", 5, -2, 0))
    out.put(dirEntry("Workbook", 2, 2, wb.length))
    out.position(512 + 2 * sectorSize)
    out.put(wb)
    out.array()
  }

  private def writeXls(): String = {
    val f = Files.createTempFile("graft", ".xls")
    Files.write(f, cfb(workbookStream()))
    f.toString
  }

  test("BIFF8 reader: SST/CONTINUE split, RK/MULRK, serial dates, bool, inline label") {
    val path = writeXls()
    val df = Xls.readXls(spark, path)
    assert(df.columns.toSeq === Seq("name", "qty", "price", "when", "flag", "at"))
    val rows = df.orderBy("name").collect()
    assert(rows.length === 2)
    val byName = rows.map(r => r.getString(0) -> r).toMap
    val w = byName("widget")
    assert(w.getDouble(1) === 7.0)               // RK int (column mixes 8.25 -> double)
    assert(w.getDouble(2) === 1.5)               // NUMBER
    assert(w.get(3).toString.startsWith("2023-03-15"))  // serial 45000, builtin date fmt
    assert(w.get(4) === true)                    // BOOLERR
    assert(w.get(5).toString.startsWith("2023-03-15 18:00")) // custom datetime fmt
    val s = byName("split_tail")                 // SST string across CONTINUE
    assert(s.getDouble(1) === 8.25)              // MULRK float rk
    assert(s.getDouble(2) === 8.25)              // MULRK int/100 rk
    assert(s.get(4) === false)
    assert(s.get(3).toString.startsWith("2023-03-16"))
  }

  test("sheetNames and fromFile dispatch for .xls") {
    val path = writeXls()
    assert(Xls.sheetNames(path) === Seq("legacy"))
    val t = graft.Tab.fromFile(spark, path)
    assert(t.df.count() === 2)
  }

  test(".xlsm routes through the xlsx reader (same zip package + macros)") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val x = Files.createTempFile("graft", ".xlsx")
    Files.delete(x)
    Xlsx.writeXlsx(df, x.toString)
    val m = x.toString.stripSuffix(".xlsx") + ".xlsm"
    Files.copy(java.nio.file.Paths.get(x.toString), java.nio.file.Paths.get(m))
    val back = graft.Tab.fromFile(spark, m)
    assert(back.df.orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      === Seq(("a", 1L), ("b", 2L)))
  }
}
