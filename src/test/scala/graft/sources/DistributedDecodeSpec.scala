package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** Round-8 distributed decode for non-UTF-8 CSV: byte-range splits
  * aligned to the charset's code-unit grid and the classic
  * line-ownership contract — replacing the one-task-per-file decode a
  * 10 GB UTF-16 export would serialize on.
  */
class DistributedDecodeSpec extends SparkSpec {

  private def write(path: String, text: String, charset: String, bom: Array[Byte]): Unit = {
    val out = new java.io.FileOutputStream(path)
    out.write(bom)
    out.write(text.getBytes(java.nio.charset.Charset.forName(charset)))
    out.close()
  }

  // deterministic variable-length lines so split boundaries land
  // mid-line, on newlines, and between \r and \n
  private def lines(n: Int): Seq[String] =
    (0 until n).map(i => s"row$i;" + ("x" * (i % 37)) + s";é€${i % 11}")

  test("UTF-16LE with BOM and CRLF decodes identically across many splits, >1 task") {
    val dir = Files.createTempDirectory("dd16").toFile
    dir.deleteOnExit()
    val p = dir.getAbsolutePath + "/big.csv"
    val data = lines(2000)
    write(p, data.mkString("\r\n"), "UTF-16LE", Array(0xFF.toByte, 0xFE.toByte))
    // force many splits: ~1 KB ranges over a ~100 KB file
    val ds = Readers.decodeTextDistributed(spark, p, "UTF-16LE", splitBytes = 1024)
    assert(ds.rdd.getNumPartitions > 1, "expected a multi-task decode")
    assert(ds.collect().toSeq === data, "split decode diverged from the source lines")
    // the serial whole-file path is the reference result
    val serial = new String(
      Files.readAllBytes(java.nio.file.Paths.get(p)).drop(2),
      java.nio.charset.Charset.forName("UTF-16LE"))
      .split("\r?\n", -1).toSeq.filter(_.nonEmpty)
    assert(ds.collect().toSeq === serial)
  }

  test("bare 'UTF-16' is pinned to the BOM's endianness before splitting") {
    val dir = Files.createTempDirectory("dd16b").toFile
    dir.deleteOnExit()
    val p = dir.getAbsolutePath + "/le.csv"
    val data = lines(500)
    write(p, data.mkString("\n"), "UTF-16LE", Array(0xFF.toByte, 0xFE.toByte))
    // charset "UTF-16" on a chunk WITHOUT a BOM defaults to BE — the
    // decoder must resolve LE once up front or every later chunk reads
    // byte-swapped garbage
    val ds = Readers.decodeTextDistributed(spark, p, "UTF-16", splitBytes = 2048)
    assert(ds.rdd.getNumPartitions > 1)
    assert(ds.collect().toSeq === data)
  }

  test("windows-1252 splits at arbitrary byte offsets (single-byte grid)") {
    val dir = Files.createTempDirectory("dd1252").toFile
    dir.deleteOnExit()
    val p = dir.getAbsolutePath + "/cp.csv"
    val data = (0 until 1500).map(i => s"name$i;Müller${i % 7};café")
    write(p, data.mkString("\n"), "windows-1252", Array.empty)
    val ds = Readers.decodeTextDistributed(spark, p, "windows-1252", splitBytes = 997)
    assert(ds.rdd.getNumPartitions > 1)
    assert(ds.collect().toSeq === data)
  }

  test("newline exactly on a split boundary is emitted exactly once") {
    val dir = Files.createTempDirectory("ddedge").toFile
    dir.deleteOnExit()
    val p = dir.getAbsolutePath + "/edge.csv"
    // 8-byte lines ("aaaaaaa\n") with splitBytes=16: every boundary
    // lands exactly ON a line start
    val data = (0 until 64).map(i => f"ln$i%05d")
    write(p, data.mkString("\n") + "\n", "windows-1252", Array.empty)
    val ds = Readers.decodeTextDistributed(spark, p, "windows-1252", splitBytes = 16)
    val got = ds.collect().toSeq
    assert(got.sorted === data.sorted)
    assert(got.distinct.size === got.size, "a boundary line was emitted twice")
  }

  test("splittableCharset: UTF-16 family and codepages yes; stateful encodings no") {
    assert(Readers.splittableCharset("UTF-16LE"))
    assert(Readers.splittableCharset("UTF-16BE"))
    assert(Readers.splittableCharset("UTF-16"))
    assert(Readers.splittableCharset("windows-1252"))
    assert(Readers.splittableCharset("windows-1250"))
    assert(Readers.splittableCharset("ISO-8859-1"))
    assert(Readers.splittableCharset("US-ASCII"))
    assert(!Readers.splittableCharset("Shift_JIS"), "DBCS must stay per-file")
    assert(!Readers.splittableCharset("ISO-2022-JP"), "stateful must stay per-file")
    assert(!Readers.splittableCharset("no-such-charset"))
  }

  test("readCsv end-to-end over a multi-split UTF-16 file matches the typed result") {
    val dir = Files.createTempDirectory("dd2e").toFile
    dir.deleteOnExit()
    val p = dir.getAbsolutePath + "/t.csv"
    val body = ("a;b;c" +: (0 until 800).map(i => s"$i;v$i;${i * 0.5}")).mkString("\r\n")
    write(p, body, "UTF-16LE", Array(0xFF.toByte, 0xFE.toByte))
    val df = Readers.readCsv(spark, p, Readers.CsvOptions())
    assert(df.columns.toSeq === Seq("a", "b", "c"))
    assert(df.count() === 800)
    val r0 = df.filter(org.apache.spark.sql.functions.col("a") === 7).collect()(0)
    assert(r0.getAs[String]("b") === "v7")
  }
}
