package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Clean-room HDF5 codec: roundtrips through our own writer (no libhdf5
  * in the image to cross-check against — structure asserted against the
  * public file-format spec instead: superblock v0, TREE/SNOD/HEAP/GCOL
  * signatures at the addresses the superblock and headers declare).
  */
class Hdf5Spec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempFile("graft_h5", ".h5").toString

  test("roundtrip: native int64/float64/bool/vlen-string datasets") {
    val df = Seq(
      (1L, 1.5, true, "alpha"),
      (2L, -2.25, false, "βeta — utf8"),
      (3L, 0.0, true, ""))
      .toDF("a", "b", "c", "d")
    val p = tmp()
    Hdf5.writeHdf5(df, p)
    val back = Hdf5.readHdf5(spark, p, guessDatatypes = false)
    assert(back.columns.sorted === Array("a", "b", "c", "d"))
    assert(back.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap ===
      Map("a" -> "bigint", "b" -> "double", "c" -> "boolean", "d" -> "string"))
    val got = back.orderBy("a").collect().map(_.toSeq)
    assert(got === df.orderBy("a").collect().map(_.toSeq))
  }

  test("narrower ints and float32 keep their width on disk, read back widened") {
    val df = Seq((1, 2.5f), (-7, -0.125f)).toDF("i", "f")
    val p = tmp()
    Hdf5.writeHdf5(df, p)
    val back = Hdf5.readHdf5(spark, p, guessDatatypes = false).orderBy(desc("i"))
    assert(back.schema.fields.map(_.dataType.simpleString).toSeq === Seq("double", "bigint"))
    assert(back.collect().map(_.toSeq).toSeq === Seq(Seq(2.5, 1L), Seq(-0.125, -7L)))
  }

  test("null-bearing and datetime columns stringify like the reference, guess back") {
    val df = Seq(
      (1L, Some(10L), "2023-06-09 09:12:06", "2023-06-09"),
      (2L, None, "2023-06-09 09:12:07", "2023-06-10"))
      .toDF("id", "n", "ts", "d")
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("d", col("d").cast("date"))
    val p = tmp()
    Hdf5.writeHdf5(df, p)
    // with type guessing (the from_hdf5 contract): "None" → NULL, the
    // stringified int column back to bigint, ts/date re-inferred
    val back = Hdf5.readHdf5(spark, p).orderBy("id")
    assert(back.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap ===
      Map("id" -> "bigint", "n" -> "bigint", "ts" -> "timestamp", "d" -> "date"))
    val rows = back.collect()
    assert(rows(1).isNullAt(rows(1).fieldIndex("n")))
    assert(rows(0).getAs[Long]("n") === 10L)
    assert(rows(0).getAs[java.sql.Timestamp]("ts").toString.startsWith("2023-06-09 09:12:06"))
  }

  test("file structure: superblock v0 + TREE/SNOD/HEAP/GCOL where declared") {
    val p = tmp()
    Hdf5.writeHdf5(Seq((1L, "x")).toDF("num", "txt"), p)
    val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert((b(0) & 0xff) === 0x89 && b(1) === 'H'.toByte &&
      b(2) === 'D'.toByte && b(3) === 'F'.toByte)
    assert(b(8) === 0) // superblock version 0
    assert(bb.getLong(40) === b.length.toLong) // end-of-file address
    def sigAt(addr: Long, s: String) =
      assert(new String(b.slice(addr.toInt, addr.toInt + 4), "US-ASCII") === s,
        s"expected $s at $addr")
    val btree = bb.getLong(56 + 24) // root STE scratch: B-tree address
    val heap = bb.getLong(56 + 32)  // root STE scratch: heap address
    sigAt(btree, "TREE")
    sigAt(heap, "HEAP")
    sigAt(bb.getLong(btree.toInt + 24 + 8), "SNOD") // child 0 of the root B-tree
    assert(new String(b, "ISO-8859-1").contains("GCOL")) // vlen strings in a global heap
  }

  test("vlen columns beyond 65535 rows span multiple global heap collections") {
    // heap object indexes are u16 — a single collection would wrap at
    // 65536 and silently corrupt every later string (review finding)
    val n = 70000
    val df = spark.range(n).selectExpr("id", "concat('s-', id) AS s")
    val p = tmp()
    Hdf5.writeHdf5(df, p)
    val back = Hdf5.readHdf5(spark, p, guessDatatypes = false)
    assert(back.count() === n)
    val rows = back.orderBy("id").collect()
    assert(rows(65534).getString(1) === "s-65534")
    assert(rows(65536).getString(1) === "s-65536") // past the u16 boundary
    assert(rows(n - 1).getString(1) === s"s-${n - 1}")
    // and the file really contains more than one collection
    val raw = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "ISO-8859-1")
    assert(raw.sliding(4).count(_ == "GCOL") >= 2)
  }

  test("wide frames: sym-leaf-k covers all columns in the single SNOD") {
    val cols = (0 until 20).map(i => s"c$i")
    val df = spark.range(3).selectExpr(cols.map(c => s"id AS $c"): _*)
    val p = tmp()
    Hdf5.writeHdf5(df, p)
    val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val leafK = bb.getShort(16) & 0xffff
    assert(leafK * 2 >= 20, s"sym-leaf-k $leafK cannot cover 20 symbols") // libhdf5: nsyms <= 2k
    val back = Hdf5.readHdf5(spark, p, guessDatatypes = false)
    assert(back.columns.length === 20 && back.count() === 3)
  }

  test("Tab dispatch: .h5 in from_file, toHdf5 on the facade") {
    val p = tmp()
    graft.Tab(Seq((1L, "a"), (2L, "b")).toDF("k", "v")).toHdf5(p)
    val t = graft.Tab.fromFile(spark, p)
    assert(t.df.count() === 2)
    assert(t.columns === Seq("k", "v"))
  }

  test("read-side guards: byte cap and non-HDF5 input") {
    val p = tmp()
    Hdf5.writeHdf5(Seq((1L, 2L)).toDF("x", "y"), p)
    val e = intercept[IllegalArgumentException](Hdf5.readHdf5(spark, p, maxBytes = 16))
    assert(e.getMessage.contains("driver-side"), e.getMessage)
    val junk = java.nio.file.Files.createTempFile("graft_h5", ".h5")
    java.nio.file.Files.write(junk, "definitely not hdf5 content....".getBytes)
    val e2 = intercept[IllegalArgumentException](Hdf5.readHdf5(spark, junk.toString))
    assert(e2.getMessage.contains("signature"), e2.getMessage)
  }

  test("writer cap guards the driver (same contract as xlsx/ods/tpz)") {
    val e = intercept[IllegalArgumentException](
      Hdf5.writeHdf5(spark.range(100).toDF("i"), tmp(), maxRows = 10))
    assert(e.getMessage.contains("capped"), e.getMessage)
  }
}
