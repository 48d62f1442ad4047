package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Clean-room HDF5 reader/writer for the reference's one-dataset-per-
  * column layout (`to_hdf5` / `from_hdf5`, reference
  * `export_utils.py:63-105` / `import_utils.py:72-109`): every column is
  * a 1-D dataset at the root group; columns h5py cannot store natively
  * (datetimes, mixed/None-bearing columns) are stringified and
  * type-guessed back on import.
  *
  * Implemented from the public HDF5 File Format Specification (v1.x,
  * "version 0" structures — the layout libhdf5 emits for
  * `libver='earliest'`, h5py's default): superblock v0, old-style group
  * (v1 B-tree + local heap + symbol table nodes), v1 object headers,
  * contiguous/compact data layout (v3 message), datatype classes
  * fixed-point / IEEE float / fixed string / enum / variable-length
  * string, and global heap collections for vlen data. No libhdf5, no
  * external dependency — pure JDK, like the `.xls` CFB reader.
  *
  * Driver-side compat codec by design (same contract as the xlsx/ods/
  * tpz codecs): bounded by `maxRows` on write and `maxBytes` on read.
  */
object Hdf5 {

  private val UNDEF = -1L // 0xFFFFFFFFFFFFFFFF — HDF5 "undefined address"

  // ---------------------------------------------------------------- write

  /** One dataset per column at the root group, mirroring the reference's
    * `to_hdf5`: long/int/short/byte → fixed-point, double/float → IEEE
    * float, boolean → int8 enum {FALSE,TRUE} (h5py's bool mapping),
    * string → UTF-8 vlen string; any other type, or any column
    * containing NULLs, is stringified (the reference's `TypeError →
    * [str(i) ...]` fallback, `export_utils.py:101-103`) with nulls as
    * "None" so the import-side type guess restores them.
    */
  def writeHdf5(df: DataFrame, path: String, maxRows: Int = 1000000): Unit = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows, s"writeHdf5 is a driver-side op capped at $maxRows rows")
    val out = new Hdf5Writer
    // group B-tree/SNOD entries must be in name byte-order
    val fields = df.schema.fields.zipWithIndex
      .sortBy { case (f, _) => f.name.getBytes(StandardCharsets.UTF_8).map(b => (b & 0xff).toChar).mkString }
    val datasets = fields.map { case (f, i) =>
      val hasNull = rows.exists(_.isNullAt(i))
      val col: Dataset = f.dataType match {
        case LongType if !hasNull    => FixedData(8, rows.map(_.getLong(i)))
        case IntegerType if !hasNull => FixedData(4, rows.map(_.getInt(i).toLong))
        case ShortType if !hasNull   => FixedData(2, rows.map(_.getShort(i).toLong))
        case ByteType if !hasNull    => FixedData(1, rows.map(_.getByte(i).toLong))
        case DoubleType if !hasNull  => FloatData(8, rows.map(_.getDouble(i)))
        case FloatType if !hasNull   => FloatData(4, rows.map(_.getFloat(i).toDouble))
        case BooleanType if !hasNull => BoolData(rows.map(_.getBoolean(i)))
        case StringType if !hasNull  => VlenData(rows.map(_.getString(i)))
        case _ => VlenData(rows.map(r => stringify(if (r.isNullAt(i)) null else r.get(i))))
      }
      f.name -> col
    }
    out.write(path, datasets)
  }

  /** Python-`str()`-compatible rendering, so the reference's
    * `DataTypes.guess` (and our [[graft.functions.TypeInference]])
    * round-trips the values: None, True/False, bare ISO dates,
    * second-or-microsecond timestamps.
    */
  private def stringify(v: Any): String = v match {
    case null                  => "None"
    case b: Boolean            => if (b) "True" else "False"
    case t: java.sql.Timestamp =>
      val ldt = t.toLocalDateTime
      if (ldt.getNano == 0)
        ldt.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      else
        ldt.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))
    case d: java.sql.Date      => d.toString
    case other                 => other.toString
  }

  private sealed trait Dataset { def n: Int }
  private final case class FixedData(size: Int, values: Array[Long]) extends Dataset {
    def n: Int = values.length
  }
  private final case class FloatData(size: Int, values: Array[Double]) extends Dataset {
    def n: Int = values.length
  }
  private final case class BoolData(values: Array[Boolean]) extends Dataset {
    def n: Int = values.length
  }
  private final case class VlenData(values: Array[String]) extends Dataset {
    def n: Int = values.length
  }

  /** Serializer: lays the file out sequentially (superblock, root
    * header, local heap, B-tree node, SNOD, per-dataset object headers,
    * raw data, global heap collections), then patches the addresses that
    * were only known after layout.
    */
  private final class Hdf5Writer {
    private val buf = new java.io.ByteArrayOutputStream()
    private def pos: Long = buf.size().toLong
    private def u8(v: Int): Unit = buf.write(v & 0xff)
    private def u16(v: Int): Unit = { u8(v); u8(v >>> 8) }
    private def u32(v: Long): Unit = { u16(v.toInt); u16((v >>> 16).toInt) }
    private def u64(v: Long): Unit = { u32(v); u32(v >>> 32) }
    private def bytes(b: Array[Byte]): Unit = buf.write(b)
    private def pad8(): Unit = while (pos % 8 != 0) u8(0)

    def write(path: String, datasets: Array[(String, Dataset)]): Unit = {
      // ---- local heap segment: offset 0 = empty string, then names
      val heapData = new java.io.ByteArrayOutputStream()
      heapData.write(new Array[Byte](8)) // offset 0: "" (B-tree key 0)
      val nameOffsets = datasets.map { case (name, _) =>
        val off = heapData.size().toLong
        heapData.write(name.getBytes(StandardCharsets.UTF_8))
        heapData.write(0)
        while (heapData.size() % 8 != 0) heapData.write(0)
        off
      }
      val heapSeg = heapData.toByteArray

      // ---- superblock v0 (96 bytes; addresses patched at the end)
      bytes(Array(0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
      u8(0); u8(0); u8(0); u8(0); u8(0) // versions: sb, freespace, root STE, reserved, shared-msg
      u8(8); u8(8); u8(0)               // size of offsets, size of lengths, reserved
      // sym-leaf-k bounds a symbol table node at 2k entries; all columns
      // go into ONE SNOD, so k must cover them or libhdf5's SNOD sanity
      // check (nsyms <= 2k) rejects files with more than 8 columns
      u16(math.max(4, (datasets.length + 1) / 2)); u16(16)
      u32(0)                            // file consistency flags
      u64(0)                            // base address
      u64(UNDEF)                        // free-space info
      val eofPatch = pos; u64(0)        // end-of-file address (patched)
      u64(UNDEF)                        // driver info block
      // root symbol table entry
      u64(0)                            // link name offset
      val rootHdrPatch = pos; u64(0)    // root object header address (patched)
      u32(1); u32(0)                    // cache type 1 (group), reserved
      val rootBtPatch = pos; u64(0)     // scratch: B-tree address (patched)
      val rootHeapPatch = pos; u64(0)   // scratch: local heap address (patched)

      // ---- root group object header v1: one Symbol Table message
      pad8()
      val rootHdrAddr = pos
      u8(1); u8(0); u16(1); u32(1)      // version, reserved, nmsgs, refcount
      u32(24); u32(0)                   // header block size, pad to 8-align messages
      u16(0x0011); u16(16); u8(0); u8(0); u8(0); u8(0)
      val stBtPatch = pos; u64(0)       // B-tree address (patched)
      val stHeapPatch = pos; u64(0)     // local heap address (patched)

      // ---- local heap
      pad8()
      val heapAddr = pos
      bytes("HEAP".getBytes(StandardCharsets.US_ASCII))
      u8(0); u8(0); u8(0); u8(0)        // version 0, reserved
      u64(heapSeg.length.toLong)        // data segment size
      u64(1)                            // free list head: 1 = none
      u64(pos + 8)                      // data segment address (immediately after)
      bytes(heapSeg)

      // ---- SNOD (symbol table node), then the B-tree pointing at it
      pad8()
      val snodAddr = pos
      bytes("SNOD".getBytes(StandardCharsets.US_ASCII))
      u8(1); u8(0); u16(datasets.length)
      val dsHdrPatches = datasets.indices.map { i =>
        u64(nameOffsets(i))             // link name offset in local heap
        val p = pos; u64(0)             // object header address (patched)
        u32(0); u32(0)                  // cache type 0, reserved
        u64(0); u64(0)                  // scratch (unused)
        p
      }

      pad8()
      val btreeAddr = pos
      bytes("TREE".getBytes(StandardCharsets.US_ASCII))
      u8(0); u8(0)                      // node type 0 (group), level 0
      u16(1)                            // entries used
      u64(UNDEF); u64(UNDEF)            // siblings
      u64(0)                            // key 0: "" (≤ every name)
      u64(snodAddr)                     // child 0
      u64(if (nameOffsets.isEmpty) 0L else nameOffsets.last) // key 1: greatest name

      // ---- one object header + raw data (+ global heap) per dataset
      val hdrAddrs = datasets.map { case (_, ds) =>
        pad8()
        val hdrAddr = pos
        u8(1); u8(0); u16(3); u32(1)
        val sizePatch = pos; u32(0); u32(0) // header size (patched), align pad
        val msgsStart = pos
        // dataspace v1, rank 1
        u16(0x0001); u16(16); u32(0)
        u8(1); u8(1); u8(0); bytes(new Array[Byte](5))
        u64(ds.n.toLong)
        // datatype
        val dtBody = datatypeBody(ds)
        u16(0x0003); u16(dtBody.length); u32(0)
        bytes(dtBody)
        // layout v3 contiguous (address patched after data is placed)
        u16(0x0008); u16(24); u32(0)
        u8(3); u8(1)
        val addrPatch = pos; u64(0)
        u64(rawSize(ds).toLong)
        bytes(new Array[Byte](6))       // pad body to 24
        val hdrSize = pos - msgsStart
        (hdrAddr, sizePatch, addrPatch, hdrSize)
      }

      val dataAddrs = datasets.map { case (_, ds) =>
        pad8()
        val addr = pos
        ds match {
          case FixedData(size, vs) =>
            vs.foreach { v =>
              var i = 0
              while (i < size) { u8((v >>> (8 * i)).toInt); i += 1 }
            }
          case FloatData(8, vs) => vs.foreach(v => u64(java.lang.Double.doubleToLongBits(v)))
          case FloatData(_, vs) =>
            vs.foreach(v => u32(java.lang.Float.floatToIntBits(v.toFloat).toLong & 0xFFFFFFFFL))
          case BoolData(vs) => vs.foreach(v => u8(if (v) 1 else 0))
          case VlenData(vs) =>
            // vlen elements = (length u32, global heap collection addr
            // u64, object index u32); collections follow the element
            // array. Heap object indexes are u16, so payloads are split
            // across collections of <= 60000 objects — a single
            // collection would silently wrap the index at 65536 rows.
            // Element-array patches are deferred to the final patch pass
            // (a per-column buffer rewrite would be O(columns × file)).
            val payloads = vs.map(s => Option(s).getOrElse("").getBytes(StandardCharsets.UTF_8))
            val elemsAddr = pos
            payloads.foreach { _ => u32(0); u64(0); u32(0) } // patched in the final pass
            val perColl = 60000
            payloads.grouped(perColl).zipWithIndex.foreach { case (chunk, ci) =>
              pad8()
              val gcolAddr = pos
              val objsSize = chunk.map(p => 16L + ((p.length + 7) / 8) * 8L).sum
              val collSize = math.max(16L + objsSize + 16L, 4096L) // header + objects + free obj
              bytes("GCOL".getBytes(StandardCharsets.US_ASCII))
              u8(1); u8(0); u8(0); u8(0)
              u64(collSize)
              chunk.zipWithIndex.foreach { case (p, i) =>
                u16(i + 1); u16(1); u32(0); u64(p.length.toLong)
                bytes(p)
                pad8()
              }
              val free = collSize - (pos - gcolAddr)
              if (free > 0) { // free-space pseudo-object (index 0)
                u16(0); u16(0); u32(0); u64(free)
                bytes(new Array[Byte]((free - 16).toInt))
              }
              chunk.indices.foreach { i =>
                val elem = ci.toLong * perColl + i
                vlenPatches += ((elemsAddr + elem * 16, chunk(i).length, gcolAddr, i + 1))
              }
            }
        }
        addr
      }

      // ---- patch pass
      val arr = buf.toByteArray
      val bb = ByteBuffer.wrap(arr).order(ByteOrder.LITTLE_ENDIAN)
      bb.putLong(eofPatch.toInt, arr.length.toLong)
      bb.putLong(rootHdrPatch.toInt, rootHdrAddr)
      bb.putLong(rootBtPatch.toInt, btreeAddr)
      bb.putLong(rootHeapPatch.toInt, heapAddr)
      bb.putLong(stBtPatch.toInt, btreeAddr)
      bb.putLong(stHeapPatch.toInt, heapAddr)
      datasets.indices.foreach { i =>
        bb.putLong(dsHdrPatches(i).toInt, hdrAddrs(i)._1)
        bb.putInt(hdrAddrs(i)._2.toInt, hdrAddrs(i)._4.toInt)
        bb.putLong(hdrAddrs(i)._3.toInt, dataAddrs(i))
      }
      vlenPatches.foreach { case (off, len, gcolAddr, idx) =>
        bb.putInt(off.toInt, len)
        bb.putLong(off.toInt + 4, gcolAddr)
        bb.putInt(off.toInt + 12, idx)
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(path), arr)
    }

    // (element offset, byte length, collection address, object index)
    private val vlenPatches =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Int)]

    private def rawSize(ds: Dataset): Long = ds match {
      case FixedData(size, vs) => size.toLong * vs.length
      case FloatData(size, vs) => size.toLong * vs.length
      case BoolData(vs)        => vs.length.toLong
      case VlenData(vs)        => 16L * vs.length
    }

    /** Datatype message body (8-byte header + properties, 8-padded). */
    private def datatypeBody(ds: Dataset): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      def u8o(v: Int): Unit = o.write(v & 0xff)
      def u16o(v: Int): Unit = { u8o(v); u8o(v >>> 8) }
      def u32o(v: Long): Unit = { u16o(v.toInt); u16o((v >>> 16).toInt) }
      def header(cls: Int, bits: Int, size: Int): Unit = {
        u8o((1 << 4) | cls)
        u8o(bits); u8o(bits >>> 8); u8o(bits >>> 16)
        u32o(size.toLong)
      }
      def int8Base(): Unit = { header(0, 0x08, 1); u16o(0); u16o(8) } // signed int8
      ds match {
        case FixedData(size, _) =>
          header(0, 0x08, size) // LE, signed
          u16o(0); u16o(size * 8)
        case FloatData(size, _) =>
          val signLoc = if (size == 8) 63 else 31
          header(1, 0x20 | (signLoc << 8), size) // LE, mantissa-norm 2, sign loc
          u16o(0); u16o(size * 8)
          if (size == 8) { u8o(52); u8o(11); u8o(0); u8o(52); u32o(1023) }
          else { u8o(23); u8o(8); u8o(0); u8o(23); u32o(127) }
        case BoolData(_) =>
          header(8, 2, 1) // enum, 2 members, int8 base (h5py's bool)
          int8Base()
          o.write("FALSE".getBytes(StandardCharsets.US_ASCII)); o.write(0); o.write(new Array[Byte](2))
          o.write("TRUE".getBytes(StandardCharsets.US_ASCII)); o.write(0); o.write(new Array[Byte](3))
          u8o(0); u8o(1) // member values
        case VlenData(_) =>
          header(9, 0x0101, 16) // vlen-string, null-pad, UTF-8
          header(3, 0x10, 1)    // base: 1-byte string, null-term, UTF-8
      }
      while (o.size() % 8 != 0) o.write(0)
      o.toByteArray
    }
  }

  // ----------------------------------------------------------------- read

  /** Import an HDF5 file written by [[writeHdf5]] or by the reference's
    * `to_hdf5` (h5py, default settings): every root-group dataset
    * becomes a column; string columns go through the rank-ordered type
    * guess exactly like the reference's `DataTypes.guess` on import
    * (`import_utils.py:105-107`). Ragged columns pad with NULL (the
    * reference's zip-pad rule).
    */
  def readHdf5(spark: SparkSession, path: String,
      guessDatatypes: Boolean = true, maxBytes: Long = 256L << 20): DataFrame = {
    val p = java.nio.file.Paths.get(path)
    val fileSize = java.nio.file.Files.size(p)
    require(fileSize <= maxBytes,
      s"HDF5 at $path is $fileSize bytes > cap $maxBytes: this is a " +
        "driver-side compat codec; for data this large use parquet, or " +
        "raise maxBytes explicitly")
    val bb = ByteBuffer.wrap(java.nio.file.Files.readAllBytes(p)).order(ByteOrder.LITTLE_ENDIAN)
    val r = new Hdf5Reader(bb)
    val cols = r.rootDatasets()
    require(cols.nonEmpty, s"no datasets at the root group of $path")
    val n = cols.map(_._2.length).max
    val rows = (0 until n).map { i =>
      Row.fromSeq(cols.map { case (_, vs) => if (i < vs.length) vs(i) else null }.toIndexedSeq)
    }
    val schema = StructType(cols.map { case (name, vs) =>
      val dt = vs.collectFirst {
        case _: java.lang.Long    => LongType
        case _: java.lang.Double  => DoubleType
        case _: java.lang.Boolean => BooleanType
        case _: String            => StringType
      }.getOrElse(StringType)
      StructField(name, dt, nullable = true)
    }.toIndexedSeq)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
    if (guessDatatypes) graft.functions.TypeInference.applyBestTypes(df) else df
  }

  /** Structural reader: superblock v0/v1 → root symbol-table group →
    * (B-tree v1 → SNOD → entries) → per-dataset v1 object headers →
    * typed values. Unknown header messages are skipped; chunked layout
    * and non-root groups are rejected with clear errors (the reference
    * format never produces them).
    */
  private final class Hdf5Reader(bb: ByteBuffer) {
    private def u8(off: Long): Int = bb.get(off.toInt) & 0xff
    private def u16(off: Long): Int = bb.getShort(off.toInt) & 0xffff
    private def u32(off: Long): Long = bb.getInt(off.toInt).toLong & 0xFFFFFFFFL
    private def u64(off: Long): Long = bb.getLong(off.toInt)
    private def ascii(off: Long, n: Int): String = {
      val a = new Array[Byte](n)
      var i = 0
      while (i < n) { a(i) = bb.get((off + i).toInt); i += 1 }
      new String(a, StandardCharsets.US_ASCII)
    }

    def rootDatasets(): Seq[(String, Array[Any])] = {
      val sig = Array(0x89, 0x48, 0x44, 0x46, 0x0d, 0x0a, 0x1a, 0x0a) // \x89 H D F \r \n \x1a \n
      require(sig.indices.forall(i => u8(i.toLong) == sig(i)), "not an HDF5 file (bad signature)")
      val sbVersion = u8(8)
      require(sbVersion <= 1, s"unsupported HDF5 superblock version $sbVersion " +
        "(only the v0/v1 'earliest' layout the reference writes)")
      require(u8(13) == 8 && u8(14) == 8, "only 8-byte offsets/lengths supported")
      // v1 inserts "indexed storage internal node k" (2) + reserved (2)
      // between the consistency flags and the address block
      val steOff = if (sbVersion == 0) 56L else 60L
      val rootHdr = u64(steOff + 8)
      val (btree, heap) = symbolTableAddrs(rootHdr)
      val entries = groupEntries(btree)
      entries.map { case (nameOff, hdrAddr) =>
        val name = heapString(heap, nameOff)
        name -> readDataset(hdrAddr, name)
      }
    }

    /** (B-tree address, local heap address) from a group's object
      * header's Symbol Table message.
      */
    private def symbolTableAddrs(hdrAddr: Long): (Long, Long) = {
      var result: Option[(Long, Long)] = None
      foreachMessage(hdrAddr) { (mtype, body) =>
        if (mtype == 0x0011) result = Some((u64(body), u64(body + 8)))
      }
      result.getOrElse(throw new IllegalArgumentException(
        "root object header has no symbol table message (new-style groups unsupported)"))
    }

    /** All (link name heap offset, object header address) under a v1
      * group B-tree, walking internal levels down to SNOD leaves.
      */
    private def groupEntries(btreeAddr: Long): Seq[(Long, Long)] = {
      require(ascii(btreeAddr, 4) == "TREE", "bad group B-tree signature")
      val level = u8(btreeAddr + 5)
      val used = u16(btreeAddr + 6)
      val children = (0 until used).map(i => u64(btreeAddr + 24 + 8 + i * 16L))
      if (level > 0) children.flatMap(groupEntries)
      else children.flatMap { snod =>
        require(ascii(snod, 4) == "SNOD", "bad symbol table node signature")
        val nsym = u16(snod + 6)
        (0 until nsym).map { i =>
          val e = snod + 8 + i * 40L
          (u64(e), u64(e + 8))
        }
      }
    }

    private def heapString(heapAddr: Long, nameOff: Long): String = {
      require(ascii(heapAddr, 4) == "HEAP", "bad local heap signature")
      val seg = u64(heapAddr + 24)
      var end = seg + nameOff
      while (u8(end) != 0) end += 1
      val a = new Array[Byte]((end - (seg + nameOff)).toInt)
      var i = 0
      while (i < a.length) { a(i) = bb.get((seg + nameOff + i).toInt); i += 1 }
      new String(a, StandardCharsets.UTF_8)
    }

    /** Walk a v1 object header's messages (following continuation
      * messages), calling `f(type, bodyOffset)`.
      */
    private def foreachMessage(hdrAddr: Long)(f: (Int, Long) => Unit): Unit = {
      require(u8(hdrAddr) == 1, s"unsupported object header version ${u8(hdrAddr)}")
      val nmsgs = u16(hdrAddr + 2)
      var blocks = List((hdrAddr + 16, u32(hdrAddr + 8))) // (start, size)
      var seen = 0
      while (blocks.nonEmpty && seen < nmsgs) {
        val (start, size) = blocks.head
        blocks = blocks.tail
        var off = start
        while (off < start + size && seen < nmsgs) {
          val mtype = u16(off)
          val msize = u16(off + 2)
          val body = off + 8
          if (mtype == 0x0010) blocks = blocks :+ ((u64(body), u64(body + 8)))
          else f(mtype, body)
          seen += 1
          off = body + msize
        }
      }
    }

    private def readDataset(hdrAddr: Long, name: String): Array[Any] = {
      var n = -1L
      var dtype: Option[Dtype] = None
      var dataAddr = UNDEF
      var dataSize = 0L
      var compact: Option[Long] = None // body offset of compact data
      foreachMessage(hdrAddr) { (mtype, body) =>
        mtype match {
          case 0x0001 => // dataspace
            val ver = u8(body)
            val rank = u8(body + 1)
            require(rank <= 1, s"dataset $name: rank $rank unsupported (columns are 1-D)")
            val dimsOff = if (ver == 1) body + 8 else body + 4
            n = if (rank == 0) 1L else u64(dimsOff)
          case 0x0003 => dtype = Some(parseDtype(body, name))
          case 0x0008 => // data layout
            val ver = u8(body)
            require(ver == 3, s"dataset $name: layout message v$ver unsupported")
            u8(body + 1) match {
              case 0 => compact = Some(body + 4) // compact: size u16 then data
              case 1 => dataAddr = u64(body + 2); dataSize = u64(body + 10)
              case c => throw new IllegalArgumentException(
                s"dataset $name: layout class $c (chunked?) unsupported — " +
                  "the reference writes contiguous datasets")
            }
          case _ => () // fill value, mod time, attributes … — skipped
        }
      }
      val dt = dtype.getOrElse(throw new IllegalArgumentException(s"dataset $name: no datatype"))
      require(n >= 0, s"dataset $name: no dataspace")
      val base = compact.getOrElse {
        require(dataAddr != UNDEF || n == 0, s"dataset $name: data address undefined")
        dataAddr
      }
      readValues(dt, base, n.toInt, name)
    }

    private sealed trait Dtype { def size: Int }
    private case class FixedT(size: Int, signed: Boolean) extends Dtype
    private case class FloatT(size: Int) extends Dtype
    private case class StringT(size: Int) extends Dtype
    private case class EnumT(size: Int, names: Seq[String], values: Seq[Long]) extends Dtype
    private case class VlenStrT(size: Int) extends Dtype

    private def parseDtype(off: Long, name: String): Dtype = {
      val cls = u8(off) & 0x0f
      val bits = u8(off + 1) | (u8(off + 2) << 8) | (u8(off + 3) << 16)
      val size = u32(off + 4).toInt
      cls match {
        case 0 =>
          require((bits & 1) == 0, s"dataset $name: big-endian ints unsupported")
          FixedT(size, (bits & 0x08) != 0)
        case 1 =>
          require((bits & 1) == 0, s"dataset $name: big-endian floats unsupported")
          require(size == 4 || size == 8, s"dataset $name: float$size unsupported")
          FloatT(size)
        case 3 => StringT(size)
        case 8 =>
          val nMembers = bits & 0xffff
          val base = parseDtype(off + 8, name)
          require(base.isInstanceOf[FixedT], s"dataset $name: non-integer enum base")
          // v1 enum: names null-terminated, 8-padded; then packed values
          var p = off + 8 + dtypeLen(off + 8)
          val names = (0 until nMembers).map { _ =>
            var e = p
            while (u8(e) != 0) e += 1
            val s = ascii(p, (e - p).toInt)
            p += ((e - p + 1 + 7) / 8) * 8
            s
          }
          val values = (0 until nMembers).map { i =>
            readInt(p + i.toLong * base.size, base.size, signed = true)
          }
          EnumT(size, names, values)
        case 9 =>
          require((bits & 0x0f) == 1, s"dataset $name: vlen sequences unsupported (strings only)")
          VlenStrT(size)
        case c => throw new IllegalArgumentException(s"dataset $name: datatype class $c unsupported")
      }
    }

    /** Byte length of a serialized datatype (header + properties) —
      * needed to find where an enum's member names start.
      */
    private def dtypeLen(off: Long): Long = {
      val cls = u8(off) & 0x0f
      cls match {
        case 0 => 12
        case 1 => 20
        case 3 => 8
        case _ => throw new IllegalArgumentException(s"nested datatype class $cls unsupported")
      }
    }

    private def readInt(off: Long, size: Int, signed: Boolean): Long = {
      var v = 0L
      var i = 0
      while (i < size) { v |= (u8(off + i).toLong << (8 * i)); i += 1 }
      if (signed && size < 8) {
        val shift = 64 - size * 8
        (v << shift) >> shift
      } else v
    }

    private def readValues(dt: Dtype, addr: Long, n: Int, name: String): Array[Any] = dt match {
      case FixedT(size, signed) =>
        Array.tabulate[Any](n)(i => java.lang.Long.valueOf(readInt(addr + i.toLong * size, size, signed)))
      case FloatT(8) =>
        Array.tabulate[Any](n)(i => java.lang.Double.valueOf(
          java.lang.Double.longBitsToDouble(u64(addr + i * 8L))))
      case FloatT(_) =>
        Array.tabulate[Any](n)(i => java.lang.Double.valueOf(
          java.lang.Float.intBitsToFloat(u32(addr + i * 4L).toInt).toDouble))
      case StringT(size) =>
        Array.tabulate[Any](n) { i =>
          val start = addr + i.toLong * size
          var len = 0
          while (len < size && u8(start + len) != 0) len += 1
          val a = new Array[Byte](len)
          var j = 0
          while (j < len) { a(j) = bb.get((start + j).toInt); j += 1 }
          new String(a, StandardCharsets.UTF_8)
        }
      case e @ EnumT(size, names, values) =>
        val isBool = names.map(_.toUpperCase).sorted == Seq("FALSE", "TRUE")
        Array.tabulate[Any](n) { i =>
          val v = readInt(addr + i.toLong * size, size, signed = true)
          val idx = values.indexOf(v)
          val nm = if (idx >= 0) names(idx) else v.toString
          if (isBool) java.lang.Boolean.valueOf(nm.equalsIgnoreCase("TRUE")) else nm
        }
      case VlenStrT(_) =>
        Array.tabulate[Any](n) { i =>
          val e = addr + i * 16L
          val len = u32(e).toInt
          val coll = u64(e + 4)
          val idx = u32(e + 12).toInt
          if (coll == 0 || coll == UNDEF) "" else globalHeapObject(coll, idx, len)
        }
    }

    // collection address → (object index → data offset); parsed once per
    // collection — a per-element linear scan would be O(n²) over a column
    private val gcolCache = scala.collection.mutable.Map.empty[Long, Map[Int, Long]]

    /** Fetch object `idx` from the global heap collection at `addr`. */
    private def globalHeapObject(addr: Long, idx: Int, len: Int): String = {
      val objects = gcolCache.getOrElseUpdate(addr, {
        require(ascii(addr, 4) == "GCOL", "bad global heap signature")
        val collSize = u64(addr + 8)
        val m = Map.newBuilder[Int, Long]
        var off = addr + 16
        var done = false
        while (!done && off + 16 <= addr + collSize) {
          val objIdx = u16(off)
          val objSize = u64(off + 8)
          if (objIdx == 0) {
            // free-space object: its size INCLUDES its own 16-byte
            // header. Skip it — real libhdf5 collections can have free
            // gaps mid-collection (deleted/rewritten objects), with live
            // objects after them. A size < 16 marks the terminal
            // remainder-too-small-for-a-header case.
            if (objSize < 16) done = true
            else off += ((objSize + 7) / 8) * 8
          } else {
            m += objIdx -> (off + 16)
            off += 16 + ((objSize + 7) / 8) * 8
          }
        }
        m.result()
      })
      val dataOff = objects.getOrElse(idx,
        throw new IllegalArgumentException(s"global heap object $idx not found at $addr"))
      val a = new Array[Byte](len)
      var j = 0
      while (j < len) { a(j) = bb.get((dataOff + j).toInt); j += 1 }
      new String(a, StandardCharsets.UTF_8)
    }
  }
}
