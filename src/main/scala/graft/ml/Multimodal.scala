package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns + typed metadata struct — the same
  * layout `spark.read.format("binaryFile")` produces and parquet stores
  * natively. The decode/feature kernels are the ONLY non-columnar steps;
  * they run per-partition (Scala analogue of `mapInPandas`: batch-at-a-
  * time, schema declared up front). Image decode is REAL (pure-JDK
  * [[ImageIoCodec]]: PNG/JPEG/GIF/BMP) and audio decode is REAL
  * (pure-JDK [[WavPcmCodec]]: WAV/PCM 8/16/24/32-bit); only VIDEO stays
  * a deterministic stub behind the [[MediaCodec]] SPI — there is no
  * pure-JDK video codec, so a deployment registers its own
  * (DIVERGENCES.md documents this).
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, sample_rate: Int)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      checksum: String, feature: Array[Float])

  /** md5 hex of the raw payload — a real content checksum (and cross-
    * engine verifiable: DuckDB/PostgreSQL md5() produce the same digest).
    */
  private def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Wrap a binary payload with metadata — the ingest schema. */
  def asMediaTable(df: DataFrame, idCol: String, binCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(binCol).cast("binary").as("bytes"),
      lit(0).as("width"), lit(0).as("height"), lit(0).as("sample_rate"))

  /** Codec SPI: the ONLY part of the multimodal pipeline this container
    * cannot test for real (no image/audio libs in the image). A real
    * environment registers its decoder once ([[MediaCodec.register]]) —
    * e.g. JPEG decode → resize → embed — and every pipeline entry point
    * picks it up without modification; the deterministic stub stays as
    * the default/test implementation. Codecs are captured on the DRIVER
    * at plan time and serialized into the task closure, so a registered
    * codec must be [[Serializable]] (or resolve its native resources
    * lazily on the executor).
    */
  trait MediaCodec extends Serializable {
    /** Decode one payload into a fixed-dim feature vector. */
    def decode(kind: String, bytes: Array[Byte]): Array[Float]

    /** Vectorized batch entry point (the `mapInPandas`-shaped call a
      * hardware-accelerated decoder amortizes over); default = per-row.
      */
    def decodeBatch(kind: String, batch: Seq[Array[Byte]]): Seq[Array[Float]] =
      batch.map(decode(kind, _))

    /** Decode + downscale one payload to a `w`×`h` grayscale grid
      * (row-major, values in [0, 255]) — the perceptual-hash input
      * ([[perceptualHashes]]). A real deployment overrides with actual
      * decode → luma → box-downscale; the default is the deterministic
      * stub (splitmix64 stream off the payload hash), so identical
      * payloads get identical grids and the hash plumbing is testable
      * end-to-end in this codec-less container.
      */
    def decodeGray(kind: String, bytes: Array[Byte], w: Int, h: Int): Array[Double] = {
      val h0 = bytes.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b)
      Array.tabulate(w * h) { i =>
        var z = h0 + (i + 1) * 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble * 255.0
      }
    }
  }

  object MediaCodec {
    /** The default stub: a deterministic 8-dim feature derived from the
      * raw bytes, so downstream joins/ANN are testable end-to-end.
      */
    object Stub extends MediaCodec {
      override def decode(kind: String, bytes: Array[Byte]): Array[Float] = {
        val h = bytes.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b)
        Array.tabulate(8)(i => (((h >>> (i * 8)) & 0xFF).toFloat / 255.0f))
      }
    }

    @volatile private var current: MediaCodec = Stub
    def register(codec: MediaCodec): Unit = { current = codec }
    def reset(): Unit = { current = Stub }
    def active: MediaCodec = current
  }

  /** The first REAL codec: pure-JDK `javax.imageio` decode for the
    * formats the JDK ships readers for (PNG, JPEG, GIF, BMP) — headless-
    * safe, no native libs. Registered via [[MediaCodec.register]] or
    * passed explicitly to the pipeline entry points.
    *
    * Exactness contract (what the oracle row pins): luma is integer
    * Rec.601 — `(299·r + 587·g + 114·b + 500) / 1000` in integer
    * arithmetic — and single-band (grayscale) images read their raster
    * samples DIRECTLY, bypassing `getRGB`'s gray→sRGB color transform,
    * so an 8-bit grayscale PNG decodes to its exact stored bytes and a
    * stored-pixel oracle can recompute the hash bit-for-bit. Box
    * downscale averages those integer lumas (exact when source == target
    * grid, e.g. an 8×8 fixture hashed at 8×8).
    *
    * Undecodable payloads: `strict = true` throws (curation pipelines
    * route rejects explicitly); default falls back to the deterministic
    * [[MediaCodec.Stub]] so a mixed corpus keeps flowing.
    */
  final class ImageIoCodec(strict: Boolean = false) extends MediaCodec {
    private def img(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (bytes.isEmpty) None
      else Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))

    override def decodeGray(kind: String, bytes: Array[Byte], w: Int, h: Int): Array[Double] =
      img(bytes) match {
        case Some(im) => ImageIoCodec.grayGrid(im, w, h)
        case None if strict => throw new IllegalArgumentException(
          s"ImageIoCodec: undecodable $kind payload (${bytes.length} bytes)")
        case None => super.decodeGray(kind, bytes, w, h)
      }

    /** 8-dim feature: row means of the 8×8 luma grid, scaled to [0, 1]
      * — matches the stub's dimensionality so downstream ANN/dedup
      * plumbing is codec-agnostic.
      */
    override def decode(kind: String, bytes: Array[Byte]): Array[Float] =
      img(bytes) match {
        case Some(im) =>
          val g = ImageIoCodec.grayGrid(im, 8, 8)
          Array.tabulate(8) { r =>
            var s = 0.0; var c = 0
            while (c < 8) { s += g(r * 8 + c); c += 1 }
            (s / 8.0 / 255.0).toFloat
          }
        case None if strict => throw new IllegalArgumentException(
          s"ImageIoCodec: undecodable $kind payload (${bytes.length} bytes)")
        case None => MediaCodec.Stub.decode(kind, bytes)
      }
  }

  object ImageIoCodec {
    /** Box-downscaled `w`×`h` integer-luma grid of a decoded image
      * (row-major doubles, [0, 255]); single-band rasters read their
      * samples directly (exact), multi-band goes through RGB luma.
      */
    private[ml] def grayGrid(
        im: java.awt.image.BufferedImage, w: Int, h: Int): Array[Double] = {
      val sw = im.getWidth
      val sh = im.getHeight
      val raster = im.getRaster
      val singleBand = raster.getNumBands == 1
      val out = new Array[Double](w * h)
      var y = 0
      while (y < h) {
        val y0 = y * sh / h
        val y1 = math.max((y + 1) * sh / h, y0 + 1)
        var x = 0
        while (x < w) {
          val x0 = x * sw / w
          val x1 = math.max((x + 1) * sw / w, x0 + 1)
          var sum = 0L
          var n = 0
          var yy = y0
          while (yy < y1) {
            var xx = x0
            while (xx < x1) {
              val luma =
                if (singleBand) raster.getSample(xx, yy, 0)
                else {
                  val rgb = im.getRGB(xx, yy)
                  val r = (rgb >> 16) & 0xFF
                  val g = (rgb >> 8) & 0xFF
                  val b = rgb & 0xFF
                  (299 * r + 587 * g + 114 * b + 500) / 1000
                }
              sum += luma
              n += 1
              xx += 1
            }
            yy += 1
          }
          out(y * w + x) = sum.toDouble / n
          x += 1
        }
        y += 1
      }
      out
    }

    /** 8-bit grayscale PNG encoder (fixture/test generator): pixel
      * (x, y) = `gray(y*w + x)` & 0xFF, written via the raster so the
      * stored byte IS the requested value (PNG is lossless — the decode
      * side reads the identical byte back).
      */
    def grayPng(w: Int, h: Int, gray: Int => Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = im.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, gray(y * w + x) & 0xFF); x += 1 }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", baos)
      baos.toByteArray
    }

    /** RGB JPEG encoder (for decode-path tests; JPEG is lossy so only
      * decodability/shape is assertable, not bit identity).
      */
    def rgbJpeg(w: Int, h: Int, rgb: Int => Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { im.setRGB(x, y, rgb(y * w + x)); x += 1 }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "jpg", baos)
      baos.toByteArray
    }
  }

  /** Per-partition feature extraction — batches flow through the executor
    * without driver round-trips; output schema fixed by the case class
    * Encoder. Partition sizing: media rows are fat, so repartition by
    * bytes (maxPartitionBytes) upstream, not row count.
    */
  def extractFeatures(media: DataFrame, codec: MediaCodec = MediaCodec.active)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    // codec captured at plan time, ships in the closure
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val bytes = Option(m.bytes).getOrElse(Array.emptyByteArray)
        MediaFeatures(m.media_id, m.kind, bytes.length.toLong,
          md5Hex(bytes), codec.decode(m.kind, bytes))
      }
    }
  }

  /** Frame-sampling plan for video payloads: emit (media_id, frame_no)
    * rows for every `everyN`th frame — pure column ops; the decode of the
    * sampled frame is again the registered [[MediaCodec]].
    */
  def sampleFrames(media: DataFrame, frameCountCol: String, everyN: Int): DataFrame =
    media.select(col("media_id"),
      explode(sequence(lit(0), greatest(col(frameCountCol) - 1, lit(0)), lit(everyN)))
        .as("frame_no"))

  /** Batched variant with the exact `mapInPandas` batch shape: the codec
    * receives BATCHES of rows (an Arrow record batch's analogue), which
    * is how a vectorized decoder amortizes per-call overhead;
    * `batchSize` bounds executor memory against fat media rows. Results
    * are identical to [[extractFeatures]] — only the call shape differs.
    */
  def extractFeaturesBatched(media: DataFrame, batchSize: Int = 64,
      codec: MediaCodec = MediaCodec.active)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // the whole batch goes to the codec vectorized (decodeBatch);
        // kinds within a batch may mix, so group by kind first
        batch.groupBy(_.kind).iterator.flatMap { case (kind, ms) =>
          val payloads = ms.map(m => Option(m.bytes).getOrElse(Array.emptyByteArray))
          val feats = codec.decodeBatch(kind, payloads)
          ms.lazyZip(payloads).lazyZip(feats).map { (m, bytes, f) =>
            MediaFeatures(m.media_id, m.kind, bytes.length.toLong, md5Hex(bytes), f)
          }
        }
      }
    }
  }

  /** Perceptual hash per media row — the image/audio cousin of text
    * SimHash (public-knowledge aHash/dHash constructions). `ahash`:
    * 8×8 gray grid, bit i = pixel_i > grid mean. `dhash`: 9×8 grid
    * (9 columns × 8 rows), bit (r,c) = p(r,c) < p(r,c+1) — horizontal
    * gradient signs, robust to uniform brightness shifts. Both are one
    * map-side pass through the registered [[MediaCodec]]'s
    * `decodeGray`; nothing shuffles. Returns `(media_id, phash)`.
    */
  def perceptualHashes(media: DataFrame, algo: String = "ahash",
      codec: MediaCodec = MediaCodec.active)(
      implicit spark: SparkSession): DataFrame = {
    require(algo == "ahash" || algo == "dhash", s"algo: $algo")
    import spark.implicits._
    // codec: plan-time capture, ships in the closure
    val aHash = algo == "ahash"
    media.as[MediaRow].map { m =>
      val bytes = Option(m.bytes).getOrElse(Array.emptyByteArray)
      val h =
        if (aHash) {
          val g = codec.decodeGray(m.kind, bytes, 8, 8)
          val mean = g.sum / 64.0
          var acc = 0L; var i = 0
          while (i < 64) { if (g(i) > mean) acc |= (1L << i); i += 1 }
          acc
        } else {
          val g = codec.decodeGray(m.kind, bytes, 9, 8)
          var acc = 0L; var r = 0
          while (r < 8) {
            var c = 0
            while (c < 8) {
              if (g(r * 9 + c) < g(r * 9 + c + 1)) acc |= (1L << (r * 8 + c))
              c += 1
            }
            r += 1
          }
          acc
        }
      (m.media_id, h)
    }.toDF("media_id", "phash")
  }

  /** Perceptual near-dup pairs: [[perceptualHashes]] →
    * [[Dedup.hamming64Pairs]] (4×16-bit banded self-join — recall 1 at
    * `maxHamming` ≤ 3, never all-pairs). Returns
    * `(id_a, id_b, hamming)`.
    */
  def phashPairs(media: DataFrame, algo: String = "ahash", maxHamming: Int = 3,
      maxBucket: Int = 500, saltCap: Int = 10000)(
      implicit spark: SparkSession): DataFrame =
    Dedup.hamming64Pairs(perceptualHashes(media, algo), "media_id", "phash",
      maxHamming, maxBucket, saltCap)

  /** Media near-dup detection: decoded features feed the embedding dedup
    * path ([[Dedup.embeddingPairs]]) — the image/audio analogue of text
    * minhash. Returns (id_a, id_b, cosine) pairs above `threshold`.
    */
  def mediaNearDupPairs(media: DataFrame, threshold: Double = 0.999)(
      implicit spark: SparkSession): DataFrame = {
    val feats = extractFeatures(media).toDF()
      .select(col("media_id"), col("feature"))
    Dedup.embeddingPairs(feats, "media_id", "feature", dim = 8,
      threshold = threshold, nPlanes = 6)
  }

  /** The second REAL codec: pure-JDK WAV/PCM audio decode — a clean-room
    * RIFF/WAVE container parse (the public WAVE format spec: `RIFF` →
    * `WAVE` → `fmt ` chunk with audioFormat/channels/sampleRate/bits →
    * `data` chunk of little-endian interleaved frames). Supports the PCM
    * encodings that cover real corpora: unsigned 8-bit, signed 16/24/32-
    * bit LE. No `javax.sound` dependency — the 44-byte canonical header
    * plus chunk walk is simpler and fully deterministic, so a stored-
    * sample oracle can recompute every derived stat bit-for-bit.
    *
    * Divergence note: the reference has no audio pipeline at all — this
    * is part of the training-data surface this engine adds. Video stays
    * a stub behind the same SPI ([[MediaCodec]]): there is no pure-JDK
    * video codec, so a real deployment registers its own (see
    * DIVERGENCES.md).
    *
    * Undecodable payloads: `strict = true` throws; default falls back to
    * the deterministic [[MediaCodec.Stub]] so a mixed corpus keeps
    * flowing (the ImageIoCodec contract).
    */
  final class WavPcmCodec(strict: Boolean = false) extends MediaCodec {
    /** 8-dim feature: mean |sample| over 8 equal time segments, scaled
      * to [0, 1] by full-scale — an amplitude-envelope signature with
      * the stub's dimensionality so downstream ANN/dedup plumbing is
      * codec-agnostic.
      */
    override def decode(kind: String, bytes: Array[Byte]): Array[Float] =
      WavPcmCodec.decodePcm(bytes) match {
        case Some(p) if p.samples.nonEmpty =>
          val full = (1L << (p.bitsPerSample - 1)).toDouble
          val n = p.samples.length
          Array.tabulate(8) { seg =>
            val lo = (seg.toLong * n / 8).toInt
            val hi = math.max(((seg + 1).toLong * n / 8).toInt, lo + 1).min(n)
            var s = 0.0; var i = lo
            while (i < hi) { s += math.abs(p.samples(i).toDouble); i += 1 }
            (s / (hi - lo) / full).toFloat
          }
        case Some(_) => Array.fill(8)(0.0f)
        case None if strict => throw new IllegalArgumentException(
          s"WavPcmCodec: undecodable $kind payload (${bytes.length} bytes)")
        case None => MediaCodec.Stub.decode(kind, bytes)
      }
  }

  object WavPcmCodec {
    /** Decoded PCM payload: `samples` are interleaved channel frames in
      * file order, sign-extended to Int (8-bit unsigned is re-centered
      * to signed, matching every mainstream decoder).
      */
    final case class Pcm(sampleRate: Int, channels: Int, bitsPerSample: Int,
        samples: Array[Int])

    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
        ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

    /** RIFF/WAVE chunk walk → PCM samples; None on anything that is not
      * a well-formed PCM WAV (the caller decides strict/fallback).
      */
    def decodePcm(bytes: Array[Byte]): Option[Pcm] = {
      if (bytes.length < 44) return None
      if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
            bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'))
        return None
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      var data: Option[(Int, Int)] = None // (offset, len)
      var o = 12
      while (o + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
        val id = new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val len = le32(bytes, o + 4)
        if (len < 0 || o + 8 + len > bytes.length) return None
        id match {
          case "fmt " if len >= 16 =>
            val audioFormat = le16(bytes, o + 8)
            if (audioFormat != 1) return None // PCM only
            fmt = Some((le16(bytes, o + 10), le32(bytes, o + 12), le16(bytes, o + 22)))
          case "data" => data = Some((o + 8, len))
          case _ => () // LIST/INFO/fact/… chunks skip cleanly
        }
        o += 8 + len + (len & 1) // chunks are word-aligned
      }
      for ((ch, rate, bits) <- fmt; (off, len) <- data;
           if ch > 0 && rate > 0 && Set(8, 16, 24, 32)(bits)) yield {
        val bpS = bits / 8
        val n = len / bpS
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val p = off + i * bpS
          out(i) = bits match {
            case 8  => (bytes(p) & 0xFF) - 128
            case 16 => le16(bytes, p).toShort.toInt
            case 24 =>
              val u = (bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8) |
                ((bytes(p + 2) & 0xFF) << 16)
              (u << 8) >> 8 // sign-extend 24 → 32
            case _  => le32(bytes, p)
          }
          i += 1
        }
        Pcm(rate, ch, bits, out)
      }
    }

    /** Canonical 44-byte-header 16-bit PCM WAV encoder (fixture/test
      * generator — the decode side reads the identical samples back;
      * PCM is lossless).
      */
    def wavPcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
      require(channels > 0 && samples.length % channels == 0,
        s"channels: $channels, samples: ${samples.length}")
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      bb.putShort(1).putShort(channels.toShort).putInt(sampleRate)
      bb.putInt(sampleRate * channels * 2) // byte rate
      bb.putShort((channels * 2).toShort).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }
  }

  /** Per-payload integer audio stats through the PCM decode — the exact
    * (oracle-verifiable) face of the audio path: every column is integer
    * arithmetic over the stored samples, so a closed-form fixture
    * recomputes bit-for-bit. One map-side pass, nothing shuffles.
    * Returns `(media_id, sample_rate, channels, n_samples, sum_s, min_s,
    * max_s)`; undecodable rows are NULL-stats (strict decode belongs to
    * the codec, not the stats pass).
    */
  def audioStats(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].map { m =>
      val bytes = Option(m.bytes).getOrElse(Array.emptyByteArray)
      WavPcmCodec.decodePcm(bytes) match {
        case Some(p) =>
          var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue; var i = 0
          while (i < p.samples.length) {
            val s = p.samples(i)
            sum += s; if (s < mn) mn = s; if (s > mx) mx = s; i += 1
          }
          (m.media_id, Some(p.sampleRate.toLong), Some(p.channels.toLong),
            Some(p.samples.length.toLong), Some(sum),
            if (p.samples.isEmpty) None else Some(mn.toLong),
            if (p.samples.isEmpty) None else Some(mx.toLong))
        case None =>
          (m.media_id, None, None, None, None, None, None)
      }
    }.toDF("media_id", "sample_rate", "channels", "n_samples",
      "sum_s", "min_s", "max_s")
  }

  /** Clean-room ISO base-media-file-format (ISO/IEC 14496-12) box walk —
    * the REAL half of the video path. Frame DECODE has no pure-JDK codec
    * (the [[MediaCodec]] stub + DIVERGENCES.md #15 cover it), but the
    * container METADATA a 100 TB curation pipeline actually filters on —
    * duration, resolution, codec fourcc, track layout — needs no codec
    * at all: it is a length-prefixed box tree. This parser reads exactly
    * that, so `filter(duration_ms between …)` / `width >= 720` /
    * `video_codec = 'avc1'` run over raw MP4 payloads map-side.
    *
    * Box grammar (public spec): u32 big-endian size + 4-char type;
    * size==1 → u64 largesize follows; size==0 → box extends to EOF.
    * Walked containers: `moov`, `trak`, `mdia`, `minf`, `stbl`. Read
    * leaves: `ftyp` (major brand), `mvhd` (movie timescale/duration,
    * versions 0 and 1), `tkhd` (16.16-fixed width/height, v0/v1),
    * `hdlr` (handler `vide`/`soun`), `stsd` (first sample-entry fourcc),
    * `mdhd` (media timescale, v0/v1), `stts` (sample counts/deltas ⇒
    * frame count and fps), `mdat` (payload bytes ⇒ bit-rate estimate).
    * Unknown boxes skip by their declared size; any malformed length →
    * None (never a partial guess).
    */
  object Mp4Meta {
    /** Parsed container metadata. `durationMs` = duration·1000/timescale
      * in integer arithmetic (exact, oracle-reproducible). `nFrames` =
      * the video track's stts sample count; `fpsMilli` = frames-per-
      * second ·1000 = nFrames·mediaTimescale·1000 / Σ(count·delta),
      * exact integer floor (None when stts/mdhd are absent or the
      * untrusted u32 fields would overflow the product). `mdatBytes` =
      * total mdat payload; `bitrateBps` = mdatBytes·8000 / durationMs
      * (None at zero duration) — the fps≥24 / bit-rate-band curation
      * filters need exactly these, still with no frame decode.
      */
    final case class Meta(brand: String, timescale: Long, durationMs: Long,
        nTracks: Int, width: Int, height: Int,
        videoCodec: Option[String], audioCodec: Option[String],
        nFrames: Option[Long], fpsMilli: Option[Long],
        mdatBytes: Long, bitrateBps: Option[Long])

    private def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
        ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
    private def be64(b: Array[Byte], o: Int): Long =
      (be32(b, o) << 32) | be32(b, o + 4)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** One box header: (type, payloadOffset, payloadEnd) or None if the
      * declared size is malformed / runs past `end`.
      */
    private def box(b: Array[Byte], o: Int, end: Int): Option[(String, Int, Int)] = {
      if (o + 8 > end) return None
      val size = be32(b, o)
      val typ = fourcc(b, o + 4)
      if (size == 0L) Some((typ, o + 8, end)) // to end-of-enclosure
      else if (size == 1L) {
        if (o + 16 > end) return None
        val large = be64(b, o + 8)
        if (large < 16 || o + large > end) None else Some((typ, o + 16, o + large.toInt))
      }
      else if (size < 8 || o + size > end) None
      else Some((typ, o + 8, o + size.toInt))
    }

    private final class Walk {
      var brand: String = null
      var timescale = 0L; var duration = 0L
      var nTracks = 0; var width = 0; var height = 0
      var videoCodec: Option[String] = None
      var audioCodec: Option[String] = None
      var nFrames: Option[Long] = None
      var fpsMilli: Option[Long] = None
      var mdatBytes = 0L
      var malformed = false
      // per-trak state, committed when the trak closes. tTicks is BigInt:
      // stts count·delta terms are untrusted u32·u32 products that can
      // overflow a Long — exact accumulation keeps the fps floor honest
      var tW = 0; var tH = 0; var tHandler: String = null; var tCodec: Option[String] = None
      var tMediaTs = 0L; var tSamples = 0L; var tTicks: BigInt = BigInt(0)

      def walk(b: Array[Byte], o0: Int, end: Int, depth: Int): Unit = {
        var o = o0
        while (o < end && !malformed) {
          box(b, o, end) match {
            case None => malformed = true
            case Some((typ, po, pe)) =>
              typ match {
                case "ftyp" if po + 4 <= pe => if (brand == null) brand = fourcc(b, po)
                case "moov" | "mdia" | "minf" | "stbl" => walk(b, po, pe, depth + 1)
                case "trak" =>
                  tW = 0; tH = 0; tHandler = null; tCodec = None
                  tMediaTs = 0L; tSamples = 0L; tTicks = BigInt(0)
                  walk(b, po, pe, depth + 1)
                  if (!malformed) {
                    nTracks += 1
                    if (tHandler == "vide") {
                      if (width == 0) { width = tW; height = tH }
                      if (videoCodec.isEmpty) videoCodec = tCodec
                      if (nFrames.isEmpty && tSamples > 0) {
                        nFrames = Some(tSamples)
                        // fps·1000 = samples·mediaTs·1000 / Σ(count·delta),
                        // exact floor; None on missing mdhd/zero ticks or
                        // a result past Long range (untrusted fields)
                        if (tMediaTs > 0 && tTicks > 0) {
                          val f = (BigInt(tSamples) * BigInt(tMediaTs) * 1000) / tTicks
                          if (f.isValidLong) fpsMilli = Some(f.toLong)
                        }
                      }
                    } else if (tHandler == "soun") {
                      if (audioCodec.isEmpty) audioCodec = tCodec
                    }
                  }
                case "mvhd" if po + 4 <= pe =>
                  val v = b(po) & 0xFF
                  if (v == 1 && po + 32 <= pe) {
                    timescale = be32(b, po + 20); duration = be64(b, po + 24)
                  } else if (v == 0 && po + 20 <= pe) {
                    timescale = be32(b, po + 12); duration = be32(b, po + 16)
                  } else malformed = true
                case "tkhd" if po + 4 <= pe =>
                  val v = b(po) & 0xFF
                  // width/height are the LAST 8 bytes (16.16 fixed) in
                  // both versions; offsets 76 (v0) / 88 (v1) from po
                  val wOff = if (v == 1) po + 88 else po + 76
                  if (wOff + 8 <= pe) {
                    tW = (be32(b, wOff) >>> 16).toInt
                    tH = (be32(b, wOff + 4) >>> 16).toInt
                  } else malformed = true
                case "hdlr" if po + 12 <= pe => tHandler = fourcc(b, po + 8)
                case "stsd" if po + 16 <= pe =>
                  // u8 version+flags, u32 entry_count, then first sample
                  // entry: u32 size + fourcc
                  if (be32(b, po + 4) > 0) tCodec = Some(fourcc(b, po + 12))
                case "mdhd" if po + 4 <= pe =>
                  // media timescale: the unit stts deltas are counted in
                  val v = b(po) & 0xFF
                  if (v == 1 && po + 24 <= pe) tMediaTs = be32(b, po + 20)
                  else if (v == 0 && po + 16 <= pe) tMediaTs = be32(b, po + 12)
                  else malformed = true
                case "stts" if po + 8 <= pe =>
                  // u32 entry_count, then (sample_count, sample_delta)
                  // u32 pairs: Σcount = frames, Σ(count·delta) = ticks
                  val n = be32(b, po + 4)
                  if (po + 8 + n * 8 > pe) malformed = true
                  else {
                    var i = 0
                    while (i < n) {
                      val c = be32(b, po + 8 + i * 8)
                      val d = be32(b, po + 12 + i * 8)
                      tSamples += c; tTicks += BigInt(c) * BigInt(d)
                      i += 1
                    }
                  }
                case "mdat" => mdatBytes += (pe - po).toLong
                case _ => () // free/udta/… skip by size
              }
              o = pe
          }
        }
        if (o != end) malformed = true
      }
    }

    /** Parse one payload; None unless it is a well-formed ISO-BMFF file
      * with an `ftyp` and a `moov`/`mvhd` (the caller decides fallback).
      */
    def parse(bytes: Array[Byte]): Option[Meta] = {
      if (bytes == null || bytes.length < 16) return None
      // cheap front gate: first box must be ftyp (the spec requires it
      // "as early as possible"; every real muxer puts it first)
      if (fourcc(bytes, 4) != "ftyp") return None
      val w = new Walk
      w.walk(bytes, 0, bytes.length, 0)
      // duration is an untrusted u64 (a v1 mvhd can carry ≥ 2^63 → be64
      // yields a negative Long; ·1000 overflows above Long.MaxValue/1000)
      // — treat either as malformed, keeping the no-partial-guess contract
      if (w.malformed || w.brand == null || w.timescale <= 0 ||
          w.duration < 0 || w.duration > Long.MaxValue / 1000) None
      else {
        val durMs = w.duration * 1000L / w.timescale
        val bitrate =
          if (durMs > 0 && w.mdatBytes > 0) Some(w.mdatBytes * 8000L / durMs)
          else None
        Some(Meta(w.brand, w.timescale, durMs,
          w.nTracks, w.width, w.height, w.videoCodec, w.audioCodec,
          w.nFrames, w.fpsMilli, w.mdatBytes, bitrate))
      }
    }

    /** Canonical minimal MP4 muxer (fixture/test generator — no frames,
      * just the metadata tree the parser reads back; the same role
      * [[WavPcmCodec.wavPcm16]] plays for audio). Emits
      * ftyp + moov{mvhd, trak{tkhd, mdia{[mdhd,] hdlr, minf{stbl{stsd
      * [, stts]}}}}…} + mdat, all version-0 boxes. With `nFrames` and
      * `frameDelta` > 0 the video trak carries an mdhd (media timescale
      * = movie timescale) and a one-entry stts so the parser's
      * nFrames/fpsMilli are exercised; `mdatBytes` zero-bytes pad the
      * mdat for the bit-rate estimate.
      */
    def mp4Stub(brand: String, timescale: Int, duration: Long,
        video: Option[(Int, Int, String)], audioCodec: Option[String],
        nFrames: Long = 0L, frameDelta: Int = 0, mdatBytes: Int = 0): Array[Byte] = {
      require(brand.length == 4 && timescale > 0 && duration >= 0 &&
        nFrames >= 0 && frameDelta >= 0 && mdatBytes >= 0)
      // v0 mvhd/mdhd write u32 duration fields: overflow must fail LOUDLY
      // here, not truncate mod 2^32 while an oracle computes the full value
      require(duration < (1L << 32),
        s"mp4Stub: duration $duration overflows the v0 mvhd u32 field")
      require(nFrames * frameDelta < (1L << 32),
        s"mp4Stub: media duration ${nFrames * frameDelta} overflows the v0 mdhd u32 field")
      def bx(typ: String, payload: Array[Byte]*): Array[Byte] = {
        val n = 8 + payload.map(_.length).sum
        val bb = java.nio.ByteBuffer.allocate(n)
        bb.putInt(n).put(typ.getBytes("US-ASCII"))
        payload.foreach(bb.put)
        bb.array()
      }
      def u32(vs: Long*): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(vs.length * 4)
        vs.foreach(v => bb.putInt(v.toInt))
        bb.array()
      }
      val ftyp = bx("ftyp", brand.getBytes("US-ASCII"), u32(0),
        "isom".getBytes("US-ASCII"))
      val mvhd = bx("mvhd", u32(0, 0, 0, timescale, duration,
        0x00010000L, 0x01000000L, 0, 0), // rate, volume<<24|rsvd, rsvd
        u32(Seq.fill(9)(0L): _*), // unity matrix slots (parser skips)
        u32(Seq.fill(7)(0L): _*)) // pre_defined + next_track_ID
      def trak(handler: String, codec: String, w: Int, h: Int): Array[Byte] = {
        val tkhd = bx("tkhd", u32(0, 0, 0, 1, 0, duration),
          u32(Seq.fill(13)(0L): _*), // rsvd + layer/group + volume + matrix
          u32(w.toLong << 16, h.toLong << 16))
        val hdlr = bx("hdlr", u32(0, 0), handler.getBytes("US-ASCII"),
          u32(0, 0, 0), Array[Byte](0))
        val entry = bx(codec, new Array[Byte](8)) // rsvd6 + data_ref_index
        val stsd = bx("stsd", u32(0, 1), entry)
        val withFrames = handler == "vide" && nFrames > 0 && frameDelta > 0
        val stbl =
          if (withFrames) bx("stbl", stsd, bx("stts", u32(0, 1, nFrames, frameDelta.toLong)))
          else bx("stbl", stsd)
        val minf = bx("minf", stbl)
        val mdia =
          if (withFrames)
            // mdhd v0: creation/modification, timescale, duration, lang+pre
            bx("mdia", bx("mdhd", u32(0, 0, 0, timescale, nFrames * frameDelta, 0)),
              hdlr, minf)
          else bx("mdia", hdlr, minf)
        bx("trak", tkhd, mdia)
      }
      val traks = video.map { case (w, h, c) => trak("vide", c, w, h) }.toSeq ++
        audioCodec.map(c => trak("soun", c, 0, 0)).toSeq
      val moov = bx("moov", (mvhd +: traks): _*)
      val mdat = bx("mdat", new Array[Byte](mdatBytes))
      ftyp ++ moov ++ mdat
    }
  }

  /** Per-payload container metadata through the ISO-BMFF parse — the
    * video analogue of [[audioStats]]: one map-side pass, nothing
    * shuffles, unparseable rows are NULL-metadata so a mixed corpus
    * keeps flowing (strict routing belongs to the caller's filter).
    */
  def videoMeta(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].map { m =>
      Mp4Meta.parse(m.bytes) match {
        case Some(x) =>
          (m.media_id, Option(x.brand), Some(x.timescale), Some(x.durationMs),
            Some(x.nTracks.toLong), Some(x.width.toLong), Some(x.height.toLong),
            x.videoCodec, x.audioCodec,
            x.nFrames, x.fpsMilli, Some(x.mdatBytes), x.bitrateBps)
        case None =>
          (m.media_id, None: Option[String], None: Option[Long], None: Option[Long],
            None: Option[Long], None: Option[Long], None: Option[Long],
            None: Option[String], None: Option[String],
            None: Option[Long], None: Option[Long], None: Option[Long],
            None: Option[Long])
      }
    }.toDF("media_id", "brand", "timescale", "duration_ms", "n_tracks",
      "width", "height", "video_codec", "audio_codec",
      "n_frames", "fps_milli", "mdat_bytes", "bitrate_bps")
  }
}
