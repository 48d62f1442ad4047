package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns + typed metadata struct — the same
  * layout `spark.read.format("binaryFile")` produces and parquet stores
  * natively. The decode/feature kernels are the ONLY non-columnar steps;
  * they run per-partition (Scala analogue of `mapInPandas`: batch-at-a-
  * time, schema declared up front). The actual codec calls are STUBBED
  * (no image/audio libs in this container) behind `decodeStub` with a
  * deterministic fake, so the Spark-side plumbing — schema, batching,
  * partition sizing — is real and tested.
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

  /** Per-partition feature extraction — batches flow through the executor
    * without driver round-trips; output schema fixed by the case class
    * Encoder. Partition sizing: media rows are fat, so repartition by
    * bytes (maxPartitionBytes) upstream, not row count.
    */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    val codec = MediaCodec.active // captured at plan time, ships in the closure
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
  def extractFeaturesBatched(media: DataFrame, batchSize: Int = 64)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    val codec = MediaCodec.active
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
  def perceptualHashes(media: DataFrame, algo: String = "ahash")(
      implicit spark: SparkSession): DataFrame = {
    require(algo == "ahash" || algo == "dhash", s"algo: $algo")
    import spark.implicits._
    val codec = MediaCodec.active // plan-time capture, ships in the closure
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
}
