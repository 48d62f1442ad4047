package graft.ml

import graft.SparkSpec
import graft.ml.Multimodal.{MediaCodec, WavPcmCodec}
import org.apache.spark.sql.functions._

/** The second REAL media codec: clean-room RIFF/WAVE PCM decode through
  * the SPI (r12 directive 6) — PCM is lossless, so encode→decode is
  * bit-exact and every derived stat has a closed form.
  */
class WavPcmCodecSpec extends SparkSpec {

  private val codec = new Multimodal.WavPcmCodec(strict = true)

  test("16-bit PCM roundtrips bit-exactly through the canonical header") {
    val samples = Array.tabulate(200)(i => ((i * 373) % 65536 - 32768).toShort)
    val wav = WavPcmCodec.wavPcm16(44100, 1, samples)
    val p = WavPcmCodec.decodePcm(wav).get
    assert(p.sampleRate == 44100 && p.channels == 1 && p.bitsPerSample == 16)
    assert(p.samples.toSeq == samples.map(_.toInt).toSeq)
  }

  test("stereo frames stay interleaved in file order") {
    val samples = Array[Short](100, -100, 200, -200, 300, -300)
    val p = WavPcmCodec.decodePcm(WavPcmCodec.wavPcm16(8000, 2, samples)).get
    assert(p.channels == 2)
    assert(p.samples.toSeq == Seq(100, -100, 200, -200, 300, -300))
  }

  test("chunk walk skips LIST/fact chunks and honors word alignment") {
    // hand-build: RIFF [LIST(5, odd -> pad byte)] [fmt] [data]
    val base = WavPcmCodec.wavPcm16(16000, 1, Array[Short](10, -20, 30))
    val fmtAndData = base.drop(12) // the fmt + data chunks
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5, 0) // len 5 + pad
    val body = list ++ fmtAndData
    val bb = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
    bb.put("WAVE".getBytes("US-ASCII")).put(body)
    val p = WavPcmCodec.decodePcm(bb.array()).get
    assert(p.samples.toSeq == Seq(10, -20, 30))
  }

  test("8/24/32-bit PCM sign conventions decode exactly") {
    // 8-bit unsigned: build by hand (encoder is 16-bit only)
    def wav(bits: Int, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      bb.putShort(1).putShort(1).putInt(8000)
      bb.putInt(8000 * bits / 8).putShort((bits / 8).toShort).putShort(bits.toShort)
      bb.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
      bb.array()
    }
    val p8 = WavPcmCodec.decodePcm(wav(8, Array[Byte](0, 127.toByte, 128.toByte, 255.toByte))).get
    assert(p8.samples.toSeq == Seq(-128, -1, 0, 127)) // re-centered unsigned
    // 24-bit: 0x800000 is -8388608, 0x7FFFFF is max
    val p24 = WavPcmCodec.decodePcm(wav(24, Array[Byte](
      0, 0, 0x80.toByte, 0xFF.toByte, 0xFF.toByte, 0x7F.toByte))).get
    assert(p24.samples.toSeq == Seq(-8388608, 8388607))
    val p32 = WavPcmCodec.decodePcm(wav(32, Array[Byte](
      0, 0, 0, 0x80.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0x7F.toByte))).get
    assert(p32.samples.toSeq == Seq(Int.MinValue, Int.MaxValue))
  }

  test("feature is the 8-segment amplitude envelope, scaled to full scale") {
    // 80 samples: first half silent, second half full-scale
    val samples = Array.tabulate(80)(i => if (i < 40) 0.toShort else 32767.toShort)
    val f = codec.decode("audio", WavPcmCodec.wavPcm16(8000, 1, samples))
    assert(f.length == 8)
    assert(f.take(4).forall(_ == 0.0f), f.toSeq)
    assert(f.drop(4).forall(v => math.abs(v - 32767.0 / 32768.0) < 1e-6), f.toSeq)
  }

  test("strict rejects non-WAV payloads; lenient falls back to the stub") {
    val junk = Array.tabulate[Byte](100)(i => (i * 11).toByte)
    val e = intercept[IllegalArgumentException] { codec.decode("audio", junk) }
    assert(e.getMessage.contains("undecodable"))
    assert(new Multimodal.WavPcmCodec().decode("audio", junk).toSeq ==
      MediaCodec.Stub.decode("audio", junk).toSeq)
    // a non-PCM (e.g. float) fmt chunk is refused, not misread
    val base = WavPcmCodec.wavPcm16(8000, 1, Array[Short](1, 2))
    base(20) = 3 // audioFormat = IEEE float
    assert(WavPcmCodec.decodePcm(base).isEmpty)
  }

  test("audioStats computes integer stats distributed, NULLs for undecodable") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val rows = Seq(
      (1L, WavPcmCodec.wavPcm16(8000, 1, Array[Short](5, -3, 10, 0))),
      (2L, Array[Byte](1, 2, 3))) // undecodable
    val media = Multimodal.asMediaTable(rows.toDF("id", "wav"), "id", "wav", "audio")
    val got = Multimodal.audioStats(media).orderBy("media_id").collect()
    assert(got(0).getLong(1) == 8000L && got(0).getLong(3) == 4L &&
      got(0).getLong(4) == 12L && got(0).getLong(5) == -3L && got(0).getLong(6) == 10L)
    assert(got(1).isNullAt(1) && got(1).isNullAt(4))
  }
}
