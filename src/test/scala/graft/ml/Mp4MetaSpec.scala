package graft.ml

import graft.SparkSpec
import graft.ml.Multimodal.Mp4Meta
import org.apache.spark.sql.functions._

/** The REAL half of the video path: clean-room ISO-BMFF (MP4) box walk.
  * No frame decode (no pure-JDK video codec exists — DIVERGENCES.md
  * #15); container METADATA is a length-prefixed box tree and parses
  * exactly, so duration/resolution/codec filters run over raw payloads.
  */
class Mp4MetaSpec extends SparkSpec {

  test("mux → parse roundtrips every metadata field") {
    val bytes = Mp4Meta.mp4Stub("mp42", timescale = 1000, duration = 7500,
      video = Some((1280, 720, "avc1")), audioCodec = Some("mp4a"))
    val m = Mp4Meta.parse(bytes).get
    assert(m.brand == "mp42")
    assert(m.timescale == 1000L && m.durationMs == 7500L)
    assert(m.nTracks == 2 && m.width == 1280 && m.height == 720)
    assert(m.videoCodec.contains("avc1") && m.audioCodec.contains("mp4a"))
  }

  test("duration_ms is exact integer arithmetic across timescales") {
    // 90kHz ticks (the common video timescale): 123457 ticks → 1371 ms
    val bytes = Mp4Meta.mp4Stub("isom", 90000, 123457L, Some((640, 480, "hev1")), None)
    val m = Mp4Meta.parse(bytes).get
    assert(m.durationMs == 123457L * 1000L / 90000L)
    assert(m.nTracks == 1 && m.audioCodec.isEmpty)
  }

  test("audio-only file: no width/height, soun handler routes the codec") {
    val m = Mp4Meta.parse(Mp4Meta.mp4Stub("M4A ", 44100, 44100L * 3,
      video = None, audioCodec = Some("mp4a"))).get
    assert(m.width == 0 && m.height == 0 && m.videoCodec.isEmpty)
    assert(m.audioCodec.contains("mp4a") && m.nTracks == 1)
  }

  test("unknown boxes skip by size; largesize (size==1) boxes walk") {
    val base = Mp4Meta.mp4Stub("mp42", 600, 1200, Some((320, 240, "avc1")), None)
    // splice an unknown box between ftyp and moov
    val ftypLen = java.nio.ByteBuffer.wrap(base).getInt
    val unk = java.nio.ByteBuffer.allocate(17).putInt(17)
      .put("skip".getBytes("US-ASCII")).put(Array.fill[Byte](9)(42)).array()
    val spliced = base.take(ftypLen) ++ unk ++ base.drop(ftypLen)
    assert(Mp4Meta.parse(spliced).get.durationMs == 2000L)
    // rewrite the trailing mdat as a largesize box (size==1 + u64)
    val noMdat = base.dropRight(8)
    val large = java.nio.ByteBuffer.allocate(16).putInt(1)
      .put("mdat".getBytes("US-ASCII")).putLong(16L).array()
    assert(Mp4Meta.parse(noMdat ++ large).get.width == 320)
  }

  test("version-1 mvhd (64-bit duration) reads the v1 offsets") {
    val v0 = Mp4Meta.mp4Stub("mp42", 600, 300, None, Some("mp4a"))
    // rebuild the mvhd payload as version 1: creation/modification are
    // u64, timescale u32, duration u64; pad the matrix region identically
    def bx(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val p = java.nio.ByteBuffer.allocate(112)
    p.putInt(0x01000000) // version 1, flags 0
    p.putLong(0L).putLong(0L).putInt(600).putLong(5000000000L) // > 2^32 ticks
    p.put(new Array[Byte](112 - 32))
    val mvhd1 = bx("mvhd", p.array())
    // take ftyp as-is, rebuild moov{mvhd1} (drop the trak for brevity)
    val ftypLen = java.nio.ByteBuffer.wrap(v0).getInt
    val file = v0.take(ftypLen) ++ bx("moov", mvhd1)
    val m = Mp4Meta.parse(file).get
    assert(m.timescale == 600L && m.durationMs == 5000000000L * 1000L / 600L)
  }

  test("stts/mdhd/mdat: frame count, fps and bit-rate estimate roundtrip") {
    // 25 fps at 90kHz media ticks: delta 3600; 2.5 s of mdat at 1000 B
    val bytes = Mp4Meta.mp4Stub("mp42", timescale = 90000, duration = 225000L,
      video = Some((1280, 720, "avc1")), audioCodec = Some("mp4a"),
      nFrames = 62, frameDelta = 3600, mdatBytes = 1000)
    val m = Mp4Meta.parse(bytes).get
    assert(m.nFrames.contains(62L))
    // fps·1000 = 62·90000·1000 / (62·3600) = 90000·1000/3600 = 25000
    assert(m.fpsMilli.contains(25000L))
    assert(m.mdatBytes == 1000L)
    assert(m.durationMs == 2500L)
    assert(m.bitrateBps.contains(1000L * 8000 / 2500)) // 3200 bps
    // non-integral fps floors exactly: 90000·1000 // 3003 = 29970 (29.97)
    val ntsc = Mp4Meta.parse(Mp4Meta.mp4Stub("mp42", 90000, 90090L,
      Some((640, 480, "avc1")), None, nFrames = 30, frameDelta = 3003)).get
    assert(ntsc.fpsMilli.contains(29970L))
    // no stts (legacy stub shape): all four estimates stay None/0
    val bare = Mp4Meta.parse(Mp4Meta.mp4Stub("mp42", 600, 1200,
      Some((320, 240, "avc1")), None)).get
    assert(bare.nFrames.isEmpty && bare.fpsMilli.isEmpty)
    assert(bare.mdatBytes == 0L && bare.bitrateBps.isEmpty)
  }

  test("mp4Stub refuses u32-overflow durations loudly (no silent mod-2^32)") {
    intercept[IllegalArgumentException] {
      Mp4Meta.mp4Stub("mp42", 600, 1L << 32, None, Some("mp4a"))
    }
    intercept[IllegalArgumentException] { // mdhd duration = nFrames·delta
      Mp4Meta.mp4Stub("mp42", 600, 600, Some((320, 240, "avc1")), None,
        nFrames = 1L << 20, frameDelta = 1 << 12)
    }
  }

  test("v1 mvhd u64 duration is untrusted: >= 2^63 or > MaxValue/1000 → None") {
    def withV1Duration(d: Long): Array[Byte] = {
      val v0 = Mp4Meta.mp4Stub("mp42", 600, 300, None, Some("mp4a"))
      def bx(typ: String, payload: Array[Byte]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
        bb.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
        bb.array()
      }
      val p = java.nio.ByteBuffer.allocate(112)
      p.putInt(0x01000000).putLong(0L).putLong(0L).putInt(600).putLong(d)
      p.put(new Array[Byte](112 - 32))
      val ftypLen = java.nio.ByteBuffer.wrap(v0).getInt
      v0.take(ftypLen) ++ bx("moov", bx("mvhd", p.array()))
    }
    assert(Mp4Meta.parse(withV1Duration(-1L)).isEmpty) // u64 >= 2^63
    assert(Mp4Meta.parse(withV1Duration(Long.MaxValue / 1000 + 1)).isEmpty)
    assert(Mp4Meta.parse(withV1Duration(Long.MaxValue / 1000))
      .exists(_.durationMs == Long.MaxValue / 1000 * 1000 / 600))
  }

  test("malformed lengths and non-MP4 payloads refuse, never partial") {
    assert(Mp4Meta.parse(null).isEmpty)
    assert(Mp4Meta.parse(Array.emptyByteArray).isEmpty)
    assert(Mp4Meta.parse("not an mp4 file at all....".getBytes).isEmpty)
    val ok = Mp4Meta.mp4Stub("mp42", 600, 600, Some((320, 240, "avc1")), None)
    assert(Mp4Meta.parse(ok.dropRight(5)).isEmpty) // truncated mid-box
    val badLen = ok.clone()
    badLen(ok.length - 8 + 3) = 99 // mdat size now overruns EOF
    assert(Mp4Meta.parse(badLen).isEmpty)
  }

  test("videoMeta: distributed map-side parse, NULL row for junk") {
    import spark.implicits._
    val rows = Seq(
      (1L, Mp4Meta.mp4Stub("mp42", 1000, 4000, Some((1920, 1080, "avc1")), Some("mp4a"))),
      (2L, Mp4Meta.mp4Stub("isom", 90000, 180000, Some((854, 480, "hev1")), None)),
      (3L, "garbage".getBytes))
    val media = Multimodal.asMediaTable(rows.toDF("id", "bin"), "id", "bin", "video")
    val got = Multimodal.videoMeta(media)(spark)
      .orderBy("media_id").collect()
    assert(got(0).getAs[Long]("duration_ms") == 4000L)
    assert(got(0).getAs[String]("video_codec") == "avc1")
    assert(got(0).getAs[Long]("n_tracks") == 2L)
    assert(got(1).getAs[Long]("width") == 854L)
    assert(got(1).getAs[String]("audio_codec") == null)
    assert(got(2).isNullAt(got(2).fieldIndex("brand")))
    // the metadata filter a curation pipeline runs: no shuffle in it
    val plan = Multimodal.videoMeta(media)(spark)
      .filter(col("width") >= 854 && col("duration_ms") < 5000)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"metadata filter must stay map-side:\n$plan")
  }
}
