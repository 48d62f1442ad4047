package graft.ml

import graft.SparkSpec
import graft.ml.Multimodal.{ImageIoCodec, MediaCodec}
import org.apache.spark.sql.functions._

/** The first REAL media codec: javax.imageio PNG/JPEG decode through the
  * SPI — generated images, not synthetic byte streams (r11 directive 4).
  */
class ImageIoCodecSpec extends SparkSpec {

  private val codec = new ImageIoCodec(strict = true)

  test("grayscale PNG decodes to its exact stored bytes (no sRGB transform)") {
    val vals = Array.tabulate(64)(i => (i * 4 + 1) % 256)
    val png = ImageIoCodec.grayPng(8, 8, vals)
    val g = codec.decodeGray("image", png, 8, 8)
    assert(g.toSeq == vals.map(_.toDouble).toSeq)
  }

  test("box downscale averages exact lumas (16x16 constant quadrants -> 2x2)") {
    // quadrants with gray 10 / 20 / 30 / 40
    val png = ImageIoCodec.grayPng(16, 16, i => {
      val x = i % 16; val y = i / 16
      (if (y < 8) (if (x < 8) 10 else 20) else (if (x < 8) 30 else 40))
    })
    val g = codec.decodeGray("image", png, 2, 2)
    assert(g.toSeq == Seq(10.0, 20.0, 30.0, 40.0))
  }

  test("JPEG decodes through the same SPI (lossy: shape + plausibility only)") {
    // a half-black/half-white 32x32 jpeg: row means must track the split
    val jpg = ImageIoCodec.rgbJpeg(32, 32, i =>
      if (i / 32 < 16) 0x000000 else 0xFFFFFF)
    val f = codec.decode("image", jpg)
    assert(f.length == 8)
    assert(f.take(4).forall(_ < 0.2f), s"dark rows: ${f.toSeq}")
    assert(f.drop(4).forall(_ > 0.8f), s"bright rows: ${f.toSeq}")
  }

  test("strict rejects garbage; lenient falls back to the stub deterministically") {
    val junk = Array.tabulate[Byte](100)(i => (i * 7).toByte)
    val e = intercept[IllegalArgumentException] { codec.decode("image", junk) }
    assert(e.getMessage.contains("undecodable"))
    val lenient = new ImageIoCodec()
    assert(lenient.decode("image", junk).toSeq == MediaCodec.Stub.decode("image", junk).toSeq)
    assert(lenient.decodeGray("image", junk, 8, 8).toSeq ==
      MediaCodec.Stub.decodeGray("image", junk, 8, 8).toSeq)
  }

  test("aHash over real PNGs: identical images collide, inverted images differ") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val rows = Seq(
      (1L, ImageIoCodec.grayPng(8, 8, i => (i * 4) % 256)),
      (2L, ImageIoCodec.grayPng(8, 8, i => (i * 4) % 256)),   // identical to 1
      (3L, ImageIoCodec.grayPng(8, 8, i => 255 - (i * 4) % 256))) // inverted
    val media = Multimodal.asMediaTable(rows.toDF("id", "png"), "id", "png", "image")
    val h = Multimodal.perceptualHashes(media, "ahash", codec = codec)
      .orderBy("media_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(h(0)._2 == h(1)._2)
    assert(h(0)._2 == ~h(2)._2) // inversion flips every above-mean bit
  }

  test("extractFeatures + batched path agree through the real codec") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val rows = (0L until 20L).map(id =>
      (id, ImageIoCodec.grayPng(8, 8, i => ((id * 31 + i * 7) % 256).toInt)))
    val media = Multimodal.asMediaTable(rows.toDF("id", "png"), "id", "png", "image")
    val a = Multimodal.extractFeatures(media, codec = codec).toDF()
      .select("media_id", "feature").orderBy("media_id").collect()
    val b = Multimodal.extractFeaturesBatched(media, batchSize = 7, codec = codec)
      .toDF().select("media_id", "feature").orderBy("media_id").collect()
    assert(a.length == 20)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      assert(x.getSeq[Float](1) == y.getSeq[Float](1))
    }
  }

  test("registered codec flows through phashPairs end to end (planted dup)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    Multimodal.MediaCodec.register(new ImageIoCodec(strict = true))
    try {
      val rows = (0L until 40L).map { id =>
        val seed = if (id == 39L) 7L else id // 39 duplicates image 7
        (id, ImageIoCodec.grayPng(8, 8, i => ((seed * 13 + i * 11) % 256).toInt))
      }
      val media = Multimodal.asMediaTable(rows.toDF("id", "png"), "id", "png", "image")
      val pairs = Multimodal.phashPairs(media, "ahash", maxHamming = 0)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((7L, 39L)), s"pairs: $pairs")
    } finally Multimodal.MediaCodec.reset()
  }
}
