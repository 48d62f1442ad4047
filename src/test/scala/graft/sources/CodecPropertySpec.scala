package graft.sources

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property laws for the round-12 codecs, PropertySpec-style (raw
  * ScalaCheck generators, fixed seeds — the scalatest bridge is not in
  * the offline cache): bracket-escape split/join inversion, BIFF8
  * roundtrip identity on random typed frames, box-downscale exactness
  * against an independent reference average, and text-table
  * render→parse inversion.
  */
class CodecPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 8): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1742L + i)))

  test("splitBracketEscaped inverts join for fields of balanced bracket groups") {
    val plain = Gen.listOfN(4, Gen.oneOf(('a' to 'z') ++ Seq(' ', '.', '-')))
      .map(_.mkString)
    // balanced group, possibly nested one level, delimiters INSIDE
    val inner = Gen.oneOf(Gen.const("x,y"), Gen.const(",,"), plain,
      plain.map(p => s"[$p,$p]"))
    val group = inner.map(i => s"($i)")
    val atom = Gen.oneOf(plain, group)
    val field = Gen.chooseNum(0, 3).flatMap(n => Gen.listOfN(n, atom).map(_.mkString))
    samples(Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, field)), n = 20)
      .foreach { fields =>
        val line = fields.mkString(",")
        val got = Readers.splitBracketEscaped(line, ',', '"', "([", "])")
        assert(got.toSeq == fields, s"line <$line>")
      }
  }

  test("writeXls -> readXls identity on random typed frames (strings-mode canon)") {
    val str = Gen.oneOf(
      Gen.const("嗨 ✓"), Gen.alphaNumStr.map(_.take(30)),
      Gen.listOfN(6, Gen.choose(0x20, 0x2FF)).map(_.map(_.toChar).mkString),
      Gen.const("a,b\"c"))
    // longs stay inside the reader's 1e15 integral-render window (the
    // documented boundary shared with the xlsx reader: beyond it the
    // canonical form is scientific)
    val row = Gen.zip(
      Gen.chooseNum(-999999999999999L / 10, 999999999999999L / 10),
      Gen.chooseNum(-1e12, 1e12),
      Gen.oneOf(true, false),
      Gen.option(str))
    samples(Gen.listOfN(15, row), n = 5).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("l", "d", "b", "s")
      val p = java.nio.file.Files.createTempFile(s"xlsprop_$i", ".xls").toString
      Xls.writeXls(df, p)
      val back = Xls.readXls(spark, p, guessDatatypes = false).collect()
      val want = df.collect()
      assert(back.length == want.length, s"sample $i")
      def canonNum(s: String): BigDecimal = BigDecimal(s)
      back.sortBy(_.getString(0).toLong).zip(want.sortBy(_.getLong(0))).foreach {
        case (g, w) =>
          assert(g.getString(0).toLong == w.getLong(0), s"sample $i long")
          // doubles survive bit-exact through the f64 NUMBER record; the
          // reader renders the shortest repr, so compare numerically
          assert(canonNum(g.getString(1)) == BigDecimal(w.getDouble(1)) ||
            g.getString(1).toDouble == w.getDouble(1), s"sample $i dbl")
          assert(g.getString(2).toBoolean == w.getBoolean(2), s"sample $i bool")
          assert(Option(g.getString(3)) == Option(w.getString(3)).filter(_.nonEmpty),
            s"sample $i str: '${g.getString(3)}' vs '${w.getString(3)}'")
      }
      new java.io.File(p).delete()
    }
  }

  test("decodeGray box-downscale equals an independent reference average " +
      "for random grids and target dims") {
    val codec = new graft.ml.Multimodal.ImageIoCodec(strict = true)
    val gen = for {
      sw <- Gen.chooseNum(1, 24)
      sh <- Gen.chooseNum(1, 24)
      w <- Gen.chooseNum(1, 10)
      h <- Gen.chooseNum(1, 10)
      px <- Gen.listOfN(sw * sh, Gen.chooseNum(0, 255))
    } yield (sw, sh, w, h, px.toArray)
    samples(gen, n = 25).foreach { case (sw, sh, w, h, px) =>
      val png = graft.ml.Multimodal.ImageIoCodec.grayPng(sw, sh, i => px(i))
      val got = codec.decodeGray("image", png, w, h)
      // independent reference: same box geometry, naive double math
      val want = Array.tabulate(w * h) { cell =>
        val y = cell / w; val x = cell % w
        val y0 = y * sh / h; val y1 = math.max((y + 1) * sh / h, y0 + 1)
        val x0 = x * sw / w; val x1 = math.max((x + 1) * sw / w, x0 + 1)
        val vals = for (yy <- y0 until y1; xx <- x0 until x1) yield px(yy * sw + xx)
        vals.map(_.toLong).sum.toDouble / vals.length
      }
      assert(got.toSeq == want.toSeq, s"dims $sw x $sh -> $w x $h")
    }
  }

  test("text-table render -> parse inversion for random space-bearing frames") {
    val cell = Gen.oneOf(
      Gen.const(null: String), Gen.const("two words"),
      Gen.alphaNumStr.map(s => if (s.isEmpty) "z" else s.take(12)),
      Gen.zip(Gen.alphaLowerStr.map(_.take(5)), Gen.alphaLowerStr.map(_.take(5)))
        .map { case (a, b) => s"${if (a.isEmpty) "a" else a} ${if (b.isEmpty) "b" else b}" })
    val row = Gen.zip(Gen.chooseNum(0L, 1L << 40), cell)
    samples(Gen.listOfN(12, row), n = 6).foreach { rows =>
      val df = rows.toDF("id", "v")
      Seq[(String, org.apache.spark.sql.DataFrame => String)](
        "simple" -> (d => TextTables.renderSimple(d)),
        "rst" -> (d => TextTables.renderRst(d))).foreach { case (fmt, render) =>
        val p = java.nio.file.Files.createTempFile("ttprop", s".$fmt").toString
        java.nio.file.Files.write(java.nio.file.Paths.get(p),
          render(df).getBytes("UTF-8"))
        val back = TextTables.readTextTable(spark, p, fmt, guessDatatypes = false)
          .collect().map(r => (r.getString(0).toLong, Option(r.getString(1))))
          .sortBy(_._1)
        val want = rows.map { case (i, v) => (i, Option(v)) }.sortBy(_._1)
        assert(back.toSeq == want, s"$fmt")
        new java.io.File(p).delete()
      }
    }
  }
}
