package graft

import graft.functions.TypeInference
import graft.operators._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the algebraic laws the reference's semantics imply
  * (SURVEY §5: sort total-order laws, join row-count identities, cast
  * round-trips). Raw ScalaCheck generators sampled with fixed seeds (the
  * scalatest-plus bridge is not in the offline cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 8): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("filterSplit partitions: |pass| + |fail| = |input| for any threshold") {
    val gen = Gen.zip(Gen.listOfN(30, Gen.chooseNum(-100.0, 100.0)), Gen.chooseNum(-100.0, 100.0))
    samples(gen).foreach { case (vs, t) =>
      val df = vs.toDF("v")
      val (p, f) = Filters.filterSplit(df, Seq(Filters.Criterion.cv("v", "<", t)))
      assert(p.count() + f.count() === vs.length.toLong)
    }
  }

  test("inner join row count = sum over keys of nA*nB (dict-equality identity)") {
    val gen = Gen.zip(Gen.listOfN(20, Gen.chooseNum(0, 4)), Gen.listOfN(20, Gen.chooseNum(0, 4)))
    samples(gen).foreach { case (as, bs) =>
      val expected = as.groupBy(identity).map { case (k, g) =>
        g.size.toLong * bs.count(_ == k)
      }.sum
      assert(Joins.join(as.toDF("k"), bs.toDF("k"), Seq("k"), Seq("k"), "inner").count() === expected)
    }
  }

  test("sorted output is a permutation and isSorted accepts it") {
    samples(Gen.listOfN(25, Gen.option(Gen.chooseNum(-50, 50))), 5).foreach { vs =>
      val df = vs.map(Tuple1(_)).toDF("v")
      for (mode <- Seq("excel", "unix")) {
        val s = Sorts.sorted(df, Seq("v" -> false), mode)
        assert(s.count() === vs.length.toLong)
        assert(Sorts.isSorted(s, Seq("v" -> false), mode), s"mode=$mode vs=$vs")
      }
    }
  }

  test("locale number round-trip: toString of doubles always parses back exactly") {
    samples(Gen.listOfN(20, Gen.chooseNum(-1e6, 1e6))).foreach { vs =>
      val got = vs.map(v => v.toString).toDF("s")
        .select(TypeInference.parseNumber($"s").as("v")).as[Double].collect()
      assert(got.toList === vs)
    }
  }

  test("concat is associative on row multisets") {
    val gen = Gen.zip(Gen.listOfN(5, Gen.alphaStr), Gen.listOfN(5, Gen.alphaStr),
      Gen.listOfN(5, Gen.alphaStr))
    samples(gen, 5).foreach { case (a, b, c) =>
      val (da, db, dc) = (a.toDF("s"), b.toDF("s"), c.toDF("s"))
      val left = SetOps.concat(SetOps.concat(da, db), dc)
      val right = SetOps.concat(da, SetOps.concat(db, dc))
      assert(SetOps.tablesEqual(left, right))
    }
  }

  test("dropDuplicatesKeepFirst output has one row per key and the minimal order value") {
    val gen = Gen.listOfN(30, Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(0, 100)))
    samples(gen).foreach { pairs =>
      val out = Filters.dropDuplicatesKeepFirst(pairs.toDF("k", "ord"), Seq("k"), Seq("ord"))
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      val expected = pairs.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).min }
      assert(out === expected)
    }
  }

  test("pySlice equals Python slice semantics for random (start, stop, step)") {
    // in-test oracle: CPython's PySlice_AdjustIndices + stepping
    def local(n: Int, start: Option[Long], stop: Option[Long], step: Option[Long]): Seq[Int] = {
      val st = step.getOrElse(1L)
      def norm(v: Option[Long], dPos: Long, dNeg: Long): Long = v match {
        case None => if (st > 0) dPos else dNeg
        case Some(x0) =>
          val x = if (x0 < 0) x0 + n else x0
          if (x < 0) { if (st > 0) 0L else -1L }
          else if (x >= n) { if (st > 0) n.toLong else n - 1L }
          else x
      }
      val a = norm(start, 0L, n - 1L)
      val b = norm(stop, n.toLong, -1L)
      val ixs = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = a
      while (if (st > 0) i < b else i > b) { ixs += i.toInt; i += st }
      ixs.toSeq
    }
    val n = 5
    val df = (0 until n).toDF("v")
    val bound = Gen.option(Gen.chooseNum(-7L, 7L))
    val gen = Gen.zip(bound, bound, Gen.oneOf(-3L, -2L, -1L, 1L, 2L, 3L).map(Option(_)))
    samples(gen, n = 30).foreach { case (start, stop, step) =>
      val got = Slicing.pySlice(df, Seq("v"), start, stop, step).as[Int].collect().toSeq
      assert(got === local(n, start, stop, step), s"slice($start, $stop, $step)")
    }
  }

  test("chunking laws: token conservation, window bounds, chunk count formula") {
    val word = Gen.chooseNum(1, 8).flatMap(l => Gen.listOfN(l, Gen.alphaLowerChar).map(_.mkString))
    val doc = Gen.chooseNum(0, 120).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val gen = Gen.zip(Gen.listOfN(6, doc), Gen.chooseNum(1, 50), Gen.chooseNum(1, 50))
    samples(gen, 6).foreach { case (docs, a, b) =>
      val (maxT, stride) = (math.max(a, b), math.min(a, b))
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val out = Chunking.chunkByTokens(df, "id", "text", maxT, stride)
        .as[(Long, Long, String, Long)].collect()
      docs.zipWithIndex.foreach { case (text, i) =>
        val toks = text.split(" ", -1).toSeq // split(' ') semantics: "" -> [""]
        val chunks = out.filter(_._1 == i.toLong).sortBy(_._2)
        // chunk count formula
        val want = if (toks.length <= maxT) 1
                   else 1 + math.ceil((toks.length - maxT).toDouble / stride).toInt
        assert(chunks.length === want, s"doc $i: ${toks.length} toks, max=$maxT stride=$stride")
        // every window is the exact slice at its offset; sizes bounded
        chunks.foreach { case (_, cid, ctext, ntok) =>
          val slice = toks.slice((cid * stride).toInt, (cid * stride).toInt + maxT)
          assert(ctext === slice.mkString(" "))
          assert(ntok === slice.length.toLong && ntok <= maxT)
        }
        // disjoint-stride special case: perfect reconstruction
        if (stride == maxT)
          assert(chunks.map(_._3).mkString(" ").trim === text.trim)
      }
    }
  }

  test("gopherFlags ratios are always finite and in-range for arbitrary text") {
    val junk = Gen.listOfN(80, Gen.frequency(
      6 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', ' ', '\n', '-', '*', '.', '#'),
      1 -> Gen.oneOf('é', 'ß', '…', '!', '?'))).map(_.mkString)
    samples(Gen.listOfN(8, junk), 5).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val rows = df.select(graft.functions.TextFunctions.gopherFlags(col("text")).as("g"))
        .select("g.*").collect()
      rows.foreach { r =>
        assert(r.getLong(0) >= 1L) // word_count (split never empty)
        (1 to 5).foreach { i =>
          val v = r.getDouble(i)
          assert(!v.isNaN && !v.isInfinite && v >= 0.0, s"field $i: $v in $r")
        }
        assert(r.getLong(6) >= 0L) // stop_hits
        assert(Set(0L, 1L).contains(r.getLong(7))) // pass
      }
    }
  }

  test("HDF5 roundtrip is the identity on random typed frames (self-validated codec)") {
    // the codec has no libhdf5 in the image to cross-check against, so
    // property-level roundtrip identity is the strongest available
    // evidence: random longs (full range), doubles incl. NaN/±Inf/-0.0,
    // booleans, and unicode strings incl. empty and newline-bearing
    val str = Gen.oneOf(
      Gen.const(""), Gen.const("line1\nline2"), Gen.const("嗨 — ünïcødé ✓"),
      Gen.alphaNumStr.map(_.take(40)),
      Gen.listOfN(5, Gen.choose(0x20, 0x2FF)).map(_.map(_.toChar).mkString))
    val dbl = Gen.oneOf(Gen.chooseNum(-1e18, 1e18), Gen.const(Double.NaN),
      Gen.const(Double.PositiveInfinity), Gen.const(Double.NegativeInfinity),
      Gen.const(-0.0), Gen.const(4.9e-324))
    val row = Gen.zip(Gen.chooseNum(Long.MinValue, Long.MaxValue), dbl, Gen.oneOf(true, false), str)
    samples(Gen.listOfN(20, row), n = 6).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("l", "d", "b", "s")
      val p = java.nio.file.Files.createTempFile(s"graft_prop_$i", ".h5").toString
      graft.sources.Hdf5.writeHdf5(df, p)
      val back = graft.sources.Hdf5.readHdf5(spark, p, guessDatatypes = false)
      // NaN-safe comparison via the bit patterns
      def norm(r: org.apache.spark.sql.Row) =
        (r.getLong(r.fieldIndex("l")),
          java.lang.Double.doubleToLongBits(r.getDouble(r.fieldIndex("d"))),
          r.getBoolean(r.fieldIndex("b")), r.getString(r.fieldIndex("s")))
      assert(back.collect().map(norm).sorted.toSeq ===
        df.collect().map(norm).sorted.toSeq, s"sample $i")
      new java.io.File(p).delete()
    }
  }

  test("BPE encode is lossless for ARBITRARY unicode input under arbitrary merge tables") {
    // train on random word soup, encode unrelated random strings: the
    // reassembly law (concat tokens, drop </w>) must hold regardless
    val word = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    val doc = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val anyStr = Gen.listOfN(30, Gen.chooseNum(Char.MinValue, Char.MaxValue)).map(_.mkString)
    samples(Gen.zip(Gen.listOfN(15, doc), Gen.listOfN(10, Gen.oneOf(doc, anyStr))), n = 4)
      .foreach { case (corpus, docs) =>
        if (corpus.exists(_.exists(_.isLetterOrDigit))) {
          val m = graft.ml.Bpe.train(corpus.toDF("text"), "text", numMerges = 40)
          val rows = docs.toDF("text").select(
            regexp_replace(array_join(graft.ml.Bpe.tokens(col("text"), m), ""), "</w>", "")
              .as("rebuilt"),
            array_join(graft.plans.Kernels.wordShingles(col("text"), 1), "").as("expected"))
            .collect()
          rows.foreach(r => assert(r.getString(0) === r.getString(1)))
        }
      }
  }

  test("classifier probability is a probability, and kernel == join path on random text") {
    val word = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val doc = Gen.chooseNum(0, 15).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    samples(Gen.zip(Gen.listOfN(10, doc), Gen.listOfN(10, doc), Gen.listOfN(12, doc)), n = 3)
      .foreach { case (pos, neg, docs) =>
        if (pos.exists(_.nonEmpty) && neg.exists(_.nonEmpty)) {
          val m = graft.ml.QualityClassifier.train(
            pos.toDF("text"), neg.toDF("text"), "text",
            buckets = 1 << 10, seed = 1, iters = 5)
          val scored = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
            .toDF("doc_id", "text")
          val k = graft.ml.QualityClassifier.scoreInline(scored, "text", m)
            .select(col("doc_id"), col("quality_prob").as("pk"))
          val j = graft.ml.QualityClassifier.scoreJoin(scored, "doc_id", "text",
            graft.ml.QualityClassifier.modelFrame(spark, m))
            .select(col("doc_id"), col("quality_prob").as("pj"))
          k.join(j, "doc_id").collect().foreach { r =>
            val (pk, pj) = (r.getDouble(1), r.getDouble(2))
            assert(pk >= 0.0 && pk <= 1.0)
            assert(math.abs(pk - pj) <= 1e-8, s"parity: $pk vs $pj")
          }
        }
      }
  }

  test("KN perplexity is positive and finite wherever defined, on random corpora") {
    val word = Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val doc = Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    samples(Gen.listOfN(12, doc), n = 3).foreach { corpus =>
      val model = graft.ml.Perplexity.train(corpus.toDF("text"), "text",
        buckets = 1 << 10, seed = 2, smoothing = "kn")
      val m = graft.ml.Perplexity.collectModel(model)
      val ppl = graft.ml.Perplexity.scoreInline(corpus.toDF("text"), "text", m)
        .select("ppl").collect().flatMap(r => Option(r.getAs[Any]("ppl")))
        .map(_.asInstanceOf[Double])
      ppl.foreach(p => assert(p > 0.0 && java.lang.Double.isFinite(p), s"ppl $p"))
    }
  }
}
