package graft.ml

import graft.SparkSpec
import graft.functions.{Similarity, TextFunctions}
import graft.plans.Kernels
import org.apache.spark.sql.functions._

class SimilarityAndDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "The quick brown fox jumps over the lazy dog near the river bank today"
  private val docB = "The quick brown fox jumps over the lazy dog near the river bank"
  private val docC = "Completely different content about spark distributed query engines and shuffles"

  test("wordShingles emits n-grams of the normalized text") {
    val out = Seq("Hello, World! Foo").toDF("t")
      .select(Kernels.wordShingles($"t", 2).as("sh"))
      .select(explode($"sh")).as[String].collect()
    assert(out === Array("hello world", "world foo"))
  }

  test("wordShingles on short/empty text is empty, not garbage") {
    val out = Seq("", "one two").toDF("t")
      .select(size(Kernels.wordShingles($"t", 3)).as("n")).as[Int].collect()
    assert(out === Array(0, 0))
  }

  test("repetitionFeatures: dup-line and top-2gram shares, hand-computed") {
    // lines: "a b", "a b", "c d e" → total 3, distinct 2, dup_frac 1/3;
    // masses: "a b"(3)×2=6 dup, "c d e"(5)×1=5 → dup_char_frac 6/11
    // 2-grams: [a b, b a, a b, b c, c d, d e] → total 6, top "a b"×2
    //   freq_share 2/6; masses: ab 3×2=6(top), ba 3, bc 3, cd 3, de 3
    //   → top_char_share 6/18
    val text = "a b\na b\nc d e"
    val r = Seq(text).toDF("t")
      .select(TextFunctions.repetitionFeatures($"t", 2).as("r"))
      .select($"r.dup_line_frac", $"r.dup_line_char_frac",
        $"r.top_ngram_freq_share", $"r.top_ngram_char_share")
      .as[(Double, Double, Double, Double)].collect().head
    assert(r === ((1.0 / 3, 6.0 / 11, 2.0 / 6, 6.0 / 18)))
    // no repetition → zero dup fracs; newline is a token break in the
    // normalizer: [x y z w q] → 4 distinct 2-grams, top share 1/4.
    // Empty text → all zeros.
    val clean = Seq("x y\nz w q", "").toDF("t")
      .select(TextFunctions.repetitionFeatures($"t", 2).as("r"))
      .select($"r.dup_line_frac", $"r.top_ngram_freq_share")
      .as[(Double, Double)].collect()
    assert(clean(0) === ((0.0, 0.25)))
    assert(clean(1) === ((0.0, 0.0)))
  }

  test("redactPii scrubs emails, IPs, cards, phones; piiCounts audits them") {
    val text = "mail a.b+c@foo.co.uk from 192.168.0.1, card 4111 1111 1111 1111, tel +1 555 123 4567"
    val (clean, ne, nip, nc, np) = Seq(text).toDF("t")
      .select(TextFunctions.redactPii($"t").as("c"), TextFunctions.piiCounts($"t").as("p"))
      .select($"c", $"p.n_email", $"p.n_ip", $"p.n_card", $"p.n_phone")
      .as[(String, Int, Int, Int, Int)].collect().head
    assert(clean.contains("<EMAIL>") && clean.contains("<IP>")
      && clean.contains("<CARD>") && clean.contains("<PHONE>"))
    assert(!clean.contains("foo.co.uk") && !clean.contains("192.168")
      && !clean.contains("4111") && !clean.contains("4567"))
    assert((ne, nip, nc, np) === ((1, 1, 1, 1)))
    // clean text passes through untouched
    val noop = Seq("just words, no identifiers here").toDF("t")
      .select(TextFunctions.redactPii($"t")).as[String].collect().head
    assert(noop === "just words, no identifiers here")
  }

  test("minhash signatures: identical docs identical, near-dups mostly agree") {
    val sig = Seq(docA, docA, docB, docC).toDF("t")
      .select(Kernels.minhashSig(Kernels.wordShingles($"t", 3), 32).as("s"))
      .as[Array[Long]].collect()
    assert(sig(0) === sig(1))
    val agreeAB = sig(0).zip(sig(2)).count { case (a, b) => a == b }
    val agreeAC = sig(0).zip(sig(3)).count { case (a, b) => a == b }
    assert(agreeAB > 20, s"near-dup agreement $agreeAB should be high")
    assert(agreeAC < 5, s"unrelated agreement $agreeAC should be low")
  }

  test("simhash hamming distance separates near-dups from unrelated docs") {
    val sims = Seq(docA, docB, docC).toDF("t")
      .select(Kernels.simhash64(split(TextFunctions.normalized($"t"), " ", -1)).as("s"))
      .as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(0), sims(1)) <= 8)
    assert(ham(sims(0), sims(2)) > 8)
  }

  test("cosineSim: identical=1, orthogonal=0") {
    val d = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    ).toDF("a", "b").select(Kernels.cosineSim($"a", $"b").as("c")).as[Double].collect()
    assert(math.abs(d(0) - 1.0) < 1e-12)
    assert(math.abs(d(1)) < 1e-12)
  }

  test("jaccard of shingle arrays") {
    val j = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(Similarity.jaccard($"x", $"y").as("j")).as[Double].head()
    assert(math.abs(j - 0.5) < 1e-12)
  }

  test("exact dedup groups identical normalized text") {
    val docs = Seq((1L, "Hello  World"), (2L, "hello world!"), (3L, "other")).toDF("id", "text")
    val out = Dedup.exact(docs, "id", "text").orderBy("keep_id").collect()
    assert(out.length === 2)
    assert(out.head.getAs[Long]("keep_id") === 1L)
    assert(out.head.getAs[Long]("n_dups") === 2L)
  }

  test("minhashPairs finds a planted near-duplicate") {
    val base = (1 to 40).map(i => s"sentence number $i with some shared boilerplate words").mkString(" ")
    val near = base.substring(0, base.length - 30)
    val docs = Seq((1L, base), (2L, near), (3L, docC)).toDF("id", "text")
    val pairs = Dedup.minhashPairs(docs, "id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("incremental dedup pairs the new batch against the corpus index only") {
    val corpus = Seq((1L, docA), (2L, docC), (3L, docA)).toDF("doc_id", "text")
    val inc = Seq(
      (10L, docA), // copy of corpus docs 1 and 3
      (11L, "fresh unrelated tokens nothing shared here at all today friends")
    ).toDF("doc_id", "text")
    val idx = Dedup.minhashIndex(corpus, "doc_id", "text")
    val pairs = Dedup.incrementalMinhashPairs(inc, idx, "doc_id", "text", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the corpus-internal dup (1,3) must NOT appear — only inc × corpus
    assert(pairs === Set((10L, 1L), (10L, 3L)))

    // the index survives a write → read cycle (cross-session production
    // shape): same pairs from the disk-backed index, params intact
    val dir = java.nio.file.Files.createTempDirectory("graft_mhidx").toString
    try {
      Dedup.writeMinhashIndex(idx, dir)
      val back = Dedup.readMinhashIndex(spark, dir)
      assert((back.k, back.nBands, back.shingleN) === (idx.k, idx.nBands, idx.shingleN))
      val pairs2 = Dedup.incrementalMinhashPairs(inc, back, "doc_id", "text", threshold = 0.9)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(pairs2 === pairs)
      back.release() // no-op on a disk-backed index — must not throw
    } finally {
      idx.release()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("simhashPairs finds a planted near-duplicate") {
    val base = (1 to 40).map(i => s"unique$i token$i").mkString(" ")
    val near = base + " extra tail"
    val docs = Seq((1L, base), (2L, near), (3L, docC)).toDF("id", "text")
    val pairs = Dedup.simhashPairs(docs, "id", "text", maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.contains((1L, 2L)))
  }

  test("jaccardJoinExact equals brute force on adversarial random corpora") {
    // word soup from a tiny vocabulary → many pairs hover AT the
    // threshold, exactly where a lossy prefix/size bound would break
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val rng = new scala.util.Random(7)
    val docs = (0 until 60).map { i =>
      val n = 5 + rng.nextInt(12)
      (i.toLong, (0 until n).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val got = Dedup.jaccardJoinExact(df, "doc_id", "text", shingleN = 2, threshold = t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // in-test brute force over the same shingle definition
      def grams(s: String): Set[String] = {
        val tk = s.toLowerCase.split("\\s+").filter(_.nonEmpty)
        if (tk.length < 2) Set.empty else tk.sliding(2).map(_.mkString(" ")).toSet
      }
      val want = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        ga = grams(ta); gb = grams(tb)
        if ga.nonEmpty && gb.nonEmpty
        j = (ga & gb).size.toDouble / (ga | gb).size.toDouble
        if j >= t
      } yield (ia, ib)).toSet
      assert(got === want, s"threshold $t: got ${got.size}, want ${want.size}")
    }
  }

  test("containmentPairs equals brute force on adversarial random corpora") {
    // same at-the-threshold word soup as the Jaccard parity test — the
    // directional measure has its own prefix/size/positional bounds to
    // break, so sweep thresholds incl. one low enough for wide prefixes
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val rng = new scala.util.Random(11)
    val docs = (0 until 60).map { i =>
      val n = 5 + rng.nextInt(12)
      (i.toLong, (0 until n).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    def grams(s: String): Set[String] = {
      val tk = s.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (tk.length < 2) Set.empty else tk.sliding(2).map(_.mkString(" ")).toSet
    }
    for (t <- Seq(0.5, 0.8, 1.0)) {
      val got = Dedup.containmentPairs(df, "doc_id", "text", shingleN = 2, threshold = t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val want = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia != ib
        ga = grams(ta); gb = grams(tb)
        if ga.nonEmpty && gb.nonEmpty
        c = (ga & gb).size.toDouble / ga.size.toDouble
        if c >= t
      } yield (ia, ib)).toSet
      assert(got === want, s"threshold $t: got ${got.size}, want ${want.size}")
    }
  }

  test("containmentPairs is directional: a truncation is contained in its source, not vice versa") {
    val full = "the quick brown fox jumps over the lazy dog again and again and then rests"
    val docs = Seq(
      (1L, full),
      (2L, "the quick brown fox jumps over the lazy dog"), // prefix of 1
      (3L, "completely unrelated text about winter weather patterns")).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text",
      shingleN = 3, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((2L, 1L)), s"truncation not detected: $pairs")
    assert(!pairs.contains((1L, 2L)), s"direction reversed: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"false positive: $pairs")
  }

  test("containmentJoinPairs equals brute force cross-frame; batch dedup drops contained docs") {
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val rng = new scala.util.Random(13)
    def mk(n: Int, off: Long) = (0 until n).map { i =>
      val len = 5 + rng.nextInt(12)
      (off + i, (0 until len).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    val probeDocs = mk(15, 1000)
    val corpusDocs = mk(40, 0)
    val probe = probeDocs.toDF("doc_id", "text")
    val corpus = corpusDocs.toDF("doc_id", "text")
    def grams(s: String): Set[String] = {
      val tk = s.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (tk.length < 2) Set.empty else tk.sliding(2).map(_.mkString(" ")).toSet
    }
    for (t <- Seq(0.5, 0.8)) {
      val got = Dedup.containmentJoinPairs(probe, corpus, "doc_id", "text",
        shingleN = 2, threshold = t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val want = (for {
        (ia, ta) <- probeDocs; (ib, tb) <- corpusDocs
        ga = grams(ta); gb = grams(tb)
        if ga.nonEmpty && gb.nonEmpty
        c = (ga & gb).size.toDouble / ga.size.toDouble
        if c >= t
      } yield (ia, ib)).toSet
      assert(got === want, s"threshold $t: got ${got.size}, want ${want.size}")
    }
    // the foreachBatch face: a truncation of a corpus doc is dropped,
    // novel docs pass through untouched
    val full = "the quick brown fox jumps over the lazy dog again and again and then rests"
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "entirely novel content about mountain hiking trails")).toDF("doc_id", "text")
    val kept = graft.streaming.Streams.containmentDedupBatch(
      Seq((1L, full)).toDF("doc_id", "text"), "doc_id", "text", threshold = 0.9)(batch)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(101L))
  }

  test("appendToMinhashIndex: appended batch is discoverable by the NEXT increment") {
    val corpus = Seq((1L, docA), (2L, docC)).toDF("doc_id", "text")
    val fresh = "tomorrow the orchestra rehearses seven entirely new movements before dawn breaks"
    val dir = java.nio.file.Files.createTempDirectory("graft_mhappend").toString
    try {
      val idx = Dedup.minhashIndex(corpus, "doc_id", "text")
      Dedup.writeMinhashIndex(idx, dir); idx.release()
      // probe copies one corpus doc and one future-batch doc
      val probe = Seq((30L, fresh), (31L, docA)).toDF("doc_id", "text")
      def pairs(): Set[(Long, Long)] =
        Dedup.incrementalMinhashPairs(probe, Dedup.readMinhashIndex(spark, dir),
          "doc_id", "text", threshold = 0.9)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(pairs() === Set((31L, 1L))) // batch not yet in the index
      Dedup.appendToMinhashIndex(spark, dir,
        Seq((20L, fresh)).toDF("doc_id", "text"), "doc_id", "text")
      assert(pairs() === Set((31L, 1L), (30L, 20L))) // now it is
      // append is additive: params sidecar untouched, corpus rows intact
      val back = Dedup.readMinhashIndex(spark, dir)
      assert((back.k, back.nBands, back.shingleN) === (64, 16, 3))
      assert(back.shingles.select("id").as[Long].collect().toSet === Set(1L, 2L, 20L))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("editDistancePairs k=1: finds insert/delete/substitute, misses distance 2") {
    val rows = Seq(
      (1L, "kitten"), (2L, "kittens"), // insert → 1
      (3L, "kiten"),                   // delete → 1 (vs kitten)
      (4L, "mitten"),                  // substitute → 1 (vs kitten)
      (5L, "sitting"),                 // ed(kitten, sitting) = 3
      (6L, "kitten"),                  // exact dup → 0
      (7L, "")).toDF("id", "s")        // ed("", x) = len(x); pairs with nothing here
    val got = Dedup.editDistancePairs(rows, "id", "s", maxDistance = 1)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    // brute-force truth over the same rows
    val all = Seq(1L -> "kitten", 2L -> "kittens", 3L -> "kiten", 4L -> "mitten",
      5L -> "sitting", 6L -> "kitten", 7L -> "")
    val want = (for {
      (ia, sa) <- all; (ib, sb) <- all if ia < ib
      d = levenshteinRef(sa, sb) if d <= 1
    } yield (ia, ib, d.toLong)).toSet
    assert(got === want)
    assert(got.contains((1L, 6L, 0L)) && got.contains((1L, 2L, 1L)))
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("editDistancePairs k=2 equals brute force on a transposition-rich set") {
    val strs = Seq("abcdef", "abcdfe", "abdcef", "xbcdef", "abefcd", "zzzzzz", "ab")
    val rows = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val got = Dedup.editDistancePairs(rows, "id", "s", maxDistance = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (sa, ia) <- strs.zipWithIndex; (sb, ib) <- strs.zipWithIndex if ia < ib
      d = levenshteinRef(sa, sb) if d <= 2
    } yield (ia.toLong, ib.toLong, d.toLong)).toSet
    assert(got === want)
    assert(want.exists(_._3 == 2L)) // the set genuinely exercises distance 2
  }

  test("editDistanceJoinPairs: bipartite brute-force parity, probe side broadcast") {
    val corpus = Seq(1L -> "kitten", 2L -> "sitting", 3L -> "mitten", 4L -> "abc")
    val probe = Seq(10L -> "kitte", 11L -> "abcd", 12L -> "zzzzz")
    val got = Dedup.editDistanceJoinPairs(
      probe.toDF("id", "s"), corpus.toDF("id", "s"), "id", "s", maxDistance = 1)
      .as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (ia, sa) <- probe; (ib, sb) <- corpus
      d = levenshteinRef(sa, sb) if d <= 1
    } yield (ia, ib, d.toLong)).toSet
    assert(got === want && want.nonEmpty)
    assert(!got.exists(_._1 == 12L)) // no corpus string within one edit
    // the streaming face: batch rows with a corpus typo-match drop
    val gated = graft.streaming.Streams.editDedupBatch(
      corpus.toDF("id", "s"), "id", "s")(probe.toDF("id", "s"))
      .select("id").as[Long].collect().toSet
    assert(gated === Set(12L))
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("containmentDedup drops contained docs, keeps containers; min id survives mutual dup") {
    val full = "the quick brown fox jumps over the lazy dog again and again and then rests"
    val docs = Seq(
      (1L, full),
      (2L, "the quick brown fox jumps over the lazy dog"), // contained in 1 → drop
      (3L, full),                                          // mutual with 1 → larger id drops
      (4L, "entirely different content about mountain hiking trails and maps"),
      (5L, "xy")).toDF("doc_id", "text")                   // empty shingle set → survives
    val kept = Dedup.containmentDedup(docs, "doc_id", "text", threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L, 5L))
  }

  test("containmentPairs: partition invariance and guards") {
    val docs = Seq.tabulate(30)(i =>
      (i.toLong, s"shared core phrase tok${i % 5} with some extra words tok${i % 7}"))
      .toDF("doc_id", "text")
    val results = Seq(1, 7).map { parts =>
      Dedup.containmentPairs(docs.repartition(parts), "doc_id", "text", threshold = 0.6)
        .collect().map(_.toString).sorted.toSeq
    }
    assert(results(0) === results(1))
    assert(intercept[IllegalArgumentException](
      Dedup.containmentPairs(docs, "doc_id", "text", threshold = 0.0))
      .getMessage.contains("threshold"))
    assert(intercept[IllegalArgumentException](
      Dedup.containmentPairs(docs, "doc_id", "text", shingleN = 0))
      .getMessage.contains("shingleN"))
  }

  test("salted bucket self-join preserves recall on oversized buckets") {
    // 12 near-identical docs land in one band/quadrant bucket; with
    // maxBucket=3 the old guard dropped the bucket (0 pairs) — the salted
    // triangle join must find exactly the pairs the uncapped run finds
    val docs = (1L to 12L).map(i =>
      (i, s"identical boilerplate text repeated across documents tail$i"))
      .toDF("id", "text")
    def pairSet(maxBucket: Int, saltCap: Int) =
      Dedup.minhashPairs(docs, "id", "text", threshold = 0.3,
        maxBucket = maxBucket, saltCap = saltCap)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val uncapped = pairSet(maxBucket = 1000, saltCap = 20000)
    val salted = pairSet(maxBucket = 3, saltCap = 1000)
    assert(uncapped.nonEmpty)
    assert(salted === uncapped)
    // above saltCap the bucket is dropped (degenerate-cluster guard):
    // fully identical docs put every band bucket over the cap
    val clones = (1L to 12L).map(i => (i, "exactly the same text in every document"))
      .toDF("id", "text")
    assert(Dedup.minhashPairs(clones, "id", "text", threshold = 0.3,
      maxBucket = 3, saltCap = 4).count() === 0)

    val simUncapped = Dedup.simhashPairs(docs, "id", "text", maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val simSalted = Dedup.simhashPairs(docs, "id", "text", maxHamming = 6,
      maxBucket = 3, saltCap = 1000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(simUncapped.nonEmpty && simSalted === simUncapped)
  }

  test("qualityScore: closed-form sigmoid; spark.ml-trained weights separate junk") {
    // intercept-only weights: score is sigmoid(intercept) regardless of text
    val s0 = Seq((1L, "anything")).toDF("id", "text")
      .select(TextFunctions.qualityScore($"text", Array(0.3, 0, 0, 0, 0, 0)).as("s"))
      .head().getDouble(0)
    assert(math.abs(s0 - 1.0 / (1.0 + math.exp(-0.3))) < 1e-12)
    // offline training path: fit LR on the feature vector, ship the
    // coefficients into the map-side scorer
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val good = (0 until 40).map(i =>
      (s"the quick brown fox is on the mat and it was warm today number $i", 1.0))
    val bad = (0 until 40).map(i =>
      (s"!!!BUY NOW!!! $i CLICK??? WIN;;; ALL CAPS SPAM!!!", 0.0))
    val df = (good ++ bad).toDF("text", "label")
    val feats = df
      .select($"label", TextFunctions.qualityFeatures($"text").as("f"))
      .select($"label", array_to_vector(array(
        $"f.avg_token_len", $"f.punct_ratio", $"f.upper_ratio", $"f.stopword_ratio",
        log10($"f.n_chars".cast("double") + lit(1.0)))).as("features"))
    val m = new LogisticRegression().setMaxIter(25).setRegParam(0.01).fit(feats)
    val w = m.intercept +: m.coefficients.toArray
    val scored = df.select($"label", TextFunctions.qualityScore($"text", w).as("s"))
    val avgGood = scored.filter($"label" === 1.0).agg(avg($"s")).head().getDouble(0)
    val avgBad = scored.filter($"label" === 0.0).agg(avg($"s")).head().getDouble(0)
    assert(avgGood > 0.8 && avgBad < 0.2, s"good=$avgGood bad=$avgBad")
  }

  test("compressionRatio: repetition compresses, randomness doesn't; empty=1, null=null") {
    import graft.functions.TextFunctions
    val rng = new scala.util.Random(5)
    val docs = Seq(
      (1L, Some("a" * 2000)),                                     // degenerate repetition
      (2L, Some(Seq.fill(50)("the quick brown fox").mkString(" "))), // template spam
      (3L, Some((0 until 400).map(_ => rng.nextPrintableChar()).mkString)), // ~incompressible
      (4L, Some("")),
      (5L, None)).toDF("id", "text")
    val got = docs.select(col("id"),
      TextFunctions.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).get < 0.02, s"run-of-a ratio ${got(1L)}")
    assert(got(2L).get < 0.15, s"template ratio ${got(2L)}")
    assert(got(3L).get > 0.5, s"random ratio ${got(3L)}")
    assert(got(1L).get < got(2L).get && got(2L).get < got(3L).get)
    assert(got(4L) === Some(1.0))
    assert(got(5L) === None)
    // deterministic and partition-invariant (thread-local Deflater reuse
    // must not leak state between rows)
    val many = Seq.tabulate(200)(i => (i.toLong, s"doc $i " * (5 + i % 7))).toDF("id", "text")
    val results = Seq(1, 7).map { parts =>
      many.repartition(parts).select(col("id"),
        TextFunctions.compressionRatio(col("text")).as("r"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    }
    assert(results(0) === results(1))
  }

  test("normalizeText: NFC folds combining marks; control chars stripped") {
    val rows = Seq(
      (1L, "abcd"),        // controls + DEL stripped
      (2L, "line1\r\nline2\tok"),            // CR stripped, LF/tab kept
      (3L, "café"),               // e + combining acute → é
      (4L, "clean text stays")
    ).toDF("id", "text")
    val out = rows.select($"id", TextFunctions.normalizeText($"text").as("t"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "abcd")
    assert(out(2L) === "line1\nline2\tok")
    assert(out(3L) === "café")
    assert(out(4L) === "clean text stays")
  }

  test("tokenWindowHashes: rolling hashes equal window identity") {
    val rows = Seq(
      (1L, "a b c d e f"),   // windows: [a b c], [b c d], [c d e], [d e f]
      (2L, "x y a b c d z"), // shares [a b c] and [b c d] token windows
      (3L, "a b"),           // shorter than winLen → no windows
      (4L, "")
    ).toDF("id", "text")
    val hs = rows.select($"id", Kernels.tokenWindowHashes($"text", 3).as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(hs(1L).length === 4 && hs(3L).isEmpty && hs(4L).isEmpty)
    // same token window → same hash regardless of surrounding context
    assert(hs(2L)(2) === hs(1L)(0)) // [a b c] at pos 2 of doc 2, pos 0 of doc 1
    assert(hs(2L)(3) === hs(1L)(1)) // [b c d]
    // distinct windows → distinct hashes (collision-free here)
    assert(hs(1L).distinct.length === 4)
    assert(hs(2L)(0) !== hs(1L)(0))
  }

  test("rolling window hashes induce exactly string-window equality (property)") {
    // small token alphabet → many genuine repeats; the hash-equality
    // relation must match string-window equality in BOTH directions
    val rnd = new scala.util.Random(42)
    val texts = (0 until 50).map { i =>
      (i.toLong, Array.fill(25)(s"t${rnd.nextInt(6)}").mkString(" "))
    }
    val n = 3
    val hs = texts.toDF("id", "text")
      .select($"id", Kernels.tokenWindowHashes($"text", n).as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    val all = texts.flatMap { case (id, text) =>
      val toks = text.split(" ")
      toks.sliding(n).zipWithIndex.map { case (w, s) => (w.mkString(" "), hs(id)(s)) }
    }
    for (((w1, h1), i) <- all.zipWithIndex; (w2, h2) <- all.drop(i))
      assert((w1 == w2) === (h1 == h2), s"'$w1'/$h1 vs '$w2'/$h2")
  }

  test("dedupSpans removes cross-doc duplicated windows, merged and counted") {
    val docs = Seq(
      (1L, "one two three four five six seven eight alpha beta"),
      (2L, "x1 x2 one two three four five six seven eight y1 y2"),
      (3L, "totally unrelated words with no shared window at all here")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSpans(docs, "doc_id", "text", minLen = 8)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    // docs 1 and 2 share the 8-token window "one..eight" exactly once → 8
    // tokens removed from each; surrounding tokens survive
    assert(out(0) === ((1L, "alpha beta", 8L)))
    assert(out(1) === ((2L, "x1 x2 y1 y2", 8L)))
    assert(out(2)._2 === "totally unrelated words with no shared window at all here")
    assert(out(2)._3 === 0L)
  }

  test("dedupSpans keepFirst: the lowest (doc, pos) occurrence survives") {
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha $shared beta"),
      (2L, s"x $shared y"),
      (3L, shared)
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSpans(docs, "doc_id", "text", minLen = 8, keepFirst = true)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    // doc 1 owns every shared window (lowest doc id) → untouched
    assert(out(0) === ((1L, s"alpha $shared beta", 0L)))
    assert(out(1) === ((2L, "x y", 12L)))
    assert(out(2) === ((3L, "", 12L)))
    // default mode removes all three occurrences
    val all = Dedup.dedupSpans(docs, "doc_id", "text", minLen = 8)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(all(0) === ((1L, "alpha beta", 12L)))
  }

  test("dedupSpans merges overlapping spans and can empty a doc") {
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, shared),                  // fully covered → empty text
      (2L, s"prefix $shared suffix") // covered interior, prefix/suffix kept
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSpans(docs, "doc_id", "text", minLen = 8)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) === ((1L, "", 12L)))
    assert(out(1) === ((2L, "prefix suffix", 12L)))
  }

  test("bruteForceKnn ranks by cosine and excludes self") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Ann.bruteForceKnn(vecs, vecs.filter($"vec_id" === 0L), "vec_id", "embedding", k = 2)
    val ranked = out.orderBy("rank").select("neighbour_id").as[Long].collect()
    assert(ranked === Array(1L, 2L)) // cosine ties for 2,3 broken by id asc
  }

  test("multimodal feature extraction preserves ids and derives deterministic features") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val media = Multimodal.asMediaTable(
      Seq((7L, "payload")).toDF("id", "data").withColumn("bin", $"data".cast("binary")),
      "id", "bin", "image")
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 1)
    assert(feats.head.media_id === 7L)
    assert(feats.head.n_bytes === 7L)
    assert(feats.head.feature.length === 8)
  }

  test("batched media extraction matches row-at-a-time; near-dup pairs find the planted copy") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val payloads = (0 until 100).map(i => (i.toLong, s"media-payload-$i")) :+
      (999L, "media-payload-42") // exact byte copy of id 42
    val media = Multimodal.asMediaTable(
      payloads.toDF("id", "data").withColumn("bin", $"data".cast("binary")),
      "id", "bin", "audio")
    val a = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeaturesBatched(media, batchSize = 7).collect().sortBy(_.media_id)
    assert(a.map(f => (f.media_id, f.checksum, f.feature.toSeq)).toSeq ===
      b.map(f => (f.media_id, f.checksum, f.feature.toSeq)).toSeq)
    val pairs = Multimodal.mediaNearDupPairs(media)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.contains((42L, 999L)), pairs.mkString(","))
  }

  test("KMV corpus Jaccard: exact when sketches cover the corpora, tolerant when truncated") {
    def corpus(lo: Int, hi: Int) = (lo until hi).map(i => (i.toLong, s"w$i token"))
      .toDF("doc_id", "text")
    val a = corpus(0, 100)    // unigram vocab {w0..w99, token}
    val b = corpus(50, 150)   // {w50..w149, token} → J = 51/151
    // k covers both vocabularies → the sketch IS the set → exact
    val exact = Dedup.corpusJaccard(a, b, "text", shingleN = 1, k = 1024)
    assert(math.abs(exact - 51.0 / 151.0) < 1e-12, exact)
    assert(Dedup.corpusJaccard(a, a, "text", shingleN = 1, k = 1024) === 1.0)
    assert(Dedup.corpusJaccard(corpus(0, 50), corpus(500, 550)
      .select(col("doc_id"), regexp_replace(col("text"), "token", "other").as("text")),
      "text", shingleN = 1, k = 1024) === 0.0)
    // truncated sketch: estimate within a few standard errors (1/√32 ≈ 0.18)
    val est = Dedup.corpusJaccard(a, b, "text", shingleN = 1, k = 32)
    assert(math.abs(est - 51.0 / 151.0) <= 0.3, est)
    // self-similarity is exactly 1 on BOTH paths (covered and truncated)
    assert(Dedup.corpusJaccard(a, a, "text", shingleN = 1, k = 32) === 1.0)
    // mixed coverage (one sketch covers, one truncated) stays sane
    val mixed = Dedup.kmvJaccard(
      Dedup.kmvSketch(a, "text", 1, 64), Dedup.kmvSketch(b, "text", 1, 1024))
    assert(mixed >= 0.0 && mixed <= 1.0)
  }

  test("perceptual hashes: known-vector aHash/dHash under an injected gray decoder") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val media = Multimodal.asMediaTable(
      Seq((1L, "x")).toDF("id", "data").withColumn("bin", $"data".cast("binary")),
      "id", "bin", "image")
    // fixed gradient grid: pixel i = i (row-major)
    object GradientCodec extends Multimodal.MediaCodec {
      override def decode(kind: String, bytes: Array[Byte]): Array[Float] = Array(0f)
      override def decodeGray(kind: String, bytes: Array[Byte], w: Int, h: Int): Array[Double] =
        Array.tabulate(w * h)(_.toDouble)
    }
    try {
      Multimodal.MediaCodec.register(GradientCodec)
      // aHash: 8×8 grid 0..63, mean 31.5 → bits 32..63 set
      val a = Multimodal.perceptualHashes(media, "ahash").collect()(0).getLong(1)
      assert(a === (0xFFFFFFFFL << 32), f"ahash $a%016x")
      // dHash: every p(r,c) < p(r,c+1) on a rising gradient → all 64 set
      val d = Multimodal.perceptualHashes(media, "dhash").collect()(0).getLong(1)
      assert(d === -1L, f"dhash $d%016x")
    } finally Multimodal.MediaCodec.reset()
  }

  test("phashPairs: planted identical payloads pair at hamming 0; distinct payloads don't") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val rows = (0L until 40L).map(i => (i, s"payload-$i")) :+ (999L, "payload-7")
    val media = Multimodal.asMediaTable(
      rows.toDF("id", "data").withColumn("bin", $"data".cast("binary")),
      "id", "bin", "image")
    Seq("ahash", "dhash").foreach { algo =>
      val pairs = Multimodal.phashPairs(media, algo)
        .select("id_a", "id_b", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(pairs.toSeq === Seq((7L, 999L, 0)), s"$algo: ${pairs.mkString(",")}")
    }
  }

  test("media codec SPI: a registered codec replaces the stub without pipeline changes") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val media = Multimodal.asMediaTable(
      Seq((1L, "abc"), (2L, "defg")).toDF("id", "data")
        .withColumn("bin", $"data".cast("binary")),
      "id", "bin", "image")
    object LengthCodec extends Multimodal.MediaCodec {
      override def decode(kind: String, bytes: Array[Byte]): Array[Float] =
        Array(bytes.length.toFloat, if (kind == "image") 1f else 0f)
    }
    try {
      Multimodal.MediaCodec.register(LengthCodec)
      val feats = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
      assert(feats.map(_.feature.toSeq).toSeq ===
        Seq(Seq(3f, 1f), Seq(4f, 1f))) // the injected codec, not the stub
      // the batched path routes through decodeBatch of the same codec
      val batched = Multimodal.extractFeaturesBatched(media, batchSize = 2)
        .collect().sortBy(_.media_id)
      assert(batched.map(_.feature.toSeq).toSeq === feats.map(_.feature.toSeq).toSeq)
    } finally Multimodal.MediaCodec.reset()
    // after reset the deterministic stub is back (8-dim byte-derived)
    val stub = Multimodal.extractFeatures(media).collect()
    assert(stub.forall(_.feature.length === 8))
  }
}
