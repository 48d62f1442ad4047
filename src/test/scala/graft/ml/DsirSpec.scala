package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies: "wiki" style vs "web" style
  private def wikiDoc(i: Long) =
    s"history science theory culture article ref$i citation source chapter volume"
  private def webDoc(i: Long) =
    s"click buy now deal$i offer free shipping cart checkout discount sale"

  private def rawCorpus = (0L until 400L).map(i =>
    (i, if (i % 2 == 0) wikiDoc(i) else webDoc(i))).toDF("id", "text")

  private def targetCorpus = (1000L until 1050L).map(i =>
    (i, wikiDoc(i))).toDF("id", "text")

  test("resampleLikeTarget pulls the target-styled half out of a mixed corpus") {
    val picked = Dsir.resampleLikeTarget(
      rawCorpus, "id", "text", targetCorpus, "text", n = 100, buckets = 1 << 12)
      .select("id").as[Long].collect()
    assert(picked.length === 100)
    val wikiShare = picked.count(_ % 2 == 0).toDouble / picked.length
    // wiki-vocab docs have weight ~ (p_t/p_r)^{#ngrams} >> web docs; the
    // Gumbel draw keeps a sliver of randomness but the pull dominates
    assert(wikiShare > 0.9, s"wiki share: $wikiShare")
    // deterministic rerun
    val again = Dsir.resampleLikeTarget(
      rawCorpus, "id", "text", targetCorpus, "text", n = 100, buckets = 1 << 12)
      .select("id").as[Long].collect()
    assert(again.toSet === picked.toSet)
  }

  test("logWeights: target-styled docs score higher; ngram-less docs get weight 1") {
    val raw = rawCorpus.union(Seq((9999L, "solo")).toDF("id", "text")) // 1 word < 2-gram
    val ratios = Dsir.logRatios(raw, "text", targetCorpus, "text", buckets = 1 << 12)
    val w = Dsir.logWeights(raw, "id", "text", ratios)
      .select("id", "log_w").as[(Long, Double)].collect().toMap
    assert(w(9999L) === 0.0) // no n-grams -> neutral weight
    val wikiAvg = w.filter(kv => kv._1 < 400 && kv._1 % 2 == 0).values.sum / 200
    val webAvg = w.filter(kv => kv._1 < 400 && kv._1 % 2 == 1).values.sum / 200
    assert(wikiAvg > webAvg + 5.0, s"wiki $wikiAvg vs web $webAvg")
  }

  test("length-normalized greedy mode separates despite doc-length skew") {
    // long off-target docs vs short on-target docs: sum weights would
    // let n-gram count dominate; the mean + greedy draw must not
    val longWeb = (0L until 100L).map(i =>
      (i, Seq.fill(12)(webDoc(i)).mkString(" ")))        // 120 words of web vocab
    val shortWiki = (100L until 200L).map(i => (i, wikiDoc(i))) // 10 words of wiki vocab
    val raw = (longWeb ++ shortWiki).toDF("id", "text")
    val picked = Dsir.resampleLikeTarget(raw, "id", "text", targetCorpus, "text",
      n = 80, buckets = 1 << 12, lengthNormalize = true, gumbel = false)
      .select("id").as[Long].collect()
    assert(picked.length === 80)
    assert(picked.forall(_ >= 100L), s"greedy mean draw picked web docs: ${picked.toSeq.take(5)}")
    // deterministic: greedy has no noise at all
    val again = Dsir.resampleLikeTarget(raw, "id", "text", targetCorpus, "text",
      n = 80, buckets = 1 << 12, lengthNormalize = true, gumbel = false)
      .select("id").as[Long].collect()
    assert(again.toSeq === picked.toSeq)
  }

  test("novel-vocabulary n-grams get the smoothed floor, not a silent drop") {
    // ratios trained on wiki/web vocab; score a corpus with completely
    // unseen vocabulary — an inner-join lookup would drop every n-gram
    // (log_w = 0 via the fill); the floor fill must weight them
    val ratios = Dsir.logRatios(rawCorpus, "text", targetCorpus, "text", buckets = 1 << 12)
    val novel = Seq((1L, "quantum entangle boson lepton hadron meson quark gluon")).toDF("id", "text")
    val w = Dsir.logWeights(novel, "id", "text", ratios)
      .select("log_w").as[Double].head()
    assert(w !== 0.0, "novel n-grams were dropped instead of floored")
    // floor sign sanity: raw corpus is larger than target, so the
    // unseen-bucket ratio log((rt+B)/(tt+B)) is positive
    assert(w > 0.0, s"log_w: $w")
  }

  test("ratio frame is self-contained: hashing params ride on every row") {
    val ratios = Dsir.logRatios(rawCorpus, "text", targetCorpus, "text",
      nGram = 3, buckets = 1 << 10, seed = 7)
    val rows = ratios.collect()
    assert(rows.length <= (1 << 10))
    assert(ratios.columns.toSet ===
      Set("bucket", "log_ratio", "log_floor", "n_gram", "buckets", "seed"))
    assert(rows.map(_.getAs[Int]("n_gram")).distinct.toSeq === Seq(3))
    assert(rows.map(_.getAs[Int]("buckets")).distinct.toSeq === Seq(1 << 10))
    assert(rows.map(_.getAs[Int]("seed")).distinct.toSeq === Seq(7))
  }

  test("scoreInline kernel agrees with the join-path scorer (hash + floor + mean parity)") {
    val docs = (rawCorpus.limit(20).as[(Long, String)].collect().toSeq ++ Seq(
      (9000L, "solo"),                                              // no n-grams
      (9001L, ""),                                                  // empty
      (9002L, "quantum entangle boson lepton hadron meson quark"),  // all-floor
      (9003L, "History SCIENCE theory,  culture!! article")         // case/punct
    )).toDF("id", "text").repartition(3)
    for (mean <- Seq(false, true)) {
      val ratios = Dsir.logRatios(rawCorpus, "text", targetCorpus, "text",
        buckets = 1 << 12, seed = 5)
      val viaJoin = Dsir.logWeights(docs, "id", "text", ratios, lengthNormalize = mean)
        .select("id", "log_w").as[(Long, Double)].collect().toMap
      val r = Dsir.collectRatios(ratios)
      val viaKernel = Dsir.scoreInline(docs, "text", r, lengthNormalize = mean)
        .select("id", "log_w").as[(Long, Double)].collect().toMap
      assert(viaKernel.keySet === viaJoin.keySet)
      for ((id, k) <- viaKernel) {
        val j = viaJoin(id)
        assert(math.abs(k - j) <= 1e-9 * math.max(1.0, math.abs(j)),
          s"doc $id (mean=$mean): kernel $k vs join $j")
      }
    }
  }

  test("scoreInline weights null text 0.0 (the join path's fill)") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, wikiDoc(2))).toDF("id", "text")
    val ratios = Dsir.logRatios(rawCorpus, "text", targetCorpus, "text", buckets = 1 << 12)
    val viaJoin = Dsir.logWeights(docs, "id", "text", ratios)
      .select("id", "log_w").as[(Long, Double)].collect().toMap
    val viaKernel = Dsir.scoreInline(docs, "text", Dsir.collectRatios(ratios))
      .select("id", "log_w").as[(Long, Double)].collect().toMap
    assert(viaJoin(1L) === 0.0 && viaKernel(1L) === 0.0)
    assert(math.abs(viaKernel(2L) - viaJoin(2L)) <= 1e-9 * math.abs(viaJoin(2L)))
  }

  test("inline greedy top-n equals the batch draw on the planted pull") {
    val ratios = Dsir.logRatios(rawCorpus, "text", targetCorpus, "text", buckets = 1 << 12)
    val batch = Dsir.selectByLogWeight(
      Dsir.logWeights(rawCorpus, "id", "text", ratios, lengthNormalize = true),
      "id", "log_w", n = 100, gumbel = false)
      .select("id").as[Long].collect().toSet
    val inline = Dsir.selectByLogWeight(
      Dsir.scoreInline(rawCorpus, "text", Dsir.collectRatios(ratios), lengthNormalize = true),
      "id", "log_w", n = 100, gumbel = false)
      .select("id").as[Long].collect().toSet
    assert(inline === batch)
    assert(inline.forall(_ % 2 == 0), "greedy inline draw picked web docs")
  }

  test("DsirWeightExpr refuses a non-finite floor (it would break codegen literals)") {
    for (bad <- Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)) {
      val ex = intercept[IllegalArgumentException](
        graft.plans.Kernels.DsirWeightExpr(
          org.apache.spark.sql.catalyst.expressions.Literal("x"),
          Array(1L), Array(0.5), bad, 2, 1L << 12, 7, mean = true))
      assert(ex.getMessage.contains("floor"), ex.getMessage)
    }
  }

  test("one-sided-empty training corpus errors instead of scoring everything 0") {
    // target docs all shorter than the n-gram: its count frame is empty,
    // every ratio/floor is null — both scoring paths must refuse (a
    // silent all-zero log_w would make a minLogWeight gate drop or keep
    // the whole stream with no signal)
    val ratios = Dsir.logRatios(rawCorpus, "text",
      Seq((1L, "solo")).toDF("id", "text"), "text", buckets = 1 << 12)
    val viaKernel = intercept[IllegalArgumentException](Dsir.collectRatios(ratios))
    assert(viaKernel.getMessage.contains("degenerate"), viaKernel.getMessage)
    val viaJoin = intercept[IllegalArgumentException](
      Dsir.logWeights(rawCorpus, "id", "text", ratios).collect())
    assert(viaJoin.getMessage.contains("degenerate"), viaJoin.getMessage)
  }

  test("degenerate-ratio error path does not leak the scope's persisted frame") {
    def persisted = spark.sparkContext.getPersistentRDDs.size
    val before = persisted
    val ratios = Dsir.logRatios(rawCorpus, "text",
      Seq((1L, "solo")).toDF("id", "text"), "text", buckets = 1 << 12)
    // logWeights persists the UNcached ratios through its scope before
    // the header collect throws; releaseNow on the error path must
    // drain it (releaseAfter's listener is never installed)
    intercept[IllegalArgumentException](
      Dsir.logWeights(rawCorpus, "id", "text", ratios))
    assert(persisted === before, s"leaked cache: $persisted vs $before")
  }

  test("plan: ratio lookup broadcasts, selection is TakeOrderedAndProject") {
    val out = Dsir.resampleLikeTarget(
      rawCorpus, "id", "text", targetCorpus, "text", n = 50, buckets = 1 << 12)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
