package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurateSpec extends SparkSpec {
  import spark.implicits._

  private val good = "the cat and the dog ran to the park and it was a fine day " +
    "for everyone involved in that long walk over there"
  private val short_ = "the and was"
  private val repetitive = Seq.fill(10)("same line here").mkString("\n")
  private val german = "der hund und die katze sind nicht mit dem mann von dort"

  test("curate filters by lang, length and repetition, dedups, scrubs") {
    val docs = Seq(
      (1L, good),
      (2L, short_),                           // under minTokens
      (3L, repetitive),                       // dup_line_frac = 0.9
      (4L, german),                           // lang not allowed
      (5L, good),                             // exact dup of 1 → dropped
      (6L, good + " reach me at who@example.org today")
    ).toDF("doc_id", "text")
    val out = Curate.curate(docs, "doc_id", "text",
      Curate.Config(langs = Set("en"), minTokens = 10L,
        maxDupLineFrac = 0.5, maxTopNgramCharShare = 1.0,
        exactDedup = true, scrubPii = true))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("pred_lang"), r.getAs[String]("text"))).toMap
    assert(out.keySet === Set(1L, 6L))
    assert(out(1L)._1 === "en")
    assert(out(6L)._2.contains("<EMAIL>") && !out(6L)._2.contains("example.org"))
  }

  test("curate plans exactly one exchange (the dedup min_by shuffle)") {
    val docs = Seq((1L, good), (2L, good)).toDF("doc_id", "text")
    val plan = Curate.curate(docs, "doc_id", "text",
      Curate.Config(langs = Set("en"), minTokens = 1L))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
  }

  test("curate opt-in stages: unicode repair and quality-classifier filter") {
    val junk = "THE!!! BUY NOW!!! CLICK;;; WIN??? THE THE SPAM!!! CAPS!!!"
    val damaged = good + "\r trailing"
    val docs = Seq((1L, damaged), (2L, junk)).toDF("doc_id", "text")
    val out = Curate.curate(docs, "doc_id", "text",
      Curate.Config(langs = Set("en"), minTokens = 1L, normalize = true,
        qualityWeights = Some(Array(0.0, 0.0, -30.0, -10.0, 8.0, 0.0))))
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out.keySet === Set(1L)) // junk dropped on score
    assert(!out(1L).contains("") && !out(1L).contains("\r"))
  }

  test("curate opt-in compression-ratio floor drops boilerplate, keeps prose") {
    // en-stopword soup repeated 50× deflates to a few percent of raw;
    // the natural sentence stays well above any sane floor
    val boiler = Seq.fill(50)("the and is of to in that it was").mkString(" ")
    val docs = Seq((1L, good), (2L, boiler)).toDF("doc_id", "text")
    val base = Curate.Config(langs = Set("en"), minTokens = 5L)
    val without = Curate.curate(docs, "doc_id", "text", base)
      .select("doc_id").as[Long].collect().toSet
    val withFloor = Curate.curate(docs, "doc_id", "text",
      base.copy(minCompressRatio = Some(0.3)))
      .select("doc_id").as[Long].collect().toSet
    assert(without === Set(1L, 2L))
    assert(withFloor === Set(1L))
  }

  test("curate opt-in Gopher gate drops rule-violating docs") {
    // langId-detectable as English ("it is to" hit the en profile) but
    // contains none of the gate's required stopwords; all other Gopher
    // rules pass, so the stop-hits rule is what fires
    val noStops = (1 to 30).map(i => s"alpha$i it is to").mkString(" ")
    val docs = Seq((1L, good), (2L, noStops)).toDF("doc_id", "text")
    val gated = Curate.curate(docs, "doc_id", "text",
      Curate.Config(langs = Set("en"), minTokens = 1L,
        gopherStopwords = Some(Seq("the", "and", "was")), gopherMinWords = 10L))
    assert(gated.select("doc_id").as[Long].collect().toSet === Set(1L))
    // same config without the gate keeps both (isolates the stage)
    val open = Curate.curate(docs, "doc_id", "text",
      Curate.Config(langs = Set("en"), minTokens = 1L))
    assert(open.count() === 2L)
  }

  test("curate opt-in learned-classifier gate drops what the trained model rejects") {
    val junk = "zzq vvkp zzt wmm qqp jjx kkz ppv zzx jql nng hhw rrt ssv bbk"
    val docs = Seq((1L, good), (2L, junk + " " + junk)).toDF("doc_id", "text")
    val m = QualityClassifier.train(
      Seq.fill(40)(good).toDF("text"),
      Seq.fill(40)(junk).toDF("text"), "text",
      buckets = 1 << 12, seed = 3, iters = 25)
    // langId reads "the/and"-ish stopwords: the junk doc would PASS the
    // heuristic lang gate as unknown → restrict to the clf gate's effect
    // by allowing whatever language it predicts
    val langs = docs.select(graft.functions.TextFunctions.langId(col("text")))
      .collect().map(_.getString(0)).toSet
    val out = Curate.curate(docs, "doc_id", "text",
      Curate.Config(langs = langs, minTokens = 5L,
        clfModel = Some(m), minClfProb = 0.5))
    assert(out.select("doc_id").as[Long].collect().toSet === Set(1L))
  }

  test("curate opt-in model gates: perplexity drops gibberish, DSIR drops off-target") {
    val offTarget = "the best deal and the free shipping on the cart at the checkout sale"
    val gibberish = "the the zorp vrilk plon qhudrix blet snarv wumpet grafix blon"
    val docs = Seq((1L, good), (2L, gibberish), (3L, offTarget)).toDF("doc_id", "text")
    // the LM reference covers BOTH fluent styles — the ppl gate measures
    // fluency, so only the gibberish doc should fail it
    val reference = (Seq.fill(20)(good) ++ Seq.fill(20)(offTarget)).toDF("text")
    // perplexity gate: threshold above the in-domain doc's own score
    val model = Perplexity.train(reference, "text", buckets = 1 << 12, seed = 5)
    val cleanPpl = Perplexity.scoreInline(Seq(good).toDF("text"), "text",
      Perplexity.collectModel(model)).collect()(0).getAs[Double]("ppl")
    val pplOut = Curate.curate(docs, "doc_id", "text",
      Curate.Config(langs = Set("en"), minTokens = 5L,
        perplexityModel = Some(model), maxPpl = cleanPpl * 3))
    assert(pplOut.select("doc_id").as[Long].collect().toSet === Set(1L, 3L))
    // DSIR gate: ratios trained toward `good`'s vocabulary; threshold
    // between the on-target and off-target inline weights
    val ratios = Dsir.logRatios(
      Seq((1L, good), (2L, offTarget)).toDF("id", "text"), "text",
      Seq.fill(20)(good).toDF("text"), "text", buckets = 1 << 12, seed = 5)
    val r = Dsir.collectRatios(ratios)
    // weights: good >> gibberish (near-0 floor sum) > offTarget (seen
    // in raw, absent from target — strongly negative); threshold
    // between the last two shows the gate measures target-likeness,
    // not fluency (the ppl gate's axis)
    val w = Dsir.scoreInline(Seq(good, gibberish, offTarget).toDF("text"), "text", r)
      .collect().map(_.getAs[Double]("log_w"))
    assert(w(0) > w(1) && w(1) > w(2), s"want good > gibberish > offTarget, got ${w.toSeq}")
    val dsirOut = Curate.curate(docs, "doc_id", "text",
      Curate.Config(langs = Set("en"), minTokens = 5L,
        dsirRatios = Some(ratios), minLogWeight = (w(1) + w(2)) / 2.0))
    assert(dsirOut.select("doc_id").as[Long].collect().toSet === Set(1L, 2L))
    // both gates composed: only the clean on-target doc survives
    val both = Curate.curate(docs, "doc_id", "text",
      Curate.Config(langs = Set("en"), minTokens = 5L,
        perplexityModel = Some(model), maxPpl = cleanPpl * 3,
        dsirRatios = Some(ratios), minLogWeight = (w(1) + w(2)) / 2.0))
    assert(both.select("doc_id").as[Long].collect().toSet === Set(1L))
  }

  test("curate stage toggles: no dedup keeps the dup, sampling thins ids") {
    val docs = Seq((1L, good), (5L, good)).toDF("doc_id", "text")
    val keepBoth = Curate.curate(docs, "doc_id", "text",
      Curate.Config(langs = Set("en"), minTokens = 1L, exactDedup = false))
    assert(keepBoth.count() === 2)
    val docs2 = (0L until 100L).map(i => (i, good + " tail " + i)).toDF("doc_id", "text")
    val sampled = Curate.curate(docs2, "doc_id", "text",
      Curate.Config(langs = Set("en"), minTokens = 1L,
        sampleModulus = 10, sampleKeep = 3))
    assert(sampled.select("doc_id").as[Long].collect().forall(_ % 10 < 3))
  }
}
