package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The CCNet-style hashed-bigram perplexity scorer: model shape,
  * separation power, determinism, banding, and the scale plan.
  */
class PerplexitySpec extends SparkSpec {
  import spark.implicits._

  // a tiny "clean" reference corpus with strong bigram structure
  private def reference = Seq.tabulate(60) { i =>
    s"the quick brown fox jumps over the lazy dog near the old stone bridge ${i % 5}"
  }.toDF("text")

  test("model is a bounded self-contained frame (≤ order×buckets rows, token total rides along)") {
    val m = Perplexity.train(reference, "text", buckets = 1 << 10, seed = 1)
    val rows = m.collect()
    assert(rows.length <= 3 * (1 << 10))
    assert(m.columns.toSet === Set("kind", "bucket", "cnt", "n_tokens", "buckets", "seed"))
    // every row carries the same header: token total + hashing params
    // (scoring reads buckets/seed from the model — no side channel);
    // the model's ORDER is self-describing too (max kind present)
    assert(rows.map(_.getAs[Long]("n_tokens")).distinct.toSeq === Seq(60L * 15))
    assert(rows.map(_.getAs[Int]("buckets")).distinct.toSeq === Seq(1 << 10))
    assert(rows.map(_.getAs[Int]("seed")).distinct.toSeq === Seq(1))
    assert(rows.map(_.getAs[Int]("kind")).toSet === Set(1, 2, 3))
    // bigram-order training stays available and self-describes as order 2
    val m2 = Perplexity.train(reference, "text", buckets = 1 << 10, seed = 1, order = 2)
    assert(m2.collect().map(_.getAs[Int]("kind")).toSet === Set(1, 2))
  }

  test("in-domain text scores lower perplexity than scrambled/out-of-domain text") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),          // in-domain
      (2L, "dog lazy the over jumps fox brown quick the"),          // same unigrams, broken bigrams
      (3L, "zebra quantum flux capacitor discombobulated xylophone") // out-of-domain
    ).toDF("doc_id", "text")
    val m = Perplexity.train(reference, "text", buckets = 1 << 12, seed = 2)
    val ppl = Perplexity.score(docs, "doc_id", "text", m)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ppl")).toMap
    assert(ppl(1) < ppl(2), s"in-domain ${ppl(1)} !< scrambled ${ppl(2)}")
    assert(ppl(2) < ppl(3), s"scrambled ${ppl(2)} !< gibberish ${ppl(3)}")
  }

  test("short docs get null ppl and 0 transitions; scoring is partition-invariant") {
    val docs = Seq((1L, "single"), (2L, ""), (3L, "the quick brown fox")).toDF("doc_id", "text")
    val m = Perplexity.train(reference, "text", buckets = 1 << 12, seed = 3)
    def run(parts: Int) = Perplexity.score(
        docs.repartition(parts), "doc_id", "text", m)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), Option(r.getAs[Any]("ppl")), r.getAs[Long]("n_transitions")))
    val one = run(1)
    assert(one(0)._2.isEmpty && one(0)._3 === 0L)
    assert(one(1)._2.isEmpty && one(1)._3 === 0L)
    // 4 tokens → 2 trigram windows
    assert(one(2)._2.isDefined && one(2)._3 === 2L)
    assert(run(7).toSeq === one.toSeq)
  }

  test("trigram separates scrambled-but-bigram-preserving text that bigram can't") {
    // Reference with two 3-token sentences sharing the middle token:
    // "a b c" and "d b e", repeated. Every bigram of the PROBE "a b e"
    // (ab, be) appears in the reference with the same counts as the
    // in-domain "a b c"'s (ab, bc) — a bigram LM scores the two
    // identically. The trigram "a b e" never occurs, so the order-3
    // model penalizes it (backoff to the λ-discounted bigram level).
    val ref = Seq.fill(40)("a b c").toDF("text")
      .unionByName(Seq.fill(40)("d b e").toDF("text"))
    val docs = Seq((1L, "a b c"), (2L, "a b e")).toDF("doc_id", "text")
    def ppls(order: Int): Map[Long, Double] = {
      val m = Perplexity.train(ref, "text", buckets = 1 << 12, seed = 13, order = order)
      Perplexity.score(docs, "doc_id", "text", m)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ppl")).toMap
    }
    val bi = ppls(2)
    assert(math.abs(bi(1) - bi(2)) < 1e-9 * bi(1),
      s"bigram LM should NOT separate: ${bi(1)} vs ${bi(2)}")
    val tri = ppls(3)
    assert(tri(2) > tri(1) * 1.5,
      s"trigram LM should separate clearly: in-domain ${tri(1)} vs scrambled ${tri(2)}")
    // the kernel path applies the same order-aware interpolation
    val m3 = Perplexity.collectModel(
      Perplexity.train(ref, "text", buckets = 1 << 12, seed = 13))
    assert(m3.order === 3)
    val viaKernel = Perplexity.scoreInline(docs, "text", m3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ppl")).toMap
    assert(viaKernel(2) > viaKernel(1) * 1.5)
  }

  test("withBand labels head/middle/tail by the corpus ppl distribution") {
    val docs = ((0 until 30).map(i => (i.toLong,
      if (i < 10) "the quick brown fox jumps over the lazy dog"
      else if (i < 20) "the quick stone dog walks under a brown bridge"
      else "wombat kazoo vortex pickle almanac turbine")) :+ (99L, "x"))
      .toDF("doc_id", "text")
    val m = Perplexity.train(reference, "text", buckets = 1 << 12, seed = 4)
    // tailFrac 0.6 falls inside the middle cluster (ranks 11-20 of 30);
    // at the default 0.67 the approx quantile lands ON the gibberish
    // cluster's own (shared) ppl and the strict > leaves the tail empty
    val banded = Perplexity.withBand(
      Perplexity.score(docs, "doc_id", "text", m),
      tailFrac = 0.6)
    val byBand = banded.groupBy("band").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byBand.getOrElse("unscored", 0L) === 1L) // the 1-token doc
    assert(byBand.getOrElse("head", 0L) > 0L && byBand.getOrElse("tail", 0L) > 0L)
    // the clean cluster lands in head, the gibberish cluster in tail
    val headIds = banded.filter(col("band") === "head")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(headIds.forall(_ < 10))
    val tailIds = banded.filter(col("band") === "tail")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tailIds.forall(id => id >= 20 && id < 99))
  }

  test("filterByPerplexity keeps clean docs, drops gibberish and unscorable") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "wombat kazoo vortex pickle almanac turbine"),
      (3L, "x")).toDF("doc_id", "text")
    val m = Perplexity.train(reference, "text", buckets = 1 << 12, seed = 5)
    val cleanPpl = Perplexity.score(docs, "doc_id", "text", m)
      .filter(col("doc_id") === 1).collect()(0).getAs[Double]("ppl")
    val kept = Perplexity.filterByPerplexity(docs, "doc_id", "text",
      reference, "text", maxPpl = cleanPpl * 2, buckets = 1 << 12, seed = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(1L))
  }

  test("scoreInline kernel agrees with the broadcast-join scorer (hash + math parity)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "dog lazy the over jumps fox brown quick the"),
      (3L, "zebra quantum flux capacitor discombobulated xylophone"),
      (4L, "Mixed CASE punctuation, and  runs   of spaces!"),
      (5L, "single"), (6L, "")).toDF("doc_id", "text").repartition(3)
    for (order <- Seq(2, 3)) {
      val model = Perplexity.train(reference, "text", buckets = 1 << 12, seed = 9,
        order = order)
      val viaJoin = Perplexity.score(docs, "doc_id", "text", model)
        .select("doc_id", "ppl").collect()
        .map(r => r.getLong(0) -> Option(r.getAs[java.lang.Double]("ppl"))).toMap
      val m = Perplexity.collectModel(model)
      assert(m.order === order)
      val viaKernel = Perplexity.scoreInline(docs, "text", m)
        .select("doc_id", "ppl").collect()
        .map(r => r.getLong(0) -> Option(r.getAs[java.lang.Double]("ppl"))).toMap
      assert(viaKernel.keySet === viaJoin.keySet)
      for ((id, k) <- viaKernel) (k, viaJoin(id)) match {
        case (None, None) => ()
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) <= 1e-9 * math.max(a, b),
            s"order $order doc $id: kernel $a vs join $b")
        case other => fail(s"order $order doc $id null mismatch: $other")
      }
    }
  }

  test("q_ppl_gate verdict is true at sf0.001 (driver-gate rehearsal)") {
    val out = graft.SparkEntry.queries("q_ppl_gate")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length === 1 && out(0).getBoolean(0), "perplexity gate returned false")
  }

  test("scoring plan: model joins broadcast, corpus text does not shuffle") {
    val docs = Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
    val m = Perplexity.train(reference, "text", buckets = 1 << 12, seed = 6)
    val plan = Perplexity.score(docs, "doc_id", "text", m)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
