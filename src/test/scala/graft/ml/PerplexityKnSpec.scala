package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The interpolated Kneser–Ney smoothing variant: model self-description,
  * kernel/join parity, the continuation-count ("francisco") correction,
  * and order separation.
  */
class PerplexityKnSpec extends SparkSpec {
  import spark.implicits._

  private def reference = Seq.tabulate(60) { i =>
    s"the quick brown fox jumps over the lazy dog near the old stone bridge ${i % 5}"
  }.toDF("text")

  test("KN model self-describes: gram kinds + type-count sidecar + kind-0 total; JM stays JM") {
    val kn = Perplexity.train(reference, "text", buckets = 1 << 10, seed = 1, smoothing = "kn")
    val kinds = kn.select("kind").distinct().collect().map(_.getInt(0)).toSet
    assert(kinds === Set(0, 1, 2, 3, 4, 5, 6))
    // the kind-0 row carries the distinct-bigram-type total on bucket -1
    val b2 = kn.filter(col("kind") === 0).collect()
    assert(b2.length === 1 && b2(0).getAs[Long]("bucket") === -1L)
    assert(b2(0).getAs[Long]("cnt") > 0L)
    // bigram-order KN omits the trigram sidecar (kind 6)
    val kn2 = Perplexity.train(reference, "text", buckets = 1 << 10, seed = 1,
      order = 2, smoothing = "kn")
    assert(kn2.select("kind").distinct().collect().map(_.getInt(0)).toSet ===
      Set(0, 1, 2, 4, 5))
    // default train is untouched (the JM specs' contract)
    val jm = Perplexity.train(reference, "text", buckets = 1 << 10, seed = 1)
    assert(jm.select("kind").distinct().collect().map(_.getInt(0)).toSet === Set(1, 2, 3))
  }

  test("kernel path == broadcast-join path to 1e-8, both orders") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "dog lazy the over jumps fox brown quick the"),
      (3L, "zebra quantum flux capacitor discombobulated xylophone"),
      (4L, "fox"), (5L, "")
    ).toDF("doc_id", "text")
    for (order <- Seq(2, 3)) {
      val model = Perplexity.train(reference, "text", buckets = 1 << 12, seed = 2,
        order = order, smoothing = "kn").persist()
      try {
        val m = Perplexity.collectModel(model)
        assert(m.isKn && m.order === order)
        val viaJoin = Perplexity.score(docs, "doc_id", "text", model)
          .select(col("doc_id"), col("ppl").as("pj"))
        val viaKernel = Perplexity.scoreInline(docs, "text", m)
          .select(col("doc_id"), col("ppl").as("pk"))
        val rows = viaJoin.join(viaKernel, "doc_id").collect()
        assert(rows.length === 5)
        rows.foreach { r =>
          val (pj, pk) = (Option(r.getAs[Any]("pj")), Option(r.getAs[Any]("pk")))
          assert(pj.isDefined === pk.isDefined, s"null mismatch on doc ${r.getLong(0)}")
          pj.zip(pk).foreach { case (a, b) =>
            val (x, y) = (a.asInstanceOf[Double], b.asInstanceOf[Double])
            assert(math.abs(x - y) <= 1e-8 * math.max(1.0, x),
              s"doc ${r.getLong(0)} order $order: join $x vs kernel $y")
          }
        }
      } finally { model.unpersist(false); () }
    }
  }

  test("continuation counts beat raw frequency: the 'francisco' correction") {
    // "francisco" is FREQUENT but glued to one context; "city" is rarer
    // but follows many different words. After an unseen history, KN
    // must prefer "city" — a unigram-frequency model prefers "francisco".
    val corpus = (Seq.fill(30)("we visited san francisco yesterday") ++
      Seq("a nice city", "a big city", "an old city", "this small city",
        "that great city", "one busy city")).toDF("text")
    val model = Perplexity.train(corpus, "text", buckets = 1 << 12, seed = 3,
      order = 2, smoothing = "kn").persist()
    try {
      val m = Perplexity.collectModel(model)
      // sanity: raw unigram count of francisco dwarfs city
      val docs = Seq((1L, "unusualword francisco"), (2L, "unusualword city"))
        .toDF("doc_id", "text")
      val ppl = Perplexity.scoreInline(docs, "text", m)
        .collect().map(r => r.getLong(0) -> r.getAs[Double]("ppl")).toMap
      assert(ppl(2) < ppl(1),
        s"KN should prefer the many-context word: city ${ppl(2)} !< francisco ${ppl(1)}")
    } finally { model.unpersist(false); () }
  }

  test("KN separates natural from reversed text; short docs stay null") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog ${i % 5}"))
      .toDF("doc_id", "text")
    val reversed = docs.select(col("doc_id"),
      concat_ws(" ", reverse(split(col("text"), " "))).as("text"))
    val model = Perplexity.train(reference, "text", buckets = 1 << 12, seed = 4,
      smoothing = "kn").persist()
    try {
      def mean(d: org.apache.spark.sql.DataFrame) =
        Perplexity.score(d, "doc_id", "text", model)
          .agg(avg("ppl")).collect()(0).getDouble(0)
      assert(mean(docs) < mean(reversed))
      val short = Seq((1L, "fox two")).toDF("doc_id", "text")
      val r = Perplexity.score(short, "doc_id", "text", model).collect()(0)
      assert(r.isNullAt(r.fieldIndex("ppl")) && r.getAs[Long]("n_transitions") === 0L)
    } finally { model.unpersist(false); () }
  }

  test("KN scoring stays shuffle-free through the kernel and filters compose") {
    val model = Perplexity.train(reference, "text", buckets = 1 << 10, seed = 5,
      smoothing = "kn")
    val m = Perplexity.collectModel(model)
    val docs = Seq.tabulate(20)(i => (i.toLong, s"the quick brown fox $i")).toDF("doc_id", "text")
    val plan = Perplexity.scoreInline(docs, "text", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"KN kernel plan shuffles:\n$plan")
    val kept = docs.filter(Perplexity.pplColumn(col("text"), m) <= 1e9).count()
    assert(kept === 20)
  }
}
