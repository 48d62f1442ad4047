package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The learned quality filter (hashed-n-gram logistic regression):
  * separability, kernel/join parity, persistence, and the scale plan.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // two deterministic, lexically disjoint "domains": fluent-ish prose
  // vs keyboard-mash gibberish — the fixture a Wikipedia-vs-crawl
  // classifier would see, shrunk
  private def posDocs(n: Int, from: Int = 0) = Seq.tabulate(n) { i =>
    val j = i + from
    (j.toLong, s"the committee approved the annual budget report after a long debate " +
      s"on public spending priorities item ${j % 7}")
  }.toDF("doc_id", "text")

  private def negDocs(n: Int, from: Int = 0) = Seq.tabulate(n) { i =>
    val j = i + from
    (j.toLong + 100000L,
      s"xj qq zzk ${j % 11} vvw kpf zzt mmq jjx qqp wkz ${j % 13} ppv zzx jql")
  }.toDF("doc_id", "text")

  test("training separates disjoint domains; loss decreases; held-out accuracy >= 0.95") {
    val m = QualityClassifier.train(
      posDocs(80).select("text"), negDocs(80).select("text"), "text",
      buckets = 1 << 12, seed = 5, iters = 40)
    // full-batch GD on a separable problem: monotone-ish loss — compare
    // first vs last, not step-wise (decay keeps late steps tiny)
    assert(m.loss.last < m.loss.head,
      s"loss did not decrease: ${m.loss.head} -> ${m.loss.last}")
    // held-out docs from the same generators, disjoint index range
    val holdout = posDocs(40, from = 500).withColumn("y", lit(1.0))
      .unionByName(negDocs(40, from = 500).withColumn("y", lit(1.0) * 0))
    val scored = QualityClassifier.scoreInline(holdout, "text", m)
    val acc = scored
      .select(((col("quality_prob") >= 0.5).cast("double") === col("y"))
        .cast("long").as("ok"))
      .agg(avg("ok")).collect()(0).getDouble(0)
    assert(acc >= 0.95, s"held-out accuracy $acc < 0.95")
  }

  test("kernel path == broadcast-join path (independent hashing) to 1e-8; empty doc gets the prior") {
    val m = QualityClassifier.train(
      posDocs(40).select("text"), negDocs(40).select("text"), "text",
      buckets = 1 << 12, seed = 7, iters = 25)
    val docs = posDocs(10).unionByName(negDocs(10))
      .unionByName(Seq((999999L, "")).toDF("doc_id", "text"))
    val viaKernel = QualityClassifier.scoreInline(docs, "text", m)
      .select(col("doc_id"), col("quality_prob").as("pk"))
    val viaJoin = QualityClassifier.scoreJoin(
        docs, "doc_id", "text",
        QualityClassifier.modelFrame(spark, m))
      .select(col("doc_id"), col("quality_prob").as("pj"))
    val diffs = viaKernel.join(viaJoin, "doc_id")
      .select(abs(col("pk") - col("pj")).as("d")).collect().map(_.getDouble(0))
    assert(diffs.length === 21)
    assert(diffs.max <= 1e-8, s"max kernel/join diff ${diffs.max}")
    // the gram-less doc scores sigma(bias) on both paths
    val prior = 1.0 / (1.0 + math.exp(-m.bias))
    val empty = viaKernel.filter(col("doc_id") === 999999L).collect()(0).getDouble(1)
    assert(math.abs(empty - prior) <= 1e-12)
  }

  test("save/load roundtrip preserves scores exactly; model frame is self-describing") {
    val m = QualityClassifier.train(
      posDocs(30).select("text"), negDocs(30).select("text"), "text",
      buckets = 1 << 10, seed = 9, iters = 20)
    val dir = java.nio.file.Files.createTempDirectory("qclf").toString
    QualityClassifier.save(spark, m, s"$dir/model")
    val m2 = QualityClassifier.load(spark, s"$dir/model")
    assert(m2.buckets === m.buckets && m2.seed === m.seed && m2.order === m.order)
    assert(math.abs(m2.bias - m.bias) === 0.0)
    val docs = posDocs(5).unionByName(negDocs(5))
    val a = QualityClassifier.scoreInline(docs, "text", m)
      .orderBy("doc_id").collect().map(_.getDouble(2))
    val b = QualityClassifier.scoreInline(docs, "text", m2)
      .orderBy("doc_id").collect().map(_.getDouble(2))
    assert(a.zip(b).forall { case (x, y) => x == y })
    // header sentinel makes an all-zero-weight frame still loadable
    val hdr = QualityClassifier.modelFrame(spark, m)
      .filter(col("bucket") === -1L).collect()
    assert(hdr.length === 1 && hdr(0).getAs[Double]("w") === 0.0)
  }

  test("filterByQuality keeps high-probability docs; scoring is partition-invariant") {
    val m = QualityClassifier.train(
      posDocs(60).select("text"), negDocs(60).select("text"), "text",
      buckets = 1 << 12, seed = 11, iters = 40)
    val mixed = posDocs(20, from = 700).unionByName(negDocs(20, from = 700))
    val kept = QualityClassifier.filterByQuality(mixed, "text", m, minProb = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // positives have ids < 100000, negatives >= 100000
    assert(kept.forall(_ < 100000L), s"gibberish leaked through: $kept")
    assert(kept.size >= 18, s"only ${kept.size}/20 positives kept")
    def run(parts: Int) = QualityClassifier.scoreInline(
        mixed.repartition(parts), "text", m)
      .orderBy("doc_id").collect().map(_.getDouble(2)).toSeq
    assert(run(1) === run(7))
  }

  test("scale shape: scoring is one map-side kernel stage (no shuffle, no join)") {
    val m = QualityClassifier.train(
      posDocs(20).select("text"), negDocs(20).select("text"), "text",
      buckets = 1 << 10, seed = 13, iters = 10)
    val plan = QualityClassifier.scoreInline(posDocs(50), "text", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring plan shuffles:\n$plan")
    assert(!plan.contains("Join"), s"scoring plan joins:\n$plan")
  }
}
