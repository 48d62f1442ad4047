package graft.ml

import graft.plans.Kernels
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Learned quality filtering — the "pages similar to a clean reference
  * corpus" classifier used by the GPT-3 / CCNet data pipelines (Brown
  * et al. 2020 §A; Wenzek et al. 2020 §4.4 train a fastText linear
  * classifier against Wikipedia), re-expressed as distributed logistic
  * regression over HASHED n-gram term frequencies. Complements the
  * heuristic quality score (`TextFunctions.qualityScore`) and the
  * perplexity gate ([[Perplexity]]): those are fixed rules; this is
  * trained from labeled positives/negatives the caller supplies.
  *
  * Features: the hashing trick over word n-grams, orders `1..order`
  * (xxhash64 → `buckets` bins — the same bucket contract as [[Dsir]] /
  * [[Perplexity]], pinned bit-identical between the kernel and
  * DataFrame paths), L1-normalized per document so documents of
  * different lengths are comparable. The model is ONE dense
  * `buckets`-sized weight vector + bias — bounded regardless of corpus
  * size, broadcastable to every executor.
  *
  * Scale shape: labeled sets for quality classifiers are modest
  * (CCNet's reference is one language's Wikipedia) — featurization is
  * one map-side kernel pass (no shuffle; the text never leaves its
  * partition), then each training iteration is ONE treeAggregate of a
  * `buckets`-sized dense gradient (the classic distributed-GD shape —
  * depth-2 combine, no per-record driver traffic). SCORING is the
  * 100 TB path: a stateless codegen kernel ([[Kernels.LogRegProbExpr]])
  * — zero shuffle, composes into Structured Streaming.
  */
object QualityClassifier {

  /** Trained model. `loss` is the per-iteration mean log-loss (for
    * convergence checks in specs/monitoring).
    */
  final case class Model(
      weights: Array[Double], bias: Double,
      buckets: Int, seed: Int, order: Int, loss: Array[Double])

  /** Train on labeled frames: `pos` (label 1) vs `neg` (label 0), by
    * full-batch gradient descent with `1/sqrt(t)` step decay and L2
    * regularization. One pass per iteration over the ONCE-featurized,
    * persisted gram-bucket frame; the text itself is read exactly once.
    */
  def train(
      pos: DataFrame, neg: DataFrame, textCol: String,
      buckets: Int = 1 << 16, seed: Int = 0, order: Int = 2,
      iters: Int = 60, lr: Double = 5.0, l2: Double = 1e-6): Model = {
    require(buckets > 0 && buckets <= (1 << 22),
      s"buckets: $buckets (dense model must broadcast; max 2^22)")
    require(order >= 1 && order <= 3, s"order: $order")
    require(iters > 0 && lr > 0 && l2 >= 0, s"iters/lr/l2: $iters/$lr/$l2")
    val spark = pos.sparkSession
    import spark.implicits._
    val labeled = pos.select(lit(1.0).as("__y"), col(textCol).as("__t"))
      .unionByName(neg.select(lit(0.0).as("__y"), col(textCol).as("__t")))
    // featurize ONCE (map-side kernel — no shuffle), persist for the
    // iteration loop; drained below whatever happens
    val feats = labeled
      .select(col("__y"),
        Kernels.hashedGrams(col("__t"), buckets.toLong, seed, order).as("__g"))
      .as[(Double, Array[Long])]
      .persist()
    try {
      val n = feats.count()
      require(n > 0, "quality classifier: no training documents")
      val sc = spark.sparkContext
      val w = new Array[Double](buckets)
      var bias = 0.0
      val lossHist = new Array[Double](iters)
      var it = 0
      while (it < iters) {
        val bw = sc.broadcast((w.clone(), bias))
        // (grad, gradBias, loss): one buckets-sized dense array per
        // partition, combined tree-wise — never per-record to the driver
        val (g, gb, loss) = feats.rdd.treeAggregate(
          (new Array[Double](buckets), 0.0, 0.0))(
          seqOp = { case ((g, gb, loss), (y, bkts)) =>
            val (wv, b) = bw.value
            val total = bkts.length
            var z = b
            if (total > 0) {
              var s = 0.0
              var i = 0
              while (i < total) { s += wv(bkts(i).toInt); i += 1 }
              z += s / total
            }
            val p = 1.0 / (1.0 + math.exp(-z))
            val d = p - y
            if (total > 0) {
              val scale = d / total
              var i = 0
              while (i < total) { g(bkts(i).toInt) += scale; i += 1 }
            }
            val eps = 1e-12
            (g, gb + d,
              loss - (y * math.log(p + eps) + (1.0 - y) * math.log(1.0 - p + eps)))
          },
          combOp = { case ((g1, gb1, l1), (g2, gb2, l2x)) =>
            var i = 0
            while (i < buckets) { g1(i) += g2(i); i += 1 }
            (g1, gb1 + gb2, l1 + l2x)
          })
        bw.destroy()
        val step = lr / math.sqrt(it + 1.0)
        var i = 0
        while (i < buckets) {
          w(i) -= step * (g(i) / n + l2 * w(i))
          i += 1
        }
        bias -= step * (gb / n)
        lossHist(it) = loss / n
        it += 1
      }
      Model(w, bias, buckets, seed, order, lossHist)
    } finally { feats.unpersist(false); () }
  }

  /** Per-row quality probability σ(bias + w·tf) from the codegen kernel
    * — stateless, zero shuffle, streams. Docs with no grams carry no
    * evidence → σ(bias), the prior.
    */
  def prob(text: org.apache.spark.sql.Column, m: Model): org.apache.spark.sql.Column =
    Kernels.logRegProb(text, m.weights, m.bias, m.buckets.toLong, m.seed, m.order)

  /** `docs` + `quality_prob`. */
  def scoreInline(docs: DataFrame, textCol: String, m: Model): DataFrame =
    docs.withColumn("quality_prob", prob(col(textCol), m))

  /** Keep docs with `quality_prob >= minProb` (the GPT-3-style gate;
    * Brown et al. additionally Pareto-sample below the threshold —
    * compose with [[graft.operators.Sampling]] for that).
    */
  def filterByQuality(
      docs: DataFrame, textCol: String, m: Model, minProb: Double): DataFrame =
    docs.filter(prob(col(textCol), m) >= minProb)

  /** The model as a self-contained DataFrame: one `(bucket, w)` row per
    * NONZERO weight plus a `bucket = -1` header sentinel (no hash
    * bucket is negative, so it never matches a join), with
    * `(bias, buckets, seed, n_order)` stamped on every row — the
    * [[Perplexity]] self-description rule: a score pair can never
    * silently disagree with training on the hash space.
    */
  def modelFrame(spark: SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    val nz = m.weights.iterator.zipWithIndex
      .filter(_._1 != 0.0).map { case (w, i) => (i.toLong, w) }.toSeq
    ((-1L, 0.0) +: nz).toDF("bucket", "w")
      .withColumn("bias", lit(m.bias))
      .withColumn("buckets", lit(m.buckets))
      .withColumn("seed", lit(m.seed))
      .withColumn("n_order", lit(m.order))
  }

  def save(spark: SparkSession, m: Model, path: String): Unit =
    modelFrame(spark, m).repartition(1).write.mode("overwrite").parquet(path)

  /** Bounded collect: the frame is ≤ buckets+1 rows by construction. */
  def load(spark: SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path)
      .select("bucket", "w", "bias", "buckets", "seed", "n_order").collect()
    require(rows.nonEmpty, s"empty quality-classifier model at $path")
    val buckets = rows(0).getInt(3)
    val w = new Array[Double](buckets)
    rows.foreach { r =>
      val b = r.getLong(0)
      if (b >= 0) w(b.toInt) = r.getDouble(1)
    }
    Model(w, rows(0).getDouble(2), buckets, rows(0).getInt(4),
      rows(0).getInt(5), Array.empty)
  }

  /** Scoring through DataFrame ops + a broadcast join against
    * [[modelFrame]] — an implementation INDEPENDENT of the kernel
    * (DataFrame-native `xxhash64` hashing, explode + join + partial
    * agg), pinned equal to [[prob]] by spec and by the `q_quality_clf`
    * gate. Use when the model lives as a table (e.g. loaded on another
    * cluster) and for parity verification; the kernel is the fast path.
    */
  def scoreJoin(
      docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val scope = new graft.operators.CacheScope
    val callerCached =
      model.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val mdf = if (callerCached) model else scope.persist(model)
    val hdr =
      try {
        val r = mdf.select(first("bias"), first("buckets"), first("seed"),
          first("n_order")).collect()
        require(r.nonEmpty && !r(0).isNullAt(0),
          "empty quality-classifier model frame")
        r(0)
      } catch {
        case e: Throwable => if (!callerCached) scope.releaseNow(); throw e
      }
    val (bias, buckets, seed, order) =
      (hdr.getDouble(0), hdr.getInt(1), hdr.getInt(2), hdr.getInt(3))
    val grams = (1 to order).map(n => Kernels.wordShingles(col(textCol), n))
      .reduce(concat(_, _))
    val perDoc = docs
      .select(col(idCol), explode(grams).as("__sh"))
      .select(col(idCol),
        pmod(xxhash64(col("__sh"), lit(seed)), lit(buckets.toLong)).as("__b"))
      .join(broadcast(mdf.select(col("bucket").as("__b"), col("w"))),
        Seq("__b"), "left")
      .groupBy(col(idCol))
      .agg((sum(coalesce(col("w"), lit(0.0))) / count(lit(1))).as("__dot"))
    // null text scores NULL, not sigma(bias): the kernel path
    // ([[prob]], nullSafeEval) yields NULL there, and the two paths are
    // pinned equal — a left-join coalesce must not resurrect rows the
    // kernel's downstream quality filter would drop
    val out = docs.join(perDoc, Seq(idCol), "left")
      .withColumn("quality_prob",
        when(col(textCol).isNull, lit(null).cast("double"))
          .otherwise(lit(1.0) / (lit(1.0) +
            exp(-(lit(bias) + coalesce(col("__dot"), lit(0.0)))))))
      .drop("__dot")
    if (callerCached) out else scope.releaseAfter(out)
  }
}
