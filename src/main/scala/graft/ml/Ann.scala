package graft.ml

import graft.functions.Similarity
import graft.plans.Kernels
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbour search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (broadcast the query set — exact,
  * one pass over the corpus, no shuffle of the corpus).
  * Scale path: IVF-style coarse quantization — deterministic LSH bucket
  * as the "centroid", probe only matching buckets.
  */
object Ann {

  /** Exact top-k neighbours for each query row. `queries` must be small
    * enough to broadcast (the usual case: a probe/eval set). The corpus
    * is scanned once; per corpus row we compute |queries| cosines
    * map-side, then a single shuffle on query id reduces to top-k.
    */
  def bruteForceKnn(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbour_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbour_id"))
      .select(col("query_id"), col("neighbour_id"),
        Kernels.cosineSim(col("qv"), col("cv")).as("cosine"))
    // top-k per query via min_by-style partial agg would need a sketch;
    // row_number window is per-query-id partitioned (narrow skew surface)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbour_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF/LSH-bucketed ANN: corpus is pre-bucketed by hyperplane LSH (this
    * is the "index build" — persist `buildIndex`'s output partitioned by
    * bucket at real scale); queries probe only their own bucket.
    * Recall < 1.0 by construction; increase `nPlanes` overlap by probing
    * neighbouring buckets (1-bit flips) with `probeBits` > 0.
    */
  def buildIndex(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
      nPlanes: Int = 8): DataFrame =
    corpus.select(col(idCol).as("neighbour_id"), col(vecCol).as("cv"),
      Kernels.hyperplaneBucket(col(vecCol), nPlanes).as("bucket"))

  def lshKnn(
      index: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int = 10,
      nPlanes: Int = 8,
      probeBits: Int = 1): DataFrame = {
    val qb = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      Kernels.hyperplaneBucket(col(vecCol), nPlanes).as("b0"))
    // multi-probe: own bucket + every 1-bit-flip neighbour bucket
    val probes = col("b0") +: (if (probeBits >= 1)
      (0 until nPlanes).map(p => col("b0").bitwiseXOR(lit(1L << p))) else Nil)
    val probed = qb.select(col("query_id"), col("qv"),
      explode(array(probes: _*)).as("bucket"))
    val scored = probed.join(index, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbour_id"))
      .select(col("query_id"), col("neighbour_id"),
        Kernels.cosineSim(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbour_id").asc)
    scored.distinct().withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // ---- IVF (inverted-file) path ------------------------------------

  // Trained quantizers are model artifacts: train once per (corpus,
  // hyperparams), reuse across index build / search / recall eval —
  // exactly what a production ANN pipeline persists. Keyed on the
  // canonicalized logical plan, so the same source re-read through a
  // fresh DataFrame still hits. Deterministic fit (fixed seed, bounded
  // sample), so caching is pure memoization.
  private val centroidMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  /** Train the IVF coarse quantizer: k-means over a corpus sample.
    * Centroids are tiny (nList × dim doubles) — they come back to the
    * driver and ride into [[buildIvfIndex]]/[[ivfKnn]] as expression
    * constants, so assignment/probing is pure map-side.
    */
  def trainCentroids(
      corpus: DataFrame,
      vecCol: String,
      nList: Int = 64,
      sampleN: Int = 20000,
      seed: Long = 42L,
      maxIter: Int = 10): Array[Array[Double]] = {
    val key = corpus.queryExecution.analyzed.canonicalized.toString +
      s"|$vecCol|$nList|$sampleN|$seed|$maxIter"
    centroidMemo.computeIfAbsent(key, _ => {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val sample = corpus.select(array_to_vector(col(vecCol)).as("features")).limit(sampleN)
      // random init, not k-means||: the parallel init alone costs several
      // passes, and a coarse quantizer (FAISS-style) doesn't need it
      val model = new KMeans().setK(nList).setSeed(seed).setMaxIter(maxIter)
        .setInitMode("random").setTol(1e-3).fit(sample)
      model.clusterCenters.map(_.toArray)
    })
  }

  /** IVF index: every corpus vector assigned to its nearest centroid's
    * inverted list — one narrow map-side pass (no shuffle). At real scale
    * write this out `partitionBy("list")`: probing then prunes to
    * nProbe/nList of the files.
    */
  def buildIvfIndex(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame =
    corpus.select(col(idCol).as("neighbour_id"), col(vecCol).as("cv"),
      element_at(Kernels.nearestCentroids(col(vecCol), centroids, 1), 1).as("list"))

  /** IVF search: probe the `nProbe` nearest inverted lists per query,
    * exact cosine within the probed lists, top-k. Cost ~ nProbe/nList of
    * brute force; recall grows with nProbe (the classic IVF trade,
    * Jégou et al., IVFADC minus the PQ compression).
    */
  def ivfKnn(
      index: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      k: Int = 10,
      nProbe: Int = 4): DataFrame = {
    val probed = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(Kernels.nearestCentroids(col(vecCol), centroids, nProbe)).as("list"))
    val scored = probed.join(index, Seq("list"))
      .filter(col("query_id") =!= col("neighbour_id"))
      .select(col("query_id"), col("neighbour_id"),
        Kernels.cosineSim(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbour_id").asc)
    // a (query, neighbour) pair can only appear once — lists partition
    // the corpus — so no distinct needed (unlike multi-probe LSH)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Recall@k of the IVF index against exact brute force. */
  def ivfRecallAtK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      nList: Int = 64,
      nProbe: Int = 4): DataFrame = {
    val centroids = trainCentroids(corpus, vecCol, nList)
    // exact set feeds both the intersect and the denominator: cache it
    // so brute force runs once, not twice
    val exact = bruteForceKnn(corpus, queries, idCol, vecCol, k)
      .select(col("query_id"), col("neighbour_id")).cache()
    val approx = ivfKnn(buildIvfIndex(corpus, idCol, vecCol, centroids),
      queries, idCol, vecCol, centroids, k, nProbe)
      .select(col("query_id"), col("neighbour_id"))
    try {
      val hits = exact.intersect(approx).count().toDouble
      val total = exact.count().toDouble
      val spark = corpus.sparkSession
      import spark.implicits._
      Seq((k, if (total == 0) 0.0 else hits / total)).toDF("k", "recall")
    } finally exact.unpersist(blocking = false)
  }

  /** Recall@k of the LSH index against exact brute force — the eval loop
    * for tuning nPlanes/probeBits. One row: (k, recall).
    */
  def recallAtK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int = 10,
      nPlanes: Int = 8): DataFrame = {
    val exact = bruteForceKnn(corpus, queries, idCol, vecCol, k)
      .select(col("query_id"), col("neighbour_id")).cache()
    val approx = lshKnn(buildIndex(corpus, idCol, vecCol, dim, nPlanes),
      queries, idCol, vecCol, dim, k, nPlanes)
      .select(col("query_id"), col("neighbour_id"))
    try {
      val hits = exact.intersect(approx).count().toDouble
      val total = exact.count().toDouble
      val spark = corpus.sparkSession
      import spark.implicits._
      Seq((k, if (total == 0) 0.0 else hits / total)).toDF("k", "recall")
    } finally exact.unpersist(blocking = false)
  }
}
