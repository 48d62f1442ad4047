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
      .select(col("query_id"), col("neighbour_id"))
    val approx = lshKnn(buildIndex(corpus, idCol, vecCol, dim, nPlanes),
      queries, idCol, vecCol, dim, k, nPlanes)
      .select(col("query_id"), col("neighbour_id"))
    val hits = exact.intersect(approx).count().toDouble
    val total = exact.count().toDouble
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq((k, if (total == 0) 0.0 else hits / total)).toDF("k", "recall")
  }
}
