package graft.ml

import graft.plans.Kernels
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
  * select raw-corpus documents whose hashed-n-gram distribution looks
  * like a (small) target corpus, by importance weight
  * `p_target(doc) / p_raw(doc)` under bag-of-hashed-n-grams unigram
  * models.
  *
  * Pipeline shape, all distributed:
  *   1. featurize both corpora: word n-grams → xxhash64 → `buckets`
  *      bins (the hashing trick — the model is a fixed-size count
  *      vector no matter how large the corpus);
  *   2. per-bin probabilities with add-one smoothing → a tiny
  *      (≤ buckets rows) log-ratio frame;
  *   3. per-doc log importance weight = Σ over the doc's n-grams of
  *      log p_target(bin) − log p_raw(bin), via explode +
  *      broadcast-join + re-aggregate (partial sums map-side, so the
  *      shuffle carries one partial per doc per partition);
  *   4. [[selectByLogWeight]]: a deterministic Gumbel-style draw —
  *      rank on log-weight + Gumbel noise from a per-id LCG uniform
  *      (equivalent to sampling ∝ weight without replacement;
  *      Efraimidis–Spirakis in log space, overflow-free) — then top-n
  *      via TakeOrderedAndProject.
  *
  * The categorical cousin (exact strata weights, DuckDB-oracled) is
  * [[graft.operators.Sampling.importanceResample]]; this is the
  * full-text shape for "make web data look like Wikipedia".
  */
object Dsir {

  /** (bucket, log_ratio, log_floor) frame: smoothed log(p_target /
    * p_raw) per hashed n-gram bin. `log_floor` (constant on every row)
    * is the ratio a bin unseen in BOTH training corpora would get —
    * [[logWeights]] uses it so scoring a corpus with novel vocabulary
    * never silently drops n-grams.
    */
  def logRatios(
      raw: DataFrame, rawTextCol: String,
      target: DataFrame, targetTextCol: String,
      nGram: Int = 2, buckets: Int = 1 << 16, seed: Int = 0): DataFrame = {
    def counts(df: DataFrame, textCol: String, name: String): DataFrame =
      df.select(explode(Kernels.wordShingles(col(textCol), nGram)).as("__sh"))
        .select(pmod(xxhash64(col("__sh"), lit(seed)), lit(buckets.toLong)).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(name))
    val t = counts(target, targetTextCol, "__ct")
    val r = counts(raw, rawTextCol, "__cr")
    // totals ride along as scalar columns (tiny frames; no collect)
    val tTot = t.agg(sum("__ct").as("__tt"))
    val rTot = r.agg(sum("__cr").as("__rt"))
    t.join(r, Seq("bucket"), "full")
      .na.fill(0L, Seq("__ct", "__cr"))
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("bucket"),
        (log((col("__ct") + 1.0) / (col("__tt") + buckets.toDouble)) -
          log((col("__cr") + 1.0) / (col("__rt") + buckets.toDouble))).as("log_ratio"),
        (log(lit(1.0) / (col("__tt") + buckets.toDouble)) -
          log(lit(1.0) / (col("__rt") + buckets.toDouble))).as("log_floor"))
  }

  /** Raw docs + `log_w`: the doc's summed log importance ratio (the
    * paper's bag-of-n-grams likelihood ratio). Docs with no n-grams
    * (shorter than `nGram` words) get log_w = 0 (weight 1). The ratio
    * frame broadcasts (≤ buckets rows).
    *
    * `lengthNormalize` switches to the MEAN log ratio per n-gram —
    * sum weights scale with document length (a long off-target doc can
    * outweigh a short on-target one purely by n-gram count), so for
    * corpora with high length variance the mean is the stabler signal.
    */
  def logWeights(
      raw: DataFrame, idCol: String, textCol: String,
      ratios: DataFrame,
      nGram: Int = 2, buckets: Int = 1 << 16, seed: Int = 0,
      lengthNormalize: Boolean = false): DataFrame = {
    val agg = if (lengthNormalize) avg("__lr") else sum("__lr")
    // left join + floor fill: an n-gram hashing to a bucket unseen in
    // BOTH training corpora (possible when scoring a different corpus
    // than the ratios were trained on) still contributes the smoothed
    // floor instead of silently vanishing from an inner join. The
    // ratios pipeline (two corpus scans + aggs + full-outer join) is
    // read twice — once for the floor scalar, once for the lookup — so
    // it persists through a scope and drains after the caller's first
    // action rather than recomputing.
    val scope = new graft.operators.CacheScope
    val r = scope.persist(ratios)
    val floor = broadcast(r.select(first("log_floor").as("__fl")))
    val perDoc = raw
      .select(col(idCol), explode(Kernels.wordShingles(col(textCol), nGram)).as("__sh"))
      .select(col(idCol), pmod(xxhash64(col("__sh"), lit(seed)), lit(buckets.toLong)).as("bucket"))
      .join(broadcast(r), Seq("bucket"), "left")
      .crossJoin(floor)
      .withColumn("__lr", coalesce(col("log_ratio"), col("__fl")))
      .groupBy(col(idCol)).agg(agg.as("log_w"))
    scope.releaseAfter(
      raw.join(perDoc, Seq(idCol), "left").na.fill(0.0, Seq("log_w")))
  }

  /** Deterministic weighted sample without replacement: top `n` by
    * Gumbel-perturbed log-weight (`log_w − ln(−ln u)`; u from a per-id
    * LCG so retries and reruns reproduce the draw). Equivalent to the
    * Efraimidis–Spirakis u^(1/w) order taken in log space — no
    * exp(log_w) overflow for any weight magnitude. Executes as
    * TakeOrderedAndProject: no global sort, no shuffle of the corpus.
    */
  def selectByLogWeight(
      scored: DataFrame, idCol: String, logWCol: String, n: Int,
      seed: Int = 0, gumbel: Boolean = true): DataFrame = {
    require(n > 0, s"n: $n")
    val u = graft.operators.Sampling.lcgUniform(col(idCol), seed)
    // gumbel=false is the greedy τ→0 limit: plain top-n by weight
    val key = if (gumbel) col(logWCol) - log(-log(u)) else col(logWCol)
    scored.orderBy(key.desc, col(idCol)).limit(n)
  }

  /** End-to-end DSIR: featurize, weight, draw `n` docs from `raw` that
    * look like `target`.
    */
  def resampleLikeTarget(
      raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      n: Int, nGram: Int = 2, buckets: Int = 1 << 16, seed: Int = 0,
      lengthNormalize: Boolean = false, gumbel: Boolean = true): DataFrame = {
    val ratios = logRatios(raw, textCol, target, targetTextCol, nGram, buckets, seed)
    val scored = logWeights(raw, idCol, textCol, ratios, nGram, buckets, seed, lengthNormalize)
    selectByLogWeight(scored, idCol, "log_w", n, seed, gumbel).drop("log_w")
  }
}
