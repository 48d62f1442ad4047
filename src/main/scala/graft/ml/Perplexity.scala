package graft.ml

import graft.plans.Kernels
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perplexity-based quality filtering — the CCNet pipeline's KenLM
  * stage (Wenzek et al. 2020, "CCNet: Extracting High Quality
  * Monolingual Datasets from Web Crawl Data", §4.3: score documents by
  * language-model perplexity against a clean reference corpus, then
  * filter or head/middle/tail-bucket on the score) re-expressed as a
  * distributed hashed n-gram model instead of a native KenLM binary.
  *
  * Model: unigram + bigram token counts under the hashing trick (as in
  * [[Dsir]] — xxhash64 → `buckets` bins), so the trained model is at
  * most `2 × buckets` rows NO MATTER how large the reference corpus is,
  * and broadcasts to every executor. Probability of a transition is
  * Jelinek–Mercer interpolated:
  *
  *   P(w | prev) = λ · cb(prev,w) / cu(prev)  +  (1−λ) · (cu(w)+1) / (N+B)
  *
  * (conditional bigram estimate backed off to an add-one-smoothed
  * unigram; never zero, so log is total). Document perplexity =
  * exp(mean −log P over its transitions).
  *
  * Scale shape: training is two partial-agg shuffles of hashed longs
  * (counts only — tokens never shuffle); scoring is explode → two
  * BROADCAST joins → per-doc partial mean, so the corpus text itself
  * never crosses the network and the only shuffle payload is one
  * (doc_id, partial-sum) pair per partition.
  */
object Perplexity {

  /** Hashed LM counts: `(kind 1=unigram|2=bigram, bucket, cnt)` plus the
    * constant training-token total `n_tokens` on every row (rides along
    * so the model is one self-contained broadcastable frame). The
    * hashing parameters `buckets` and `seed` ALSO ride on every row:
    * scoring reads them from the model itself, so a train/score pair can
    * never silently disagree on the hash space (a mismatch would read
    * every count as 0 and score everything at the smoothed floor — no
    * error, just garbage).
    */
  def train(
      corpus: DataFrame, textCol: String,
      buckets: Int = 1 << 16, seed: Int = 0): DataFrame = {
    require(buckets > 0, s"buckets: $buckets")
    def counts(n: Int, kind: Int): DataFrame = corpus
      .select(explode(Kernels.wordShingles(col(textCol), n)).as("__sh"))
      .select(pmod(xxhash64(col("__sh"), lit(seed)), lit(buckets.toLong)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .select(lit(kind).as("kind"), col("bucket"), col("cnt"))
    val uni = counts(1, 1)
    val bi = counts(2, 2)
    val total = uni.agg(sum("cnt").as("n_tokens"))
    uni.unionByName(bi).crossJoin(broadcast(total))
      .withColumn("buckets", lit(buckets))
      .withColumn("seed", lit(seed))
  }

  /** The model's (buckets, seed, n_tokens) header — constant on every
    * row; one tiny collect. Clear error on an empty model instead of an
    * NPE three frames deep.
    */
  private def header(model: DataFrame): (Int, Int, Long) = {
    val rows = model.select(first("buckets"), first("seed"), first("n_tokens")).collect()
    require(rows.nonEmpty && !rows(0).isNullAt(0),
      "empty perplexity model: the reference corpus produced no tokens")
    (rows(0).getInt(0), rows(0).getInt(1), rows(0).getLong(2))
  }

  /** `docs` + `ppl` (document perplexity under `model`) and
    * `n_transitions`. Docs with fewer than 2 tokens have no bigram
    * transitions: `ppl` is null there (no evidence either way — callers
    * filter or fill by policy, CCNet drops them).
    */
  def score(
      docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame,
      lambda: Double = 0.8): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0, s"lambda: $lambda")
    // The model plan (two shuffles over the whole reference corpus) is
    // read three times below (uni, bi, header) — persist it through a
    // scope that drains after the caller's first action, so a
    // train-then-score pipeline pays training ONCE, not per broadcast.
    // A model the CALLER already persisted is used as-is and NOT drained
    // (multi-score pipelines own their model's lifetime).
    val scope = new graft.operators.CacheScope
    val callerCached = model.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val m = if (callerCached) model else scope.persist(model)
    // buckets/seed come from the model itself (train stamped them on
    // every row) — a hash-space mismatch is impossible by construction.
    // The header collect MATERIALIZES the scope's cache; if it throws
    // (empty model), the cache must not leak — releaseAfter's cleanup
    // listener is only installed at the end.
    val (buckets, seed, nTokens) =
      try header(m)
      catch { case e: Throwable => if (!callerCached) scope.releaseNow(); throw e }
    // model is ≤ 2×buckets rows; both kinds come from the one broadcast
    val uni = broadcast(m.filter(col("kind") === 1)
      .select(col("bucket").as("__ub"), col("cnt").as("__cu")))
    val bi = broadcast(m.filter(col("kind") === 2)
      .select(col("bucket").as("__bb"), col("cnt").as("__cb")))
    def h(c: org.apache.spark.sql.Column) =
      pmod(xxhash64(c, lit(seed)), lit(buckets.toLong))
    val transitions = docs
      .select(col(idCol), explode(Kernels.wordShingles(col(textCol), 2)).as("__sh"))
      .select(col(idCol),
        h(col("__sh")).as("__hb"),
        h(substring_index(col("__sh"), " ", 1)).as("__hprev"),
        h(substring_index(col("__sh"), " ", -1)).as("__hcur"))
      .join(bi, col("__hb") === col("__bb"), "left")
      .join(uni.select(col("__ub"), col("__cu").as("__cprev")),
        col("__hprev") === col("__ub"), "left").drop("__ub")
      .join(uni, col("__hcur") === col("__ub"), "left")
    val pCond = when(col("__cprev").isNotNull && col("__cb").isNotNull,
      col("__cb").cast("double") / col("__cprev")).otherwise(lit(0.0))
    // the token total is a header scalar (NOT a column from the unigram
    // left join — a transition whose word hashes to an unseen bucket
    // must still see it; a join-null here would null the whole doc)
    val pUni = (coalesce(col("__cu"), lit(0L)).cast("double") + 1.0) /
      (nTokens.toDouble + buckets.toDouble)
    val nll = -log(lit(lambda) * pCond + lit(1.0 - lambda) * pUni)
    val perDoc = transitions
      .select(col(idCol), nll.as("__nll"))
      .groupBy(col(idCol))
      .agg(exp(avg("__nll")).as("ppl"), count(lit(1)).as("n_transitions"))
    val out = docs.join(perDoc, Seq(idCol), "left")
      .withColumn("n_transitions", coalesce(col("n_transitions"), lit(0L)))
    if (callerCached) out else scope.releaseAfter(out)
  }

  /** The trained model collected into sorted primitive arrays for the
    * per-row kernel: bounded by construction (≤ 2×buckets rows — the
    * hashing trick caps it regardless of corpus size), so the collect
    * is a driver-safe constant, not a data-sized pull.
    */
  final case class LocalModel(
      uniK: Array[Long], uniV: Array[Long],
      biK: Array[Long], biV: Array[Long],
      nTokens: Long, buckets: Int, seed: Int)

  def collectModel(model: DataFrame): LocalModel = {
    // one materialization for all three reads (header + both kinds)
    val rows = model.select("kind", "bucket", "cnt", "n_tokens", "buckets", "seed").collect()
    require(rows.nonEmpty,
      "empty perplexity model: the reference corpus produced no tokens")
    def arrays(kind: Int): (Array[Long], Array[Long]) = {
      val ks = rows.filter(_.getInt(0) == kind)
        .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      (ks.map(_._1), ks.map(_._2))
    }
    val (uk, uv) = arrays(1)
    val (bk, bv) = arrays(2)
    LocalModel(uk, uv, bk, bv,
      rows(0).getLong(3), rows(0).getInt(4), rows(0).getInt(5))
  }

  /** Per-ROW perplexity column from the kernel — bit-compatible with
    * [[score]]'s broadcast-join path (same hashing, same interpolation;
    * pinned by spec) but with NO explode/join/aggregation, so it runs
    * map-side in one pass and — being stateless — composes into
    * Structured Streaming, where the join path's per-doc groupBy
    * cannot. The trade: the model rides the plan as expression
    * constants, so keep `buckets` at the default 2^16 scale here and
    * use [[score]] for jumbo-bucket models.
    */
  def pplColumn(text: org.apache.spark.sql.Column, m: LocalModel,
      lambda: Double = 0.8): org.apache.spark.sql.Column =
    Kernels.pplScore(text, m.uniK, m.uniV, m.biK, m.biV,
      m.nTokens, m.buckets.toLong, m.seed, lambda)

  /** [[score]]'s output shape via the per-row kernel. */
  def scoreInline(
      docs: DataFrame, textCol: String, m: LocalModel,
      lambda: Double = 0.8): DataFrame =
    docs.withColumn("ppl", pplColumn(col(textCol), m, lambda))

  /** CCNet's head/middle/tail banding: label each scored doc by where
    * its perplexity falls against the corpus distribution —
    * `head` below the `headFrac` quantile (cleanest), `tail` above the
    * `tailFrac` quantile, `middle` between, null ppl → `unscored`.
    * Thresholds via approx quantiles (single pass, broadcast back).
    */
  def withBand(
      scored: DataFrame, pplCol: String = "ppl",
      headFrac: Double = 0.33, tailFrac: Double = 0.67): DataFrame = {
    require(headFrac > 0 && headFrac < tailFrac && tailFrac < 1,
      s"fractions: $headFrac/$tailFrac")
    // `scored` (the whole scoring pipeline, often with training behind
    // it) feeds BOTH the threshold agg and the output — persist through
    // a scope so it runs once, not twice
    val scope = new graft.operators.CacheScope
    val s = scope.persist(scored)
    val thresholds = broadcast(s.agg(
      percentile_approx(col(pplCol), lit(headFrac), lit(10000)).as("__head_t"),
      percentile_approx(col(pplCol), lit(tailFrac), lit(10000)).as("__tail_t")))
    scope.releaseAfter(
      s.crossJoin(thresholds)
        .withColumn("band",
          when(col(pplCol).isNull, lit("unscored"))
            .when(col(pplCol) <= col("__head_t"), lit("head"))
            .when(col(pplCol) > col("__tail_t"), lit("tail"))
            .otherwise(lit("middle")))
        .drop("__head_t", "__tail_t"))
  }

  /** Train on `reference`, score `docs`, keep those at or under
    * `maxPpl` — the one-call CCNet-style filter.
    */
  def filterByPerplexity(
      docs: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String,
      maxPpl: Double,
      buckets: Int = 1 << 16, seed: Int = 0, lambda: Double = 0.8): DataFrame = {
    val model = train(reference, refTextCol, buckets, seed)
    score(docs, idCol, textCol, model, lambda)
      .filter(col("ppl").isNotNull && col("ppl") <= maxPpl)
      .drop("ppl", "n_transitions")
  }
}
