package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval — BM25 (Robertson et al., Okapi at TREC-3,
  * 1994; the idf form is Lucene's non-negative `ln(1 + (N−df+0.5)/(df+0.5))`
  * variant), the classic keyword scorer a training-data pipeline runs
  * for reference-corpus mining, benchmark-leak triage, and as the
  * lexical half of hybrid (BM25 + dense ANN, see [[Ann]]) retrieval.
  *
  *   score(d, q) = Σ_{t∈q} idf(t) · tf(t,d)·(k1+1)
  *                              / (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))
  *
  * Scale shape: tokenization is map-side; only tokens matching the
  * (tiny, broadcast) query-term set survive into the explode, so the
  * shuffle carries (doc, term, tf) rows for QUERY terms only — corpus
  * text never crosses the network. Corpus stats (N, avgdl) are one
  * scalar aggregate; per-term document frequencies are a ≤|terms|-row
  * frame broadcast back into the scorer. No driver-side loop, no
  * cartesian: cost is one pass over the corpus plus a |terms|-key
  * aggregation, at any corpus size.
  */
object Retrieval {

  /** Per-document BM25 score against `terms`: `(idCol, score)` — one
    * row per document containing at least one query term (a zero-hit
    * document scores 0 and is omitted; union it back if you need
    * explicit zeros). Tokenization is single-space split, matching
    * [[graft.functions.TextFunctions.tokenCount]]'s whitespace
    * convention; null text scores no rows.
    */
  def bm25(
      docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25: empty term set")
    require(k1 >= 0 && b >= 0 && b <= 1, s"bm25: k1=$k1 b=$b")
    val scope = new graft.operators.CacheScope
    // (doc, dl, matching-term) — the only shuffled rows; cached because
    // both the df aggregation and the scorer read it
    val hits = scope.persist(docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("__tk"))
      .select(col(idCol), size(col("__tk")).cast("double").as("__dl"),
        explode(filter(col("__tk"), tk => tk.isInCollection(terms))).as("__t")))
    try {
      // corpus stats: one scalar agg (N docs, avg doc length) — over ALL
      // docs with text, not just the hit set
      val st = docs.filter(col(textCol).isNotNull)
        .agg(count(lit(1)).cast("double").as("n"),
          avg(size(split(col(textCol), " "))).as("avgdl")).collect()(0)
      val (n, avgdl) = (st.getDouble(0), st.getDouble(1))
      val tf = hits.groupBy(col(idCol), col("__t"))
        .agg(count(lit(1)).cast("double").as("__tf"), first("__dl").as("__dl"))
      val dfFrame = hits.select(col(idCol), col("__t")).distinct()
        .groupBy(col("__t")).agg(count(lit(1)).cast("double").as("__df"))
        .withColumn("__idf",
          log((lit(n) - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)) + lit(1.0)))
      val scored = tf.join(broadcast(dfFrame.select(col("__t"), col("__idf"))), Seq("__t"))
        .groupBy(col(idCol))
        .agg(sum(col("__idf") * (col("__tf") * lit(k1 + 1)) /
          (col("__tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__dl") / lit(avgdl))))
          .as("score"))
      scope.releaseAfter(scored)
    } catch { case e: Throwable => scope.releaseNow(); throw e }
  }

  /** Top-`k` documents by BM25, rank-stable for cross-engine compares:
    * ordered by the score ROUNDED to `roundTo` decimals (absorbing
    * last-ulp float drift between engines and between aggregation
    * orders), ties broken by id. Returns `(idCol, rank)`.
    */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      roundTo: Int = 6): DataFrame = {
    // distributed top-k FIRST (TakeOrderedAndProject — per-partition
    // heads, never a global sort or single-partition window over the
    // whole corpus); the rank window then runs over k rows only
    val top = bm25(docs, idCol, textCol, terms, k1, b)
      .withColumn("__r", round(col("score"), roundTo))
      .orderBy(col("__r").desc, col(idCol).asc)
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__r").desc, col(idCol).asc)
    top.withColumn("rank", row_number().over(w))
      .select(col(idCol), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) — the
    * standard hybrid-retrieval combiner: given ranked lists
    * `(idCol, rank)` (e.g. [[bm25TopK]]'s lexical ranks and an
    * [[Ann]]-family dense top-k), score each id by
    * Σ_lists 1/(k + rank) (absent from a list ⇒ contributes 0) and
    * return the fused top-`topK` as `(idCol, rank)`. RRF needs no
    * score calibration between the lists — only ranks — which is why
    * it is the default fusion in hybrid search.
    *
    * Scale shape: the inputs are already top-k lists (small); the
    * fusion is an outer join + TakeOrderedAndProject. Fused scores are
    * sums of exact rationals evaluated in a fixed order, so they are
    * bit-reproducible across engines; ties break by id.
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, topK: Int,
      k: Int = 60): DataFrame = {
    require(lists.size >= 2, s"rrfFuse: need >= 2 lists, got ${lists.size}")
    require(topK > 0 && k > 0, s"rrfFuse: topK=$topK k=$k")
    val scored = lists.zipWithIndex
      .map { case (l, i) =>
        l.select(col(idCol), (lit(1.0) / (lit(k) + col("rank"))).as(s"__s$i"))
      }
      .reduce((a, b) => a.join(b, Seq(idCol), "outer"))
    val total = lists.indices
      .map(i => coalesce(col(s"__s$i"), lit(0.0)))
      .reduce(_ + _)
    val top = scored.select(col(idCol), total.as("__rrf"))
      .orderBy(col("__rrf").desc, col(idCol).asc)
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rrf").desc, col(idCol).asc)
    top.withColumn("rank", row_number().over(w))
      .select(col(idCol), col("rank"))
  }
}
