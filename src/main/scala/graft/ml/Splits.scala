package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-safe dataset splitting: assign every document to
  * train/holdout so that NEAR-DUPLICATE CLUSTERS never straddle the
  * boundary — the contamination mode a plain per-doc random split
  * invites (a held-out doc whose near-twin sits in training measures
  * memorization, not generalization; cf. Lee et al. 2022 §6's
  * train/test overlap findings). The unit of assignment is the
  * connected component of the caller's near-dup pair set (the same
  * pairs [[Dedup.minhashPairs]] / [[Dedup.embeddingPairs]] emit), so
  * the guarantee is structural, not statistical.
  *
  * Determinism: the side is a pure function of (component id, seed) —
  * a salted md5 compared against a fixed hex threshold — so the split
  * is reproducible across runs, partitionings, AND engines (md5 of
  * the same string is engine-portable; the driver oracle reproduces
  * the exact assignment in DuckDB, unlike rand()-based splits).
  *
  * Scale shape: one [[Dedup.connectedComponents]] pass over the pair
  * set (pairs are tiny relative to the corpus), one left join of
  * labels onto the corpus, then a stateless map — no extra shuffle of
  * the documents beyond that join.
  */
object Splits {

  /** `docs` + `split` ("train" | "holdout"). `holdoutPermille` is the
    * target holdout share in permille (1000ths) — granularity is the
    * CLUSTER, so the realized share wobbles around it. Docs absent
    * from `pairs` are their own singleton cluster.
    */
  def leakageSafeSplit(
      docs: DataFrame, idCol: String, pairs: DataFrame,
      holdoutPermille: Int = 100, seed: Int = 0,
      splitCol: String = "split"): DataFrame = {
    require(holdoutPermille > 0 && holdoutPermille < 1000,
      s"holdoutPermille: $holdoutPermille (1..999)")
    require(!docs.columns.contains(splitCol),
      s"leakageSafeSplit: docs already have a '$splitCol' column — " +
        "rename or drop it (the packSequences 'bin' guard)")
    val comp = Dedup.connectedComponents(pairs)
      .select(col("id").as("__cc_id"), col("label").as("__cc_label"))
    // the first 4 md5 nibbles as a 16-bit bucket, compared as a STRING:
    // fixed-length lowercase hex orders lexicographically == numerically,
    // which keeps the predicate portable to the SQL oracle verbatim
    val threshold = f"${holdoutPermille * 65536 / 1000}%04x"
    val withComp = docs
      .join(comp, docs(idCol) === col("__cc_id"), "left")
      .withColumn("__comp", coalesce(col("__cc_label"), docs(idCol)))
    withComp
      .withColumn(splitCol,
        when(substring(md5(concat(col("__comp").cast("string"),
          lit("_" + seed)).cast("binary")), 1, 4) < threshold,
          lit("holdout")).otherwise(lit("train")))
      .drop("__cc_id", "__cc_label", "__comp")
  }

  /** `docs` + `fold` (0 .. k−1): the cross-validation flavor — every
    * near-dup cluster lands whole in ONE fold, so no fold's holdout
    * leaks into its training complement. Same portable md5 bucket as
    * [[leakageSafeSplit]], mapped onto k equal bucket ranges.
    */
  def leakageSafeFolds(
      docs: DataFrame, idCol: String, pairs: DataFrame,
      k: Int, seed: Int = 0, foldCol: String = "fold"): DataFrame = {
    require(k >= 2 && k <= 1000, s"k: $k (2..1000)")
    require(!docs.columns.contains(foldCol),
      s"leakageSafeFolds: docs already have a '$foldCol' column")
    val comp = Dedup.connectedComponents(pairs)
      .select(col("id").as("__cc_id"), col("label").as("__cc_label"))
    docs
      .join(comp, docs(idCol) === col("__cc_id"), "left")
      .withColumn("__comp", coalesce(col("__cc_label"), docs(idCol)))
      .withColumn(foldCol,
        (conv(substring(md5(concat(col("__comp").cast("string"),
          lit("_" + seed)).cast("binary")), 1, 4), 16, 10)
          .cast("long") * k / 65536L).cast("int"))
      .drop("__cc_id", "__cc_label", "__comp")
  }
}
