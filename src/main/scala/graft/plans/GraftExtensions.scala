package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL exposure of the graft kernels: register once, then
  * `SELECT graft_cosine(a.embedding, b.embedding)` etc. works from
  * `spark.sql` and the driver's oracle-style SQL strings.
  *
  * Two registration routes:
  *  - `GraftExtensions` for `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (cluster-wide, survives new sessions);
  *  - `Kernels.register(spark)` / `registerAll` for an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => JaccardBoundsRule)
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
    // ASOF JOIN SQL syntax: delegating parser rewrite + resolution swap
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    ext.injectResolutionRule(_ => ResolveAsofJoinSql)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.plans.Kernels", null, name, usage, "", "", "", "", "", "", "scala_udf")

  private def intArg(e: Expression, default: Int): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case _ => default
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_simhash", info("graft_simhash", "_FUNC_(tokens) - 64-bit simhash of an array<string>"),
      (es: Seq[Expression]) => Kernels.SimHash64Expr(es.head)),
    ("graft_minhash", info("graft_minhash", "_FUNC_(shingles, k) - minhash signature array<long>"),
      (es: Seq[Expression]) => Kernels.MinHashSigExpr(es.head,
        if (es.length > 1) intArg(es(1), 64) else 64)),
    ("graft_cosine", info("graft_cosine", "_FUNC_(a, b) - cosine similarity of numeric arrays"),
      (es: Seq[Expression]) => Kernels.CosineSimExpr(es.head, es(1))),
    ("graft_lsh_bucket", info("graft_lsh_bucket", "_FUNC_(vec, nPlanes) - hyperplane LSH bucket"),
      (es: Seq[Expression]) => Kernels.HyperplaneBucketExpr(es.head,
        if (es.length > 1) intArg(es(1), 12) else 12)),
    ("graft_shingles", info("graft_shingles", "_FUNC_(text, n) - word n-gram shingles"),
      (es: Seq[Expression]) => Kernels.WordShinglesExpr(es.head,
        if (es.length > 1) intArg(es(1), 3) else 3)),
    ("graft_number", info("graft_number", "_FUNC_(s) - locale-tolerant number parse"),
      (es: Seq[Expression]) => Kernels.LocaleNumberExpr(es.head)),
    ("graft_jaccard", info("graft_jaccard", "_FUNC_(a, b) - set Jaccard similarity of arrays"),
      (es: Seq[Expression]) => Kernels.JaccardSimExpr(es.head, es(1))),
    ("graft_rep_stats", info("graft_rep_stats",
      "_FUNC_(arr) - repetition stats [dup_frac, dup_char_frac, top_freq_share, top_char_share]"),
      (es: Seq[Expression]) => Kernels.RepStatsExpr(es.head)),
    ("graft_line_rep_stats", info("graft_line_rep_stats",
      "_FUNC_(text) - duplicate-line repetition stats of raw text"),
      (es: Seq[Expression]) => Kernels.LineRepStatsExpr(es.head)),
    ("graft_min_k_hashes", info("graft_min_k_hashes",
      "_FUNC_(arr, k) - k smallest distinct xxhash64 values"),
      (es: Seq[Expression]) => Kernels.MinKHashesExpr(es.head,
        if (es.length > 1) intArg(es(1), 8) else 8)),
    ("graft_ref_median", info("graft_ref_median",
      "_FUNC_(v) - reference distinct-parity median (aggregate)"),
      (es: Seq[Expression]) =>
        RefAggregates.RefMedian(RefAggregates.medianInput(es.head)).toAggregateExpression()),
    ("graft_ref_mode", info("graft_ref_mode",
      "_FUNC_(v) - reference mode, count ties break to largest value (aggregate)"),
      (es: Seq[Expression]) => RefAggregates.RefMode(es.head).toAggregateExpression()),
    ("graft_approx_top_k", info("graft_approx_top_k",
      "_FUNC_(v, k, capacity) - SpaceSaving heavy hitters (aggregate)"),
      (es: Seq[Expression]) => ApproxTopK.SpaceSavingTopK(es.head,
        if (es.length > 1) intArg(es(1), 10) else 10,
        if (es.length > 2) intArg(es(2), 1024) else 1024).toAggregateExpression()),
    ("graft_normalize_text", info("graft_normalize_text",
      "_FUNC_(text) - NFC normalization + control-character strip (unicode repair)"),
      (es: Seq[Expression]) => Kernels.NormalizeTextExpr(es.head)),
    ("graft_window_hashes", info("graft_window_hashes",
      "_FUNC_(text, winLen) - rolling 64-bit hashes of every winLen-token window"),
      (es: Seq[Expression]) => Kernels.TokenWindowHashesExpr(es.head,
        if (es.length > 1) intArg(es(1), 8) else 8)),
    ("graft_lsh_probes", info("graft_lsh_probes",
      "_FUNC_(vec, nPlanes, nProbes) - query-directed multi-probe LSH buckets"),
      (es: Seq[Expression]) => Kernels.HyperplaneProbesExpr(es.head,
        if (es.length > 1) intArg(es(1), 12) else 12,
        if (es.length > 2) intArg(es(2), 16) else 16)),
    ("graft_asof_marker", info("graft_asof_marker",
      "_FUNC_(mode) - internal ASOF JOIN marker planted by the SQL rewrite"),
      (es: Seq[Expression]) => AsofMarkerExpr(es.headOption.collect {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
      }.getOrElse("inner"))))

  /** Register into an already-running session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
