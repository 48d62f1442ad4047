package graft

import graft.operators._
import graft.operators.ColumnSelect.ColSpec
import graft.operators.Filters.Criterion
import graft.sources.{Hdf5, Ods, Readers, TextTables, Tpz, Writers, Xls, Xlsx}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** The user-facing facade mirroring the reference's `Table` API
  * (tablite/core.py) — every method compiles to the DataFrame/Catalyst
  * constructs in `graft.operators`. Tables are immutable: "in-place"
  * reference methods return a new Tab (documented divergence,
  * SURVEY §7.5 — lazy engine under an eager-looking API; `show`,
  * `collect` and writers trigger execution).
  */
final case class Tab(df: DataFrame) {

  // ---- row/column algebra ------------------------------------------
  def select(cols: String*): Tab = Tab(df.select(cols.map(col): _*))
  def drop(cols: String*): Tab = Tab(df.drop(cols: _*))
  def rename(mapping: (String, String)*): Tab =
    Tab(mapping.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) })
  def rows: Long = df.count()
  /** `nbytes` (base.py:1134-1149): estimated size in bytes. Catalyst plan
    * statistics (file sizes + column stats) substitute for the
    * reference's page-byte sum — an estimate, not a heap measure.
    */
  def nbytes: BigInt = df.queryExecution.optimizedPlan.stats.sizeInBytes
  def columns: Seq[String] = df.columns.toSeq
  def types: Map[String, String] = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap

  /** `t1 + t2` (base.py:1493-1537). */
  def +(other: Tab): Tab = Tab(SetOps.concat(df, other.df))
  /** `stack` with schema union (base.py:1640-1663). */
  def stack(other: Tab): Tab = Tab(SetOps.stack(df, other.df))
  /** `t * n` (base.py:1464-1491). */
  def *(n: Int): Tab = Tab(SetOps.repeatTable(df, n))

  def slice(orderBy: Seq[String], start: Int = 0, stop: Int = Int.MaxValue, step: Int = 1): Tab =
    if (step == 1) Tab(Slicing.slice(df, orderBy, start, stop))
    else Tab(Slicing.sliceStep(df, orderBy, start, stop, step))

  /** Full Python `t[start:stop:step]` semantics incl. negative indices
    * and steps (tests/test_slice_rules.py parity).
    */
  def pySlice(orderBy: Seq[String], start: Option[Long] = None,
      stop: Option[Long] = None, step: Option[Long] = None): Tab =
    Tab(Slicing.pySlice(df, orderBy, start, stop, step))

  /** Reproducible hash sample — deterministic across reruns/retries. */
  def sample(idCol: String, fraction: Double, seed: Int = 0): Tab =
    Tab(graft.operators.Sampling.deterministicSample(df, idCol, fraction, seed))

  // ---- filters ------------------------------------------------------
  /** Structured filter returning (pass, fail) (core.py:343-364). */
  def filter(criteria: Seq[Criterion], filterType: String = "all"): (Tab, Tab) = {
    val (p, f) = Filters.filterSplit(df, criteria, filterType)
    (Tab(p), Tab(f))
  }
  /** Expression-string filter — Catalyst `expr` replaces the reference's
    * Python expression compiler (core.py:330-341, utils.py:55-83).
    */
  def expression(sqlExpr: String): Tab = Tab(df.filter(org.apache.spark.sql.functions.expr(sqlExpr)))
  /** tablite expression-STRING filter with the reference's own Python
    * grammar (`"all((A==B, C!=4, 200<D))"`, `"a>=3 and b<=20"`,
    * chained comparisons, `in`, `is None` — utils.py:55-83,
    * redux.py:12-32), compiled to one Catalyst predicate by
    * [[graft.functions.ExpressionInterpreter]]. Returns (pass, fail)
    * twins like `t.filter(expression)`; rows where the predicate is
    * NULL land in fail (the reference would raise on None operands —
    * documented divergence: we keep the row, on the fail side).
    */
  def filter(expression: String): (Tab, Tab) = {
    val p = org.apache.spark.sql.functions.coalesce(
      graft.functions.ExpressionInterpreter.compile(expression, df.columns.toSeq),
      org.apache.spark.sql.functions.lit(false))
    (Tab(df.filter(p)), Tab(df.filter(!p)))
  }
  def all(kwargs: Map[String, Any]): Tab = Tab(Filters.filterAll(df, kwargs))
  def any(kwargs: Map[String, Any]): Tab = Tab(Filters.filterAny(df, kwargs))
  def dropValues(values: Any*): Tab = Tab(Filters.dropRows(df, values))
  def columnRemoveAll(column: String, values: Any*): Tab =
    Tab(Filters.columnRemoveAll(df, column, values))
  def replace(mapping: Map[Any, Any], columns: Seq[String]): Tab =
    Tab(Filters.replace(df, mapping, columns))
  def dropDuplicates(cols: Seq[String], orderBy: Seq[String]): Tab =
    Tab(Filters.dropDuplicatesKeepFirst(df, cols, orderBy))

  /** Typed projection with reject channel (core.py:704-733). */
  def columnSelect(specs: Seq[ColSpec]): (Tab, Tab) = {
    val (p, f) = ColumnSelect.columnSelect(df, specs)
    (Tab(p), Tab(f))
  }

  // ---- joins --------------------------------------------------------
  def join(other: Tab, leftKeys: Seq[String], rightKeys: Seq[String],
      kind: String = "inner", leftColumns: Option[Seq[String]] = None,
      rightColumns: Option[Seq[String]] = None, mergeKeys: Boolean = false): Tab =
    Tab(Joins.join(df, other.df, leftKeys, rightKeys, kind, leftColumns, rightColumns, mergeKeys))
  def lookup(other: Tab, criteria: Column, rightOrder: String,
      rightColumns: Option[Seq[String]] = None): Tab =
    Tab(Joins.lookup(df, other.df, (_, _) => criteria, rightOrder, rightColumns))
  def matchTable(other: Tab, leftKeys: Seq[String], rightKeys: Seq[String],
      rightOrder: String): Tab =
    Tab(Joins.matchOp(df, other.df, leftKeys, rightKeys, rightOrder))
  def asofJoin(other: Tab, leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String, rightValues: Seq[String],
      direction: String = "backward"): Tab =
    Tab(Joins.asofJoin(df, other.df, leftKeys, rightKeys, leftTime, rightTime,
      rightValues, direction))
  /** 1-D nearest-neighbour alignment on a numeric/timestamp axis —
    * the symmetric completion of [[asofJoin]] (Joins.nearestJoin).
    */
  def nearestJoin(other: Tab, leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String, rightValues: Seq[String],
      rightTie: String): Tab =
    Tab(Joins.nearestJoin(df, other.df, leftKeys, rightKeys, leftTime, rightTime,
      rightValues, rightTie))

  // ---- aggregation / reshape ---------------------------------------
  def groupby(keys: Seq[String], functions: Seq[(String, String)],
      orderCol: String = null, firstSeenOrder: Boolean = false): Tab =
    Tab(GroupBy.groupby(df, keys, functions, orderCol, firstSeenOrder))
  def pivot(rows: Seq[String], columns: Seq[String], functions: Seq[(String, String)],
      valuesAsRows: Boolean = true, pivotValues: Seq[Any] = Nil): Tab =
    if (valuesAsRows) Tab(Pivots.pivotLong(df, rows, columns, functions))
    else Tab(Pivots.pivot(df, rows, columns, functions, pivotValues))
  def pivotTranspose(columns: Seq[String], keep: Seq[String]): Tab =
    Tab(Pivots.melt(df, keep, columns))
  def transpose(): Tab = Tab(Pivots.transpose(df))
  def statistics(column: String): Tab = Tab(GroupBy.statistics(df, column))
  def profile(exact: Boolean = false): Tab = Tab(GroupBy.profile(df, exact))
  /** Exact per-group top-k rows via the bounded-heap aggregate
    * (GroupBy.topKPerGroup) — shuffle caps at k rows/group/map task.
    */
  def topKPerGroup(groupCols: Seq[String], orderCol: String, tieCol: String,
      k: Int, descending: Boolean = true): Tab =
    Tab(GroupBy.topKPerGroup(df, groupCols, orderCol, tieCol, k, descending))
  def histogram(column: String): Tab = Tab(GroupBy.histogram(df, column))
  /** Equi-width binned histogram with clamped overflow and zero-count
    * bins (GroupBy.binnedHistogram).
    */
  def binnedHistogram(column: String, lo: Double, hi: Double, nBins: Int): Tab =
    Tab(GroupBy.binnedHistogram(df, column, lo, hi, nBins))
  /** Exact per-group interpolated quantiles (GroupBy.groupQuantiles). */
  def groupQuantiles(groupCols: Seq[String], valueCol: String,
      ps: Seq[Double]): Tab =
    Tab(GroupBy.groupQuantiles(df, groupCols, valueCol, ps))
  /** Pairwise Pearson correlations in one pass (GroupBy.correlation). */
  def correlation(cols: Seq[String]): Tab = Tab(GroupBy.correlation(df, cols))
  /** Exact top-k heavy hitters of a key tuple (GroupBy.heavyHitters). */
  def heavyHitters(cols: Seq[String], k: Int): Tab =
    Tab(GroupBy.heavyHitters(df, cols, k))
  /** Data-contract report: one (check, target, violations, pass) row per
    * expectation (operators.Checks.report).
    */
  def checks(cs: Seq[graft.operators.Checks.Check]): Tab =
    Tab(graft.operators.Checks.report(df, cs))
  /** Per-group min-max scaling into [0,1] (operators.Normalize.minMax). */
  def normalizeMinMax(valueCol: String, groupCols: Seq[String] = Nil,
      out: String = "scaled"): Tab =
    Tab(graft.operators.Normalize.minMax(df, valueCol, groupCols, out))
  /** Per-group z-score standardization (operators.Normalize.zscore). */
  def normalizeZscore(valueCol: String, groupCols: Seq[String] = Nil,
      out: String = "zscore"): Tab =
    Tab(graft.operators.Normalize.zscore(df, valueCol, groupCols, out))
  /** One-hot encode a low-cardinality column (operators.Normalize.oneHot). */
  def oneHot(column: String, maxCategories: Int = 100): Tab =
    Tab(graft.operators.Normalize.oneHot(df, column, maxCategories))
  /** Equi-depth quantile binning (operators.Normalize.quantileBin). */
  def quantileBin(valueCol: String, nBins: Int, out: String = "bin"): Tab =
    Tab(graft.operators.Normalize.quantileBin(df, valueCol, nBins, out))
  /** Smoothed target encoding (operators.Normalize.targetEncode). */
  def targetEncode(catCol: String, targetCol: String, smoothing: Double = 10.0,
      out: String = "target_enc"): Tab =
    Tab(graft.operators.Normalize.targetEncode(df, catCol, targetCol, smoothing, out))
  /** Deterministic exactly-balanced shard assignment
    * (operators.Sampling.shardDeterministic).
    */
  def shardDeterministic(idCol: String, numShards: Int, seed: Int = 0): Tab =
    Tab(Sampling.shardDeterministic(df, idCol, numShards, seed))
  /** Weighted exact-n per-group sample (operators.Sampling.exactSamplePerGroup). */
  def exactSamplePerGroup(groupCol: String, idCol: String, n: Int,
      weightCol: String, seed: Int = 0): Tab =
    Tab(Sampling.exactSamplePerGroup(df, groupCol, idCol, n, weightCol, seed))
  /** Regular-grid time-series resample with zero-filled gaps
    * (operators.TimeSeries.resample).
    */
  def resampleTimeSeries(tsCol: String, groupCol: String, stepMs: Long,
      valueCol: String): Tab =
    Tab(graft.operators.TimeSeries.resample(df, tsCol, groupCol, stepMs, valueCol))
  def unique(column: String): Tab = Tab(GroupBy.unique(df, column))
  def countValue(column: String, value: Any): Long = GroupBy.countValue(df, column, value)

  // ---- sort ---------------------------------------------------------
  def sorted(mapping: Seq[(String, Boolean)], sortMode: String = "excel"): Tab =
    Tab(Sorts.sorted(df, mapping, sortMode))
  def isSorted(mapping: Seq[(String, Boolean)], sortMode: String = "excel"): Boolean =
    Sorts.isSorted(df, mapping, sortMode)
  def sortIndex(mapping: Seq[(String, Boolean)], sortMode: String = "excel"): Tab =
    Tab(Sorts.sortIndex(df, mapping, sortMode))

  // ---- imputation / merge ------------------------------------------
  /** `t.reindex(index)` (core.py:375-392): rows rearranged / subset by a
    * position list over the table's `orderCol` order; output rows come
    * back in the POSITION LIST's order, positions past the end emit
    * null rows (the reference pads None).
    */
  def reindex(index: Seq[Long], orderCol: String): Tab = {
    val s = df.sparkSession
    import s.implicits._
    val pos = index.zipWithIndex.map { case (p, i) => (p, i.toLong) }
      .toDF("__want_pos", "__emit")
    Tab(Sorts.reindex(df, pos, "__want_pos", orderCol)
      .orderBy(org.apache.spark.sql.functions.col("__emit"))
      .drop("__want_pos", "__emit"))
  }

  /** API-parity redirect (core.py:854-855 raises "See imputation"). */
  def replaceMissingValues(targets: Seq[String], method: String): Tab =
    throw new UnsupportedOperationException(
      "replace_missing_values: see imputation (same semantics, richer options)")

  def imputation(targets: Seq[String], method: String, orderCol: String = null,
      sources: Seq[String] = Nil): Tab = method match {
    case "carry forward"     => Tab(Imputation.ffill(df, targets, orderCol))
    case "mean" | "mode"     => Tab(Imputation.fillWithStat(df, targets, method))
    case "nearest neighbour" => Tab(targets.foldLeft(df)((d, t) =>
      Imputation.nearestNeighbour(d, t, sources)))
    case other               => throw new IllegalArgumentException(s"unknown method: $other")
  }
  def mergeWhere(criteria: Column, left: String, right: String, out: String): Tab =
    Tab(SetOps.mergeWhere(df, criteria, left, right, out))
  /** Latest-wins merge of `updates` into this table (SetOps.upsert). */
  def upsert(updates: Tab, keyCols: Seq[String], versionCol: String): Tab =
    Tab(SetOps.upsert(df, updates.df, keyCols, versionCol))
  def diff(other: Tab): Tab = Tab(SetOps.diff(df, other.df))
  /** Exact difflib-parity ordered diff (driver-side, capped). */
  def diffOrdered(other: Tab): Tab = Tab(SetOps.diffOrdered(df, other.df))
  def ===(other: Tab): Boolean = SetOps.tablesEqual(df, other.df)

  // ---- training-data pipeline bridges (extensions beyond tablite) ----
  /** Unicode repair in place: NFC + control-char strip. */
  def normalizeText(textCol: String): Tab =
    Tab(df.withColumn(textCol,
      graft.functions.TextFunctions.normalizeText(org.apache.spark.sql.functions.col(textCol))))
  /** Quality-classifier score appended as `outCol` (see
    * [[graft.functions.TextFunctions.qualityScore]]). */
  def qualityScore(textCol: String, weights: Array[Double], outCol: String = "quality"): Tab =
    Tab(df.withColumn(outCol,
      graft.functions.TextFunctions.qualityScore(org.apache.spark.sql.functions.col(textCol), weights)))
  /** DEFLATE compression ratio appended as `outCol` (see
    * [[graft.functions.TextFunctions.compressionRatio]]) — threshold
    * low ratios to drop machine-generated/boilerplate junk.
    */
  def compressionRatio(textCol: String, outCol: String = "compress_ratio"): Tab =
    Tab(df.withColumn(outCol, graft.functions.TextFunctions.compressionRatio(
      org.apache.spark.sql.functions.col(textCol))))
  /** Cross-doc boilerplate line removal (C4/RefinedWeb). Unlike the raw
    * [[graft.ml.Dedup.dedupLines]] (which narrows to (id, text)), the
    * facade keeps every other column by joining the cleaned text back on
    * `idCol` — the same frame-preserving contract as [[normalizeText]].
    * Docs whose every line was boilerplate still disappear.
    */
  def dedupLines(idCol: String, textCol: String, maxDocFreq: Int = 10): Tab = {
    val cleaned = graft.ml.Dedup.dedupLines(df, idCol, textCol, maxDocFreq)
    Tab(df.drop(textCol).join(cleaned, Seq(idCol))
      .select(df.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*))
  }
  /** Duplicated-substring removal (Lee et al. 2022 shape), frame-
    * preserving: non-text columns survive, `removed_tokens` is appended.
    */
  def dedupSpans(idCol: String, textCol: String, minLen: Int = 8,
      keepFirst: Boolean = false): Tab = {
    val cleaned = graft.ml.Dedup.dedupSpans(df, idCol, textCol, minLen, keepFirst = keepFirst)
    Tab(df.drop(textCol).join(cleaned, Seq(idCol))
      .select((df.columns.map(org.apache.spark.sql.functions.col) :+
        org.apache.spark.sql.functions.col("removed_tokens")).toIndexedSeq: _*))
  }

  /** Domain capping: top `n` rows per `groupCol` in `orderBy` order
    * (appends `rank`; see [[graft.operators.Sampling.capPerGroup]]).
    */
  def capPerGroup(groupCol: String, orderBy: Seq[org.apache.spark.sql.Column], n: Int): Tab =
    Tab(graft.operators.Sampling.capPerGroup(df, groupCol, orderBy, n))
  /** Exact-size deterministic sample by salted md5 of `idCol`. */
  def exactSample(idCol: String, n: Int, seed: Int = 0): Tab =
    Tab(graft.operators.Sampling.exactSample(df, idCol, n, seed))
  /** Importance-resample to a target stratum mix (categorical DSIR,
    * [[graft.operators.Sampling.importanceResample]]).
    */
  def resampleToMix(strataCol: String, idCol: String,
      targetFracs: Map[String, Double], n: Int, seed: Int = 0): Tab =
    Tab(graft.operators.Sampling.importanceResample(df, strataCol, idCol, targetFracs, n, seed))
  /** Temperature-scaled corpus mix (p_i ∝ (n_i/N)^α —
    * [[graft.operators.Sampling.temperatureMix]]).
    */
  def temperatureMix(strataCol: String, idCol: String, alpha: Double,
      n: Int, seed: Int = 0): Tab =
    Tab(graft.operators.Sampling.temperatureMix(df, strataCol, idCol, alpha, n, seed))
  /** Reproducible global training-order shuffle (appends `shuffle_rank` —
    * [[graft.operators.Sampling.shuffleDeterministic]]).
    */
  def shuffleDeterministic(idCol: String, seed: Int = 0): Tab =
    Tab(graft.operators.Sampling.shuffleDeterministic(df, idCol, seed))
  /** Full-text DSIR (Xie et al. 2023, [[graft.ml.Dsir]]): draw `n` rows
    * whose text looks like `target`'s, by hashed-n-gram importance
    * weight. Defaults match [[graft.ml.Dsir.resampleLikeTarget]] exactly
    * (sum weights — the paper's formulation); pass
    * `lengthNormalize = true` for corpora with high doc-length variance.
    */
  def resampleLikeTarget(idCol: String, textCol: String, target: Tab,
      targetTextCol: String, n: Int, seed: Int = 0,
      lengthNormalize: Boolean = false): Tab =
    Tab(graft.ml.Dsir.resampleLikeTarget(df, idCol, textCol,
      target.df, targetTextCol, n, seed = seed, lengthNormalize = lengthNormalize))
  /** Token-budget sequence packing (appends `bin`; unkeyed packing
    * dispatches to a boundary-carry scale path above the local
    * threshold — [[graft.operators.Sampling.packSequences]]).
    */
  def packSequences(tokenCol: String, orderCol: String, budget: Long,
      partitionCols: Seq[String] = Nil): Tab =
    Tab(graft.operators.Sampling.packSequences(df, tokenCol, orderCol, budget, partitionCols))
  /** Fixed-stride token chunking (one row per context window; metadata
    * columns ride along — [[graft.operators.Chunking.chunkByTokens]]).
    */
  /** Sentence-aware chunk windows (operators.Chunking.chunkBySentences):
    * at most `maxSentences` whole sentences per chunk, never cutting one.
    */
  def chunkBySentences(idCol: String, textCol: String, maxSentences: Int,
      stride: Int): Tab =
    Tab(graft.operators.Chunking.chunkBySentences(df, idCol, textCol,
      maxSentences, stride))

  def chunkByTokens(idCol: String, textCol: String, maxTokens: Int, stride: Int): Tab =
    Tab(graft.operators.Chunking.chunkByTokens(df, idCol, textCol, maxTokens, stride))
  /** Keep only docs passing the Gopher document rules
    * ([[graft.functions.TextFunctions.gopherFlags]]).
    */
  def gopherFilter(textCol: String,
      stopwords: Seq[String] = graft.functions.TextFunctions.gopherStopwords,
      minWords: Long = 50L): Tab =
    Tab(df.filter(graft.functions.TextFunctions.gopherFlags(
      org.apache.spark.sql.functions.col(textCol),
      minWords = minWords, stopwords = stopwords).getField("pass") === 1L))

  // ---- io -----------------------------------------------------------
  /** CCNet-style LM-perplexity quality filter (ml.Perplexity): keep rows
    * whose text scores ≤ maxPpl against a reference corpus's hashed
    * bigram model.
    */
  def filterByPerplexity(idCol: String, textCol: String, reference: Tab,
      refTextCol: String, maxPpl: Double): Tab =
    Tab(graft.ml.Perplexity.filterByPerplexity(
      df, idCol, textCol, reference.df, refTextCol, maxPpl))

  /** Score text perplexity against a reference corpus and band the rows
    * head/middle/tail by the score distribution (CCNet's split).
    */
  def perplexityBands(idCol: String, textCol: String, reference: Tab,
      refTextCol: String): Tab = {
    val model = graft.ml.Perplexity.train(reference.df, refTextCol)
    Tab(graft.ml.Perplexity.withBand(
      graft.ml.Perplexity.score(df, idCol, textCol, model)))
  }

  /** Learned-quality filter (ml.QualityClassifier): train the hashed
    * n-gram logistic regression on caller-labeled positives/negatives,
    * keep rows scoring ≥ minProb — the GPT-3-style classifier gate.
    * `labelTextCol` names the text column in BOTH label frames (rename
    * upstream if they differ — the shared name IS the contract).
    */
  def filterByQuality(textCol: String, positives: Tab, negatives: Tab,
      labelTextCol: String, minProb: Double = 0.5): Tab = {
    val m = graft.ml.QualityClassifier.train(
      positives.df.select(org.apache.spark.sql.functions.col(labelTextCol)),
      negatives.df.select(org.apache.spark.sql.functions.col(labelTextCol)),
      labelTextCol)
    Tab(graft.ml.QualityClassifier.filterByQuality(df, textCol, m, minProb))
  }

  /** Leakage-safe train/holdout split (ml.Splits): near-dup clusters
    * from `pairs` (a `minhashPairs`-shaped frame) never straddle the
    * boundary; assignment is deterministic in (cluster, seed).
    */
  def leakageSafeSplit(idCol: String, pairs: Tab,
      holdoutPermille: Int = 100, seed: Int = 0): Tab =
    Tab(graft.ml.Splits.leakageSafeSplit(df, idCol, pairs.df, holdoutPermille, seed))

  /** Token counts under a learned BPE vocabulary (ml.Bpe) as a new
    * column — budget accounting with the tokens the downstream model
    * actually sees.
    */
  def withBpeTokenCount(textCol: String, model: graft.ml.Bpe.Model,
      as: String = "n_bpe_tokens"): Tab =
    Tab(df.withColumn(as, graft.ml.Bpe.tokenCount(
      org.apache.spark.sql.functions.col(textCol), model)))

  /** Token counts under a learned unigram-LM vocabulary
    * (ml.UnigramLm) — [[withBpeTokenCount]]'s counterpart for the
    * SentencePiece-unigram tokenizer family.
    */
  /** Token counts under a learned WordPiece vocabulary
    * (ml.WordPiece) — the third tokenizer family's counterpart of
    * [[withBpeTokenCount]].
    */
  def withWordPieceTokenCount(textCol: String, model: graft.ml.WordPiece.Model,
      as: String = "n_wordpiece_tokens"): Tab =
    Tab(df.withColumn(as, graft.ml.WordPiece.tokenCount(
      org.apache.spark.sql.functions.col(textCol), model)))

  def withUnigramTokenCount(textCol: String, model: graft.ml.UnigramLm.Model,
      as: String = "n_unigram_tokens"): Tab =
    Tab(df.withColumn(as, graft.ml.UnigramLm.tokenCount(
      org.apache.spark.sql.functions.col(textCol), model)))

  /** Point-in-interval join (operators.Joins.rangeJoin): rows of THIS
    * table whose `pointCol` falls in [lo, hi] of `intervals`, through
    * the banded equi-join scale path.
    */
  def rangeJoin(intervals: Tab, pointCol: String, loCol: String, hiCol: String,
      bandWidth: Long, pointKeys: Seq[String] = Nil,
      intervalKeys: Seq[String] = Nil): Tab =
    Tab(Joins.rangeJoin(df, intervals.df, pointCol, loCol, hiCol, bandWidth,
      pointKeys, intervalKeys))

  /** Interval-overlap join (operators.Joins.intervalJoin): rows of THIS
    * table whose [leftLo, leftHi] interval overlaps an interval of
    * `other` — banded, each pair exactly once.
    */
  def intervalJoin(other: Tab, leftLo: String, leftHi: String,
      rightLo: String, rightHi: String, bandWidth: Long,
      leftKeys: Seq[String] = Nil, rightKeys: Seq[String] = Nil): Tab =
    Tab(Joins.intervalJoin(df, other.df, leftLo, leftHi, rightLo, rightHi,
      bandWidth, leftKeys, rightKeys))

  /** Rolling aggregates over the last `n` rows (operators.Rolling). */
  def rolling(valueCols: Seq[String], orderCol: String, n: Int,
      partitionCols: Seq[String] = Nil, tieBreak: Seq[String] = Nil): Tab =
    Tab(Rolling.rolling(df, valueCols, orderCol, n, partitionCols, tieBreak))

  /** ~`budget` tokens per group in deterministic shuffled order
    * (operators.Sampling.capTokensPerGroup).
    */
  def capTokensPerGroup(groupCol: String, tokenCol: String, idCol: String,
      budget: Long, seed: Int = 0): Tab =
    Tab(Sampling.capTokensPerGroup(df, groupCol, tokenCol, idCol, budget, seed))

  /** Top-k rows by BM25 relevance to `terms` (ml.Retrieval). */
  def bm25TopK(idCol: String, textCol: String, terms: Seq[String], k: Int): Tab =
    Tab(graft.ml.Retrieval.bm25TopK(df, idCol, textCol, terms, k))

  /** Exact directional containment pairs (ml.Dedup.containmentPairs) —
    * the asymmetric dedup face: truncations/excerpts contained in
    * their sources even at low Jaccard.
    */
  def containmentPairs(idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.8): Tab =
    Tab(graft.ml.Dedup.containmentPairs(df, idCol, textCol, shingleN, threshold))

  /** Exact edit-distance pairs over a short-string column
    * (ml.Dedup.editDistancePairs, FastSS blocking): typo-level dupes in
    * titles/names the shingle families can't see.
    */
  def editDistancePairs(idCol: String, strCol: String,
      maxDistance: Int = 1): Tab =
    Tab(graft.ml.Dedup.editDistancePairs(df, idCol, strCol, maxDistance))

  /** Cross-frame edit-distance probe against `corpus`
    * (ml.Dedup.editDistanceJoinPairs): this Tab is the broadcast probe
    * side; the corpus never shuffles its strings.
    */
  def editDistanceJoinPairs(corpus: Tab, idCol: String, strCol: String,
      maxDistance: Int = 1): Tab =
    Tab(graft.ml.Dedup.editDistanceJoinPairs(df, corpus.df, idCol, strCol,
      maxDistance))

  /** Drop documents near-fully contained in a larger document
    * (ml.Dedup.containmentDedup); smallest id survives mutual
    * containment.
    */
  def containmentDedup(idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.9): Tab =
    Tab(graft.ml.Dedup.containmentDedup(df, idCol, textCol, shingleN, threshold))

  /** Cross-frame containment probe against `corpus`
    * (ml.Dedup.containmentJoinPairs): this Tab is the small broadcast
    * probe side; the corpus never shuffles.
    */
  def containmentAgainst(corpus: Tab, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.8): Tab =
    Tab(graft.ml.Dedup.containmentJoinPairs(df, corpus.df, idCol, textCol,
      shingleN, threshold))

  /** Corpus-level Jaccard similarity to `other` via KMV sketches
    * (ml.Dedup.corpusJaccard) — the cross-dedup triage number.
    */
  def corpusJaccard(other: Tab, textCol: String,
      shingleN: Int = 3, k: Int = 4096): Double =
    graft.ml.Dedup.corpusJaccard(df, other.df, textCol, shingleN, k)

  /** Keep the highest-`scoreCol` member of each near-dup cluster
    * (ml.Dedup.canonicalPerCluster); min-id rule = `dedupedCorpus`.
    */
  def canonicalPerCluster(idCol: String, scoreCol: String, pairs: Tab): Tab =
    Tab(graft.ml.Dedup.canonicalPerCluster(df, idCol, scoreCol, pairs.df))

  /** Per-group corpus accounting (functions.TextFunctions.corpusReport). */
  def corpusReport(groupCols: Seq[String], textCol: String): Tab =
    Tab(graft.functions.TextFunctions.corpusReport(df, groupCols, textCol))

  /** Document clustering over an embedding column (ml.Ann.kmeansCluster). */
  def kmeansCluster(vecCol: String, k: Int, sampleN: Int = 20000): Tab =
    Tab(graft.ml.Ann.kmeansCluster(df, vecCol, k, sampleN))

  /** Cluster-balance report for kmeansCluster output (ml.Ann.clusterSizes). */
  def clusterSizes(k: Int): Tab = Tab(graft.ml.Ann.clusterSizes(df, k))

  /** SCD-2 validity-interval history from a change-event log
    * (operators.SetOps.scd2FromEvents); [[upsert]] keeps only final
    * state, this keeps the audit timeline.
    */
  def scd2FromEvents(keyCols: Seq[String], versionCol: String, tieCol: String): Tab =
    Tab(SetOps.scd2FromEvents(df, keyCols, versionCol, tieCol))

  /** Fold raw change events into this SCD-2 history (SetOps.scd2Apply). */
  def scd2Apply(updates: Tab, keyCols: Seq[String], versionCol: String,
      tieCol: String): Tab =
    Tab(SetOps.scd2Apply(df, updates.df, keyCols, versionCol, tieCol))

  def save(path: String): Unit = Writers.save(df, path)
  def toCsv(path: String): Unit = Writers.toCsv(df, path)
  def toTsv(path: String): Unit = Writers.toTsv(df, path)
  def toXlsx(path: String): Unit = Xlsx.writeXlsx(df, path)
  def toXls(path: String): Unit = Xls.writeXls(df, path)
  def toOds(path: String): Unit = Ods.writeOds(df, path)
  def toFods(path: String): Unit = Ods.writeFods(df, path)
  def toTpz(path: String): Unit = Tpz.writeTpz(df, path)
  def toHdf5(path: String): Unit = Hdf5.writeHdf5(df, path)
  def toJsonl(path: String): Unit = Writers.toJsonl(df, path)
  def toOrc(path: String): Unit = Writers.toOrc(df, path)
  def toSqlText(tableName: String): String = Writers.toSql(df, tableName)
  def toJsonText: String = Writers.toColumnarJson(df)
  def toHtmlText: String = Writers.toHtml(df)
  def show(): Unit = println(Writers.toAscii(df))
}

object Tab {
  /** `Table.from_file` dispatch (core.py:50-218). */
  def fromFile(spark: SparkSession, path: String,
      opts: Readers.CsvOptions = Readers.CsvOptions()): Tab = {
    val lower = path.toLowerCase
    if (lower.endsWith(".parquet")) Tab(spark.read.parquet(path))
    else if (lower.endsWith(".orc")) Tab(spark.read.orc(path))
    else if (lower.endsWith(".tpz")) Tab(Tpz.readTpz(spark, path,
      guessDatatypes = opts.guessDatatypes))
    else if (lower.endsWith(".xlsx") || lower.endsWith(".xlsm"))
      // .xlsm is the same zip/XML package as .xlsx plus a macro part the
      // reader ignores (reference dispatches both, import_utils.py:633-650)
      Tab(Xlsx.readXlsx(spark, path, sheet = opts.sheet,
        firstRowHasHeaders = opts.firstRowHasHeaders, headerRowIndex = opts.headerRowIndex,
        skipEmpty = opts.skipEmpty, guessDatatypes = opts.guessDatatypes,
        start = opts.start, limit = opts.limit, columns = opts.columns))
    else if (lower.endsWith(".xls")) Tab(Xls.readXls(spark, path, sheet = opts.sheet,
      firstRowHasHeaders = opts.firstRowHasHeaders, headerRowIndex = opts.headerRowIndex,
      skipEmpty = opts.skipEmpty, guessDatatypes = opts.guessDatatypes,
      start = opts.start, limit = opts.limit, columns = opts.columns))
    else if (lower.endsWith(".h5") || lower.endsWith(".hdf5"))
      Tab(Hdf5.readHdf5(spark, path, guessDatatypes = opts.guessDatatypes))
    else if (lower.endsWith(".ods")) Tab(Ods.readOds(spark, path, sheet = opts.sheet,
      firstRowHasHeaders = opts.firstRowHasHeaders, headerRowIndex = opts.headerRowIndex,
      skipEmpty = opts.skipEmpty, guessDatatypes = opts.guessDatatypes,
      start = opts.start, limit = opts.limit, columns = opts.columns))
    // flat ODS: whole file is the content XML (reference dispatch,
    // import_utils.py:633-650)
    else if (lower.endsWith(".fods")) Tab(Ods.readFods(spark, path, sheet = opts.sheet,
      firstRowHasHeaders = opts.firstRowHasHeaders, headerRowIndex = opts.headerRowIndex,
      skipEmpty = opts.skipEmpty, guessDatatypes = opts.guessDatatypes,
      start = opts.start, limit = opts.limit, columns = opts.columns))
    // first <table> scrape (reference readers dict dispatches .html)
    else if (lower.endsWith(".html") || lower.endsWith(".htm"))
      Tab(Readers.readHtml(spark, path, guessDatatypes = opts.guessDatatypes))
    // pyexcel-text table renderings (reference readers dict routes the
    // simple/rst/mediawiki suffixes through excel_reader,
    // import_utils.py:632-648)
    else if (Seq(".simple", ".rst", ".mediawiki").exists(lower.endsWith)) {
      val fmt = lower.substring(lower.lastIndexOf('.') + 1)
      Tab(TextTables.readTextTable(spark, path, fmt,
        firstRowHasHeaders = opts.firstRowHasHeaders, headerRowIndex = opts.headerRowIndex,
        skipEmpty = opts.skipEmpty, guessDatatypes = opts.guessDatatypes,
        start = opts.start, limit = opts.limit, columns = opts.columns))
    }
    // compressed JSON family: Spark's text/json sources decompress .gz
    // transparently, so only the DISPATCH needs to see through the
    // suffix. Every OTHER compression suffix errors clearly — the CSV
    // path's encoding/delimiter sniff reads raw bytes and would parse
    // compressed garbage into a one-column table with no warning
    // (.zst/.bz2/... included: codec availability varies by deploy, so
    // only the spec-verified .gz route is dispatched).
    else if (lower.endsWith(".jsonl.gz") || lower.endsWith(".ndjson.gz"))
      Tab(Readers.readJsonl(spark, path))
    else if (lower.endsWith(".json.gz")) Tab(Readers.readJsonAuto(spark, path))
    else if (Seq(".gz", ".gzip", ".zst", ".zstd", ".bz2", ".xz", ".lz4",
        ".snappy", ".deflate").exists(lower.endsWith))
      throw new IllegalArgumentException(
        s"compressed input only supported for .jsonl.gz/.ndjson.gz/.json.gz (got $path); " +
          "decompress first or convert to parquet")
    else if (lower.endsWith(".jsonl") || lower.endsWith(".ndjson"))
      Tab(Readers.readJsonl(spark, path))
    else if (lower.endsWith(".json")) Tab(Readers.readJsonAuto(spark, path))
    else if (lower.endsWith(".tsv")) Tab(Readers.readCsv(spark, path,
      opts.copy(delimiter = opts.delimiter.orElse(Some("\t")))))
    else Tab(Readers.readCsv(spark, path, opts))
  }
  def load(spark: SparkSession, path: String): Tab = Tab(spark.read.parquet(path))
}
