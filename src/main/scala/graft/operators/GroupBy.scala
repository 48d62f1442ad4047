package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GroupBy with the reference's 12 accumulators
  * (nimlite/funcs/groupby.nim:6-463, dispatch at 588-689).
  *
  * Output columns are named `"Function(column)"` (groupby.nim:677-679).
  * All accumulators map to Spark's partial-aggregation built-ins (map-side
  * combine → shuffle → final merge), i.e. the same streaming hash-agg the
  * Nim kernel does single-threaded, but distributed and spillable.
  *
  * Parity notes:
  *  - Count counts ALL rows incl. nulls (groupby.nim:185-197) → count(*).
  *  - CountUnique includes null as a distinct value (groupby.nim:200-214)
  *    → count_distinct + null-presence adjustment.
  *  - Sum/Product are float-typed in the reference (groupby.nim:107-152)
  *    → cast to double.
  *  - StandardDeviation is sample stdev with 0.0 for n≤1
  *    (groupby.nim:243-277) → coalesce(stddev_samp, 0.0).
  *  - First/Last need a deterministic order → explicit order column +
  *    min_by/max_by instead of Spark's order-dependent first()/last().
  *  - Median/Mode: `Median`/`Mode` use Spark's standard percentile(0.5)/
  *    mode(); `RefMedian`/`RefMode` reproduce the reference's histogram
  *    semantics exactly (distinct-parity median, largest-value mode
  *    tie-break; groupby.nim:343-441) via the one-shuffle
  *    TypedImperativeAggregates in `graft.plans.RefAggregates`.
  */
object GroupBy {

  /** Spark aggregate for one (function, column) pair, aliased `Func(col)`-style. */
  def accumulator(fn: String, c: String, orderCol: String = null): Column = {
    val base = fn match {
      case "Max"               => max(col(c))
      case "Min"               => min(col(c))
      case "Sum"               => sum(col(c).cast("double"))
      case "Product"           => product(col(c).cast("double"))
      // ties in the order column are broken by the value itself so the
      // result stays deterministic on non-unique order columns
      case "First"             =>
        if (orderCol == null) first(col(c))
        else min_by(col(c), struct(col(orderCol), col(c)))
      case "Last"              =>
        if (orderCol == null) last(col(c))
        else max_by(col(c), struct(col(orderCol), col(c)))
      case "Count"             => count(lit(1))
      case "CountUnique"       =>
        countDistinct(col(c)) + max(when(col(c).isNull, 1).otherwise(0))
      case "Average"           => avg(col(c))
      case "StandardDeviation" => coalesce(stddev_samp(col(c)), lit(0.0))
      // default exact median is the one-shuffle histogram aggregate —
      // buffer size per group is the DISTINCT-value count, not the row
      // count (percentile(0.5) buffers every value; still available as
      // MedianBuffered for callers that want Spark's built-in)
      case "Median"            => graft.plans.RefAggregates.histMedian(col(c))
      case "MedianBuffered"    => percentile(col(c), lit(0.5))
      case "RefMedian"         => graft.plans.RefAggregates.refMedian(col(c))
      case "RefMode"           => graft.plans.RefAggregates.refMode(col(c))
      // ApproxMedian is the 100TB-scale path (single-pass sketch, no
      // per-group value buffer); Median keeps exact oracle parity.
      case "ApproxMedian"      => percentile_approx(col(c), lit(0.5), lit(10000))
      case "Mode"              => mode(col(c))
      case other               => throw new IllegalArgumentException(s"unknown accumulator: $other")
    }
    base.as(s"$fn($c)")
  }

  /** `t.groupby(keys, functions)` — functions = Seq(column -> accumulatorName).
    * With no functions, returns the distinct key combinations
    * (groupby.nim:608-620). By default first-seen key order is not
    * reproduced (documented divergence — Spark results are unordered
    * sets). `firstSeenOrder = true` opts into the reference's ordered-
    * table emission (groupby.nim:588-689 iterates an insertion-ordered
    * table): each group additionally aggregates `min(orderCol)` — its
    * first appearance in the row order `orderCol` encodes — and the
    * output sorts on it ascending. Requires `orderCol` (take one from
    * [[Sorts.sortIndex]] when the frame has no natural row index); the
    * sort is a range exchange over one long per group, so the parity
    * mode stays scale-safe.
    */
  def groupby(
      df: DataFrame,
      keys: Seq[String],
      functions: Seq[(String, String)],
      orderCol: String = null,
      firstSeenOrder: Boolean = false): DataFrame = {
    require(keys.nonEmpty || functions.nonEmpty, "groupby needs keys or functions")
    require(!firstSeenOrder || orderCol != null,
      "groupby: firstSeenOrder requires an orderCol encoding row order " +
        "(e.g. from sortIndex)")
    if (functions.isEmpty) {
      if (!firstSeenOrder) df.select(keys.map(col): _*).distinct()
      else df.groupBy(keys.map(col): _*)
        .agg(min(col(orderCol)).as("__first_seen"))
        .orderBy(col("__first_seen"))
        .drop("__first_seen")
    } else {
      val aggs0 = functions.map { case (c, fn) => accumulator(fn, c, orderCol) }
      val aggs = if (firstSeenOrder) aggs0 :+ min(col(orderCol)).as("__first_seen")
                 else aggs0
      val out =
        if (keys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
        else df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      if (firstSeenOrder) out.orderBy(col("__first_seen")).drop("__first_seen")
      else out
    }
  }

  /** Column.statistics() equivalent (tablite/utils.py:188-398):
    * one-row frame of summary stats for a numeric column.
    */
  /** Column.statistics() stat block (base.py:1007-1024, utils.py:233-275).
    * Quartile DIVERGENCE (documented): the reference interpolates on
    * count thresholds (utils.py:241-270); we use the standard continuous
    * percentile — e.g. [1,2,3] gives iqr_low 1.5 here vs 1 there. Every
    * other field matches. `mode` tie-breaks are engine-arbitrary.
    */
  def statistics(df: DataFrame, c: String): DataFrame =
    df.agg(
      min(col(c)).as("min"),
      max(col(c)).as("max"),
      avg(col(c)).as("mean"),
      percentile(col(c), lit(0.5)).as("median"),
      coalesce(stddev_samp(col(c)), lit(0.0)).as("stdev"),
      mode(col(c)).as("mode"),
      sum(col(c).cast("double")).as("sum"),
      countDistinct(col(c)).as("distinct"),
      percentile(col(c), lit(0.25)).as("iqr_low"),
      percentile(col(c), lit(0.75)).as("iqr_high"),
      count(lit(1)).as("summary_length"))
      .withColumn("iqr", col("iqr_high") - col("iqr_low"))

  /** EXACT-parity stat block: the reference's `summary_statistics`
    * semantics field for field (utils.py:233-275) — count-threshold
    * quartiles ([[graft.plans.RefAggregates.RefQuartile]]) and
    * smallest-value mode ties. One histogram shuffle per aggregate,
    * like RefMedian/RefMode. Pinned by test_api_basics.py:662-681.
    */
  def statisticsRef(df: DataFrame, c: String): DataFrame = {
    import graft.plans.RefAggregates
    import org.apache.spark.sql.graftbridge.{ExprBridge => EU}
    val modeSmallTie = EU.column(
      RefAggregates.RefMode(EU.expression(col(c)), tieLargest = false).toAggregateExpression())
    df.agg(
      min(col(c)).as("min"),
      max(col(c)).as("max"),
      avg(col(c)).as("mean"),
      RefAggregates.refQuartile(col(c), 2).as("median"),
      coalesce(stddev_samp(col(c)), lit(0.0)).as("stdev"),
      modeSmallTie.as("mode"),
      RefAggregates.refQuartile(col(c), 1).as("iqr_low"),
      RefAggregates.refQuartile(col(c), 3).as("iqr_high"),
      sum(col(c).cast("double")).as("sum"),
      countDistinct(col(c)).as("distinct"),
      count(lit(1)).as("summary_length"))
      .withColumn("iqr", col("iqr_high") - col("iqr_low"))
  }

  /** Column.histogram(): value → occurrence count (base.py:981-1005). */
  def histogram(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c)).agg(count(lit(1)).as("count"))

  /** Equi-width binned histogram over [lo, hi) — the numeric companion
    * of the reference's value-count [[histogram]] (ext; values outside
    * the range clamp into the edge bins so every non-null row is
    * counted, the numpy/pandas `clip` convention). Bin assignment is
    * exact integer-after-floor math any engine re-derives; empty bins
    * are emitted with count 0 (a broadcast bin spine outer-joins the
    * counts), so downstream plotting never has to infer gaps. One
    * partial-agg exchange on ≤ `nBins` keys.
    */
  def binnedHistogram(df: DataFrame, c: String, lo: Double, hi: Double,
      nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins: $nBins")
    require(lo < hi, s"binnedHistogram: lo=$lo >= hi=$hi")
    val width = (hi - lo) / nBins
    val bin = least(greatest(
      floor((col(c).cast("double") - lo) / width).cast("long"), lit(0L)),
      lit(nBins - 1L))
    val counts = df.filter(col(c).isNotNull)
      .groupBy(bin.as("bin")).agg(count(lit(1)).as("count"))
    val spark = df.sparkSession
    val spine = spark.range(nBins).select(col("id").as("bin"))
    broadcast(spine).join(counts, Seq("bin"), "left_outer")
      .select(col("bin"),
        (lit(lo) + col("bin") * width).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * width).as("bin_hi"),
        coalesce(col("count"), lit(0L)).as("count"))
  }

  /** Exact per-group quantiles (ext): one row per (group, p) with the
    * linearly-interpolated quantile — `quantile_cont` semantics, shared
    * by Spark's exact `percentile` and every SQL engine, so the result
    * is oracle-able where a t-digest sketch is not. EXACT means each
    * group's values sort in one aggregation buffer: the per-group
    * scale bound is group size, same as the reference-median
    * accumulators; use approx sketches when single groups exceed
    * executor memory.
    */
  def groupQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"groupQuantiles: bad percentiles ${ps.mkString(",")}")
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile(col(valueCol).cast("double"), typedlit(ps)).as("__qs"))
      .select(groupCols.map(col) :+ posexplode(col("__qs")).as(Seq("__i", "value")): _*)
      .withColumn("p", element_at(typedlit(ps), col("__i").cast("int") + 1))
      .select(groupCols.map(col) :+ col("p") :+ col("value"): _*)
  }

  /** Exact top-`k` heavy hitters of a key tuple (ext): (keys…, count,
    * frac) — the skew-diagnosis surface (is this join key salted-join
    * material?). One partial-agg exchange on the key, then
    * TakeOrderedAndProject (per-partition heaps, no global sort); frac
    * uses one count job. For a first pass over an unknown 100 TB key
    * space use the SpaceSaving sketch (`plans/ApproxTopK`); this is the
    * exact follow-up. Ties on count break by the key tuple ascending so
    * the cut is deterministic.
    */
  def heavyHitters(df: DataFrame, cols: Seq[String], k: Int): DataFrame = {
    require(cols.nonEmpty && cols.forall(df.columns.contains),
      s"heavyHitters: missing ${cols.filterNot(df.columns.contains).mkString(",")}")
    require(k > 0, s"heavyHitters: k=$k")
    val total = df.count().toDouble
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc +: cols.map(c => col(c).asc_nulls_last): _*)
      .limit(k)
      .withColumn("frac", col("count") / total)
  }

  /** Pairwise Pearson correlation matrix (ext) over numeric columns:
    * the upper triangle as (col_a, col_b, corr), all pairs computed in
    * ONE aggregation pass and the single result row collected (bounded:
    * one double per pair).
    */
  def correlation(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.length >= 2, s"correlation: need >= 2 columns, got ${cols.length}")
    cols.foreach(c => require(df.columns.contains(c), s"correlation: missing $c"))
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.length
    } yield (cols(i), cols(j))
    val aggs = pairs.zipWithIndex.map { case ((a, b), i) =>
      corr(col(a).cast("double"), col(b).cast("double")).as(s"c$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val spark = df.sparkSession
    import spark.implicits._
    pairs.zipWithIndex.map { case ((a, b), i) =>
      (a, b, if (row.isNullAt(i)) null.asInstanceOf[java.lang.Double]
             else java.lang.Double.valueOf(row.getDouble(i)))
    }.toDF("col_a", "col_b", "corr")
  }

  /** Column.unique() (base.py:956-979). */
  def unique(df: DataFrame, c: String): DataFrame =
    df.select(col(c)).distinct()

  /** Column.count(value) — occurrences, null-safe (base.py:1051-1072). */
  def countValue(df: DataFrame, c: String, value: Any): Long =
    df.filter(col(c) <=> lit(value)).count()

  /** String-column statistics (utils.py:341-398 string summary): length
    * stats + modal string, the reference's per-dtype variant.
    */
  def statisticsString(df: DataFrame, c: String): DataFrame =
    df.agg(
      min(length(col(c))).as("shortest"),
      max(length(col(c))).as("longest"),
      avg(length(col(c))).as("mean_length"),
      mode(col(c)).as("mode"),
      countDistinct(col(c)).as("distinct"),
      count(col(c)).as("non_null"),
      count(lit(1)).as("summary_length"))

  /** `BaseTable.index(*cols)` (base.py:1927-1965): key tuple → row ids.
    * Exposed for parity/debugging; joins do NOT use it (Spark shuffles
    * replace the index-build phase, SURVEY §3.2).
    */
  def index(df: DataFrame, keys: Seq[String], idCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(col(idCol))).as("row_ids"))

  /** `unique_index` (base.py:1967-1989): first row id per distinct key. */
  def uniqueIndex(df: DataFrame, keys: Seq[String], idCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(min(col(idCol)).as("first_row_id"))

  /** Whole-table column profile — the data-quality audit surface a
    * pipeline runs before committing to a source: one row per atomic
    * column with `(column, dtype, n_rows, n_nulls, n_distinct,
    * min_value, max_value)` (min/max rendered as strings so the frame
    * is one homogeneous shape regardless of column types; non-atomic
    * columns — arrays/structs/maps — are skipped).
    *
    * Scale shape: ONE aggregation pass. With `exact = false` (default)
    * distinct counts are HyperLogLog `approx_count_distinct` — fully
    * partial-aggregated, single pass, the 100 TB mode. `exact = true`
    * uses `count(DISTINCT)` per column, which Catalyst plans through
    * one Expand (rows × columns) — exact, costlier, the oracle/audit
    * mode. The driver materializes exactly one row (4 cells per
    * column) either way.
    */
  def profile(df: DataFrame, exact: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.schema.fields.filter { f =>
      import org.apache.spark.sql.types._
      f.dataType match {
        case _: ArrayType | _: StructType | _: MapType | _: BinaryType => false
        case _ => true
      }
    }
    require(cols.nonEmpty, "profile: no atomic columns to profile")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { f =>
      val c = col(f.name)
      Seq(count(c).as(s"__nn_${f.name}"),
        (if (exact) count_distinct(c) else approx_count_distinct(c))
          .as(s"__nd_${f.name}"),
        min(c).cast("string").as(s"__mn_${f.name}"),
        max(c).cast("string").as(s"__mx_${f.name}"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = r.getLong(0)
    cols.zipWithIndex.map { case (f, i) =>
      val b = 1 + i * 4
      (f.name, f.dataType.simpleString, n, n - r.getLong(b),
        r.getLong(b + 1),
        if (r.isNullAt(b + 2)) null else r.getString(b + 2),
        if (r.isNullAt(b + 3)) null else r.getString(b + 3))
    }.toSeq.toDF("column", "dtype", "n_rows", "n_nulls", "n_distinct",
      "min_value", "max_value")
  }

  /** Exact per-group top-k rows — the bounded-shuffle alternative to
    * `row_number() OVER (PARTITION BY g ORDER BY v DESC, tie ASC)`
    * then `rn <= k`. The window route shuffles EVERY row to its
    * group's reducer and sorts the whole group; this one aggregates a
    * k-bounded heap ([[graft.plans.TopKRows]]) with map-side combine,
    * so the exchange carries at most k rows per group per map task —
    * the per-group cousin of global `orderBy.limit`'s
    * TakeOrderedAndProject. Result set is identical to the window
    * route (spec-pinned) when `tieCol` is unique within each group;
    * rows with a NULL order or tie value are excluded, like the
    * window oracle under `WHERE v IS NOT NULL`.
    *
    * `orderCol` must be numeric (cast to double for ordering — exact
    * for integrals < 2^53 and all float/decimal test data);
    * `tieCol` must be integral. Output schema = input schema; rows
    * within a group come back best-first.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tieCol: String, k: Int, descending: Boolean = true): DataFrame = {
    import org.apache.spark.sql.types._
    require(k > 0, s"topKPerGroup: k must be > 0, got $k")
    require(groupCols.nonEmpty, "topKPerGroup: no group columns")
    def field(n: String) = df.schema.fields.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"topKPerGroup: no column '$n' in ${df.columns.mkString(", ")}"))
    require(field(orderCol).dataType.isInstanceOf[NumericType],
      s"topKPerGroup: order column '$orderCol' must be numeric, " +
        s"got ${field(orderCol).dataType.simpleString}")
    require(Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(field(tieCol).dataType),
      s"topKPerGroup: tie column '$tieCol' must be integral, " +
        s"got ${field(tieCol).dataType.simpleString}")
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.plans.TopKRows.topKRows(
        col(orderCol).cast(DoubleType), col(tieCol).cast(LongType),
        payload, k, descending).as("__topk"))
      .select(explode(col("__topk")).as("__r"))
      .select(col("__r.*"))
  }
}
