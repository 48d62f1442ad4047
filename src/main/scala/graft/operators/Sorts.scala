package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorts (tablite/sortation.py:17-177, sort_utils.py:10-248).
  *
  * The reference defines three total-order modes over MIXED-type columns.
  * Spark columns are single-typed, so the modes collapse to null-placement
  * + optional stringification:
  *   - excel:        nulls LAST  (numeric < str < bool < None)
  *   - unix:         nulls FIRST (None sorts before everything)
  *   - alphanumeric: values compared as text (cast to string), nulls first
  * STRING order: the reference collates every string sort with pyuca
  * (sort_utils.py:7,141,185,236 — Unicode Collation Algorithm). String-
  * typed keys here sort by a root-locale collation KEY (BinaryType
  * surrogate, [[graft.plans.Kernels.collationKey]]) whose byte order is
  * the collator order — a < A < å < b where binary UTF-8 gives A < b < å
  * — so the linguistic order survives range partitioning unchanged.
  * Java's ROOT collator and pyuca's DUCET table agree on the primary/
  * secondary/tertiary scheme; table-version corners may differ (README
  * divergence note).
  * Distributed sort = range-partitioned exchange + per-partition sort;
  * top-k (`sorted().limit(k)`) becomes TakeOrderedAndProject (no full sort).
  */
object Sorts {

  /** Mode- and type-aware ordering surrogate for one key column. */
  private def orderExpr(c: Column, dt: org.apache.spark.sql.types.DataType,
      mode: String): Column = mode.toLowerCase match {
    case "alphanumeric" => graft.plans.Kernels.collationKey(c.cast("string"))
    case "excel" | "unix" => dt match {
      case org.apache.spark.sql.types.StringType => graft.plans.Kernels.collationKey(c)
      case _                                     => c
    }
    case other => throw new IllegalArgumentException(s"unknown sort mode: $other")
  }

  private def directed(base: Column, reverse: Boolean, mode: String): Column = {
    val nullsLast = mode.toLowerCase == "excel"
    (reverse, nullsLast) match {
      case (false, true)  => base.asc_nulls_last
      case (false, false) => base.asc_nulls_first
      case (true, true)   => base.desc_nulls_first // reverse of asc_nulls_last
      case (true, false)  => base.desc_nulls_last
    }
  }

  def sortKey(df: DataFrame, c: String, reverse: Boolean, mode: String): Column =
    directed(orderExpr(col(c), df.schema(c).dataType, mode), reverse, mode)

  /** `t.sorted(mapping, sort_mode)` (core.py:406-432). mapping preserves
    * insertion order: Seq(column -> reverse?).
    */
  def sorted(df: DataFrame, mapping: Seq[(String, Boolean)], mode: String = "excel"): DataFrame =
    df.orderBy(mapping.map { case (c, rev) => sortKey(df, c, rev, mode) }: _*)

  /** Global 0-based row index over a total order WITHOUT a global window:
    * range-partitioned sort, then the classic zipWithIndex shape — one
    * lightweight count job over the sorted partitions to learn offsets,
    * then a map stamping `offset + local position`. The sort shuffle is
    * materialized once and reused by both jobs; no task ever holds more
    * than its own partition. This is the scale primitive behind
    * sortIndex / stepped slices / reindex (a `row_number().over(
    * Window.orderBy(...))` would funnel the whole table through ONE task).
    */
  /** Shared adaptive-dispatch predicate: below the threshold a one-task
    * global window IS the optimal plan (no extra job, no Row
    * round-trip); above it the boundary-carry/zipWithIndex shapes keep
    * every task bounded by its own partition. One definition — the
    * row-index, unkeyed-ffill and 1-D NN dispatches must never drift
    * apart. The threshold is a session conf so tests can pin either path.
    */
  private[graft] def underLocalThreshold(df: DataFrame): Boolean = {
    val smallBytes = df.sparkSession.conf
      .getOption("graft.rowIndex.localThresholdBytes").map(_.toLong)
      .getOrElse(256L << 20)
    df.queryExecution.optimizedPlan.stats.sizeInBytes <= smallBytes
  }

  def withRowIndex(df: DataFrame, orderBy: Seq[Column], out: String): DataFrame = {
    if (underLocalThreshold(df)) {
      val w = Window.orderBy(orderBy: _*)
      df.withColumn(out, row_number().over(w).cast("long") - 1L)
    } else withRowIndexDistributed(df, orderBy, out)
  }

  /** The unconditional scale path of [[withRowIndex]]. */
  def withRowIndexDistributed(df: DataFrame, orderBy: Seq[Column], out: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(orderBy: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(out, org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** `t.sort_index` — the permutation without applying it
    * (sortation.py:17-69): original position + rank. Built on
    * [[withRowIndex]]: parallel range-partitioned sort, no global window.
    */
  def sortIndex(df: DataFrame, mapping: Seq[(String, Boolean)], mode: String = "excel"): DataFrame =
    withRowIndex(df, mapping.map { case (c, rev) => sortKey(df, c, rev, mode) }, "sort_index")

  /** `t.is_sorted` (sortation.py:165-177): true iff the frame already obeys
    * the given order in its current (input) row order. Scale shape: the
    * pairwise prev≤cur check runs per partition (`monotonically_increasing_id`
    * is ordered within a partition by construction), and partition FIRST/LAST
    * boundary rows — numPartitions of them — merge with one tiny
    * aggregation; no global window, no single-task funnel.
    */
  def isSorted(df: DataFrame, mapping: Seq[(String, Boolean)], mode: String = "excel"): Boolean = {
    val nullsLast = mode.toLowerCase == "excel"
    // persist the indexed frame: the local check + boundary merge read it
    // ~4×, and pinning the partitions also makes the verdict stable when
    // the upstream's intra-partition order is not deterministic across
    // re-executions (shuffle output order, sample) — the boundary rows
    // checked in job 2 must be the rows validated in job 1
    val withIn = df.withColumn("__in", monotonically_increasing_id())
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try isSortedOn(withIn, mapping, mode, nullsLast)
    finally withIn.unpersist(blocking = false)
  }

  private def isSortedOn(withIn: DataFrame, mapping: Seq[(String, Boolean)],
      mode: String, nullsLast: Boolean): Boolean = {
    val w = Window.partitionBy(col("__pid")).orderBy(col("__in"))
    // lexicographic "prev <= cur" under per-column direction + null placement
    def nullRank(x: Column): Column =
      if (nullsLast) when(x.isNull, 1).otherwise(0) else when(x.isNull, 0).otherwise(1)
    def key(c: String): Column =
      orderExpr(col(c), withIn.schema(c).dataType, mode)
    def pairOk(prev: String => Column): Column =
      mapping.foldRight(lit(true)) { case ((c, rev), rest) =>
        val cur = key(c)
        val prv = prev(c)
        val (lo, hi) = if (rev) (cur, prv) else (prv, cur)
        val strictBefore = coalesce(
          (nullRank(lo) < nullRank(hi)) || (nullRank(lo) === nullRank(hi) && lo < hi),
          lit(false))
        strictBefore || ((prv <=> cur) && rest)
      }
    val ok = pairOk(c => lag(key(c), 1).over(w))
    val prevExists = lag(lit(1), 1).over(w).isNotNull
    val localSorted = withIn.withColumn("__ok", !prevExists || ok)
      .filter(!col("__ok")).isEmpty
    if (!localSorted) return false
    // boundary merge: last row of partition p vs first row of partition p+1
    val wAsc = Window.partitionBy(col("__pid")).orderBy(col("__in"))
    val wDesc = Window.partitionBy(col("__pid")).orderBy(col("__in").desc)
    val firsts = withIn.withColumn("__rn", row_number().over(wAsc)).filter(col("__rn") === 1)
    val lasts = withIn.withColumn("__rn", row_number().over(wDesc)).filter(col("__rn") === 1)
    // empty partitions leave pid gaps — densify over the (numPartitions-
    // sized, bounded) pid set so adjacent non-empty partitions pair up
    val pidRank = withIn.select(col("__pid")).distinct()
      .withColumn("__dense", row_number().over(Window.orderBy(col("__pid"))))
    val edges = lasts.join(pidRank, "__pid").alias("a")
      .join(firsts.join(pidRank, "__pid").alias("b"),
        col("a.__dense") + 1 === col("b.__dense"))
    boundaryOk(edges, mapping, mode, c => withIn.schema(c).dataType)
  }

  /** prev-row (a.*) ≤ cur-row (b.*) lexicographic check on the joined
    * partition-boundary frame.
    */
  private def boundaryOk(edges: DataFrame, mapping: Seq[(String, Boolean)], mode: String,
      dtOf: String => org.apache.spark.sql.types.DataType): Boolean = {
    val nullsLast = mode.toLowerCase == "excel"
    def nullRank(x: Column): Column =
      if (nullsLast) when(x.isNull, 1).otherwise(0) else when(x.isNull, 0).otherwise(1)
    def key(side: String, c: String): Column =
      orderExpr(col(s"$side.$c"), dtOf(c), mode)
    val ok = mapping.foldRight(lit(true)) { case ((c, rev), rest) =>
      val prv = key("a", c)
      val cur = key("b", c)
      val (lo, hi) = if (rev) (cur, prv) else (prv, cur)
      val strictBefore = coalesce(
        (nullRank(lo) < nullRank(hi)) || (nullRank(lo) === nullRank(hi) && lo < hi),
        lit(false))
      strictBefore || ((prv <=> cur) && rest)
    }
    edges.filter(!ok).isEmpty
  }

  /** `t.reindex(index)` — gather rows by position array (reindex.py:8-50).
    * Spark shape: join the positions frame against a row-numbered input.
    * -1 positions produce all-NULL rows (the reference's None row).
    */
  def reindex(df: DataFrame, positions: DataFrame, posCol: String, orderCol: String): DataFrame = {
    val numbered = withRowIndex(df, Seq(col(orderCol)), "__pos")
    positions.join(numbered, col(posCol) === col("__pos"), "left")
      .drop("__pos")
  }
}
