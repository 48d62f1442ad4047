package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-value imputation (tablite/imputation.py:12-158,
  * nimlite/funcs/imputation.nim:116-275). Four methods: carry forward
  * (ffill), mean, mode, nearest neighbour.
  */
object Imputation {

  /** "carry forward": fill NULLs with the last non-null earlier value in
    * `orderCol` order (imputation.py:103-125). Window `last(ignoreNulls)`
    * over unbounded-preceding. The global order window is inherent to the
    * semantics; at scale prefer a partition key (`partitionBy`) when the
    * data has one (e.g. per-device streams).
    */
  def ffill(df: DataFrame, targets: Seq[String], orderCol: String,
      partitionBy: Seq[String] = Nil, tieBreak: Seq[String] = Nil): DataFrame = {
    // the order must be TOTAL within each partition — ties would make the
    // carried value partition-order-dependent; pass tieBreak columns when
    // orderCol alone is not unique
    val orderCols = (orderCol +: tieBreak).map(col)
    val w0 = if (partitionBy.isEmpty) Window.orderBy(orderCols: _*)
             else Window.partitionBy(partitionBy.map(col): _*).orderBy(orderCols: _*)
    val w = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    targets.foldLeft(df)((acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** mean / mode imputation (imputation.py:128-158): one aggregate pass,
    * then coalesce. The stat is computed distributedly and broadcast back
    * via a scalar cross join (1-row frame — Catalyst broadcasts it).
    */
  def fillWithStat(df: DataFrame, targets: Seq[String], method: String): DataFrame = {
    val stats = targets.map { c =>
      val agg = method match {
        case "mean" => avg(col(c))
        case "mode" => mode(col(c))
        case other  => throw new IllegalArgumentException(s"unknown method: $other")
      }
      agg.as(s"__stat_$c")
    }
    val statRow = df.agg(stats.head, stats.tail: _*)
    val joined = df.crossJoin(broadcast(statRow))
    targets.foldLeft(joined)((acc, c) =>
      acc.withColumn(c, coalesce(col(c), col(s"__stat_$c"))))
      .drop(targets.map(c => s"__stat_$c"): _*)
  }

  /** Nearest-neighbour imputation (nimlite/funcs/imputation.nim:116-275):
    * for each row with a missing target, find the complete row closest in
    * rank-normalized L1 distance over `sources` and copy its target value.
    *
    * Scale shape: the reference does an O(n²) scan. Here:
    *   1. percent_rank-normalize each source column (one window per col —
    *      the dominant cost; columns are ranked independently, matching
    *      the Nim kernel's per-column unix-rank, imputation.nim:47-68);
    *   2. split into donors (target present) and patients (target missing);
    *   3. broadcast the (normally few) patients against donors and take
    *      min_by(distance) per patient.
    * This is exact, and scales as |patients| × |donors| map-side work with
    * no shuffle explosion as long as patients fit in a broadcast; for
    * massive patient counts switch to LSH bucketing on the rank vector.
    */
  def nearestNeighbour(df: DataFrame, target: String, sources: Seq[String]): DataFrame = {
    // 1-D fast path: with a single source column, the nearest donor in
    // rank space is either the closest preceding or following donor in
    // sort order — two window passes instead of a patients×donors
    // cross join (which is O(n²) when many rows are missing).
    // Deterministic for unique-valued sources; duplicate source values
    // fall back to the exact multi-source path.
    if (sources.length == 1) return nearestNeighbour1D(df, target, sources.head)
    // rank() (not percent_rank) keeps rank distances exact integers, so
    // equidistant donors tie EXACTLY and the tie-break below is
    // deterministic; ties in the source value share a rank, matching the
    // Nim kernel's unix-rank (imputation.nim:47-68). Normalization to
    // [0,1] happens inside the distance term as a single exact division.
    val ranked = sources.foldLeft(df) { (acc, c) =>
      acc.withColumn(s"__r_$c", (rank().over(Window.orderBy(col(c))) - 1).cast("long"))
    }.withColumn("__n", count(lit(1)).over(Window.partitionBy()))
    val donors = ranked.filter(col(target).isNotNull)
      .select((Seq(col(target).as("__donor_val")) ++
        sources.map(c => col(s"__r_$c").as(s"__dr_$c"))): _*)
    val patients = ranked.filter(col(target).isNull)
    val complete = ranked.filter(col(target).isNotNull)
      .drop(sources.map(c => s"__r_$c") :+ "__n": _*)

    // per-column term: exact integer rank distance, normalized by a single
    // division (same numerator → same double → exact ties)
    val dist = sources.map(c =>
      abs(col(s"__r_$c") - col(s"__dr_$c")).cast("double") /
        greatest(col("__n") - 1, lit(1L)).cast("double")).reduce(_ + _)
    // tie-break equidistant donors by the donor value itself (deterministic)
    val filled = broadcast(patients).crossJoin(donors)
      .groupBy(patients.columns.map(col): _*)
      .agg(min_by(col("__donor_val"), struct(dist, col("__donor_val"))).as("__fill"))
      .withColumn(target, coalesce(col(target), col("__fill")))
      .drop("__fill")
      .drop(sources.map(c => s"__r_$c") :+ "__n": _*)

    complete.unionByName(filled)
  }

  private def nearestNeighbour1D(df: DataFrame, target: String, source: String): DataFrame = {
    val wOrd = Window.orderBy(col(source))
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wNext = wOrd.rowsBetween(1, Window.unboundedFollowing)
    val donorVal = when(col(target).isNotNull, col(target))
    val donorRank = when(col(target).isNotNull, col("__r"))
    df.withColumn("__r", (rank().over(wOrd) - 1).cast("long"))
      .withColumn("__pv", last(donorVal, ignoreNulls = true).over(wPrev))
      .withColumn("__pr", last(donorRank, ignoreNulls = true).over(wPrev))
      .withColumn("__nv", first(donorVal, ignoreNulls = true).over(wNext))
      .withColumn("__nr", first(donorRank, ignoreNulls = true).over(wNext))
      .withColumn(target,
        when(col(target).isNotNull, col(target))
          .when(col("__pv").isNull, col("__nv"))
          .when(col("__nv").isNull, col("__pv"))
          .when(col("__r") - col("__pr") < col("__nr") - col("__r"), col("__pv"))
          .when(col("__nr") - col("__r") < col("__r") - col("__pr"), col("__nv"))
          // equidistant tie → smaller donor value (deterministic)
          .otherwise(least(col("__pv"), col("__nv"))))
      .drop("__r", "__pv", "__pr", "__nv", "__nr")
  }
}
