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
    if (partitionBy.isEmpty) return ffillGlobal(df, targets, orderCols)
    val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    targets.foldLeft(df)((acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Unkeyed ffill without the single-task global window: range-partitioned
    * sort, then (1) a lightweight boundary job collecting each partition's
    * last non-null per target — numPartitions rows to the driver, (2) a
    * per-partition imperative carry seeded with the prefix-merged
    * boundaries. The sort shuffle materializes once and serves both jobs;
    * no task ever sees more than its own partition.
    */
  private def ffillGlobal(df: DataFrame, targets: Seq[String], orderCols: Seq[Column]): DataFrame = {
    // same adaptive dispatch as Sorts.withRowIndex: a one-task window is
    // optimal below the threshold; the boundary-carry shape above it
    val smallBytes = df.sparkSession.conf
      .getOption("graft.rowIndex.localThresholdBytes").map(_.toLong)
      .getOrElse(256L << 20)
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= smallBytes) {
      val w = Window.orderBy(orderCols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      return targets.foldLeft(df)((acc, c) =>
        acc.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    }
    ffillBoundaryCarry(df, targets, orderCols)
  }

  /** The unconditional scale path of unkeyed ffill. */
  private[graft] def ffillBoundaryCarry(df: DataFrame, targets: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(orderCols: _*)
    val schema = sorted.schema
    val tIdx = targets.map(schema.fieldIndex).toArray
    val rdd = sorted.rdd
    val perPart: Array[Array[Any]] = rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = new Array[Any](tIdx.length)
      it.foreach { r =>
        var i = 0
        while (i < tIdx.length) { val v = r.get(tIdx(i)); if (v != null) acc(i) = v; i += 1 }
      }
      Iterator((pid, acc))
    }.collect().sortBy(_._1).map(_._2)
    // carry-in for partition p = last non-null over all partitions < p
    val carryIn = Array.ofDim[Array[Any]](perPart.length)
    val run = new Array[Any](tIdx.length)
    var p = 0
    while (p < perPart.length) {
      carryIn(p) = run.clone()
      var i = 0
      while (i < tIdx.length) { if (perPart(p)(i) != null) run(i) = perPart(p)(i); i += 1 }
      p += 1
    }
    val filled = rdd.mapPartitionsWithIndex { (pid, it) =>
      val carry = carryIn(pid).clone()
      it.map { r =>
        val vals = r.toSeq.toArray
        var i = 0
        while (i < tIdx.length) {
          val v = vals(tIdx(i))
          if (v == null) vals(tIdx(i)) = carry(i) else carry(i) = v
          i += 1
        }
        org.apache.spark.sql.Row.fromSeq(vals.toIndexedSeq)
      }
    }
    spark.createDataFrame(filled, schema)
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
    // Integer ranks (not percent_rank) keep rank distances exact, so
    // equidistant donors tie EXACTLY and the tie-break below is
    // deterministic; ties in the source value share a rank, matching the
    // Nim kernel's unix-rank (imputation.nim:47-68). Ranks are computed
    // WITHOUT a global window: per column, a zipWithIndex row index over
    // the value sort, reduced to min-index-per-value (= SQL rank - 1) and
    // joined back on the value — every stage is a parallel shuffle, no
    // single task ever holds the table. Normalization to [0,1] happens
    // inside the distance term as a single exact division.
    def rankTable(c: String): DataFrame =
      Sorts.withRowIndex(df.select(col(c).as(s"__v_$c")), Seq(col(s"__v_$c")), "__idx")
        .groupBy(s"__v_$c").agg(min("__idx").as(s"__r_$c"))
    val rankJoined = sources.foldLeft(df) { (acc, c) =>
      acc.join(rankTable(c), acc(c) <=> col(s"__v_$c"), "left").drop(s"__v_$c")
    }
    // row count as a 1-row broadcast (a count().over(Window.partitionBy())
    // would be one more global window)
    val ranked = rankJoined.crossJoin(
      broadcast(df.agg(count(lit(1)).as("__n"))))
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
    // tie-break equidistant donors by the donor value itself (deterministic).
    // No forced broadcast: patients are unbounded (a column 50% null would
    // broadcast half the corpus) — Catalyst/AQE picks broadcast-NL only
    // when the side actually fits the threshold, else a distributed
    // cartesian (p×q bounded tasks). Exact NN is inherently
    // |patients|×|donors| work — same as the reference's O(n²) scan, but
    // spread over the cluster instead of one node.
    val filled = patients.crossJoin(donors)
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
