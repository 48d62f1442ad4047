package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regular-grid time-series operators (ext — the reference generates
  * `date_range` grids, `sources/Datasets.scala`, but has no resampler).
  */
object TimeSeries {

  /** Resample events onto a regular `stepMs` grid per group: one row per
    * (group, bucket) from the group's FIRST to LAST active bucket, with
    * the bucket's event count and value sum — gaps emitted as n = 0 /
    * total = 0.0, so downstream rolling/plotting never has to infer
    * missing intervals. Bucket = floor(epoch_millis / stepMs), exact
    * integer math any engine re-derives.
    *
    * Scale shape: one partial-agg exchange on (group, bucket) — the raw
    * events never shuffle unaggregated — then a per-group min/max over
    * the ALREADY-aggregated frame and a generated bucket spine
    * (`explode(sequence(...))`, O(groups × active-span) rows) left-joined
    * to the counts. A group's spine size is its time span / step: pick
    * the step to match the span (guarded by `maxBucketsPerGroup`, which
    * fails loudly instead of exploding a year-long span at 1 ms steps
    * into 3×10^10 rows).
    */
  def resample(
      df: DataFrame,
      tsCol: String,
      groupCol: String,
      stepMs: Long,
      valueCol: String,
      maxBucketsPerGroup: Long = 10000000L): DataFrame = {
    require(stepMs > 0, s"stepMs: $stepMs")
    val bucket = floor(unix_millis(col(tsCol)) / stepMs).cast("long")
    val scope = new CacheScope
    val agg = scope.persist(df.filter(col(tsCol).isNotNull)
      .groupBy(col(groupCol), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol).cast("double")).as("total")))
    val spans = agg.groupBy(col(groupCol))
      .agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
    val worst = spans.agg(max(col("__hi") - col("__lo") + 1)).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
      .getOrElse(0L)
    require(worst <= maxBucketsPerGroup,
      s"resample: a group spans $worst buckets at stepMs=$stepMs " +
        s"(> maxBucketsPerGroup=$maxBucketsPerGroup); use a coarser step")
    val spine = spans.select(col(groupCol),
      explode(sequence(col("__lo"), col("__hi"))).as("bucket"))
    scope.releaseAfter(spine.join(agg, Seq(groupCol, "bucket"), "left_outer")
      .select(col(groupCol), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total"), lit(0.0)).as("total")))
  }
}
