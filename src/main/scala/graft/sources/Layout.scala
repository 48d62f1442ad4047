package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.Kernels

/** Data-layout control for scan-side pruning at scale.
  *
  * The reference gets O(1) point access from page pointers on one disk
  * (tablite/base.py:277-339); the distributed analogue is clustering the
  * FILES so that parquet min/max statistics prune row groups for
  * multi-column range predicates. A plain sort clusters only the leading
  * column; a Z-order (Morton) curve interleaves the bits of several
  * columns' quantile-bucket ranks, so a selective range on ANY of the
  * curve columns maps to a small fraction of files.
  */
object Layout {

  /** Compute the z-value column for `cols` (numeric/date-castable) using
    * `2^bits` quantile buckets per column. Quantiles come from a single
    * distributed `approxQuantile` sketch pass; the boundary table rides
    * into executor codegen as a reference object (no shuffle, no join).
    */
  def zValueFor(df: DataFrame, cols: Seq[String], bits: Int = 8): org.apache.spark.sql.Column = {
    require(cols.nonEmpty && cols.length * bits <= 63,
      s"z-value must fit a long: cols=${cols.length} bits=$bits")
    val probes = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    val casted = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    val boundaries: Array[Array[Double]] =
      casted.stat.approxQuantile(cols.toArray, probes, 0.001)
        // de-dup plateaued boundaries so constant-ish columns don't burn bits
        .map(_.distinct)
    Kernels.zValue(array(cols.map(c => col(c).cast("double")): _*), boundaries, bits)
  }

  /** Write `df` as parquet clustered on the Z-order curve of `cols`:
    * range-partition by z-value into `numFiles` tasks (range, not hash —
    * neighbouring curve cells land in the same file), sort within each
    * task so row groups are tight, then drop the helper column. Row SET
    * is unchanged — layout only affects which files a filter touches.
    */
  def zorderWrite(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int = 32, bits: Int = 8): Unit = {
    val z = zValueFor(df, cols, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** File-level skipping index: one sidecar row per data file with the
    * min/max of each requested column, built in ONE distributed pass
    * (`input_file_name()` group). Parquet row-group stats already skip
    * WITHIN a file once it is opened; at 100 TB the cost that remains
    * is opening millions of footers at all — this sidecar answers
    * "which files can possibly match" from one tiny frame instead.
    * Works for any file count (the sidecar is a DataFrame, never
    * collected here); [[prunedFiles]] collects only the SURVIVING file
    * names, which a selective predicate keeps small. Sidecar lives at
    * `<path>/_skipping` (underscore-prefixed: Spark's parquet reader
    * ignores it as metadata, so plain reads of `path` are unaffected).
    */
  def writeSkippingIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "writeSkippingIndex: no columns")
    val df = spark.read.parquet(path)
    cols.foreach(c => require(df.columns.contains(c),
      s"writeSkippingIndex: missing column $c"))
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}__min"), max(col(c)).as(s"${c}__max")))
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$path/_skipping")
  }

  /** Append `batch` to an indexed dataset WITHOUT rebuilding the
    * sidecar: new data files parquet-append, then ONE pass over only
    * the files the sidecar does not know yet (listing anti-joined
    * against the index on file basename) computes their min/max rows,
    * which append to the sidecar. At 100 TB the full
    * [[writeSkippingIndex]] rebuild re-scans the whole dataset per
    * ingest batch; this is O(batch).
    *
    * Crash-safety (SINGLE-WRITER assumption — no coordination between
    * concurrent appenders): data files land before sidecar rows, so a
    * torn append leaves committed files the index does not know;
    * [[prunedFiles]] NEVER returns them, so index reads miss that batch
    * but are never wrong about what they scan. Re-running the append
    * restores index-read visibility IDEMPOTENTLY for the index — the
    * unknown-set diff picks up the orphaned files without double-
    * indexing them — but the re-run's data files are a second copy of
    * the batch rows, which PLAIN (un-indexed) reads of `path` then see
    * as duplicates; deduplicate such a batch upstream (or compact) if
    * plain readers matter. Exactly-once data append needs a table
    * format with a transaction log, which this sidecar does not
    * attempt.
    */
  def appendWithSkippingIndex(batch: DataFrame, path: String,
      cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "appendWithSkippingIndex: no columns")
    cols.foreach(c => require(batch.columns.contains(c),
      s"appendWithSkippingIndex: missing column $c"))
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$path/_skipping")),
      s"appendWithSkippingIndex: no sidecar at $path/_skipping — " +
        "run writeSkippingIndex first")
    batch.write.mode("append").parquet(path)
    // unknown set = listed data files minus sidecar entries, matched on
    // basename (part-file names are UUID-unique; listing and
    // input_file_name() render the scheme differently, the basename is
    // identical). Distributed anti-join so only the (small) unknown set
    // is ever collected — covers both this batch's files and any
    // orphans a previously-torn append left behind, exactly once.
    val listed = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.isFile).map(_.getPath.toString)
      .filter(_.endsWith(".parquet")).toSeq
    import spark.implicits._
    val fresh = listed.toDF("path")
      .withColumn("__base", regexp_extract(col("path"), "[^/]+$", 0))
      .join(
        spark.read.parquet(s"$path/_skipping")
          .select(regexp_extract(col("file"), "[^/]+$", 0).as("__base")),
        Seq("__base"), "left_anti")
      .select("path").as[String].collect().toSeq
    if (fresh.nonEmpty) {
      val aggs = cols.flatMap(c =>
        Seq(min(col(c)).as(s"${c}__min"), max(col(c)).as(s"${c}__max")))
      spark.read.parquet(fresh: _*)
        .groupBy(input_file_name().as("file"))
        .agg(aggs.head, aggs.tail: _*)
        .repartition(1)
        .write.mode("append").parquet(s"$path/_skipping")
    }
  }

  /** Data files under `path` that can possibly satisfy
    * `lo <= colName <= hi`, from the [[writeSkippingIndex]] sidecar —
    * the file-pruning half of a skipping read. A file whose min/max
    * are null (all-null column) cannot match a range and is skipped.
    * Only surviving file names are collected.
    *
    * CONTRACT: the result is legitimately EMPTY when the range misses
    * every file's [min, max] — and `spark.read.parquet()` with zero
    * paths throws a schema-inference error rather than returning an
    * empty frame. Read through [[prunedRead]], which handles that case.
    */
  def prunedFiles(spark: org.apache.spark.sql.SparkSession, path: String,
      colName: String, lo: Any, hi: Any): Seq[String] = {
    val idx = spark.read.parquet(s"$path/_skipping")
    require(idx.columns.contains(s"${colName}__min"),
      s"prunedFiles: $colName not in the skipping index at $path/_skipping")
    idx.filter(col(s"${colName}__max") >= lit(lo) &&
        col(s"${colName}__min") <= lit(hi))
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Skipping read: scan only the [[prunedFiles]] survivors (the range
    * predicate is re-applied row-level — min/max pruning is a superset
    * filter). A fully-pruned range returns an EMPTY frame with the
    * dataset's schema (from a zero-row read of `path`) instead of the
    * zero-path schema-inference error raw `spark.read.parquet(files:_*)`
    * would throw.
    */
  def prunedRead(spark: org.apache.spark.sql.SparkSession, path: String,
      colName: String, lo: Any, hi: Any): org.apache.spark.sql.DataFrame = {
    val files = prunedFiles(spark, path, colName, lo, hi)
    val base =
      if (files.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(files: _*)
    base.filter(col(colName) >= lit(lo) && col(colName) <= lit(hi))
  }
}
