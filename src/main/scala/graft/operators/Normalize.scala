package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-scaling / encoding ops (ext — the ML-prep tail of the
  * pipeline: normalize quality scores per source, one-hot a language
  * column before a linear probe).
  */
object Normalize {

  private def grouped(groupCols: Seq[String]) =
    if (groupCols.isEmpty) Window.partitionBy()
    else Window.partitionBy(groupCols.map(col): _*)

  /** Min-max scaling of `valueCol` into [0, 1], per `groupCols` group
    * (global when empty): (x − min) / (max − min). A constant group
    * (max = min) scales to null — there is no information to scale, and
    * a silent 0 or 0.5 would be an invented value. Nulls pass through
    * as null. One hash exchange (the unordered group window computes
    * min/max in a single frame pass); the unkeyed variant is a
    * SinglePartition window — fine for the agg-only frame, but prefer
    * grouped use at scale.
    */
  def minMax(df: DataFrame, valueCol: String, groupCols: Seq[String] = Nil,
      out: String = "scaled"): DataFrame = {
    val w = grouped(groupCols)
    val x = col(valueCol).cast("double")
    val mn = min(x).over(w)
    val mx = max(x).over(w)
    df.withColumn(out, when(mx === mn, lit(null).cast("double"))
      .otherwise((x - mn) / (mx - mn)))
  }

  /** Z-score standardization of `valueCol` per group: (x − mean) /
    * stddev (sample). A constant group (stddev 0 or a single row) emits
    * null. Same one-exchange window shape as [[minMax]].
    */
  def zscore(df: DataFrame, valueCol: String, groupCols: Seq[String] = Nil,
      out: String = "zscore"): DataFrame = {
    val w = grouped(groupCols)
    val x = col(valueCol).cast("double")
    val av = avg(x).over(w)
    val sd = stddev_samp(x).over(w)
    df.withColumn(out, when(sd.isNull || sd === 0.0, lit(null).cast("double"))
      .otherwise((x - av) / sd))
  }

  /** Equi-depth (quantile) binning: assign each row the bucket of its
    * value among `nBins` quantile intervals — the discretization
    * sibling of `GroupBy.binnedHistogram`'s equi-width bins. NOT an
    * `ntile` window (that is a SinglePartition sort at scale): the
    * n−1 interior cut points come from ONE exact-percentile
    * aggregation, broadcast into a narrow comparison map — bin =
    * #cuts strictly below x (ties sit in the lower bin, the
    * `quantile_cont` boundary convention any engine re-derives).
    * Nulls bin to null. Duplicate cut points (heavily repeated
    * values) simply leave some bins empty — assignment stays total
    * and deterministic.
    */
  def quantileBin(df: DataFrame, valueCol: String, nBins: Int,
      out: String = "bin"): DataFrame = {
    require(nBins > 1, s"quantileBin: nBins=$nBins")
    val x = col(valueCol).cast("double")
    val ps = (1 until nBins).map(_.toDouble / nBins)
    val row = df.filter(x.isNotNull)
      .agg(percentile(x, typedlit(ps)).as("qs")).collect()(0)
    val cuts: Seq[Double] =
      if (row.isNullAt(0)) Nil else row.getSeq[Double](0)
    val bin = cuts.foldLeft(lit(0L)) { (acc, c) =>
      acc + when(x > c, 1L).otherwise(0L)
    }
    df.withColumn(out, when(x.isNull, lit(null).cast("long")).otherwise(bin))
  }

  /** Smoothed target (mean) encoding of a categorical column:
    * enc = (n·catMean + smoothing·globalMean) / (n + smoothing) — the
    * standard shrinkage that pulls rare categories toward the global
    * mean instead of memorizing noise (smoothing = the pseudo-count at
    * which a category's own mean and the prior weigh equally). Null
    * categories and null targets contribute nothing to the means; null
    * categories encode to the global mean (the unknown-category
    * convention). Scale shape: one groupBy over the category column
    * (bounded by its cardinality), the stats frame BROADCASTS back —
    * the main frame never shuffles.
    */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
      smoothing: Double = 10.0, out: String = "target_enc"): DataFrame = {
    require(df.columns.contains(catCol) && df.columns.contains(targetCol),
      s"targetEncode: missing $catCol or $targetCol")
    require(smoothing >= 0, s"targetEncode: smoothing=$smoothing")
    val t = col(targetCol).cast("double")
    val gRow = df.agg(avg(t)).collect()(0)
    val g = if (gRow.isNullAt(0)) 0.0 else gRow.getDouble(0)
    val stats = df.filter(col(catCol).isNotNull && t.isNotNull)
      .groupBy(col(catCol))
      .agg(count(lit(1)).as("__n"), avg(t).as("__m"))
      .withColumn("__enc",
        (col("__n") * col("__m") + lit(smoothing) * g) / (col("__n") + smoothing))
      .select(col(catCol), col("__enc"))
    df.join(broadcast(stats), Seq(catCol), "left_outer")
      .withColumn(out, coalesce(col("__enc"), lit(g)))
      .drop("__enc")
  }

  /** One-hot encode a LOW-cardinality string column: one 0/1 long column
    * per distinct value, named `<col>_<value>` (value sanitized to
    * [A-Za-z0-9_]), in sorted value order so the output schema is
    * deterministic. Nulls encode as all zeros. The distinct values are
    * collected to the driver — guarded by `maxCategories`, which fails
    * loudly instead of exploding the schema of a high-cardinality
    * column (one-hot a 1M-value column is a modeling bug, not a job for
    * wider rows). Encoding itself is a narrow codegen'd map stage.
    */
  def oneHot(df: DataFrame, c: String, maxCategories: Int = 100): DataFrame = {
    require(df.columns.contains(c), s"oneHot: missing column $c")
    val values = df.select(col(c)).filter(col(c).isNotNull).distinct()
      .limit(maxCategories + 1).collect().map(_.get(0).toString).sorted
    require(values.length <= maxCategories,
      s"oneHot: $c has > $maxCategories distinct values; one-hot is for " +
        "low-cardinality columns (hash or target-encode instead)")
    values.foldLeft(df) { (acc, v) =>
      val name = s"${c}_${v.replaceAll("[^A-Za-z0-9_]", "_")}"
      acc.withColumn(name, when(col(c) === v, 1L).otherwise(0L))
    }
  }
}
