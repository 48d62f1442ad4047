package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Pivot / reshape (tablite/pivots.py:11-288). */
object Pivots {

  /** Wide pivot: groupBy(rows).pivot(columns).agg — the reference's
    * `t.pivot(rows, columns, functions, values_as_rows=False)`
    * (pivots.py:11-182). `pivotValues` should be passed explicitly at
    * scale: it lets Spark skip the extra distinct-values job AND bounds
    * the output width.
    */
  def pivot(
      df: DataFrame,
      rows: Seq[String],
      columns: Seq[String],
      functions: Seq[(String, String)],
      pivotValues: Seq[Any] = Nil): DataFrame = {
    val pivotCol =
      if (columns.length == 1) col(columns.head)
      else concat_ws(",", columns.map(col): _*)
    val grouped = df.groupBy(rows.map(col): _*)
    val pivoted =
      if (pivotValues.nonEmpty) grouped.pivot(pivotCol, pivotValues)
      else grouped.pivot(pivotCol)
    val aggs = functions.map { case (c, fn) => GroupBy.accumulator(fn, c) }
    pivoted.agg(aggs.head, aggs.tail: _*)
  }

  /** Long pivot (`values_as_rows=True`): groupby + melt of the aggregate
    * columns into (function, value) rows (pivots.py:124-178).
    */
  def pivotLong(
      df: DataFrame,
      rows: Seq[String],
      columns: Seq[String],
      functions: Seq[(String, String)]): DataFrame = {
    val agged = GroupBy.groupby(df, rows ++ columns, functions)
    val valueCols = functions.map { case (c, fn) => s"$fn($c)" }
    melt(agged, rows ++ columns, valueCols, "function", "value")
  }

  /** `pivot_transpose` / melt (pivots.py:201-288): unpivot `valueCols`
    * to (variable, value) pairs repeating `keep` columns. Narrow op —
    * no shuffle; implemented with the built-in unpivot (Spark 3.4+).
    */
  def melt(
      df: DataFrame,
      keep: Seq[String],
      valueCols: Seq[String],
      variableName: String = "transpose",
      valueName: String = "value"): DataFrame =
    df.unpivot(keep.map(col).toArray, valueCols.map(col).toArray, variableName, valueName)

  /** Full matrix transpose (pivots.py:185-198). Driver-side by design —
    * the output has one column per input ROW, so it is only sane for
    * small tables; enforced with a row cap.
    */
  def transpose(df: DataFrame, maxRows: Int = 10000): DataFrame = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows, s"transpose is a driver-side op capped at $maxRows rows")
    val spark = df.sparkSession
    val header = df.columns
    val out = header.indices.drop(1).map { i =>
      Row.fromSeq(header(i) +: rows.map(r => Option(r.get(i)).map(_.toString).orNull).toSeq)
    }
    val firstColValues = rows.map(r => Option(r.get(0)).map(_.toString).getOrElse("null"))
    val schema = org.apache.spark.sql.types.StructType(
      (df.columns.head +: firstColValues.toSeq).map(n =>
        org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType, true)))
    spark.createDataFrame(spark.sparkContext.parallelize(out.toSeq), schema)
  }
}
