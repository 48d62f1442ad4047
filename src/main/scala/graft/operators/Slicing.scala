package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row slicing with Python-list semantics over an explicit order
  * (tablite/base.py:1205-1287, utils.py:86-167 `intercept`).
  *
  * Spark rows have no inherent order, so every slice is defined against
  * an order column (the reference's implicit page order). Plain
  * start/stop slices compile to offset+limit (no row_number, no global
  * window); only stepped slices need a rank.
  */
object Slicing {

  /** `t[start:stop]` over `orderCols` ascending. */
  def slice(df: DataFrame, orderCols: Seq[String], start: Int, stop: Int): DataFrame = {
    val sorted = df.orderBy(orderCols.map(col): _*)
    val limited = if (stop == Int.MaxValue) sorted else sorted.limit(stop)
    if (start <= 0) limited else limited.offset(start)
  }

  /** `t[start:stop:step]` — stepped slice; needs a rank, so it carries a
    * global ordering window. Use only when step != 1.
    */
  def sliceStep(df: DataFrame, orderCols: Seq[String], start: Int, stop: Int, step: Int): DataFrame = {
    require(step > 0, "negative steps: reverse the order columns instead")
    val w = Window.orderBy(orderCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w) - 1)
      .filter(col("__rn") >= start && col("__rn") < stop &&
        (col("__rn") - start) % step === 0)
      .drop("__rn")
  }

  /** head/first-n (base.py:1692 show elision). */
  def head(df: DataFrame, n: Int, orderCols: Seq[String]): DataFrame =
    slice(df, orderCols, 0, n)
}
