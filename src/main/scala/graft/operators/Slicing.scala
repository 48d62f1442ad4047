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

  /** `t[start:stop:step]` — stepped slice; needs a rank. Uses the
    * zipWithIndex row index (parallel range-partitioned sort + offset
    * stamping), never a single-task global window. Use only when step != 1.
    */
  def sliceStep(df: DataFrame, orderCols: Seq[String], start: Int, stop: Int, step: Int): DataFrame = {
    require(step > 0, "negative steps: reverse the order columns instead")
    Sorts.withRowIndex(df, orderCols.map(col), "__rn")
      .filter(col("__rn") >= start && col("__rn") < stop &&
        (col("__rn") - start) % step === 0)
      .drop("__rn")
  }

  /** head/first-n (base.py:1692 show elision). */
  def head(df: DataFrame, n: Int, orderCols: Seq[String]): DataFrame =
    slice(df, orderCols, 0, n)

  /** Full Python slice semantics `t[start:stop:step]` including negative
    * indices and negative steps (tests/test_slice_rules.py:1-40,
    * utils.py:86-167 `intercept`). Negative bounds need the row count —
    * one `count()` pass, same as the reference's known `len`. The result
    * keeps the slice's traversal order (reversed for negative steps),
    * which materializes on collect/show/write.
    */
  def pySlice(
      df: DataFrame,
      orderCols: Seq[String],
      start: Option[Long] = None,
      stop: Option[Long] = None,
      step: Option[Long] = None): DataFrame = {
    val st = step.getOrElse(1L)
    require(st != 0L, "slice step cannot be zero")
    val n = df.count()
    // CPython PySlice_AdjustIndices
    def norm(v: Option[Long], dfltPos: Long, dfltNeg: Long): Long = v match {
      case None => if (st > 0) dfltPos else dfltNeg
      case Some(x0) =>
        val x = if (x0 < 0) x0 + n else x0
        if (x < 0) { if (st > 0) 0L else -1L }
        else if (x >= n) { if (st > 0) n else n - 1 }
        else x
    }
    val a = norm(start, 0L, n - 1)
    val b = norm(stop, n, -1L)
    val ranked = Sorts.withRowIndex(df, orderCols.map(col), "__rn")
    val filtered =
      if (st > 0)
        ranked.filter(col("__rn") >= a && col("__rn") < b &&
          (col("__rn") - a) % st === 0)
          .orderBy(col("__rn").asc)
      else
        ranked.filter(col("__rn") <= a && col("__rn") > b &&
          (lit(a) - col("__rn")) % (-st) === 0)
          .orderBy(col("__rn").desc)
    filtered.drop("__rn")
  }
}
