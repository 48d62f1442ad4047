package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Concat / stack / repeat / merge / diff (tablite/base.py:1464-1663,
  * merge.py:7-50, diff.py:8-88).
  */
object SetOps {

  /** `t1 += t2` — concat; requires identical column-name sets
    * (base.py:1493-1518). Narrow op: union is metadata-only in Spark.
    */
  def concat(a: DataFrame, b: DataFrame): DataFrame = {
    require(a.columns.toSet == b.columns.toSet,
      s"concat requires identical columns; got ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    a.unionByName(b)
  }

  /** `stack` — schema-union concat padding missing columns with NULL
    * (base.py:1640-1663).
    */
  def stack(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)

  /** `t * n` — repeat the table n times (base.py:1464-1491).
    * Cross join with a range: no shuffle, n-fold narrow expansion.
    */
  def repeatTable(df: DataFrame, n: Int): DataFrame =
    df.crossJoin(df.sparkSession.range(n).select(lit(1).as("__rep"))).drop("__rep")

  /** `merge.where(criteria, left, right)` — coalesce two columns into one
    * by a boolean criterion (merge.py:7-50).
    */
  def mergeWhere(df: DataFrame, criteria: Column, left: String, right: String,
      out: String): DataFrame =
    df.withColumn(out, when(criteria, col(left)).otherwise(col(right)))
      .drop(Seq(left, right).filterNot(_ == out): _*)

  /** Set-style diff of two same-schema tables — the scalable variant of
    * the reference's order-sensitive difflib `t.diff` (diff.py:8-88,
    * documented divergence): per-row multiset comparison via full outer
    * join on all columns. Output: the row + counts in each side + a
    * marker `+` (only in b), `-` (only in a), `=` (both).
    */
  def diff(a: DataFrame, b: DataFrame): DataFrame = {
    val cols = a.columns.toSeq
    val ca = a.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__na"))
    val cb = b.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__nb"))
    val cond = cols.map(c => ca(c) <=> cb(c)).reduce(_ && _)
    ca.join(cb, cond, "full")
      .select(
        cols.map(c => coalesce(ca(c), cb(c)).as(c)) ++ Seq(
          coalesce(col("__na"), lit(0L)).as("count_a"),
          coalesce(col("__nb"), lit(0L)).as("count_b"),
          when(col("__na").isNull, "+")
            .when(col("__nb").isNull, "-")
            .otherwise("=").as("marker")): _*)
  }

  /** Deep table equality (base.py:1320-1344): same schema and same row
    * multiset. Two anti-join emptiness checks.
    */
  def tablesEqual(a: DataFrame, b: DataFrame): Boolean =
    a.columns.sameElements(b.columns) &&
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  /** Extensions absent from the reference but free in Spark. */
  def intersectTables(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)
  def exceptTables(a: DataFrame, b: DataFrame): DataFrame = a.`except`(b)
}
