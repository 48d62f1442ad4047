package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling (moving-window) aggregates over the last `n` rows — the
  * moving-average / running-extrema family (no reference analogue; its
  * users groupby-then-scan in Python. Table stakes for event and
  * time-series work, and the windowed cousin of [[Imputation.ffill]]).
  *
  * For each value column `c`, appends `{c}_roll_sum / _roll_avg /
  * _roll_min / _roll_max` over the window of `n` rows ending at the
  * current row (fewer at the head — SQL `ROWS BETWEEN n-1 PRECEDING AND
  * CURRENT ROW` semantics; nulls are ignored, an all-null window yields
  * null). Value columns are cast to double, so both execution paths and
  * any SQL engine agree on output types.
  *
  * Scale shape: with `partitionCols` this is one hash-partitioned
  * window — the distributed-safe form, skew surface = rows per key.
  * UNKEYED rolling above the local threshold does NOT funnel the table
  * through a single-task global window: range-sort once, collect each
  * sorted partition's LAST `n-1` value tuples (numPartitions × (n-1)
  * tuples — a boundary job, not the data), prefix-merge them on the
  * driver, and run a per-partition ring-buffer carry seeded with the
  * carry-in ([[Imputation.ffillBoundaryCarry]]'s shape; the sort
  * shuffle materializes once and serves both jobs).
  */
object Rolling {

  def rolling(
      df: DataFrame, valueCols: Seq[String], orderCol: String, n: Int,
      partitionCols: Seq[String] = Nil, tieBreak: Seq[String] = Nil): DataFrame = {
    // the order must be TOTAL within each partition — ties make every
    // window's membership partition-order-dependent; pass tieBreak
    // columns when orderCol alone is not unique (the ffill contract)
    require(n > 0, s"rolling: n=$n")
    require(valueCols.nonEmpty, "rolling: no value columns")
    valueCols.foreach { c =>
      require(df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"rolling: '$c' is ${df.schema(c).dataType.simpleString}, need numeric")
    }
    val orderCols = (orderCol +: tieBreak).map(col)
    val base = valueCols.foldLeft(df)((acc, c) =>
      acc.withColumn(c, col(c).cast("double")))
    if (partitionCols.nonEmpty)
      return windowed(base, valueCols,
        Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
          .rowsBetween(-(n - 1).toLong, Window.currentRow))
    if (Sorts.underLocalThreshold(base))
      return windowed(base, valueCols,
        Window.orderBy(orderCols: _*).rowsBetween(-(n - 1).toLong, Window.currentRow))
    boundaryCarry(base, valueCols, orderCols, n)
  }

  private def windowed(df: DataFrame, valueCols: Seq[String],
      w: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
    valueCols.foldLeft(df)((acc, c) => acc
      .withColumn(s"${c}_roll_sum", sum(col(c)).over(w))
      .withColumn(s"${c}_roll_avg", avg(col(c)).over(w))
      .withColumn(s"${c}_roll_min", min(col(c)).over(w))
      .withColumn(s"${c}_roll_max", max(col(c)).over(w)))

  /** The unconditional scale path of unkeyed rolling. */
  private[graft] def boundaryCarry(
      df: DataFrame, valueCols: Seq[String], orderCols: Seq[Column], n: Int): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(orderCols: _*)
    val schema = sorted.schema
    val vIdx = valueCols.map(schema.fieldIndex).toArray
    val rdd = sorted.rdd
    // boundary job: each partition's last n-1 value tuples, in order
    val tails: Array[Array[Array[Any]]] = rdd.mapPartitionsWithIndex { (pid, it) =>
      val buf = new scala.collection.mutable.ArrayDeque[Array[Any]]()
      it.foreach { r =>
        if (buf.size == n - 1 && n > 1) buf.removeHead()
        if (n > 1) buf.append(vIdx.map(r.get))
      }
      Iterator((pid, buf.toArray))
    }.collect().sortBy(_._1).map(_._2)
    // carry-in for partition p = last n-1 tuples of everything before it
    val carryIn = Array.ofDim[Array[Array[Any]]](tails.length)
    var acc = Array.empty[Array[Any]]
    var p = 0
    while (p < tails.length) {
      carryIn(p) = acc
      acc = (acc ++ tails(p)).takeRight(n - 1)
      p += 1
    }
    val outSchema = org.apache.spark.sql.types.StructType(schema.fields ++
      valueCols.flatMap(c => Seq("sum", "avg", "min", "max").map(a =>
        org.apache.spark.sql.types.StructField(s"${c}_roll_$a",
          org.apache.spark.sql.types.DoubleType, nullable = true))))
    val rolled = rdd.mapPartitionsWithIndex { (pid, it) =>
      // ring buffer of the trailing n value tuples (carry-in seeds the
      // first rows' windows across the partition boundary)
      val ring = scala.collection.mutable.ArrayDeque[Array[Any]](carryIn(pid): _*)
      it.map { r =>
        ring.append(vIdx.map(r.get))
        if (ring.size > n) ring.removeHead()
        val extra = new Array[Any](vIdx.length * 4)
        var i = 0
        while (i < vIdx.length) {
          var s = 0.0; var cnt = 0
          var mn = Double.NaN; var mx = Double.NaN
          ring.foreach { tup =>
            val v = tup(i)
            if (v != null) {
              val d = v.asInstanceOf[Double]
              s += d; cnt += 1
              if (cnt == 1 || d < mn) mn = d
              if (cnt == 1 || d > mx) mx = d
            }
          }
          if (cnt == 0) { var j = 0; while (j < 4) { extra(i * 4 + j) = null; j += 1 } }
          else {
            extra(i * 4) = s
            extra(i * 4 + 1) = s / cnt
            extra(i * 4 + 2) = mn
            extra(i * 4 + 3) = mx
          }
          i += 1
        }
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ extra)
      }
    }
    spark.createDataFrame(rolled, outSchema)
  }
}
