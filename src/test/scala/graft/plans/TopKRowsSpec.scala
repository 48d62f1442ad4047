package graft.plans

import graft.SparkSpec
import graft.operators.GroupBy
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded per-group top-k aggregate vs the window `row_number` route:
  * identical result sets on ties, invariance under partitioning, null
  * exclusion, and the k-larger-than-group edge.
  */
class TopKRowsSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: DataFrame, group: String, order: String,
      tie: String, k: Int, desc: Boolean): Seq[String] = {
    val ord = if (desc) Seq(col(order).desc, col(tie).asc)
              else Seq(col(order).asc, col(tie).asc)
    df.filter(col(order).isNotNull && col(tie).isNotNull)
      .withColumn("__rn",
        row_number().over(Window.partitionBy(group).orderBy(ord: _*)))
      .filter(col("__rn") <= k).drop("__rn")
      .collect().map(_.toString).sorted.toSeq
  }

  private def aggTopK(df: DataFrame, group: String, order: String,
      tie: String, k: Int, desc: Boolean): Seq[String] =
    GroupBy.topKPerGroup(df, Seq(group), order, tie, k, desc)
      .collect().map(_.toString).sorted.toSeq

  test("topKPerGroup ≡ window row_number on lineitem, both directions") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag").as("g"), col("l_quantity").as("v"),
        col("l_orderkey").as("id"), col("l_partkey"))
    for (desc <- Seq(true, false))
      assert(aggTopK(li, "g", "v", "id", 7, desc) ===
        windowTopK(li, "g", "v", "id", 7, desc), s"desc=$desc")
  }

  test("ties on the order key break by the tie key, ascending") {
    val df = Seq(
      ("a", 5.0, 3L), ("a", 5.0, 1L), ("a", 5.0, 2L), ("a", 4.0, 9L),
      ("b", 1.0, 2L), ("b", 1.0, 1L)).toDF("g", "v", "id")
    val got = GroupBy.topKPerGroup(df, Seq("g"), "v", "id", 2)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .sortBy(t => (t._1, -t._2, t._3)).toSeq
    assert(got === Seq(("a", 5.0, 1L), ("a", 5.0, 2L), ("b", 1.0, 1L), ("b", 1.0, 2L)))
  }

  test("k larger than the group returns the whole group; nulls are excluded") {
    val df = Seq(
      ("a", Some(2.0), Some(1L)), ("a", None, Some(2L)),
      ("a", Some(3.0), None), ("b", Some(1.0), Some(4L)))
      .toDF("g", "v", "id")
    val got = aggTopK(df, "g", "v", "id", 100, desc = true)
    assert(got === windowTopK(df, "g", "v", "id", 100, desc = true))
    assert(got.size === 2) // the null-order and null-tie rows dropped
  }

  test("result is invariant under input partitioning and shuffle width") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_suppkey").as("g"), col("l_extendedprice").as("v"),
        col("l_orderkey") * 10 + col("l_linenumber") as "id")
    val results = Seq(1, 7).map { parts =>
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try aggTopK(li.repartition(parts), "g", "v", "id", 3, desc = true)
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    assert(results(0) === results(1))
    assert(results(0) === windowTopK(li, "g", "v", "id", 3, desc = true))
  }

  test("output rows come back best-first within each group") {
    val df = Seq(("a", 1.0, 1L), ("a", 3.0, 2L), ("a", 2.0, 3L)).toDF("g", "v", "id")
    val got = GroupBy.topKPerGroup(df, Seq("g"), "v", "id", 2)
      .collect().map(_.getDouble(1)).toSeq
    assert(got === Seq(3.0, 2.0))
  }

  test("guards: bad k, missing columns, non-numeric order, non-integral tie") {
    val df = Seq(("a", 1.0, 1L, "x")).toDF("g", "v", "id", "s")
    assert(intercept[IllegalArgumentException](
      GroupBy.topKPerGroup(df, Seq("g"), "v", "id", 0)).getMessage.contains("k"))
    assert(intercept[IllegalArgumentException](
      GroupBy.topKPerGroup(df, Seq("g"), "nope", "id", 1)).getMessage.contains("nope"))
    assert(intercept[IllegalArgumentException](
      GroupBy.topKPerGroup(df, Seq("g"), "s", "id", 1)).getMessage.contains("numeric"))
    assert(intercept[IllegalArgumentException](
      GroupBy.topKPerGroup(df, Seq("g"), "v", "s", 1)).getMessage.contains("integral"))
  }
}
