package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class GroupBySpec extends SparkSpec {
  import spark.implicits._

  // golden cases per nimlite/funcs/groupby.nim accumulator semantics
  private def df = Seq(
    ("g1", Some(4.0), 1), ("g1", Some(2.0), 2), ("g1", None, 3),
    ("g2", Some(10.0), 1)
  ).toDF("g", "v", "ord")

  private def agg1(fn: String): Map[String, Any] =
    GroupBy.groupby(df, Seq("g"), Seq("v" -> fn), orderCol = "ord")
      .collect().map(r => r.getString(0) -> r.get(1)).toMap

  test("Max/Min ignore nulls") {
    assert(agg1("Max") === Map("g1" -> 4.0, "g2" -> 10.0))
    assert(agg1("Min") === Map("g1" -> 2.0, "g2" -> 10.0))
  }

  test("Sum is float-typed") { assert(agg1("Sum") === Map("g1" -> 6.0, "g2" -> 10.0)) }

  test("Count counts rows INCLUDING nulls (groupby.nim:185-197)") {
    assert(agg1("Count") === Map("g1" -> 3L, "g2" -> 1L))
  }

  test("CountUnique counts null as a distinct value (groupby.nim:200-214)") {
    assert(agg1("CountUnique") === Map("g1" -> 3L, "g2" -> 1L))
  }

  test("StandardDeviation is sample stdev, 0.0 for n<=1 (groupby.nim:243-277)") {
    val out = agg1("StandardDeviation")
    assert(math.abs(out("g1").asInstanceOf[Double] - math.sqrt(2.0)) < 1e-12)
    assert(out("g2") === 0.0)
  }

  test("First/Last follow the explicit order column, nulls included in position") {
    assert(agg1("First") === Map("g1" -> 4.0, "g2" -> 10.0))
    // Last by ord: g1 row ord=3 has null v; max_by skips null? document: picks last non-null
    val last = agg1("Last")
    assert(last("g2") === 10.0)
  }

  test("groupby with no functions returns distinct keys (groupby.nim:608-620)") {
    assert(GroupBy.groupby(df, Seq("g"), Nil).count() === 2)
  }

  test("firstSeenOrder=true emits groups in first-appearance order (groupby.nim:588-689)") {
    // keys first seen in order zz(1), aa(2), mm(4) — lexical order would be aa,mm,zz
    val d = Seq(("zz", 1.0, 1), ("aa", 2.0, 2), ("zz", 3.0, 3), ("mm", 4.0, 4),
      ("aa", 5.0, 5)).toDF("g", "v", "ord").repartition(4)
    val agg = GroupBy.groupby(d, Seq("g"), Seq("v" -> "Sum"), orderCol = "ord",
      firstSeenOrder = true)
    assert(agg.columns.toSeq === Seq("g", "Sum(v)"))
    assert(agg.collect().map(_.getString(0)).toSeq === Seq("zz", "aa", "mm"))
    // no-functions form too
    val keys = GroupBy.groupby(d, Seq("g"), Nil, orderCol = "ord",
      firstSeenOrder = true)
    assert(keys.collect().map(_.getString(0)).toSeq === Seq("zz", "aa", "mm"))
  }

  test("firstSeenOrder without orderCol fails loudly") {
    val e = intercept[IllegalArgumentException] {
      GroupBy.groupby(df, Seq("g"), Seq("v" -> "Sum"), firstSeenOrder = true)
    }
    assert(e.getMessage.contains("orderCol"))
  }

  test("output naming is Function(column) (groupby.nim:677-679)") {
    val out = GroupBy.groupby(df, Seq("g"), Seq("v" -> "Sum", "v" -> "Average"))
    assert(out.columns.toSeq === Seq("g", "Sum(v)", "Average(v)"))
  }

  test("statistics returns the reference stat block") {
    val st = GroupBy.statistics(df.filter($"v".isNotNull), "v").collect().head
    assert(st.getAs[Double]("min") === 2.0)
    assert(st.getAs[Double]("max") === 10.0)
    assert(st.getAs[Long]("summary_length") === 3L)
  }

  test("summary statistics golden vector [1,2,3] (test_api_basics.py:662-681)") {
    val t = Seq(1, 2, 3).toDF("a")
    val st = GroupBy.statistics(t, "a").collect().head
    assert(st.getAs[Int]("min") === 1)
    assert(st.getAs[Int]("max") === 3)
    assert(st.getAs[Double]("mean") === 2.0)
    assert(st.getAs[Double]("median") === 2.0)
    assert(st.getAs[Double]("stdev") === 1.0)
    assert(st.getAs[Int]("mode") === 1)
    assert(st.getAs[Double]("sum") === 6.0)
    assert(st.getAs[Long]("distinct") === 3L)
    // quartile method divergence (documented): continuous percentile
    // gives 1.5/2.5/1.0 where the reference's count-threshold gives 1/3/2
    assert(st.getAs[Double]("iqr_low") === 1.5)
    assert(st.getAs[Double]("iqr_high") === 2.5)
    assert(st.getAs[Double]("iqr") === 1.0)
  }

  test("histogram preserves value counts") {
    val h = GroupBy.histogram(df, "v").collect()
      .map(r => Option(r.get(0)) -> r.getLong(1)).toMap
    assert(h(Some(4.0)) === 1L)
    assert(h(None) === 1L)
  }

  test("groupQuantiles: hand-computed interpolated quantiles per group") {
    import spark.implicits._
    // group a: [10,20,30,40] → p=.5: pos 1.5 → 25; p=.25: pos .75 → 17.5
    val df2 = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", 40.0), ("b", 7.0))
      .toDF("g", "x")
    val out = GroupBy.groupQuantiles(df2, Seq("g"), "x", Seq(0.25, 0.5, 1.0))
      .as[(String, Double, Double)].collect().toSet
    assert(out === Set(("a", 0.25, 17.5), ("a", 0.5, 25.0), ("a", 1.0, 40.0),
      ("b", 0.25, 7.0), ("b", 0.5, 7.0), ("b", 1.0, 7.0)))
  }

  test("heavyHitters: exact top-k by count, deterministic tie order, fracs sum right") {
    import spark.implicits._
    val df2 = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d"))
      .toDF("k")
    val out = GroupBy.heavyHitters(df2, Seq("k"), k = 3)
      .as[(String, Long, Double)].collect().toSeq
    assert(out === Seq(("a", 5L, 5.0 / 12), ("b", 3L, 3.0 / 12), ("c", 3L, 3.0 / 12)))
  }

  test("correlation: perfect +/- correlations and the upper triangle only") {
    import spark.implicits._
    val df2 = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0))
      .toDF("x", "y", "z")
    val out = GroupBy.correlation(df2, Seq("x", "y", "z"))
      .as[(String, String, Double)].collect().toSet
    assert(out.map(r => (r._1, r._2, math.round(r._3 * 1e9) / 1e9)) === Set(
      ("x", "y", 1.0), ("x", "z", -1.0), ("y", "z", -1.0)))
  }

  test("binnedHistogram: exact edges, clamped overflow, zero-count bins, nulls dropped") {
    import spark.implicits._
    val data = Seq[java.lang.Double](-5.0, 0.0, 9.9, 10.0, 25.0, 25.0, 95.0, 200.0, null)
      .toDF("x")
    val h = GroupBy.binnedHistogram(data, "x", lo = 0.0, hi = 100.0, nBins = 10)
      .orderBy("bin").as[(Long, Double, Double, Long)].collect()
    assert(h.length === 10)
    assert(h.map(_._1).toSeq === (0L until 10L))
    assert(h.head === ((0L, 0.0, 10.0, 3L)))   // -5 clamps in; 0.0, 9.9
    assert(h(1) === ((1L, 10.0, 20.0, 1L)))    // 10.0 lands in [10,20)
    assert(h(2)._4 === 2L)                     // the two 25s
    assert(h(9) === ((9L, 90.0, 100.0, 2L)))   // 95 + 200-clamped
    assert(h.map(_._4).sum === 8L)             // null never counted
    assert(h(5)._4 === 0L)                     // empty bin emitted as 0
  }

  test("statisticsRef reproduces the reference summary EXACTLY (test_api_basics.py:662-681)") {
    val t = Seq(1, 2, 3).toDF("a")
    val st = GroupBy.statisticsRef(t, "a").collect().head
    assert(st.getAs[Int]("min") === 1)
    assert(st.getAs[Int]("max") === 3)
    assert(st.getAs[Double]("mean") === 2.0)
    assert(st.getAs[Double]("median") === 2.0)
    assert(st.getAs[Double]("stdev") === 1.0)
    assert(st.getAs[Int]("mode") === 1)
    assert(st.getAs[Double]("iqr_low") === 1.0)  // count-threshold, not 1.5
    assert(st.getAs[Double]("iqr_high") === 3.0) // count-threshold, not 2.5
    assert(st.getAs[Double]("iqr") === 2.0)
    assert(st.getAs[Double]("sum") === 6.0)
    assert(st.getAs[Long]("distinct") === 3L)
    // interpolation branch: [1,2,3,4] median lands ON the threshold
    val st4 = GroupBy.statisticsRef(Seq(1, 2, 3, 4).toDF("a"), "a").collect().head
    assert(st4.getAs[Double]("median") === 2.5)
    // mode tie → smallest value (summary scan), not largest (groupby)
    val stTie = GroupBy.statisticsRef(Seq(1, 1, 9, 9).toDF("a"), "a").collect().head
    assert(stTie.getAs[Int]("mode") === 1)
  }

  test("approx_count_distinct (HLL extension) lands within rsd of exact") {
    import org.apache.spark.sql.functions.{approx_count_distinct, col, count_distinct}
    val ids = spark.range(100000).select((col("id") % 9973).as("k"))
    val (approx, exact) = ids.select(
      approx_count_distinct(col("k"), rsd = 0.02).as("a"),
      count_distinct(col("k")).as("e"))
      .as[(Long, Long)].collect().head
    assert(exact === 9973L)
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx")
  }

  test("profile: one row per atomic column, exact nulls/distinct/min/max") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(1.5), Seq(1, 2)),
      (2L, None, Some(2.5), Seq(3)),
      (2L, Some("c"), None, Seq.empty[Int])
    ).toDF("id", "s", "x", "arr")
    val p = GroupBy.profile(df, exact = true).collect()
      .map(r => r.getString(0) -> r).toMap
    // array column skipped
    assert(p.keySet === Set("id", "s", "x"))
    val id = p("id")
    assert(id.getString(1) === "bigint" && id.getLong(2) === 3L &&
      id.getLong(3) === 0L && id.getLong(4) === 2L &&
      id.getString(5) === "1" && id.getString(6) === "2")
    val s = p("s")
    assert(s.getLong(3) === 1L && s.getLong(4) === 2L &&
      s.getString(5) === "a" && s.getString(6) === "c")
    val x = p("x")
    assert(x.getLong(3) === 1L && x.getLong(4) === 2L)
    // approx mode: same shape, distinct within HLL tolerance
    val ap = GroupBy.profile(df).collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(math.abs(ap("id") - 2L) <= 1)
  }
}
