package graft.plans

import graft.SparkSpec
import graft.operators.GroupBy
import org.apache.spark.sql.functions._

/** Exact-parity vectors pinned by the reference's own test suite
  * (tests/test_groupby_and_pivot.py:387-432).
  */
class RefAggregatesSpec extends SparkSpec {
  import spark.implicits._

  private def median(vals: Seq[Double], parts: Int = 1): Any =
    vals.toDF("v").repartition(parts)
      .agg(RefAggregates.refMedian($"v").as("m")).collect()(0).get(0)

  test("reference median vectors (distinct-parity semantics)") {
    val cases: Seq[(Seq[Double], Double)] = Seq(
      (Seq(1, 2, 3, 4, 5).map(_.toDouble), 3.0),
      (Seq(1, 2, 3, 6, 7, 8).map(_.toDouble), 4.5),
      (Seq(3.0), 3.0),
      (Seq(3.0, 3.0), 3.0),              // 1 distinct → the value
      (Seq(3.0, 3.0, 3.0), 3.0),
      (Seq(3, 3, 6, 6, 9, 9).map(_.toDouble), 6.0),  // 3 distinct (odd) → 6
      (Seq(3, 3, 3, 9, 9, 9).map(_.toDouble), 6.0),  // 2 distinct (even) → (3+9)/2
      (Seq(-1, -1, 0, 1, 1).map(_.toDouble), 0.0),
      (Seq(-1, -1, 0, 0, 1, 1).map(_.toDouble), 0.0),
      (Seq(5, 4, 6, 3, 7, 2, 8, 1, 9).map(_.toDouble), 5.0),
      ((0 until 10).map(_ / 10.0), 0.45),
      ((1 until 10).map(_ / 10.0), 0.5))
    for ((vals, want) <- cases) {
      assert(median(vals) === want, s"median($vals)")
      assert(median(vals, parts = 7) === want, s"median($vals) over 7 partitions")
    }
  }

  test("median divergence case: first distinct value crosses the midpoint") {
    // the reference dereferences an undefined predecessor here (crash);
    // we define it as the straddling value itself
    assert(median(Seq(1.0, 1.0, 2.0)) === 1.0)
  }

  test("median of empty/all-null input is null") {
    assert(median(Seq.empty[Double]) === null)
    val withNulls = Seq[java.lang.Double](null, null).toDF("v")
      .agg(RefAggregates.refMedian($"v")).collect()(0).get(0)
    assert(withNulls === null)
  }

  test("reference mode: most frequent, count ties break to largest value") {
    def mode[T](df: org.apache.spark.sql.DataFrame): Any =
      df.agg(RefAggregates.refMode(col("v"))).collect()(0).get(0)
    assert(mode(Seq(1, 1, 2, 2, 3).toDF("v")) === 2)           // tie 1/2 → larger
    assert(mode(Seq("a", "a", "b", "b").toDF("v")) === "b")    // string tie → larger
    assert(mode(Seq(5, 5, 5, 9).toDF("v")) === 5)              // plain majority
    assert(mode(Seq.empty[Int].toDF("v")) === null)
    val nullsIgnored = Seq[Integer](7, null, null, null, 7, 3).toDF("v")
    assert(mode(nullsIgnored) === 7)                            // nulls not counted
  }

  test("RefMedian/RefMode via GroupBy accumulators and SQL registration") {
    val df = Seq((1, 3.0, "x"), (1, 3.0, "y"), (1, 9.0, "y"), (1, 9.0, "z"),
      (2, 1.0, "a"), (2, 2.0, "a")).toDF("k", "v", "s")
    val out = GroupBy.groupby(df, Seq("k"),
      Seq("v" -> "RefMedian", "s" -> "RefMode"))
      .orderBy("k").collect()
    assert(out(0).getDouble(1) === 6.0)  // {3:2, 9:2} even distinct → (3+9)/2
    assert(out(0).getString(2) === "y")
    assert(out(1).getDouble(1) === 1.5)  // {1,2} even distinct → 1.5
    assert(out(1).getString(2) === "a")

    GraftExtensions.register(spark)
    df.createOrReplaceTempView("ref_agg_t")
    val viaSql = spark.sql(
      "SELECT graft_ref_median(v), graft_ref_mode(s) FROM ref_agg_t WHERE k = 1")
      .collect()(0)
    assert(viaSql.getDouble(0) === 6.0 && viaSql.getString(1) === "y")
  }

  test("HistMedian matches percentile(0.5) semantics (and is the Median default)") {
    def both(vals: Seq[Double], parts: Int): (Any, Any) = {
      val df = vals.toDF("v").repartition(parts)
      (df.agg(RefAggregates.histMedian($"v")).collect()(0).get(0),
       df.agg(percentile($"v", lit(0.5))).collect()(0).get(0))
    }
    val cases = Seq(
      Seq(1, 2, 3, 4, 5).map(_.toDouble),            // odd n → middle
      Seq(1, 2, 3, 6, 7, 8).map(_.toDouble),         // even n → mean of middles
      Seq(3, 3, 6, 6, 9, 9).map(_.toDouble),         // multiplicities (vs RefMedian's 6.0)
      Seq(3, 3, 3, 9, 9, 9).map(_.toDouble),
      Seq(1.0, 1.0, 2.0),                            // both middles in one entry
      Seq(5.0),
      Seq(-1, -1, 0, 1, 1).map(_.toDouble),
      (0 until 101).map(_.toDouble))
    for (vals <- cases; parts <- Seq(1, 7)) {
      val (h, p) = both(vals, parts)
      assert(h === p, s"histMedian($vals, parts=$parts)")
    }
    assert(Seq.empty[Double].toDF("v").agg(RefAggregates.histMedian($"v"))
      .collect()(0).get(0) === null)
    // the GroupBy "Median" accumulator routes to the histogram aggregate
    val grouped = GroupBy.groupby(
      Seq((1, 1.0), (1, 2.0), (1, 3.0), (2, 4.0), (2, 8.0)).toDF("k", "v"),
      Seq("k"), Seq("v" -> "Median")).orderBy("k").collect()
    assert(grouped(0).getDouble(1) === 2.0 && grouped(1).getDouble(1) === 6.0)
  }

  test("HistMedian primitive buffer: dup-heavy growth, NaN coalescing, shuffle roundtrip") {
    // 10k rows, 100 distinct values, 9 partitions — merge + serialize
    // paths all exercised; the open-address map must agree with percentile
    val dupes = spark.range(10000).selectExpr("cast(id % 100 AS double) AS v")
      .repartition(9)
    val h = dupes.agg(RefAggregates.histMedian($"v")).collect()(0).getDouble(0)
    val p = dupes.agg(percentile($"v", lit(0.5))).collect()(0).getDouble(0)
    assert(h === p)
    // NaN keys coalesce into ONE trailing entry (open addressing can't
    // probe NaN; the boxed map coalesced via Double.equals) and sort
    // after every real value, Java-style
    val withNan = Seq(1.0, 2.0, Double.NaN, Double.NaN, Double.NaN).toDF("v")
      .repartition(3)
    val m = withNan.agg(RefAggregates.histMedian($"v")).collect()(0).getDouble(0)
    // sorted [1, 2, NaN{3}]: n=5, rank 3 falls in the NaN entry
    assert(m.isNaN)
    // all-NaN input still answers (single coalesced entry)
    assert(Seq(Double.NaN, Double.NaN).toDF("v")
      .agg(RefAggregates.histMedian($"v")).collect()(0).getDouble(0).isNaN)
  }
}
