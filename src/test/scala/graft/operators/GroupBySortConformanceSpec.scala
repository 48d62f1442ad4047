package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden-result conformance against the reference's groupby and sort
  * suites (tests/test_groupby_and_pivot.py, tests/test_sort.py). The
  * groupby golden runs ALL accumulators at once over the doubled
  * 5-column table exactly as the reference does, and uses the
  * firstSeenOrder parity mode to reproduce the reference's ordered
  * emission, so the row LIST (not just the multiset) must match.
  */
class GroupBySortConformanceSpec extends SparkSpec {
  import spark.implicits._

  test("groupby golden: all accumulators over the doubled table " +
      "(test_groupby_and_pivot.py:14-82)") {
    // t: columns a..e = 0..4; f = a+b+c+1; g = b*c*d; then t += t
    val base = (0 until 5).map(i => (i, i, i, i, i, i + i + i + 1, i * i * i))
    val rows = (base ++ base).zipWithIndex.map { case (r, ix) =>
      (r._1, r._2, r._3, r._4, r._5, r._6, r._7, ix.toLong)
    }
    val t = rows.toDF("a", "b", "c", "d", "e", "f", "g", "ord").repartition(3)
    val out = GroupBy.groupby(t, Seq("a", "b"), Seq(
      "f" -> "Max", "f" -> "Min", "f" -> "Sum", "f" -> "Product",
      "f" -> "First", "f" -> "Last", "f" -> "Count", "f" -> "CountUnique",
      "f" -> "Average", "f" -> "StandardDeviation", "a" -> "StandardDeviation",
      "f" -> "Median", "f" -> "Mode", "g" -> "Median"),
      orderCol = "ord", firstSeenOrder = true)
    assert(out.columns.toSeq === Seq("a", "b", "Max(f)", "Min(f)", "Sum(f)",
      "Product(f)", "First(f)", "Last(f)", "Count(f)", "CountUnique(f)",
      "Average(f)", "StandardDeviation(f)", "StandardDeviation(a)",
      "Median(f)", "Mode(f)", "Median(g)"))
    val got = out.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4),
        r.getDouble(5), r.getInt(6), r.getInt(7), r.getLong(8), r.getLong(9),
        r.getDouble(10), r.getDouble(11), r.getDouble(12), r.getDouble(13),
        r.getInt(14), r.getDouble(15))).toSeq
    val want = Seq(
      (0, 0, 1, 1, 2.0, 1.0, 1, 1, 2L, 1L, 1.0, 0.0, 0.0, 1.0, 1, 0.0),
      (1, 1, 4, 4, 8.0, 16.0, 4, 4, 2L, 1L, 4.0, 0.0, 0.0, 4.0, 4, 1.0),
      (2, 2, 7, 7, 14.0, 49.0, 7, 7, 2L, 1L, 7.0, 0.0, 0.0, 7.0, 7, 8.0),
      (3, 3, 10, 10, 20.0, 100.0, 10, 10, 2L, 1L, 10.0, 0.0, 0.0, 10.0, 10, 27.0),
      (4, 4, 13, 13, 26.0, 169.0, 13, 13, 2L, 1L, 13.0, 0.0, 0.0, 13.0, 13, 64.0))
    // firstSeenOrder reproduces the reference's ordered emission: the
    // LIST matches, not just the set
    assert(got === want)
  }

  test("groupby missing-args contract (test_groupby_and_pivot.py:87-117)") {
    val t = ((1 to 2).flatMap(_ => Seq((1, 1), (1, 2), (2, 3), (2, 4), (3, 5), (3, 6))))
      .zipWithIndex.map { case ((a, b), ix) => (a, b, ix.toLong) }
      .toDF("A", "B", "ord")
    // no keys, no functions → error
    intercept[IllegalArgumentException] { GroupBy.groupby(t, Nil, Nil) }
    // keys=[] + Sum → one total row
    val g0 = GroupBy.groupby(t, Nil, Seq("A" -> "Sum")).collect()
    assert(g0.length === 1 && g0(0).getDouble(0) === 24.0)
    // keys only → distinct key combinations (first-seen ordered)
    val g1 = GroupBy.groupby(t, Seq("A"), Nil, orderCol = "ord",
      firstSeenOrder = true).collect().map(_.getInt(0)).toSeq
    assert(g1 === Seq(1, 2, 3))
    val g2 = GroupBy.groupby(t, Seq("A", "B"), Nil, orderCol = "ord",
      firstSeenOrder = true).collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(g2 === Seq((1, 1), (1, 2), (2, 3), (2, 4), (3, 5), (3, 6)))
    // key + count
    val g3 = GroupBy.groupby(t, Seq("A"), Seq("A" -> "Count"), orderCol = "ord",
      firstSeenOrder = true).collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(g3 === Seq((1, 4L), (2, 4L), (3, 4L)))
  }

  test("sort goldens: single, reversed, multi-key, string collation " +
      "(test_sort.py:6-27)") {
    val t = Seq((4, 2, "a"), (3, 2, "d"), (2, 1, "c"), (1, 1, "b")).toDF("A", "B", "C")
    def colA(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.getInt(0)).toSeq
    assert(colA(Sorts.sorted(t, Seq("A" -> false))) === Seq(1, 2, 3, 4))
    assert(colA(Sorts.sorted(t, Seq("A" -> true))) === Seq(4, 3, 2, 1))
    val multi = Sorts.sorted(t, Seq("B" -> false, "A" -> true)).collect()
      .map(r => (r.getInt(1), r.getInt(0))).toSeq
    assert(multi === Seq((1, 2), (1, 1), (2, 4), (2, 3)))
    val byC = Sorts.sorted(t, Seq("C" -> false)).collect()
      .map(r => (r.getString(2), r.getInt(0), r.getInt(1))).toSeq
    assert(byC === Seq(("a", 4, 2), ("b", 1, 1), ("c", 2, 1), ("d", 3, 2)))
    val byCRev = Sorts.sorted(t, Seq("C" -> true)).collect()
      .map(r => (r.getString(2), r.getInt(0))).toSeq
    assert(byCRev === Seq(("d", 3), ("c", 2), ("b", 1), ("a", 4)))
  }
}
