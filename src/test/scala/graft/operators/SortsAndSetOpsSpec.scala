package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortsAndSetOpsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Some(3), "c"), (Some(1), "a"), (None, "z"), (Some(2), "b")
  ).toDF("n", "s")

  test("excel mode sorts nulls last, unix mode nulls first") {
    val excel = Sorts.sorted(df, Seq("n" -> false), "excel").select("s").as[String].collect()
    assert(excel === Array("a", "b", "c", "z"))
    val unix = Sorts.sorted(df, Seq("n" -> false), "unix").select("s").as[String].collect()
    assert(unix === Array("z", "a", "b", "c"))
  }

  test("reverse flag flips per column") {
    val out = Sorts.sorted(df, Seq("n" -> true), "unix").select("s").as[String].collect()
    assert(out === Array("c", "b", "a", "z"))
  }

  test("multi-column sort golden case (reference test_sort.py:6-27)") {
    val t = Seq((4, 2, "a"), (3, 2, "d"), (2, 1, "c"), (1, 1, "b")).toDF("A", "B", "C")
    // t.sort({"A": False}) — ascending
    assert(Sorts.sorted(t, Seq("A" -> false)).select("A").as[Int].collect()
      === Array(1, 2, 3, 4))
    // t.sort({"A": True}) — descending
    assert(Sorts.sorted(t, Seq("A" -> true)).select("A").as[Int].collect()
      === Array(4, 3, 2, 1))
    // t.sort({"B": False, "A": True}) → B [1,1,2,2], A [2,1,4,3]
    val ba = Sorts.sorted(t, Seq("B" -> false, "A" -> true))
      .select("B", "A").as[(Int, Int)].collect()
    assert(ba.map(_._1) === Array(1, 1, 2, 2))
    assert(ba.map(_._2) === Array(2, 1, 4, 3))
    // t.sort({"C": False}) → C [a,b,c,d], A [4,1,2,3], B [2,1,1,2]
    val c = Sorts.sorted(t, Seq("C" -> false))
      .select("C", "A", "B").as[(String, Int, Int)].collect()
    assert(c.map(_._1) === Array("a", "b", "c", "d"))
    assert(c.map(_._2) === Array(4, 1, 2, 3))
    assert(c.map(_._3) === Array(2, 1, 1, 2))
  }

  test("string sorts collate UCA-style, not binary (reference pyuca parity)") {
    // the reference collates every string sort with pyuca/DUCET
    // (sort_utils.py:7,141): primary = base letter, secondary =
    // diacritic, tertiary = case. Binary UTF-8 order would give
    // A < B < a < b < å < é — flagrantly different.
    val words = Seq("b", "a", "B", "A", "å", "Å", "é", "e", "f")
      .zipWithIndex.map { case (w, i) => (w, i) }.toDF("w", "i")
    val expect = Array("a", "A", "å", "Å", "b", "B", "e", "é", "f")
    for (mode <- Seq("excel", "unix", "alphanumeric")) {
      val got = Sorts.sorted(words, Seq("w" -> false), mode)
        .select("w").as[String].collect()
      assert(got === expect, s"mode=$mode")
      val rev = Sorts.sorted(words, Seq("w" -> true), mode)
        .select("w").as[String].collect()
      assert(rev === expect.reverse, s"mode=$mode reverse")
    }
    // reference test_sort.py:22-27 ascii golden (trivial under any
    // collation — kept as the direct reference vector)
    val t = Seq(("a", 4), ("d", 3), ("c", 2), ("b", 1)).toDF("C", "A")
    assert(Sorts.sorted(t, Seq("C" -> false)).select("A").as[Int].collect() === Array(4, 1, 2, 3))
    // isSorted agrees with sorted under collation
    assert(Sorts.isSorted(
      Sorts.sorted(words, Seq("w" -> false), "excel"), Seq("w" -> false), "excel"))
    assert(!Sorts.isSorted(
      words.orderBy($"w"), Seq("w" -> false), "excel")) // binary order is NOT collated order
  }

  test("isSorted detects order and disorder") {
    val sortedDf = Seq(1, 2, 3).toDF("n")
    val unsortedDf = Seq(2, 1, 3).toDF("n")
    assert(Sorts.isSorted(sortedDf, Seq("n" -> false)))
    assert(!Sorts.isSorted(unsortedDf, Seq("n" -> false)))
    assert(Sorts.isSorted(unsortedDf.orderBy("n"), Seq("n" -> false)))
  }

  test("concat requires identical columns; stack pads missing with null") {
    val a = Seq((1, "x")).toDF("id", "v")
    val b = Seq(2).toDF("id")
    intercept[IllegalArgumentException](SetOps.concat(a, b))
    val st = SetOps.stack(a, b)
    assert(st.count() === 2)
    assert(st.filter($"id" === 2).select("v").as[Option[String]].head() === None)
  }

  test("repeatTable repeats rows n times") {
    assert(SetOps.repeatTable(Seq(1, 2).toDF("x"), 3).count() === 6)
  }

  test("diff marks added/removed/kept rows") {
    val a = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val b = Seq((2, "b"), (3, "c")).toDF("k", "v")
    val m = SetOps.diff(a, b).collect()
      .map(r => r.getInt(0) -> r.getAs[String]("marker")).toMap
    assert(m === Map(1 -> "-", 2 -> "=", 3 -> "+"))
  }

  test("diff multiset totals match the reference's row-level counts (test_table_diff.py)") {
    // t1 = 10 rows, t2 = t3+t1+t3 = 24 rows; reference asserts:
    // '=' rows == len(t1)=10, total == len(t2)=24, '-' rows == 14
    val s1 = Seq(1, 2, 3, 4, 5, 1, 2, 3, 4, 5)
    val s2 = Seq(2, 2, 2, 2, 3, 3, 3, 3, 4, 4)
    val s3 = Seq(1, 1, 1, 1, 1, 1, 1)
    val t1 = s1.zip(s2).toDF("A", "B")
    val t2 = ((s3.map(x => (x, x))) ++ s1.zip(s2) ++ s3.map(x => (x, x))).toDF("A", "B")
    val d = SetOps.diff(t1, t2)
    val (common, onlyB, totalB) = d.select(
      sum(least($"count_a", $"count_b")),
      sum(greatest($"count_b" - $"count_a", lit(0L))),
      sum($"count_b")).as[(Long, Long, Long)].head()
    assert(common === s1.length) // all of t1 appears in t2
    assert(onlyB === t2.count() - t1.count())
    assert(totalB === 24L)
  }

  test("reindex gathers rows by position (test_indexing_functions.py:4-10)") {
    val t = Seq(("c", 3, 0L), ("b", 2, 1L), ("a", 1, 2L)).toDF("k", "n", "ord")
    val positions = Seq((0L, 2L), (1L, 1L), (2L, 0L)).toDF("out_ord", "pos")
    val out = Sorts.reindex(t, positions, "pos", "ord")
      .orderBy("out_ord").select("n").as[Int].collect()
    assert(out === Array(1, 2, 3))
  }

  test("Tab.reindex facade: core.py:375-392 examples (subset + interleave)") {
    val t = graft.Tab(Seq("a", "b", "c", "d", "e", "f", "g", "h").zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("v", "ord"))
    // index [0,2,4,6] -> a,c,e,g (the docstring's first example labels
    // the VALUES it keeps; positions are 0-based row numbers)
    assert(t.reindex(Seq(0L, 2L, 4L, 6L), "ord").df.select("v").as[String]
      .collect().toSeq == Seq("a", "c", "e", "g"))
    // interleave example: [0,2,4,6,1,3,5,7]
    assert(t.reindex(Seq(0L, 2L, 4L, 6L, 1L, 3L, 5L, 7L), "ord").df
      .select("v").as[String].collect().toSeq ==
      Seq("a", "c", "e", "g", "b", "d", "f", "h"))
    // past-the-end positions pad null rows (reference pads None)
    val padded = t.reindex(Seq(1L, 99L), "ord").df.select("v").collect()
    assert(padded.length == 2 && padded(0).getString(0) == "b" && padded(1).isNullAt(0))
    // API-parity redirect
    intercept[UnsupportedOperationException] {
      t.replaceMissingValues(Seq("v"), "carry forward")
    }
  }

  test("drop_duplicates keep-first vectors (test_indexing_functions.py:12-27)") {
    val t = Seq((1, 4, 0), (1, 4, 1), (2, 3, 2), (2, 3, 3),
      (3, 2, 4), (3, 2, 5), (4, 1, 6), (5, 1, 7)).toDF("c1", "c2", "ord")
    // no args → all columns
    val allCols = Filters.dropDuplicatesKeepFirst(t.drop("ord").withColumn("ord", lit(0)),
      Seq("c1", "c2"), Seq("ord")).orderBy("c1").select("c1", "c2").as[(Int, Int)].collect()
    assert(allCols === Array((1, 4), (2, 3), (3, 2), (4, 1), (5, 1)))
    // by one column, keep the FIRST row's other values
    val byOne = Filters.dropDuplicatesKeepFirst(t, Seq("c1"), Seq("ord"))
      .orderBy("c1").select("c1", "c2").as[(Int, Int)].collect()
    assert(byOne === Array((1, 4), (2, 3), (3, 2), (4, 1), (5, 1)))
  }

  test("diffOrdered reproduces the reference's difflib output exactly (test_table_diff.py)") {
    val s1 = Seq(1, 2, 3, 4, 5, 1, 2, 3, 4, 5)
    val s2 = Seq(2, 2, 2, 2, 3, 3, 3, 3, 4, 4)
    val s3 = Seq(1, 1, 1, 1, 1, 1, 1)
    val t1 = s1.zip(s2).toDF("A", "B")
    val t2 = (s3.map(x => (x, x)) ++ s1.zip(s2) ++ s3.map(x => (x, x))).toDF("A", "B")
    val out = SetOps.diffOrdered(t1, t2).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3)))
    // the reference's shown table: 7 leading (-,+), 10 (=,=), 7 trailing (-,+)
    assert(out.length === 24)
    assert(out.take(7).forall { case (a, b, m1, m2) => a == 1 && b == 1 && m1 == "-" && m2 == "+" })
    assert(out.slice(7, 17).map(r => (r._1, r._2)).toSeq === s1.zip(s2))
    assert(out.slice(7, 17).forall { case (_, _, m1, m2) => m1 == "=" && m2 == "=" })
    assert(out.drop(17).forall { case (a, b, m1, m2) => a == 1 && b == 1 && m1 == "-" && m2 == "+" })
    // counts the reference asserts
    assert(out.count(_._3 == "=") === s1.length)
    assert(out.count(_._3 == "-") === t2.count() - t1.count())
  }

  test("tablesEqual is content equality over multisets") {
    val a = Seq((1, "a"), (1, "a"), (2, "b")).toDF("k", "v")
    val b = Seq((2, "b"), (1, "a"), (1, "a")).toDF("k", "v")
    val c = Seq((2, "b"), (1, "a")).toDF("k", "v")
    assert(SetOps.tablesEqual(a, b))
    assert(!SetOps.tablesEqual(a, c))
  }

  test("upsert: latest version wins, updates beat base on ties, inserts pass through") {
    val base = Seq((1L, "a", 3L), (2L, "b", 1L), (3L, "c", 1L)).toDF("k", "v", "ver")
    val upd = Seq(
      (1L, "a2", 2L),  // stale: base has ver 3 → base row survives
      (2L, "b2", 1L),  // tie: update wins
      (4L, "d", 1L)    // new key: inserted
    ).toDF("k", "v", "ver")
    val out = SetOps.upsert(base, upd, Seq("k"), "ver")
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(out === Seq((1L, "a", 3L), (2L, "b2", 1L), (3L, "c", 1L), (4L, "d", 1L)))
    // idempotent re-delivery: upserting the SAME updates again changes nothing
    val twice = SetOps.upsert(SetOps.upsert(base, upd, Seq("k"), "ver"), upd, Seq("k"), "ver")
    assert(SetOps.tablesEqual(twice, SetOps.upsert(base, upd, Seq("k"), "ver")))
    // within-side version tie breaks on the smallest remaining tuple —
    // deterministic across reruns
    val dup = Seq((9L, "zz", 1L), (9L, "aa", 1L)).toDF("k", "v", "ver")
    val pick = SetOps.upsert(base, dup, Seq("k"), "ver")
      .filter($"k" === 9L).select("v").as[String].collect()
    assert(pick === Array("aa"))
    // missing version column fails loudly
    val ex = intercept[IllegalArgumentException](
      SetOps.upsert(base, upd.drop("ver"), Seq("k"), "ver"))
    assert(ex.getMessage.contains("ver"))
  }

  test("mergeWhere coalesces by criterion") {
    val d = Seq((1, "L", "R"), (2, "l", "r")).toDF("id", "a", "b")
    val out = SetOps.mergeWhere(d, col("id") === 1, "a", "b", "m")
    assert(out.orderBy("id").select("m").as[String].collect() === Array("L", "r"))
  }

  test("slice follows python semantics incl. step") {
    val d = spark.range(10).toDF("i")
    assert(Slicing.slice(d, Seq("i"), 2, 5).select("i").as[Long].collect() === Array(2L, 3L, 4L))
    assert(Slicing.sliceStep(d, Seq("i"), 1, 8, 3).select("i").as[Long].collect() === Array(1L, 4L, 7L))
  }
}
