package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (Some(1), "l1"), (Some(2), "l2"), (None, "lnull")
  ).toDF("k", "lval")
  private def right = Seq(
    (Some(1), "r1"), (Some(3), "r3"), (None, "rnull")
  ).toDF("k", "rval")

  test("inner join matches NULL keys to NULL keys (reference dict equality)") {
    val out = Joins.join(left, right, Seq("k"), Seq("k"), "inner")
    assert(out.count() === 2) // 1↔1 and null↔null
    assert(out.filter($"lval" === "lnull" && $"rval" === "rnull").count() === 1)
  }

  test("right column-name collisions get _1 suffix") {
    val out = Joins.join(left, right, Seq("k"), Seq("k"), "inner")
    assert(out.columns.toSeq === Seq("k", "lval", "k_1", "rval"))
  }

  test("outer join with merge_keys coalesces the key and drops the dup") {
    val out = Joins.join(left, right, Seq("k"), Seq("k"), "outer", mergeKeys = true)
    assert(out.columns.toSeq === Seq("k", "lval", "rval"))
    assert(out.count() === 4) // 1, 2, null, 3
    assert(out.filter($"rval" === "r3" && $"lval".isNull).select("k").as[Option[Int]].head() === Some(3))
  }

  test("lookup returns first theta-match per left row, NULLs when unmatched") {
    val l = Seq((10, "a"), (5, "b"), (1, "c")).toDF("limit", "name")
    val r = Seq((3, "x"), (7, "y"), (8, "z")).toDF("size", "tag")
    val out = Joins.lookup(l, r, (_, _) => col("l.limit") > col("r.size"),
      rightOrder = "size")
    val byName = out.collect().map(row => row.getAs[String]("name") ->
      Option(row.getAs[String]("tag"))).toMap
    assert(byName("a") === Some("x")) // first of x,y,z below 10 by size order
    assert(byName("b") === Some("x"))
    assert(byName("c") === None)
  }

  test("matchOp keeps only matching left rows with first right match") {
    val l = Seq((1, "a"), (2, "b"), (9, "c")).toDF("k", "lv")
    val r = Seq((1, 2, "second"), (1, 1, "first"), (2, 1, "only")).toDF("k", "ord", "rv")
    val out = Joins.matchOp(l, r, Seq("k"), Seq("k"), rightOrder = "ord")
    assert(out.count() === 2) // k=9 dropped
    assert(out.filter($"k" === 1).select("rv").as[String].head() === "first")
  }

  test("saltedJoin returns exactly the rows of the plain join") {
    val l = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d")).toDF("k", "lv")
    val r = Seq((1, "X"), (2, "Y"), (3, "Z")).toDF("k", "rv")
    val plain = Joins.join(l, r, Seq("k"), Seq("k"), "inner")
      .collect().map(_.toString).sorted
    val salted = Joins.saltedJoin(l, r, Seq("k"), Seq("k"), "inner", buckets = 4)
      .collect().map(_.toString).sorted
    assert(salted === plain)
  }

  test("bloomPruneJoin equals the plain inner join (long and string keys)") {
    val large = (1 to 2000).map(i => (i.toLong, s"row$i")).toDF("k", "lv")
    val small = Seq((5L, "A"), (700L, "B"), (9999L, "C")).toDF("k", "rv")
    val plain = Joins.join(large, small, Seq("k"), Seq("k"), "inner")
      .collect().map(_.toString).sorted
    val bloomed = Joins.bloomPruneJoin(large, small, "k", "k")
      .collect().map(_.toString).sorted
    assert(bloomed === plain)
    assert(bloomed.length === 2)

    val largeS = (1 to 500).map(i => (s"key$i", i)).toDF("k", "lv")
    val smallS = Seq(("key7", 1), ("key444", 2)).toDF("k", "rv")
    val plainS = Joins.join(largeS, smallS, Seq("k"), Seq("k"), "inner")
      .collect().map(_.toString).sorted
    assert(Joins.bloomPruneJoin(largeS, smallS, "k", "k")
      .collect().map(_.toString).sorted === plainS)
  }

  test("bloom predicate actually prunes the large side before the join") {
    val large = (1 to 10000).map(i => (i.toLong, i.toString)).toDF("k", "lv")
    val small = Seq(42L, 4242L).toDF("k")
    val bloom = small.stat.bloomFilter("k", 2, 0.01)
    val survivors = large
      .filter(graft.plans.Kernels.bloomMightContain($"k", bloom)).count()
    // 0.01 fpp over 10k rows → ~100 expected FPs; 1000 is a 10x-safe bound
    assert(survivors >= 2 && survivors < 1000)
    // semi kind: pruned left-semi equals plain left-semi
    val semi = Joins.bloomPruneJoin(large, small.toDF("k"), "k", "k", kind = "semi")
    assert(semi.collect().map(_.getLong(0)).sorted === Array(42L, 4242L))
  }

  test("tutorial join-logic golden multisets (test_new_tutorial.py:340-460)") {
    val numbers = Seq(
      (Option(1), "black"), (Option(2), "blue"), (Option(3), "white"),
      (Option(4), "white"), (Option.empty[Int], "blue")).toDF("number", "colour")
    val letters = Seq(
      (Option("a"), "blue"), (Option("b"), "white"), (Option("c"), "orange"),
      (Option("d"), "white"), (Option.empty[String], "blue")).toDF("letter", "color")
    def rows(kind: String): Seq[(Option[Int], Option[String])] =
      Joins.join(numbers, letters, Seq("colour"), Seq("color"), kind,
        leftColumns = Some(Seq("number")), rightColumns = Some(Seq("letter")))
        .collect().map(r =>
          (if (r.isNullAt(0)) None else Some(r.getInt(0)), Option(r.getString(1))))
        .toSeq.sortBy(t => (t._1.getOrElse(-1), t._2.getOrElse("")))
    val leftExpected = Seq(
      (Some(1), None), (Some(2), Some("a")), (Some(2), None), (None, Some("a")),
      (None, None), (Some(3), Some("b")), (Some(3), Some("d")),
      (Some(4), Some("b")), (Some(4), Some("d")))
      .sortBy(t => (t._1.getOrElse(-1), t._2.getOrElse("")))
    assert(rows("left") === leftExpected)
    assert(rows("inner") === leftExpected.filterNot(_ == ((Some(1), None))))
    assert(rows("full") === (leftExpected :+ ((None, Some("c"))))
      .sortBy(t => (t._1.getOrElse(-1), t._2.getOrElse(""))))
  }

  test("uniqueName suffixes until free") {
    assert(Joins.uniqueName("a", Set("a", "a_1")) === "a_2")
    assert(Joins.uniqueName("b", Set("a")) === "b")
  }

  test("rangeJoin equals the naive theta join; nulls and inverted intervals drop") {
    val rnd = new scala.util.Random(3)
    val pts = Seq.tabulate(300)(i =>
      (i.toLong, if (i % 29 == 0) None else Some(rnd.nextInt(1000).toDouble)))
      .toDF("pid", "x")
    val ivs = Seq.tabulate(60) { i =>
      val lo = rnd.nextInt(950).toDouble
      // every few intervals inverted (lo > hi) or null-bounded — must match nothing
      if (i % 13 == 0) (i.toLong, Some(lo), Some(lo - 5.0))
      else if (i % 17 == 0) (i.toLong, None: Option[Double], Some(lo))
      else (i.toLong, Some(lo), Some(lo + rnd.nextInt(120).toDouble))
    }.toDF("iid", "lo", "hi")
    val banded = Joins.rangeJoin(pts, ivs, "x", "lo", "hi", bandWidth = 40L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = pts.join(ivs, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(banded === naive)
    assert(naive.nonEmpty, "degenerate fixture: no matches at all")
  }

  test("rangeJoin with extra equi-keys restricts pairs; colliding names get _1") {
    val pts = Seq((1L, "a", 5.0), (2L, "b", 5.0)).toDF("pid", "g", "x")
    val ivs = Seq((10L, "a", 0.0, 9.0), (11L, "b", 0.0, 9.0), (12L, "a", 6.0, 9.0))
      .toDF("pid", "g", "lo", "hi") // pid/g collide with the point side
    val out = Joins.rangeJoin(pts, ivs, "x", "lo", "hi", bandWidth = 4L,
      pointKeys = Seq("g"), intervalKeys = Seq("g"))
    assert(out.columns.contains("pid_1") && out.columns.contains("g_1"))
    val pairs = out.select(col("pid"), col("pid_1")).as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 10L), (2L, 11L)))
  }

  test("intervalJoin equals the naive theta overlap join, each pair exactly once") {
    val rnd = new scala.util.Random(41)
    val as = (0 until 120).map { i =>
      val lo = rnd.nextInt(500).toDouble; (i.toLong, lo, lo + rnd.nextInt(90))
    }.toDF("aid", "alo", "ahi")
    val bs = (0 until 80).map { i =>
      val lo = rnd.nextInt(500).toDouble; (i.toLong, lo, lo + rnd.nextInt(90))
    }.toDF("bid", "blo", "bhi")
    val got = Joins.intervalJoin(as, bs, "alo", "ahi", "blo", "bhi", bandWidth = 32L)
      .select(col("aid"), col("bid")).as[(Long, Long)].collect()
    // exactly once: no pair may appear twice despite multi-band overlap
    assert(got.length === got.toSet.size, "duplicate pairs emitted")
    val want = as.join(bs, col("alo") <= col("bhi") && col("blo") <= col("ahi"))
      .select(col("aid"), col("bid")).as[(Long, Long)].collect().toSet
    assert(got.toSet === want)
  }

  test("intervalJoin: nulls and inverted intervals drop; keys restrict; collisions rename") {
    val as = Seq((1L, "x", 0.0, 10.0), (2L, "y", 0.0, 10.0),
        (3L, "x", 20.0, 15.0), (4L, "x", Double.NaN, 5.0))
      .toDF("pid", "g", "lo", "hi")
      .withColumn("lo", when(col("pid") === 4, lit(null)).otherwise(col("lo")))
    val bs = Seq((10L, "x", 5.0, 25.0), (11L, "y", 50.0, 60.0))
      .toDF("pid", "g", "lo", "hi") // all four names collide
    val out = Joins.intervalJoin(as, bs, "lo", "hi", "lo", "hi", bandWidth = 8L,
      leftKeys = Seq("g"), rightKeys = Seq("g"))
    assert(out.columns.count(_ == "pid") === 1 && out.columns.contains("pid_1"))
    val pairs = out.select(col("pid"), col("pid_1")).as[(Long, Long)].collect().toSet
    // 2/11 same key but no overlap; 3 inverted; 4 null lo; only (1,10) joins
    assert(pairs === Set((1L, 10L)))
  }

  test("rangeJoin null equi-keys match nothing (SQL '=' semantics)") {
    val pts = Seq((1L, Option.empty[String], 5.0), (2L, Option("b"), 5.0))
      .toDF("pid", "g", "x")
    val ivs = Seq((10L, Option.empty[String], 0.0, 9.0), (11L, Option("b"), 0.0, 9.0))
      .toDF("iid", "g", "lo", "hi")
    val out = Joins.rangeJoin(pts, ivs, "x", "lo", "hi", bandWidth = 4L,
      pointKeys = Seq("g"), intervalKeys = Seq("g"))
    val pairs = out.select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
    assert(pairs === Set((2L, 11L))) // null g never pairs with null g
  }

  test("rangeJoin fails loudly on a pathological interval span") {
    val pts = Seq((1L, 5.0)).toDF("pid", "x")
    val ivs = Seq((1L, 0.0, 1e12)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      Joins.rangeJoin(pts, ivs, "x", "lo", "hi", bandWidth = 1L,
        maxBandsPerInterval = 1000).count()
    }
    assert(ex.getMessage.contains("rangeJoin") ||
      Option(ex.getCause).exists(_.getMessage.contains("rangeJoin")))
  }
}
