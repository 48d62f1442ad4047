package graft.operators

import graft.SparkSpec
import graft.operators.Filters.Criterion
import org.apache.spark.sql.functions._

class FiltersSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "a"), (4, 40.0, null.asInstanceOf[String])
  ).toDF("id", "v", "s")

  test("filterSplit pass/fail partition the input, null predicate goes to fail") {
    val (pass, fail) = Filters.filterSplit(df,
      Seq(Criterion.cv("v", "<", 35.0), Criterion.cv("s", "==", "a")), "all")
    assert(pass.select("id").as[Int].collect().sorted === Array(1, 3))
    assert(fail.select("id").as[Int].collect().sorted === Array(2, 4))
    assert(pass.count() + fail.count() === df.count())
  }

  test("filterSplit any-mode is OR") {
    val (pass, _) = Filters.filterSplit(df,
      Seq(Criterion.cv("id", "==", 1), Criterion.cv("id", "==", 4)), "any")
    assert(pass.select("id").as[Int].collect().sorted === Array(1, 4))
  }

  test("'in' criterion: left value in right string (test_filter.py:40-46)") {
    // reference golden case: A in "12" keeps "1" and "2", drops "3"
    val d2 = Seq("1", "2", "3").toDF("A")
    val (pass, fail) = Filters.filterSplit(d2, Seq(Criterion.cv("A", "in", "12")))
    assert(pass.select("A").as[String].collect().sorted === Array("1", "2"))
    assert(fail.select("A").as[String].collect() === Array("3"))
  }

  test("callable kwargs golden vectors (test_any_and_all.py:7-43)") {
    val t = Seq((1, 10), (2, 20), (3, 30), (4, 40)).toDF("a", "b")
    // t.any(a = x==4, b = x<20) → [[1,10],[4,40]]
    val anyOut = Filters.filterAnyWhere(t,
      Map("a" -> ((c: org.apache.spark.sql.Column) => c === 4),
          "b" -> ((c: org.apache.spark.sql.Column) => c < 20)))
      .orderBy("a").as[(Int, Int)].collect()
    assert(anyOut === Array((1, 10), (4, 40)))
    // t.all(a = x>=2, b = x<=30) → [[2,20],[3,30]]
    val allOut = Filters.filterAllWhere(t,
      Map("a" -> ((c: org.apache.spark.sql.Column) => c >= 2),
          "b" -> ((c: org.apache.spark.sql.Column) => c <= 30)))
      .orderBy("a").as[(Int, Int)].collect()
    assert(allOut === Array((2, 20), (3, 30)))
    // t.all(B = x is not None) over [None, true, false] → A = [2,3]
    val tn = Seq((1, Option.empty[Boolean]), (2, Some(true)), (3, Some(false))).toDF("A", "B")
    val notNone = Filters.filterAllWhere(tn,
      Map("B" -> ((c: org.apache.spark.sql.Column) => c.isNotNull)))
      .orderBy("A").select("A").as[Int].collect()
    assert(notNone === Array(2, 3))
  }

  test("filterAll / filterAny kwargs") {
    assert(Filters.filterAll(df, Map("s" -> "a", "id" -> 3)).count() === 1)
    assert(Filters.filterAny(df, Map("s" -> "a", "id" -> 2)).count() === 3)
  }

  test("dropRows is type-aware: string value never matches numeric column") {
    assert(Filters.dropRows(df, Seq("a")).select("id").as[Int].collect().sorted === Array(2, 4))
    assert(Filters.dropRows(df, Seq(2)).count() === 3)
  }

  test("columnRemoveAll shrinks one column, null-safe, order preserved (base.py:870-885)") {
    val d = Seq(Some("a"), Some("b"), None, Some("a"), Some("c"))
      .toDF("s")
    val out = Filters.columnRemoveAll(d, "s", Seq("a"))
    assert(out.columns.toSeq === Seq("s"))
    assert(out.collect().map(r => Option(r.getString(0))).toSeq ===
      Seq(Some("b"), None, Some("c")))
    // null in values removes nulls, like the reference's None
    assert(Filters.columnRemoveAll(d, "s", Seq(null, "c")).collect()
      .map(_.getString(0)).toSeq === Seq("a", "b", "a"))
    // empty values = plain column projection
    assert(Filters.columnRemoveAll(d, "s", Nil).count() === 5)
  }

  test("replace maps values incl. null-safe matching") {
    val out = Filters.replace(df, Map("a" -> "z"), Seq("s"))
    assert(out.filter($"s" === "z").count() === 2)
    assert(out.filter($"s" === "a").count() === 0)
  }

  test("dropDuplicatesKeepFirst keeps the row with the lowest order key") {
    val d = Seq((1, 2, "keep2"), (1, 1, "keep1"), (2, 5, "only")).toDF("k", "ord", "tag")
    val out = Filters.dropDuplicatesKeepFirst(d, Seq("k"), Seq("ord", "tag"))
    assert(out.orderBy("k").select("tag").as[String].collect() === Array("keep1", "only"))
  }
}
