package graft.functions

import graft.{SparkSpec, Tab}

/** Ports the reference's expression-string filter cases
  * (tests/test_filter.py:15-38) plus the documented grammar of
  * utils.py:55-83 — compiled to one Catalyst predicate.
  */
class ExpressionInterpreterSpec extends SparkSpec {
  import spark.implicits._

  private def t = Tab(Seq((1, 10), (2, 20), (3, 30), (4, 40)).toDF("a", "b"))

  test("all((...)) tuple ≡ and-connective ≡ structured criteria (test_filter_all_1)") {
    val (t1, f1) = t.filter("all((a>=3, b<=20))")
    val (t2, f2) = t.filter("a>=3 and b<=20")
    assert(t1.df.count() === 0) // a>=3 rows have b in {30,40}
    assert(f1.df.count() === 4)
    assert(t2.df.collect().toSet === t1.df.collect().toSet)
    assert(f2.df.collect().toSet === f1.df.collect().toSet)
  }

  test("any((...)) tuple ≡ or-connective") {
    val (p1, _) = t.filter("any((a==3, b==20))")
    val (p2, _) = t.filter("a==3 or b==20")
    assert(p1.df.collect().map(_.getInt(0)).sorted.toSeq === Seq(2, 3))
    assert(p2.df.collect().toSet === p1.df.collect().toSet)
  }

  test("Python chained comparison expands to a conjunction") {
    val (p, f) = t.filter("1 < a < 4")
    assert(p.df.collect().map(_.getInt(0)).sorted.toSeq === Seq(2, 3))
    assert(f.df.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 4))
  }

  test("not / parens / arithmetic operands") {
    val (p, _) = t.filter("not (a + 1 >= 4)")
    assert(p.df.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2))
    val (q, _) = t.filter("b - a * 2 == 8") // Python precedence: b - (a*2)
    assert(q.df.collect().map(_.getInt(0)).toSeq === Seq(1)) // 10 - 1*2 = 8
    val (r, _) = t.filter("b % 20 == 0")
    assert(r.df.collect().map(_.getInt(0)).sorted.toSeq === Seq(2, 4))
  }

  test("in tuple → IN list; in string → substring (test_filter_a_in_b semantics)") {
    val s = Tab(Seq("1", "2", "3").toDF("A"))
    val (p, f) = s.filter("A in '12'") // Python: '1' in '12' is True
    assert(p.df.collect().map(_.getString(0)).sorted.toSeq === Seq("1", "2"))
    assert(f.df.collect().map(_.getString(0)).toSeq === Seq("3"))
    val (q, _) = t.filter("a in (1, 4)")
    assert(q.df.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 4))
    val (r, _) = t.filter("a not in (1, 4)")
    assert(r.df.collect().map(_.getInt(0)).sorted.toSeq === Seq(2, 3))
  }

  test("None: is None / is not None / == None; NULL predicate rows land in fail") {
    val s = Tab(Seq(Some(1), None, Some(3)).toDF("x"))
    val (p, _) = s.filter("x is None")
    assert(p.df.count() === 1)
    val (q, _) = s.filter("x is not None")
    assert(q.df.count() === 2)
    val (r, _) = s.filter("x == None")
    assert(r.df.count() === 1) // Python == None ≡ is None, not SQL =NULL
    // comparison against a NULL operand is false-ish → fail side keeps the row
    val (pp, ff) = s.filter("x >= 2")
    assert(pp.df.count() === 1)
    assert(ff.df.count() === 2)
  }

  test("string literals, True/False, column-to-column") {
    val s = Tab(Seq(("x", "x"), ("x", "y")).toDF("A", "B"))
    val (p, _) = s.filter("A == B")
    assert(p.df.count() === 1)
    val (q, _) = s.filter("A == 'x' and True")
    assert(q.df.count() === 2)
  }

  test("scientific notation with signed exponent tokenizes as one number") {
    // 1e-5 must be Num("1e-5"), not Num("1e") followed by a stray '-'
    val pred = ExpressionInterpreter.compile("a > 1e-5 and a < 1.5e+1", Seq("a"))
    val d = spark.range(1, 20).selectExpr("id AS a")
    assert(d.filter(pred).count() === 14) // 1..14 (a < 15)
    val predCap = ExpressionInterpreter.compile("a < 1E2", Seq("a"))
    assert(d.filter(predCap).count() === 19)
  }

  test("unknown column and malformed input fail loudly") {
    intercept[IllegalArgumentException](t.filter("nope > 3"))
    intercept[IllegalArgumentException](t.filter("a >"))
    intercept[IllegalArgumentException](t.filter("a ? 3"))
    intercept[IllegalArgumentException](t.filter("a == 'unterminated"))
  }

  test("the compiled predicate is a plain Catalyst filter (pushdown-eligible)") {
    val pred = ExpressionInterpreter.compile("all((a>=3, b<=20))", Seq("a", "b"))
    // analyzed plan (the optimizer constant-folds tiny LocalRelations):
    // one ordinary Filter over native expressions — no UDF, no Python
    val plan = t.df.filter(pred).queryExecution.analyzed.toString
    assert(plan.contains("Filter"), plan)
    assert(plan.contains("(a#") && plan.contains(">= 3"), plan)
    assert(!plan.toLowerCase.contains("python") && !plan.contains("UDF"), plan)
  }
}
