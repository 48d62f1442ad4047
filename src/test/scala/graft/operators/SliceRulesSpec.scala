package graft.operators

import graft.SparkSpec

/** Python slice-semantics conformance, ported from the reference's
  * tests/test_slice_rules.py:1-40 (`test_getitem` vectors over
  * L = [1, 2, 3, 4]).
  */
class SliceRulesSpec extends SparkSpec {
  import spark.implicits._

  private def L = Seq(1, 2, 3, 4).toDF("v")

  private def s(start: Option[Long], stop: Option[Long], step: Option[Long]): Seq[Int] =
    Slicing.pySlice(L, Seq("v"), start, stop, step).as[Int].collect().toSeq

  private val X = None: Option[Long]
  private def i(v: Long): Option[Long] = Some(v)

  test("test_getitem vectors: plain slices") {
    assert(s(X, X, X) === Seq(1, 2, 3, 4))          // L[:]
    assert(s(X, i(0), X) === Seq())                 // L[:0]
    assert(s(i(0), X, X) === Seq(1, 2, 3, 4))       // L[0:]
    assert(s(X, i(2), X) === Seq(1, 2))             // L[:2]
    assert(s(i(0), i(0), X) === Seq())              // L[0:0]
    assert(s(i(2), i(2), X) === Seq())              // L[2:2]
    assert(s(X, i(10), X) === Seq(1, 2, 3, 4))      // L[:10]
    assert(s(i(1), i(2), X) === Seq(2))             // L[1:2]
    assert(s(i(1), i(3), X) === Seq(2, 3))          // L[1:3]
  }

  test("test_getitem vectors: negative indices") {
    assert(s(i(-1), X, X) === Seq(4))               // L[-1:]
    assert(s(i(-1), X, i(1)) === Seq(4))            // L[-1::1]
    assert(s(i(-1), i(4), i(1)) === Seq(4))         // L[-1:4:1]
    assert(s(i(-1), i(0), i(1)) === Seq())          // L[-1:0:1]
    assert(s(i(-3), i(-1), i(1)) === Seq(2, 3))     // L[-3:-1:1]
  }

  test("test_getitem vectors: steps and reversals keep traversal order") {
    assert(s(i(0), i(4), i(2)) === Seq(1, 3))       // L[0:4:2]
    assert(s(i(0), i(5), i(2)) === Seq(1, 3))       // L[0:5:2]
    assert(s(X, X, i(2)) === Seq(1, 3))             // L[::2]
    assert(s(i(1), X, i(2)) === Seq(2, 4))          // L[1::2]
    assert(s(i(-1), i(0), i(-1)) === Seq(4, 3, 2))  // L[-1:0:-1]
    assert(s(i(4), i(0), i(-1)) === Seq(4, 3, 2))   // L[4:0:-1]
    assert(s(i(3), i(2), i(-1)) === Seq(4))         // L[3:2:-1]
    assert(s(X, X, i(-1)) === Seq(4, 3, 2, 1))      // L[::-1]
  }
}
