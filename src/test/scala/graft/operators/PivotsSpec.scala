package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PivotsSpec extends SparkSpec {
  import spark.implicits._

  test("pivot_transpose golden vectors (test_transpose.py:4-40)") {
    val t1 = Seq((1, 2, 3, 4, 5)).toDF("a", "b", "c", "d", "e")
    val out1 = Pivots.melt(t1, Seq("a", "b"), Seq("c", "d", "e"))
      .orderBy("transpose").collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(out1.toSeq === Seq((1, 2, "c", 3), (1, 2, "d", 4), (1, 2, "e", 5)))

    val t2 = Seq((1, 2, 3, 4, 5), (10, 20, 30, 40, 50)).toDF("a", "b", "c", "d", "e")
    val out2 = Pivots.melt(t2, Seq("a", "b"), Seq("c", "d", "e"))
      .orderBy("a", "transpose").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(out2.toSeq === Seq(
      (1, 2, "c", 3), (1, 2, "d", 4), (1, 2, "e", 5),
      (10, 20, "c", 30), (10, 20, "d", 40), (10, 20, "e", 50)))
  }

  test("transpose: first column becomes the header row (pivots.py:185-198)") {
    val t = Seq(("r1", 1, 10), ("r2", 2, 20)).toDF("name", "x", "y")
    val out = Pivots.transpose(t)
    assert(out.columns.toSeq === Seq("name", "r1", "r2"))
    val rows = out.orderBy("name").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq === Seq(("x", "1", "2"), ("y", "10", "20")))
  }

  test("wide pivot produces one column per pivot value") {
    val t = Seq(("a", "F", 1.0), ("a", "O", 2.0), ("b", "F", 3.0)).toDF("k", "s", "v")
    val out = Pivots.pivot(t, Seq("k"), Seq("s"), Seq("v" -> "Sum"), pivotValues = Seq("F", "O"))
      .orderBy("k").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a", "b"))
    assert(out(0).getDouble(1) === 1.0 && out(0).getDouble(2) === 2.0)
    assert(out(1).getDouble(1) === 3.0 && out(1).isNullAt(2)) // empty cell = null
  }
}
