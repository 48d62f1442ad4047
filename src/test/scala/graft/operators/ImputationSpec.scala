package graft.operators

import graft.SparkSpec

class ImputationSpec extends SparkSpec {
  import spark.implicits._

  test("ffill carries the last non-null forward in order") {
    val d = Seq((1, Some(10.0)), (2, None), (3, None), (4, Some(40.0)), (5, None))
      .toDF("ord", "v")
    val out = Imputation.ffill(d, Seq("v"), "ord").orderBy("ord")
      .select("v").as[Option[Double]].collect()
    assert(out === Array(Some(10.0), Some(10.0), Some(10.0), Some(40.0), Some(40.0)))
  }

  test("leading nulls stay null under ffill") {
    val d = Seq((1, None), (2, Some(2.0))).toDF("ord", "v")
    val out = Imputation.ffill(d, Seq("v"), "ord").orderBy("ord")
      .select("v").as[Option[Double]].collect()
    assert(out === Array(None, Some(2.0)))
  }

  test("mean fill replaces nulls with the column mean") {
    val d = Seq(Some(1.0), Some(3.0), None).toDF("v")
    val out = Imputation.fillWithStat(d, Seq("v"), "mean")
      .select("v").as[Double].collect().sorted
    assert(out === Array(1.0, 2.0, 3.0))
  }

  test("nearest-neighbour 1-D picks the closest donor, tie -> smaller value") {
    // rank positions: k=2 equidistant between 10.0/30.0 -> least = 10.0;
    // k=7 equidistant between 30.0/80.0 -> least = 30.0
    val d = Seq((1, Some(10.0)), (2, None), (3, Some(30.0)), (7, None), (8, Some(80.0)))
      .toDF("k", "v")
    val out = Imputation.nearestNeighbour(d, "v", Seq("k"))
      .orderBy("k").select("v").as[Double].collect()
    assert(out === Array(10.0, 10.0, 30.0, 30.0, 80.0))
  }

  test("nearest-neighbour multi-source exact path fills all missing") {
    val d = Seq(
      (1.0, 1.0, Some(100.0)), (2.0, 2.0, None), (10.0, 10.0, Some(500.0))
    ).toDF("a", "b", "v")
    val out = Imputation.nearestNeighbour(d, "v", Seq("a", "b"))
    assert(out.filter($"v".isNull).count() === 0)
    // patient (2,2) is rank-closer to (1,1) than (10,10)
    assert(out.filter($"a" === 2.0).select("v").as[Double].head() === 100.0)
  }

  test("reference NN vectors: exact source match donates (test_imputation.py:4-16)") {
    // [[1,2,3],[1,2,None],[5,5,5],[6,6,6]] sources a,b target c → row 2 gets 3
    val d = Seq(
      (1.0, 2.0, Some(3.0)), (1.0, 2.0, None), (5.0, 5.0, Some(5.0)), (6.0, 6.0, Some(6.0))
    ).toDF("a", "b", "c")
    val out = Imputation.nearestNeighbour(d, "c", Seq("a", "b"))
      .orderBy("a", "b").select("c").as[Double].collect()
    assert(out === Array(3.0, 3.0, 5.0, 6.0))
  }

  test("reference NN vectors: closest donor wins (test_imputation.py:65-80)") {
    // [[1,2,None],[5,5,5],[6,6,6]] → (1,2) is rank-closer to (5,5) → 5
    val d = Seq(
      (1.0, 2.0, None), (5.0, 5.0, Some(5.0)), (6.0, 6.0, Some(6.0))
    ).toDF("a", "b", "c")
    val out = Imputation.nearestNeighbour(d, "c", Seq("a", "b"))
      .orderBy("a").select("c").as[Double].collect()
    assert(out === Array(5.0, 5.0, 6.0))
  }

  test("reference NN vectors: several missing share a donor (test_imputation.py:82-114)") {
    // [[1,2,None],[5,5,None],[5,5,5],[6,6,6]] → both missing rows get 5
    val d = Seq(
      (1.0, 2.0, None), (5.0, 5.0, None), (5.0, 5.0, Some(5.0)), (6.0, 6.0, Some(6.0))
    ).toDF("a", "b", "c")
    val out = Imputation.nearestNeighbour(d, "c", Seq("a", "b"))
      .orderBy("a", "c").select("c").as[Double].collect()
    assert(out === Array(5.0, 5.0, 5.0, 6.0))
  }
}
