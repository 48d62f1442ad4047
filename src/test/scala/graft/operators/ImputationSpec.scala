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

  test("NN keeps byte-identical patient rows as separate rows (no row loss)") {
    val d = Seq(
      (2.0, 2.0, None), (2.0, 2.0, None), // identical patients — both must survive
      (1.0, 1.0, Some(10.0)), (9.0, 9.0, Some(90.0))
    ).toDF("a", "b", "v")
    val out = Imputation.nearestNeighbour(d, "v", Seq("a", "b"))
    assert(out.count() === 4)
    assert(out.filter($"a" === 2.0 && $"v" === 10.0).count() === 2)
  }

  test("NN result is partition-invariant (replay-stable row ids, dup-heavy input)") {
    // the patient uid is (2×64-bit row hash, dup ordinal) — a pure
    // function of row CONTENT, so recomputing any partition (fetch-
    // failure replay) or re-slicing the input cannot drop/duplicate
    // rows the way a monotonically_increasing_id key could. Pin it by
    // running the same dup-heavy frame under three partitionings and
    // requiring identical result multisets.
    val rows = (0 until 30).map { i =>
      val v = if (i % 4 == 0) None else Some(i * 10.0)
      (Some((i % 7).toDouble), Some((i % 5).toDouble), v) // heavy key dups
    } ++ Seq.fill(4)((Some(3.0), Some(3.0), Option.empty[Double])) // identical patients
    def run(parts: Int): Seq[Seq[Any]] = {
      val d = rows.toDF("a", "b", "v").repartition(parts)
      Imputation.nearestNeighbour(d, "v", Seq("a", "b"))
        .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
    }
    val one = run(1)
    assert(one.length === rows.length) // every dup survives
    assert(run(3) === one)
    assert(run(8) === one)
  }

  test("NN rank-band blocking equals the exact path when the NN is in band") {
    // 40 rows over two correlated sources; every patient's nearest donor
    // is adjacent in rank space, so a ±4-rank band must reproduce the
    // exact product's answer row for row — including an all-sources-null
    // patient (global-min-donor rule) and identical patient rows
    val rows = (0 until 40).map { i =>
      val v = if (i % 5 == 2) None else Some(i * 10.0)
      (Some(i.toDouble), Some(i * 2.0 + (i % 3)), v)
    } ++ Seq(
      (Option.empty[Double], Option.empty[Double], Option.empty[Double]), // all-null patient
      (Some(7.0), Some(14.0), None), (Some(7.0), Some(14.0), None))       // identical patients
    val d = rows.toDF("a", "b", "v")
    val exact = Imputation.nearestNeighbour(d, "v", Seq("a", "b"))
    val band = Imputation.nearestNeighbour(d, "v", Seq("a", "b"), rankBand = 4)
    assert(band.count() === exact.count())
    val key = Seq("a", "b", "v").map(org.apache.spark.sql.functions.col)
    assert(band.groupBy(key: _*).count().except(exact.groupBy(key: _*).count()).isEmpty &&
      exact.groupBy(key: _*).count().except(band.groupBy(key: _*).count()).isEmpty)
    // scale pin: the banded path's candidate join is keyed on the rank
    // bucket — no unbounded cartesian anywhere in the plan (the only
    // nested-loop joins left are the 1-row count/min-donor broadcasts)
    val plan = band.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("__pb"), "band-bucket key missing from the candidate join")
  }

  test("NN with zero donors returns the frame unchanged (no vanishing rows)") {
    val d = Seq((1.0, 2.0, Option.empty[Double]), (3.0, 4.0, None)).toDF("a", "b", "v")
    val multi = Imputation.nearestNeighbour(d, "v", Seq("a", "b"))
    assert(multi.count() === 2 && multi.filter($"v".isNull).count() === 2)
    val one = Imputation.nearestNeighbour(d, "v", Seq("a"))
    assert(one.count() === 2 && one.filter($"v".isNull).count() === 2)
  }

  test("NN kernel null-source rule: patient's null column skipped, null-source donor is far") {
    // patient (null, 2): column a is skipped (imputation.nim:144), so
    // distance is |rank_b(2) - rank_b(donor_b)| only → donor (9, 2.5) at
    // b-rank distance 1 beats donor (1, 9) at distance 2.
    val d = Seq(
      (Option.empty[Double], Some(2.0), Option.empty[Double]),
      (Some(1.0), Some(9.0), Some(100.0)),
      (Some(9.0), Some(2.5), Some(200.0)),
      (Some(5.0), Some(5.0), Some(300.0))
    ).toDF("a", "b", "v")
    val out = Imputation.nearestNeighbour(d, "v", Seq("a", "b"))
    assert(out.filter($"a".isNull).select("v").as[Double].head() === 200.0)
    // donor with a null source is infinitely far in that column
    // (imputation.nim:216): patient (2,2) must prefer the fully-ranked
    // donor (3,3) over the closer-in-b but null-in-a donor (null, 2)
    val d2 = Seq(
      (Some(2.0), Some(2.0), Option.empty[Double]),
      (Option.empty[Double], Some(2.0), Some(111.0)),
      (Some(3.0), Some(3.0), Some(222.0))
    ).toDF("a", "b", "v")
    val out2 = Imputation.nearestNeighbour(d2, "v", Seq("a", "b"))
    assert(out2.filter($"a" === 2.0).select("v").as[Double].head() === 222.0)
  }

  test("NN argument guards: empty sources rejected, empty targets no-op for stats") {
    intercept[IllegalArgumentException](
      Imputation.nearestNeighbour(Seq((1, 2)).toDF("a", "v"), "v", Nil))
    val d = Seq((1, Some(2.0)), (2, None)).toDF("k", "v")
    assert(Imputation.fillWithStat(d, Nil, "mean").count() === 2) // unchanged
    intercept[IllegalArgumentException](Imputation.fillWithStat(d, Seq("v"), "nope"))
  }

  test("1-D NN equal-rank donors with different values pick the min (deterministic)") {
    // two donors share k=5 with values 99 and 11: the patient at k=5 is
    // at rank distance 0 from both and must take the min (11). The k=6
    // patient sits at rank 3: the k=9 donor (rank 4, distance 1) beats
    // the k=5 group (rank 0, distance 3) → 70.
    val d = Seq(
      (5, Some(99.0)), (5, Some(11.0)), (5, None),
      (6, None), (9, Some(70.0))
    ).toDF("k", "v")
    val out = Imputation.nearestNeighbour(d, "v", Seq("k"))
      .orderBy("k", "v").select("v").as[Double].collect()
    assert(out === Array(11.0, 11.0, 99.0, 70.0, 70.0))
  }
}
