package graft.operators

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    ("A", 10L, "t1"), ("A", 20L, "t2"), ("B", 15L, "t3")
  ).toDF("sym", "t", "trade")
  private def quotes = Seq(
    ("A", 5L, 1.0), ("A", 10L, 2.0), ("A", 18L, 3.0), ("B", 20L, 9.0)
  ).toDF("sym", "t", "px")

  test("backward asof: greatest right time <= left time, inclusive") {
    val out = Joins.asofJoin(trades, quotes, Seq("sym"), Seq("sym"), "t", "t", Seq("px"))
      .collect().map(r => r.getAs[String]("trade") -> Option(r.getAs[Any]("px"))).toMap
    assert(out === Map(
      "t1" -> Some(2.0), // equal time matches (inclusive)
      "t2" -> Some(3.0),
      "t3" -> None))     // no quote at/before 15 for B
  }

  test("forward asof: smallest right time >= left time") {
    val out = Joins.asofJoin(trades, quotes, Seq("sym"), Seq("sym"), "t", "t", Seq("px"),
      direction = "forward")
      .collect().map(r => r.getAs[String]("trade") -> Option(r.getAs[Any]("px"))).toMap
    assert(out === Map(
      "t1" -> Some(2.0), // equal time inclusive
      "t2" -> None,      // no quote at/after 20 for A
      "t3" -> Some(9.0)))
  }

  test("right value name collisions get _1 suffix") {
    val r2 = quotes.withColumnRenamed("px", "trade")
    val out = Joins.asofJoin(trades, r2, Seq("sym"), Seq("sym"), "t", "t", Seq("trade"))
    assert(out.columns.contains("trade_1"))
  }

  // ---- native (custom LogicalPlan + Strategy + merge exec) path ----

  test("native asof matches the composed implementation, both directions and strategies") {
    import graft.plans.AsofJoinPlan
    for (dir <- Seq("backward", "forward"); hint <- Seq("merge", "broadcast")) {
      val composed = Joins.asofJoin(trades, quotes, Seq("sym"), Seq("sym"),
        "t", "t", Seq("px"), dir).orderBy("trade").collect().toSeq
      val native = AsofJoinPlan.asofJoin(trades, quotes, Seq("sym"), Seq("sym"),
        "t", "t", Seq("px"), dir, hint).orderBy("trade").collect().toSeq
      assert(native === composed, s"direction=$dir hint=$hint")
    }
  }

  test("native asof handles self-as-of (both sides from one source)") {
    import graft.plans.AsofJoinPlan
    val ev = Seq(
      ("u1", 10L, "click", "e1"), ("u1", 5L, "buy", "e2"),
      ("u1", 8L, "buy", "e3"), ("u2", 7L, "click", "e4")
    ).toDF("user", "ts", "kind", "id")
    val clicks = ev.filter($"kind" === "click").select($"user", $"ts", $"id")
    val buys = ev.filter($"kind" === "buy").select($"user", $"ts", $"id")
    val out = AsofJoinPlan.asofJoin(clicks, buys, Seq("user"), Seq("user"),
      "ts", "ts", Seq("id"))
      .collect().map(r => r.getAs[String]("id") -> Option(r.getAs[String]("id_1"))).toMap
    assert(out === Map("e1" -> Some("e3"), "e4" -> None))
  }

  test("native asof plans as AsofJoinExec with one exchange per side") {
    import graft.plans.AsofJoinPlan
    val df = AsofJoinPlan.asofJoin(trades, quotes, Seq("sym"), Seq("sym"),
      "t", "t", Seq("px"), hint = "merge")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2, plan)
  }

  test("small right side auto-plans as BroadcastAsofJoinExec: no shuffle at all") {
    import graft.plans.AsofJoinPlan
    val df = AsofJoinPlan.asofJoin(trades, quotes, Seq("sym"), Seq("sym"),
      "t", "t", Seq("px")) // auto: tiny quotes fall under the threshold
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsofJoin"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty, plan)
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("broadcast asof tolerates null keys, empty sides, duplicate times") {
    import graft.plans.AsofJoinPlan
    val l = Seq((Option("A"), 10L, "x"), (None: Option[String], 10L, "y"))
      .toDF("sym", "t", "tag")
    val r = Seq((Option("A"), 5L, 1.0), (Option("A"), 5L, 2.0),
      (None: Option[String], 5L, 7.0)).toDF("sym", "t", "px")
    val out = AsofJoinPlan.asofJoin(l, r, Seq("sym"), Seq("sym"), "t", "t", Seq("px"),
      hint = "broadcast")
      .collect().map(x => x.getAs[String]("tag") -> Option(x.getAs[Any]("px"))).toMap
    // null keys group together; equal-time duplicates: backward keeps last
    assert(out === Map("x" -> Some(2.0), "y" -> Some(7.0)))
    val empty = AsofJoinPlan.asofJoin(l.limit(0), r, Seq("sym"), Seq("sym"), "t", "t",
      Seq("px"), hint = "broadcast")
    assert(empty.count() === 0)
  }

  test("native asof tolerates null keys and empty sides") {
    import graft.plans.AsofJoinPlan
    val l = Seq((Option("A"), 10L, "x"), (None: Option[String], 10L, "y"))
      .toDF("sym", "t", "tag")
    val r = Seq((Option("A"), 5L, 1.0), (None: Option[String], 5L, 7.0))
      .toDF("sym", "t", "px")
    val out = AsofJoinPlan.asofJoin(l, r, Seq("sym"), Seq("sym"), "t", "t", Seq("px"))
      .collect().map(x => x.getAs[String]("tag") -> Option(x.getAs[Any]("px"))).toMap
    // null keys group together (reference dict-equality semantics)
    assert(out === Map("x" -> Some(1.0), "y" -> Some(7.0)))
    val empty = AsofJoinPlan.asofJoin(l.limit(0), r, Seq("sym"), Seq("sym"), "t", "t", Seq("px"))
    assert(empty.count() === 0)
  }

  test("nearestJoin: closest wins either side; distance ties go backward; no-match is null") {
    val l = Seq(("A", 10L, "t1"), ("A", 14L, "t2"), ("A", 30L, "t3"), ("C", 1L, "t4"))
      .toDF("sym", "t", "tag")
    val r = Seq(("A", 8L, 100L, 1.0), ("A", 18L, 101L, 2.0), ("A", 29L, 102L, 3.0),
      ("B", 5L, 103L, 9.0)).toDF("sym", "t", "rid", "px")
    val out = Joins.nearestJoin(l, r, Seq("sym"), Seq("sym"), "t", "t",
      Seq("rid", "px"), rightTie = "rid")
      .collect().map(row => row.getAs[String]("tag") ->
        Option(row.getAs[Any]("rid"))).toMap
    assert(out === Map(
      "t1" -> Some(100L), // |10-8|=2 < |10-18|=8
      "t2" -> Some(101L), // wait: |14-8|=6, |14-18|=4 → forward 101
      "t3" -> Some(102L), // |30-29|=1
      "t4" -> None))      // no C rows
  }

  test("nearestJoin: equal distance prefers backward; equal right times break by tie per direction") {
    val l = Seq(("A", 10L, "x")).toDF("sym", "t", "tag")
    // backward at 8 and forward at 12: both distance 2 → backward
    val r1 = Seq(("A", 8L, 1L, 1.0), ("A", 12L, 2L, 2.0)).toDF("sym", "t", "rid", "px")
    val got1 = Joins.nearestJoin(l, r1, Seq("sym"), Seq("sym"), "t", "t",
      Seq("px"), rightTie = "rid").collect()(0).getAs[Double]("px")
    assert(got1 === 1.0)
    // exactly-at-time rows: distance 0 backward; duplicate right times →
    // backward takes the LARGEST tie
    val r2 = Seq(("A", 10L, 1L, 1.0), ("A", 10L, 2L, 2.0)).toDF("sym", "t", "rid", "px")
    val got2 = Joins.nearestJoin(l, r2, Seq("sym"), Seq("sym"), "t", "t",
      Seq("px"), rightTie = "rid").collect()(0).getAs[Double]("px")
    assert(got2 === 2.0)
    // strictly-forward duplicates → the SMALLEST tie (earliest ≥ t reading)
    val r3 = Seq(("A", 13L, 1L, 1.0), ("A", 13L, 2L, 2.0)).toDF("sym", "t", "rid", "px")
    val got3 = Joins.nearestJoin(l, r3, Seq("sym"), Seq("sym"), "t", "t",
      Seq("px"), rightTie = "rid").collect()(0).getAs[Double]("px")
    assert(got3 === 1.0)
  }

  test("asof: NULL value columns in the matched right row stay NULL (atomic-row carry)") {
    // right rows (t=1, x=5), (t=2, x=NULL); left at t=2 must see x=NULL —
    // a per-column carry would resurrect x=5 from the older row
    val l = Seq(("A", 2L, "t1")).toDF("sym", "t", "tag")
    val r = Seq(("A", 1L, Option(5.0), Option("a")),
      ("A", 2L, None: Option[Double], Option("b"))).toDF("sym", "t", "x", "y")
    val row = Joins.asofJoin(l, r, Seq("sym"), Seq("sym"), "t", "t",
      Seq("x", "y")).collect()(0)
    assert(Option(row.getAs[Any]("x")) === None)
    assert(row.getAs[String]("y") === "b")
    // native path agrees (it always carried the whole row)
    val n = graft.plans.AsofJoinPlan.asofJoin(l, r, Seq("sym"), Seq("sym"),
      "t", "t", Seq("x", "y")).collect()(0)
    assert(Option(n.getAs[Any]("x")) === None)
    assert(n.getAs[String]("y") === "b")
  }

  test("nearestJoin: NULL value columns in the nearest right row stay NULL, and the distance decision uses that same row") {
    val l = Seq(("A", 2L, "t1")).toDF("sym", "t", "tag")
    val r = Seq(("A", 1L, 10L, Option(5.0), Option("a")),
      ("A", 2L, 11L, None: Option[Double], Option("b")))
      .toDF("sym", "t", "rid", "x", "y")
    val row = Joins.nearestJoin(l, r, Seq("sym"), Seq("sym"), "t", "t",
      Seq("x", "y"), rightTie = "rid").collect()(0)
    assert(Option(row.getAs[Any]("x")) === None) // nearest row's NULL, not t=1's 5.0
    assert(row.getAs[String]("y") === "b")       // and y from the SAME row
  }

  test("nearestJoin equals brute force on random data and is partition-invariant") {
    val rng = new scala.util.Random(17)
    val lRows = (0 until 120).map(i =>
      (s"k${rng.nextInt(6)}", rng.nextInt(100).toLong, i.toLong))
    val rRows = (0 until 80).map(i =>
      (s"k${rng.nextInt(8)}", rng.nextInt(100).toLong, i.toLong, rng.nextDouble()))
    val l = lRows.toDF("sym", "t", "lid")
    val r = rRows.toDF("sym", "t", "rid", "px")
    def brute: Map[Long, Option[Long]] = lRows.map { case (k, t, lid) =>
      val cands = rRows.filter(_._1 == k)
      lid -> (if (cands.isEmpty) None else {
        val best = cands.minBy { case (_, rt, rid, _) =>
          (math.abs(rt - t).toDouble, rt.toDouble,
            if (rt <= t) -rid.toDouble else rid.toDouble)
        }
        Some(best._3)
      })
    }.toMap
    val results = Seq(1, 7).map { parts =>
      Joins.nearestJoin(l.repartition(parts), r.repartition(parts),
        Seq("sym"), Seq("sym"), "t", "t", Seq("rid"), rightTie = "rid")
        .collect().map(row => row.getAs[Long]("lid") ->
          Option(row.getAs[Any]("rid")).map(_.asInstanceOf[Long])).toMap
    }
    assert(results(0) === brute)
    assert(results(0) === results(1))
  }
}
