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
}
