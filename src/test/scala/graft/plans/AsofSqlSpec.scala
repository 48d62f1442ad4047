package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `ASOF JOIN` SQL syntax end-to-end: parser rewrite → resolution swap →
  * native AsofJoinExec, checked against the composed DataFrame as-of.
  */
class AsofSqlSpec extends SparkSpec {
  import spark.implicits._

  private def views(): Unit = {
    Seq((1L, "A", 10L), (2L, "A", 25L), (3L, "B", 12L), (4L, "B", 2L), (5L, "C", 50L))
      .toDF("trade_id", "sym", "ts").createOrReplaceTempView("trades")
    Seq(("A", 5L, 1.0), ("A", 10L, 1.1), ("A", 20L, 1.2),
        ("B", 11L, 2.0), ("B", 13L, 2.1))
      .toDF("sym", "ts", "px").createOrReplaceTempView("quotes")
  }

  test("backward ASOF JOIN matches the composed as-of; unmatched rows drop") {
    views()
    val out = spark.sql(
      """SELECT t.trade_id, t.sym, t.ts, q.ts AS qts, q.px
        |FROM trades t ASOF JOIN quotes q
        |  ON t.sym = q.sym AND t.ts >= q.ts""".stripMargin)
    val rows = out.orderBy("trade_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    // trade 1 (A,10) -> quote (A,10,1.1); trade 2 (A,25) -> (A,20,1.2);
    // trade 3 (B,12) -> (B,11,2.0); trade 4 (B,2) no earlier B quote -> dropped;
    // trade 5 (C) no C quotes -> dropped
    assert(rows.toSeq === Seq((1L, 10L, 1.1), (2L, 20L, 1.2), (3L, 11L, 2.0)))
    val exec = out.queryExecution.executedPlan.toString
    assert(exec.contains("AsofJoin"), exec) // native operator, not a window rewrite
  }

  test("ASOF LEFT JOIN keeps unmatched left rows with nulls") {
    views()
    val out = spark.sql(
      """SELECT t.trade_id, q.px
        |FROM trades t ASOF LEFT JOIN quotes q
        |  ON t.sym = q.sym AND t.ts >= q.ts""".stripMargin)
    val rows = out.orderBy("trade_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(rows.toSeq === Seq((1L, 1.1), (2L, 1.2), (3L, 2.0), (4L, null), (5L, null)))
  }

  test("forward direction via the flipped inequality") {
    views()
    val out = spark.sql(
      """SELECT t.trade_id, q.ts AS qts
        |FROM trades t ASOF JOIN quotes q
        |  ON t.sym = q.sym AND t.ts <= q.ts""".stripMargin)
    val rows = out.orderBy("trade_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // trade 1 (A,10) -> next quote at 10; trade 2 (A,25) none -> dropped;
    // trade 3 (B,12) -> 13; trade 4 (B,2) -> 11
    assert(rows.toSeq === Seq((1L, 10L), (3L, 13L), (4L, 11L)))
  }

  test("agrees with the composed DataFrame as-of on the events table") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.SparkEntry.normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
    ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts")).createOrReplaceTempView("clicks")
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("u"), col("ts").as("pts"), col("value")).createOrReplaceTempView("purchases")
    val sqlOut = spark.sql(
      """SELECT c.event_id, p.pts, p.value
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.u AND c.ts >= p.pts""".stripMargin)
    val composed = graft.operators.Joins.asofJoin(
      spark.table("clicks"), spark.table("purchases"),
      Seq("user_id"), Seq("u"), "ts", "pts", Seq("pts", "value"))
      .select(col("event_id"), col("pts"), col("value"))
    val a = sqlOut.orderBy("event_id").collect().map(_.toSeq)
    val b = composed.orderBy("event_id").collect().map(_.toSeq)
    assert(a.length === b.length)
    assert(a.toSeq === b.toSeq)
  }

  test("strict inequality and missing keys produce clear errors") {
    views()
    val e1 = intercept[Exception](spark.sql(
      "SELECT * FROM trades t ASOF JOIN quotes q ON t.sym = q.sym AND t.ts > q.ts").collect())
    assert(e1.getMessage.contains("inclusive"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM trades t ASOF JOIN quotes q ON t.ts >= q.ts").collect())
    assert(e2.getMessage.contains("equality key"), e2.getMessage)
  }

  test("rewrite is quote-aware and leaves plain SQL untouched") {
    val p = new GraftSqlParser(spark.sessionState.sqlParser)
    assert(p.rewrite("SELECT 'ASOF JOIN' AS s FROM t") === "SELECT 'ASOF JOIN' AS s FROM t")
    assert(p.rewrite("SELECT * FROM a JOIN b ON a.k = b.k") === "SELECT * FROM a JOIN b ON a.k = b.k")
    val rewritten = p.rewrite("SELECT * FROM a ASOF JOIN (SELECT * FROM x JOIN y ON x.k = y.k) b ON a.k = b.k AND a.t >= b.t")
    assert(rewritten.contains("JOIN (SELECT * FROM x JOIN y ON x.k = y.k) b ON graft_asof_marker('inner') AND"), rewritten)
  }

  test("rewrite is comment-aware and join-scoped") {
    val p = new GraftSqlParser(spark.sessionState.sqlParser)
    // 'on' inside a line comment between the join and its real ON
    val c1 = p.rewrite(
      "SELECT * FROM a ASOF JOIN b -- match on time\n ON a.k = b.k AND a.t >= b.t")
    assert(c1.contains("-- match on time\n ON graft_asof_marker('inner') AND a.k = b.k"), c1)
    // 'on' inside a block comment
    val c2 = p.rewrite(
      "SELECT * FROM a ASOF JOIN b /* keyed on sym */ ON a.k = b.k AND a.t >= b.t")
    assert(c2.contains("*/ ON graft_asof_marker('inner') AND"), c2)
    // an ASOF JOIN mentioned in a comment is not rewritten
    val c3 = "SELECT * FROM a JOIN b ON a.k = b.k -- ASOF JOIN someday"
    assert(p.rewrite(c3) === c3)
    // a following join's ON must NOT be captured: USING / missing ON errors
    val e1 = intercept[IllegalArgumentException] {
      p.rewrite("SELECT * FROM a ASOF JOIN b USING (k) JOIN c ON b.k = c.k")
    }
    assert(e1.getMessage.contains("USING"))
    val e2 = intercept[IllegalArgumentException] {
      p.rewrite("SELECT * FROM a ASOF JOIN b JOIN c ON b.k = c.k")
    }
    assert(e2.getMessage.contains("ON clause"))
  }
}
