package graft.functions

import graft.SparkSpec

class CorpusReportSpec extends SparkSpec {
  import spark.implicits._

  test("corpusReport: one row per group with exact doc/char/token accounting") {
    val docs = Seq(
      ("web", "en", "one two three"),        // 13 chars, 3 tokens
      ("web", "en", "four five"),            // 9 chars, 2 tokens
      ("web", "de", "ein"),                  // 3 chars, 1 token
      ("book", "en", "a b c d")              // 7 chars, 4 tokens
    ).toDF("source", "lang", "text")
    val rep = TextFunctions.corpusReport(docs, Seq("source", "lang"), "text")
    assert(rep.columns.toSeq === Seq("source", "lang", "n_docs", "total_chars",
      "total_tokens", "avg_chars", "min_chars", "max_chars"))
    val m = rep.collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(m(("web", "en")) === ((2L, 22L, 5L, 11.0)))
    assert(m(("web", "de")) === ((1L, 3L, 1L, 3.0)))
    assert(m(("book", "en")) === ((1L, 7L, 4L, 7.0)))
  }

  test("corpusReport streams in complete mode: running totals across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val rep = TextFunctions.corpusReport(in.toDF().toDF("source", "text"),
      Seq("source"), "text")
    val q = rep.writeStream.outputMode("complete")
      .format("memory").queryName("corpus_report_stream").start()
    try {
      in.addData(("web", "one two three"), ("web", "four five"))
      q.processAllAvailable()
      in.addData(("web", "six"), ("book", "a b"))
      q.processAllAvailable()
      val m = spark.sql("SELECT source, n_docs, total_tokens FROM corpus_report_stream")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(m("web") === ((3L, 6L)))
      assert(m("book") === ((1L, 2L)))
    } finally q.stop()
  }

  test("corpusReport plan: one aggregation, no extra shuffle of text") {
    val docs = Seq(("a", "x y")).toDF("source", "text")
    val rep = TextFunctions.corpusReport(docs, Seq("source"), "text")
    val plan = rep.queryExecution.executedPlan.toString
    // one hash-agg pair (partial + final), a single exchange
    assert("Exchange".r.findAllIn(plan).length <= 1, plan)
  }
}
