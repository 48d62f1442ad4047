package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JaccardRuleSpec extends SparkSpec {
  import spark.implicits._

  private def pairsDf = Seq(
    (Seq("a", "b", "c"), Seq("b", "c", "d")),       // J = 0.5
    (Seq("a"), Seq("a", "a")),                      // J = 1.0 (set semantics, dup b)
    (Seq("a", "b", "c", "d", "e", "f"), Seq("a")),  // J ≈ 0.17, big size skew
    (Seq.empty[String], Seq.empty[String])          // J = 0
  ).toDF("x", "y")

  test("JaccardSimExpr matches set semantics incl. duplicates and empties") {
    val j = pairsDf.select(Kernels.jaccardSim($"x", $"y").as("j")).as[Double].collect()
    assert(math.abs(j(0) - 0.5) < 1e-12)
    assert(j(1) === 1.0)
    assert(math.abs(j(2) - 1.0 / 6.0) < 1e-12)
    assert(j(3) === 0.0)
  }

  test("JaccardBoundsRule rewrite preserves results and injects size() conjuncts") {
    val s2 = spark.newSession()
    s2.experimental.extraOptimizations = Seq(JaccardBoundsRule)
    import s2.implicits._
    // parquet-backed input — a literal LocalRelation would be folded
    // away entirely and leave no Filter to rewrite
    val tmp = java.nio.file.Files.createTempDirectory("jrule").toString + "/p"
    Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("a", "a")),
      (Seq("a", "b", "c", "d", "e", "f"), Seq("a"))
    ).toDF("x", "y").write.parquet(tmp)
    val df = s2.read.parquet(tmp)
    val filtered = df.filter(Kernels.jaccardSim(col("x"), col("y")) >= lit(0.5))
    val plan = filtered.queryExecution.optimizedPlan.toString
    assert(plan.contains("size("), s"bounds not injected:\n$plan")
    // duplicate-bearing pair (J=1.0) must survive the distinct-size bound
    val got = filtered.select(size(col("x")).as("sx")).as[Int].collect().sorted
    assert(got === Array(1, 3))
  }

  test("rule is idempotent under repeated application") {
    val s2 = spark.newSession()
    s2.experimental.extraOptimizations = Seq(JaccardBoundsRule, JaccardBoundsRule)
    import s2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("jrule2").toString + "/p"
    Seq((Seq("a", "b"), Seq("a", "b"))).toDF("x", "y").write.parquet(tmp)
    val df = s2.read.parquet(tmp)
    val filtered = df.filter(Kernels.jaccardSim(col("x"), col("y")) >= lit(0.9))
    assert(filtered.count() === 1)
    val plan = filtered.queryExecution.optimizedPlan.toString
    // exactly one bounds conjunct pair per jaccard predicate
    assert(plan.split("array_distinct").length - 1 <= 4, plan)
  }
}
