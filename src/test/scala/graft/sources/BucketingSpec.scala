package graft.sources

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("joins between co-bucketed tables run without a shuffle exchange") {
    val facts = (1 to 1000).map(i => (i.toLong % 97, s"f$i")).toDF("k", "fv")
    val dims = (0L until 97L).map(i => (i, s"d$i")).toDF("k", "dv")
    Writers.saveBucketed(facts, "graft_b_facts", Seq("k"), 4)
    Writers.saveBucketed(dims, "graft_b_dims", Seq("k"), 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_b_facts")
        .join(spark.table("graft_b_dims"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() === 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_b_facts")
      spark.sql("DROP TABLE IF EXISTS graft_b_dims")
    }
  }
}
