package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Rebalance.scanAware]] — the monolith-input guard for work-
  * amplifying pipeline heads (shingle explode, centroid assignment).
  * The contract has three sides: under-split + big enough → rebalance
  * to defaultParallelism; well-split or tiny → IDENTITY (no extra
  * exchange — fixture-scale plans and the at-scale "text never
  * shuffles" posture both depend on this); streaming → untouched.
  */
class RebalanceSpec extends SparkSpec {
  import spark.implicits._

  test("under-split input over the size floor rebalances to defaultParallelism") {
    val df = spark.range(1000).coalesce(1).select($"id", lit("x").as("t"))
    assert(df.rdd.getNumPartitions === 1)
    val out = Rebalance.scanAware(df, minTotalBytes = 1L)
    assert(out.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
  }

  test("under-split input below the default size floor is untouched") {
    val df = spark.range(100).coalesce(1).select($"id", lit("x").as("t"))
    val out = Rebalance.scanAware(df) // default 8 MB floor; this is ~KBs
    assert(out eq df, "tiny input must not pay a rebalance shuffle")
  }

  test("well-split input is identity even over the floor") {
    val df = spark.range(1000)
      .repartition(spark.sparkContext.defaultParallelism)
      .select($"id", lit("x").as("t"))
    val out = Rebalance.scanAware(df, minTotalBytes = 1L)
    assert(out eq df, "a well-split scan must not re-shuffle")
  }

  test("streaming input passes through untouched") {
    val df = spark.readStream.format("rate").load()
    val out = Rebalance.scanAware(df, minTotalBytes = 1L)
    assert(out eq df)
  }

  test("dedup head plans on fixture-scale parquet stay rebalance-free") {
    // the guard must never add an Exchange to a small-corpus plan: the
    // minhash pipeline on a KB-scale single-file parquet input keeps the
    // same number of shuffles as before the guard existed
    val dir = java.nio.file.Files.createTempDirectory("rebal").toString
    spark.range(200).select($"id".as("doc_id"),
      concat(lit("alpha beta gamma tok"), $"id" % 7, lit(" delta epsilon zeta"))
        .as("text"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/docs.parquet")
    val docs = spark.read.parquet(s"$dir/docs.parquet")
    val sh = graft.ml.Dedup.shingleFrame(docs, "doc_id", "text", 3)
    // physical plan of the shingle head has no exchange at all
    val p = sh.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
