package graft

import org.apache.spark.sql.SparkSession

/** Dev-only round-3 timing probe: run named SparkEntry queries once,
  * print wall seconds (post-warmup, same session config as Bench).
  */
object ProbeR3 {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)", "count(distinct id % 100)").count()
    if (args.headOption.contains("ssjoin_stages")) { ssjoinStages(spark, dir); spark.stop(); return }
    val names = if (args.nonEmpty) args.toSeq else Seq("q_ssjoin_exact")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"PROBE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }

  private def ssjoinStages(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val threshold = 0.5
    val docs0 = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val truncated = docs0.select((col("doc_id") + 1000000).as("doc_id"),
      substring(col("text"), 1, 200).as("text"))
    val docs = graft.operators.SetOps.concat(docs0, truncated)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val sh = docs.select(col("doc_id").as("id"),
      array_distinct(graft.plans.Kernels.wordShingles(col("text"), 3)).as("sh"))
      .withColumn("sz", size(col("sh"))).filter(col("sz") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingles")(sh.count())
    val posting = sh.select(col("id"), col("sz"), explode(col("sh")).as("shingle"))
    time("posting")(posting.count())
    val dfTab = posting.groupBy("shingle").agg(count(lit(1)).as("df"))
    time("dfTab")(dfTab.count())
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy(col("df"), col("shingle"))
    val prefix = posting.join(dfTab, Seq("shingle"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")).cast("int") + 1)
      .select(col("id"), col("sz"), col("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("prefix")(prefix.count())
    val joined = prefix.as("x").join(prefix.as("y"), Seq("shingle"))
      .filter(col("x.id") < col("y.id") &&
        lit(threshold) * col("y.sz") <= col("x.sz") &&
        lit(threshold) * col("x.sz") <= col("y.sz"))
    time("cand-raw")(joined.count())
    val cand = joined.select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    time("cand-distinct")(cand.count())
    val verified = cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.plans.Kernels.jaccardSim(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    time("verify")(verified.count())
  }
}
