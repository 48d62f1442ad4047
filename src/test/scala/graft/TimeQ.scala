package graft
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.builder("local[16]")
      .config("spark.sql.shuffle.partitions", "16").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[timeq] $name ${(System.nanoTime()-t0)/1e9}%.2f s")
      // same shuffle-file hygiene as Bench.timeOne: without a gc the
      // prior queries' dead shuffle output stays on disk and large-sf
      // sequences ENOSPC mid-run
      spark.catalog.clearCache()
      System.gc()
    }
  }
}
