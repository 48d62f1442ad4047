package graft

import org.apache.spark.sql.functions._

/** Dev tool: attribute q_kmeans cost (r12 "what's wrong" #1) — is the
  * 0.87 → 1.32 s move the k-means|| init added for clustering purity,
  * or something else? Times the KMeans fit alone under both init modes
  * on the exact q_kmeans sample, then the query's verdict tail.
  */
object ProfileKmeans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val blobs = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
      .withColumn("blob", (col("doc_id") % 5).cast("int"))
      .withColumn("embedding", array((0 until 8).map(j =>
        (col("blob") * lit(10.0) +
          sin(col("doc_id") * lit((31 + j).toDouble)) * lit(0.5)).cast("float")): _*))
      .persist()
    blobs.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm the JIT/codegen once
    graft.ml.Ann.trainCentroids(blobs, "embedding", nList = 5, sampleN = 2000,
      seed = 99, maxIter = 3, initMode = "random")
    for (rep <- 1 to 3; mode <- Seq("random", "k-means||")) {
      time(s"fit[$mode] rep$rep") {
        graft.ml.Ann.trainCentroids(blobs, "embedding", nList = 5, sampleN = 2000,
          seed = 1000L + rep * 10 + mode.length, maxIter = 10, initMode = mode)
      }
    }
    for (rep <- 1 to 3) {
      time(s"q_kmeans full rep$rep") {
        SparkEntry.queries("q_kmeans")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
