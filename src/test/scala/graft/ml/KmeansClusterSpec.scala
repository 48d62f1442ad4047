package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmeansClusterSpec extends SparkSpec {
  import spark.implicits._

  private def blobs(n: Int, k: Int) = (0 until n).map { i =>
    val blob = i % k
    (i.toLong, blob, Array.tabulate(6)(j => (blob * 10.0 + math.sin(i * 31 + j) * 0.4).toFloat))
  }.toDF("id", "blob", "embedding").repartition(4)

  test("kmeansCluster recovers planted blobs 1:1; deterministic across runs") {
    val d = blobs(400, 4)
    val c1 = Ann.kmeansCluster(d, "embedding", k = 4, sampleN = 400)
    assert(c1.columns.toSeq === Seq("id", "blob", "embedding", "cluster"))
    // purity both directions
    val blobSpread = c1.groupBy("blob").agg(countDistinct($"cluster").as("nc"))
      .agg(max($"nc")).first().getLong(0)
    val clusterSpread = c1.groupBy("cluster").agg(countDistinct($"blob").as("nb"))
      .agg(max($"nb")).first().getLong(0)
    assert(blobSpread === 1L && clusterSpread === 1L)
    // seeded + memoized: a second call assigns identically
    val a1 = c1.select("id", "cluster").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = Ann.kmeansCluster(d, "embedding", k = 4, sampleN = 400)
      .select("id", "cluster").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 === a2)
  }

  test("clusterSizes reports every cluster incl. zero-count; fracs sum to 1") {
    val d = blobs(100, 2) // only 2 real blobs
    val c = Ann.kmeansCluster(d, "embedding", k = 2, sampleN = 100)
    val sizes = Ann.clusterSizes(c, k = 2).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(sizes.keySet === Set(0, 1))
    assert(sizes.values.map(_._1).sum === 100L)
    assert(math.abs(sizes.values.map(_._2).sum - 1.0) < 1e-12)
    // a spine row survives even when a cluster id never appears in the
    // frame: drop cluster-1 rows and re-report
    val sizes2 = Ann.clusterSizes(c.filter($"cluster" === 0), k = 2).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes2(1) === 0L)
  }

  test("cluster assignment is stateless: streams per micro-batch, " +
      "identical to the batch assignment") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val d = blobs(200, 3)
    val cents = Ann.trainCentroids(d, "embedding", nList = 3, sampleN = 200,
      initMode = "k-means||")
    val batchAssign = d.select($"id",
      element_at(graft.plans.Kernels.nearestCentroids($"embedding", cents, 1), 1)
        .as("cluster")).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val in = MemoryStream[(Long, Array[Float])]
    val streamed = in.toDF().toDF("id", "embedding").select($"id",
      element_at(graft.plans.Kernels.nearestCentroids($"embedding", cents, 1), 1)
        .as("cluster"))
    val q = streamed.writeStream.outputMode("append")
      .format("memory").queryName("cluster_stream").start()
    try {
      val rows = d.select("id", "embedding")
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      in.addData(rows.take(100).toIndexedSeq); q.processAllAvailable()
      in.addData(rows.drop(100).toIndexedSeq); q.processAllAvailable()
      val got = spark.sql("SELECT id, cluster FROM cluster_stream")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === batchAssign)
    } finally q.stop()
  }

  test("kmeansCluster refuses an existing 'cluster' column") {
    val d = blobs(20, 2).withColumn("cluster", lit(9))
    val e = intercept[IllegalArgumentException] {
      Ann.kmeansCluster(d, "embedding", k = 2)
    }
    assert(e.getMessage.contains("cluster"))
  }
}
