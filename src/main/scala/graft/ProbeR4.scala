package graft

import org.apache.spark.sql.SparkSession

/** Round-4 timing probe: where do io_parquet_save's 4.7 s go? */
object ProbeR4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    println(s"rows=${li.count()} partitions=${li.rdd.getNumPartitions}")
    val tmp = java.nio.file.Files.createTempDirectory("probe_r4").toString

    // warmup write path
    li.limit(1000).write.mode("overwrite").parquet(s"$tmp/warm.parquet")

    timed("plain write.parquet (no fanout)") {
      li.write.mode("overwrite").parquet(s"$tmp/a.parquet")
    }
    timed("fanout repartition(32) + write") {
      li.repartition(32).write.mode("overwrite").parquet(s"$tmp/b.parquet")
    }
    timed("Writers.save (current)") {
      graft.sources.Writers.save(li, s"$tmp/c.parquet")
    }
    timed("write uncompressed") {
      li.repartition(32).write.mode("overwrite").option("compression", "none").parquet(s"$tmp/d.parquet")
    }
    timed("write zstd") {
      li.repartition(32).write.mode("overwrite").option("compression", "zstd").parquet(s"$tmp/e.parquet")
    }
    timed("csv write (current toCsv)") {
      graft.sources.Writers.toCsv(li, s"$tmp/f.csv")
    }
    timed("csv write no-fanout") {
      li.write.mode("overwrite").option("header", "true").csv(s"$tmp/g.csv")
    }
    timed("csv write fanout no-header-opts") {
      li.repartition(32).write.mode("overwrite").csv(s"$tmp/h.csv")
    }
    timed("csv read typed (current)") {
      println("  rows=" + graft.sources.Readers.readCsv(spark, s"$tmp/f.csv").count())
    }
    // second run of each to split JIT from steady-state
    timed("2nd Writers.save") {
      graft.sources.Writers.save(li, s"$tmp/c2.parquet")
    }
    timed("2nd toCsv") {
      graft.sources.Writers.toCsv(li, s"$tmp/f2.csv")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    spark.stop()
  }
}
