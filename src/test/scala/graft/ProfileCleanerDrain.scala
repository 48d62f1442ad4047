package graft

/** One-off: does letting the async ContextCleaner/BlockManager cleanup
  * drain between tasks (sleep after the inter-task System.gc) restore a
  * bench-context-poisoned row to its isolation time? Replays a recorded
  * bench prefix with Bench-identical hygiene (clearCache + gc) plus a
  * configurable post-gc sleep, then times the target twice.
  *
  * Usage: ProfileCleanerDrain <sfDir> <target> <sleepMs> <prefixCsv>
  */
object ProfileCleanerDrain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val target = args(1)
    val sleepMs = args(2).toLong
    val prefix = args(3).split(',').map(_.trim).filter(_.nonEmpty)
    val spark = GraftSession.builder("local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def jitMs: Long = java.lang.management.ManagementFactory
      .getCompilationMXBean.getTotalCompilationTime
    // Spark codegen (Janino) cumulative compile wall and generated-class
    // count — the codahale metrics behind the CodegenMetrics source
    def cgMs: Long =
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getSnapshot.getValues.sum / 1000000L
    def cgN: Long =
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount
    def run(name: String, tag: String): Unit = {
      val (g0, j0, c0, n0) = (gcMs, jitMs, cgMs, cgN)
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[drain] $name: ${e.getMessage}") }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[drain] $tag $name $sec%.2f s " +
        f"gc=${(gcMs - g0) / 1000.0}%.1f jit=${(jitMs - j0) / 1000.0}%.1f " +
        f"cgCompile=${(cgMs - c0) / 1000.0}%.1f cgClasses=${cgN - n0}")
      spark.catalog.clearCache()
      System.gc()
      if (sleepMs > 0) Thread.sleep(sleepMs)
    }
    println(s"[drain] sleepMs=$sleepMs prefix=${prefix.length}")
    prefix.foreach(n => run(n, "pre"))
    // drain the JIT compile queue: sleep while cumulative JIT time still
    // grows (compiler threads busy), bounded at 120 s
    locally {
      val t0 = System.nanoTime()
      var last = jitMs
      var idle = 0
      while (idle < 3 && (System.nanoTime() - t0) < 120e9) {
        Thread.sleep(500)
        val now = jitMs
        if (now - last < 20) idle += 1 else idle = 0
        last = now
      }
      println(f"[drain] jit-drain took ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    run(target, "target-rep1")
    run(target, "target-rep2")
    spark.stop()
  }
}
