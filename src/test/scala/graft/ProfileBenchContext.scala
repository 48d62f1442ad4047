package graft

/** Round-14 directive-2 harness: reproduce and ATTRIBUTE the r13
  * q_containment bench-context anomaly — 173.6 s inside the 62-row sf1
  * bench window (both reps equally slow) vs 29.2 s in TimeQ isolation
  * with the same code and bit-identical data. An operator that is 6×
  * slower after ~30 predecessor pipelines is a resource-hygiene bug
  * (leaked persists / codegen-cache growth / GC thrash), not window
  * noise — this harness replays the EXACT bench prefix and samples the
  * health counters that distinguish the hypotheses.
  *
  * Shape matches Bench precisely: local[32], 32 shuffle partitions,
  * noop-sink action, `spark.catalog.clearCache()` between tasks. After
  * every task it prints one line:
  *
  *   [ctx] <name> <sec>s rdds=<persistent RDDs> storeMB=<block-manager
  *   memUsed> gcMs=<GC time in this task> heapMB=<used after task>
  *   scopes=<live CacheScope listeners>
  *
  * and times the target (default q_containment) at the end, then once
  * more after a System.gc() — separating "heap is genuinely full"
  * (slow both times, high gcMs) from "garbage not yet collected"
  * (fast after the forced GC).
  *
  * Usage: Test/runMain graft.ProfileBenchContext <sfDir> [target] [nPrefix]
  *   nPrefix: how many of the 32 recorded prefix tasks to replay
  *   (0 = isolation baseline in the same JVM shape).
  */
object ProfileBenchContext {

  // the 32 tasks that preceded q_containment in BENCH_SF1B_r13.json,
  // in the exact recorded order (= SparkEntry.queries iteration order
  // filtered by the rehearsal subset)
  val prefix: Seq[String] = Seq(
    "q_heavy_hitters", "q_knn", "q_topk_group", "q_histogram",
    "q_sessionize", "q_components_dist", "q1_agg", "q_rolling_stream",
    "q_ngram_pairs", "q_simhash_pairs", "q_dedup_stream_batch",
    "q_minhash_pairs", "q_join_salted", "q_join_inner", "q_ssjoin_exact",
    "q_ann_ivfsq", "q_canonical", "q_semi", "q_containment_dedup",
    "q_join_left", "q_zorder", "q_pair_budget", "q_dedup_exact",
    "q_upsert_stream", "q_dedup_lines", "q_dedup_ingest",
    "q_ann_enrich_batch", "q_ann_pq", "q_events_window",
    "q_containment_join", "q_distinct_keys", "q_lookup")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val target = if (args.length > 1) args(1) else "q_containment"
    val nPrefix = if (args.length > 2) args(2).toInt else prefix.length
    val spark = GraftSession.builder("local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def storeMB: Long = spark.sparkContext.getExecutorMemoryStatus.values
      .map { case (max, remaining) => max - remaining }.sum / (1024 * 1024)
    def heapMB: Long = {
      val r = Runtime.getRuntime
      (r.totalMemory - r.freeMemory) / (1024 * 1024)
    }
    def rdds: Int = spark.sparkContext.getPersistentRDDs.size
    def scopes: Int = graft.operators.CacheScope.liveCount

    val nCores = Runtime.getRuntime.availableProcessors
    def run(name: String, tag: String): Double = {
      val s0 = HostMeters.snap()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[ctx] $name: ${e.getMessage}") }
      val d = HostMeters.delta(s0, HostMeters.snap())
      spark.catalog.clearCache()
      // cpuFrac ≈ 1 with low steal/gc ⇒ compute-bound (the plan);
      // stealFrac high ⇒ co-tenant contention (the window);
      // wall ≫ cpu with low steal ⇒ the JVM waited (lock/disk/listener)
      println(f"[ctx] $tag $name ${d.wallSec}%.2fs " +
        f"cpuFrac=${d.processCpuSec / math.max(d.wallSec, 1e-9) / nCores}%.2f " +
        f"stealFrac=${d.stealFrac(nCores)}%.2f gcS=${d.gcSec}%.1f " +
        f"rdds=$rdds storeMB=$storeMB heapMB=$heapMB scopes=$scopes")
      d.wallSec
    }

    println(s"[ctx] prefix=$nPrefix target=$target dir=$dir " +
      f"heap0=${heapMB}MB gc0=${gcMs}ms")
    prefix.take(nPrefix).foreach(n => run(n, "pre"))
    run(target, "target-rep1")
    run(target, "target-rep2")
    // forced full GC: if rep3 is fast again, the slowdown was collectable
    // garbage (allocation pressure), not live-set growth
    System.gc(); Thread.sleep(2000)
    println(f"[ctx] post-gc heapMB=$heapMB rdds=$rdds scopes=$scopes")
    run(target, "target-postgc")
    spark.stop()
  }
}
