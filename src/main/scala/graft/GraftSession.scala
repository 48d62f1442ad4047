package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory with the defaults this engine assumes.
  *
  * Local testing runs `local[32]` in one JVM; the same settings
  * (AQE on, sensible shuffle partitioning, UTC) are what we would
  * ship as cluster defaults — only `master` changes on a real
  * cluster.
  */
object GraftSession {

  def local(cores: Int = 32): SparkSession = builder(s"local[$cores]").getOrCreate()

  def builder(master: String): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      // graft kernels as SQL functions, the as-of planner strategy, and
      // the ASOF JOIN SQL syntax (delegating parser + resolution rule)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // NOTE (measured, r7): raising
      // spark.sql.objectHashAggregate.sortBased.fallbackThreshold to keep
      // TypedImperativeAggregate groupings hash-based is a LOSS here —
      // 262144 timed 3.46 s vs 2.38 s at the default 128 on
      // q_groupby_accs (150k groups, 11 aggregates). Sort-based
      // aggregation keeps ONE object buffer live per task while the hash
      // map churns 150k histogram objects through the GC. Keep the
      // default.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // plan strings are rendered by AQE on EVERY plan update (and by
      // the UI/event log); the default length cap is effectively
      // unlimited, so a deep multi-stage dedup plan can spend more
      // memory on its own explain string than on its data — 100 k chars
      // is plenty for humans and bounds the renderer
      .config("spark.sql.maxPlanStringLength", "100000")
      // the generated-class cache defaults to 100 entries — one multi-stage
      // dedup pipeline alone generates ~80 wholestage units, so a pipeline
      // run after ANY other work finds every entry evicted, regenerates the
      // classes, and pays HotSpot JIT for each fresh class name all over
      // again (measured: a 20-query prefix makes q_containment_dedup spend
      // 29.5 s of JIT time and run 25.7 s vs 3.9 s warm; at 5000 entries the
      // second run generates 0 classes). Identical plans re-run across a
      // long pipeline are the norm, not the exception; ~12000 classes at
      // ~10-100 KB of retained source+bytecode each is a bounded ~0.5-1 GB
      // cost on any driver that runs multi-query workloads (the full bench
      // generates ~5-6k distinct units per pass — the cache must hold a
      // whole pass for interleaved reps to reuse anything)
      .config("spark.sql.codegen.cache.maxEntries", "12000")
      // shuffle files free only when their ShuffleDependency is GC'd;
      // the 30 min default periodic GC is tuned for idle services, not
      // a curation pipeline churning corpus-scale shuffles back to back
      // — dead shuffle output of prior stages otherwise accumulates on
      // local disk until ENOSPC (observed at sf10)
      .config("spark.cleaner.periodicGC.interval", "5min")
      .config("spark.ui.enabled", "false")
}

/** Loaders for the driver-generated parquet test tables. */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from an sf dir; filters/projections push down to parquet. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
