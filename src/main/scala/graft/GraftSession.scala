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
