package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard for work-amplifying pipeline heads.
  *
  * Spark sizes a scan's task count by INPUT BYTES
  * (`spark.sql.files.maxPartitionBytes`), which is the right model when
  * downstream work is proportional to bytes read. The dedup/tokenizer
  * pipelines break that proportionality at their first stage: a word-
  * shingle explode inflates a compressed-text scan ~10-100× and the
  * per-row kernels (64-hash minhash signatures, centroid assignment)
  * multiply CPU per byte again. A corpus that arrives as ONE small
  * highly-compressed file — a single 27 MB single-row-group parquet
  * monolith in the measured case — therefore scans as ONE task that
  * carries the whole explode+partial-agg stage while every other core
  * idles (measured in the r14 sf10 rehearsal: a 28-minute single-task
  * straggler over 500 k docs with 31 cores idle).
  *
  * [[scanAware]] repartitions such inputs to `defaultParallelism` before
  * the amplifying stage. The rebalance is CONDITIONAL on the scan being
  * pathologically under-split (fewer than half the cores' worth of
  * splits) AND carrying enough bytes to matter — so:
  *
  *  - on a real many-file corpus (any 10 TB+ table is thousands of
  *    splits) the condition is false and the plan is untouched: the
  *    "text never shuffles" posture of the dedup pipelines holds exactly
  *    where its cost argument matters;
  *  - on spec fixtures (KBs) the size floor keeps pinned plans stable;
  *  - on a monolith input the one-time round-robin shuffle costs
  *    O(input bytes) — strictly cheaper than leaving 10-100× that volume
  *    single-threaded after the explode.
  *
  * Driver-only cost: one physical-plan partition count plus a stats
  * lookup; no job runs.
  */
object Rebalance {

  /** Default size floor: below 8 MB total even a single-task amplified
    * stage completes in seconds — rebalancing tiny inputs would just
    * add an Exchange to every fixture-scale plan.
    */
  val DefaultMinBytes: Long = 8L << 20

  def scanAware(df: DataFrame, minTotalBytes: Long = DefaultMinBytes): DataFrame = {
    if (df.isStreaming) return df
    val sc = df.sparkSession.sparkContext
    val target = sc.defaultParallelism
    // cheap checks first: logical-stats size floor (driver metadata),
    // then the physical split count
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < minTotalBytes) return df
    val parts = df.rdd.getNumPartitions
    if (parts > 0 && parts * 2 < target) df.repartition(target) else df
  }
}
