package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.storage.StorageLevel

/** Lifecycle owner for a pipeline's persisted intermediates.
  *
  * The dedup/decontaminate pipelines persist frames that are referenced
  * several times WITHIN the single plan they return (e.g. a shingle frame
  * feeds the band explode and both verify joins) — the persist is what
  * makes one caller action compute the shingles once, not three times.
  * But the functions return lazily, so they cannot `finally`-unpersist:
  * the cache must survive until the caller's terminal action. Relying on
  * ContextCleaner GC (the round-4 state) leaks storage in a long-lived
  * session running batch after batch — zombie RDDs accumulate until
  * eviction thrash.
  *
  * `CacheScope` closes the gap without giving up laziness: a pipeline
  * persists its intermediates through the scope, then seals the scope
  * onto its result frame. A [[QueryExecutionListener]] watches for the
  * first query execution (success OR failure) whose analyzed plan
  * contains the result plan — i.e. the caller's first action on the
  * result or anything derived from it — and unpersists everything, then
  * unregisters itself. A pipeline result that is never executed keeps
  * its listener until session close and its caches until ContextCleaner
  * eviction — exactly the old behavior, never worse.
  *
  * Re-running the result frame after its first action recomputes without
  * the cache (correct, one-shot cost); pipelines are built per-call, so
  * every fresh call gets fresh caches.
  */
private[graft] final class CacheScope {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` (MEMORY_AND_DISK) and register it for release. */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    frames.synchronized { frames += p }
    p
  }

  /** Register an already-persisted frame for release (for pipelines that
    * manage persistence inline, e.g. an iterative loop's final state).
    */
  def track(df: DataFrame): DataFrame = {
    frames.synchronized { frames += df }
    df
  }

  /** Release everything now (for pipelines that DO own an eager terminal
    * action and can `finally` this).
    */
  def releaseNow(): Unit = {
    val fs = frames.synchronized { val s = frames.toList; frames.clear(); s }
    fs.foreach(df => try df.unpersist(blocking = false) catch { case _: Throwable => () })
  }

  /** Seal the scope: everything persisted so far is unpersisted after the
    * first action that consumes the returned frame (or a plan containing
    * it). Returns `result` wrapped in a uniquely-named no-op subquery
    * alias — the listener's marker (see [[CacheScope.install]]).
    */
  def releaseAfter(result: DataFrame): DataFrame = {
    val toRelease = frames.synchronized { val s = frames.toList; frames.clear(); s }
    if (toRelease.isEmpty) return result
    CacheScope.install(result, toRelease)
  }
}

private[graft] object CacheScope {
  /** Live (unfired) listeners, oldest first. Bounded: a session that
    * builds pipelines speculatively and never executes them would
    * otherwise accumulate listeners that canonicalize-scan every later
    * query forever — past the cap the oldest listener is ABANDONED
    * (unregistered, caches left alone for ContextCleaner, exactly the
    * pre-scope behavior). Abandoning, not force-unpersisting: the
    * pipeline may still be awaiting its first action, and dropping its
    * caches early would make that action recompute the multiply-
    * referenced intermediates the persist exists for. This keeps the
    * "never worse than the old behavior" guarantee in both directions.
    */
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[ReleaseListener]()
  private val maxLive = 64

  /** Diagnostic: count of sealed-but-unfired listeners (a listener that
    * stays live after its pipeline's first action indicates the release
    * event was missed — e.g. a dropped listener-bus event — and its
    * caches are riding on ContextCleaner). Read by the bench-context
    * profiler; not a public API.
    */
  private[graft] def liveCount: Int = live.size

  private final class ReleaseListener(
      spark: org.apache.spark.sql.SparkSession,
      tag: String,
      toRelease: List[DataFrame]) extends QueryExecutionListener {
    private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    // match on the scope's unique SubqueryAlias marker, NOT canonical
    // plan equality: two independently built pipelines over identical
    // inputs share a canonical form, so equality matching let the first
    // pipeline's action drain the second's caches before its own first
    // action (full recompute). The marker is unique per seal, and the
    // scan is a name test per node — no canonicalization of every
    // subsequent query while the listener is live.
    private def matches(qe: QueryExecution): Boolean =
      try qe.analyzed.exists {
        case a: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
          a.identifier.name == tag
        case _ => false
      } catch { case _: Throwable => false }
    def forceRelease(): Unit =
      if (done.compareAndSet(false, true)) {
        toRelease.foreach(df =>
          try df.unpersist(blocking = false) catch { case _: Throwable => () })
        try spark.listenerManager.unregister(this) catch { case _: Throwable => () }
        live.remove(this)
      }

    /** Stop watching without unpersisting — the caches fall back to
      * ContextCleaner lifetime (the pre-scope behavior).
      */
    def abandon(): Unit =
      if (done.compareAndSet(false, true)) {
        try spark.listenerManager.unregister(this) catch { case _: Throwable => () }
        live.remove(this)
      }
    // short-circuit: once fired (or abandoned), later in-flight events
    // skip the subtree scan entirely
    private def fire(qe: QueryExecution): Unit =
      if (!done.get && matches(qe)) forceRelease()
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      fire(qe)
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      fire(qe)
  }

  private val sealSeq = new java.util.concurrent.atomic.AtomicLong()

  private def install(result: DataFrame, toRelease: List[DataFrame]): DataFrame = {
    val spark = result.sparkSession
    // the marker: a uniquely-named no-op subquery alias wrapped around
    // the result. SubqueryAlias survives analysis (it is only eliminated
    // by the optimizer), so ANY downstream plan embedding the sealed
    // frame carries the alias node in its analyzed form — and the name
    // is unique per seal, so equal-shaped sibling pipelines never
    // cross-fire
    val tag = s"__graft_scope_${sealSeq.incrementAndGet()}"
    val tagged = result.as(tag)
    val l = new ReleaseListener(spark, tag, toRelease)
    live.add(l)
    spark.listenerManager.register(l)
    while (live.size > maxLive) {
      val oldest = live.poll()
      if (oldest != null) oldest.abandon()
    }
    tagged
  }
}
