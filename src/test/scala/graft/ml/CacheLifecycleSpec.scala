package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persist lifecycle: every pipeline's cached intermediates must be gone
  * after the caller's first action on its result — a long-lived curation
  * session running batch after batch must not accumulate zombie cached
  * RDDs (round-4 finding: persists relied on ContextCleaner GC).
  * Release rides a QueryExecutionListener (async listener bus), so the
  * assertions poll briefly.
  */
class CacheLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def docs: DataFrame = (0 until 200).map { i =>
    val base = s"alpha beta gamma tok${i % 7} tok${i % 11} delta epsilon zeta " +
      s"eta theta iota kappa lambda mu nu xi tok${i % 13} omicron pi rho sigma tau"
    (i.toLong, if (i >= 150) s"alpha beta gamma tok${i % 7} UNIQUE $i" else base)
  }.toDF("doc_id", "text")

  private def vecs: DataFrame = spark.range(200).selectExpr("id AS vec_id",
    "transform(sequence(0, 15), j -> cast(sin(id * 31 + j) AS float)) AS embedding")

  // relative to a baseline snapshot: the assertions are about THIS
  // pipeline's caches, not about what an earlier suite in the shared
  // session may have left behind
  private def baseline: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def assertCacheDrains(label: String, base: Set[Int], allow: Int = 0): Unit = {
    val deadline = System.currentTimeMillis + 20000
    def leaked = spark.sparkContext.getPersistentRDDs.filter(kv => !base.contains(kv._1))
    while (leaked.size > allow && System.currentTimeMillis < deadline) Thread.sleep(100)
    val left = leaked
    assert(left.size <= allow, s"$label left ${left.size} persisted RDDs: " +
      left.values.map(_.toString).mkString("; "))
  }

  private def drained(label: String)(result: => DataFrame): Unit = {
    val base = baseline
    result.count() // the terminal action that triggers the release
    assertCacheDrains(label, base)
  }

  test("minhashPairs releases its caches after the terminal action") {
    drained("minhashPairs")(Dedup.minhashPairs(docs, "doc_id", "text"))
  }

  test("identical sibling pipelines seal with distinct markers (no listener cross-fire)") {
    // two independently built pipelines over the SAME inputs share a
    // canonical plan form — and Spark's CacheManager even shares the
    // cached data between them — so scope release must key on a marker
    // that is unique PER SEAL, not on canonical plan equality: under
    // equality matching, A's first action fired B's listener too,
    // disarming B's lifecycle before B ever ran.
    val base = baseline
    val a = Dedup.minhashPairs(docs, "doc_id", "text")
    val b = Dedup.minhashPairs(docs, "doc_id", "text")
    def sealTags(df: DataFrame): Seq[String] = df.queryExecution.analyzed.collect {
      case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias
          if s.identifier.name.startsWith("__graft_scope_") => s.identifier.name
    }
    val (ta, tb) = (sealTags(a), sealTags(b))
    assert(ta.nonEmpty && tb.nonEmpty, "sealed results carry no scope marker")
    assert(ta.intersect(tb).isEmpty, s"sibling pipelines share a seal marker: $ta vs $tb")
    // both lifecycles complete independently: each action drains, the
    // second pipeline still computes the correct result after the first
    // released (shared CacheManager entries make its frames recompute,
    // never miscount), and nothing leaks or double-releases
    a.count()
    assertCacheDrains("sibling A", base)
    assert(b.count() === a.count())
    assertCacheDrains("sibling B", base)
  }

  test("simhashPairs releases its caches") {
    drained("simhashPairs")(Dedup.simhashPairs(docs, "doc_id", "text"))
  }

  test("jaccardJoinExact releases its caches") {
    drained("jaccardJoinExact")(Dedup.jaccardJoinExact(docs, "doc_id", "text"))
  }

  test("ngramJaccardPairs releases its caches") {
    drained("ngramJaccardPairs")(Dedup.ngramJaccardPairs(docs, "doc_id", "text"))
  }

  test("dedupLines and dedupSpans release their caches") {
    drained("dedupLines")(Dedup.dedupLines(docs, "doc_id", "text"))
    drained("dedupSpans")(Dedup.dedupSpans(docs, "doc_id", "text"))
  }

  test("embeddingPairs and semDedup release their caches") {
    drained("embeddingPairs")(Dedup.embeddingPairs(vecs, "vec_id", "embedding", dim = 16))
    drained("semDedup")(Dedup.semDedup(vecs, "vec_id", "embedding", nList = 4))
  }

  test("dedupedCorpus (pairs → components → winners) releases everything") {
    drained("dedupedCorpus")(
      Dedup.dedupedCorpus(docs, "doc_id", Dedup.minhashPairs(docs, "doc_id", "text")))
  }

  test("distributed connected-components: loop caches drain, checkpoint frees on GC") {
    val base = baseline
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    var labels = Dedup.connectedComponents(pairs, driverThreshold = 0)
    assert(labels.count() === 6L)
    // the explicit persists (edges) drain; what remains are ONLY
    // localCheckpoint blocks — the per-round lineage truncations (each a
    // tiny label frame, count bounded by iterations, freed on GC below)
    // plus the result blocks that let a SECOND action re-read instead of
    // replaying the loop. Inspect via a helper so this test holds no
    // strong reference to retired frames.
    def leftoverDescs: List[String] = spark.sparkContext.getPersistentRDDs
      .filter(kv => !base.contains(kv._1)).values.map(_.toString).toList
    assert(leftoverDescs.forall(_.contains("localCheckpoint")), leftoverDescs.mkString("; "))
    assert(labels.count() === 6L) // second action: blocks re-read, still correct
    // dropping the last reference lets the ContextCleaner free EVERY
    // round's blocks, not just the result's
    labels = null
    val deadline = System.currentTimeMillis + 20000
    def leaked = spark.sparkContext.getPersistentRDDs.filter(kv => !base.contains(kv._1))
    while (leaked.nonEmpty && System.currentTimeMillis < deadline) {
      System.gc(); Thread.sleep(200)
    }
    assert(leaked.isEmpty, leaked.values.map(_.toString).mkString("; "))
  }

  test("incremental dedup: batch caches drain; the index is caller-released") {
    val base = baseline
    val corpus = docs.filter($"doc_id" < 150)
    val idx = Dedup.minhashIndex(corpus, "doc_id", "text")
    val batch = docs.filter($"doc_id" >= 150)
      .select(($"doc_id" + 1000000).as("doc_id"), $"text")
    Dedup.incrementalMinhashPairs(batch, idx, "doc_id", "text").count()
    // batch-scoped caches drain; the index's shingle cache survives (it
    // serves every subsequent batch) until release()
    assertCacheDrains("incremental batch", base, allow = 1)
    idx.release()
    assertCacheDrains("MinhashIndex.release", base)
  }

  test("decontaminate releases its dictionary cache") {
    val bench = docs.filter($"doc_id" % 25 === 0)
      .select(substring($"text", 5, 60).as("bench_text"))
    drained("decontaminate")(
      Decontaminate.decontaminate(docs, "doc_id", "text", bench, "bench_text", n = 4))
  }

  test("bloomPruneJoin releases the small-side cache") {
    val large = spark.range(1000).selectExpr("id AS k", "id * 2 AS v")
    val small = spark.range(50).selectExpr("id * 3 AS sk")
    drained("bloomPruneJoin")(
      graft.operators.Joins.bloomPruneJoin(large, small, "k", "sk"))
  }

  test("listener cap abandons the oldest watcher without dropping its caches") {
    import graft.operators.CacheScope
    import org.apache.spark.storage.StorageLevel
    // oldest scope: cache materialized, result sealed but not actioned
    val s0 = new CacheScope
    val c0 = s0.persist(Seq(1, 2, 3).toDF("v"))
    c0.count() // materialize WITHOUT firing s0 (c0 doesn't contain the sealed result)
    val r0 = s0.releaseAfter(c0.select(($"v" + 1).as("w")))
    // push well past the 64-listener cap (any stale listeners from other
    // suites are abandoned first; 100 guarantees s0 goes too)
    val fillers = (0 until 100).map { i =>
      val s = new CacheScope
      val c = s.persist(Seq(i).toDF(s"x$i"))
      s.releaseAfter(c.select(col(s"x$i")))
    }
    // s0 was abandoned: acting on its result must NOT unpersist its cache
    // (the cap evicts the WATCHER, not the cache — a pipeline still
    // awaiting its action keeps what that action depends on)
    r0.count()
    Thread.sleep(1500) // listener bus quiesce — nothing should fire for s0
    assert(c0.storageLevel != StorageLevel.NONE,
      "abandoned scope's cache was dropped — cap must not unpersist")
    c0.unpersist(blocking = false)
    // fire the filler listeners so they don't watch later suites' queries
    fillers.foreach(_.count())
  }

  test("a failed action also releases (onFailure path)") {
    val base = baseline
    val bad = Dedup.minhashPairs(docs, "doc_id", "text")
      .withColumn("boom", expr("assert_true(jaccard > 2.0, 'boom')"))
      .filter(col("boom").isNull)
    intercept[Exception](bad.count())
    assertCacheDrains("failed action", base)
  }
}
