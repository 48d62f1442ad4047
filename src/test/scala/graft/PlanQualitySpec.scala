package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan invariants for the 100 TB posture: these assertions pin
  * the plan SHAPES that make the operators scale — partial (map-side)
  * aggregation, broadcast of small dimensions, filter/projection
  * pushdown to the parquet scans, no stray exchanges. A regression here
  * is a performance bug even when results stay correct.
  */
class PlanQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("q1-shaped agg runs partial+final HashAggregate around one exchange") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val p = plan(li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity"), avg("l_extendedprice")))
    assert("HashAggregate".r.findAllIn(p).size === 2, p) // partial + final
    assert("Exchange".r.findAllIn(p).size === 1, p)
  }

  test("fact-dim join broadcasts the dimension, not the fact") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val supplier = spark.read.parquet(s"$dir/supplier.parquet")
    val p = plan(li.join(supplier, li("l_suppkey") === supplier("s_suppkey")))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("filter and projection reach the parquet scan") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val q = li.filter(col("l_quantity") < 10).select("l_orderkey", "l_quantity")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,"), p)
    // pruned read schema: only the two referenced columns are read
    assert(p.contains("l_orderkey") && !p.contains("l_extendedprice"), p)
  }

  test("schema-first JSONL read is one distributed scan with pruning (no inference job)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl_plan").toString
    try {
      import spark.implicits._
      Seq((1L, "a", 2.0), (2L, "b", 3.0)).toDF("id", "s", "x")
        .repartition(2).write.json(s"$tmp/t.jsonl")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.DoubleType)))
      val q = graft.sources.Readers.readJsonl(spark, s"$tmp/t.jsonl", schema)
        .select("id", "s")
      val p = q.queryExecution.executedPlan.toString
      // a distributed file scan of the json source, projection pruned to
      // the referenced columns (json can't skip bytes like parquet, but
      // the parsed schema must not materialize `x`)
      assert(p.contains("FileScan json"), p)
      assert(p.contains("ReadSchema") && !p.replaceAll("Location.*", "").contains("x:"), p)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("keep-first dedup is an aggregation, not a window sort") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val p = plan(graft.operators.Filters.dropDuplicatesKeepFirst(
      li.select("l_orderkey", "l_linenumber", "l_quantity"),
      Seq("l_orderkey"), Seq("l_linenumber")))
    assert(!p.contains("Window"), p)
    assert("Exchange".r.findAllIn(p).size === 1, p)
  }

  test("top-k is TakeOrdered / rank-limit, not a global sort of everything") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val p = plan(li.orderBy(col("l_extendedprice").desc).limit(5))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("row-index scale path matches the window path; sort is range-partitioned") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ((i * 2654435761L) % 100000, i)).toDF("k", "v")
    val viaWindow = df.withColumn("__rn",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col("k"), col("v"))).cast("long") - 1L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._3)
    val viaDist = graft.operators.Sorts.withRowIndexDistributed(df, Seq(col("k"), col("v")), "__rn")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._3)
    assert(viaDist === viaWindow)
    // the distributed path's sort is a parallel range exchange, not the
    // single-partition funnel a global window would force
    val sortPlan = df.orderBy(col("k"), col("v")).queryExecution.executedPlan.toString
    assert(sortPlan.toLowerCase.contains("rangepartitioning"), sortPlan)
    assert(!sortPlan.contains("SinglePartition"), sortPlan)
  }

  test("unkeyed ffill boundary-carry matches the window path") {
    import spark.implicits._
    val df = (1 to 3000).map { i =>
      (i, if (i % 7 == 0 || i < 5) None else Some(i * 3)) }.toDF("ord", "x")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("ord"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val viaWindow = df.withColumn("x", last(col("x"), ignoreNulls = true).over(w))
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getInt(1))).sortBy(_._1)
    val viaCarry = graft.operators.Imputation.ffillBoundaryCarry(df, Seq("x"), Seq(col("ord")))
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getInt(1))).sortBy(_._1)
    assert(viaCarry === viaWindow)
  }

  test("multi-source NN imputation has no global window and no forced broadcast") {
    import spark.implicits._
    spark.conf.set("graft.rowIndex.localThresholdBytes", "0")
    try {
      val df = (1 to 500).map { i =>
        (i.toDouble, (i % 37).toDouble, if (i % 5 == 0) None else Some(i * 1.5)) }
        .toDF("a", "b", "v")
      val out = graft.operators.Imputation.nearestNeighbour(df, "v", Seq("a", "b"))
      val p = out.queryExecution.executedPlan.toString
      assert(!p.contains("Window"), p)
      assert(out.filter(col("v").isNull).count() === 0)
    } finally spark.conf.unset("graft.rowIndex.localThresholdBytes")
  }

  test("1-D NN imputation scale path matches the window path, no global window") {
    import spark.implicits._
    // duplicates in the source column + null targets on both sides of
    // donors exercise rank ties and the prev/next/equidistant decisions;
    // equal-rank donors carry DIFFERENT values (v depends on i, not src)
    // to prove all three paths share the deterministic min-value
    // tie-break within a rank
    val df = (1 to 2000).map { i =>
      ((i * 13 % 997).toDouble, if (i % 4 == 0) None else Some((i % 89).toDouble))
    }.toDF("src", "v")
    def norm(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getDouble(0), r.getDouble(1))).sorted.toSeq
    val viaWindow = norm(graft.operators.Imputation.nearestNeighbour(
      df, "v", Seq("src")).collect())
    val viaCarry = norm(graft.operators.Imputation.nearestNeighbour1DCarry(
      df, "v", "src").collect())
    // the multi-source EXACT path is the semantic reference: with one
    // source its min_by(struct(dist, value)) tie-break is what both 1-D
    // paths implement
    spark.conf.set("graft.rowIndex.localThresholdBytes", "0")
    try {
      val viaDispatch = norm(graft.operators.Imputation.nearestNeighbour(
        df, "v", Seq("src")).collect())
      assert(viaCarry === viaDispatch) // threshold 0 → dispatch hits the carry path
      // above-threshold 1-D plan: no unpartitioned window, no
      // single-partition exchange anywhere in the executed plan
      val out = graft.operators.Imputation.nearestNeighbour(df, "v", Seq("src"))
      val p = out.queryExecution.executedPlan.toString
      assert(!p.contains("Window"), p)
      assert(!p.contains("SinglePartition"), p)
    } finally spark.conf.unset("graft.rowIndex.localThresholdBytes")
    assert(viaCarry === viaWindow)
  }

  test("no unbounded-FOLLOWING window frames anywhere (WindowExec runs them O(n²))") {
    import spark.implicits._
    // WindowExec evaluates run-accumulating (unboundedPreceding →
    // currentRow) frames incrementally, but re-scans the tail for every
    // row of an unboundedFollowing frame: a 100k-row frame took ~4 min
    // in one task. Forward-looking carries must be expressed as the
    // EXACT reversal over a tie-free order instead. Pin the two shapes
    // that historically regressed: 1-D NN imputation (small path) and
    // the composed as-of join's forward direction.
    val ev = (1 to 500).map(i =>
      (i.toLong, (i * 7 % 101).toDouble, if (i % 5 == 0) None else Some(i.toDouble)))
      .toDF("id", "src", "v")
    val nn = graft.operators.Imputation.nearestNeighbour(ev, "v", Seq("src"))
    assert(!nn.queryExecution.executedPlan.toString.contains("unboundedfollowing$()"),
      nn.queryExecution.executedPlan.toString)
    val l = (1 to 200).map(i => (i.toLong % 7, i.toLong * 10)).toDF("k", "t")
    val r = (1 to 200).map(i => (i.toLong % 7, i.toLong * 10 + 5, i)).toDF("k", "rt", "rv")
    val asof = graft.operators.Joins.asofJoin(
      l, r, Seq("k"), Seq("k"), "t", "rt", Seq("rv"), direction = "forward")
    assert(!asof.queryExecution.executedPlan.toString.contains("unboundedfollowing$()"),
      asof.queryExecution.executedPlan.toString)
  }

  test("upsert forwards one candidate per key per map task (WindowGroupLimit)") {
    import spark.implicits._
    val base = (1 to 2000).map(i => (i.toLong % 50, s"v$i", i.toLong)).toDF("k", "v", "ver")
    val upd = (1 to 100).map(i => (i.toLong % 50, s"u$i", 9999L)).toDF("k", "v", "ver")
    val out = graft.operators.SetOps.upsert(base, upd, Seq("k"), "ver")
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
    assert(out.count() === 50L)
  }

  test("capPerGroup runs a partial WindowGroupLimit before the exchange") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (s"g${i % 20}", i.toLong, i.toLong)).toDF("g", "id", "score")
    val capped = graft.operators.Sampling.capPerGroup(
      df, "g", Seq(org.apache.spark.sql.functions.col("score").desc,
        org.apache.spark.sql.functions.col("id").asc), n = 5)
    val p = capped.queryExecution.executedPlan.toString
    // InferWindowGroupLimit must kick in: only n rows per group per input
    // partition reach the shuffle — the difference between shuffling
    // O(groups x n) and shuffling the corpus at 100 TB
    assert(p.contains("WindowGroupLimit"), p)
    assert(capped.count() === 100L)
  }

  test("exactSample is TakeOrderedAndProject, not a global sort") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val s = graft.operators.Sampling.exactSample(df, "id", 50)
    val p = s.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("importanceResample: broadcast fractions join + TakeOrdered, no corpus sort") {
    import spark.implicits._
    val df = (0L until 2000L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "s")
    val r = graft.operators.Sampling.importanceResample(
      df, "s", "id", Map("a" -> 0.5, "b" -> 0.5), n = 100)
    val p = r.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("temperatureMix: broadcast derived fractions + TakeOrdered, no corpus sort") {
    import spark.implicits._
    val df = (0L until 2000L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "s")
    val r = graft.operators.Sampling.temperatureMix(df, "s", "id", alpha = 0.5, n = 100)
    val p = r.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("DSIR inline scoring is one map stage: no explode, no join, no aggregation") {
    import spark.implicits._
    val corpus = (0L until 50L).map(i => (i, s"alpha beta gamma delta tok$i")).toDF("id", "text")
    val ratios = graft.ml.Dsir.logRatios(corpus, "text", corpus, "text", buckets = 1 << 10)
    // repartition blocks ConvertToLocalRelation from eagerly folding the
    // projection away — the assertions below need a real physical plan
    val scored = graft.ml.Dsir.scoreInline(
      corpus.repartition(2), "text", graft.ml.Dsir.collectRatios(ratios))
    val p = scored.queryExecution.executedPlan.toString
    assert(!p.contains("Generate"), p)   // no explode
    assert(!p.contains("Join"), p)
    assert(!p.contains("Aggregate"), p)
    assert(p.contains("dsirweightexpr") || p.toLowerCase.contains("dsirweight"), p)
  }

  test("distributed connectedComponents labels are lineage-truncated (no loop replay)") {
    import spark.implicits._
    // force the distributed label-propagation path with driverThreshold=0
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = graft.ml.Dedup.connectedComponents(pairs, driverThreshold = 0)
    // localCheckpoint truncates the iterative lineage: the optimized plan
    // must be a bare scan of the checkpointed RDD, not a join tree, so a
    // second action re-reads blocks instead of replaying the loop
    val p = labels.queryExecution.optimizedPlan.toString
    assert(!p.contains("Join"), p)
    assert(p.contains("LogicalRDD") || p.contains("ExistingRDD") || p.contains("Scan"), p)
    val got = labels.as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
    // second action over the same frame: still correct (blocks re-read)
    assert(labels.count() === 5L)
  }

  test("dedupSpans shuffles 8-byte window hashes; text crosses one broadcast join") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val out = graft.ml.Dedup.dedupSpans(docs, "doc_id", "text", minLen = 8)
    // traverse into InMemoryRelation too — the persisted window frame
    // hides its posexplode inside the cached plan
    def deepCollect(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collect { case x => x }.flatMap {
        case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          im +: deepCollect(im.relation.cachedPlan)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a +: deepCollect(a.executedPlan)
        case x => Seq(x)
      }
    val nodes = deepCollect(out.queryExecution.executedPlan)
    // no shuffle carries the text or exploded tokens — window hashes,
    // start positions and per-doc span arrays only
    nodes.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.foreach { e =>
      val cols = e.output.map(_.name).toSet
      assert(!cols.contains("text") && !cols.contains("tok"), s"shuffle carries: $cols")
    }
    // exactly one DISTINCT Generate (the window-hash posexplode, seen
    // through both scans of the shared cached relation); a token-level
    // explode would be a second distinct one
    val generates = nodes.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(generates.map(System.identityHashCode).distinct.size === 1,
      out.queryExecution.executedPlan.toString)
  }

  test("dedup pair pipelines shuffle band keys, not shingle arrays") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val bandRows = docs.select(col("doc_id"),
      explode(graft.functions.Similarity.lshBands(
        graft.plans.Kernels.minhashSig(
          graft.plans.Kernels.wordShingles(col("text"), 3), 64), 16, 4)).as("bandkey"))
    val joined = bandRows.alias("a").join(bandRows.alias("b"), Seq("bandkey"))
    val exchanges = joined.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // every shuffle in the candidate join carries only (id, bandkey)
    exchanges.foreach { e =>
      val cols = e.output.map(_.name).toSet
      assert(!cols.contains("text") && cols.forall(c => c == "doc_id" || c == "bandkey"),
        s"shuffle carries: $cols")
    }
  }

  test("learned-plane ANN search: probe side broadcasts, corpus never shuffles pre-join") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val model = graft.ml.Ann.trainItq(e, "embedding", nPlanes = 6, sampleN = 200)
    val df = graft.ml.Ann.itqKnn(
      graft.ml.Ann.buildItqIndex(e, "vec_id", "embedding", model),
      q, "vec_id", "embedding", model, k = 3, nProbes = 16)
    df.write.format("noop").mode("overwrite").save() // finalize AQE
    val p = plan(df)
    // the tiny exploded probe frame is the broadcast build side — the
    // corpus scans straight into the join with no exchange before it
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // only the post-join top-k shuffle exists, and a PARTIAL
    // WindowGroupLimit prunes candidates to k per query before it —
    // the shuffle payload is k rows per (query, partition), not the
    // whole probed candidate set
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"), p.take(2000))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected at most one hash exchange, got $exchanges")
  }

  test("SQ8 search: queries broadcast, corpus never shuffles before the per-query top-k") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val sq = graft.ml.Ann.trainSq(emb, "embedding")
    val idx = graft.ml.Ann.buildSqIndex(emb, "vec_id", "embedding", sq)
    val p = plan(graft.ml.Ann.sqKnn(idx, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", sq, k = 5))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(2000))
    // candidate pruning before the single per-query exchange
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"), p.take(2000))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected at most one hash exchange, got $exchanges")
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("rangeJoin is a banded hash equi-join, never a nested-loop cartesian") {
    import spark.implicits._
    val pts = spark.range(2000).select(col("id").as("pid"),
      (col("id") % 997).cast("double").as("x"))
    val ivs = spark.range(100).select(col("id").as("iid"),
      (col("id") * 9).cast("double").as("lo"),
      (col("id") * 9 + 25).cast("double").as("hi"))
    val p = plan(graft.operators.Joins.rangeJoin(pts, ivs, "x", "lo", "hi",
      bandWidth = 10L))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }

  test("intervalJoin is a banded hash equi-join, never a nested-loop cartesian") {
    import spark.implicits._
    val as = spark.range(2000).select(col("id").as("aid"),
      (col("id") % 997).cast("double").as("alo"),
      ((col("id") % 997) + 20).cast("double").as("ahi"))
    val bs = spark.range(100).select(col("id").as("bid"),
      (col("id") * 9).cast("double").as("blo"),
      (col("id") * 9 + 25).cast("double").as("bhi"))
    val p = plan(graft.operators.Joins.intervalJoin(as, bs,
      "alo", "ahi", "blo", "bhi", bandWidth = 16L))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }

  test("bm25: idf side broadcasts; no cartesian; corpus text scans once per stat pass") {
    import spark.implicits._
    val docs = Seq.tabulate(50)(i => (i.toLong, s"spark join row $i"))
      .toDF("doc_id", "text").repartition(4)
    val p = plan(graft.ml.Retrieval.bm25(docs, "doc_id", "text",
      Seq("spark", "join")))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("phash batch-vs-corpus probe: batch side broadcasts, corpus never pre-shuffles") {
    import spark.implicits._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val mk = (n: Int, off: Long) => graft.ml.Multimodal.asMediaTable(
      (0 until n).map(i => (i + off, s"payload-$i")).toDF("id", "data")
        .withColumn("bin", $"data".cast("binary")),
      "id", "bin", "image")
    val corpusHashes = graft.ml.Multimodal.perceptualHashes(mk(500, 0L))
    val p = plan(graft.ml.Dedup.hamming64JoinPairs(
      org.apache.spark.sql.functions.broadcast(
        graft.ml.Multimodal.perceptualHashes(mk(3, 9000L))),
      corpusHashes, "media_id", "phash"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // the only exchange is the pair-level distinct, never the corpus scan
    // feeding the band join (BroadcastHashJoin's streamed side is the
    // corpus quad projection directly)
    val joinIdx = p.indexOf("BroadcastHashJoin")
    val preJoin = p.substring(joinIdx)
    assert(!preJoin.contains("Exchange hashpartitioning"),
      "corpus side shuffles before the band join:\n" + p.take(3000))
  }

  test("keyed rolling is one hash-partitioned window, no global sort") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => (i.toLong, s"g${i % 4}", i.toDouble))
      .toDF("i", "g", "v").repartition(4)
    val p = plan(graft.operators.Rolling.rolling(df, Seq("v"), "i", n = 5,
      partitionCols = Seq("g")))
    assert(p.contains("Window"), p)
    // hash partitioning on the key, not a SinglePartition global window
    assert(!p.contains("SinglePartition"), p)
  }

  test("containmentPairs candidate join is a hash equi-join on shingle hashes, no nested loop") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val p = plan(graft.ml.Dedup.containmentPairs(docs, "doc_id", "text", threshold = 0.8))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the candidate pipeline carries 8-byte xxhash64 shingle identities,
    // not the literal n-gram strings
    assert(p.contains("xxhash64"), p)
  }

  test("containmentJoinPairs: probe broadcasts, corpus never shuffles before the join") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val probe = docs.filter(col("doc_id") < 5)
    val q = graft.ml.Dedup.containmentJoinPairs(probe, docs, "doc_id", "text")
    val p = plan(q)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // the only shuffle is the pair-level overlap count (map-side partial
    // agg first) — corpus postings reach the join shuffle-free
    assert("Exchange hashpartitioning\\(id_a".r.findAllIn(p).size === 1, p)
    assert("Exchange".r.findAllIn(p).size === 2, p) // that one + the broadcast
  }

  test("topKPerGroup is partial+final bounded aggregation, not a window sort") {
    import spark.implicits._
    val df = Seq.tabulate(200)(i => (s"g${i % 5}", i.toDouble, i.toLong))
      .toDF("g", "v", "id").repartition(4)
    val p = plan(graft.operators.GroupBy.topKPerGroup(df, Seq("g"), "v", "id", 3))
    // k-bounded heap combines map-side: two ObjectHashAggregate stages
    // (partial + final) around one exchange, and NO window/sort of the
    // full input
    assert("ObjectHashAggregate".r.findAllIn(p).size === 2, p)
    // one hash exchange between them (the RoundRobin one is the test's
    // own .repartition)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Window"), p)
  }

  test("parquet aggregate pushdown: count/min/max answered from footer statistics") {
    // V2 parquet scans can answer whole-table COUNT/MIN/MAX from row-group
    // footers — at 100 TB the difference between touching metadata and
    // scanning the corpus. Off by default; pin that our file layout
    // supports it so profile-style queries can opt in.
    val conf = spark.conf
    val prevV1 = conf.get("spark.sql.sources.useV1SourceList")
    conf.set("spark.sql.parquet.aggregatePushdown", "true")
    conf.set("spark.sql.sources.useV1SourceList", "")
    try {
      val q = spark.read.parquet(s"$dir/lineitem.parquet")
        .agg(count(lit(1)).as("cnt"), min("l_orderkey").as("lo"),
          max("l_orderkey").as("hi"))
      val p = plan(q)
      assert(p.contains("PushedAggregation"), p)
      assert(p.contains("COUNT(*)") && p.contains("MIN(l_orderkey)"), p)
      val r = q.collect().head
      assert(r.getLong(0) === spark.read.parquet(s"$dir/lineitem.parquet").count())
    } finally {
      conf.set("spark.sql.parquet.aggregatePushdown", "false")
      conf.set("spark.sql.sources.useV1SourceList", prevV1)
    }
  }

  test("savePartitioned: a partition-column filter prunes directories at planning time") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_part_plan").toString + "/t"
    val df = Seq.tabulate(300)(i => (i.toLong, s"lang${i % 5}", s"payload $i"))
      .toDF("id", "lang", "text")
    graft.sources.Writers.savePartitioned(df, tmp, Seq("lang"))
    val q = spark.read.parquet(tmp).filter(col("lang") === "lang3")
    val p = plan(q)
    // the filter lands in PartitionFilters (directory pruning), and the
    // scan lists exactly one of the five lang partitions
    assert(p.contains("PartitionFilters") && p.contains("isnotnull(lang"), p)
    assert(q.queryExecution.executedPlan.toString.contains("lang3"), p)
    assert(q.count() === 60)
    // round-trips: partition column values survive the directory encoding
    assert(spark.read.parquet(tmp).select("lang").distinct().count() === 5)
  }

  test("skipping index prunes files before the scan; pruned read ≡ plain filter") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_skip").toString + "/t"
    Seq.tabulate(1000)(i => (i.toLong, s"p$i")).toDF("id", "payload")
      .repartitionByRange(10, col("id"))
      .write.parquet(tmp)
    graft.sources.Layout.writeSkippingIndex(spark, tmp, Seq("id"))
    // the sidecar is metadata: a plain read of the dir still sees 1000 rows
    assert(spark.read.parquet(tmp).count() === 1000)
    val files = graft.sources.Layout.prunedFiles(spark, tmp, "id", 100L, 199L)
    val total = spark.read.parquet(tmp).inputFiles.length
    assert(files.nonEmpty && files.length < total, s"${files.length} of $total")
    val pruned = spark.read.parquet(files: _*)
      .filter(col("id").between(100, 199)).select("id", "payload")
    val plain = spark.read.parquet(tmp)
      .filter(col("id").between(100, 199)).select("id", "payload")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    // a range outside every file's min/max prunes everything
    assert(graft.sources.Layout.prunedFiles(spark, tmp, "id", 5000L, 6000L).isEmpty)
  }

  test("appendWithSkippingIndex: O(batch) sidecar growth; appended range " +
      "prunes correctly; torn-index reads stay conservative") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_skipapp").toString + "/t"
    Seq.tabulate(1000)(i => (i.toLong, s"p$i")).toDF("id", "payload")
      .repartitionByRange(10, col("id"))
      .write.parquet(tmp)
    graft.sources.Layout.writeSkippingIndex(spark, tmp, Seq("id"))
    val sidecarBefore = spark.read.parquet(s"$tmp/_skipping").count()
    // append a disjoint id range in 2 files
    graft.sources.Layout.appendWithSkippingIndex(
      Seq.tabulate(200)(i => (5000L + i, s"n$i")).toDF("id", "payload")
        .repartitionByRange(2, col("id")),
      tmp, Seq("id"))
    val sidecarAfter = spark.read.parquet(s"$tmp/_skipping").count()
    assert(sidecarAfter === sidecarBefore + 2, s"$sidecarBefore -> $sidecarAfter")
    // pruned read over ONLY the appended range touches only new files
    val newFiles = graft.sources.Layout.prunedFiles(spark, tmp, "id", 5000L, 5199L)
    assert(newFiles.length === 2, newFiles.mkString(", "))
    val got = graft.sources.Layout.prunedRead(spark, tmp, "id", 5000L, 5049L)
    assert(got.count() === 50)
    // original ranges still prune to a subset, not the whole dir
    val old = graft.sources.Layout.prunedFiles(spark, tmp, "id", 100L, 199L)
    assert(old.nonEmpty && old.length < spark.read.parquet(tmp).inputFiles.length)
    // plain reads see everything (sidecar stays metadata-only)
    assert(spark.read.parquet(tmp).count() === 1200)
    // appending without a sidecar fails loudly
    val bare = java.nio.file.Files.createTempDirectory("graft_skipapp2").toString + "/t"
    Seq((1L, "x")).toDF("id", "payload").write.parquet(bare)
    val e = intercept[IllegalArgumentException] {
      graft.sources.Layout.appendWithSkippingIndex(
        Seq((2L, "y")).toDF("id", "payload"), bare, Seq("id"))
    }
    assert(e.getMessage.contains("writeSkippingIndex"))
  }

  test("appendWithSkippingIndex: torn-append orphans are indexed exactly once " +
      "by the next append (unknown-set diff, idempotent)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_skiptorn").toString + "/t"
    Seq.tabulate(100)(i => (i.toLong, s"p$i")).toDF("id", "payload")
      .coalesce(1).write.parquet(tmp)
    graft.sources.Layout.writeSkippingIndex(spark, tmp, Seq("id"))
    // simulate a TORN append: data files land (plain parquet append),
    // the process dies before the sidecar write
    Seq.tabulate(50)(i => (1000L + i, s"t$i")).toDF("id", "payload")
      .coalesce(1).write.mode("append").parquet(tmp)
    // index reads are conservative: the orphaned range is invisible
    assert(graft.sources.Layout.prunedFiles(spark, tmp, "id", 1000L, 1049L).isEmpty)
    // the NEXT append adopts the orphans alongside its own batch
    graft.sources.Layout.appendWithSkippingIndex(
      Seq.tabulate(30)(i => (2000L + i, s"n$i")).toDF("id", "payload").coalesce(1),
      tmp, Seq("id"))
    assert(graft.sources.Layout.prunedRead(spark, tmp, "id", 1000L, 1049L).count() === 50)
    assert(graft.sources.Layout.prunedRead(spark, tmp, "id", 2000L, 2029L).count() === 30)
    // exactly one sidecar row per data file — no double-indexing
    val sidecar = spark.read.parquet(s"$tmp/_skipping")
    val dataFiles = spark.read.parquet(tmp).inputFiles.length
    assert(sidecar.count() === dataFiles.toLong, s"sidecar ${sidecar.count()} vs $dataFiles files")
    assert(sidecar.select("file").distinct().count() === sidecar.count())
    // and a re-run with an EMPTY batch is a no-op on the index
    graft.sources.Layout.appendWithSkippingIndex(
      Seq.empty[(Long, String)].toDF("id", "payload"), tmp, Seq("id"))
    assert(spark.read.parquet(s"$tmp/_skipping").count() === sidecar.count())
  }

  test("scd2Apply plan: late-key frames broadcast; history is never shuffled " +
      "for the key split") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val events = (1L to 200L).map(k => (k, k, ts)).toDF("k", "eid", "ts")
    val history = operators.SetOps.scd2FromEvents(events, Seq("k"), "ts", "eid")
      .localCheckpoint(true) // stable stats for the plan under test
    val updates = Seq((1L, 1000L, java.sql.Timestamp.valueOf("2024-01-02 10:00:00")))
      .toDF("k", "eid", "ts")
    val applied = operators.SetOps.scd2Apply(history, updates, Seq("k"), "ts", "eid")
    val p = applied.queryExecution.executedPlan.toString
    // the late-key semi/anti splits ride broadcast joins (lateKeys is
    // derived from the tiny update batch), never a sort-merge shuffle
    // of the history side
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
    val smjCount = "SortMergeJoin".r.findAllIn(p).size
    assert(smjCount === 0, s"history shuffled through $smjCount SMJs:\n${p.take(4000)}")
    // and the result is still correct
    assert(applied.count() === 201)
  }

  test("audioStats plan: one map-side pass, no exchange") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val media = graft.ml.Multimodal.asMediaTable(
      spark.range(100).select(col("id"), md5(col("id").cast("string"))
        .cast("binary").as("payload")),
      "id", "payload", "audio")
    val stats = graft.ml.Multimodal.audioStats(media)
    val p = stats.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"audioStats plan shuffles:\n$p")
  }

  test("perceptualHashes plan: one map-side pass, no exchange before the hash") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val media = graft.ml.Multimodal.asMediaTable(
      spark.range(100).select(col("id"), md5(col("id").cast("string"))
        .cast("binary").as("payload")),
      "id", "payload", "image")
    val hashed = graft.ml.Multimodal.perceptualHashes(media)
    val p = hashed.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"phash plan shuffles:\n$p")
  }

  test("compactDir: small-file dir rewritten to few files, content identical, sidecar carried") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    val df = Seq.tabulate(500)(i => (i.toLong, s"p$i")).toDF("id", "payload")
    df.repartition(40).write.parquet(tmp)
    graft.sources.Layout.writeSkippingIndex(spark, tmp, Seq("id"))
    val filesBefore = spark.read.parquet(tmp).inputFiles.length
    assert(filesBefore >= 30, s"setup: $filesBefore files")
    graft.sources.Writers.compactDir(spark, tmp, targetBytes = 1L << 30)
    val back = spark.read.parquet(tmp)
    assert(back.inputFiles.length <= 2, back.inputFiles.length.toString)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    // the skipping sidecar was REBUILT over the new files — in-range
    // pruning returns live file names, out-of-range prunes everything
    assert(new java.io.File(s"$tmp/_skipping").exists())
    val live = graft.sources.Layout.prunedFiles(spark, tmp, "id", 100L, 199L)
    assert(live.nonEmpty && live.forall(back.inputFiles.contains), live.mkString(","))
    assert(graft.sources.Layout.prunedFiles(spark, tmp, "id", 5000L, 6000L).isEmpty)
    // no tmp/trash residue
    assert(!new java.io.File(tmp + "__compact_tmp").exists())
    assert(!new java.io.File(tmp + "__compact_old").exists())
  }

  test("scd2FromEvents: ONE hash exchange on the key, no global window") {
    import spark.implicits._
    val events = Seq.tabulate(500)(i =>
      (i % 50L, i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L)))
      .toDF("k", "eid", "ts").repartition(4)
    val p = plan(graft.operators.SetOps.scd2FromEvents(events, Seq("k"), "ts", "eid"))
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1, p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("canonicalPerCluster: winner/label frames broadcast, corpus never re-shuffles") {
    import spark.implicits._
    val docs = Seq.tabulate(2000)(i => (i.toLong, i * 1.0, s"text$i"))
      .toDF("doc_id", "score", "text").repartition(4)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val p = plan(graft.ml.Dedup.canonicalPerCluster(docs, "doc_id", "score", pairs))
    // both survivor joins broadcast the small cluster frames: the corpus
    // side must not hash-exchange for them
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("corpusReport: partial+final aggregate, text never shuffles") {
    import spark.implicits._
    val docs = Seq.tabulate(500)(i => (s"src${i % 5}", s"some text $i"))
      .toDF("source", "text").repartition(4)
    val p = plan(graft.functions.TextFunctions.corpusReport(docs, Seq("source"), "text"))
    // exactly one hash exchange (the fixture's own repartition is round-robin)
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1, p)
    assert(p.contains("partial"), p) // map-side combine before the exchange
  }

  test("bucketed tables join with ZERO exchanges (pre-shuffled at write time)") {
    import spark.implicits._
    val a = Seq.tabulate(200)(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = Seq.tabulate(200)(i => (i.toLong, s"b$i")).toDF("k", "vb")
    graft.sources.Writers.saveBucketed(a, "bkt_a_plan", Seq("k"), numBuckets = 4)
    graft.sources.Writers.saveBucketed(b, "bkt_b_plan", Seq("k"), numBuckets = 4)
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan(spark.table("bkt_a_plan")
        .join(spark.table("bkt_b_plan"), "k"))
      assert(!p.contains("Exchange"), p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      spark.sql("DROP TABLE IF EXISTS bkt_a_plan")
      spark.sql("DROP TABLE IF EXISTS bkt_b_plan")
    }
  }
}
