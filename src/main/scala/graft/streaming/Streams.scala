package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface — net-new vs the reference (SURVEY §2.9):
  * file-source ingest of the CSV/parquet readers, watermarked windowed
  * aggregation, streaming dedup, and a stateful sessionizer via
  * flatMapGroupsWithState. All operators are the batch semantics from
  * `graft.operators` lifted onto unbounded input.
  */
object Streams {

  /** Streaming ingest of a directory of csv files (schema required —
    * streams cannot infer).
    */
  def readCsvStream(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ","): DataFrame =
    spark.readStream.schema(schema)
      .option("sep", delimiter).option("header", "true").csv(path)

  def readParquetStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Tumbling/sliding windowed aggregation with late-data watermark —
    * the streaming `groupby` (maps the reference's batch groupby onto
    * event time).
    */
  def windowedAgg(
      events: DataFrame,
      tsCol: String,
      watermark: String,
      windowLen: String,
      slide: Option[String],
      keys: Seq[String],
      aggs: Seq[(String, String)]): DataFrame = {
    val win = slide.map(s => window(col(tsCol), windowLen, s))
      .getOrElse(window(col(tsCol), windowLen))
    val exprs = aggs.map { case (c, fn) => graft.operators.GroupBy.accumulator(fn, c) }
    events.withWatermark(tsCol, watermark)
      .groupBy(win +: keys.map(col): _*)
      .agg(exprs.head, exprs.tail: _*)
  }

  /** Streaming exact dedup on a key within the watermark horizon —
    * `dropDuplicates` with state eviction (the streaming face of
    * Dedup.exact).
    */
  def streamingDedup(events: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark).dropDuplicates(keys :+ tsCol)

  /** Streaming corpus-curation ingest: the [[graft.ml.Curate]] stages
    * that stream cleanly. Language/length filters and the PII scrub are
    * stateless maps; exact dedup becomes `dropDuplicatesWithinWatermark`
    * on the content fingerprint — state holds fingerprints only (never
    * text) and is evicted at the watermark, so it's bounded regardless
    * of corpus size. Fuzzy dedup (minhash/SemDeDup) stays a batch pass
    * over the materialized output.
    */
  def streamingCurate(
      docs: DataFrame,
      tsCol: String,
      watermark: String,
      textCol: String,
      langs: Set[String],
      minTokens: Long = 1L,
      normalize: Boolean = false,
      minCompressRatio: Option[Double] = None,
      qualityWeights: Option[Array[Double]] = None,
      minQuality: Double = 0.5,
      clfModel: Option[graft.ml.QualityClassifier.Model] = None,
      minClfProb: Double = 0.5,
      gopherStopwords: Option[Seq[String]] = None,
      gopherMinWords: Long = 50L,
      perplexityModel: Option[DataFrame] = None,
      maxPpl: Double = Double.MaxValue,
      dsirRatios: Option[DataFrame] = None,
      minLogWeight: Double = Double.NegativeInfinity,
      dsirLengthNormalize: Boolean = false): DataFrame = {
    import graft.functions.TextFunctions
    // unicode repair and quality-classifier scoring are stateless
    // map-side expressions, so they compose into the stream for free —
    // only the fingerprint dedup holds state
    val pre =
      if (normalize) docs.withColumn(textCol, TextFunctions.normalizeText(col(textCol)))
      else docs
    val text = col(textCol)
    val flt = pre.withWatermark(tsCol, watermark)
      .withColumn("pred_lang", TextFunctions.langId(text))
      .withColumn("n_tokens", TextFunctions.tokenCount(text))
      .filter(col("pred_lang").isin(langs.toSeq: _*) && col("n_tokens") >= minTokens)
    // compression-ratio floor: stateless deflate kernel, batch ≡
    // streaming by construction
    val fltC = minCompressRatio.fold(flt)(floor =>
      flt.filter(TextFunctions.compressionRatio(text) >= floor))
    val scoredH = qualityWeights.fold(fltC)(w =>
      fltC.filter(TextFunctions.qualityScore(text, w) >= minQuality))
    // learned-classifier gate: σ(bias + w·tf) from the stateless kernel
    // (dense weights ride as a reference object) — batch ≡ streaming by
    // construction, same as the perplexity/DSIR gates below
    val scored = clfModel.fold(scoredH)(m =>
      scoredH.filter(graft.ml.QualityClassifier.prob(text, m) >= minClfProb))
    // Gopher rules are a pure map-side conjunction — stateless, streams
    // for free, same as the classifier gate
    val gated = gopherStopwords.fold(scored)(sw =>
      scored.filter(TextFunctions.gopherFlags(text,
        minWords = gopherMinWords, stopwords = sw).getField("pass") === 1L))
    // LM-perplexity gate (CCNet's KenLM stage): the PER-ROW kernel, not
    // the broadcast-join scorer — its per-doc aggregation is a stateful
    // op a stream must not pay; the kernel is a stateless map-side
    // expression with the (bounded, ≤2×buckets-row) model riding as
    // expression constants. Unscorable docs (< 2 tokens) are dropped,
    // matching the batch filter's null semantics.
    val pplGated = perplexityModel.fold(gated) { modelDf =>
      // hashing params ride in the model frame — nothing to keep in sync
      val m = graft.ml.Perplexity.collectModel(modelDf)
      gated.filter(graft.ml.Perplexity.pplColumn(text, m) <= maxPpl)
    }
    // DSIR gate ("keep what looks like the target corpus", Xie et al.
    // 2023): same stateless-kernel story as the perplexity gate — the
    // batch path's explode + broadcast join + per-doc groupBy is a
    // stateful shape a stream must not pay; the per-row kernel carries
    // the (bounded, ≤buckets-row) log-ratio table as expression
    // constants. Defaults match Dsir's (sum weights); pass
    // dsirLengthNormalize = true when the stream's doc lengths vary a
    // lot (sum weights scale with n-gram count).
    val dsirGated = dsirRatios.fold(pplGated) { ratiosDf =>
      val r = graft.ml.Dsir.collectRatios(ratiosDf)
      pplGated.filter(
        graft.ml.Dsir.weightColumn(text, r, dsirLengthNormalize) >= minLogWeight)
    }
    dsirGated
      .withColumn("__fp", TextFunctions.fingerprint(text))
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
      .withColumn(textCol, TextFunctions.redactPii(text))
  }

  /** Streaming MinHash near-dup dedup — the streaming face of
    * `Dedup.minhashPairs`, via two chained stateful operators (supported
    * append-mode combo since Spark 3.5):
    *
    *  1. explode each doc into its LSH band keys and claim first
    *     ownership per band with `dropDuplicatesWithinWatermark` —
    *     state holds band keys only (no text, no signatures), evicted
    *     at the watermark;
    *  2. a tumbling-window count of owned bands per doc; a doc that
    *     owns ALL `bands` keys has no band in common with any earlier
    *     doc → kept. A near-dup shares ≥1 band with its original (the
    *     LSH guarantee), owns fewer than `bands`, and is dropped.
    *
    * Versus batch: candidates are dropped WITHOUT the exact-Jaccard
    * verification pass (state cannot hold the earlier doc's shingles),
    * so LSH false positives become false drops — tune `bands`/`rowsPer`
    * conservatively, or route kept-vs-dropped through the batch
    * verifier offline. Output (append, fires at window close):
    * (window, id, kept_bands).
    */
  def streamingMinhashDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      watermark: String,
      window_ : String = "1 minute",
      k: Int = 64,
      bands: Int = 16): DataFrame = {
    import graft.plans.Kernels
    import graft.functions.Similarity
    val banded = docs
      .withWatermark(tsCol, watermark)
      .select(col(idCol).as("id"), col(tsCol).as("__ts"),
        explode(Similarity.lshBands(
          Kernels.minhashSig(Kernels.wordShingles(col(textCol), 3), k),
          bands, k / bands)).as("band"))
    val owned = banded.dropDuplicatesWithinWatermark("band")
    owned
      .groupBy(window(col("__ts"), window_), col("id"))
      .agg(count(lit(1)).as("owned_bands"))
      .filter(col("owned_bands") === bands)
      .select(col("window"), col("id"), col("owned_bands"))
  }

  /** Stream-static AS-OF enrichment: join each micro-batch against a
    * static dimension (quotes, rates, slowly-changing attributes) as-of
    * the event's time, through the native zero-shuffle
    * [[graft.plans.BroadcastAsofJoinExec]]. Structured Streaming plans
    * only equality stream-static joins, so the as-of runs inside
    * `foreachBatch` — each batch is an ordinary batch plan where the
    * custom strategy applies; use the returned function as
    * `stream.writeStream.foreachBatch { (b, id) => sink(enrich(b)) }`.
    */
  def asofEnrichBatch(
      dim: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      direction: String = "backward"): DataFrame => DataFrame =
    (batch: DataFrame) =>
      graft.plans.AsofJoinPlan.asofJoin(batch, dim, leftKeys, rightKeys,
        leftTime, rightTime, rightValues, direction, hint = "broadcast")

  /** Stream-vs-CORPUS near-dup filtering: drop each micro-batch's docs
    * that near-duplicate a static reference corpus, through the
    * band-partitioned [[graft.ml.Dedup.minhashIndex]] (semi-join-pruned
    * candidate lookup — the corpus is never re-shingled). Chained
    * stateful ops can't express a batch-vs-index anti join, so this is
    * a `foreachBatch` enricher like [[asofEnrichBatch]]:
    * `stream.writeStream.foreachBatch { (b, _) => sink(dropDups(b)) }`.
    * The index is caller-owned (build once, `release()` when done) —
    * exactly the continuous-ingestion shape [[ml.Dedup.minhashIndex]]
    * documents, lifted onto a stream.
    */
  def dedupAgainstCorpusBatch(
      index: graft.ml.Dedup.MinhashIndex,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7): DataFrame => DataFrame =
    (batch: DataFrame) => {
      val dupIds = graft.ml.Dedup.incrementalMinhashPairs(
        batch, index, idCol, textCol, threshold)
        .select(col("id_a").as("__dup_id")).distinct()
      batch.join(dupIds, batch(idCol) === col("__dup_id"), "left_anti")
    }

  /** Media near-dup dedup against a static corpus fingerprint index —
    * the perceptual cousin of [[dedupAgainstCorpusBatch]]: drop
    * incoming media whose perceptual hash lands within `maxHamming`
    * of any corpus fingerprint. `corpusHashes` is
    * [[graft.ml.Multimodal.perceptualHashes]] output `(media_id,
    * phash)` — typically precomputed once and persisted; the batch
    * side is hashed in-flight and broadcast into the band join, so
    * the corpus frame never shuffles per micro-batch.
    */
  def phashDedupBatch(
      corpusHashes: DataFrame,
      algo: String = "ahash",
      maxHamming: Int = 3)(
      implicit spark: SparkSession): DataFrame => DataFrame =
    (batch: DataFrame) => {
      val bh = graft.ml.Multimodal.perceptualHashes(batch, algo)
      val dupIds = graft.ml.Dedup.hamming64JoinPairs(
        broadcast(bh), corpusHashes, "media_id", "phash", maxHamming)
        .select(col("id_a").as("__dup_id")).distinct()
      batch.join(dupIds, batch("media_id") === col("__dup_id"), "left_anti")
    }

  /** ONLINE dedup ingest — the full corpus-growing loop, per
    * micro-batch: (1) drop rows near-duplicating the PERSISTED corpus
    * index, (2) collapse within-batch near-dup groups to their min-id
    * survivor, (3) append the survivors to the index so the NEXT batch
    * dedups against them too. [[dedupAgainstCorpusBatch]] probes a
    * static corpus; this one owns the corpus's growth — the
    * streaming-native shape of a deduped ingest pipeline. Banding
    * params always come from the index sidecar (drift is
    * unrepresentable); per-batch work is O(batch) plus the band-pruned
    * posting lookups.
    *
    * The batch is shingled and minhash-signed exactly ONCE: the two
    * signature frames are persisted and reused by the corpus probe, the
    * intra-batch pairing AND the index append (the r11 shape recomputed
    * them three times — the kernels are the dominant per-batch CPU and
    * each recompute also re-ran its own job chain).
    *
    * Exactly-once caveat: the append is not transactional with the
    * sink — a replayed batch re-appends the same ids, which degrades to
    * duplicate index rows (harmless for dedup semantics: candidates
    * dedup through the pair `distinct`), never to lost drops.
    *
    * Durability: the survivor lineage MUST be cut before the append —
    * writing to the index path makes Spark invalidate/recache every
    * plan reading that path, and the survivors read the index (through
    * the corpus probe); a post-append action would recompute against
    * the GROWN index and dedup the batch against itself (measured:
    * empty survivors). Default `reliableCheckpoint = false` cuts it
    * with an eager `localCheckpoint`, whose blocks live in EXECUTOR
    * storage: correct and cheap locally, but on a real cluster an
    * executor loss mid-batch invalidates the pinned partitions and the
    * truncated lineage cannot recompute — the micro-batch fails and the
    * stream retries it (safe, per the replay caveat above, but wasted
    * work). `reliableCheckpoint = true` is the cluster-grade flavor:
    * survivors go to the fault-tolerant `spark.sparkContext
    * .setCheckpointDir` location (HDFS/S3) and an executor loss just
    * re-reads files — required for long-running ingest services.
    */
  def dedupIngestBatch(
      indexPath: String,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7,
      reliableCheckpoint: Boolean = false): DataFrame => DataFrame =
    (batch: DataFrame) => {
      val spark = batch.sparkSession
      val idx = graft.ml.Dedup.readMinhashIndex(spark, indexPath)
      if (reliableCheckpoint)
        require(spark.sparkContext.getCheckpointDir.isDefined,
          "dedupIngestBatch(reliableCheckpoint = true) requires " +
            "spark.sparkContext.setCheckpointDir (a fault-tolerant location)")
      val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      // shingle + sign ONCE per batch; both frames feed three consumers
      val shAll = graft.ml.Dedup.shingleFrame(batch, idCol, textCol, idx.shingleN)
        .persist(mem)
      val bandAll = graft.ml.Dedup.bandFrame(shAll, idx.k, idx.nBands).persist(mem)
      // the corpus-probe verdict is a tiny id frame, but its LOGICAL tree
      // is the whole staged verify (the candidate frame is referenced
      // from ~9 plan positions) — and every downstream stage here embeds
      // it again (fresh → intra pairing → components → survivors), so a
      // plain persist bounds execution but leaves the driver re-analyzing
      // a multiplicatively duplicated tree on EVERY action: measured
      // 315 s of pure catalyst work per bench row at sf0.01 (41 M-char
      // plan strings). localCheckpoint CUTS the lineage to one leaf —
      // this function is already eager end-to-end (it appends to the
      // index before returning), so the eager cut adds no new job, and
      // the fault-tolerance caveat is the same one `survivors` below
      // already documents.
      val vsCorpus = graft.ml.Dedup.incrementalVerifiedPairs(
        shAll, bandAll, idx, threshold, maxDf = 20000,
        scope = new graft.operators.CacheScope)
        .select(col("id_a").as("__dup_id")).distinct()
        .localCheckpoint(eager = true)
      try {
        val fresh = batch.join(vsCorpus, batch(idCol) === col("__dup_id"), "left_anti")
        val freshIds = fresh.select(col(idCol).as("id"))
        val intra = graft.ml.Dedup.minhashVerifiedPairs(
          shAll.join(freshIds, Seq("id"), "left_semi"),
          bandAll.join(freshIds, Seq("id"), "left_semi"),
          threshold, maxBucket = 1000, saltCap = 20000,
          scope = new graft.operators.CacheScope)
        val chained = graft.ml.Dedup.dedupedCorpus(fresh, idCol, intra)
        val survivors =
          if (reliableCheckpoint) chained.checkpoint(eager = true)
          else chained.localCheckpoint(eager = true)
        // append from the PRE-COMPUTED signature frames (survivor-pruned
        // by semi-join against the checkpointed ids): no re-shingle, no
        // re-sign, and the frames' lineage reads only the batch — safe
        // to evaluate after the index write
        val survIds = survivors.select(col(idCol).as("id"))
        graft.ml.Dedup.appendPreSignedToMinhashIndex(indexPath,
          shAll.join(survIds, Seq("id"), "left_semi"),
          bandAll.join(survIds, Seq("id"), "left_semi"))
        survivors
      } finally {
        shAll.unpersist(blocking = false)
        bandAll.unpersist(blocking = false)
        // vsCorpus is localCheckpoint-backed (no CacheManager entry):
        // its blocks free via ContextCleaner once the batch's frames
        // drop out of scope — same lifecycle as `survivors`
        ()
      }
    }

  /** Streaming decontamination — the benchmark-leak cousin of
    * [[dedupAgainstCorpusBatch]]: drop incoming docs sharing ≥
    * `minHits` distinct word n-grams with a benchmark corpus, per
    * micro-batch. The benchmark dictionary
    * ([[graft.ml.Decontaminate.buildBenchDict]]) is built ONCE and
    * caller-owned; each batch bloom-prunes map-side and exact-verifies
    * against the persisted dict, so the per-batch cost is O(batch
    * grams), never O(benchmark).
    */
  def decontaminateBatch(
      bd: graft.ml.Decontaminate.BenchDict,
      idCol: String,
      textCol: String,
      minHits: Int = 1): DataFrame => DataFrame =
    (batch: DataFrame) => {
      val bad = graft.ml.Decontaminate.contaminatedIdsAgainst(
        batch, idCol, textCol, bd, minHits)
        .select(col("id").as("__contaminated_id"))
      batch.join(bad, batch(idCol) === col("__contaminated_id"), "left_anti")
    }

  /** Containment dedup against a static corpus — the asymmetric cousin
    * of [[dedupAgainstCorpusBatch]]: drop incoming docs that are
    * near-fully CONTAINED in some corpus document
    * ([[graft.ml.Dedup.containmentJoinPairs]]) even when Jaccard is
    * far below any banding threshold (truncations, excerpts, quoted
    * reposts). The micro-batch is the broadcast probe side; the
    * corpus frame — typically persisted by the caller — tokenizes
    * map-side and never shuffles per batch.
    */
  def containmentDedupBatch(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.8): DataFrame => DataFrame =
    (batch: DataFrame) => {
      val dupIds = graft.ml.Dedup.containmentJoinPairs(
        batch, corpus, idCol, textCol, shingleN, threshold)
        .select(col("id_a").as("__dup_id")).distinct()
      batch.join(dupIds, batch(idCol) === col("__dup_id"), "left_anti")
    }

  /** Typo dedup against a static corpus — the edit-distance cousin of
    * [[dedupAgainstCorpusBatch]]: drop incoming rows whose short string
    * (title, name, URL) sits within `maxDistance` edits of any corpus
    * string ([[graft.ml.Dedup.editDistanceJoinPairs]]; the micro-batch
    * is the broadcast probe side, the corpus never shuffles its
    * strings). `foreachBatch` shape like the others.
    */
  def editDedupBatch(
      corpus: DataFrame,
      idCol: String,
      strCol: String,
      maxDistance: Int = 1): DataFrame => DataFrame =
    (batch: DataFrame) => {
      val dupIds = graft.ml.Dedup.editDistanceJoinPairs(
        batch, corpus, idCol, strCol, maxDistance)
        .select(col("id_a").as("__dup_id")).distinct()
      batch.join(dupIds, batch(idCol) === col("__dup_id"), "left_anti")
    }

  /** Per-micro-batch data-contract gate
    * ([[graft.operators.Checks.report]] lifted onto a stream): batches
    * where every expectation passes flow through unchanged; a failing
    * batch is QUARANTINED — `onFail(batch, report)` is invoked (write
    * to a dead-letter path, alert) and the empty frame flows on, so bad
    * data never reaches the sink and good batches never wait on it.
    * `foreachBatch` shape like [[asofEnrichBatch]]:
    * `stream.writeStream.foreachBatch { (b, _) => sink(gate(b)) }`.
    * The report is bounded (one row per check); the all-pass probe is
    * one tiny collect per batch.
    */
  def checksGateBatch(
      checks: Seq[graft.operators.Checks.Check],
      onFail: (DataFrame, DataFrame) => Unit = (_, _) => ()): DataFrame => DataFrame =
    (batch: DataFrame) => {
      val rep = graft.operators.Checks.report(batch, checks)
      val bad = rep.filter(!col("pass"))
      if (bad.isEmpty) batch
      else {
        onFail(batch, rep)
        batch.limit(0)
      }
    }

  /** Streaming latest-wins upsert VIEW: the running "current row per
    * key" across micro-batches — the streaming face of
    * [[graft.operators.SetOps.upsert]]. One k=1
    * [[graft.plans.TopKRows]] aggregate: highest `versionCol` wins
    * (cast to double for the heap key — exact up to 2^53), version
    * ties break by the SMALLEST `tieCol` (pass a negated arrival
    * sequence for latest-arrival-wins). Run in complete or update
    * output mode; state is ONE heap entry per key — bounded by key
    * cardinality, never by stream length, and the partial aggregate
    * compacts each micro-batch map-side before the state store sees it.
    */
  def upsertStream(stream: DataFrame, keyCols: Seq[String], versionCol: String,
      tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "upsertStream: no key columns")
    val cols = stream.columns
    val payload = struct(cols.map(col): _*)
    stream.groupBy(keyCols.map(col): _*)
      .agg(graft.plans.TopKRows.topKRows(col(versionCol).cast("double"),
        col(tieCol).cast("long"), payload, k = 1, desc = true).as("__top"))
      .select(cols.map(c => col("__top")(0).getField(c).as(c)): _*)
  }

  /** Stream ANN enrichment: tag each micro-batch row with its top-`k`
    * nearest corpus neighbours from a static IVF index (id, cosine
    * pairs) — "which training docs is this incoming doc closest to",
    * in-flight. `foreachBatch` shape like [[asofEnrichBatch]]; the
    * probe side is the batch (small), the index side prunes to
    * `nProbe`/nList partitions when read from [[ml.Ann.writeIvfIndex]]
    * output.
    */
  def annEnrichBatch(
      index: DataFrame,
      centroids: Array[Array[Double]],
      idCol: String,
      vecCol: String,
      k: Int = 10,
      nProbe: Int = 4): DataFrame => DataFrame =
    (batch: DataFrame) => {
      // the enrichment column must not collide with an existing one —
      // a left join would otherwise yield duplicate 'neighbours'
      // columns and an ambiguous-reference error far downstream
      // (mirrors packSequences' guard on its 'bin' output column)
      require(!batch.columns.contains("neighbours"),
        "annEnrichBatch: the batch already has a 'neighbours' column — " +
          "rename or drop it before enrichment")
      // excludeSelf = false: stream ids and corpus ids are different id
      // SPACES — a value collision must not silently drop a neighbour.
      // The array is rank-ordered (sort_array on the rank-led struct —
      // collect_list alone returns shuffle-arrival order), so
      // neighbours(0) IS the nearest.
      val hits = graft.ml.Ann.ivfKnn(index, batch, idCol, vecCol, centroids,
          k, nProbe, excludeSelf = false)
        .groupBy(col("query_id"))
        .agg(sort_array(collect_list(
          struct(col("rank"), col("neighbour_id"), col("cosine")))).as("__ranked"))
        .withColumn("neighbours",
          transform(col("__ranked"), x =>
            struct(x.getField("neighbour_id"), x.getField("cosine"))))
        .drop("__ranked")
      batch.join(hits, batch(idCol) === col("query_id"), "left").drop("query_id")
    }

  /** Stream → ANN index ingestion: each micro-batch is assigned with
    * the index's OWN stored quantizer ([[ml.Ann.appendToIvfIndex]]) and
    * appended to the list-partitioned files — the long-running
    * curation service's "new docs become searchable" loop, with NO
    * rebuild: only the appended lists' files are touched, and a
    * concurrent [[annEnrichBatch]] reader sees them on its next batch.
    * Use as `stream.writeStream.foreachBatch(ivfAppendBatch(path, ...))`.
    * Exactly-once caveat (documented, standard for file-append sinks):
    * a batch retried after a mid-append crash can append twice —
    * downstream search dedups by id, or compact periodically.
    */
  def ivfAppendBatch(
      path: String, idCol: String, vecCol: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty)
        graft.ml.Ann.appendToIvfIndex(batch.sparkSession, path, batch, idCol, vecCol)

  final case class PackEvent(group: String, ts: java.sql.Timestamp,
      doc_id: Long, n_tokens: Long)
  final case class PackOut(group: String, ts: java.sql.Timestamp,
      doc_id: Long, n_tokens: Long, bin: Long)

  /** Continuous token-budget sequence packing — the streaming face of
    * [[graft.operators.Sampling.packSequences]]: bin ids continue
    * ACROSS micro-batches via one running token total per group (8
    * bytes of state — bounded by group cardinality, not stream
    * length). Within a micro-batch rows apply in (event-time, doc_id)
    * order; across batches the order is arrival order — a stream
    * cannot globally sort, so the bin assignment is the
    * same-exact-integer cumsum rule applied to the order the data
    * actually arrived in (deterministic on replay of the same batch
    * boundaries). State never times out: a group's running total must
    * survive idle periods — packing has no session-gap semantics.
    */
  def streamingPack(docs: Dataset[PackEvent], budget: Long)
      (implicit spark: SparkSession): Dataset[PackOut] = {
    require(budget > 0, s"budget: $budget")
    import spark.implicits._
    def fn(group: String, rows: Iterator[PackEvent],
        state: GroupState[Long]): Iterator[PackOut] = {
      var total = state.getOption.getOrElse(0L)
      // null timestamps sort first (batch orderBy's ASC NULLS FIRST) —
      // one bad record must not NPE the whole query
      val out = rows.toSeq
        .sortBy(e => (if (e.ts == null) Long.MinValue else e.ts.getTime, e.doc_id))
        .map { e =>
        val bin = java.lang.Math.floorDiv(total, budget)
        total += e.n_tokens
        PackOut(e.group, e.ts, e.doc_id, e.n_tokens, bin)
      }
      state.update(total)
      out.iterator
    }
    docs.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  final case class RollEvent(group: String, ts: java.sql.Timestamp,
      id: Long, v: Double)
  final case class RollOut(group: String, ts: java.sql.Timestamp,
      id: Long, v: Double, roll_sum: Double, roll_avg: Double,
      roll_min: Double, roll_max: Double)

  /** Continuous rolling aggregates — the streaming face of
    * [[graft.operators.Rolling.rolling]]: sum/avg/min/max over the
    * trailing `n` rows PER GROUP, windows continuing ACROSS
    * micro-batches via the last n−1 values held as group state
    * (bounded by n × groups, not stream length). Within a micro-batch
    * rows apply in (event-time, id) order; across batches, arrival
    * order — the [[streamingPack]] ordering contract. State never
    * times out: a trailing window must survive idle periods.
    */
  def streamingRolling(events: Dataset[RollEvent], n: Int)
      (implicit spark: SparkSession): Dataset[RollOut] = {
    require(n > 0, s"n: $n")
    import spark.implicits._
    def fn(group: String, rows: Iterator[RollEvent],
        state: GroupState[List[Double]]): Iterator[RollOut] = {
      var ring = state.getOption.getOrElse(Nil)
      val out = rows.toSeq
        .sortBy(e => (if (e.ts == null) Long.MinValue else e.ts.getTime, e.id))
        .map { e =>
          ring = (ring :+ e.v).takeRight(n)
          RollOut(e.group, e.ts, e.id, e.v,
            ring.sum, ring.sum / ring.length, ring.min, ring.max)
        }
      state.update(ring.takeRight(n - 1))
      out.iterator
    }
    events.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, lastTs: Long, n: Int, sum: Double)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int, total_value: Double)

  /** Gap-based sessionizer: emits a session row when `gapSeconds` of
    * inactivity passes (processing-time timeout). Custom state via
    * flatMapGroupsWithState — the streaming analogue of the batch
    * `q_sessionize` window query.
    */
  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long)
      (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    def fn(userId: Long, rows: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(SessionOut(userId, new java.sql.Timestamp(s.start),
          new java.sql.Timestamp(s.lastTs), s.n, s.sum))
      }
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var out = List.empty[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastTs > gapSeconds * 1000 =>
            out ::= SessionOut(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.lastTs), s.n, s.sum)
            cur = Some(SessionState(t, t, 1, e.value))
          case Some(s) =>
            cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutDuration(gapSeconds * 1000)
      }
      out.reverseIterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(fn)
  }

  /** Event-time gap sessionizer: sessions close when the WATERMARK (not
    * wall-clock) passes `lastTs + gap` — deterministic on replay and
    * unaffected by ingestion speed, which is what a backfill over 100 TB
    * of historical events needs (a processing-time timeout would close
    * every session instantly during catch-up). State per key is O(1);
    * the watermark bounds total state.
    */
  def sessionizeEventTime(
      events: Dataset[SessionEvent],
      gapSeconds: Long,
      watermark: String)(implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    def fn(userId: Long, rows: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(SessionOut(userId, new java.sql.Timestamp(s.start),
          new java.sql.Timestamp(s.lastTs), s.n, s.sum))
      }
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var out = List.empty[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastTs > gapSeconds * 1000 =>
            out ::= SessionOut(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.lastTs), s.n, s.sum)
            cur = Some(SessionState(t, t, 1, e.value))
          case Some(s) =>
            cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // close when event time (the watermark) passes the gap horizon
        state.setTimeoutTimestamp(s.lastTs + gapSeconds * 1000)
      }
      out.reverseIterator
    }
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Gap sessionizer on Spark 4's `transformWithState` (the current
    * arbitrary-state API superseding flatMapGroupsWithState): typed
    * `ValueState` in the RocksDB store + explicit event-time timers.
    * Semantically identical to [[sessionizeEventTime]]; this is the API
    * a new pipeline should target — state schema evolution, multiple
    * state variables, and timer control come for free.
    */
  class SessionProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, SessionEvent, SessionOut] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.{Encoders, streaming => ss}

    @transient private var session: ss.ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    private def emit(userId: Long, s: SessionState): SessionOut =
      SessionOut(userId, new java.sql.Timestamp(s.start),
        new java.sql.Timestamp(s.lastTs), s.n, s.sum)

    override def handleInputRows(userId: Long, rows: Iterator[SessionEvent],
        tv: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var out = List.empty[SessionOut]
      var cur = if (session.exists()) Some(session.get()) else None
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastTs > gapMs =>
            out ::= emit(userId, s)
            cur = Some(SessionState(t, t, 1, e.value))
          case Some(s) =>
            cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        session.update(s)
        // one timer per update; stale ones no-op in handleExpiredTimer
        getHandle.registerTimer(s.lastTs + gapMs)
      }
      out.reverseIterator
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (session.exists()) {
        val s = session.get()
        // guard against stale timers from superseded updates
        if (info.getExpiryTimeInMs >= s.lastTs + gapMs) {
          session.clear()
          return Iterator(emit(userId, s))
        }
      }
      Iterator.empty
    }
  }

  /** [[SessionProcessor]] wired onto a stream: event-time timers driven
    * by the watermark. Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`).
    */
  def sessionizeTws(
      events: Dataset[SessionEvent],
      gapSeconds: Long,
      watermark: String)(implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSeconds * 1000),
        TimeMode.EventTime(), OutputMode.Append())
  }

  // ---- streaming as-of enrichment -----------------------------------

  /** Unioned input row for [[streamingAsofEnrich]]: `isRef` = a
    * reference update (price/state change), else a query row to enrich.
    */
  case class AsofIn(key: Long, ts: java.sql.Timestamp, isRef: Boolean, value: Double)
  case class AsofOut(key: Long, ts: java.sql.Timestamp,
      ref_ts: Option[java.sql.Timestamp], ref_value: Option[Double])

  /** Per-key state: reference history as (tsMs, value), ascending. */
  case class AsofHistory(ts: Array[Long], v: Array[Double])

  class AsofEnrichProcessor(maxHistory: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, AsofIn, AsofOut] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}
    import org.apache.spark.sql.{Encoders, streaming => ss}

    @transient private var hist: ss.ValueState[AsofHistory] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hist = getHandle.getValueState[AsofHistory]("hist",
        Encoders.product[AsofHistory], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[AsofIn],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[AsofOut] = {
      var (ts, vs) = if (hist.exists()) {
        val h = hist.get(); (h.ts.toBuffer, h.v.toBuffer)
      } else (scala.collection.mutable.Buffer.empty[Long], scala.collection.mutable.Buffer.empty[Double])
      val out = scala.collection.mutable.ArrayBuffer.empty[AsofOut]
      // process the micro-batch in event-time order so a query sees every
      // reference update at-or-before it FROM THE SAME BATCH too
      rows.toSeq.sortBy(r => (r.ts.getTime, !r.isRef)).foreach { r =>
        val t = r.ts.getTime
        if (r.isRef) {
          // insert keeping ascending order (late updates land mid-array)
          var i = ts.length
          while (i > 0 && ts(i - 1) > t) i -= 1
          ts.insert(i, t); vs.insert(i, r.value)
          if (ts.length > maxHistory) { ts.remove(0); vs.remove(0) }
        } else {
          // greatest reference ts <= query ts (backward as-of)
          var lo = 0; var hi = ts.length - 1; var best = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (ts(mid) <= t) { best = mid; lo = mid + 1 } else hi = mid - 1
          }
          out += (if (best < 0) AsofOut(key, r.ts, None, None)
                  else AsofOut(key, r.ts,
                    Some(new java.sql.Timestamp(ts(best))), Some(vs(best))))
        }
      }
      hist.update(AsofHistory(ts.toArray, vs.toArray))
      out.iterator
    }
  }

  /** Streaming as-of enrichment — the streaming face of the batch as-of
    * join: reference updates (right side) accumulate per-key history in
    * RocksDB state; each query row (left side) is enriched with the
    * latest reference value at-or-before its event time. Union the two
    * sides into [[AsofIn]] (`isRef` tags the reference stream).
    *
    * Contract and bounds (documented, not hidden): history is capped at
    * `maxHistory` entries per key (oldest evicted — bounded state at any
    * scale); within a micro-batch, rows apply in event-time order, so
    * same-batch out-of-orderness is handled exactly; a query row is
    * matched against the reference rows that have ARRIVED by its
    * micro-batch — a reference update arriving later than a query it
    * should have matched is the cross-stream ordering gap every
    * low-latency enrichment accepts (run the batch as-of for the exact
    * backfill).
    */
  def streamingAsofEnrich(
      input: Dataset[AsofIn],
      maxHistory: Int = 1024)(implicit spark: SparkSession): Dataset[AsofOut] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    input.groupByKey(_.key)
      .transformWithState(new AsofEnrichProcessor(maxHistory),
        TimeMode.None(), OutputMode.Append())
  }

  /** Rate-source adapter shaped like the events table — the kafka-shaped
    * demo/load-test source (`format("rate")` is Spark's built-in
    * monotonically-timestamped generator; swapping in
    * `format("kafka").option("subscribe", ...)` plus a value decoder is
    * the production path).
    */
  def rateEvents(spark: SparkSession, rowsPerSecond: Int, nUsers: Int = 100): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toLong)
      .load()
      .select(
        pmod(col("value"), lit(nUsers.toLong)).as("user_id"),
        col("timestamp").as("ts"),
        concat(lit("e"), col("value")).as("event_id"),
        when(pmod(col("value"), lit(5)) === 0, "purchase")
          .otherwise("click").as("event_type"),
        (pmod(col("value"), lit(100)) / lit(10.0)).as("value"))
}
