package graft

import org.apache.spark.sql.functions._

/** The whole training-data pipeline composed end-to-end on the driver
  * testdata — the "a reference user could switch" proof in one spec:
  *
  *   documents → curate (lang/length + perplexity gate + LEARNED
  *                quality classifier)
  *            → near-dup removal (minhash corpus dedup)
  *            → benchmark decontamination
  *            → DSIR selection toward a target style
  *            → temperature-flattened language mix
  *            → deterministic shuffle
  *            → token-budget packing under a LEARNED BPE vocabulary
  *            → fixed-stride chunking
  *
  * Each stage is individually oracled elsewhere; this spec pins that
  * the stages COMPOSE — schemas line up, row counts stay sane, and the
  * end product is a training-ready chunk table.
  */
class PipelineEndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("documents flow through curate → dedup → decontaminate → select → mix → shuffle → pack → chunk") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))

    // 1. curate: language + length + an LM-perplexity gate trained on
    //    the corpus itself (drops the unscorable/degenerate tail) + a
    //    learned quality classifier (corpus vs planted gibberish — the
    //    GPT-3-style filter; naturals must sail through)
    val clf = graft.ml.QualityClassifier.train(
      docs.select("text"),
      docs.select(array_join(transform(sequence(lit(0), lit(19)),
        j => concat(lit("zq"), pmod(hash(col("doc_id") * 17 + j), lit(97)).cast("string"))),
        " ").as("text")),
      "text", buckets = 1 << 12, seed = 4, iters = 8)
    val model = graft.ml.Perplexity.train(docs, "text", buckets = 1 << 12, seed = 1).persist()
    val curated =
      try graft.ml.Curate.curate(docs, "doc_id", "text",
        graft.ml.Curate.Config(langs = Set("en", "de", "fr", "es", "zh"),
          minTokens = 3L, scrubPii = false,
          clfModel = Some(clf), minClfProb = 0.5,
          perplexityModel = Some(model), maxPpl = 1e6))
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .persist()
      finally model.unpersist()
    val nCurated = curated.count()
    assert(nCurated > 100, s"curate kept only $nCurated")

    // 2. fuzzy dedup: minhash pairs → connected components → winners
    val pairs = graft.ml.Dedup.minhashPairs(
      curated, "doc_id", "text", k = 64, bands = 16, threshold = 0.8)
    val deduped = graft.ml.Dedup.dedupedCorpus(curated, "doc_id", pairs).persist()
    val nDeduped = deduped.count()
    assert(nDeduped > 0 && nDeduped <= nCurated)

    // 3. decontaminate against a tiny fake benchmark (the longest doc's
    //    own text as a benchmark item → that doc must be removed; the
    //    longest so the 8-gram overlap is guaranteed to exist)
    val bench = deduped.orderBy(col("n_tokens").desc).limit(1).select(col("text"))
    val clean = graft.ml.Decontaminate.decontaminate(
      deduped, "doc_id", "text", bench, "text", n = 8, minHits = 1)
    val nClean = clean.count()
    assert(nClean < nDeduped, s"decontamination removed nothing ($nClean of $nDeduped)")

    // 4. DSIR: pull docs toward a planted style (suffix on even ids)
    val styled = clean.withColumn("text",
      when(col("doc_id") % 2 === 0,
        concat(col("text"), lit(" history science theory culture article")))
        .otherwise(col("text")))
    val target = Seq.fill(20)("history science theory culture article citation").toDF("text")
    val picked = graft.ml.Dsir.resampleLikeTarget(styled, "doc_id", "text",
      target, "text", n = (nClean / 2).toInt.max(10), buckets = 1 << 12,
      lengthNormalize = true, gumbel = false).persist()
    val evenShare = picked.filter(col("doc_id") % 2 === 0).count().toDouble / picked.count()
    assert(evenShare >= 0.8, s"DSIR pull too weak: $evenShare")

    // 5. temperature mix over lang (α=0.5 flattens the skew), then
    // 6. deterministic shuffle, 7. pack to a token budget measured in
    //    LEARNED BPE tokens (the vocabulary the downstream model would
    //    actually see), 8. chunk
    val n = picked.count().toInt
    val bpe = graft.ml.Bpe.train(picked.select("text"), "text", numMerges = 150)
    val mixed = graft.operators.Sampling.temperatureMix(
      picked, "lang", "doc_id", alpha = 0.5, n = (n * 3 / 4).max(5), seed = 2)
    val shuffled = graft.operators.Sampling.shuffleDeterministic(mixed, "doc_id", seed = 3)
    val packed = graft.operators.Sampling.packSequences(
      shuffled.withColumn("n_tokens",
        graft.ml.Bpe.tokenCount(col("text"), bpe).cast("long")),
      "n_tokens", "shuffle_rank", budget = 512)
    // the export surface: one sequence row per bin, members in pack
    // order, BPE token-id sequences concatenated — what a loader reads
    val seqs = graft.operators.Sampling.materializePacked(
      packed.withColumn("ids", graft.ml.Bpe.tokenIds(col("text"), bpe)),
      orderCol = "shuffle_rank", idCol = "doc_id", tokenCol = "n_tokens",
      idsCol = "ids")
    val seqStats = seqs.agg(
      sum("n_seq_tokens"), sum(size(col("token_ids"))), sum("n_docs")).collect()(0)
    // every packed doc appears in exactly one sequence, and the
    // concatenated id streams account for every BPE token counted
    assert(seqStats.getLong(2) === packed.count())
    assert(seqStats.getLong(0) === seqStats.getLong(1),
      s"token-id stream ${seqStats.getLong(1)} != counted ${seqStats.getLong(0)}")

    // chunking appends its own per-chunk n_tokens — the doc-level one
    // served the packing and retires here
    val chunks = graft.operators.Chunking.chunkByTokens(
      packed.drop("n_tokens"), "doc_id", "text", maxTokens = 64, stride = 48)

    // training-ready shape: every metadata column rode along, chunks
    // respect the token cap, and the whole thing is deterministic
    assert(chunks.columns.toSet ===
      Set("doc_id", "pred_lang", "lang", "shuffle_rank", "n_tokens", "bin",
        "chunk_id", "chunk_text"))
    val stats = chunks.agg(
      count(lit(1)), max(graft.functions.TextFunctions.tokenCount(col("chunk_text"))),
      countDistinct(col("bin"))).collect()(0)
    assert(stats.getLong(0) > 0)
    assert(stats.getLong(1) <= 64, s"chunk over token cap: ${stats.getLong(1)}")
    assert(stats.getLong(2) >= 1)
    val again = graft.operators.Chunking.chunkByTokens(
      graft.operators.Sampling.packSequences(
        graft.operators.Sampling.shuffleDeterministic(
          graft.operators.Sampling.temperatureMix(
            picked, "lang", "doc_id", alpha = 0.5, n = (n * 3 / 4).max(5), seed = 2),
          "doc_id", seed = 3)
          .withColumn("n_tokens", graft.ml.Bpe.tokenCount(col("text"), bpe).cast("long")),
        "n_tokens", "shuffle_rank", budget = 512).drop("n_tokens"),
      "doc_id", "text", maxTokens = 64, stride = 48)
    assert(again.orderBy("doc_id", "chunk_id").collect().toSeq ===
      chunks.orderBy("doc_id", "chunk_id").collect().toSeq)
    picked.unpersist(); deduped.unpersist(); curated.unpersist()
    ()
  }
}
