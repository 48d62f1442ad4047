package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def writeEventsParquet(): String = {
    val dir = Files.createTempDirectory("graftstream").toString
    val src = dir + "/in"
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "click", 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:02:00"), "click", 2.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 11:30:00"), "view", 3.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 11:30:00"), "view", 3.0) // exact dup
    ).toDF("event_id", "ts", "event_type", "value")
      .coalesce(1).write.parquet(src)
    src
  }

  test("windowed aggregation with watermark over a file stream") {
    val src = writeEventsParquet()
    val schema = spark.read.parquet(src).schema
    val stream = Streams.readParquetStream(spark, src, schema)
    val agg = Streams.windowedAgg(stream, "ts", "10 minutes", "1 hour", None,
      Seq("event_type"), Seq("value" -> "Sum", "value" -> "Count"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      q.processAllAvailable()
      val out = spark.sql("SELECT event_type, `Sum(value)` FROM win_out").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(out("click") === 3.0)
      assert(out("view") === 6.0) // two identical 3.0 view events
    } finally q.stop()
  }

  test("token chunking streams as-is (stateless generate stage)") {
    val dir = Files.createTempDirectory("graftchunk").toString + "/in"
    Seq(
      (1L, "en", (1 to 25).map(i => s"w$i").mkString(" ")), // 25 toks -> 2 chunks
      (2L, "de", "kurz")                                    // 1 chunk
    ).toDF("doc_id", "lang", "text").coalesce(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = Streams.readParquetStream(spark, dir, schema)
    val chunked = graft.operators.Chunking.chunkByTokens(
      stream.toDF(), "doc_id", "text", maxTokens = 20, stride = 5)
    val q = chunked.writeStream.outputMode("append")
      .format("memory").queryName("chunk_out").start()
    try {
      q.processAllAvailable()
      val out = spark.sql("SELECT doc_id, lang, chunk_id, n_tokens FROM chunk_out")
        .as[(Long, String, Long, Long)].collect().sortBy(r => (r._1, r._3))
      assert(out.map(r => (r._1, r._3, r._4)).toSeq ===
        Seq((1L, 0L, 20L), (1L, 1L, 20L), (2L, 0L, 1L)))
      assert(out.forall(r => if (r._1 == 1L) r._2 == "en" else r._2 == "de"))
    } finally q.stop()
  }

  test("streaming dedup drops exact duplicates within the watermark") {
    val src = writeEventsParquet()
    val schema = spark.read.parquet(src).schema
    val stream = Streams.readParquetStream(spark, src, schema)
    val dedup = Streams.streamingDedup(stream, "ts", "1 hour", Seq("event_id"))
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM dedup_out").count() === 3)
    } finally q.stop()
  }

  test("streaming curation filters, dedups by fingerprint, scrubs pii") {
    val dir = Files.createTempDirectory("graftcurate").toString + "/in"
    val en = "the cat and the dog ran to the park and it was a fine day for all of us"
    Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, en),
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 2L, en), // dup of 1
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:02"), 3L, "der hund und die katze sind nicht mit von dort"),
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:03"), 4L, en + " mail me: x@y.io it is that good")
    ).toDF("ts", "doc_id", "text").coalesce(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = Streams.readParquetStream(spark, dir, schema)
    val curated = Streams.streamingCurate(stream, "ts", "1 hour", "text",
      langs = Set("en"), minTokens = 10L)
    val q = curated.writeStream.outputMode("append")
      .format("memory").queryName("curate_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, text FROM curate_out").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows.keySet === Set(1L, 4L)) // de doc + dup dropped
      assert(rows(4L).contains("<EMAIL>") && !rows(4L).contains("x@y.io"))
    } finally q.stop()
  }

  test("streaming curation with unicode repair and quality-classifier filter") {
    val dir = Files.createTempDirectory("graftcurate2").toString + "/in"
    val en = "the cat and the dog ran to the park and it was a fine day for all of us"
    Seq(
      // control chars in an otherwise-good doc: normalize repairs, doc kept
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "the cat and the dog ran to the park and it was a fine day"),
      // shouty junk: language filter passes it ("the"), quality filter drops it
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 2L, "THE!!! BUY NOW!!! CLICK;;; WIN??? THE THE THE SPAM!!! ALL CAPS!!!"),
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:02"), 3L, en)
    ).toDF("ts", "doc_id", "text").coalesce(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = Streams.readParquetStream(spark, dir, schema)
    // weights: punct/upper ratios punish junk, stopword ratio rewards prose
    val curated = Streams.streamingCurate(stream, "ts", "1 hour", "text",
      langs = Set("en"), minTokens = 5L, normalize = true,
      qualityWeights = Some(Array(0.0, 0.0, -30.0, -10.0, 8.0, 0.0)))
    val q = curated.writeStream.outputMode("append")
      .format("memory").queryName("curate2_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, text FROM curate2_out").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows.keySet === Set(1L, 3L), rows.keySet)
      assert(!rows(1L).contains("")) // control char repaired away
    } finally q.stop()
  }

  test("streaming curation with the compression-ratio floor ≡ the batch gate") {
    val dir = Files.createTempDirectory("graftcurate_cr").toString + "/in"
    val en = "the cat and the dog ran to the park and it was a fine day for all of us"
    val boiler = Seq.fill(50)("the and is of to in that it was").mkString(" ")
    Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, en),
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 2L, boiler)
    ).toDF("ts", "doc_id", "text").coalesce(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = Streams.readParquetStream(spark, dir, schema)
    val curated = Streams.streamingCurate(stream, "ts", "1 hour", "text",
      langs = Set("en"), minTokens = 5L, minCompressRatio = Some(0.3))
    val q = curated.writeStream.outputMode("append")
      .format("memory").queryName("curate_cr_out").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id FROM curate_cr_out")
        .collect().map(_.getLong(0)).toSet
      // ≡ the batch gate on the same docs
      val batch = graft.ml.Curate.curate(
        Seq((1L, en), (2L, boiler)).toDF("doc_id", "text"), "doc_id", "text",
        graft.ml.Curate.Config(langs = Set("en"), minTokens = 5L,
          minCompressRatio = Some(0.3)))
        .select("doc_id").as[Long].collect().toSet
      assert(got === Set(1L))
      assert(got === batch)
    } finally q.stop()
  }

  test("streaming curation with the perplexity gate (stateless kernel, no extra state)") {
    val dir = Files.createTempDirectory("graftcurate3").toString + "/in"
    val en = "the cat and the dog ran to the park and it was a fine day for all of us"
    Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, en),
      // language gate passes ("the the"), perplexity gate must drop the
      // out-of-vocabulary junk
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 2L,
        "the the zorp vrilk plon qhudrix blet snarv wumpet grafix")
    ).toDF("ts", "doc_id", "text").coalesce(1).write.parquet(dir)
    val reference = Seq.fill(20)(en).toDF("text")
    val model = graft.ml.Perplexity.train(reference, "text", buckets = 1 << 12, seed = 5)
    // threshold: comfortably above the in-domain doc's own score
    val cleanPpl = graft.ml.Perplexity.scoreInline(Seq(en).toDF("text"), "text",
      graft.ml.Perplexity.collectModel(model))
      .collect()(0).getAs[Double]("ppl")
    val schema = spark.read.parquet(dir).schema
    val stream = Streams.readParquetStream(spark, dir, schema)
    val curated = Streams.streamingCurate(stream, "ts", "1 hour", "text",
      langs = Set("en"), minTokens = 5L,
      perplexityModel = Some(model), maxPpl = cleanPpl * 3)
    val q = curated.writeStream.outputMode("append")
      .format("memory").queryName("curate3_out").start()
    try {
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM curate3_out").collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L), ids)
    } finally q.stop()
  }

  test("streaming curation with the learned-classifier gate (stateless kernel, no extra state)") {
    val dir = Files.createTempDirectory("graftcurate5").toString + "/in"
    val en = "the cat and the dog ran to the park and it was a fine day for all of us"
    val junk = "the and zzq vvkp zzt wmm qqp jjx kkz ppv zzx jql nng hhw rrt"
    Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, en),
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 2L, junk)
    ).toDF("ts", "doc_id", "text").coalesce(1).write.parquet(dir)
    val m = graft.ml.QualityClassifier.train(
      Seq.fill(40)(en).toDF("text"),
      Seq.fill(40)(junk).toDF("text"), "text",
      buckets = 1 << 12, seed = 7, iters = 25)
    val schema = spark.read.parquet(dir).schema
    val stream = Streams.readParquetStream(spark, dir, schema)
    val curated = Streams.streamingCurate(stream, "ts", "1 hour", "text",
      langs = Set("en"), minTokens = 5L,
      clfModel = Some(m), minClfProb = 0.5)
    val q = curated.writeStream.outputMode("append")
      .format("memory").queryName("curate5_out").start()
    try {
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM curate5_out").collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L), ids)
      // batch ≡ streaming on the same inputs
      val batch = graft.ml.Curate.curate(
        spark.read.parquet(dir), "doc_id", "text",
        graft.ml.Curate.Config(langs = Set("en"), minTokens = 5L,
          clfModel = Some(m), minClfProb = 0.5, scrubPii = false))
      assert(batch.select("doc_id").as[Long].collect().toSet === ids)
    } finally q.stop()
  }

  test("streaming curation with the DSIR gate (stateless kernel, no extra state)") {
    val dir = Files.createTempDirectory("graftcurate4").toString + "/in"
    val wiki = "the history of science and the theory of culture in the early modern article"
    val web = "the best deal and the free shipping on the cart at the checkout sale today"
    Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, wiki),
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 2L, web)
    ).toDF("ts", "doc_id", "text").coalesce(1).write.parquet(dir)
    val raw = Seq.fill(20)(wiki).zipWithIndex.map(_.swap) ++
      Seq.fill(20)(web).zipWithIndex.map { case (t, i) => (i + 100, t) }
    val target = Seq.fill(20)(wiki).toDF("text")
    val ratios = graft.ml.Dsir.logRatios(
      raw.toDF("id", "text"), "text", target, "text", buckets = 1 << 12, seed = 5)
    // threshold between the two styles' mean log-weights (wiki >> web)
    val r = graft.ml.Dsir.collectRatios(ratios)
    // default (sum) weights on both sides — the threshold and the gate
    // must use the same mode
    val scored = graft.ml.Dsir.scoreInline(
      Seq(wiki, web).toDF("text"), "text", r)
      .collect().map(_.getAs[Double]("log_w"))
    val threshold = (scored(0) + scored(1)) / 2.0
    assert(scored(0) > scored(1), s"wiki ${scored(0)} !> web ${scored(1)}")
    val schema = spark.read.parquet(dir).schema
    val stream = Streams.readParquetStream(spark, dir, schema)
    val curated = Streams.streamingCurate(stream, "ts", "1 hour", "text",
      langs = Set("en"), minTokens = 5L,
      dsirRatios = Some(ratios), minLogWeight = threshold)
    val q = curated.writeStream.outputMode("append")
      .format("memory").queryName("curate4_out").start()
    try {
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM curate4_out").collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L), ids)
    } finally q.stop()
  }

  test("dedupAgainstCorpusBatch drops stream docs that near-dup the static corpus") {
    val shared = (1 to 30).map(i => s"corpus token$i word").mkString(" ")
    val corpus = Seq((100L, shared), (101L, "other corpus text entirely different here"))
      .toDF("doc_id", "text")
    val index = graft.ml.Dedup.minhashIndex(corpus, "doc_id", "text")
    try {
      val dir = Files.createTempDirectory("graftsvc").toString + "/in"
      Seq(
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, shared), // dup of 100
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 2L,
          "completely novel document with fresh vocabulary nowhere in the corpus")
      ).toDF("ts", "doc_id", "text").coalesce(1).write.parquet(dir)
      val schema = spark.read.parquet(dir).schema
      val stream = Streams.readParquetStream(spark, dir, schema)
      val dropDups = Streams.dedupAgainstCorpusBatch(index, "doc_id", "text", threshold = 0.8)
      val out = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = stream.writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        dropDups(b).select("doc_id").collect().foreach(r => out.add(r.getLong(0))); ()
      }.start()
      try {
        q.processAllAvailable()
        assert(out.toArray.toSet === Set(2L), out.toString)
      } finally q.stop()
    } finally index.release()
  }

  test("phashDedupBatch drops stream media that perceptually match the static corpus") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val corpus = graft.ml.Multimodal.asMediaTable(
      (0L until 20L).map(i => (i, s"media-payload-$i")).toDF("id", "data")
        .withColumn("bin", $"data".cast("binary")),
      "id", "bin", "image")
    val corpusHashes = graft.ml.Multimodal.perceptualHashes(corpus)
    val batch = graft.ml.Multimodal.asMediaTable(
      Seq((100L, "media-payload-7"), // exact perceptual dup of corpus 7
          (101L, "entirely novel media payload")).toDF("id", "data")
        .withColumn("bin", $"data".cast("binary")),
      "id", "bin", "image")
    val dropDups = Streams.phashDedupBatch(corpusHashes)
    val kept = dropDups(batch)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(101L), kept)
  }

  test("annEnrichBatch tags stream rows with top-k corpus neighbours") {
    val corpus = (0 until 60).map { i =>
      val rnd = new scala.util.Random(i * 31 + 7)
      (i.toLong, Array.fill(8)(rnd.nextFloat() - 0.5f))
    }.toDF("vec_id", "embedding")
    val centroids = graft.ml.Ann.trainCentroids(corpus, "embedding", nList = 4, sampleN = 60)
    val index = graft.ml.Ann.buildIvfIndex(corpus, "vec_id", "embedding", centroids)
    val dir = Files.createTempDirectory("graftann").toString + "/in"
    // stream one vector that IS corpus vector 5, under the COLLIDING id
    // 5 — stream and corpus ids are different spaces, so the corpus's
    // vec 5 must still be found nearest (the self-match exclusion that
    // is right for corpus self-search would silently drop it here)
    val v5 = corpus.filter(col("vec_id") === 5).collect()(0).getSeq[Float](1).toArray
    Seq((5L, v5)).toDF("vec_id", "embedding").coalesce(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = Streams.readParquetStream(spark, dir, schema)
    val enrich = Streams.annEnrichBatch(index, centroids, "vec_id", "embedding",
      k = 3, nProbe = 4)
    val out = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    val q = stream.writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
      enrich(b).select("vec_id", "neighbours").collect().foreach { r =>
        out.add(r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)))
      }; ()
    }.start()
    try {
      q.processAllAvailable()
      val hits = out.toArray.map(_.asInstanceOf[Seq[Long]])
      assert(hits.length === 1 && hits(0).length === 3)
      // the array is RANK-ordered (not collect_list arrival order): the
      // identical vector is neighbours(0), cosine 1.0
      assert(hits(0).head === 5L, s"identical vector not FIRST: ${hits(0)}")
    } finally q.stop()
  }

  test("ivfAppendBatch: streamed vectors land in the persisted index and become searchable") {
    val corpus = Seq.tabulate(40)(i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 7 + j) % 10) / 10.0f)))
      .toDF("vec_id", "embedding")
    val centroids = graft.ml.Ann.trainCentroids(corpus, "embedding", nList = 4, sampleN = 40)
    val idxDir = Files.createTempDirectory("graftivfappend").toString + "/idx"
    graft.ml.Ann.writeIvfIndex(
      graft.ml.Ann.buildIvfIndex(corpus, "vec_id", "embedding", centroids),
      idxDir, centroids)
    val inDir = Files.createTempDirectory("graftivfappend_in").toString + "/in"
    // batch 1: two new vectors in a fresh id space
    Seq((1000L, Array.fill(8)(0.42f)), (1001L, Array.fill(8)(0.13f)))
      .toDF("vec_id", "embedding").coalesce(1).write.parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    val stream = Streams.readParquetStream(spark, inDir, schema)
    val q = stream.writeStream
      .foreachBatch(Streams.ivfAppendBatch(idxDir, "vec_id", "embedding"))
      .start()
    try {
      q.processAllAvailable()
      // batch 2 arrives later — the append loop keeps running
      Seq((1002L, Array.fill(8)(0.77f))).toDF("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      val idx = graft.ml.Ann.readIvfIndex(spark, idxDir)
      assert(idx.count() === 43L)
      // the appended vector is searchable through the STORED quantizer,
      // and an identical query finds it nearest (cross id space)
      val c2 = graft.ml.Ann.readIvfCentroids(spark, idxDir)
      val hit = graft.ml.Ann.ivfKnn(idx,
          Seq((1L, Array.fill(8)(0.42f))).toDF("vec_id", "embedding"),
          "vec_id", "embedding", c2, k = 1, nProbe = 4, excludeSelf = false)
        .select("neighbour_id").collect()
      assert(hit.length === 1 && hit(0).getLong(0) === 1000L, hit.toSeq)
    } finally q.stop()
  }

  test("annEnrichBatch refuses a batch that already has a 'neighbours' column") {
    val corpus = Seq((1L, Array.fill(4)(0.1f)), (2L, Array.fill(4)(0.9f)))
      .toDF("vec_id", "embedding")
    val centroids = graft.ml.Ann.trainCentroids(corpus, "embedding", nList = 2, sampleN = 2)
    val index = graft.ml.Ann.buildIvfIndex(corpus, "vec_id", "embedding", centroids)
    val enrich = Streams.annEnrichBatch(index, centroids, "vec_id", "embedding")
    val batch = Seq((9L, Array.fill(4)(0.2f), "x"))
      .toDF("vec_id", "embedding", "neighbours")
    val ex = intercept[IllegalArgumentException](enrich(batch))
    assert(ex.getMessage.contains("neighbours"))
  }

  test("topKRows aggregate streams: per-group leaderboard in complete mode ≡ batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Double, Long)]
    val agg = in.toDF().toDF("g", "v", "id")
      .groupBy("g")
      .agg(graft.plans.TopKRows.topKRows(col("v").cast("double"),
        col("id").cast("long"), struct(col("v"), col("id")), k = 2, desc = true)
        .as("top"))
      .select(col("g"), col("top"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("topk_stream_out").start()
    try {
      in.addData(("a", 1.0, 1L), ("a", 5.0, 2L), ("b", 2.0, 3L))
      q.processAllAvailable()
      in.addData(("a", 3.0, 4L), ("b", 9.0, 5L)) // state merges across batches
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT g, transform(top, x -> x.id) AS ids FROM topk_stream_out")
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
      assert(got === Map("a" -> List(2L, 4L), "b" -> List(5L, 3L)))
    } finally q.stop()
  }

  test("checksGateBatch: clean batches flow, a violating batch quarantines whole") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val quarantined = new java.util.concurrent.atomic.AtomicReference[Seq[Long]](Nil)
    val gate = Streams.checksGateBatch(
      Seq(graft.operators.Checks.NotNull("v"), graft.operators.Checks.Unique(Seq("k"))),
      onFail = (b, rep) => {
        assert(rep.filter(!col("pass")).count() >= 1)
        quarantined.set(b.select("k").collect().map(_.getLong(0)).toSeq.sorted)
      })
    val sink = scala.collection.mutable.ArrayBuffer[Long]()
    val q = in.toDF().toDF("k", "v").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        sink.synchronized { sink ++= gate(b).select("k").collect().map(_.getLong(0)) }; ()
      }.start()
    try {
      in.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      in.addData((3L, null.asInstanceOf[String]), (4L, "d")); q.processAllAvailable()
      in.addData((5L, "e")); q.processAllAvailable()
      assert(sink.sorted === Seq(1L, 2L, 5L))          // bad batch never reached the sink
      assert(quarantined.get === Seq(3L, 4L))          // ... and was handed to onFail whole
    } finally q.stop()
  }

  test("upsertStream: running latest-wins view across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, Long, Long)]
    val view = Streams.upsertStream(in.toDF().toDF("k", "v", "ver", "seq"),
      Seq("k"), "ver", "seq")
    val q = view.writeStream.outputMode("complete")
      .format("memory").queryName("upsert_stream_out").start()
    try {
      in.addData((1L, "a", 1L, 1L), (2L, "b", 1L, 2L))
      q.processAllAvailable()
      in.addData((1L, "a2", 2L, 3L), (3L, "c", 1L, 4L), (2L, "stale", 0L, 5L))
      q.processAllAvailable()
      val got = spark.sql("SELECT k, v, ver FROM upsert_stream_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      // k=1 revised to ver 2; k=2's stale ver-0 redelivery ignored; k=3 inserted
      assert(got === Set((1L, "a2", 2L), (2L, "b", 1L), (3L, "c", 1L)))
    } finally q.stop()
  }

  test("streamingPack: bins continue across micro-batches, per-group running totals") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(g: String, sec: Int, id: Long, tok: Long) = Streams.PackEvent(
      g, java.sql.Timestamp.valueOf(s"2024-01-01 10:00:$sec"), id, tok)
    val in = MemoryStream[Streams.PackEvent]
    val packed = Streams.streamingPack(in.toDS(), budget = 100)
    val q = packed.writeStream.outputMode("append")
      .format("memory").queryName("pack_out").start()
    try {
      // batch 1: en accumulates 90 tokens (bin 0), de 40 (bin 0)
      in.addData(ev("en", 1, 1L, 60), ev("en", 2, 2L, 30), ev("de", 3, 10L, 40))
      q.processAllAvailable()
      // batch 2: en's total (90) continues — 30 more tokens CROSSES the
      // budget into bin 0 (bin = total-before/100 = 0) then next doc
      // starts bin 1; de stays in bin 0
      in.addData(ev("en", 4, 3L, 30), ev("en", 5, 4L, 20), ev("de", 6, 11L, 50))
      q.processAllAvailable()
      val rows = spark.sql("SELECT group, doc_id, bin FROM pack_out").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(rows(("en", 1L)) === 0L && rows(("en", 2L)) === 0L)
      assert(rows(("en", 3L)) === 0L) // before-total 90 -> bin 0
      assert(rows(("en", 4L)) === 1L) // before-total 120 -> bin 1
      assert(rows(("de", 10L)) === 0L && rows(("de", 11L)) === 0L)
      // batch 3: a null-timestamp record must not NPE the query (sorts
      // first within its batch, like the batch operator's NULLS FIRST)
      in.addData(Streams.PackEvent("en", null, 5L, 10))
      q.processAllAvailable()
      val r5 = spark.sql("SELECT bin FROM pack_out WHERE doc_id = 5").collect()
      assert(r5.length === 1 && r5(0).getLong(0) === 1L) // en total 140 -> bin 1
      // parity: same rows through the batch operator in the same order
      import spark.implicits._
      val batch = graft.operators.Sampling.packSequences(
        Seq(("en", 1L, 60L), ("en", 2L, 30L), ("en", 3L, 30L), ("en", 4L, 20L),
          ("de", 10L, 40L), ("de", 11L, 50L)).toDF("group", "doc_id", "n_tokens"),
        "n_tokens", "doc_id", budget = 100, partitionCols = Seq("group"))
        .select("group", "doc_id", "bin")
        .as[(String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(batch === rows)
    } finally q.stop()
  }

  test("streamingRolling: trailing windows continue across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(g: String, sec: Int, id: Long, v: Double) = Streams.RollEvent(
      g, java.sql.Timestamp.valueOf(s"2024-01-01 10:00:$sec"), id, v)
    val in = MemoryStream[Streams.RollEvent]
    val rolled = Streams.streamingRolling(in.toDS(), n = 3)
    val q = rolled.writeStream.outputMode("append")
      .format("memory").queryName("roll_out").start()
    try {
      in.addData(ev("a", 1, 1L, 10.0), ev("a", 2, 2L, 20.0), ev("b", 3, 9L, 5.0))
      q.processAllAvailable()
      // batch 2: a's window must SEE batch 1's 10,20 — sum 10+20+30
      in.addData(ev("a", 4, 3L, 30.0), ev("a", 5, 4L, 40.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT id, roll_sum, roll_avg, roll_min, roll_max FROM roll_out")
        .collect().map(r => r.getLong(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
      assert(rows(1L) === ((10.0, 10.0, 10.0, 10.0)))
      assert(rows(2L) === ((30.0, 15.0, 10.0, 20.0)))
      assert(rows(3L) === ((60.0, 20.0, 10.0, 30.0))) // crosses the batch boundary
      assert(rows(4L) === ((90.0, 30.0, 20.0, 40.0))) // 20+30+40, 10 evicted
      assert(rows(9L) === ((5.0, 5.0, 5.0, 5.0)))
      // parity with the batch operator on the same arrival order
      import spark.implicits._
      val batch = graft.operators.Rolling.rolling(
        Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0), ("a", 4L, 40.0),
          ("b", 9L, 5.0)).toDF("g", "id", "v"),
        Seq("v"), "id", n = 3, partitionCols = Seq("g"))
        .select("id", "v_roll_sum", "v_roll_avg", "v_roll_min", "v_roll_max")
        .collect().map(r => r.getLong(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
      assert(batch === rows)
    } finally q.stop()
  }

  test("stateful sessionizer emits gap-separated sessions") {
    val src = writeEventsParquet()
    val schema = spark.read.parquet(src).schema
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val stream = Streams.readParquetStream(spark, src, schema)
      .selectExpr("event_id AS user_id", "ts", "value").as[Streams.SessionEvent]
    val sessions = Streams.sessionize(stream, gapSeconds = 1800)
    // Trigger.Once: ProcessingTimeTimeout schedules perpetual empty
    // micro-batches, so processAllAvailable would never settle
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
    try {
      q.awaitTermination(60000)
      // sessions only EMIT on gap/timeout; the one-batch assertion is
      // that the stateful query runs to completion and commits state
      assert(q.lastProgress != null)
    } finally q.stop()
  }

  test("event-time sessionizer closes sessions when the watermark passes the gap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Streams.SessionEvent]
    val sessions = Streams.sessionizeEventTime(in.toDS(), gapSeconds = 600, watermark = "0 seconds")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_et").start()
    try {
      // batch 1: two events 5 min apart (same session for user 1)
      in.addData(
        Streams.SessionEvent(1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
        Streams.SessionEvent(1L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 2.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM sess_et").count() === 0) // still open
      // batch 2: an event far in the future advances the watermark past
      // 10:05 + 10 min, timing out user 1's session
      in.addData(
        Streams.SessionEvent(2L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 9.0))
      q.processAllAvailable()
      // timeout fires on the batch AFTER the watermark advances
      in.addData(
        Streams.SessionEvent(2L, java.sql.Timestamp.valueOf("2024-01-01 12:00:01"), 1.0))
      q.processAllAvailable()
      val out = spark.sql(
        "SELECT user_id, n_events, total_value FROM sess_et").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      assert(out.toSeq === Seq((1L, 2, 3.0)))
    } finally q.stop()
  }

  test("streaming minhash dedup: near-dup loses shared bands and is dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val original = "the quick brown fox jumps over the lazy dog near the river bank " +
      "on a bright morning while everyone watches the slow water drift past the old mill"
    val nearDup = original + " today"
    val distinct_ = "completely different content about distributed query engines " +
      "shuffles partitions and catalyst optimizer rules in modern analytics systems"
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val kept = Streams.streamingMinhashDedup(
      in.toDS().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts",
      watermark = "0 seconds", window_ = "1 minute")
    val q = kept.writeStream.outputMode("append")
      .format("memory").queryName("mh_dedup").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:00:05")
      in.addData((1L, original, t0), (2L, nearDup, t1), (3L, distinct_, t1))
      q.processAllAvailable()
      // advance the watermark past the window so the aggregation emits
      in.addData((99L, "late watermark advancer row", java.sql.Timestamp.valueOf("2024-01-01 10:05:00")))
      q.processAllAvailable()
      val ids = spark.sql("SELECT id FROM mh_dedup").collect().map(_.getLong(0)).toSet
      assert(ids.contains(1L), s"original kept: $ids")   // owns all bands
      assert(!ids.contains(2L), s"near-dup dropped: $ids") // lost shared bands
      assert(ids.contains(3L), s"distinct kept: $ids")
    } finally q.stop()
  }

  test("checkpointed streaming dedup resumes: cross-restart duplicates stay dropped") {
    val base = Files.createTempDirectory("graftchk").toString
    val (in, out, chk) = (base + "/in", base + "/out", base + "/chk")
    def run(): Unit = {
      val schema = spark.read.parquet(in).schema
      val stream = Streams.readParquetStream(spark, in, schema)
      val q = Streams.streamingDedup(stream, "ts", "1 hour", Seq("event_id"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", chk)
        .format("parquet").option("path", out).start()
      try q.processAllAvailable() finally q.stop()
    }
    // batch 1: two events, one internal duplicate
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), 2.0)
    ).toDF("event_id", "ts", "value").coalesce(1).write.mode("append").parquet(in)
    run()
    assert(spark.read.parquet(out).count() === 2)
    // batch 2 after restart: one new event + a replay of event 1 — the
    // restored state must still drop it
    Seq(
      (3L, java.sql.Timestamp.valueOf("2024-01-01 10:02:00"), 3.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0)
    ).toDF("event_id", "ts", "value").coalesce(1).write.mode("append").parquet(in)
    run()
    val ids = spark.read.parquet(out).select("event_id").as[Long].collect().sorted
    assert(ids === Array(1L, 2L, 3L))
  }

  test("stream-static as-of enrichment joins each batch via the broadcast exec") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val quotes = Seq(("A", 5L, 1.0), ("A", 10L, 2.0), ("B", 20L, 9.0))
      .toDF("sym", "t", "px")
    val enrich = Streams.asofEnrichBatch(quotes, Seq("sym"), Seq("sym"),
      "t", "t", Seq("px"))
    val in = MemoryStream[(String, Long, String)]
    val collected = new java.util.concurrent.ConcurrentLinkedQueue[(String, Option[Double])]()
    val q = in.toDS().toDF("sym", "t", "trade")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        enrich(batch).collect().foreach { r =>
          collected.add(r.getAs[String]("trade") ->
            Option(r.getAs[Any]("px")).map(_.asInstanceOf[Double]))
        }
      }.start()
    try {
      in.addData(("A", 12L, "t1"), ("B", 15L, "t2"))
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val out = collected.asScala.toMap
      assert(out === Map("t1" -> Some(2.0), "t2" -> None))
    } finally q.stop()
  }

  test("transformWithState sessionizer matches the FMGWS one on timer close") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Streams.SessionEvent]
    val sessions = Streams.sessionizeTws(in.toDS(), gapSeconds = 600, watermark = "0 seconds")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_tws").start()
    try {
      in.addData(
        Streams.SessionEvent(1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
        Streams.SessionEvent(1L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 2.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM sess_tws").count() === 0) // still open
      // advance watermark past 10:05 + gap → timer fires for user 1
      in.addData(
        Streams.SessionEvent(2L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 9.0))
      q.processAllAvailable()
      in.addData(
        Streams.SessionEvent(2L, java.sql.Timestamp.valueOf("2024-01-01 12:00:01"), 1.0))
      q.processAllAvailable()
      val out = spark.sql(
        "SELECT user_id, n_events, total_value FROM sess_tws").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      assert(out.toSeq === Seq((1L, 2, 3.0)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("rate source adapter yields events-shaped rows") {
    val df = Streams.rateEvents(spark, rowsPerSecond = 500, nUsers = 10)
    assert(df.isStreaming)
    assert(df.columns.toSeq === Seq("user_id", "ts", "event_id", "event_type", "value"))
    val q = df.writeStream.outputMode("append")
      .format("memory").queryName("rate_out").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n == 0 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = spark.sql("SELECT * FROM rate_out").count()
        if (n == 0) Thread.sleep(200)
      }
      assert(n > 0)
      val types = spark.sql("SELECT DISTINCT event_type FROM rate_out")
        .collect().map(_.getString(0)).toSet
      assert(types.subsetOf(Set("click", "purchase")))
    } finally q.stop()
  }

  test("streaming as-of enrichment: latest reference at-or-before, across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def ts(s0: String) = java.sql.Timestamp.valueOf(s0)
    val in = MemoryStream[Streams.AsofIn]
    val out = Streams.streamingAsofEnrich(in.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("asof_enrich").start()
    try {
      // batch 1: two reference updates for key 1, OUT OF ORDER, plus an
      // interleaved query — same-batch rows apply in event-time order
      in.addData(
        Streams.AsofIn(1L, ts("2024-01-01 10:20:00"), isRef = true, 2.0),
        Streams.AsofIn(1L, ts("2024-01-01 10:00:00"), isRef = true, 1.0),
        Streams.AsofIn(1L, ts("2024-01-01 10:10:00"), isRef = false, 0.0))
      q.processAllAvailable()
      // batch 2: queries against accumulated state; key 2 has no refs
      in.addData(
        Streams.AsofIn(1L, ts("2024-01-01 10:30:00"), isRef = false, 0.0),
        Streams.AsofIn(1L, ts("2024-01-01 09:00:00"), isRef = false, 0.0),
        Streams.AsofIn(2L, ts("2024-01-01 10:00:00"), isRef = false, 0.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT key, ts, ref_value FROM asof_enrich").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString.take(19),
          if (r.isNullAt(2)) null else r.getDouble(2))).toSet
      assert(rows === Set(
        (1L, "2024-01-01 10:10:00", 1.0),   // saw the 10:00 ref despite arrival order
        (1L, "2024-01-01 10:30:00", 2.0),   // latest ref from the earlier batch
        (1L, "2024-01-01 09:00:00", null),  // before any reference
        (2L, "2024-01-01 10:00:00", null))) // key with no reference stream
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }
}
