package graft

import org.apache.spark.sql.functions._

/** One-off phase profiler for q_dedup_ingest (not a spec): reproduces the
  * bench row's two ingest cycles with per-phase wall timings so driver
  * overhead vs data work is attributable. Run:
  * `sbt "Test/runMain graft.ProfileIngest /root/testdata/sf0.1"`.
  */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.SetOps

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def mdText(idc: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat_ws(" ", (0 until 8).map(i =>
        md5(concat(idc.cast("string"), lit(s"-$i")))): _*)

    // warm the kernels like Bench does
    phase("warmup") {
      val d300 = spark.range(300).selectExpr("id AS doc_id",
        "concat('alpha beta gamma tok', id % 7, ' delta epsilon zeta eta theta') AS text")
      graft.ml.Dedup.minhashPairs(d300, "doc_id", "text").count()
    }

    (1 to 2).foreach { round =>
      val base = phase(s"r$round buildBaseIndex") {
        val d = java.nio.file.Files.createTempDirectory("profingest").toString + "/idx"
        val built = graft.ml.Dedup.minhashIndex(docs, "doc_id", "text")
        graft.ml.Dedup.writeMinhashIndex(built, d)
        built.release()
        d
      }
      val idxDir = phase(s"r$round copyIndex") {
        val d = java.nio.file.Files.createTempDirectory("profingest2").toString + "/idx"
        org.apache.commons.io.FileUtils.copyDirectory(
          new java.io.File(base), new java.io.File(d))
        d
      }
      val ingest = graft.streaming.Streams.dedupIngestBatch(
        idxDir, "doc_id", "text", threshold = 1.0)
      val batch1 = SetOps.concat(
        docs.filter(col("doc_id") % 8 === 0)
          .select((col("doc_id") + 2000000).as("doc_id"), col("text")),
        docs.filter(col("doc_id") % 8 === 1)
          .select((col("doc_id") + 3000000).as("doc_id"),
            mdText(col("doc_id") + 3000000).as("text")))
      // deep breakdown of one cycle, replicating dedupIngestBatch's internals
      if (round == 2) {
        val idx = graft.ml.Dedup.readMinhashIndex(spark, idxDir)
        val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
        val shAll = phase("d shingleFrame persist") {
          val f = graft.ml.Dedup.shingleFrame(batch1, "doc_id", "text", idx.shingleN).persist(mem)
          f.count(); f
        }
        val bandAll = phase("d bandFrame persist") {
          val f = graft.ml.Dedup.bandFrame(shAll, idx.k, idx.nBands).persist(mem)
          f.count(); f
        }
        // localCheckpoint, not persist — mirrors dedupIngestBatch: the
        // r14 fix that cuts the probe's staged-verify tree out of every
        // downstream stage's lineage (persist here left the driver
        // re-analyzing ~million-node trees: intra 348 s / components
        // 183 s at sf0.01 in the before-fix profile)
        val vsCorpus = phase("d probe (incrementalVerifiedPairs)") {
          graft.ml.Dedup.incrementalVerifiedPairs(
            shAll, bandAll, idx, 1.0, 20000, new graft.operators.CacheScope)
            .select(col("id_a").as("__dup_id")).distinct()
            .localCheckpoint(eager = true)
        }
        val fresh = batch1.join(vsCorpus, batch1("doc_id") === col("__dup_id"), "left_anti")
        val freshIds = fresh.select(col("doc_id").as("id"))
        val intra = phase("d intra pairs") {
          val f = graft.ml.Dedup.minhashVerifiedPairs(
            shAll.join(freshIds, Seq("id"), "left_semi"),
            bandAll.join(freshIds, Seq("id"), "left_semi"),
            1.0, 1000, 20000, new graft.operators.CacheScope).persist(mem)
          f.count(); f
        }
        val chained = phase("d components+join") {
          graft.ml.Dedup.dedupedCorpus(fresh, "doc_id", intra)
        }
        val survivors = phase("d localCheckpoint") { chained.localCheckpoint(true) }
        val survIds = survivors.select(col("doc_id").as("id"))
        phase("d append shingles+bands") {
          graft.ml.Dedup.appendPreSignedToMinhashIndex(idxDir,
            shAll.join(survIds, Seq("id"), "left_semi"),
            bandAll.join(survIds, Seq("id"), "left_semi"))
        }
        shAll.unpersist(false); bandAll.unpersist(false)
      }
      // job-count accounting (the r11 verdict flagged ~100 jobs / two
      // cycles as driver overhead): count jobs submitted during cycle1
      val jobs = new java.util.concurrent.atomic.AtomicInteger()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val s1 = phase(s"r$round cycle1") { val s = ingest(batch1); s.count(); s }
      spark.sparkContext.removeSparkListener(listener)
      println(s"[profile] r$round cycle1 jobs=${jobs.get}")
      val batch2 = SetOps.concat(
        docs.filter(col("doc_id") % 8 === 1)
          .select((col("doc_id") + 4000000).as("doc_id"),
            mdText(col("doc_id") + 3000000).as("text")),
        docs.filter(col("doc_id") % 8 === 2)
          .select((col("doc_id") + 5000000).as("doc_id"),
            mdText(col("doc_id") + 5000000).as("text")))
      phase(s"r$round cycle2") { ingest(batch2).count() }
    }
    spark.stop()
  }
}
