package graft.ml

import graft.GraftSession
import org.apache.spark.sql.functions._

/** One-off stage profiler for the minhash staged verify (r14): times the
  * candidate job, the stage-1 prune and the literal verify separately on
  * the q_minhash_pairs construction (doubled corpus, t = 1.0). Run:
  * `Test/runMain graft.ProfileVerify <sfDir>`.
  */
object ProfileVerify {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[16]")
      .config("spark.sql.shuffle.partitions", "16").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pv] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    phase("warmup") {
      val d = spark.range(300).selectExpr("id AS doc_id",
        "concat('alpha beta gamma tok', id % 7, ' delta epsilon zeta') AS text")
      graft.ml.Dedup.minhashPairs(d, "doc_id", "text").count()
    }
    (1 to 2).foreach { round =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val corpus = graft.operators.SetOps.concat(docs,
        docs.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val sh = phase(s"r$round shingleFrame persist+count") {
        val f = graft.ml.Dedup.shingleFrame(corpus, "doc_id", "text", 3).persist(mem)
        f.count(); f
      }
      val bands = phase(s"r$round bandFrame (lazy)") {
        graft.ml.Dedup.bandFrame(sh, 64, 16)
      }
      val scope = new graft.operators.CacheScope
      val cand = phase(s"r$round candidates persist+count") {
        val c = Dedup.bucketSelfJoin(bands, "bandkey", Seq("id"),
            maxBucket = 1000, hardCap = 20000, scope)
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b")).distinct()
          .persist(mem)
        println(s"[pv] r$round nCand=${c.count()}")
        c
      }
      val fpA = sh.select(col("id").as("id_a"), col("sz").as("sz_a"),
        xxhash64(array_sort(array_distinct(transform(col("sh"), x => xxhash64(x)))))
          .as("fp_a"))
      val fpB = sh.select(col("id").as("id_b"), col("sz").as("sz_b"),
        xxhash64(array_sort(array_distinct(transform(col("sh"), x => xxhash64(x)))))
          .as("fp_b"))
      val pruned = phase(s"r$round stage1 fp prune persist+count") {
        val p = cand.join(fpA, Seq("id_a")).join(fpB, Seq("id_b"))
          .filter(col("sz_a") === col("sz_b") && col("fp_a") === col("fp_b"))
          .select(col("id_a"), col("id_b")).persist(mem)
        println(s"[pv] r$round nPruned=${p.count()}")
        p
      }
      phase(s"r$round literal verify noop") {
        val out = pruned
          .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
          .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
          .select(col("id_a"), col("id_b"),
            graft.plans.Kernels.jaccardSim(col("sh_a"), col("sh_b")).as("jaccard"))
          .filter(col("jaccard") >= 1.0)
        out.write.format("noop").mode("overwrite").save()
      }
      phase(s"r$round r13-direct verify noop") {
        val out = cand
          .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a"), col("sz").as("sz_a")), Seq("id_a"))
          .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b"), col("sz").as("sz_b")), Seq("id_b"))
          .filter(lit(1.0) * col("sz_b") - lit(1e-9) <= col("sz_a") &&
            lit(1.0) * col("sz_a") - lit(1e-9) <= col("sz_b"))
          .select(col("id_a"), col("id_b"),
            graft.plans.Kernels.jaccardSim(col("sh_a"), col("sh_b")).as("jaccard"))
          .filter(col("jaccard") >= 1.0)
        out.write.format("noop").mode("overwrite").save()
      }
      phase(s"r$round full minhashPairs noop") {
        graft.ml.Dedup.minhashPairs(corpus, "doc_id", "text", threshold = 1.0)
          .write.format("noop").mode("overwrite").save()
      }
      sh.unpersist(false); cand.unpersist(false); pruned.unpersist(false)
      scope.releaseNow()
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
