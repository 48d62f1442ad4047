package graft

import graft.functions.{Similarity, TextFunctions}
import graft.ml.Dedup
import graft.operators.SetOps
import graft.plans.Kernels
import org.apache.spark.sql.functions._

/** Dev-only round-2 stage profiler for the slow dedup queries. */
object ProbeR2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs0 = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val truncated = docs0.select((col("doc_id") + 1000000).as("doc_id"),
      substring(col("text"), 1, 200).as("text"))
    val docs = SetOps.concat(docs0, truncated)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // ---- simhash stages ----
    val toks = split(TextFunctions.normalized(col("text")), " ", -1)
    val sig = docs.where(size(toks) >= 3)
      .select(col("doc_id").as("id"), Kernels.simhash64(toks).as("sim"))
    time("sim-signatures")(sig.count())
    val quads0 = sig.select(col("id"), col("sim"), explode(array(
      (0 until 4).map(q => concat_ws(":", lit(q),
        shiftrightunsigned(col("sim"), q * 16).bitwiseAND(lit(0xFFFFL)))): _*)).as("qk"))
    time("sim-quads")(quads0.count())
    val quads = quads0
      .withColumn("bsize", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("qk")))
      .filter(col("bsize") <= 500)
    time("sim-quads-windowed")(quads.count())
    val a = quads.select(col("qk"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = quads.select(col("qk"), col("id").as("id_b"), col("sim").as("sim_b"))
    val joined = a.join(b, Seq("qk")).filter(col("id_a") < col("id_b"))
    time("sim-join")(joined.count())
    val dist = joined.select(col("id_a"), col("id_b"),
      Similarity.hamming64(col("sim_a"), col("sim_b")).as("hamming")).distinct()
    time("sim-distinct")(dist.count())
    time("sim-full")(Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3).count())
    time("sim-full-again")(Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3).count())

    // ---- minhash stages ----
    val sh = docs.select(col("doc_id").as("id"), Kernels.wordShingles(col("text"), 3).as("sh"))
      .withColumn("sz", size(array_distinct(col("sh"))))
    time("mh-shingles")(sh.count())
    val bandRows = sh.select(col("id"), explode(Similarity.lshBands(
      Kernels.minhashSig(col("sh"), 64), 16, 4)).as("bandkey"))
    time("mh-bands")(bandRows.count())
    time("mh-full")(Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5).count())
    // ---- ngram stages ----
    val sh2 = docs.select(col("doc_id").as("id"), Kernels.wordShingles(col("text"), 3).as("sh"))
      .withColumn("sz", size(array_distinct(col("sh"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val posting0 = sh2.select(col("id"), explode(Kernels.minKHashes(col("sh"), 20)).as("shingle"))
    time("ng-posting0")(posting0.count())
    val rare = posting0.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 50).select("shingle")
    time("ng-rare")(rare.count())
    val posting = posting0.join(rare, Seq("shingle"))
    time("ng-posting")(posting.count())
    val cand2 = posting.as("x").join(posting.as("y"), Seq("shingle"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
    time("ng-cand-raw")(cand2.count())
    val cand2d = cand2.distinct()
    time("ng-cand-distinct")(cand2d.count())
    val ver = cand2d
      .join(sh2.select(col("id").as("id_a"), col("sh").as("sh_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sh2.select(col("id").as("id_b"), col("sh").as("sh_b"), col("sz").as("sz_b")), Seq("id_b"))
      .filter(lit(0.4) * col("sz_b") <= col("sz_a") && lit(0.4) * col("sz_a") <= col("sz_b"))
      .select(Kernels.jaccardSim(col("sh_a"), col("sh_b")).as("j")).filter(col("j") >= 0.4)
    time("ng-verify")(ver.count())
    time("ngram-full")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.4).count())
    time("ngram-full-again")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.4).count())
    time("corpus-full") {
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
      Dedup.dedupedCorpus(docs, "doc_id", pairs).count()
    }
    spark.stop()
  }
}
