package graft

import graft.functions.Similarity
import graft.plans.Kernels
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs0 = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val truncated = docs0.select((col("doc_id") + 1000000).as("doc_id"),
      substring(col("text"), 1, 200).as("text"))
    val docs = docs0.unionByName(truncated)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // csv probe
    val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
    val tmpd = java.nio.file.Files.createTempDirectory("csvprobe").toString
    graft.sources.Writers.toCsv(li0, s"$tmpd/li.csv")
    time("csv-read-untyped")(graft.sources.Readers.readCsv(spark, s"$tmpd/li.csv",
      graft.sources.Readers.CsvOptions(guessDatatypes = false)).count())
    val typed = graft.sources.Readers.readCsv(spark, s"$tmpd/li.csv")
    time("csv-read-typed")(typed.count())
    println("PROBE schema " + typed.schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(", "))

    // knn probe
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val knnq = graft.ml.Ann.bruteForceKnn(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
    time("knn-all")(knnq.count())
    val scored = emb.select(col("vec_id").as("neighbour_id"), col("embedding").as("cv"))
      .join(broadcast(emb.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"), col("embedding").as("qv"))),
        col("query_id") =!= col("neighbour_id"))
    time("knn-scored-join")(scored.count())
    time("knn-cosines")(scored.select(Kernels.cosineSim(col("qv"), col("cv")).as("c")).filter(col("c") > -2).count())

    val sh = docs.select(col("doc_id").as("id"), Kernels.wordShingles(col("text"), 3).as("sh"))
    time("shingles")(sh.count())
    time("shingle-elems")(sh.select(explode(col("sh"))).count())
    val sig = sh.select(col("id"), Kernels.minhashSig(col("sh"), 64).as("sig"))
    time("minhash64")(sig.count())
    val bandRows = sh.select(col("id"), explode(Similarity.lshBands(
      Kernels.minhashSig(col("sh"), 64), 16, 4)).as("bandkey"))
    time("bandRows")(bandRows.count())
    val cand = bandRows.select(col("bandkey"), col("id").as("id_a"))
      .join(bandRows.select(col("bandkey"), col("id").as("id_b")), Seq("bandkey"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    time("candidates")(cand.count())
    val verified = cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(Similarity.jaccard(col("sh_a"), col("sh_b")).as("j"))
      .filter(col("j") >= 0.5)
    time("verify")(verified.count())
    spark.stop()
  }
}
