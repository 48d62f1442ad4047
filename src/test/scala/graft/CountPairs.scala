package graft

import org.apache.spark.sql.functions._

/** One-off: containment true-pair counts at two scales (sf1 rehearsal
  * attribution — is q_containment_dedup output-bound?).
  */
object CountPairs {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[16]")
      .config("spark.sql.shuffle.partitions", "16").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val truncated = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          substring(col("text"), 1, 250).as("text"))
      val corpus = graft.operators.SetOps.concat(docs, truncated)
      val pairs = graft.ml.Dedup.containmentPairs(corpus, "doc_id", "text",
        threshold = 0.8).count()
      val dropped = corpus.count() - graft.ml.Dedup.containmentDedup(
        corpus, "doc_id", "text", threshold = 0.8).count()
      println(s"[pairs] $dir containment pairs=$pairs dropped=$dropped")
    }
    spark.stop()
  }
}
