package graft

import graft.plans.Kernels
import org.apache.spark.sql.functions._

object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = docs.select(
      Kernels.simhash64(split(col("text"), " ")).as("sh"),
      Kernels.minhashSig(Kernels.wordShingles(col("text"), 2), 8).as("mh"),
      Kernels.minKHashes(Kernels.wordShingles(col("text"), 2), 4).as("mk"),
      Kernels.localeNumber(col("text")).as("ln"),
      Kernels.repStats(Kernels.wordShingles(col("text"), 2)).as("rs"),
      Kernels.lineRepStats(col("text")).as("ls"))
    df.explain("codegen")
    println("ROWS=" + df.count())
    spark.stop()
  }
}
