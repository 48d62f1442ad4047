package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SURVEY §5 dual-mode pattern: the reference runs its suite single- and
  * multi-process and asserts identical results; the Spark analogue is a
  * shuffle-partition / input-partition sweep. Every deterministic
  * operator must produce identical row multisets under repartitioning.
  */
class RobustnessSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def li(parts: Int): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet").repartition(parts)

  private def sweep(name: String)(build: DataFrame => DataFrame): Unit =
    test(s"$name is invariant under partitioning") {
      val results = Seq(1, 7).map { parts =>
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        try build(li(parts)).collect().map(_.toString).sorted.toSeq
        finally spark.conf.set("spark.sql.shuffle.partitions", "4")
      }
      assert(results(0) === results(1), s"$name differs between partition counts")
    }

  sweep("groupby First/Last with composite tie-break") { d =>
    GroupBy.groupby(
      d.withColumn("ord", col("l_linenumber") * 1000 + col("l_quantity").cast("long")),
      Seq("l_orderkey"),
      Seq("l_quantity" -> "First", "l_quantity" -> "Last", "l_quantity" -> "Sum"),
      orderCol = "ord")
  }

  sweep("dropDuplicatesKeepFirst") { d =>
    Filters.dropDuplicatesKeepFirst(d, Seq("l_orderkey"), Seq("l_linenumber", "l_quantity"))
      .select("l_orderkey", "l_linenumber", "l_quantity")
  }

  sweep("matchOp first-right-match") { d =>
    // deterministic left side (limit() is partitioning-dependent);
    // rightOrder ties are broken by the kept values inside matchOp
    Joins.matchOp(
      d.select("l_orderkey", "l_quantity").filter(col("l_orderkey") < 2000),
      d, Seq("l_orderkey"), Seq("l_orderkey"), rightOrder = "l_linenumber",
      rightColumns = Some(Seq("l_partkey")))
  }

  test("ffill over a unique total order is invariant under partitioning") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val results = Seq(1, 7).map { parts =>
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try Imputation.ffill(
        orders.repartition(parts).select(col("o_orderkey"),
          when(col("o_totalprice") < 50000, lit(null)).otherwise(col("o_totalprice")).as("v")),
        Seq("v"), "o_orderkey").collect().map(_.toString).sorted.toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    assert(results(0) === results(1))
  }

  sweep("filterSplit pass side") { d =>
    Filters.filterSplit(d, Seq(Filters.Criterion.cv("l_quantity", "<", 10)))._1
  }

  test("curate is invariant under partitioning") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val results = Seq(1, 7).map { parts =>
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try graft.ml.Curate.curate(docs.repartition(parts), "doc_id", "text",
        graft.ml.Curate.Config(langs = Set("en", "de", "fr", "es"),
          minTokens = 10L, maxDupLineFrac = 0.8, maxTopNgramCharShare = 0.8,
          sampleModulus = 10, sampleKeep = 7))
        .collect().map(_.toString).sorted.toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    assert(results(0) === results(1))
  }

  test("packSequences bins are invariant under partitioning") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
    val results = Seq(1, 7).map { parts =>
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try Sampling.packSequences(docs.repartition(parts), "n", "doc_id",
        budget = 2048, partitionCols = Seq("lang"))
        .collect().map(_.toString).sorted.toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    assert(results(0) === results(1))
  }

  test("minhash pair detection is deterministic across partitioning") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val results = Seq(1, 7).map { parts =>
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try {
        val d = docs.repartition(parts)
        val copies = d.select((col("doc_id") + 10000).as("doc_id"),
          substring(col("text"), 1, 150).as("text"))
        graft.ml.Dedup.minhashPairs(d.unionByName(copies), "doc_id", "text", threshold = 0.5)
          .select("id_a", "id_b").collect().map(_.toString).sorted.toSeq
      } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    assert(results(0) === results(1))
  }
}
