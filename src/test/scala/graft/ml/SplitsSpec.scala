package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Leakage-safe splitting: the structural guarantee (clusters never
  * straddle), determinism, share calibration, and the guard rails.
  */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) = (0L until n.toLong).map(i => (i, s"doc $i"))
    .toDF("doc_id", "text")

  test("near-dup clusters never straddle the split") {
    // chains of 4: {4k, 4k+1, 4k+2, 4k+3}
    val pairs = (0L until 400L).filter(_ % 4 != 3)
      .map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Splits.leakageSafeSplit(docs(400), "doc_id", pairs,
      holdoutPermille = 300, seed = 1)
    val perCluster = out
      .withColumn("comp", col("doc_id") - pmod(col("doc_id"), lit(4)))
      .groupBy("comp").agg(countDistinct("split").as("n"))
      .agg(max("n")).collect()(0).getLong(0)
    assert(perCluster === 1L, "a cluster straddles the split")
    // both sides populated at 30% target on 100 clusters
    val sides = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sides.keySet === Set("train", "holdout"), sides)
    val frac = sides("holdout").toDouble / 400
    assert(frac > 0.15 && frac < 0.45, s"holdout share $frac far from 0.30")
  }

  test("deterministic across partitionings and runs; seed moves the boundary") {
    val pairs = Seq((0L, 1L), (2L, 3L)).toDF("id_a", "id_b")
    def run(parts: Int, seed: Int) = Splits.leakageSafeSplit(
        docs(50).repartition(parts), "doc_id", pairs, 200, seed)
      .orderBy("doc_id").collect().map(_.getAs[String]("split")).toSeq
    assert(run(1, 7) === run(11, 7))
    assert(run(3, 7) !== run(3, 8), "seed did not move the boundary")
  }

  test("docs absent from pairs split as singletons; split column collision refused") {
    val pairs = Seq((0L, 1L)).toDF("id_a", "id_b")
    val out = Splits.leakageSafeSplit(docs(20), "doc_id", pairs, 500, seed = 3)
    assert(out.count() === 20)
    // ids 0 and 1 agree (the one cluster); everyone got a side
    val s01 = out.filter(col("doc_id") < 2).select("split").distinct().count()
    assert(s01 === 1L)
    assert(out.filter(col("split").isNull).count() === 0L)
    val e = intercept[IllegalArgumentException] {
      Splits.leakageSafeSplit(docs(5).withColumn("split", lit("x")),
        "doc_id", pairs, 100)
    }
    assert(e.getMessage.contains("split"))
  }

  test("leakageSafeFolds: clusters land whole in one fold; folds cover 0..k-1 reasonably") {
    val pairs = (0L until 300L).filter(_ % 3 != 2)
      .map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Splits.leakageSafeFolds(docs(300), "doc_id", pairs, k = 5, seed = 4)
    val straddle = out
      .withColumn("comp", col("doc_id") - pmod(col("doc_id"), lit(3)))
      .groupBy("comp").agg(countDistinct("fold").as("n"))
      .agg(max("n")).collect()(0).getLong(0)
    assert(straddle === 1L)
    val folds = out.select("fold").distinct().collect().map(_.getInt(0)).sorted
    assert(folds.forall(f => f >= 0 && f < 5), folds.toSeq)
    assert(folds.length >= 4, s"only ${folds.toSeq} folds hit on 100 clusters")
    // fold assignment is consistent with the two-way split's buckets:
    // same md5, same component unit
    val e = intercept[IllegalArgumentException](
      Splits.leakageSafeFolds(docs(5), "doc_id", pairs, k = 1))
    assert(e.getMessage.contains("k"))
  }

  test("end-to-end with real minhash pairs: twins land on the same side") {
    val base = Seq.tabulate(30)(i =>
      (i.toLong, s"completely distinct document number $i about topic ${i * 37}"))
    // plant exact twins of docs 3 and 7 under new ids
    val all = (base ++ Seq((103L, base(3)._2), (107L, base(7)._2)))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(all, "doc_id", "text",
      k = 64, bands = 16, threshold = 0.9)
    val out = Splits.leakageSafeSplit(all, "doc_id", pairs, 400, seed = 2)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(3L) === out(103L), "twin of doc 3 crossed the split")
    assert(out(7L) === out(107L), "twin of doc 7 crossed the split")
  }
}
