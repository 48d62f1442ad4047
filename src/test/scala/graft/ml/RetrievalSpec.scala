package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark join spark filter"),   // tf(spark)=2, dl=4
    (2L, "join join join join"),       // tf(join)=4, dl=4
    (3L, "filter scan merge sort"),    // no query terms
    (4L, "spark"),                     // tf(spark)=1, dl=1
    (5L, null.asInstanceOf[String])    // null text
  ).toDF("doc_id", "text")

  test("bm25 matches the hand-computed formula") {
    val out = Retrieval.bm25(corpus, "doc_id", "text", Seq("spark", "join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // corpus stats over docs WITH text: N=4, avgdl=(4+4+4+1)/4=3.25
    val n = 4.0; val avgdl = 3.25
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def w(tf: Double, dl: Double) =
      tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    // df(spark)=2 (docs 1,4), df(join)=2 (docs 1,2)
    val exp1 = idf(2) * w(2, 4) + idf(2) * w(1, 4)
    val exp2 = idf(2) * w(4, 4)
    val exp4 = idf(2) * w(1, 1)
    assert(math.abs(out(1L) - exp1) < 1e-12, s"${out(1L)} vs $exp1")
    assert(math.abs(out(2L) - exp2) < 1e-12)
    assert(math.abs(out(4L) - exp4) < 1e-12)
    // zero-hit and null-text docs emit no row
    assert(!out.contains(3L) && !out.contains(5L))
  }

  test("bm25TopK rank order is deterministic and partition-invariant") {
    val many = Seq.tabulate(200) { i =>
      val words = Seq.fill(1 + i % 7)("spark") ++ Seq.fill(1 + (i * 3) % 11)("pad")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val a = Retrieval.bm25TopK(many, "doc_id", "text", Seq("spark"), k = 20)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sortBy(_._2)
    val b = Retrieval.bm25TopK(many.repartition(7), "doc_id", "text",
      Seq("spark"), k = 20)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sortBy(_._2)
    assert(a === b)
    assert(a.length === 20 && a.map(_._2) === (1 to 20))
    // highest-tf-per-length doc ranks first: score grows with tf, shrinks
    // with dl — doc with tf=7, dl=13 beats tf=1 docs
    assert(a.head._2 === 1)
  }

  test("rrfFuse combines rank lists; absent ids contribute zero") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val fused = Retrieval.rrfFuse(Seq(a, b), "doc_id", topK = 4)
      .orderBy("rank").collect().map(r => (r.getLong(0), r.getInt(1)))
    // 20: 1/62 + 1/61 ≈ .0325 wins over 10: 1/61 ≈ .0164
    assert(fused.head === ((20L, 1)))
    assert(fused.map(_._1).toSet === Set(10L, 20L, 30L, 40L))
    // 10 (1/61) beats 40 (1/62) beats 30 (1/63)
    assert(fused.toSeq === Seq((20L, 1), (10L, 2), (40L, 3), (30L, 4)))
  }

  test("bm25 rejects an empty term set") {
    val ex = intercept[IllegalArgumentException](
      Retrieval.bm25(corpus, "doc_id", "text", Nil))
    assert(ex.getMessage.contains("term"))
  }
}
