package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs() = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "one two three four five six seven eight nine ten"),
    (3L, "red orange yellow green blue indigo violet ultra infra deep"),
    (4L, "alpha beta gamma delta epsilon zeta eta theta different ending"),
    (5L, "totally unrelated words with nothing shared at all here now"))
    .toDF("doc_id", "text")

  test("prebuilt BenchDict probe == one-shot contaminatedIds; dict releases") {
    val docs = mkDocs()
    val bench = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "two three four five six seven eight nine").toDF("btext")
    val bd = Decontaminate.buildBenchDict(bench, "btext", n = 8)
    try {
      val bad = Decontaminate.contaminatedIdsAgainst(docs, "doc_id", "text", bd)
        .collect().map(_.getLong(0)).toSet
      assert(bad === Set(1L, 2L, 4L))
      // a second probe reuses the same dict/bloom — no rebuild needed
      val again = Decontaminate.contaminatedIdsAgainst(
        docs.filter($"doc_id" === 4L), "doc_id", "text", bd)
        .collect().map(_.getLong(0)).toSet
      assert(again === Set(4L))
    } finally bd.release()
  }

  test("streaming decontaminateBatch drops contaminated docs per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bench = Seq("alpha beta gamma delta epsilon zeta eta theta").toDF("btext")
    val bd = Decontaminate.buildBenchDict(bench, "btext", n = 8)
    val in = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        out ++= graft.streaming.Streams.decontaminateBatch(bd, "doc_id", "text")(batch)
          .select("doc_id").collect().map(_.getLong(0))
        ()
      }.start()
    try {
      in.addData((1L, "alpha beta gamma delta epsilon zeta eta theta tail words"),
                 (2L, "completely clean text with no benchmark overlap at all"))
      q.processAllAvailable()
      in.addData((3L, "more clean words arriving in the second micro batch"))
      q.processAllAvailable()
      assert(out.sorted.toSeq === Seq(2L, 3L))
    } finally { q.stop(); bd.release() }
  }

  test("contaminated = docs sharing any benchmark n-gram; clean set is the rest") {
    val docs = mkDocs()
    // benchmark holds an 8-gram from doc 1 (also the prefix of doc 4)
    // and one from doc 2
    val bench = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "two three four five six seven eight nine").toDF("btext")
    val bad = Decontaminate.contaminatedIds(docs, "doc_id", "text", bench, "btext", n = 8)
      .collect().map(_.getLong(0)).toSet
    assert(bad === Set(1L, 2L, 4L))
    val clean = Decontaminate.decontaminate(docs, "doc_id", "text", bench, "btext", n = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean === Set(3L, 5L))
  }

  test("minHits raises the overlap bar") {
    val docs = mkDocs()
    val bench = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "beta gamma delta epsilon zeta eta theta iota").toDF("btext")
    // doc 1 contains both benchmark 8-grams, doc 4 only the first
    val strict = Decontaminate.contaminatedIds(docs, "doc_id", "text", bench, "btext",
      n = 8, minHits = 2).collect().map(_.getLong(0)).toSet
    assert(strict === Set(1L))
  }

  test("normalization matches the shingle kernel (case/punct-insensitive)") {
    val docs = Seq((1L, "Alpha, BETA; gamma: delta epsilon zeta eta theta!")).toDF("doc_id", "text")
    val bench = Seq("alpha beta gamma delta epsilon zeta eta theta").toDF("btext")
    assert(Decontaminate.contaminatedIds(docs, "doc_id", "text", bench, "btext", n = 8)
      .count() === 1L)
  }
}
