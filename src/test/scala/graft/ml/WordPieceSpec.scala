package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The WordPiece tokenizer: likelihood-scored merge learning (NOT raw
  * pair frequency — the criterion that separates it from BPE), greedy
  * longest-match-first encoding with `##` continuations, `[UNK]`
  * semantics, losslessness under a trained model, persistence, ids,
  * and determinism.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def words(c: org.apache.spark.sql.Column) =
    graft.plans.Kernels.wordShingles(c, 1)

  test("merge learning maximizes count(lr)/(count(l)·count(r)), not raw frequency") {
    // (a,##b) count 100 but a appears 1000 times → score 100/(1000·100) = 1e-3
    // (x,##y) count 50 with x,##y each 50      → score 50/(50·50)      = 2e-2
    // BPE would merge ab first; WordPiece must merge xy first.
    val dict = Array(("ab", 100L), ("a", 900L), ("xy", 50L))
    val merges = WordPiece.learnMerges(dict, numMerges = 1, minCount = 2)
    assert(merges.toSeq === Seq("xy"), merges.toSeq.toString)
  }

  test("training is deterministic: same corpus, same pieces") {
    val corpus = Seq.tabulate(50)(i => s"low lower lowest new newest ${i % 3}").toDF("text")
    val a = WordPiece.train(corpus, "text", numMerges = 30)
    val b = WordPiece.train(corpus, "text", numMerges = 30)
    assert(a.pieces.toSeq === b.pieces.toSeq)
    assert(a.pieces(0) === WordPiece.Unk)
  }

  test("encoding is greedy longest-match-first with ## continuations; unmatched → [UNK]") {
    // injected restricted vocabulary (not trained): classic BERT example
    val m = WordPiece.Model(Array(WordPiece.Unk,
      "un", "u", "n", "##able", "##a", "##ble", "a", "b"))
    val df = Seq((1L, "unable"), (2L, "una"), (3L, "uz"), (4L, "b unable")).toDF("id", "text")
    val got = df.select(col("id"), WordPiece.tokens(col("text"), m).as("t"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList)).toMap
    assert(got(1L) === List("un", "##able")) // longest match beats u+##n… and ##a+##ble
    assert(got(2L) === List("un", "##a"))
    assert(got(3L) === List(WordPiece.Unk)) // 'z' has no piece → whole word UNK
    assert(got(4L) === List("b", "un", "##able"))
  }

  test("trained model is lossless and compresses; base covers unseen charset words") {
    val corpus = Seq.tabulate(80)(i =>
      s"the training corpus keeps repeating the same words over and over again ${i % 5}").toDF("text")
    val m = WordPiece.train(corpus, "text", numMerges = 60)
    val docs = Seq(
      (1L, "the training corpus"),
      (2L, "WORDS with CAPS and punct!! 42"),
      (3L, "unseen zyxwvut vocabulary"),
      (4L, "")).toDF("doc_id", "text")
    val rows = docs.select(
      col("doc_id"),
      regexp_replace(array_join(WordPiece.tokens(col("text"), m), ""), "##", "").as("rebuilt"),
      array_join(words(col("text")), "").as("expected"),
      size(WordPiece.tokens(col("text"), m)).as("np"),
      size(words(col("text"))).as("nw"),
      length(array_join(words(col("text")), "")).as("nc")).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("rebuilt") === r.getAs[String]("expected"),
        s"doc ${r.getLong(0)} not lossless")
      assert(r.getAs[Int]("np") >= r.getAs[Int]("nw"), s"doc ${r.getLong(0)}")
      assert(r.getAs[Int]("np") <= r.getAs[Int]("nc"), s"doc ${r.getLong(0)}")
    }
    val inDomain = rows.find(_.getLong(0) == 1L).get
    assert(inDomain.getAs[Int]("np") < inDomain.getAs[Int]("nc"), "no compression")
  }

  test("tokenIds: kernel path ≡ idTable recompute, dense, first-occurrence rule, [UNK] id") {
    val corpus = Seq.tabulate(60)(i => s"pack my box with five dozen jugs ${i % 4}").toDF("text")
    val m = WordPiece.train(corpus, "text", numMerges = 40)
    val ids = m.idTable
    val rows = corpus.limit(10).select(
      WordPiece.tokens(col("text"), m).as("toks"),
      WordPiece.tokenIds(col("text"), m).as("ids")).collect()
    rows.foreach { r =>
      val toks = r.getSeq[String](0)
      val got = r.getSeq[Int](1)
      assert(got === toks.map(t => ids.get(t).intValue()),
        "kernel ids differ from idTable recompute")
      assert(got.forall(i => i >= 0 && i < m.pieces.length))
    }
    // restricted vocab: [UNK] fires and carries id 0
    val tiny = WordPiece.Model(Array(WordPiece.Unk, "a"))
    val unkIds = Seq(("az")).toDF("text")
      .select(WordPiece.tokenIds(col("text"), tiny)).collect()(0).getSeq[Int](0)
    assert(unkIds === Seq(0))
  }

  test("save/load roundtrip preserves pieces and token output; encoding is partition-invariant") {
    val corpus = Seq.tabulate(60)(i => s"repeatable words for the roundtrip ${i % 3}").toDF("text")
    val m = WordPiece.train(corpus, "text", numMerges = 25)
    val tmp = java.nio.file.Files.createTempDirectory("wp_model").toString
    WordPiece.save(spark, m, s"$tmp/model")
    val m2 = WordPiece.load(spark, s"$tmp/model")
    assert(m2.pieces.toSeq === m.pieces.toSeq)
    assert(m2.maxLen === m.maxLen)
    val results = Seq(1, 7).map { parts =>
      corpus.repartition(parts)
        .select(array_join(WordPiece.tokens(col("text"), m2), " "))
        .collect().map(_.getString(0)).sorted.toSeq
    }
    assert(results(0) === results(1))
    assert(results(0) === corpus
      .select(array_join(WordPiece.tokens(col("text"), m), " "))
      .collect().map(_.getString(0)).sorted.toSeq)
  }
}
