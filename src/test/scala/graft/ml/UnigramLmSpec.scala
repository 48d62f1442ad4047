package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  // corpus with a strong repeated subword: "ing" suffix + "data" stem
  private def corpus = Seq.tabulate(50) { i =>
    (i.toLong, Seq("data", "dataset", "datalog", "loading", "parsing",
      "running", "data", "loading", s"word$i").mkString(" "))
  }.toDF("doc_id", "text")

  test("encoding is lossless and deterministic; frequent subwords become pieces") {
    val m = UnigramLm.train(corpus, "text", vocabSize = 80, maxPieceLen = 6)
    assert(m.pieces.length <= 80)
    val enc = corpus.select(col("doc_id"), col("text"),
      UnigramLm.tokens(col("text"), m).as("toks"))
    // losslessness: concat of pieces == concat of the words themselves
    val bad = enc.filter(
      array_join(col("toks"), "") !==
        array_join(graft.plans.Kernels.wordShingles(col("text"), 1), ""))
      .count()
    assert(bad === 0L)
    // determinism: a second encode is identical
    val a = enc.select("toks").collect().map(_.getSeq[String](0))
    val b = corpus.select(UnigramLm.tokens(col("text"), m).as("toks"))
      .collect().map(_.getSeq[String](0))
    assert(a.toSeq === b.toSeq)
    // the learned vocabulary compresses: fewer pieces than characters
    val stats = enc.select(size(col("toks")).cast("double").as("np"),
      length(array_join(graft.plans.Kernels.wordShingles(col("text"), 1), ""))
        .cast("double").as("nc"))
      .agg(sum("np"), sum("nc")).collect()(0)
    assert(stats.getDouble(0) < stats.getDouble(1),
      s"pieces ${stats.getDouble(0)} !< chars ${stats.getDouble(1)}")
    // high-frequency subwords survive pruning as multi-char pieces
    val multi = m.pieces.filter(_.length > 1).toSet
    assert(multi.contains("data") || multi.contains("dat"),
      s"no data-stem piece in ${multi.take(20)}")
  }

  test("token ids are dense, reversible, and stable through save/load") {
    val m = UnigramLm.train(corpus, "text", vocabSize = 80, maxPieceLen = 6)
    val dir = java.nio.file.Files.createTempDirectory("graftunigram").toString + "/m"
    UnigramLm.save(spark, m, dir)
    val back = UnigramLm.load(spark, dir)
    assert(back.pieces.toSeq === m.pieces.toSeq)
    assert(back.logps.toSeq === m.logps.toSeq)
    val ids = corpus.select(UnigramLm.tokenIds(col("text"), back).as("ids"))
      .select(explode(col("ids")).as("id")).agg(min("id"), max("id")).collect()(0)
    assert(ids.getInt(0) >= 0, "unexpected OOV id on the training corpus")
    assert(ids.getInt(1) < m.pieces.length)
  }

  test("tokenIds kernel path ≡ the map-literal route it replaced (incl. OOV -1)") {
    val m = UnigramLm.train(corpus, "text", vocabSize = 80, maxPieceLen = 6)
    val docs = Seq((1L, "the quick fox"), (2L, ""), (3L, "zzqqxx17 unseen"))
      .toDF("doc_id", "text")
    val both = docs.select(col("doc_id"),
        UnigramLm.tokenIds(col("text"), m).as("kernel"),
        UnigramLm.tokenIdsMapLiteral(col("text"), m).as("literal"))
      .orderBy("doc_id").collect()
    both.foreach(r => assert(r.getSeq[Int](1) === r.getSeq[Int](2), s"doc ${r.getLong(0)}"))
  }

  test("EM does not decrease corpus likelihood on the fixed final vocabulary") {
    val m = UnigramLm.train(corpus, "text", vocabSize = 80, maxPieceLen = 6)
    // a degenerate competitor: same pieces, uniform probabilities —
    // trained probs must fit the corpus at least as well
    val uniform = UnigramLm.Model(m.pieces,
      Array.fill(m.pieces.length)(math.log(1.0 / m.pieces.length)))
    val ll = corpus
      .select(UnigramLm.logLikelihood(col("text"), m).as("a"),
        UnigramLm.logLikelihood(col("text"), uniform).as("b"))
      .agg(sum("a"), sum("b")).collect()(0)
    assert(ll.getDouble(0) >= ll.getDouble(1) - 1e-9,
      s"trained ${ll.getDouble(0)} < uniform ${ll.getDouble(1)}")
  }

  test("characters outside the trained charset fall back per-character with OOV ids") {
    val m = UnigramLm.train(corpus, "text", vocabSize = 80, maxPieceLen = 6)
    // word rule lowercases [a-z0-9]; feed a digit-word the corpus never had
    val odd = Seq((1L, "zzqqxx17")).toDF("doc_id", "text")
    val toks = odd.select(UnigramLm.tokens(col("text"), m).as("t"))
      .collect()(0).getSeq[String](0)
    assert(toks.mkString("") === "zzqqxx17")
  }
}
