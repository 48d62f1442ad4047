package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The learned BPE tokenizer: merge learning on the type dictionary,
  * greedy rank-order encoding, losslessness, persistence, determinism,
  * and the scale plan.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge learning follows pair frequencies; ties break lexicographically (deterministic)") {
    // dictionary: "aaab" x10 — pairs (a,a) count 20, (a,b) 10, (b,</w>) 10
    val m1 = Bpe.learnMerges(Array(("aaab", 10L)), numMerges = 2, minCount = 2)
    assert(m1(0) === ("a", "a"), s"first merge ${m1(0)}")
    // after merging: aa a b</w> -> pairs (aa,a)=10, (a,b)=10, (b,</w>)=10
    // tie at 10 breaks to the lexicographically smallest: ("a","b")
    assert(m1(1) === ("a", "b"), s"second merge ${m1(1)}")
    // determinism end-to-end: same corpus, same merges
    val corpus = Seq.tabulate(50)(i => s"low lower lowest new newest ${i % 3}").toDF("text")
    val a = Bpe.train(corpus, "text", numMerges = 30)
    val b = Bpe.train(corpus, "text", numMerges = 30)
    assert(a.merges.toSeq === b.merges.toSeq)
  }

  test("encoding is lossless (tokens reassemble every word) and monotone between words and chars") {
    val corpus = Seq.tabulate(80)(i =>
      s"the training corpus keeps repeating the same words over and over again ${i % 5}").toDF("text")
    val m = Bpe.train(corpus, "text", numMerges = 60)
    val docs = Seq(
      (1L, "the training corpus"),
      (2L, "WORDS with CAPS and punct!! 42"),
      (3L, "unseen zyxwvut vocabulary"),
      (4L, "")
    ).toDF("doc_id", "text")
    val checked = docs.select(
      col("doc_id"),
      // reassembly: concat tokens, drop the </w> markers
      regexp_replace(array_join(Bpe.tokens(col("text"), m), ""), "</w>", "").as("rebuilt"),
      array_join(Kernels_words(col("text")), "").as("expected"),
      size(Bpe.tokens(col("text"), m)).as("n_bpe"),
      size(Kernels_words(col("text"))).as("n_words"),
      length(regexp_replace(array_join(Kernels_words(col("text")), ""), " ", "")).as("n_chars"))
    val rows = checked.collect()
    rows.foreach { r =>
      assert(r.getAs[String]("rebuilt") === r.getAs[String]("expected"),
        s"doc ${r.getLong(0)} not lossless")
      val (nb, nw, nc) = (r.getAs[Int]("n_bpe"), r.getAs[Int]("n_words"), r.getAs[Int]("n_chars"))
      // each word is >= 1 token; fully-merged words hit exactly n_words;
      // never more tokens than chars + one marker per word
      assert(nb >= nw, s"doc ${r.getLong(0)}: $nb tokens < $nw words")
      assert(nb <= nc + nw, s"doc ${r.getLong(0)}: $nb tokens > chars+markers")
    }
    // the repeated in-domain words compress: fewer tokens than chars
    val inDomain = rows.find(_.getLong(0) == 1L).get
    assert(inDomain.getAs[Int]("n_bpe") < inDomain.getAs[Int]("n_chars"))
  }

  private def Kernels_words(c: org.apache.spark.sql.Column) =
    graft.plans.Kernels.wordShingles(c, 1)

  test("save/load roundtrip preserves merges and token output exactly") {
    val corpus = Seq.tabulate(40)(i => s"pack the sequence budget tokens tight $i").toDF("text")
    val m = Bpe.train(corpus, "text", numMerges = 25)
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    Bpe.save(spark, m, s"$dir/model")
    val m2 = Bpe.load(spark, s"$dir/model")
    assert(m2.merges.toSeq === m.merges.toSeq)
    val docs = Seq((1L, "pack the budget"), (2L, "sequence of tokens")).toDF("doc_id", "text")
    val t1 = docs.select(Bpe.tokens(col("text"), m)).collect().map(_.getSeq[String](0))
    val t2 = docs.select(Bpe.tokens(col("text"), m2)).collect().map(_.getSeq[String](0))
    assert(t1.toSeq === t2.toSeq)
  }

  test("tokenCount plugs into packing; encoding is partition-invariant and shuffle-free") {
    val corpus = Seq.tabulate(60)(i => s"mix shuffle pack chunk count tokens $i").toDF("text")
    val m = Bpe.train(corpus, "text", numMerges = 20)
    val docs = Seq.tabulate(30)(i => (i.toLong, s"mix pack chunk $i tokens")).toDF("doc_id", "text")
    def counts(parts: Int) = docs.repartition(parts)
      .select(col("doc_id"), Bpe.tokenCount(col("text"), m).as("n"))
      .orderBy("doc_id").collect().map(_.getInt(1)).toSeq
    assert(counts(1) === counts(7))
    val plan = docs.select(Bpe.tokenCount(col("text"), m))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode plan shuffles:\n$plan")
  }

  test("tokenIds: dense deterministic ids, roundtrip through vocab, stable under save/load") {
    val corpus = Seq.tabulate(50)(i => s"pack the sequence budget tokens tight $i").toDF("text")
    val m = Bpe.train(corpus, "text", numMerges = 30)
    val v = Bpe.vocab(m)
    // base symbols then merge outputs, ids dense in [0, 37 + merges)
    assert(v.length === 37 + m.merges.length)
    assert(v(0) === "a" && v(36) === "</w>")
    val docs = Seq((1L, "pack the budget"), (2L, "")).toDF("doc_id", "text")
    val ids = docs.select(col("doc_id"), Bpe.tokenIds(col("text"), m).as("ids"))
      .orderBy("doc_id").collect().map(_.getSeq[Int](1))
    // ids decode back to exactly the token strings the kernel emits
    val toks = docs.select(col("doc_id"), Bpe.tokens(col("text"), m).as("t"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1))
    assert(ids(0).map(v(_)) === toks(0))
    assert(ids(1).isEmpty)
    // stable across persistence
    val dir = java.nio.file.Files.createTempDirectory("bpeid").toString
    Bpe.save(spark, m, s"$dir/model")
    val ids2 = docs.select(col("doc_id"),
        Bpe.tokenIds(col("text"), Bpe.load(spark, s"$dir/model")).as("ids"))
      .orderBy("doc_id").collect().map(_.getSeq[Int](1))
    assert(ids2(0) === ids(0))
  }

  test("tokenIds kernel path ≡ the map-literal route it replaced") {
    val corpus = Seq.tabulate(60)(i => s"the quick brown fox $i jumps over lazy dogs").toDF("text")
    val m = Bpe.train(corpus, "text", numMerges = 25)
    val docs = Seq((1L, "the quick fox"), (2L, ""), (3L, "unseen zebra 42"))
      .toDF("doc_id", "text")
    val both = docs.select(col("doc_id"),
        Bpe.tokenIds(col("text"), m).as("kernel"),
        Bpe.tokenIdsMapLiteral(col("text"), m).as("literal"))
      .orderBy("doc_id").collect()
    both.foreach(r => assert(r.getSeq[Int](1) === r.getSeq[Int](2), s"doc ${r.getLong(0)}"))
  }

  test("minCount floor stops merge learning; maxTypes caps the dictionary") {
    // every pair occurs once -> nothing reaches minCount=2
    val m = Bpe.learnMerges(Array(("abc", 1L)), numMerges = 10, minCount = 2)
    assert(m.isEmpty)
    // maxTypes=1 keeps only the most frequent type
    val corpus = Seq.tabulate(20)(i => if (i < 15) "aaaa" else "bbbb").toDF("text")
    val model = Bpe.train(corpus, "text", numMerges = 5, maxTypes = 1)
    assert(model.merges.forall { case (l, r) => !l.contains("b") && !r.contains("b") })
  }
}
