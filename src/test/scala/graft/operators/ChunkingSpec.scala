package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  test("chunkByTokens: disjoint stride reconstructs the document exactly") {
    val df = Seq((1L, doc(100)), (2L, doc(40)), (3L, doc(41)), (4L, "")).toDF("id", "text")
    val out = Chunking.chunkByTokens(df, "id", "text", maxTokens = 40, stride = 40)
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    // 100 -> 3 chunks (40/40/20), 40 -> 1, 41 -> 2 (40/1), "" -> 1 empty chunk
    assert(out.map(_._1).toSeq === Seq(1L, 1L, 1L, 2L, 3L, 3L, 4L))
    assert(out.filter(_._1 == 1L).map(_._4).toSeq === Seq(40L, 40L, 20L))
    assert(out.filter(_._1 == 3L).map(_._4).toSeq === Seq(40L, 1L))
    // concatenating disjoint chunks gives back the original text
    val rebuilt = out.filter(_._1 == 1L).map(_._3).mkString(" ")
    assert(rebuilt === doc(100))
    assert(out.find(_._1 == 4L).get._3 === "")
  }

  test("chunkByTokens: overlapping windows carry the stride overlap") {
    val df = Seq((1L, doc(100))).toDF("id", "text")
    val out = Chunking.chunkByTokens(df, "id", "text", maxTokens = 40, stride = 30)
      .as[(Long, Long, String, Long)].collect().sortBy(_._2)
    // 1 + ceil(60/30) = 3 chunks; starts at tokens 1, 31, 61
    assert(out.length === 3)
    assert(out.map(_._4).toSeq === Seq(40L, 40L, 40L))
    val c0 = out(0)._3.split(' '); val c1 = out(1)._3.split(' ')
    assert(c0.drop(30).toSeq === c1.take(10).toSeq) // 10-token overlap
    assert(c1.head === "w31")
    // every original token appears in some chunk
    val all = out.flatMap(_._3.split(' ')).toSet
    assert(all === (1 to 100).map(i => s"w$i").toSet)
  }

  test("chunkByTokens: null text yields one empty chunk (row never vanishes)") {
    val df = Seq((1L, Option(doc(5))), (2L, None: Option[String])).toDF("id", "text")
    val out = Chunking.chunkByTokens(df, "id", "text", 40, 40)
      .as[(Long, Long, String, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1L, 2L))
    assert(out(1)._3 === "" && out(1)._4 === 1L)
  }

  test("chunkByTokens plans as a narrow generate stage — no shuffle") {
    val df = Seq((1L, doc(100))).toDF("id", "text")
    val p = Chunking.chunkByTokens(df, "id", "text", 40, 30)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(p.contains("Generate"), p)
  }

  test("chunkBySentences: whole sentences only, windows overlap by stride") {
    val text = "One two. Three four! Five? Six seven. Eight... Nine"
    // sentences: "One two.", "Three four!", "Five?", "Six seven.", "Eight...", "Nine"
    val out = Chunking.chunkBySentences(Seq((1L, text)).toDF("id", "text"),
      "id", "text", maxSentences = 3, stride = 2)
      .as[(Long, Long, String, Long)].collect().sortBy(_._2)
    assert(out.map(_._2).toSeq === Seq(0L, 1L, 2L)) // 1 + ceil((6-3)/2) = 3
    assert(out.map(_._3).toSeq === Seq(
      "One two. Three four! Five?",
      "Five? Six seven. Eight...",
      "Eight... Nine"))
    assert(out.map(_._4).toSeq === Seq(3L, 3L, 2L))
  }

  test("chunkBySentences: oversized docs window correctly; empty/null keep one row") {
    val six = (1 to 6).map(i => s"Sentence number $i.").mkString(" ")
    val df = Seq((1L, six), (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, "No terminator here")).toDF("id", "text")
    val out = Chunking.chunkBySentences(df, "id", "text", maxSentences = 5, stride = 3)
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    // 6 sentences → 1 + ceil((6-5)/3) = 2 chunks
    assert(out.filter(_._1 == 1L).map(_._4).toSeq === Seq(5L, 3L))
    assert(out.filter(_._1 == 2L) === Array((2L, 0L, "", 0L)))
    assert(out.filter(_._1 == 3L) === Array((3L, 0L, "", 0L)))
    assert(out.filter(_._1 == 4L) === Array((4L, 0L, "No terminator here", 1L)))
  }

  test("gopherFlags: each rule trips on its planted pathology") {
    val good = ((1 to 60).map(i => "the word" + i) :+ "with").mkString(" ") // 121 words, alpha, 2 stops
    val short = "the a b" // word count below min
    val longWords = (1 to 60).map(i => "w" * 20 + i).mkString(" ") + " the a" // mean len > 10
    val symbols = ((1 to 60).map(_ => "the#a#x")).mkString(" ") + " a" // symbol ratio > 0.1
    val bullets = (1 to 60).map(i => s"- the item$i a").mkString("\n") // all lines bulleted
    val ellipsis = (1 to 60).map(i => s"the thing$i a...").mkString("\n") // all lines end ...
    val numeric = ((1 to 60).map(i => s"$i $i$i")).mkString(" ") + " the a" // alpha ratio < 0.8
    val noStops = (1 to 60).map(i => s"word$i").mkString(" ") // zero stopword hits
    val df = Seq(
      (1L, good), (2L, short), (3L, longWords), (4L, symbols),
      (5L, bullets), (6L, ellipsis), (7L, numeric), (8L, noStops)
    ).toDF("id", "text")
    val out = df.select(col("id"),
        TextFunctions.gopherFlags(col("text"), minWords = 50).as("g"))
      .select(col("id"), col("g.pass"), col("g.word_count"), col("g.mean_word_len"),
        col("g.symbol_ratio"), col("g.bullet_ratio"), col("g.ellipsis_ratio"),
        col("g.alpha_ratio"), col("g.stop_hits"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) === 1L, out(1L).toString)
    assert(out.filter(_._1 != 1L).values.forall(_.getLong(1) == 0L),
      out.values.map(_.toString).mkString("\n"))
    // the specific rule that fails is the planted one
    assert(out(2L).getLong(2) < 50L)
    assert(out(3L).getDouble(3) > 10.0)
    assert(out(4L).getDouble(4) > 0.1)
    assert(out(5L).getDouble(5) > 0.9)
    assert(out(6L).getDouble(6) > 0.3)
    assert(out(7L).getDouble(7) < 0.8)
    assert(out(8L).getLong(8) === 0L)
  }

  test("gopherFlags is a single codegen'd map stage — no shuffle, no UDF") {
    val df = Seq((1L, doc(60))).toDF("id", "text")
    val p = df.select(TextFunctions.gopherFlags(col("text")))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("UDF"), p)
  }
}
