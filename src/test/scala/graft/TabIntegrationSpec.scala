package graft

import graft.operators.Filters.Criterion
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end facade workflow in the shape of the reference's tutorial
  * (tests/test_new_tutorial.py): import a CSV, filter into pass/fail,
  * join against a dimension, group, sort, slice, export, reload.
  */
class TabIntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("tutorial workflow: csv -> filter -> join -> groupby -> sort -> export -> reload") {
    val dir = Files.createTempDirectory("tabflow").toString

    // 1. typed import
    val csv = dir + "/sales.csv"
    Files.writeString(java.nio.file.Paths.get(csv),
      """order_id,region_id,amount,when
        |1,0,100.5,2024-01-01
        |2,1,50.25,2024-01-02
        |3,0,999.99,2024-01-03
        |4,2,12.00,2024-01-04
        |5,1,500.00,2024-01-05
        |""".stripMargin)
    val sales = Tab.fromFile(spark, csv)
    assert(sales.types("order_id") === "bigint")
    assert(sales.types("amount") === "double")
    assert(sales.types("when") === "date")

    // 2. pass/fail filter
    val (big, small) = sales.filter(Seq(Criterion.cv("amount", ">", 100.0)))
    assert(big.rows === 3 && small.rows === 2)

    // 3. join a dimension (null-safe, name-dedup machinery underneath)
    val regions = Tab(Seq((0, "NORTH"), (1, "SOUTH")).toDF("region_id", "region"))
    val joined = big.join(regions, Seq("region_id"), Seq("region_id"), "left")
    assert(joined.columns.contains("region"))

    // 4. groupby + sort + slice
    val byRegion = joined
      .groupby(Seq("region"), Seq("amount" -> "Sum", "amount" -> "Count"))
      .sorted(Seq("Sum(amount)" -> true))
    val top = byRegion.slice(Seq("Sum(amount)"), 0, 1)
    assert(top.rows === 1)

    // 5. export + reload round trip
    val out = dir + "/by_region.parquet"
    byRegion.save(out)
    val back = Tab.load(spark, out)
    assert(back === byRegion)

    // 6. text exports exist and carry content
    assert(byRegion.toSqlText("by_region").contains("INSERT INTO by_region"))
    assert(byRegion.toJsonText.contains("total_rows"))

    // 7. nbytes: plan-stats size estimate is positive and grows with data
    assert(byRegion.nbytes > 0)
  }

  test("pipeline bridges: normalize, quality score, span dedup through Tab") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val t = Tab(Seq(
      (1L, s"the quick brown fox ran home\r $shared"),
      (2L, s"prefix $shared suffix")).toDF("doc_id", "text"))
    val normalized = t.normalizeText("text")
    assert(!normalized.df.collect().exists(_.getString(1).contains("\r")))
    val scored = t.qualityScore("text", Array(0.5, 0, 0, 0, 0, 0))
    assert(scored.columns.contains("quality"))
    val deduped = normalized.dedupSpans("doc_id", "text")
    val rows = deduped.df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(2L) === "prefix suffix")
  }

  test("corpus-mixing bridges: cap, exact sample, mix resample, chunk, gopher gate") {
    import spark.implicits._
    val t = Tab((0L until 300L).map { i =>
      val lang = if (i % 3 == 0) "en" else "de"
      (i, lang, s"src${i % 5}",
        (1 to 18).map(j => s"the w$j of docnum$i and").mkString(" ")) // 90 words
    }.toDF("doc_id", "lang", "source", "text"))
    val capped = t.capPerGroup("source", Seq($"doc_id".asc), n = 7)
    assert(capped.df.count() === 35) // 5 sources x 7
    assert(t.exactSample("doc_id", 40).df.count() === 40)
    val mixed = t.resampleToMix("lang", "doc_id", Map("en" -> 0.5, "de" -> 0.5), n = 60)
    val mix = mixed.df.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(mix.values.sum === 60 && mix.keySet === Set("en", "de"))
    val chunks = t.chunkByTokens("doc_id", "text", maxTokens = 30, stride = 30)
    assert(chunks.columns === Seq("doc_id", "lang", "source", "chunk_id", "chunk_text", "n_tokens"))
    assert(chunks.df.count() === 900L) // 90 tokens -> 1+ceil(60/30) = 3 chunks each
    val gated = t.gopherFilter("text", minWords = 50)
    assert(gated.df.count() === 300) // every doc has "the"/"and"/"of", 80 words
    assert(t.gopherFilter("text", minWords = 100).df.count() === 0)
  }

  test("DSIR + packing bridges: resampleLikeTarget pulls the styled half, packSequences bins") {
    import spark.implicits._
    val t = Tab((0L until 200L).map { i =>
      (i, if (i % 2 == 0) s"history science theory culture article ref$i citation source"
          else s"click buy now deal$i offer free shipping cart checkout")
    }.toDF("doc_id", "text"))
    val target = Tab(Seq.fill(30)(
      "history science theory culture article citation source chapter").toDF("text"))
    val picked = t.resampleLikeTarget("doc_id", "text", target, "text", n = 60)
      .df.select("doc_id").as[Long].collect()
    assert(picked.length === 60)
    assert(picked.count(_ % 2 == 0) >= 54, s"pull too weak: ${picked.count(_ % 2 == 0)}/60")
    val packed = Tab((0L until 50L).map(i => (i, i % 9 + 1)).toDF("id", "n_tokens"))
      .packSequences("n_tokens", "id", budget = 40)
    assert(packed.columns.contains("bin"))
    assert(packed.df.select("bin").distinct().count() > 1)
  }

  test("Tab dedup bridges preserve non-text columns (frame contract)") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val t = Tab(Seq(
      (1L, "en", 10, s"alpha $shared"),
      (2L, "fr", 20, s"beta $shared gamma"))
      .toDF("doc_id", "lang", "score", "text"))
    val spans = t.dedupSpans("doc_id", "text")
    // every original column survives, removed_tokens appended
    assert(spans.columns === Seq("doc_id", "lang", "score", "text", "removed_tokens"))
    val byId = spans.df.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(2L).getString(1) === "fr" && byId(2L).getInt(2) === 20)
    assert(byId(2L).getAs[String]("text") === "beta gamma")

    val lineDoc = Tab(Seq(
      (1L, "en", "keep me\nshared line"),
      (2L, "fr", "shared line\nunique two"),
      (3L, "de", "shared line")) // only boilerplate → doc disappears
      .toDF("doc_id", "lang", "text"))
    val lines = lineDoc.dedupLines("doc_id", "text", maxDocFreq = 1)
    assert(lines.columns === Seq("doc_id", "lang", "text"))
    val lm = lines.df.collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(lm(1L) === ("en", "keep me"))
    assert(lm(2L) === ("fr", "unique two"))
    assert(!lm.contains(3L))
  }

  test("Tab perplexity bridges: filter keeps in-domain rows, bands label them") {
    import spark.implicits._
    val ref = Tab(Seq.tabulate(40)(i =>
      s"the quick brown fox jumps over the lazy dog ${i % 3}").toDF("text"))
    val docs = Tab(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "vortex kazoo discombobulated almanac zither plinth"))
      .toDF("doc_id", "text"))
    val clean = docs.filterByPerplexity("doc_id", "text", ref, "text", maxPpl = 1e4)
    assert(clean.df.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(1L))
    val bands = docs.perplexityBands("doc_id", "text", ref, "text")
    assert(bands.columns.contains("band") && bands.df.count() === 2)
  }

  test("Tab.toJsonl writes what fromFile reads back (distributed path)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tab_jsonl").toString
    try {
      val t = Tab(Seq((1L, "a"), (2L, "b")).toDF("n", "s"))
      t.toJsonl(s"$dir/t.jsonl")
      val back = Tab.fromFile(spark, s"$dir/t.jsonl")
      assert(back.df.orderBy("n").collect().map(_.getString(1)).toSeq === Seq("a", "b"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("round-10 Tab bridges: scaling, encoding, checks, shards, resample, histogram") {
    import spark.implicits._
    val docs = Tab(Seq(
      (1L, "en", 10L), (2L, "en", 30L), (3L, "de", 20L), (4L, "de", 40L))
      .toDF("doc_id", "lang", "n_chars"))
    // scaling + encodings compose through Tab
    val scaled = docs.normalizeMinMax("n_chars", Seq("lang"))
      .normalizeZscore("n_chars", Seq("lang"))
      .targetEncode("lang", "n_chars", smoothing = 0.0)
      .oneHot("lang")
    assert(scaled.columns.toSeq.containsSlice(Seq("scaled", "zscore", "target_enc")))
    assert(scaled.df.filter(col("lang") === "en").select("target_enc")
      .as[Double].collect().forall(_ == 20.0)) // smoothing 0 = plain group mean
    // checks gate
    val rep = docs.checks(Seq(graft.operators.Checks.Unique(Seq("doc_id")),
      graft.operators.Checks.NotNull("lang")))
    assert(rep.df.select("pass").as[Boolean].collect().forall(identity))
    // shards + weighted per-group sample
    assert(docs.shardDeterministic("doc_id", 2).df
      .select("shard").distinct().count() === 2)
    assert(docs.exactSamplePerGroup("lang", "doc_id", 1, "n_chars").df.count() === 2)
    // binned histogram counts every row once
    assert(docs.binnedHistogram("n_chars", 0, 50, 5).df
      .agg(sum("count")).as[Long].collect().head === 4L)
    // sentence chunks + upsert + edit pairs + containment dedup round out
    val txt = Tab(Seq((1L, "One. Two. Three."), (2L, "Solo")).toDF("id", "text"))
    assert(txt.chunkBySentences("id", "text", 2, 2).df.count() === 3) // 2 + 1
    val upd = Tab(Seq((2L, "Solo v2")).toDF("id", "text"))
    assert(Tab(txt.df.withColumn("v", lit(0L)))
      .upsert(Tab(upd.df.withColumn("v", lit(1L))), Seq("id"), "v")
      .df.filter(col("id") === 2L).select("text").as[String].collect() === Array("Solo v2"))
    val ev = Tab(Seq(("a", new java.sql.Timestamp(0L), 1.0),
      ("a", new java.sql.Timestamp(7200000L), 2.0)).toDF("g", "ts", "v"))
    assert(ev.resampleTimeSeries("ts", "g", 3600000L, "v").df.count() === 3) // gap filled
  }
}
