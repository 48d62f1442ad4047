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

  test("intervalJoin guards: non-numeric bounds and the reserved band column rejected") {
    val ok = Seq((1L, 0.0, 5.0)).toDF("id", "lo", "hi")
    val str = Seq((1L, "a", "b")).toDF("id", "lo", "hi")
    val e1 = intercept[IllegalArgumentException](
      Joins.intervalJoin(ok, str, "lo", "hi", "lo", "hi", bandWidth = 2L))
    assert(e1.getMessage.contains("numeric"), e1.getMessage)
    val band = ok.withColumn("__band", lit(1))
    val e2 = intercept[IllegalArgumentException](
      Joins.intervalJoin(band, ok, "lo", "hi", "lo", "hi", bandWidth = 2L))
    assert(e2.getMessage.contains("__band"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      Joins.intervalJoin(ok, ok, "lo", "hi", "lo", "hi", bandWidth = 0L))
    assert(e3.getMessage.contains("bandWidth"), e3.getMessage)
  }

  test("capTokensPerGroup and KMV guards fail loudly on bad arguments") {
    val docs = Seq((1L, "en", 10L)).toDF("id", "lang", "n")
    val e1 = intercept[IllegalArgumentException](
      Sampling.capTokensPerGroup(docs, "lang", "n", "id", budget = 0L))
    assert(e1.getMessage.contains("budget"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      graft.ml.Dedup.kmvSketch(docs.select(col("id"),
        lit("x").as("text")), "text", shingleN = 0))
    assert(e2.getMessage.contains("shingleN"), e2.getMessage)
    // an empty corpus yields an empty sketch; similarity to it is loud,
    // never a silent 0/NaN
    val empty = graft.ml.Dedup.kmvSketch(
      docs.filter(col("id") < 0).select(lit("x").as("text")), "text")
    assert(empty.values.isEmpty)
    val full = graft.ml.Dedup.kmvSketch(docs.select(lit("some words here").as("text")), "text", 1)
    val e3 = intercept[IllegalArgumentException](graft.ml.Dedup.kmvJaccard(empty, full))
    assert(e3.getMessage.contains("empty"), e3.getMessage)
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

  test("round-10 ops degrade gracefully on empty input, never throw") {
    import spark.implicits._
    val emptyDocs = Seq.empty[(Long, String)].toDF("id", "s")
    assert(graft.ml.Dedup.editDistancePairs(emptyDocs, "id", "s").count() === 0)
    assert(graft.ml.Dedup.containmentDedup(emptyDocs, "id", "s").count() === 0)
    assert(Chunking.chunkBySentences(emptyDocs, "id", "s", 3, 2).count() === 0)
    val emptyKv = Seq.empty[(Long, String, Long)].toDF("k", "v", "ver")
    // empty updates: base unchanged; empty base: updates pass through
    val base = Seq((1L, "a", 1L)).toDF("k", "v", "ver")
    assert(SetOps.upsert(base, emptyKv, Seq("k"), "ver").count() === 1)
    assert(SetOps.upsert(emptyKv, base, Seq("k"), "ver").count() === 1)
    val emptyNum = Seq.empty[(String, java.lang.Double)].toDF("g", "x")
    // binned histogram still emits the full zero-count spine
    assert(GroupBy.binnedHistogram(emptyNum, "x", 0, 10, 5).count() === 5)
    assert(GroupBy.groupQuantiles(emptyNum, Seq("g"), "x", Seq(0.5)).count() === 0)
    assert(Normalize.minMax(emptyNum, "x", Seq("g")).count() === 0)
    assert(Normalize.targetEncode(emptyNum, "g", "x").count() === 0)
    assert(Normalize.oneHot(emptyNum, "g").columns.toSeq === Seq("g", "x"))
    assert(Sampling.shardDeterministic(emptyDocs, "id", 4).count() === 0)
    assert(Sampling.exactSamplePerGroup(emptyNum, "g", "x", 3, "x").count() === 0)
    val emptyTs = Seq.empty[(String, java.sql.Timestamp, Double)].toDF("g", "ts", "v")
    assert(TimeSeries.resample(emptyTs, "ts", "g", 1000L, "v").count() === 0)
    val rep = Checks.report(emptyNum, Seq(Checks.NotNull("g"), Checks.Unique(Seq("g"))))
      .select("violations", "pass").as[(Long, Boolean)].collect()
    assert(rep.forall(r => r._1 == 0L && r._2)) // an empty frame passes contracts
  }

  test("round-11 ops degrade gracefully on empty/null input, never throw") {
    import spark.implicits._
    val emptyDocs = Seq.empty[(Long, String)].toDF("id", "s")
    val emptyPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val someDocs = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    // canonical selection: empty pairs → everything survives; empty docs → empty
    assert(graft.ml.Dedup.canonicalPerCluster(
      someDocs.withColumn("sc", lit(1.0)), "id", "sc", emptyPairs).count() === 2)
    assert(graft.ml.Dedup.canonicalPerCluster(
      emptyDocs.withColumn("sc", lit(1.0)), "id", "sc",
      Seq((1L, 2L)).toDF("id_a", "id_b")).count() === 0)
    // corpus report: empty input → zero group rows
    assert(graft.functions.TextFunctions.corpusReport(
      emptyDocs.withColumnRenamed("id", "src"), Seq("src"), "s").count() === 0)
    // columnRemoveAll on empty and on all-null columns
    assert(operators.Filters.columnRemoveAll(emptyDocs, "s", Seq("x")).count() === 0)
    val nulls = Seq[Option[String]](None, None).toDF("s")
    assert(operators.Filters.columnRemoveAll(nulls, "s", Seq(null)).count() === 0)
    // firstSeenOrder groupby over empty input → empty, no error
    assert(GroupBy.groupby(emptyDocs.withColumn("ord", lit(1L)), Seq("s"),
      Seq("id" -> "Sum"), orderCol = "ord", firstSeenOrder = true).count() === 0)
    // SCD-2 from an empty event log → empty history; apply(empty, empty) works
    val emptyEv = Seq.empty[(Long, Long, java.sql.Timestamp)].toDF("k", "eid", "ts")
    val h = SetOps.scd2FromEvents(emptyEv, Seq("k"), "ts", "eid")
    assert(h.count() === 0)
    assert(SetOps.scd2Apply(h, emptyEv, Seq("k"), "ts", "eid").count() === 0)
    // stripHtml / urlHost: null in, null out
    val nr = Seq[Option[String]](None).toDF("t")
      .select(graft.functions.TextFunctions.stripHtml($"t").as("a"),
        graft.functions.TextFunctions.urlHost($"t").as("b")).first()
    assert(nr.isNullAt(0) && nr.isNullAt(1))
    // clusterSizes on an empty clustered frame still emits the spine
    val emptyClustered = Seq.empty[(Long, Int)].toDF("id", "cluster")
    val sizes = graft.ml.Ann.clusterSizes(emptyClustered, 3)
    assert(sizes.count() === 3)
    assert(sizes.agg(sum($"n")).first().getLong(0) === 0L)
  }

  test("round-12 ops degrade gracefully on empty/degenerate input, never throw") {
    import spark.implicits._
    val emptyDocs = Seq.empty[(Long, String)].toDF("id", "s")
    val tmp = java.nio.file.Files.createTempDirectory("r12rob").toString
    // empty frames through every new writer→reader pair
    graft.sources.Xls.writeXls(emptyDocs, s"$tmp/e.xls")
    assert(graft.sources.Xls.readXls(spark, s"$tmp/e.xls", guessDatatypes = false)
      .count() === 0)
    graft.sources.Ods.writeFods(emptyDocs, s"$tmp/e.fods")
    assert(graft.sources.Ods.readFods(spark, s"$tmp/e.fods", guessDatatypes = false)
      .count() === 0)
    graft.sources.Writers.writeHtml(emptyDocs, s"$tmp/e.html")
    assert(graft.sources.Readers.readHtml(spark, s"$tmp/e.html", skipDataRows = 1,
      guessDatatypes = false).count() === 0)
    // text-table renderers/readers on empty frames keep the header row
    Seq(".simple" -> graft.sources.TextTables.renderSimple(emptyDocs),
        ".rst" -> graft.sources.TextTables.renderRst(emptyDocs),
        ".mediawiki" -> graft.sources.TextTables.renderMediawiki(emptyDocs))
      .foreach { case (suffix, content) =>
        val p = s"$tmp/e$suffix"
        java.nio.file.Files.write(java.nio.file.Paths.get(p), content.getBytes("UTF-8"))
        val back = Tab.fromFile(spark, p).df
        assert(back.columns.toSeq === Seq("id", "s"), suffix)
        assert(back.count() === 0, suffix)
      }
    // ImageIoCodec: zero-byte payload is "undecodable", not a crash
    val codec = new graft.ml.Multimodal.ImageIoCodec()
    assert(codec.decode("image", Array.emptyByteArray).length === 8)
    intercept[IllegalArgumentException] {
      new graft.ml.Multimodal.ImageIoCodec(strict = true)
        .decode("image", Array.emptyByteArray)
    }
    // 1×1 image: downscale spine still fills every grid cell
    val px = graft.ml.Multimodal.ImageIoCodec.grayPng(1, 1, _ => 77)
    assert(codec.decodeGray("image", px, 8, 8).toSeq === Seq.fill(64)(77.0))
    // bracket-escape tokenizer: empty line, delimiter-only, all-bracket
    assert(graft.sources.Readers.splitBracketEscaped("", ',', '"', "(", ")").toSeq
      === Seq(""))
    assert(graft.sources.Readers.splitBracketEscaped(",,", ',', '"', "(", ")").length === 3)
    assert(graft.sources.Readers.splitBracketEscaped("((((", ',', '"', "(", ")").toSeq
      === Seq("(((("))
    // scd2Apply with EMPTY updates leaves history byte-identical (the
    // late-key machinery must not disturb the no-op path)
    val ev = Seq((1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("k", "eid", "ts")
    val h = SetOps.scd2FromEvents(ev, Seq("k"), "ts", "eid")
    val emptyEv = Seq.empty[(Long, Long, java.sql.Timestamp)].toDF("k", "eid", "ts")
    assert(SetOps.scd2Apply(h, emptyEv, Seq("k"), "ts", "eid").collect().map(_.toSeq).toSet
      === h.collect().map(_.toSeq).toSet)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }
}
