package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization: grid exactness, distance fidelity, recall,
  * the exact-rerank equality, persistence with the stale-sidecar rule,
  * and the scale plan.
  */
class AnnSqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/idx"
  }

  test("trainSq: exact per-dim bounds, deterministic, degenerate dims get step 0") {
    val vecs = Seq(
      (1L, Array(0.0, 5.0, 7.0)),
      (2L, Array(10.0, 5.0, -3.0)),
      (3L, Array(4.0, 5.0, 2.0))).toDF("vec_id", "embedding")
    val p = Ann.trainSq(vecs, "embedding")
    assert(p.lo.toSeq === Seq(0.0, 5.0, -3.0))
    assert(p.step(0) === 10.0 / 255.0)
    assert(p.step(1) === 0.0) // constant dim
    assert(p.step(2) === 10.0 / 255.0)
    val p2 = Ann.trainSq(vecs.repartition(5), "embedding")
    assert(p2.lo.toSeq === p.lo.toSeq && p2.step.toSeq === p.step.toSeq)
  }

  test("SQ distances track exact L2 within the quantization error bound") {
    val p = Ann.trainSq(emb, "embedding")
    val idx = Ann.buildSqIndex(emb, "vec_id", "embedding", p)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val joined = idx.join(broadcast(q), col("query_id") =!= col("neighbour_id"))
      .join(emb.select(col("vec_id").as("neighbour_id"), col("embedding").as("cv")),
        Seq("neighbour_id"))
      .select(
        graft.plans.Kernels.sqAdcDist(col("qv"), col("code"), p.lo, p.step).as("adc"),
        graft.plans.Kernels.l2Dist(col("qv"), col("cv")).as("l2"))
    // per-dim worst error step/2 → squared-distance error bound:
    // |adc − l2| ≤ Σ_i (step_i · (|q_i−c_i| + step_i/4)) — use the loose
    // but safe bound via max step and observed distances
    val rows = joined.collect()
    val maxStep = p.step.max
    rows.foreach { r =>
      val (adc, l2) = (r.getDouble(0), r.getDouble(1))
      val bound = maxStep * p.dim * (math.sqrt(l2) + maxStep) + 1e-9
      assert(math.abs(adc - l2) <= bound,
        s"adc $adc vs l2 $l2 exceeds bound $bound")
    }
  }

  test("full-scan SQ8 recall@10 >= 0.9 (8-bit fidelity barely misses)") {
    val q = emb.filter(col("vec_id") < 20)
    val r = Ann.sqRecallAtK(emb, q, "vec_id", "embedding", k = 10)
      .select("recall").first().getDouble(0)
    assert(r >= 0.9, s"SQ8 full-scan recall $r < 0.9")
  }

  test("SQ + exact rerank equals exact L2 top-k (the oracle shape)") {
    val p = Ann.trainSq(emb, "embedding")
    val idx = Ann.buildSqIndex(emb, "vec_id", "embedding", p)
    val q = emb.filter(col("vec_id") < 10)
    val got = Ann.sqKnnRerank(idx, q, emb, "vec_id", "embedding", p,
      k = 5, rerank = 50)
      .select("query_id", "neighbour_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    val exact = Ann.exactL2Knn(emb, q, "vec_id", "embedding", k = 5)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy("neighbour_id")
    // exactL2Knn returns the set; reconstruct ranks via the same path
    val expect = Ann.sqKnnRerank(idx, q, emb, "vec_id", "embedding", p,
      k = 5, rerank = emb.count().toInt) // full pool = exact by construction
      .select("query_id", "neighbour_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(got.toSeq === expect.toSeq)
    assert(got.map(t => (t._1, t._2)).toSet ===
      exact.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("persistence: self-contained roundtrip; rewrite without params deletes the stale grid") {
    val p = Ann.trainSq(emb, "embedding")
    val idx = Ann.buildSqIndex(emb, "vec_id", "embedding", p)
    val dir = tmpDir("sqidx")
    Ann.writeSqIndex(idx, dir, p)
    val p2 = Ann.readSqParams(spark, dir)
    assert(p2.lo.toSeq === p.lo.toSeq && p2.step.toSeq === p.step.toSeq)
    val back = spark.read.parquet(dir)
    assert(back.count() === emb.count())
    // rewrite WITHOUT the grid → the stale sidecar must go
    Ann.writeSqIndex(idx, dir)
    val e = intercept[IllegalArgumentException](Ann.readSqParams(spark, dir))
    assert(e.getMessage.contains("_sqparams"), e.getMessage)
  }

  test("IVFSQ: full probe equals full-scan SQ; partial probe keeps most of the recall") {
    val p = Ann.trainSq(emb, "embedding")
    val centroids = Ann.trainCentroids(emb, "embedding", nList = 16)
    val idx = Ann.buildIvfSqIndex(emb, "vec_id", "embedding", centroids, p)
    val q = emb.filter(col("vec_id") < 10)
    // nProbe = nList scans everything → identical to the flat SQ scan
    val full = Ann.ivfSqKnn(idx, q, "vec_id", "embedding", centroids, p,
      k = 10, nProbe = 16)
      .select("query_id", "neighbour_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    val flat = Ann.sqKnn(Ann.buildSqIndex(emb, "vec_id", "embedding", p),
      q, "vec_id", "embedding", p, k = 10)
      .select("query_id", "neighbour_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(full.toSeq === flat.toSeq)
    // partial probe: recall against exact L2 well above the scan
    // fraction (4/16 = 25% of lists)
    val r = Ann.ivfSqRecallAtK(emb, q, "vec_id", "embedding",
      k = 10, nList = 16, nProbe = 4)
      .select("recall").first().getDouble(0)
    assert(r >= 0.3, s"IVFSQ recall $r at 25% probe")
  }

  test("appendToSqIndex: new batch encoded with the STORED grid, searchable after append") {
    val p = Ann.trainSq(emb, "embedding")
    val dir = tmpDir("sqappend")
    Ann.writeSqIndex(Ann.buildSqIndex(emb, "vec_id", "embedding", p), dir, p)
    // append a copy of corpus vector 3 under a fresh id
    val v3 = emb.filter(col("vec_id") === 3).collect()(0).getSeq[Float](1).toArray
    Ann.appendToSqIndex(spark, dir,
      Seq((99999L, v3)).toDF("vec_id", "embedding"), "vec_id", "embedding")
    val idx = spark.read.parquet(dir)
    assert(idx.count() === emb.count() + 1)
    // identical query: both vec 3 and the appended twin land in the
    // top-2 at (quantized) distance ~0
    val top2 = Ann.sqKnn(idx, Seq((1L, v3)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", Ann.readSqParams(spark, dir), k = 2)
      .select("neighbour_id").collect().map(_.getLong(0)).toSet
    assert(top2 === Set(3L, 99999L), top2)
  }

  test("IVFSQ + exact rerank at full probe equals exact L2 top-k") {
    val p = Ann.trainSq(emb, "embedding")
    val centroids = Ann.trainCentroids(emb, "embedding", nList = 8)
    val idx = Ann.buildIvfSqIndex(emb, "vec_id", "embedding", centroids, p)
    val q = emb.filter(col("vec_id") < 8)
    val got = Ann.ivfSqKnnRerank(idx, q, emb, "vec_id", "embedding",
      centroids, p, k = 5, nProbe = 8, rerank = 60)
      .select("query_id", "neighbour_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Ann.exactL2Knn(emb, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === exact)
  }

  test("IVFSQ persistence: partitioned by list, both sidecars roundtrip, search works cold") {
    val p = Ann.trainSq(emb, "embedding")
    val centroids = Ann.trainCentroids(emb, "embedding", nList = 8)
    val idx = Ann.buildIvfSqIndex(emb, "vec_id", "embedding", centroids, p)
    val dir = tmpDir("ivfsq")
    Ann.writeIvfSqIndex(idx, dir, centroids, p)
    // a fresh-session read needs NOTHING but the path
    val c2 = Ann.readIvfCentroids(spark, dir)
    val p2 = Ann.readSqParams(spark, dir)
    assert(c2.length === 8 && p2.lo.toSeq === p.lo.toSeq)
    val q = emb.filter(col("vec_id") < 5)
    val live = Ann.ivfSqKnn(idx, q, "vec_id", "embedding", centroids, p,
      k = 5, nProbe = 8).select("query_id", "neighbour_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    val cold = Ann.ivfSqKnn(Ann.readIvfIndex(spark, dir), q, "vec_id", "embedding",
      c2, p2, k = 5, nProbe = 8).select("query_id", "neighbour_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(cold.toSeq === live.toSeq)
    // the on-disk layout is list-partitioned (probe prunes files)
    val sub = new java.io.File(dir).listFiles().map(_.getName)
    assert(sub.exists(_.startsWith("list=")), sub.toSeq)
  }

  test("appendToIvfSqIndex: stored quantizer assigns, stored grid encodes, cold search finds the batch") {
    val p = Ann.trainSq(emb, "embedding")
    val centroids = Ann.trainCentroids(emb, "embedding", nList = 8)
    val dir = tmpDir("ivfsqappend")
    Ann.writeIvfSqIndex(
      Ann.buildIvfSqIndex(emb, "vec_id", "embedding", centroids, p), dir, centroids, p)
    val batch = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 90000L).as("vec_id"), col("embedding"))
    Ann.appendToIvfSqIndex(spark, dir, batch, "vec_id", "embedding")
    // cold read needs nothing but the path
    val idx = Ann.readIvfIndex(spark, dir)
    val c2 = Ann.readIvfCentroids(spark, dir)
    val p2 = Ann.readSqParams(spark, dir)
    assert(idx.count() === emb.count() + 5)
    // appended rows' list assignment AND codes ≡ a fresh build under the
    // STORED artifacts (the silent failure this API exists to prevent is
    // assignment/encoding under re-trained artifacts)
    val expect = Ann.buildIvfSqIndex(batch, "vec_id", "embedding", c2, p2)
      .collect().map(r => (r.getLong(0),
        (r.get(1).toString, r.getAs[Array[Byte]](2).toSeq))).toMap
    val got = idx.filter(col("neighbour_id") >= 90000L)
      .collect().map(r => (r.getAs[Long]("neighbour_id"),
        (r.getAs[Any]("list").toString, r.getAs[Array[Byte]]("code").toSeq))).toMap
    assert(got === expect)
    // full-probe cold search: each planted identical copy ranks 1 (the
    // query's own corpus row is id-excluded; ADC distance to the twin is
    // the bare quantization error, unbeatable by any distinct vector)
    val top1 = Ann.ivfSqKnn(idx, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", c2, p2, k = 1, nProbe = 8)
      .select("query_id", "neighbour_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(top1 === (0L until 5L).map(q => (q, q + 90000L)).toSet, top1)
  }

  test("appendToSqIndex refuses a list-partitioned IVFSQ layout (would append flat)") {
    val p = Ann.trainSq(emb, "embedding")
    val centroids = Ann.trainCentroids(emb, "embedding", nList = 8)
    val dir = tmpDir("ivfsqrefuse")
    Ann.writeIvfSqIndex(
      Ann.buildIvfSqIndex(emb, "vec_id", "embedding", centroids, p), dir, centroids, p)
    val batch = emb.filter(col("vec_id") < 2)
      .select((col("vec_id") + 90000L).as("vec_id"), col("embedding"))
    val e = intercept[IllegalArgumentException](
      Ann.appendToSqIndex(spark, dir, batch, "vec_id", "embedding"))
    assert(e.getMessage.contains("_centroids") &&
      e.getMessage.contains("appendToIvfSqIndex"), e.getMessage)
  }

  test("scale shape: encode is map-side (no shuffle); codes are dim bytes") {
    val p = Ann.trainSq(emb, "embedding")
    val idx = Ann.buildSqIndex(emb, "vec_id", "embedding", p)
    val plan = idx.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode plan shuffles:\n$plan")
    val code = idx.select("code").first().getAs[Array[Byte]](0)
    assert(code.length === p.dim)
  }
}
