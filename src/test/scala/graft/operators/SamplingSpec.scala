package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 1000L).map(i =>
    (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr", 10 + (i % 50)))
    .toDF("id", "lang", "n_tokens")

  test("deterministicSample: reproducible, near-target fraction, seed-independent draws") {
    val s1 = Sampling.deterministicSample(docs, "id", 0.3).select("id").as[Long].collect().toSet
    val s2 = Sampling.deterministicSample(docs, "id", 0.3).select("id").as[Long].collect().toSet
    assert(s1 === s2) // bit-identical rerun
    assert(math.abs(s1.size - 300) < 60, s"got ${s1.size}")
    val other = Sampling.deterministicSample(docs, "id", 0.3, seed = 7)
      .select("id").as[Long].collect().toSet
    assert(other !== s1) // different seed, different sample
    // nested property: a 0.1 sample is a subset of the same-seed 0.3 sample
    val s01 = Sampling.deterministicSample(docs, "id", 0.1).select("id").as[Long].collect().toSet
    assert(s01.subsetOf(s1))
  }

  test("stratifiedSample honours per-stratum fractions and the default") {
    val out = Sampling.stratifiedSample(docs, "lang", "id",
      Map("en" -> 1.0, "de" -> 0.5), defaultFraction = 0.0)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") === 334L) // full stratum kept
    assert(!byLang.contains("fr")) // default 0.0 drops the stratum
    assert(math.abs(byLang("de") - 167L) < 60, s"de: ${byLang("de")}")
  }

  test("moduloSample keeps exactly the modulo classes") {
    val kept = Sampling.moduloSample(docs, "id", 10, 3).select("id").as[Long].collect()
    assert(kept.length === 300)
    assert(kept.forall(i => i % 10 < 3))
  }

  test("capPerGroup keeps exactly top-n per group in total order, with ranks") {
    val out = Sampling.capPerGroup(docs, "lang",
      Seq(col("n_tokens").desc, col("id").asc), n = 10)
      .select("lang", "id", "n_tokens", "rank")
      .as[(String, Long, Long, Long)].collect()
    assert(out.length === 30) // 3 langs x 10
    out.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.map(_._4).sorted.toSeq === (1L to 10L), lang)
      // oracle: top-10 by (n_tokens desc, id asc) recomputed locally
      val want = docs.filter(col("lang") === lang)
        .as[(Long, String, Long)].collect()
        .sortBy { case (id, _, nt) => (-nt, id) }.take(10).map(_._1).toSet
      assert(rs.map(_._2).toSet === want, lang)
    }
  }

  test("capTokensPerGroup: budget-crossing doc kept, small groups whole, deterministic") {
    val out = Sampling.capTokensPerGroup(docs, "lang", "n_tokens", "id",
      budget = 500L, seed = 3)
      .select("lang", "id", "n_tokens").as[(String, Long, Long)].collect()
    // local oracle: replay the md5 order + "tokens before < budget" rule
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"${b & 0xff}%02x").mkString
    }
    val local = docs.as[(Long, String, Long)].collect().toSeq
    val expect = local.groupBy(_._2).flatMap { case (_, rows) =>
      val ordered = rows.sortBy { case (id, _, _) => (md5hex(s"${id}_3"), id) }
      val cum = ordered.scanLeft(0L)(_ + _._3)
      ordered.zip(cum).takeWhile(_._2 < 500L).map(_._1._1).toSeq
    }.toSet
    assert(out.map(_._2).toSet === expect)
    out.groupBy(_._1).foreach { case (lang, rs) =>
      val tot = rs.map(_._3).sum
      // the crossing doc is kept → total reaches the budget (every
      // group here has plenty of tokens)
      assert(tot >= 500L, s"$lang: $tot")
    }
    // a group whose whole token mass is under budget survives intact
    val tiny = Seq((1L, "xx", 30L), (2L, "xx", 40L)).toDF("id", "lang", "n_tokens")
    assert(Sampling.capTokensPerGroup(tiny, "lang", "n_tokens", "id", 500L)
      .count() === 2L)
    // partition-invariant
    val re = Sampling.capTokensPerGroup(docs.repartition(13), "lang", "n_tokens", "id",
      budget = 500L, seed = 3).select("id").as[Long].collect().toSet
    assert(re === out.map(_._2).toSet)
  }

  test("exactSample: exactly n rows, reproducible, disjoint-ish across seeds") {
    val s1 = Sampling.exactSample(docs, "id", 100, seed = 1).select("id").as[Long].collect()
    val s2 = Sampling.exactSample(docs, "id", 100, seed = 1).select("id").as[Long].collect()
    assert(s1.length === 100)
    assert(s1.toSet === s2.toSet) // deterministic
    val s3 = Sampling.exactSample(docs, "id", 100, seed = 2).select("id").as[Long].collect()
    assert(s3.toSet !== s1.toSet) // salt changes the draw
    // md5 is uniform: each lang stratum lands near its share
    val langs = docs.filter(col("id").isin(s1.toSeq: _*)).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(langs.values.forall(c => c > 15 && c < 55), langs.toString)
  }

  test("importanceResample converges to the target mix, deterministic, exact n") {
    // 1000 docs: en 600 / de 300 / fr 100 — rebalance to uniform thirds
    val skewed = (0L until 1000L).map(i =>
      (i, if (i < 600) "en" else if (i < 900) "de" else "fr")).toDF("id", "lang")
    val target = Map("en" -> (1.0 / 3), "de" -> (1.0 / 3), "fr" -> (1.0 / 3))
    val s1 = Sampling.importanceResample(skewed, "lang", "id", target, n = 240)
    val rows = s1.select("id", "lang").as[(Long, String)].collect()
    assert(rows.length === 240)
    val mix = rows.groupBy(_._2).view.mapValues(_.size).toMap
    // each stratum near 80 of 240 despite the 6:3:1 corpus skew (the
    // fr stratum's weight is 10/3 x the en weight)
    assert(mix.values.forall(c => c > 55 && c < 105), mix.toString)
    // deterministic rerun
    val s2 = Sampling.importanceResample(skewed, "lang", "id", target, n = 240)
    assert(s2.select("id").as[Long].collect().toSet === rows.map(_._1).toSet)
    // a stratum absent from the target never appears
    val only = Sampling.importanceResample(skewed, "lang", "id",
      Map("fr" -> 1.0), n = 50)
    assert(only.select("lang").distinct().as[String].collect().toSeq === Seq("fr"))
  }

  test("temperatureMix: α=1 keeps the natural mix, α→0 flattens toward uniform") {
    // 6:3:1 skew — the importanceResample fixture with derived targets
    val skewed = (0L until 1000L).map(i =>
      (i, if (i < 600) "en" else if (i < 900) "de" else "fr")).toDF("id", "lang")
    def mixAt(alpha: Double) = Sampling.temperatureMix(skewed, "lang", "id",
      alpha, n = 300, seed = 3)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val natural = mixAt(1.0)
    // α=1: w is constant across strata → mix tracks the corpus (6:3:1)
    assert(natural("en") > 150 && natural("fr") < 60, natural.toString)
    val flat = mixAt(0.0)
    // α=0: targets uniform thirds; fr (100 docs) is up-sampled hard
    assert(flat.values.forall(c => c > 70 && c < 130), flat.toString)
    // monotone in between
    val half = mixAt(0.5)
    assert(half("fr") > natural("fr") && half("fr") < flat("fr") + 15,
      s"fr: nat ${natural("fr")} half ${half("fr")} flat ${flat("fr")}")
    // exact n + deterministic rerun
    val again = Sampling.temperatureMix(skewed, "lang", "id", 0.5, n = 300, seed = 3)
      .select("id").as[Long].collect()
    assert(again.length === 300)
    assert(Sampling.temperatureMix(skewed, "lang", "id", 0.5, n = 300, seed = 3)
      .select("id").as[Long].collect().toSet === again.toSet)
  }

  test("shuffleDeterministic: a reproducible permutation; seeds independent; scale path agrees") {
    val ranks = Sampling.shuffleDeterministic(docs, "id", seed = 1)
      .select("id", "shuffle_rank").as[(Long, Long)].collect()
    assert(ranks.map(_._2).sorted.toSeq === (0L until 1000L)) // a permutation
    val again = Sampling.shuffleDeterministic(docs, "id", seed = 1)
      .select("id", "shuffle_rank").as[(Long, Long)].collect()
    assert(again.toMap === ranks.toMap) // bit-identical rerun
    val other = Sampling.shuffleDeterministic(docs, "id", seed = 2)
      .select("id", "shuffle_rank").as[(Long, Long)].collect()
    assert(other.toMap !== ranks.toMap) // salt changes the permutation
    // above the local threshold: zipWithIndex shape, same permutation
    spark.conf.set("graft.rowIndex.localThresholdBytes", "0")
    try {
      val scaled = Sampling.shuffleDeterministic(docs.repartition(7), "id", seed = 1)
        .select("id", "shuffle_rank").as[(Long, Long)].collect()
      assert(scaled.toMap === ranks.toMap)
    } finally spark.conf.unset("graft.rowIndex.localThresholdBytes")
  }

  test("exactSamplePerGroup: n per group, weight-tilted, deterministic, null/zero weights excluded") {
    val weighted = docs.withColumn("w",
      when($"id" % 100 === 0, lit(null).cast("double"))       // excluded
        .when($"id" % 100 === 1, lit(0.0))                     // excluded
        .when($"id" < 500, lit(100.0)).otherwise(lit(0.01)))   // heavy tilt to low ids
    val out = Sampling.exactSamplePerGroup(weighted, "lang", "id", n = 20,
      weightCol = "w", seed = 4)
    val byLang = out.select("lang", "id", "rank").as[(String, Long, Long)]
      .collect().groupBy(_._1)
    assert(byLang.keySet === Set("en", "de", "fr"))
    byLang.values.foreach { rows =>
      assert(rows.length === 20)
      assert(rows.map(_._3).sorted.toSeq === (1L to 20L)) // dense in-group ranks
      assert(!rows.exists(r => r._2 % 100 == 0 || r._2 % 100 == 1))
      // the 10000x weight tilt must dominate the draw
      assert(rows.count(_._2 < 500) >= 18, rows.sortBy(_._3).mkString(","))
    }
    val again = Sampling.exactSamplePerGroup(weighted, "lang", "id", n = 20,
      weightCol = "w", seed = 4).select("lang", "id").as[(String, Long)].collect().toSet
    assert(again === byLang.values.flatten.map(r => (r._1, r._2)).toSet)
  }

  test("shardDeterministic: exactly balanced, reproducible, shard = shuffle rank % n") {
    val n = 7 // 1000 % 7 != 0 → sizes must split ceil/floor
    val shards = Sampling.shardDeterministic(docs, "id", n, seed = 1)
      .select("id", "shard").as[(Long, Long)].collect()
    val sizes = shards.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet === (0L until n.toLong).toSet)
    assert(sizes.values.max - sizes.values.min <= 1) // exactly balanced
    assert(sizes.values.sum === 1000)
    // the assignment IS the md5-shuffle rank mod n
    val ranks = Sampling.shuffleDeterministic(docs, "id", seed = 1)
      .select("id", "shuffle_rank").as[(Long, Long)].collect().toMap
    assert(shards.forall { case (id, s) => s === ranks(id) % n })
    val again = Sampling.shardDeterministic(docs, "id", n, seed = 1)
      .select("id", "shard").as[(Long, Long)].collect()
    assert(again.toMap === shards.toMap) // bit-identical rerun
  }

  test("saveShards writes one directory per shard; read-back reassembles the frame") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString + "/s"
    graft.sources.Writers.saveShards(docs, dir, "id", numShards = 4, seed = 2)
    val back = spark.read.parquet(dir)
    assert(back.select("shard").distinct().count() === 4)
    assert(back.count() === 1000)
    // every shard dir holds exactly one parquet file (training-loader shape)
    (0 until 4).foreach { sId =>
      val files = new java.io.File(s"$dir/shard=$sId")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"shard=$sId has ${files.length} files")
    }
    // read-back assignment matches the in-memory one
    val mem = Sampling.shardDeterministic(docs, "id", 4, seed = 2)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    val disk = back.select(col("id"), col("shard").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(disk === mem)
  }

  test("packSequences: bins are contiguous in order and hold ~budget tokens") {
    val packed = Sampling.packSequences(docs, "n_tokens", "id", budget = 500,
      partitionCols = Seq("lang"))
    val rows = packed.select("lang", "id", "n_tokens", "bin")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      // bin ids start at 0 and never decrease along the order column
      assert(rs.head._4 === 0L, lang)
      rs.sliding(2).foreach { case Array(a, b) =>
        assert(b._4 >= a._4 && b._4 - a._4 <= 1, s"$lang: ${a._2}->${b._2}")
      case _ => }
      // every bin except possibly the last holds >= budget - max_doc and
      // <= budget + max_doc tokens (streaming cumsum packing bound)
      val maxDoc = rs.map(_._3).max
      val sums = rs.groupBy(_._4).view.mapValues(_.map(_._3).sum).toMap
      val lastBin = rs.map(_._4).max
      sums.foreach { case (bin, s) =>
        if (bin != lastBin) assert(s >= 500 - maxDoc && s <= 500 + maxDoc, s"$lang bin $bin: $s")
      }
    }
  }

  test("materializePacked: one row per bin, members in pack order, totals add up, ids concatenate") {
    val packed = Sampling.packSequences(docs, "n_tokens", "id", budget = 500,
      partitionCols = Seq("lang"))
      .withColumn("ids", array(col("id"), col("id") * 10))
    val seqs = Sampling.materializePacked(packed,
      orderCol = "id", idCol = "id", tokenCol = "n_tokens",
      partitionCols = Seq("lang"), idsCol = "ids")
    val rows = seqs.collect()
    // every (lang, bin) of the packing appears exactly once
    val expectBins = packed.select("lang", "bin").distinct().count()
    assert(rows.length.toLong === expectBins)
    rows.foreach { r =>
      val ids = r.getSeq[Long](r.fieldIndex("doc_ids"))
      assert(ids === ids.sorted, "members not in pack order")
      assert(r.getAs[Int]("n_docs") === ids.length)
      // concatenated token ids are the per-doc arrays in the same order
      val tok = r.getSeq[Long](r.fieldIndex("token_ids"))
      assert(tok === ids.flatMap(i => Seq(i, i * 10)))
    }
    // token totals agree with the packing input
    val total = rows.map(_.getAs[Long]("n_seq_tokens")).sum
    val want = docs.agg(sum("n_tokens")).collect()(0).getLong(0)
    assert(total === want)
    // without idsCol the token_ids column is absent
    val bare = Sampling.materializePacked(packed,
      orderCol = "id", idCol = "id", tokenCol = "n_tokens", partitionCols = Seq("lang"))
    assert(!bare.columns.contains("token_ids"))
  }

  test("unkeyed packing: boundary-carry scale path equals the global window exactly") {
    // null token counts included: the window's sum ignores them, the
    // carry must treat them as 0 — identical bins either way
    val withNulls = (0L until 500L).map(i =>
      (i, if (i % 17 == 0) null.asInstanceOf[java.lang.Long]
          else java.lang.Long.valueOf(i % 97 + 1))).toDF("id", "n_tokens")
    val viaWindow = Sampling.packSequences(withNulls, "n_tokens", "id", budget = 300)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    val viaCarry = Sampling.packBoundaryCarry(
      withNulls.repartition(7), "n_tokens", "id", budget = 300)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    assert(viaCarry === viaWindow)
    assert(viaCarry.values.max > 10, "test corpus too small to span bins")
  }

  test("fractional token counts stay on the window path; the carry rejects them clearly") {
    val frac = (0L until 100L).map(i => (i, (i % 7).toDouble + 0.6)).toDF("id", "est_tokens")
    spark.conf.set("graft.rowIndex.localThresholdBytes", "0")
    try {
      // above the threshold a fractional column must NOT silently
      // truncate through the carry (0.6 -> 0 puts everything in bin 0)
      val packed = Sampling.packSequences(frac, "est_tokens", "id", budget = 40)
        .select("id", "bin").as[(Long, Long)].collect().toMap
      assert(packed.values.max > 1, packed.values.max.toString)
      val err = intercept[IllegalArgumentException] {
        Sampling.packBoundaryCarry(frac, "est_tokens", "id", budget = 40)
      }
      assert(err.getMessage.contains("integral"), err.getMessage)
    } finally spark.conf.unset("graft.rowIndex.localThresholdBytes")
  }

  test("a token/order column named 'bin' still packs (window replace), carry rejects it") {
    val df = (0L until 100L).map(i => (i, i % 9 + 1)).toDF("id", "bin")
    spark.conf.set("graft.rowIndex.localThresholdBytes", "0")
    try {
      // tokenCol == "bin": must not be dropped out from under the sum;
      // routes to the window path even above the threshold
      val packed = Sampling.packSequences(df, "bin", "id", budget = 50)
        .select("id", "bin").as[(Long, Long)].collect().toMap
      val want = Sampling.packSequences(
        df.withColumnRenamed("bin", "n_tokens"), "n_tokens", "id", budget = 50)
        .select("id", "bin").as[(Long, Long)].collect().toMap
      assert(packed === want)
      val err = intercept[IllegalArgumentException](
        Sampling.packBoundaryCarry(df, "bin", "id", budget = 50))
      assert(err.getMessage.contains("rename"), err.getMessage)
    } finally spark.conf.unset("graft.rowIndex.localThresholdBytes")
  }

  test("re-packing replaces a pre-existing bin column in both paths") {
    val df = (0L until 200L).map(i => (i, i % 9 + 1)).toDF("id", "n_tokens")
    val once = Sampling.packSequences(df, "n_tokens", "id", budget = 100)
    val windowAgain = Sampling.packSequences(once, "n_tokens", "id", budget = 50)
    assert(windowAgain.columns.count(_ == "bin") === 1)
    val carryAgain = Sampling.packBoundaryCarry(once, "n_tokens", "id", budget = 50)
    assert(carryAgain.columns.count(_ == "bin") === 1)
    // both re-packs agree with a fresh pack at the new budget
    val fresh = Sampling.packSequences(df, "n_tokens", "id", budget = 50)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    assert(windowAgain.select("id", "bin").as[(Long, Long)].collect().toMap === fresh)
    assert(carryAgain.select("id", "bin").as[(Long, Long)].collect().toMap === fresh)
  }

  test("unkeyed packing dispatches to the carry path above the local threshold") {
    spark.conf.set("graft.rowIndex.localThresholdBytes", "0")
    try {
      val df = (0L until 100L).map(i => (i, i % 7 + 1)).toDF("id", "n_tokens")
      val packed = Sampling.packSequences(df, "n_tokens", "id", budget = 50)
      // the carry path is RDD-based: no Window node in the plan
      assert(!packed.queryExecution.executedPlan.toString.contains("Window"))
      val direct = Sampling.packBoundaryCarry(df, "n_tokens", "id", budget = 50)
        .select("id", "bin").as[(Long, Long)].collect().toMap
      assert(packed.select("id", "bin").as[(Long, Long)].collect().toMap === direct)
    } finally spark.conf.unset("graft.rowIndex.localThresholdBytes")
  }
}
