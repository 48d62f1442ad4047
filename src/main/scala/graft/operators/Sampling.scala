package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-mixing utilities for training-data pipelines: reproducible
  * sampling and token-budget sequence packing.
  *
  * Sampling here is DETERMINISTIC by id, not `rand()`-based: at 100 TB a
  * sample must be reproducible across reruns, retries, and speculative
  * task re-execution, and `rand()` is none of those (a retried task
  * re-draws). Hash/modulo rules are pure map-side filters — no shuffle,
  * full pushdown-compatible — and the same rule re-applied yields the
  * same corpus. (Spark's own `df.sample`/`sampleBy` remain available
  * when statistical randomness matters more than reproducibility.)
  */
object Sampling {

  /** Keep ~`fraction` of rows, chosen by a deterministic hash of `idCol`
    * (salted so different `seed`s give independent samples). Pure narrow
    * filter: no shuffle, survives retries bit-identically.
    */
  def deterministicSample(
      df: DataFrame, idCol: String, fraction: Double, seed: Int = 0): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction: $fraction")
    val bucket = pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L))
    df.filter(bucket < lit((fraction * 1000000L).toLong))
  }

  /** Stratified deterministic sample: per-stratum keep fractions (e.g.
    * domain-mixing weights `{"en" -> 1.0, "web" -> 0.3}`). Strata absent
    * from the map keep `defaultFraction`. Single map-side pass — the
    * per-stratum thresholds ride along as a CASE chain.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      seed: Int = 0): DataFrame = {
    val bucket = pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L))
    val threshold = fractions.foldLeft(lit((defaultFraction * 1000000L).toLong)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit((f * 1000000L).toLong)).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  /** Modulo-rule sample on an integer id: keep rows with
    * `id % modulus < keep`. The blunt, SQL-portable cousin of
    * [[deterministicSample]] — exactly mirrorable in any engine, which
    * makes it the cross-engine-reproducible variant (and the oracle-able
    * one).
    */
  def moduloSample(df: DataFrame, idCol: String, modulus: Int, keep: Int): DataFrame =
    df.filter(pmod(col(idCol), lit(modulus)) < lit(keep))

  /** Deterministic per-id uniform in (0, 1]: a 31-bit LCG on the id.
    * Small constants keep every intermediate in BIGINT range, so ANY
    * engine (DuckDB throws on 64-bit overflow where Spark wraps)
    * recomputes the identical draw — the single source of truth for
    * every weighted/Gumbel sampler here and in [[graft.ml.Dsir]]; the
    * q_resample oracle mirrors these exact constants.
    */
  def lcgUniform(id: org.apache.spark.sql.Column, seed: Int): org.apache.spark.sql.Column =
    (pmod(id.cast("long") * 1103515245L + 12345L + seed,
      lit(2147483648L)) + 1L).cast("double") / 2147483649.0

  /** The salted-md5 order key shared by [[exactSample]] and
    * [[shuffleDeterministic]] — a cross-engine contract (the DuckDB
    * oracles mirror `md5(id::VARCHAR || '_seed')` byte-for-byte), so it
    * lives in exactly one place.
    */
  private def saltedMd5Key(idCol: String, seed: Int): org.apache.spark.sql.Column =
    md5(concat(col(idCol).cast("string"), lit("_" + seed)).cast("binary"))

  /** The Efraimidis–Spirakis top-`n` tail shared by
    * [[importanceResample]] and [[temperatureMix]]: rank by
    * `ln(u)/w` (u the per-id LCG uniform) and keep the best `n` —
    * TakeOrderedAndProject, no global sort. Expects the per-row weight
    * in `__w`; any weight-formula sampler reuses this draw unchanged
    * (null-handling/tiebreak fixes land in one place).
    */
  private def esTopN(df: DataFrame, idCol: String, n: Int, seed: Int): DataFrame =
    df.withColumn("__key", log(lcgUniform(col(idCol), seed)) / col("__w"))
      .orderBy(col("__key").desc, col(idCol))
      .limit(n)

  /** Per-group cap: keep the top `n` rows of each `groupCol` group in
    * `orderBy` order (e.g. "at most 50 docs per source domain, best
    * quality first" — the domain-capping stage every Common-Crawl-scale
    * pipeline runs so no single site dominates the corpus). Emits the
    * 1-based `rank` within the group.
    *
    * Scale shape: `row_number() <= n` is rewritten by Spark's
    * InferWindowGroupLimit to a WindowGroupLimit pair — a PARTIAL
    * group-limit before the exchange keeps only `n` rows per group per
    * input partition, so the shuffle carries O(groups × n) rows, not the
    * corpus (pinned in PlanQualitySpec). The `orderBy` should end in a
    * tiebreaker column that makes the order total, or the cap boundary
    * is nondeterministic.
    */
  def capPerGroup(
      df: DataFrame, groupCol: String, orderBy: Seq[org.apache.spark.sql.Column],
      n: Int): DataFrame = {
    require(n > 0, s"n: $n")
    val w = Window.partitionBy(col(groupCol)).orderBy(orderBy: _*)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
  }

  /** Token-budget cap per group — the token-weighted cousin of
    * [[capPerGroup]] and the "give me ~N tokens per domain" mixing
    * primitive: keep docs in deterministic md5-shuffled order within
    * each group until the running token total reaches `budget`. The
    * keep rule is "tokens BEFORE the doc < budget" (the
    * [[packSequences]] cumsum convention): the doc that crosses the
    * budget is KEPT, so a group with ≥ budget tokens yields at least
    * `budget`; a smaller group is kept whole. Exact integer math — any
    * engine re-derives the identical set (the [[exactSample]] md5
    * portability rule).
    *
    * Scale shape: ONE hash-partitioned window (cumulative sum over the
    * md5 order), skew surface = rows per group — the [[capPerGroup]]
    * plan with a running sum instead of row_number.
    */
  def capTokensPerGroup(
      df: DataFrame, groupCol: String, tokenCol: String, idCol: String,
      budget: Long, seed: Int = 0): DataFrame = {
    require(budget > 0, s"budget: $budget")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(saltedMd5Key(idCol, seed).asc_nulls_last, col(idCol).asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__tok_before",
        coalesce(sum(col(tokenCol).cast("long")).over(w), lit(0L)))
      .filter(col("__tok_before") < budget)
      .drop("__tok_before")
  }

  /** Weighted exact-`n` per-group sample (Efraimidis–Spirakis 2006 per
    * group) — the weighted cousin of [[capPerGroup]] and the "best n
    * docs per domain, quality-weighted" mixing primitive: within each
    * group keep the `n` rows with the best `ln(u)/w` key (u the
    * deterministic per-id [[lcgUniform]] draw, w = `weightCol`), which
    * is a without-replacement sample where P(row drawn next) ∝ w. Rows
    * with null or non-positive weight are excluded (they can never
    * win). Integer LCG + one ln + one division — any engine re-derives
    * the identical draw, so the pick is oracle-able; emits the 1-based
    * in-group `rank`.
    *
    * Scale shape: the [[capPerGroup]] plan — one hash-partitioned
    * window whose `row_number() <= n` rewrites to a partial/final
    * WindowGroupLimit pair, so only n rows per group per map task reach
    * the exchange.
    */
  def exactSamplePerGroup(
      df: DataFrame, groupCol: String, idCol: String, n: Int,
      weightCol: String, seed: Int = 0): DataFrame = {
    require(n > 0, s"n: $n")
    val w = Window.partitionBy(col(groupCol)).orderBy(
      (log(lcgUniform(col(idCol), seed)) / col(weightCol).cast("double")).desc,
      col(idCol).asc_nulls_last)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
  }

  /** Exact-size deterministic sample: the `n` rows whose salted md5 of
    * `idCol` sorts lowest. Unlike fraction sampling this yields exactly
    * `n` rows; unlike `limit(n)` the choice is uniform-ish over the
    * corpus and reproducible across engines (md5 of the decimal string
    * id — any engine re-derives the same set, which is what makes it
    * oracle-able). Executes as TakeOrderedAndProject: per-partition
    * top-n heaps, only n rows ever reach the driver-side merge — no
    * global sort (pinned in PlanQualitySpec).
    */
  def exactSample(df: DataFrame, idCol: String, n: Int, seed: Int = 0): DataFrame = {
    require(n > 0, s"n: $n")
    // nulls last (matching SQL engines' ASC default), so a null id can
    // never hijack the sample
    df.orderBy(saltedMd5Key(idCol, seed).asc_nulls_last, col(idCol).asc_nulls_last)
      .limit(n)
  }

  /** Importance resampling to a target stratum mix (the categorical
    * cousin of DSIR, Xie et al. 2023): draw an exact-size weighted
    * sample whose composition converges to `targetFracs` (e.g.
    * rebalance an en-heavy corpus to a uniform language mix) without
    * replacement, deterministically.
    *
    * Per-row weight = targetFrac(stratum) / corpusFrac(stratum); rows
    * are ranked by the Efraimidis–Spirakis key ln(u)/w (u a
    * deterministic per-id uniform — an LCG on the id, not `rand()`, so
    * retries and other engines reproduce the draw bit-identically) and
    * the top `n` win. Strata absent from `targetFracs` are dropped.
    *
    * Scale shape: corpus fractions come from one partial-agg count on
    * the (low-cardinality) stratum column; the tiny fractions frame
    * broadcast-joins back; scoring is map-side arithmetic; selection is
    * TakeOrderedAndProject (per-partition top-n heaps — no global
    * sort). Total cost ≈ one scan + one count shuffle at any corpus
    * size.
    */
  def importanceResample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      targetFracs: Map[String, Double],
      n: Int,
      seed: Int = 0): DataFrame = {
    require(n > 0, s"n: $n")
    require(targetFracs.values.forall(_ > 0.0), "target fractions must be positive")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__c"))
    // total = sum of the per-stratum counts — derived from the tiny
    // counts frame, NOT a second full scan of the corpus
    val withTot = counts.crossJoin(
      broadcast(counts.agg(sum("__c").as("__tot"))))
    val target = targetFracs.foldLeft(lit(null).cast("double")) {
      case (acc, (s, f)) => when(col(strataCol) === s, lit(f)).otherwise(acc)
    }
    val weighted = df.join(broadcast(withTot), Seq(strataCol))
      .withColumn("__w", target / (col("__c").cast("double") / col("__tot")))
      .filter(col("__w").isNotNull)
    esTopN(weighted, idCol, n, seed)
      .drop("__c", "__tot", "__w", "__key")
  }

  /** Temperature-scaled corpus mixing (the multilingual-pretraining
    * rule p_i ∝ (n_i/N)^α, Conneau & Lample 2019 §3.1): draw an
    * exact-`n` sample whose stratum composition follows the
    * temperature-flattened corpus distribution. α = 1 preserves the
    * natural mix; α → 0 approaches uniform (low-resource strata
    * up-sampled); α > 1 sharpens toward the head. Deterministic — the
    * same Efraimidis–Spirakis draw on the per-id LCG uniform as
    * [[importanceResample]], with target fractions DERIVED from the
    * corpus counts instead of supplied.
    *
    * Scale shape: identical to importanceResample — one partial-agg
    * count on the stratum column, tiny broadcast back, map-side
    * weights, TakeOrderedAndProject. The normalizer Σ c_j^α is a
    * common factor of every row's weight, so cross-engine float-sum
    * ordering cannot perturb the draw (rank order only depends on the
    * per-stratum c^(α−1) and the per-id uniform).
    */
  def temperatureMix(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      alpha: Double,
      n: Int,
      seed: Int = 0): DataFrame = {
    require(n > 0, s"n: $n")
    require(alpha >= 0.0, s"alpha: $alpha")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__c"))
    val withTot = counts.crossJoin(broadcast(counts.agg(
      sum(pow(col("__c"), alpha)).as("__pt"), sum("__c").as("__tot"))))
    // w_i = targetFrac / corpusFrac = (c^α/Σc^α) / (c/tot)
    //     = c^(α−1) · tot / Σc^α
    val weighted = df.join(broadcast(withTot), Seq(strataCol))
      .withColumn("__w", pow(col("__c"), alpha - 1.0) * col("__tot") / col("__pt"))
    esTopN(weighted, idCol, n, seed)
      .drop("__c", "__tot", "__pt", "__w", "__key")
  }

  /** Deterministic global training-order shuffle: a reproducible
    * pseudo-random permutation by salted md5 of the id string
    * (cross-engine recomputable — the [[exactSample]] key), materialized
    * as 0-based `shuffle_rank`. The rank comes from
    * [[Sorts.withRowIndex]], so below the local threshold it is one
    * window task and above it the zipWithIndex shape — no
    * SinglePartition stage at scale. Composes with [[packSequences]]
    * (shuffle-then-pack is the standard training-prep tail: random doc
    * order, then contiguous token-budget bins).
    */
  def shuffleDeterministic(df: DataFrame, idCol: String, seed: Int = 0): DataFrame = {
    val keyed = df.withColumn("__sk", saltedMd5Key(idCol, seed))
    Sorts.withRowIndex(keyed, Seq(col("__sk").asc_nulls_last, col(idCol).asc_nulls_last),
      "shuffle_rank").drop("__sk")
  }

  /** Deterministic exactly-balanced `numShards`-way split: round-robin
    * over the [[shuffleDeterministic]] md5 order, so shard sizes differ
    * by at most 1 AND each shard is itself a deterministic uniform
    * sample (hash-mod on raw ids would inherit any id-space structure
    * and skew ±O(√(n/shards)); the rank route is exact). The training
    * export primitive: N epochs-worth of workers each read their own
    * shard with no coordination, and any engine re-derives the
    * assignment from (id, seed) alone. Scale shape: cost is the
    * [[Sorts.withRowIndex]] range-partitioned sort — no global window
    * above the local threshold, no SinglePartition.
    */
  def shardDeterministic(df: DataFrame, idCol: String, numShards: Int,
      seed: Int = 0): DataFrame = {
    require(numShards > 0, s"shardDeterministic: numShards=$numShards")
    shuffleDeterministic(df, idCol, seed)
      .withColumn("shard", pmod(col("shuffle_rank"), lit(numShards.toLong)))
      .drop("shuffle_rank")
  }

  /** Token-budget sequence packing: assign docs to training bins of at
    * most ~`budget` tokens, preserving `orderCol` order within each
    * `partitionCols` group (e.g. pack per language). The bin id is
    * `floor(cumulative_tokens_before_doc / budget)` — the streaming
    * first-fit variant that needs one window pass, not the NP-ish
    * best-fit shuffle dance. Oversized single docs get their own bin
    * (they exceed the budget alone; cap or split upstream).
    *
    * Scale note: one shuffle on `partitionCols`; within-group the window
    * is a linear scan. With many small groups this parallelizes cleanly.
    * UNKEYED packing (`partitionCols = Nil`) would be a single-task
    * global window, so above the [[Sorts]] local threshold it dispatches
    * to a boundary-carry shape instead (the `ffill` scale pattern): a
    * range-partitioned sort, a numPartitions-row boundary job collecting
    * per-partition token totals, then a per-partition carry seeded with
    * the prefix-summed offsets — the global running total is exact
    * (integer math, no float division) and no task ever sees more than
    * its own partition.
    */
  // `bin` is the packing output column: a pre-existing one is replaced
  // in BOTH paths (dropped up front, appended at the end) so the window
  // and carry paths emit identical frames — UNLESS it is itself the
  // token/order input, in which case it stays and the window path's
  // withColumn replace handles it (pre-scale-path behavior).
  private def dropBin(df: DataFrame, keep: Seq[String]): DataFrame =
    if (df.columns.contains("bin") && !keep.contains("bin")) df.drop("bin") else df

  /** The carry path's running total is exact INTEGER math; fractional
    * token columns (float sums are addition-order-sensitive, so the
    * offset regrouping could flip a boundary bin) stay on the window
    * path, which matches their single-sequence sum exactly. Token
    * counts are semantically integral — cast upstream to get the scale
    * shape. (DecimalType(p,0) is also exact but `longValue` would
    * silently wrap past int64, so it stays off the carry.)
    */
  private def isIntegralToken(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.ByteType | _: org.apache.spark.sql.types.ShortType |
         _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType => true
    case _ => false
  }

  private lazy val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  def packSequences(
      df: DataFrame,
      tokenCol: String,
      orderCol: String,
      budget: Long,
      partitionCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0, s"budget: $budget")
    val base = dropBin(df, Seq(tokenCol, orderCol))
    val integral = isIntegralToken(base.schema(tokenCol).dataType)
    val reservedName = tokenCol == "bin" || orderCol == "bin"
    if (partitionCols.isEmpty && integral && !reservedName &&
        !Sorts.underLocalThreshold(base))
      return packBoundaryCarry(base, tokenCol, orderCol, budget)
    // surface the scale cliff instead of silently funnelling a big
    // corpus through one window task — the README promises the carry
    // shape for unkeyed packing, and only an integral token column
    // gets it
    if (partitionCols.isEmpty && !integral && !Sorts.underLocalThreshold(base))
      logger.warn(s"packSequences: fractional token column '$tokenCol' " +
        s"(${base.schema(tokenCol).dataType}) defeats the boundary-carry scale path; " +
        "using a SINGLE-TASK global window. Cast/round the column to an integer " +
        "type to restore the distributed shape.")
    if (partitionCols.isEmpty && reservedName && !Sorts.underLocalThreshold(base))
      logger.warn("packSequences: a token/order column named 'bin' (the packing " +
        "output column) defeats the boundary-carry scale path; using a " +
        "SINGLE-TASK global window. Rename the input column to restore the " +
        "distributed shape.")
    val w = (if (partitionCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(partitionCols.map(col): _*))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val before = coalesce(sum(col(tokenCol)).over(w), lit(0L))
    base.withColumn("bin", floor(before / lit(budget)))
  }

  /** The unconditional scale path of unkeyed packing: range sort, per-
    * partition token totals to the driver (numPartitions longs), exact
    * prefix-summed carry per partition. The sort shuffle materializes
    * once and serves both jobs. Null token counts carry 0 (the window
    * path's `sum` ignores nulls the same way).
    */
  private[graft] def packBoundaryCarry(
      df: DataFrame, tokenCol: String, orderCol: String, budget: Long): DataFrame = {
    val spark = df.sparkSession
    require(tokenCol != "bin" && orderCol != "bin",
      "'bin' is the packing output column; rename the input column")
    val in = dropBin(df, Seq(tokenCol, orderCol))
    if (!isIntegralToken(in.schema(tokenCol).dataType))
      throw new IllegalArgumentException(
        s"packBoundaryCarry needs an integral token column, got $tokenCol: " +
          s"${in.schema(tokenCol).dataType} " +
          "(fractional sums are addition-order-sensitive; round/cast upstream)")
    val sorted = in.orderBy(col(orderCol))
    val schema = sorted.schema
    val tIdx = schema.fieldIndex(tokenCol)
    def tok(r: org.apache.spark.sql.Row): Long = r.get(tIdx) match {
      case null                => 0L
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"non-numeric token count: $other (${other.getClass})")
    }
    val rdd = sorted.rdd
    val sums = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => s += tok(r))
      Iterator((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(_ + _) // tokens before partition p
    val packed = rdd.mapPartitionsWithIndex { (pid, it) =>
      var before = offsets(pid)
      it.map { r =>
        val bin = java.lang.Math.floorDiv(before, budget)
        before += tok(r)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ bin)
      }
    }
    spark.createDataFrame(packed,
      schema.add("bin", org.apache.spark.sql.types.LongType))
  }

  /** Export packed bins as training-ready sequence rows: one row per
    * (partitionCols, bin) with the member docs in pack order —
    * `doc_ids`, `n_docs`, `n_seq_tokens`, and (when `idsCol` is set)
    * the concatenated token-id sequence `token_ids`. The shuffle unit
    * is the bin: ONE partial-agg exchange of (bin, member structs),
    * and a bin is ≤ budget tokens by construction, so no row can
    * outgrow an executor no matter the corpus size.
    */
  def materializePacked(
      packed: DataFrame, orderCol: String, idCol: String, tokenCol: String,
      partitionCols: Seq[String] = Nil, idsCol: String = null): DataFrame = {
    val fields = Seq(col(orderCol), col(idCol).as("__id"),
      col(tokenCol).cast("long").as("__t")) ++
      (if (idsCol == null) Nil else Seq(col(idsCol).as("__ids")))
    val keys = (partitionCols :+ "bin").map(col)
    val agged = packed
      .groupBy(keys: _*)
      .agg(sort_array(collect_list(struct(fields: _*))).as("__e"))
    val base = agged.select(keys ++ Seq(
      transform(col("__e"), x => x.getField("__id")).as("doc_ids"),
      size(col("__e")).as("n_docs"),
      aggregate(col("__e"), lit(0L),
        (acc, x) => acc + coalesce(x.getField("__t"), lit(0L))).as("n_seq_tokens")): _*)
    if (idsCol == null) base
    else agged.select(keys ++ Seq(
      transform(col("__e"), x => x.getField("__id")).as("doc_ids"),
      size(col("__e")).as("n_docs"),
      aggregate(col("__e"), lit(0L),
        (acc, x) => acc + coalesce(x.getField("__t"), lit(0L))).as("n_seq_tokens"),
      flatten(transform(col("__e"), x => x.getField("__ids"))).as("token_ids")): _*)
  }
}
