package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-value imputation (tablite/imputation.py:12-158,
  * nimlite/funcs/imputation.nim:116-275). Four methods: carry forward
  * (ffill), mean, mode, nearest neighbour.
  */
object Imputation {

  /** "carry forward": fill NULLs with the last non-null earlier value in
    * `orderCol` order (imputation.py:103-125). Window `last(ignoreNulls)`
    * over unbounded-preceding. The global order window is inherent to the
    * semantics; at scale prefer a partition key (`partitionBy`) when the
    * data has one (e.g. per-device streams).
    */
  def ffill(df: DataFrame, targets: Seq[String], orderCol: String,
      partitionBy: Seq[String] = Nil, tieBreak: Seq[String] = Nil): DataFrame = {
    // the order must be TOTAL within each partition — ties would make the
    // carried value partition-order-dependent; pass tieBreak columns when
    // orderCol alone is not unique
    val orderCols = (orderCol +: tieBreak).map(col)
    if (partitionBy.isEmpty) return ffillGlobal(df, targets, orderCols)
    val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    targets.foldLeft(df)((acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Unkeyed ffill without the single-task global window: range-partitioned
    * sort, then (1) a lightweight boundary job collecting each partition's
    * last non-null per target — numPartitions rows to the driver, (2) a
    * per-partition imperative carry seeded with the prefix-merged
    * boundaries. The sort shuffle materializes once and serves both jobs;
    * no task ever sees more than its own partition.
    */
  private def ffillGlobal(df: DataFrame, targets: Seq[String], orderCols: Seq[Column]): DataFrame = {
    // same adaptive dispatch as Sorts.withRowIndex: a one-task window is
    // optimal below the threshold; the boundary-carry shape above it
    if (Sorts.underLocalThreshold(df)) {
      val w = Window.orderBy(orderCols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      return targets.foldLeft(df)((acc, c) =>
        acc.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    }
    ffillBoundaryCarry(df, targets, orderCols)
  }

  /** The unconditional scale path of unkeyed ffill. */
  private[graft] def ffillBoundaryCarry(df: DataFrame, targets: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(orderCols: _*)
    val schema = sorted.schema
    val tIdx = targets.map(schema.fieldIndex).toArray
    val rdd = sorted.rdd
    val perPart: Array[Array[Any]] = rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = new Array[Any](tIdx.length)
      it.foreach { r =>
        var i = 0
        while (i < tIdx.length) { val v = r.get(tIdx(i)); if (v != null) acc(i) = v; i += 1 }
      }
      Iterator((pid, acc))
    }.collect().sortBy(_._1).map(_._2)
    // carry-in for partition p = last non-null over all partitions < p
    val carryIn = Array.ofDim[Array[Any]](perPart.length)
    val run = new Array[Any](tIdx.length)
    var p = 0
    while (p < perPart.length) {
      carryIn(p) = run.clone()
      var i = 0
      while (i < tIdx.length) { if (perPart(p)(i) != null) run(i) = perPart(p)(i); i += 1 }
      p += 1
    }
    val filled = rdd.mapPartitionsWithIndex { (pid, it) =>
      val carry = carryIn(pid).clone()
      it.map { r =>
        val vals = r.toSeq.toArray
        var i = 0
        while (i < tIdx.length) {
          val v = vals(tIdx(i))
          if (v == null) vals(tIdx(i)) = carry(i) else carry(i) = v
          i += 1
        }
        org.apache.spark.sql.Row.fromSeq(vals.toIndexedSeq)
      }
    }
    spark.createDataFrame(filled, schema)
  }

  /** mean / mode imputation (imputation.py:128-158): one aggregate pass,
    * then coalesce. The stat is computed distributedly and broadcast back
    * via a scalar cross join (1-row frame — Catalyst broadcasts it).
    */
  def fillWithStat(df: DataFrame, targets: Seq[String], method: String): DataFrame = {
    require(method == "mean" || method == "mode", s"unknown method: $method")
    if (targets.isEmpty) return df // nothing to impute — same no-op as ffill
    val stats = targets.map { c =>
      val agg = method match {
        case "mean" => avg(col(c))
        case "mode" => mode(col(c))
        case other  => throw new IllegalArgumentException(s"unknown method: $other")
      }
      agg.as(s"__stat_$c")
    }
    val statRow = df.agg(stats.head, stats.tail: _*)
    val joined = df.crossJoin(broadcast(statRow))
    targets.foldLeft(joined)((acc, c) =>
      acc.withColumn(c, coalesce(col(c), col(s"__stat_$c"))))
      .drop(targets.map(c => s"__stat_$c"): _*)
  }

  /** Nearest-neighbour imputation (nimlite/funcs/imputation.nim:116-275):
    * for each row with a missing target, find the donor row (target
    * present) closest in rank-normalized L1 distance over `sources` and
    * copy its target value. Equidistant donors tie-break to the smallest
    * donor value (deterministic; the reference's row-order pick depends
    * on its page layout).
    *
    * Scale shape: the reference does an O(n²) scan per patient. Here:
    *   1. integer ranks per source via join-based rank tables (no global
    *      window — see the inline notes);
    *   2. split into donors and patients, keeping every patient row
    *      (unique row ids — identical patient rows must not collapse);
    *   3. patients × donors with min_by(distance) per patient; Catalyst/
    *      AQE picks broadcast-NL when a side fits, else a distributed
    *      cartesian. Exact NN is inherently |patients| × |donors| work —
    *      spread over the cluster instead of one node; for massive
    *      patient counts switch to LSH bucketing on the rank vector.
    *
    * NULL source values follow the Nim kernel (imputation.nim:144,216):
    * a patient's missing source contributes nothing to any distance (the
    * column is skipped for that row), a donor's missing source makes
    * that donor infinitely far in that column.
    *
    * SINGLE-source dispatch divergence (stated): with one source column
    * the exact two-carry path below orders null-source patients
    * nulls-first in rank order (Spark's total order) instead of the
    * kernel's skip-the-column rule; with one source that kernel rule
    * degrades to "every donor equidistant", a corner the reference
    * resolves by page order — neither engine has a principled answer
    * there. Callers who need the multi-source rule for a single column
    * can pass the source twice (distances double, order unchanged).
    *
    * `rankBand > 0` is the opt-in SCALE knob for corpora where the null
    * fraction makes |patients| × |donors| intractable: candidate donors
    * are restricted to those within ±rankBand ranks of the patient on
    * the patient's first non-null source, turning the unbounded
    * cartesian into an equi-join on (source, rank-bucket). EXACT
    * whenever every patient's true nearest donor lies within the band
    * (spec-pinned); a patient with no in-band donor keeps its null
    * (the exact path would have reached farther). Patients with every
    * source null take the kernel's all-equidistant rule directly
    * (global min donor value) — no product at all.
    */
  def nearestNeighbour(df: DataFrame, target: String, sources: Seq[String],
      rankBand: Int = 0): DataFrame = {
    require(sources.nonEmpty, "nearestNeighbour needs at least one source column")
    // 1-D fast path: with a single source column, the nearest donor in
    // rank space is the closest preceding or following donor in sort
    // order — two carries instead of a patients×donors product (which
    // is O(n²) when many rows are missing). Equal-rank donors are
    // pre-aggregated to their min value, so the pick is deterministic
    // and agrees with the multi-source tie-break. One stated divergence:
    // rows whose SOURCE is null order nulls-first (Spark's total order)
    // instead of the skip-the-column rule — with one source the
    // reference's rule degrades to "all donors equidistant", a corner
    // its own kernel resolves by page order.
    if (sources.length == 1) return nearestNeighbour1D(df, target, sources.head)
    // Integer ranks (not percent_rank) keep rank distances exact, so
    // equidistant donors tie EXACTLY and the tie-break below is
    // deterministic; ties in the source value share a rank, matching the
    // Nim kernel's unix-rank (imputation.nim:47-68). Ranks are computed
    // WITHOUT a global window: per column, a zipWithIndex row index over
    // the value sort, reduced to min-index-per-value (= SQL rank - 1) and
    // joined back on the value — every stage is a parallel shuffle, no
    // single task ever holds the table. Normalization to [0,1] happens
    // inside the distance term as a single exact division.
    // NULL source values get NO rank (rank tables are built over non-null
    // values; the left join leaves __r null) — the distance term then
    // applies the kernel's rule instead of inventing an order for them
    def rankTable(c: String): DataFrame =
      Sorts.withRowIndex(
        df.select(col(c).as(s"__v_$c")).filter(col(s"__v_$c").isNotNull),
        Seq(col(s"__v_$c")), "__idx")
        .groupBy(s"__v_$c").agg(min("__idx").as(s"__r_$c"))
    val rankJoined = sources.foldLeft(df) { (acc, c) =>
      acc.join(rankTable(c), acc(c) <=> col(s"__v_$c"), "left").drop(s"__v_$c")
    }
    // row count as a 1-row broadcast (a count().over(Window.partitionBy())
    // would be one more global window)
    val ranked = rankJoined.crossJoin(
      broadcast(df.agg(count(lit(1)).as("__n"))))
    val donors = ranked.filter(col(target).isNotNull)
      .select((Seq(col(target).as("__donor_val")) ++
        sources.map(c => col(s"__r_$c").as(s"__dr_$c"))): _*)
    // unique row id so byte-identical patient rows survive the min_by
    // aggregation as separate rows (grouping on the payload alone would
    // collapse them and LOSE rows). DETERMINISTIC under stage retries:
    // monotonically_increasing_id over a post-shuffle frame can renumber
    // rows when a fetch failure reorders a recomputed partition (rows
    // would then drop/duplicate through the groupBy below). Instead:
    // collapse identical rows (order-insensitive aggregation — any replay
    // produces the same groups), re-expand with an ordinal, and key on
    // (2×64-bit row hash, ordinal) — same uid SET on every replay, no
    // window, and the shuffle carries each distinct patient row once
    // instead of every duplicate. Two independently-salted hashes make a
    // cross-row collision (which would merge two different patients)
    // a 128-bit event.
    val pBase = ranked.filter(col(target).isNull)
    val pCols = pBase.columns.map(col)
    val patients = pBase.groupBy(pCols: _*).agg(count(lit(1)).as("__dup"))
      .withColumn("__ord", explode(sequence(lit(1L), col("__dup"))))
      .withColumn("__uid", struct(
        xxhash64(pCols: _*).as("h1"),
        xxhash64((lit(0x9E3779B97F4A7C15L) +: pCols): _*).as("h2"),
        col("__ord").as("ord")))
      .drop("__dup", "__ord")
    val complete = ranked.filter(col(target).isNotNull)
      .drop(sources.map(c => s"__r_$c") :+ "__n": _*)

    // per-column term: exact integer rank distance, normalized by a single
    // division (same numerator → same double → exact ties). Kernel null
    // rule (imputation.nim:144,216): patient rank null → the column is
    // skipped (0 for every donor); donor rank null → that donor is
    // infinitely far in this column.
    val dist = sources.map(c =>
      when(col(s"__r_$c").isNull, lit(0.0))
        .when(col(s"__dr_$c").isNull, lit(Double.PositiveInfinity))
        .otherwise(abs(col(s"__r_$c") - col(s"__dr_$c")).cast("double") /
          greatest(col("__n") - 1, lit(1L)).cast("double"))).reduce(_ + _)
    // No donors at all (target entirely null): nothing can be imputed —
    // return the frame unchanged instead of letting an empty cross
    // product erase every patient row. Eager limit-1 probe, same spirit
    // as bucketSelfJoin's sizing count.
    if (donors.isEmpty) return df

    // tie-break equidistant donors by the donor value itself (deterministic).
    // The aggregation is keyed on the narrow __uid and carries the payload
    // with first() (constant within a uid group) — grouping on the wide
    // payload would both shuffle fat rows and collapse identical patients.
    val payload = patients.columns.filter(_ != "__uid")
    val aggs = min_by(col("__donor_val"), struct(dist, col("__donor_val"))).as("__fill") +:
      payload.map(c => first(col(c)).as(c))
    def fillFrom(candidates: DataFrame): DataFrame =
      candidates.groupBy("__uid").agg(aggs.head, aggs.tail: _*)
        .withColumn(target, coalesce(col(target), col("__fill")))
        .drop("__fill", "__uid")
        .drop(sources.map(c => s"__r_$c") :+ "__n": _*)

    val filled = if (rankBand <= 0) {
      // EXACT path. No forced broadcast: patients are unbounded (a column
      // 50% null would broadcast half the corpus) — Catalyst/AQE picks
      // broadcast-NL only when the side actually fits the threshold, else
      // a distributed cartesian (p×q bounded tasks). Exact NN is
      // inherently |patients|×|donors| work — same as the reference's
      // O(n²) scan, but spread over the cluster instead of one node.
      fillFrom(patients.crossJoin(donors))
    } else {
      // BANDED path (opt-in, see scaladoc): equi-join on (band source,
      // rank bucket of width rankBand). A donor explodes to its bucket
      // ±1 per source, so every donor within ±rankBand of a patient on
      // the patient's band source is a candidate (plus some ≤2·rankBand
      // away — a superset, which only ADDs candidates). Left join keeps
      // patients with no in-band donor (their fill stays null).
      def bucketOf(r: Column): Column = floor(r / lit(rankBand.toLong))
      val bandIdx = coalesce((sources.zipWithIndex.map { case (c, i) =>
        when(col(s"__r_$c").isNotNull, lit(i)) } :+ lit(-1)): _*)
      val p2 = patients.withColumn("__bi", bandIdx)
      val patientBucket = sources.zipWithIndex.foldLeft(lit(null).cast("long")) {
        case (acc, (c, i)) => when(col("__bi") === i, bucketOf(col(s"__r_$c"))).otherwise(acc)
      }
      val banded = p2.filter(col("__bi") >= 0).withColumn("__pb", patientBucket)
      val donorsExp = donors
        .withColumn("__bi", explode(array(sources.indices.map(i => lit(i)): _*)))
        .withColumn("__dbr", sources.zipWithIndex.foldLeft(lit(null).cast("long")) {
          case (acc, (c, i)) => when(col("__bi") === i, col(s"__dr_$c")).otherwise(acc)
        })
        // a donor with no rank in this source is infinitely far in it for
        // any patient banding on it — it cannot be bucketed and would
        // never win against a finite donor
        .filter(col("__dbr").isNotNull)
        .withColumn("__pb", explode(array(
          bucketOf(col("__dbr")) - 1, bucketOf(col("__dbr")), bucketOf(col("__dbr")) + 1)))
        .drop("__dbr")
      val bandFilled = fillFrom(
        banded.join(donorsExp, Seq("__bi", "__pb"), "left").drop("__bi", "__pb"))
      // patients with EVERY source null: the kernel rule makes all donors
      // equidistant (each column skipped) → the min_by tie-break picks
      // the global min donor value — a 1-row broadcast, no product
      val allNullFilled = p2.filter(col("__bi") === -1).drop("__bi")
        .crossJoin(broadcast(donors.agg(min(col("__donor_val")).as("__fill0"))))
        .withColumn(target, coalesce(col(target), col("__fill0")))
        .drop("__fill0", "__uid")
        .drop(sources.map(c => s"__r_$c") :+ "__n": _*)
      bandFilled.unionByName(allNullFilled)
    }

    complete.unionByName(filled)
  }

  private def nearestNeighbour1D(df: DataFrame, target: String, source: String): DataFrame = {
    // same adaptive dispatch as withRowIndex/ffillGlobal: below the
    // threshold the one-task window IS the optimal plan; above it the
    // carry shape keeps every task bounded by its own partition (three
    // unpartitioned windows here would funnel the full table through a
    // single task three times)
    if (Sorts.underLocalThreshold(df)) {
      // All window work happens on the DISTINCT-value frame (one row per
      // source value = one row per rank), for two reasons:
      //   - the order there is total and tie-free, so the backward pass
      //     is an EXACT reversal (over raw rows, tie order is arbitrary
      //     and need not invert between asc and desc sorts);
      //   - every frame is run-accumulating (unboundedPreceding → 0),
      //     which WindowExec evaluates incrementally in O(n). The naive
      //     shape — first(...) over (1, unboundedFollowing) on raw
      //     rows — re-scans the remaining frame for EVERY row: O(n²),
      //     ~4 min for 100k rows in one task.
      // Equal-rank donors collapse to their MIN value (the multi-source
      // min_by tie-break, same as the carry path's groupBy(__r).min).
      val wF = Window.orderBy(col("__v").asc_nulls_first)
      val wB = Window.orderBy(col("__v").desc_nulls_last)
      def runF = wF.rowsBetween(Window.unboundedPreceding, 0)
      def runB = wB.rowsBetween(Window.unboundedPreceding, 0)
      // a donor at the row's own rank is admitted into BOTH carries
      // (frame end 0): distance 0 wins in fillChoice either way, and
      // donor rows themselves short-circuit on their non-null target
      val ranks = df.groupBy(col(source).as("__v"))
        .agg(count(lit(1)).as("__c"),
          min(when(col(target).isNotNull, col(target))).as("__dv"))
        // unix rank = rows strictly before this value group
        .withColumn("__r",
          coalesce(sum(col("__c")).over(wF.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("__pv", last(col("__dv"), ignoreNulls = true).over(runF))
        .withColumn("__pr",
          last(when(col("__dv").isNotNull, col("__r")), ignoreNulls = true).over(runF))
        .withColumn("__nv", last(col("__dv"), ignoreNulls = true).over(runB))
        .withColumn("__nr",
          last(when(col("__dv").isNotNull, col("__r")), ignoreNulls = true).over(runB))
        .select("__v", "__r", "__pv", "__pr", "__nv", "__nr")
      df.join(ranks, df(source) <=> col("__v"), "left").drop("__v")
        .withColumn(target, fillChoice(target))
        .drop("__r", "__pv", "__pr", "__nv", "__nr")
    } else nearestNeighbour1DCarry(df, target, source)
  }

  /** nearest-prev/next-donor decision shared by both 1-D paths: closer
    * rank wins; equidistant tie → smaller donor value (deterministic,
    * and the same tie-break as the multi-source path's
    * min_by(struct(dist, value))).
    */
  private def fillChoice(target: String): Column =
    when(col(target).isNotNull, col(target))
      .when(col("__pv").isNull, col("__nv"))
      .when(col("__nv").isNull, col("__pv"))
      .when(col("__r") - col("__pr") < col("__nr") - col("__r"), col("__pv"))
      .when(col("__nr") - col("__r") < col("__r") - col("__pr"), col("__nv"))
      .otherwise(least(col("__pv"), col("__nv")))

  /** Scale path of the 1-D fast path — no unpartitioned window anywhere:
    *   1. integer ranks from the SAME join-based rank table the
    *      multi-source path uses ([[Sorts.withRowIndex]] over the value
    *      sort → min-index-per-value → join back);
    *   2. donors collapse to ONE row per rank, keeping the smallest
    *      donor value (the multi-source tie-break, so equal-rank donors
    *      resolve deterministically instead of by window row order);
    *   3. each row's nearest preceding/following donor comes from a
    *      two-direction boundary carry over the rank-sorted union of
    *      rows and donor markers — one parallel range sort, a
    *      numPartitions-row boundary job (each partition's first/last
    *      donor, prefix/suffix-merged on the driver), and one
    *      per-partition scan. No task ever holds more than its own
    *      partition — the `ffillBoundaryCarry` shape, run both ways.
    * The final nearest-donor choice is the shared [[fillChoice]]
    * expression, so type handling stays in Catalyst.
    */
  private[graft] def nearestNeighbour1DCarry(
      df: DataFrame, target: String, source: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val tType = df.schema(target).dataType
    val rankTab = Sorts.withRowIndex(df.select(col(source).as("__v")), Seq(col("__v")), "__idx")
      .groupBy("__v").agg(min("__idx").as("__r"))
    val ranked = df.join(rankTab, df(source) <=> col("__v"), "left").drop("__v")
    val lTypes = ranked.schema.fields.map(f => f.name -> f.dataType).toMap
    val donorRows = ranked.filter(col(target).isNotNull)
      .groupBy("__r").agg(min(col(target)).as("__dv"))
      .select(ranked.columns.filter(_ != "__r").map(c => lit(null).cast(lTypes(c)).as(c)) ++
        Seq(col("__r"), lit(0).as("__side"), col("__dv")): _*)
    val dataRows = ranked
      .select(ranked.columns.filter(_ != "__r").map(col) ++
        Seq(col("__r"), lit(1).as("__side"), lit(null).cast(tType).as("__dv")): _*)
    // donor markers sort BEFORE data rows at the same rank, so an
    // equal-rank donor is visible to the forward carry (distance 0)
    val sorted = dataRows.unionByName(donorRows)
      .orderBy(col("__r").asc, col("__side").asc)
    val schema = sorted.schema
    val rIdx = schema.fieldIndex("__r")
    val sideIdx = schema.fieldIndex("__side")
    val dvIdx = schema.fieldIndex("__dv")
    val rdd = sorted.rdd
    // boundary job: each partition's first and last donor (value, rank) —
    // numPartitions tuples to the driver; the sort shuffle materializes
    // once and is reused by the main pass (skipped stages)
    val bounds = rdd.mapPartitionsWithIndex { (pid, it) =>
      var first: (Any, Long) = null
      var last: (Any, Long) = null
      it.foreach { r =>
        if (r.getInt(sideIdx) == 0) {
          val d = (r.get(dvIdx), r.getLong(rIdx))
          if (first == null) first = d
          last = d
        }
      }
      Iterator((pid, first, last))
    }.collect().sortBy(_._1)
    val nParts = bounds.length
    val carryPrev = new Array[(Any, Long)](nParts) // last donor before partition p
    val carryNext = new Array[(Any, Long)](nParts) // first donor after partition p
    var run: (Any, Long) = null
    var p = 0
    while (p < nParts) {
      carryPrev(p) = run
      if (bounds(p)._3 != null) run = bounds(p)._3
      p += 1
    }
    run = null
    p = nParts - 1
    while (p >= 0) {
      carryNext(p) = run
      if (bounds(p)._2 != null) run = bounds(p)._2
      p -= 1
    }
    val outSchema = StructType(schema.fields ++ Seq(
      StructField("__pv", tType), StructField("__pr", LongType),
      StructField("__nv", tType), StructField("__nr", LongType)))
    val carried = rdd.mapPartitionsWithIndex { (pid, it) =>
      val rows = it.toArray
      val n = rows.length
      val pv = new Array[Any](n)
      val pr = new Array[Any](n)
      val nv = new Array[Any](n)
      val nr = new Array[Any](n)
      var cur = carryPrev(pid)
      var i = 0
      while (i < n) { // forward: nearest donor strictly before in sort order
        if (cur != null) { pv(i) = cur._1; pr(i) = cur._2 }
        if (rows(i).getInt(sideIdx) == 0) cur = (rows(i).get(dvIdx), rows(i).getLong(rIdx))
        i += 1
      }
      cur = carryNext(pid)
      i = n - 1
      while (i >= 0) { // backward: nearest donor strictly after
        if (cur != null) { nv(i) = cur._1; nr(i) = cur._2 }
        if (rows(i).getInt(sideIdx) == 0) cur = (rows(i).get(dvIdx), rows(i).getLong(rIdx))
        i -= 1
      }
      (0 until n).iterator.filter(j => rows(j).getInt(sideIdx) == 1).map { j =>
        org.apache.spark.sql.Row.fromSeq(
          rows(j).toSeq ++ Seq(pv(j), pr(j), nv(j), nr(j)))
      }
    }
    spark.createDataFrame(carried, outSchema)
      .withColumn(target, fillChoice(target))
      .drop("__r", "__side", "__dv", "__pv", "__pr", "__nv", "__nr")
  }
}
