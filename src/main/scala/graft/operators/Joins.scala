package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-key joins with the reference's semantics
  * (tablite/joins.py:16-297, lookup.py:14-110, match.py:6-102):
  *
  *  - key equality is Python-dict equality, so `None == None` matches →
  *    null-safe `<=>` conditions;
  *  - right-side column-name collisions are renamed with `_1`, `_2`…
  *    suffixes (utils.py:41-52);
  *  - `merge_keys` coalesces the right key into the left key column
  *    (joins.py:524-562) — SQL `USING` semantics.
  *
  * Catalyst picks broadcast-hash / sort-merge / shuffled-hash; callers
  * can wrap the right side in `broadcast()` for small dims.
  */
object Joins {

  /** tablite's unique_name: suffix `_1`, `_2`… until free (utils.py:41-52). */
  def uniqueName(wanted: String, taken: Set[String]): String =
    if (!taken.contains(wanted)) wanted
    else Iterator.from(1).map(i => s"${wanted}_$i").find(!taken.contains(_)).get

  /** Rename right-side columns that collide with kept left columns. */
  private def dedupRight(leftCols: Seq[String], rightCols: Seq[String]): Seq[(String, String)] = {
    var taken = leftCols.toSet
    rightCols.map { c =>
      val n = uniqueName(c, taken)
      taken += n
      c -> n
    }
  }

  /** General multi-key equi-join.
    *
    * @param kind inner | left | outer (full) | cross
    * @param leftColumns / rightColumns columns to keep (None = all)
    * @param mergeKeys coalesce right key into left key and drop the dup
    * @param nullSafe  use `<=>` so NULL keys match NULL keys (reference behavior)
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      kind: String = "inner",
      leftColumns: Option[Seq[String]] = None,
      rightColumns: Option[Seq[String]] = None,
      mergeKeys: Boolean = false,
      nullSafe: Boolean = true): DataFrame = {
    require(leftKeys.length == rightKeys.length, "left/right key counts differ")

    val l = left.alias("l")
    val r = right.alias("r")

    val sparkKind = kind.toLowerCase match {
      case "inner"          => "inner"
      case "left"           => "left"
      case "outer" | "full" => "full"
      case "cross"          => "cross"
      case other            => throw new IllegalArgumentException(s"unknown join kind: $other")
    }

    val joined =
      if (sparkKind == "cross") l.crossJoin(r)
      else {
        val cond = leftKeys.zip(rightKeys).map { case (lk, rk) =>
          if (nullSafe) col(s"l.$lk") <=> col(s"r.$rk") else col(s"l.$lk") === col(s"r.$rk")
        }.reduce(_ && _)
        l.join(r, cond, sparkKind)
      }

    val keepL = leftColumns.getOrElse(left.columns.toSeq)
    val keepR0 = rightColumns.getOrElse(right.columns.toSeq)
    // merge_keys drops right key columns after coalescing into the left key
    val keepR = if (mergeKeys) keepR0.filterNot(rightKeys.contains) else keepR0

    val leftOut = keepL.map { c =>
      if (mergeKeys && leftKeys.contains(c)) {
        val rk = rightKeys(leftKeys.indexOf(c))
        coalesce(col(s"l.$c"), col(s"r.$rk")).as(c)
      } else col(s"l.$c").as(c)
    }
    val renames = dedupRight(keepL, keepR)
    val rightOut = renames.map { case (c, n) => col(s"r.$c").as(n) }

    joined.select(leftOut ++ rightOut: _*)
  }

  def innerJoin(l: DataFrame, r: DataFrame, lk: Seq[String], rk: Seq[String]): DataFrame =
    join(l, r, lk, rk, "inner")
  def leftJoin(l: DataFrame, r: DataFrame, lk: Seq[String], rk: Seq[String]): DataFrame =
    join(l, r, lk, rk, "left")
  def outerJoin(l: DataFrame, r: DataFrame, lk: Seq[String], rk: Seq[String]): DataFrame =
    join(l, r, lk, rk, "outer")
  def crossJoin(l: DataFrame, r: DataFrame): DataFrame =
    join(l, r, Nil, Nil, "cross")

  /** `lookup` — theta-join, FIRST match only (lookup.py:14-110): each left
    * row gets at most one right row — the first match in `rightOrder`
    * ascending order; unmatched left rows keep NULL right columns.
    *
    * @param criteria arbitrary boolean join conditions referencing
    *                 `l.<col>` / `r.<col>` qualified columns
    * @param rightOrder right column defining "first" (the reference uses
    *                   physical row order; at scale an explicit order
    *                   column is required for determinism)
    *
    * Scale note: a pure theta condition forces a nested-loop join, so the
    * right side should be broadcast-able; with at least one equi-criterion
    * Catalyst extracts the equi part and hash-joins. The first-match
    * reduction is a `min_by` aggregation per left row — one shuffle on the
    * (unique) left row id, no window sort.
    */
  def lookup(
      left: DataFrame,
      right: DataFrame,
      criteria: (DataFrame, DataFrame) => Column,
      rightOrder: String,
      rightColumns: Option[Seq[String]] = None): DataFrame = {
    val keepR = rightColumns.getOrElse(right.columns.toSeq)
    val lId = left.withColumn("__lid", monotonically_increasing_id())
    val joined = lId.alias("l").join(right.alias("r"), criteria(lId, right), "left")
    // first match per left row = row with min rightOrder; ties broken by
    // the kept values (deterministic on non-unique order columns)
    val structCols = struct(keepR.map(c => col(s"r.$c").as(c)): _*)
    val picked = joined
      .groupBy(col("__lid"))
      .agg(min_by(structCols,
        struct(col(s"r.$rightOrder") +: keepR.map(c => col(s"r.$c")): _*)).as("__match"))
    val renames = dedupRight(left.columns.toSeq, keepR)
    val out = lId.alias("l").join(picked, Seq("__lid"), "left")
      .select(
        left.columns.toSeq.map(c => col(s"l.$c").as(c)) ++
          renames.map { case (c, n) => col(s"__match.$c").as(n) }: _*)
    out
  }

  /** Salted equi-join for skewed keys: each left row gets a salt in
    * [0, buckets), the right side is replicated across every salt value,
    * and the join key becomes (key, salt) — a hot key's rows spread over
    * `buckets` tasks at the cost of a `buckets`× blow-up of the right
    * side (so: small-ish right, hot-keyed left). AQE's skew-join already
    * splits sort-merge partitions; salting is the tool when a SINGLE key
    * exceeds one task or the build side of a shuffled-hash join skews.
    * The salt is per-row arbitrary (not a function of the data) — it
    * only spreads rows, never changes the join result.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      kind: String = "inner",
      buckets: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    join(saltedLeft, saltedRight,
      leftKeys :+ "__salt", rightKeys :+ "__salt", kind,
      leftColumns = Some(left.columns.toSeq),
      rightColumns = Some(right.columns.toSeq))
  }

  /** Bloom-pruned equi-join: build a bloom filter over the SMALL side's
    * key (a distributed sketch aggregation — the small side never
    * collects), broadcast it into a native predicate on the LARGE side,
    * and only then join. The point at 100 TB: the fact side is pruned
    * map-side inside its scan's codegen span, BEFORE the join shuffle —
    * with a selective dim filter this deletes most of the shuffle I/O.
    * Spark's AQE runtime bloom filter does this automatically for some
    * plans; the explicit form is deterministic and works under any join
    * strategy. False positives only weaken pruning — the equi-join
    * afterwards keeps the result exactly equal to the un-pruned join.
    * Sound for "inner"/"semi" only (pruned left rows would need to
    * survive as null-matches under left/outer kinds).
    */
  def bloomPruneJoin(
      large: DataFrame,
      small: DataFrame,
      largeKey: String,
      smallKey: String,
      kind: String = "inner",
      fpp: Double = 0.01,
      expectedItems: Long = -1L): DataFrame = {
    require(kind == "inner" || kind == "semi",
      s"bloom pruning is only sound for inner/semi joins, got: $kind")
    // The small side feeds two pre-join passes (sizing + bloom build) plus
    // the join itself; if it's a filtered subquery over a big table those
    // passes would repeat its scan. Persist it across all three — scoped,
    // so the cache is dropped after the caller's first action on the
    // joined result — and let callers who know the cardinality skip the
    // count() job entirely.
    val scope = new CacheScope
    val sm = scope.persist(small)
    val n = if (expectedItems > 0) expectedItems else math.max(sm.count(), 1L)
    val bloom = sm.stat.bloomFilter(smallKey, n, fpp)
    val pruned = large.filter(graft.plans.Kernels.bloomMightContain(col(largeKey), bloom))
    scope.releaseAfter(
      if (kind == "semi")
        pruned.alias("l").join(sm.alias("r"),
          col(s"l.$largeKey") === col(s"r.$smallKey"), "left_semi")
      else
        join(pruned, sm, Seq(largeKey), Seq(smallKey), "inner", nullSafe = false))
  }

  /** Point-in-interval (range) join: every (point, interval) pair with
    * `lo <= point <= hi`, plus optional extra equi-keys. No reference
    * analogue (its theta `lookup` is first-match and row-at-a-time);
    * the natural companion of [[asofJoin]] for event/interval data.
    *
    * A naive theta join is a cartesian product — dead at scale. This is
    * the BANDED equi-join shape: the number line is cut into fixed
    * `bandWidth` bands, each interval row is exploded to every band it
    * overlaps, each point row maps to exactly ONE band, and a hash
    * equi-join on (band [, keys]) with a residual exact BETWEEN filter
    * yields each qualifying pair exactly once (the point's band is
    * unique — no dedup pass). The final filter is exact, so banding
    * affects cost only, never the row set. Pick `bandWidth` near the
    * typical interval span: the explode factor is span/bandWidth + 1.
    * Pathological spans fail loudly via `maxBandsPerInterval` (a
    * codegen raise_error, not a silent 2^31-row explode); hot bands are
    * AQE skew-join territory. Null points, null bounds, and inverted
    * intervals (`lo > hi`) match nothing — SQL BETWEEN semantics. Extra
    * equi-keys compare with SQL `=`: a null key on either side matches
    * nothing (plain equi-join semantics, so a SQL oracle agrees on
    * null-keyed data). Interval-side name collisions get the `_1`
    * suffix rule like every other join here.
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bandWidth: Long,
      pointKeys: Seq[String] = Nil,
      intervalKeys: Seq[String] = Nil,
      maxBandsPerInterval: Int = 1 << 16): DataFrame = {
    require(bandWidth > 0, s"bandWidth: $bandWidth")
    require(pointKeys.length == intervalKeys.length, "key arity mismatch")
    // '__band' is the internal band column on BOTH sides — a caller
    // column of that name would be silently replaced by withColumn
    require(!points.columns.contains("__band") && !intervals.columns.contains("__band"),
      "'__band' is rangeJoin's internal band column; rename the input column")
    // banding needs numeric division — a string column would cast to
    // null bands and silently drop every row
    Seq(points.schema(pointCol), intervals.schema(loCol), intervals.schema(hiCol))
      .foreach(f => require(
        f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"rangeJoin: '${f.name}' is ${f.dataType.simpleString}, need numeric " +
          "(cast timestamps to long/double first)"))
    val w = lit(bandWidth.toDouble)
    val p = points
      .filter(col(pointCol).isNotNull)
      .withColumn("__band", floor(col(pointCol) / w).cast("long"))
    val loB = floor(col(loCol) / w).cast("long")
    val hiB = floor(col(hiCol) / w).cast("long")
    val iv = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("__band", explode(sequence(loB,
        when(hiB - loB < lit(maxBandsPerInterval.toLong), hiB)
          .otherwise(raise_error(concat(
            lit(s"rangeJoin: an interval spans over $maxBandsPerInterval bands at " +
              s"bandWidth=$bandWidth — widen bandWidth or split the interval (span "),
            col(hiCol) - col(loCol), lit(")")))))))
    val renames = dedupRight(p.columns.toSeq, iv.columns.toSeq)
    val r = renames.foldLeft(iv) { case (df, (from, to)) =>
      if (from == to) df else df.withColumnRenamed(from, to)
    }
    val bandR = renames.toMap.apply("__band")
    val loR = renames.toMap.getOrElse(loCol, loCol)
    val hiR = renames.toMap.getOrElse(hiCol, hiCol)
    val keyCond = pointKeys.zip(intervalKeys.map(k => renames.toMap.getOrElse(k, k)))
      .map { case (a, b) => col(a) === col(b) }
    val cond = (Seq(col("__band") === col(bandR),
      col(pointCol) >= col(loR), col(pointCol) <= col(hiR)) ++ keyCond)
      .reduce(_ && _)
    p.join(r, cond, "inner").drop("__band").drop(bandR)
  }

  /** Interval-overlap join — the interval×interval other half of
    * [[rangeJoin]]: every (left, right) pair whose CLOSED intervals
    * overlap (`lLo <= rHi && rLo <= lHi`), plus optional extra
    * equi-keys (SQL `=` — null keys match nothing).
    *
    * Banded exactly-once: BOTH sides explode to the fixed-width bands
    * they overlap, pairs hash-join on (band [, keys]) with the exact
    * overlap residual — and since an overlapping pair now shares EVERY
    * band its intersection covers, a pair is emitted only from the band
    * that OWNS the overlap start (`band == floor(max(lLo, rLo) /
    * bandWidth)`). That predicate is free map-side arithmetic and makes
    * each qualifying pair appear exactly once with NO distinct pass —
    * a distinct would shuffle the full pair output. Same numeric
    * requirement, null/inverted-interval drop semantics,
    * `maxBandsPerInterval` loud-failure guard, and `_1` rename rule as
    * [[rangeJoin]].
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftLo: String,
      leftHi: String,
      rightLo: String,
      rightHi: String,
      bandWidth: Long,
      leftKeys: Seq[String] = Nil,
      rightKeys: Seq[String] = Nil,
      maxBandsPerInterval: Int = 1 << 16): DataFrame = {
    require(bandWidth > 0, s"bandWidth: $bandWidth")
    require(leftKeys.length == rightKeys.length, "key arity mismatch")
    require(!left.columns.contains("__band") && !right.columns.contains("__band"),
      "'__band' is intervalJoin's internal band column; rename the input column")
    Seq(left.schema(leftLo), left.schema(leftHi),
        right.schema(rightLo), right.schema(rightHi))
      .foreach(f => require(
        f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"intervalJoin: '${f.name}' is ${f.dataType.simpleString}, need numeric " +
          "(cast timestamps to long/double first)"))
    val w = lit(bandWidth.toDouble)
    def banded(df: DataFrame, lo: String, hi: String): DataFrame = {
      val loB = floor(col(lo) / w).cast("long")
      val hiB = floor(col(hi) / w).cast("long")
      df.filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
        .withColumn("__band", explode(sequence(loB,
          when(hiB - loB < lit(maxBandsPerInterval.toLong), hiB)
            .otherwise(raise_error(concat(
              lit(s"intervalJoin: an interval spans over $maxBandsPerInterval bands " +
                s"at bandWidth=$bandWidth — widen bandWidth or split the interval (span "),
              col(hi) - col(lo), lit(")")))))))
    }
    val l = banded(left, leftLo, leftHi)
    val renames = dedupRight(l.columns.toSeq, banded(right, rightLo, rightHi).columns.toSeq)
    val r = renames.foldLeft(banded(right, rightLo, rightHi)) { case (df, (from, to)) =>
      if (from == to) df else df.withColumnRenamed(from, to)
    }
    val ren = renames.toMap
    val (bandR, loR, hiR) =
      (ren("__band"), ren.getOrElse(rightLo, rightLo), ren.getOrElse(rightHi, rightHi))
    val keyCond = leftKeys.zip(rightKeys.map(k => ren.getOrElse(k, k)))
      .map { case (a, b) => col(a) === col(b) }
    val cond = (Seq(col("__band") === col(bandR),
      col(leftLo) <= col(hiR), col(loR) <= col(leftHi),
      // exactly-once ownership: only the band holding the overlap start emits
      col("__band") === floor(greatest(col(leftLo), col(loR)) / w).cast("long")) ++
      keyCond).reduce(_ && _)
    l.join(r, cond, "inner").drop("__band").drop(bandR)
  }

  /** As-of join (no reference analogue; the natural generalization of
    * `lookup` with a time criterion, and table stakes for event data).
    * For each left row: the right row with the greatest `rightTime` <=
    * `leftTime` within the same key ("backward"; "forward" = smallest
    * >=). Composed per the custom-operator preference order: NOT a
    * per-row theta join — tag sides, union, and carry the last right
    * value forward over a (key)-partitioned time-ordered window. One
    * shuffle on the key, linear work, no row explosion; skew surface =
    * rows per key, same as any windowed op.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      direction: String = "backward"): DataFrame = {
    require(leftKeys.length == rightKeys.length, "key arity mismatch")
    val lCols = left.columns.toSeq
    val rTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val lTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val outNames = dedupRight(lCols, rightValues)

    val keyAliases = leftKeys.indices.map(i => s"__k_$i")
    val l2 = left.select(
      lCols.map(col) ++
        leftKeys.zip(keyAliases).map { case (k, a) => col(k).as(a) } ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        outNames.map { case (rv, out) => lit(null).cast(rTypes(rv)).as(out) }: _*)
    val r2 = right.select(
      lCols.map(c => lit(null).cast(lTypes(c)).as(c)) ++
        rightKeys.zip(keyAliases).map { case (k, a) => col(k).as(a) } ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        outNames.map { case (rv, out) => col(rv).as(out) }: _*)

    // at equal times the right row must be visible to the left row
    // (inclusive match) → right (__side=0) sorts first backward, last forward
    val (ordered, frame) = direction match {
      case "backward" =>
        val w = Window.partitionBy(keyAliases.map(col): _*)
          .orderBy(col("__t").asc, col("__side").asc)
        (w, (c: Column) => last(c, ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      case "forward" =>
        // EXACT reversal of the forward tail frame: WindowExec evaluates
        // (currentRow, unboundedFollowing) by re-scanning the tail for
        // every row — O(g²) per key group, quadratic under key skew — but
        // runs (unboundedPreceding, currentRow) incrementally in O(g).
        // Reversed order (__t desc, __side asc) inverts (__t asc,
        // __side desc) exactly; at equal times the right row (__side 0)
        // still precedes the left row, keeping the inclusive match.
        val w = Window.partitionBy(keyAliases.map(col): _*)
          .orderBy(col("__t").desc, col("__side").asc)
        (w, (c: Column) => last(c, ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      case other => throw new IllegalArgumentException(s"direction: $other")
    }
    val _ = ordered
    // Carry ONE struct per matched right row, not each value column
    // independently: a per-column last(ignoreNulls) would let a NULL in
    // one value column fall back to an OLDER right row while the other
    // columns come from the nearest — a composite row that never
    // existed. The struct is null only on left rows, so the single
    // last(ignoreNulls) carries the whole nearest right row atomically
    // (NULL fields included).
    val packed = l2.unionByName(r2).withColumn("__pack",
      when(col("__side") === 0, struct(outNames.map(o => col(o._2)): _*)))
    val carried = packed.withColumn("__pack", frame(col("__pack")))
    carried.filter(col("__side") === 1)
      .select(lCols.map(col) ++ outNames.map { case (_, out) =>
        col("__pack").getField(out).as(out) }: _*)
  }

  /** Nearest join — 1-D nearest-neighbour alignment on a numeric (or
    * timestamp) axis: each left row gets the right row whose time is
    * CLOSEST in absolute distance within the same keys, whichever side
    * it lies on. The "align each reading to the closest calibration
    * sample" operator; the symmetric completion of [[asofJoin]]'s
    * backward/forward pair.
    *
    * Deterministic match rule (oracle-mirrorable):
    *  1. smallest `|right.time − left.time|` wins;
    *  2. equal distance → the BACKWARD candidate (earlier right time)
    *     wins — an exactly-at-time right row is a distance-0 backward
    *     match;
    *  3. equal right times within a direction → the backward side
    *     takes the LARGEST `rightTie`, the forward side the SMALLEST
    *     (each direction keeps its as-of "latest ≤ t" / "earliest ≥ t"
    *     reading). `rightTie` must be unique per (keys, time) for a
    *     fully deterministic result.
    *
    * Scale shape: ONE union + ONE hash-partitioned window exchange;
    * the backward and forward carries are two incremental
    * `(unboundedPreceding, currentRow)` frames over the same
    * partitioning (the forward one on the exactly-reversed sort — the
    * [[asofJoin]] O(g) trick), never a per-row tail re-scan and never
    * a join explosion. Left rows with no right row in the group get
    * nulls.
    */
  def nearestJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      rightTie: String): DataFrame = {
    require(leftKeys.length == rightKeys.length, "key arity mismatch")
    require(rightValues.nonEmpty, "nearestJoin: no right values requested")
    val lCols = left.columns.toSeq
    val rTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val lTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val outNames = dedupRight(lCols, rightValues)

    val keyAliases = leftKeys.indices.map(i => s"__k_$i")
    val l2 = left.select(
      lCols.map(col) ++
        leftKeys.zip(keyAliases).map { case (k, a) => col(k).as(a) } ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side"),
          lit(null).cast(rTypes(rightTime)).as("__rt"),
          lit(null).cast(rTypes(rightTie)).as("__tie")) ++
        outNames.map { case (rv, out) => lit(null).cast(rTypes(rv)).as(out) }: _*)
    val r2 = right.select(
      lCols.map(c => lit(null).cast(lTypes(c)).as(c)) ++
        rightKeys.zip(keyAliases).map { case (k, a) => col(k).as(a) } ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side"),
          col(rightTime).as("__rt"), col(rightTie).as("__tie")) ++
        outNames.map { case (rv, out) => col(rv).as(out) }: _*)

    // backward: at equal times the right row (__side 0) precedes the
    // left row (inclusive), equal right times resolve to the LAST in
    // tie order = largest tie
    val wB = Window.partitionBy(keyAliases.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
    // forward: the exact reversal (see asofJoin) — the carry stays an
    // incremental head frame; at equal times the right row still
    // precedes; equal right times resolve to the smallest tie
    val wF = Window.partitionBy(keyAliases.map(col): _*)
      .orderBy(col("__t").desc, col("__side").asc, col("__tie").desc)
    def carryB(c: Column) = last(c, ignoreNulls = true)
      .over(wB.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    def carryF(c: Column) = last(c, ignoreNulls = true)
      .over(wF.rowsBetween(Window.unboundedPreceding, Window.currentRow))

    // Atomic-row carry (same reasoning as asofJoin): pack (__rt, values)
    // into ONE struct that is null only on left rows, carry it once per
    // direction, and unpack AFTER choosing the direction — so the
    // backward/forward distance decision and every output column come
    // from the same right row, even when that row has NULL value columns.
    val packed = l2.unionByName(r2).withColumn("__pack",
      when(col("__side") === 0,
        struct(col("__rt") +: outNames.map(o => col(o._2)): _*)))
    val carried = packed
      .withColumn("__bp", carryB(col("__pack")))
      .withColumn("__fp", carryF(col("__pack")))
    val lt = col("__t").cast("double")
    val bt = col("__bp").getField("__rt").cast("double")
    val ft = col("__fp").getField("__rt").cast("double")
    val useBwd = ft.isNull || (bt.isNotNull && (lt - bt <= ft - lt))
    carried.filter(col("__side") === 1)
      .select(lCols.map(col) ++ outNames.map { case (_, out) =>
        when(useBwd, col("__bp").getField(out))
          .otherwise(col("__fp").getField(out)).as(out) }: _*)
  }

  /** `match` — multi-key ==-only join keeping ONLY matching left rows,
    * appending the FIRST matching right row's columns (match.py:6-102).
    *
    * Implemented scalably: reduce the right side to one row per key
    * (first by `rightOrder`) with min_by, then inner-join — no row
    * explosion, broadcast-able reduced side.
    */
  def matchOp(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      rightOrder: String,
      rightColumns: Option[Seq[String]] = None): DataFrame = {
    val keepR = rightColumns.getOrElse(right.columns.toSeq).filterNot(rightKeys.contains)
    // ties in rightOrder are broken by the kept values themselves so the
    // "first" row is deterministic even on non-unique order columns
    val firstPerKey = right
      .groupBy(rightKeys.map(col): _*)
      .agg(min_by(struct(keepR.map(col): _*),
        struct(col(rightOrder) +: keepR.map(col): _*)).as("__m"))
      .select(rightKeys.map(col) ++ keepR.map(c => col(s"__m.$c").as(c)): _*)
    join(left, firstPerKey, leftKeys, rightKeys, "inner",
      rightColumns = Some(keepR))
  }
}
