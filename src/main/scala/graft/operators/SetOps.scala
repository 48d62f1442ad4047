package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Concat / stack / repeat / merge / diff (tablite/base.py:1464-1663,
  * merge.py:7-50, diff.py:8-88).
  */
object SetOps {

  /** `t1 += t2` — concat; requires identical column-name sets
    * (base.py:1493-1518). Narrow op: union is metadata-only in Spark.
    */
  def concat(a: DataFrame, b: DataFrame): DataFrame = {
    require(a.columns.toSet == b.columns.toSet,
      s"concat requires identical columns; got ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    a.unionByName(b)
  }

  /** `stack` — schema-union concat padding missing columns with NULL
    * (base.py:1640-1663).
    */
  def stack(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)

  /** `t * n` — repeat the table n times (base.py:1464-1491).
    * Cross join with a range: no shuffle, n-fold narrow expansion.
    */
  def repeatTable(df: DataFrame, n: Int): DataFrame =
    df.crossJoin(df.sparkSession.range(n).select(lit(1).as("__rep"))).drop("__rep")

  /** `merge.where(criteria, left, right)` — coalesce two columns into one
    * by a boolean criterion (merge.py:7-50).
    */
  def mergeWhere(df: DataFrame, criteria: Column, left: String, right: String,
      out: String): DataFrame =
    df.withColumn(out, when(criteria, col(left)).otherwise(col(right)))
      .drop(Seq(left, right).filterNot(_ == out): _*)

  /** Set-style diff of two same-schema tables — the scalable variant of
    * the reference's order-sensitive difflib `t.diff` (diff.py:8-88,
    * documented divergence): per-row multiset comparison via full outer
    * join on all columns. Output: the row + counts in each side + a
    * marker `+` (only in b), `-` (only in a), `=` (both).
    */
  def diff(a: DataFrame, b: DataFrame): DataFrame = {
    val cols = a.columns.toSeq
    val ca = a.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__na"))
    val cb = b.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__nb"))
    val cond = cols.map(c => ca(c) <=> cb(c)).reduce(_ && _)
    ca.join(cb, cond, "full")
      .select(
        cols.map(c => coalesce(ca(c), cb(c)).as(c)) ++ Seq(
          coalesce(col("__na"), lit(0L)).as("count_a"),
          coalesce(col("__nb"), lit(0L)).as("count_b"),
          when(col("__na").isNull, "+")
            .when(col("__nb").isNull, "-")
            .otherwise("=").as("marker")): _*)
  }

  /** Order-sensitive diff with the reference's exact difflib semantics
    * (diff.py:8-88): SequenceMatcher opcodes over row tuples, output =
    * rows tagged in `1st`/`2nd` marker columns — insert → "-"/"+"
    * (row of `b`), delete → "+"/"-" (row of `a`), equal → "="/"="
    * (row of `b`), replace → "r"/"r" (only `b`'s rows, like difflib's
    * opcode consumption in the reference). Driver-side by design — LCS
    * is inherently sequential; same scale posture as the reference,
    * enforced by `maxRows`. The scalable multiset variant is [[diff]].
    */
  def diffOrdered(a: DataFrame, b: DataFrame, maxRows: Int = 100000): DataFrame = {
    val cols = a.columns.toSeq.filter(b.columns.contains)
    val aRows = a.select(cols.map(col): _*).limit(maxRows + 1).collect()
    val bRows = b.select(cols.map(col): _*).limit(maxRows + 1).collect()
    require(aRows.length <= maxRows && bRows.length <= maxRows,
      s"diffOrdered is a driver-side op capped at $maxRows rows")
    val av = aRows.map(_.toSeq)
    val bv = bRows.map(_.toSeq)

    // difflib.SequenceMatcher.find_longest_match (no junk handling)
    def longestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      val b2j = scala.collection.mutable.Map.empty[Seq[Any], List[Int]]
      var j = bhi - 1
      while (j >= blo) { b2j(bv(j)) = j :: b2j.getOrElse(bv(j), Nil); j -= 1 }
      var (besti, bestj, bestsize) = (alo, blo, 0)
      var j2len = Map.empty[Int, Int]
      var i = alo
      while (i < ahi) {
        val next = scala.collection.mutable.Map.empty[Int, Int]
        b2j.getOrElse(av(i), Nil).foreach { jj =>
          val k = j2len.getOrElse(jj - 1, 0) + 1
          next(jj) = k
          if (k > bestsize) { besti = i - k + 1; bestj = jj - k + 1; bestsize = k }
        }
        j2len = next.toMap
        i += 1
      }
      (besti, bestj, bestsize)
    }

    // matching blocks by recursion, then opcodes (difflib get_opcodes)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    def recurse(alo: Int, ahi: Int, blo: Int, bhi: Int): Unit = {
      val (i, j, k) = longestMatch(alo, ahi, blo, bhi)
      if (k > 0) {
        recurse(alo, i, blo, j)
        blocks += ((i, j, k))
        recurse(i + k, ahi, j + k, bhi)
      }
    }
    recurse(0, av.length, 0, bv.length)
    blocks += ((av.length, bv.length, 0)) // sentinel

    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var (ai, bi) = (0, 0)
    def emit(vals: Seq[Any], m1: String, m2: String): Unit =
      out += Row.fromSeq(vals ++ Seq(m1, m2))
    blocks.foreach { case (i, j, k) =>
      if (ai < i && bi < j) (bi until j).foreach(x => emit(bv(x), "r", "r"))
      else if (ai < i) (ai until i).foreach(x => emit(av(x), "+", "-"))
      else if (bi < j) (bi until j).foreach(x => emit(bv(x), "-", "+"))
      ai = i; bi = j
      (0 until k).foreach(x => emit(bv(j + x), "=", "="))
      ai = i + k; bi = j + k
    }

    val spark = a.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      a.select(cols.map(col): _*).schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField(
          graft.operators.Joins.uniqueName("1st", cols.toSet), org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(
          graft.operators.Joins.uniqueName("2nd", cols.toSet), org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(out.toSeq, 1), schema)
  }

  /** Deep table equality (base.py:1320-1344): same schema and same row
    * multiset. Two anti-join emptiness checks.
    */
  def tablesEqual(a: DataFrame, b: DataFrame): Boolean =
    a.columns.sameElements(b.columns) &&
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  /** Extensions absent from the reference but free in Spark. */
  def intersectTables(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)
  def exceptTables(a: DataFrame, b: DataFrame): DataFrame = a.`except`(b)

  /** Latest-wins upsert (merge): one survivor per `keyCols` tuple from
    * `base` ∪ `updates` — highest `versionCol` wins, `updates` beats
    * `base` on a version tie, and remaining ties (same key+version
    * WITHIN one side) are broken deterministically by the smallest
    * remaining-column tuple so reruns are bit-identical. The
    * batch-native CDC/merge-on-read shape: re-deliveries are idempotent
    * (same row → same survivor) and an update batch can both revise
    * existing keys and insert new ones. Schemas must match by name
    * (same `concat` contract as the other set ops).
    *
    * Scale shape: one hash exchange on the key + one window pass — and
    * `row_number() = 1` is rewritten by InferWindowGroupLimit to a
    * partial/final WindowGroupLimit pair, so each map task forwards ONE
    * candidate row per key it sees, not the whole history (the
    * top-k-per-group machinery; pinned in PlanQualitySpec).
    */
  def upsert(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
      versionCol: String): DataFrame = {
    require(keyCols.nonEmpty, "upsert: no key columns")
    (keyCols :+ versionCol).foreach { c =>
      require(base.columns.contains(c) && updates.columns.contains(c),
        s"upsert: column $c missing from ${if (base.columns.contains(c)) "updates" else "base"}")
    }
    val unioned = concat(base.withColumn("__src", lit(0)),
      updates.withColumn("__src", lit(1)))
    val rest = base.columns.filterNot(c => keyCols.contains(c) || c == versionCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc_nulls_last +: col("__src").desc +:
        rest.map(c => col(c).asc_nulls_last): _*)
    unioned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }

  /** SCD-2 history from a change-event log: every event opens a validity
    * interval `[valid_from, valid_to)` on its key, closed by the key's
    * NEXT event; the last event per key stays open (`valid_to` null,
    * `is_current` true) — the slowly-changing-dimension companion of
    * [[upsert]] (which keeps only the final state, this keeps the full
    * audit timeline). Ties on `versionCol` break by `tieCol` ascending
    * so the chain is deterministic under duplicate timestamps.
    *
    * Scale shape: ONE hash exchange on the key + per-key sort for the
    * `lead` window — state per key is its own event count, the same
    * bound any history representation needs; no global window, no
    * driver state.
    */
  def scd2FromEvents(events: DataFrame, keyCols: Seq[String],
      versionCol: String, tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "scd2FromEvents: no key columns")
    (keyCols :+ versionCol :+ tieCol).foreach { c =>
      require(events.columns.contains(c), s"scd2FromEvents: no column '$c'")
    }
    Seq("valid_from", "valid_to", "is_current").foreach { c =>
      require(!events.columns.contains(c),
        s"scd2FromEvents: input already has '$c' — rename it first")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).asc_nulls_first, col(tieCol).asc_nulls_first)
    events
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Fold a batch of change events into an existing SCD-2 history
    * ([[scd2FromEvents]] output shape), always equivalent to a full
    * [[scd2FromEvents]] rebuild over (original events ∪ updates):
    *
    *   - keys whose updates are all at-or-after their open row's
    *     `valid_from` re-chain only the OPEN row + the updates —
    *     O(touched keys' state); closed rows pass through untouched;
    *   - a LATE event (version strictly before its key's open-row
    *     `valid_from`) would splice inside the already-closed chain, so
    *     that key's FULL history re-chains (history rows carry their
    *     original event columns, so the rebuild needs no event log) —
    *     still O(that key's state), not O(history);
    *   - never-seen keys insert their own chain; keys without updates
    *     keep their rows byte-for-byte.
    *
    * Late-key detection is one aggregate over the (small) update batch
    * broadcast-joined against open rows; when no key is late the extra
    * semi/anti joins are broadcast passes that drop out to the previous
    * single-scan plan shape. An update tying the open row's version
    * re-chains in the fast path and stays rebuild-equivalent: both rows
    * are in the re-chain set and the closed chain's last `valid_to`
    * equals that version either way.
    */
  def scd2Apply(history: DataFrame, updates: DataFrame, keyCols: Seq[String],
      versionCol: String, tieCol: String): DataFrame = {
    Seq("valid_from", "valid_to", "is_current").foreach { c =>
      require(history.columns.contains(c),
        s"scd2Apply: history lacks '$c' — not an scd2FromEvents shape")
      require(!updates.columns.contains(c),
        s"scd2Apply: updates must be raw events, found '$c'")
    }
    val validityCols = Seq("valid_from", "valid_to", "is_current")
    // keys with at least one update older than their open row: these
    // must re-chain their whole history, not just the open row
    val updMin = updates.groupBy(keyCols.map(col): _*)
      .agg(min(col(versionCol)).as("__upd_min"))
    val lateKeys = history.filter(col("is_current"))
      .select(keyCols.map(col) :+ col("valid_from").as("__open_from"): _*)
      .join(broadcast(updMin), keyCols)
      .filter(col("__upd_min") < col("__open_from"))
      .select(keyCols.map(col): _*)
    val histNorm = history.join(broadcast(lateKeys), keyCols, "left_anti")
    val histLate = history.join(broadcast(lateKeys), keyCols, "left_semi")
    val updNorm = updates.join(broadcast(lateKeys), keyCols, "left_anti")
    val updLate = updates.join(broadcast(lateKeys), keyCols, "left_semi")
    val closed = histNorm.filter(!col("is_current"))
    val open = histNorm.filter(col("is_current")).drop(validityCols: _*)
    val rechained = scd2FromEvents(concat(open, updNorm), keyCols, versionCol, tieCol)
    val rebuiltLate = scd2FromEvents(
      concat(histLate.drop(validityCols: _*), updLate), keyCols, versionCol, tieCol)
    concat(concat(closed, rechained), rebuiltLate)
  }
}
