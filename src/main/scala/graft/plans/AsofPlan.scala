package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graftbridge.PlanBridge

/** As-of join as a first-class Catalyst operator: logical node + planner
  * strategy + sort-merge physical plan.
  *
  * Semantics (the generalization of the reference's `lookup`,
  * tablite/lookup.py:14-110, with a time criterion): for each left row,
  * the single right row with the same key and the greatest `rightTime`
  * <= `leftTime` ("backward"; "forward" = smallest >=), inclusive;
  * unmatched left rows keep NULLs. Identical results to
  * `graft.operators.Joins.asofJoin` (the composed window formulation),
  * but planned as one co-partitioned merge:
  *
  *  - `requiredChildDistribution` clusters both sides on the join keys —
  *    exactly one shuffle per side (or zero if already co-partitioned /
  *    bucketed), enforced by EnsureRequirements like any shuffled join;
  *  - `requiredChildOrdering` sorts within partitions by (keys, time) —
  *    AQE/ValidateRequirements see a standard sort requirement;
  *  - execution is a streaming two-pointer merge per partition: O(n+m),
  *    constant memory (ONE buffered right row + the last match), no
  *    union + window materialization, no per-key buffering. At 100 TB
  *    the composed form pays union + full-width window carry; this node
  *    shuffles each side once at its natural width.
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightValues: Seq[Attribute],
    outAttrs: Seq[Attribute],
    direction: String,
    hint: String = "auto") extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinNode]] → [[AsofJoinExec]] (co-partitioned merge) or
  * [[BroadcastAsofJoinExec]] when the right side's stats fall under
  * `autoBroadcastJoinThreshold` — the same small-dimension decision the
  * built-in join strategies make. Registered either via `GraftExtensions`
  * (config-time) or `AsofJoinPlan.register` (runtime).
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, rv, out, dir, hint) =>
      val thresh = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val useBroadcast = hint match {
        case "broadcast" => true
        case "merge"     => false
        case _           => thresh > 0 && r.stats.sizeInBytes <= thresh
      }
      if (useBroadcast)
        BroadcastAsofJoinExec(lk, rk, lt, rt, rv, out, dir, planLater(l), planLater(r)) :: Nil
      else
        AsofJoinExec(lk, rk, lt, rt, rv, out, dir, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightValues: Seq[Expression],
    outAttrs: Seq[Attribute],
    direction: String,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  private def forward = direction == "forward"
  private def timeDir = if (forward) Descending else Ascending

  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // time sorts DESC for forward joins so both directions run the same
  // merge loop (scan order always moves toward the "best" match last)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, timeDir),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, timeDir))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val rVals = rightValues
    val keyTypes = lKeys.map(_.dataType)
    val timeTypes = Seq(lTime.dataType)
    val outTypes = (lOut ++ outAttrs).map(_.dataType).toArray
    val fwd = forward
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val rValsProj = UnsafeProjection.create(rVals, rOut)
      val resultProj = UnsafeProjection.create(outTypes)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(timeTypes)
      val nullVals = InternalRow.fromSeq(Seq.fill(rVals.length)(null))
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // the single right row remembered between left rows: the best match
      // so far for matchKey (last consumed = greatest time <= t backward /
      // smallest >= t forward, because of the scan order)
      var matchKey: UnsafeRow = null
      var matchVals: UnsafeRow = null
      lIter.map { lRow =>
        val lk = lKeyProj(lRow)
        val lt = lTimeProj(lRow)
        var stop = false
        while (!stop && rBuf.hasNext) {
          val rk = rKeyProj(rBuf.head)
          val kc = keyOrd.compare(rk, lk)
          if (kc < 0) {
            rBuf.next() // right side behind on keys — discard
          } else if (kc == 0) {
            val tc = timeOrd.compare(rTimeProj(rBuf.head), lt)
            if (if (fwd) tc >= 0 else tc <= 0) {
              matchVals = rValsProj(rBuf.next()).copy()
              matchKey = lk.copy()
            } else stop = true
          } else stop = true
        }
        val vals =
          if (matchKey != null && keyOrd.compare(matchKey, lk) == 0) matchVals
          else nullVals
        numOutputRows += 1
        resultProj(joined(lRow, vals))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast as-of join for small right sides (quote/reference tables):
  * ZERO exchanges on the big side — the left keeps its partitioning and
  * ordering, the right ships once per executor via a broadcast exchange
  * (EnsureRequirements inserts it from the `BroadcastDistribution`
  * requirement). Per partition: hash the broadcast rows by key into
  * time-sorted lists, then answer each left row with one hash probe +
  * binary search. At 100 TB this is the difference between shuffling the
  * full fact table on (key) and a pure map-side pass.
  *
  * Tie semantics match [[AsofJoinExec]]: among equal right times,
  * backward takes the last row in time-sort order, forward the first.
  */
case class BroadcastAsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightValues: Seq[Expression],
    outAttrs: Seq[Attribute],
    direction: String,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  private def forward = direction == "forward"

  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val rVals = rightValues
    val outTypes = (lOut ++ outAttrs).map(_.dataType).toArray
    val fwd = forward
    left.execute().mapPartitions({ lIter =>
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      // build: key -> time-ascending (time, values) list from the
      // broadcast rows; built once per task over a small right side
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val rValsProj = UnsafeProjection.create(rVals, rOut)
      val map = new java.util.HashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[(UnsafeRow, UnsafeRow)]]()
      bcast.value.foreach { r =>
        val k = rKeyProj(r).copy()
        var buf = map.get(k)
        if (buf == null) {
          buf = new scala.collection.mutable.ArrayBuffer[(UnsafeRow, UnsafeRow)]()
          map.put(k, buf)
        }
        buf += ((rTimeProj(r).copy(), rValsProj(r).copy()))
      }
      map.values.forEach { buf => // stable sort: equal times keep row order
        buf.sortInPlaceWith((a, b) => timeOrd.compare(a._1, b._1) < 0)
      }
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val resultProj = UnsafeProjection.create(outTypes)
      val nullVals = InternalRow.fromSeq(Seq.fill(rVals.length)(null))
      val joined = new JoinedRow
      lIter.map { lRow =>
        val buf = map.get(lKeyProj(lRow))
        var vals: InternalRow = nullVals
        if (buf != null) {
          val lt = lTimeProj(lRow)
          // backward: greatest index with time <= lt (last among equals);
          // forward: smallest index with time >= lt (first among equals)
          var lo = 0
          var hi = buf.length - 1
          var found = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            val c = timeOrd.compare(buf(mid)._1, lt)
            if (fwd) {
              if (c >= 0) { found = mid; hi = mid - 1 } else lo = mid + 1
            } else {
              if (c <= 0) { found = mid; lo = mid + 1 } else hi = mid - 1
            }
          }
          if (found >= 0) vals = buf(found)._2
        }
        numOutputRows += 1
        resultProj(joined(lRow, vals))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level builder for the native as-of join. */
object AsofJoinPlan {

  def register(spark: SparkSession): Unit =
    PlanBridge.addStrategy(spark, AsofJoinStrategy)

  /** As-of join via [[AsofJoinNode]]. Same signature and semantics as
    * `Joins.asofJoin`; right value columns colliding with left names get
    * `_1`-style suffixes. `hint`: "auto" (stats decide merge vs
    * broadcast), "merge", or "broadcast".
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      direction: String = "backward",
      hint: String = "auto"): DataFrame = {
    require(leftKeys.length == rightKeys.length, "key arity mismatch")
    require(direction == "backward" || direction == "forward", s"direction: $direction")
    require(Set("auto", "merge", "broadcast")(hint), s"hint: $hint")
    val spark = left.sparkSession
    register(spark)

    val lPlan = PlanBridge.analyzed(left)
    // fresh exprIds on the right side: left and right are often carved
    // from the same source (self-as-of), and a binary node with shared
    // attribute ids between children is ambiguous to the analyzer
    val aliases = PlanBridge.analyzed(right).output
      .map(a => Alias(a, a.name)(qualifier = Seq.empty))
    val rPlan = Project(aliases, PlanBridge.analyzed(right))
    val rAttrs = aliases.map(_.toAttribute)

    def lAttr(n: String): Attribute = lPlan.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"left column not found: $n"))
    def rAttr(n: String): Attribute = rAttrs.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"right column not found: $n"))

    var taken = left.columns.toSet
    val outNames = rightValues.map { c =>
      val n = graft.operators.Joins.uniqueName(c, taken)
      taken += n
      c -> n
    }
    val outAttrs = outNames.map { case (rv, out) =>
      AttributeReference(out, rAttr(rv).dataType, nullable = true)()
    }
    val node = AsofJoinNode(lPlan, rPlan,
      leftKeys.map(lAttr), rightKeys.map(rAttr),
      lAttr(leftTime), rAttr(rightTime),
      outNames.map(p => rAttr(p._1)), outAttrs, direction, hint)
    PlanBridge.ofRows(spark, node)
  }
}
