package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
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
    direction: String) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinNode]] → [[AsofJoinExec]]. Registered either via
  * `GraftExtensions` (config-time) or `AsofJoinPlan.register` (runtime).
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, rv, out, dir) =>
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

/** DataFrame-level builder for the native as-of join. */
object AsofJoinPlan {

  def register(spark: SparkSession): Unit =
    PlanBridge.addStrategy(spark, AsofJoinStrategy)

  /** As-of join via [[AsofJoinNode]]. Same signature and semantics as
    * `Joins.asofJoin`; right value columns colliding with left names get
    * `_1`-style suffixes.
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
    require(direction == "backward" || direction == "forward", s"direction: $direction")
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
      outNames.map(p => rAttr(p._1)), outAttrs, direction)
    PlanBridge.ofRows(spark, node)
  }
}
