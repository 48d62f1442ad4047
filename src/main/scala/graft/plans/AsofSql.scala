package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, StructType}

/** `ASOF JOIN` SQL syntax (DuckDB/Snowflake-style) on top of the native
  * [[AsofJoinNode]] operator, via `injectParser` + a resolution rule:
  *
  * {{{
  *   SELECT t.*, q.px
  *   FROM trades t ASOF JOIN quotes q
  *     ON t.sym = q.sym AND t.ts >= q.ts        -- backward (most recent quote)
  *
  *   ... ASOF LEFT JOIN ...                      -- keep unmatched left rows
  *   ... ON t.sym = q.sym AND t.ts <= q.ts       -- forward (next quote)
  * }}}
  *
  * The delegating parser rewrites `ASOF [LEFT] JOIN` to a plain `JOIN`
  * and plants a [[AsofMarkerExpr]] conjunct in the ON clause — the full
  * statement still parses through Spark's own ANTLR grammar, so every
  * other SQL feature keeps working. Once the join's children and
  * condition resolve, [[ResolveAsofJoinSql]] classifies the conjuncts
  * (equality keys; exactly one inclusive time inequality, whose side
  * order decides backward vs forward) and swaps the Join for the native
  * [[AsofJoinNode]] — one shuffle per side, streaming merge, broadcast
  * when the right side is small. Matching DuckDB: plain `ASOF JOIN`
  * drops unmatched left rows (a null-time filter on top), `ASOF LEFT
  * JOIN` keeps them.
  */
case class AsofMarkerExpr(mode: String) extends LeafExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = true
}

class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan = delegate.parsePlan(rewrite(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(rewrite(sqlText))

  override def parseExpression(s: String): Expression = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier = delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier = delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] = delegate.parseMultipartIdentifier(s)
  override def parseTableSchema(s: String): StructType = delegate.parseTableSchema(s)
  override def parseDataType(s: String): DataType = delegate.parseDataType(s)
  override def parseRoutineParam(s: String): StructType = delegate.parseRoutineParam(s)

  private val asofRe =
    """(?i)\b(ASOF\s+LEFT\s+JOIN|LEFT\s+ASOF\s+JOIN|ASOF\s+JOIN)\b""".r

  /** Replace each `ASOF [LEFT] JOIN ... ON <cond>` with
    * `JOIN ... ON graft_asof_marker('<mode>') AND <cond>`. Quote- AND
    * comment-aware (no rewrites inside string literals, `--` line
    * comments or `/* */` block comments), paren-aware, and join-scoped:
    * the ON must belong to THIS join — if another clause keyword (JOIN,
    * USING, WHERE, …) appears at relation depth 0 first, the ASOF join
    * has no ON of its own and the documented error is raised instead of
    * splicing the marker into a later join's condition.
    */
  private[plans] def rewrite(sql: String): String = {
    var text = sql
    var guard = 0
    while (guard < 64) {
      guard += 1
      val mk = maskOf(text)
      val m = asofRe.findAllMatchIn(text).find(mm => !mk(mm.start)).getOrElse(return text)
      val mode = if (m.group(1).toUpperCase.contains("LEFT")) "left" else "inner"
      val afterJoin = text.substring(m.end)
      val onIdx = findOnClause(afterJoin)
      if (onIdx < 0)
        throw new IllegalArgumentException(
          "ASOF JOIN requires an ON clause with equality keys and one time inequality " +
            "(USING / NATURAL / CROSS forms are not supported)")
      text = text.substring(0, m.start) + "JOIN" + afterJoin.substring(0, onIdx) +
        s" graft_asof_marker('$mode') AND" + afterJoin.substring(onIdx)
    }
    text
  }

  /** Positions inside string literals (' " `), `--` line comments or
    * `/* */` block comments.
    */
  private def maskOf(s: String): Array[Boolean] = {
    val m = new Array[Boolean](s.length)
    var i = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { m(i) = true; if (c == quote) quote = 0; i += 1 }
      else if (c == '\'' || c == '"' || c == '`') { m(i) = true; quote = c; i += 1 }
      else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n') { m(i) = true; i += 1 }
      } else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        m(i) = true; m(i + 1) = true; i += 2
        while (i < s.length &&
            !(s.charAt(i) == '*' && i + 1 < s.length && s.charAt(i + 1) == '/')) {
          m(i) = true; i += 1
        }
        if (i < s.length) { m(i) = true; if (i + 1 < s.length) m(i + 1) = true; i += 2 }
      } else i += 1
    }
    m
  }

  // a clause starting with one of these before ON means the ASOF join
  // has no ON of its own
  private val clauseStoppers = Set("JOIN", "USING", "WHERE", "GROUP", "ORDER",
    "HAVING", "LIMIT", "UNION", "EXCEPT", "INTERSECT", "QUALIFY", "WINDOW")

  /** Index just past this join's own `ON` keyword (depth-0, mask-aware)
    * within `s`; -1 when another clause starts first or no ON exists.
    */
  private def findOnClause(s: String): Int = {
    val mk = maskOf(s)
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (mk(i)) i += 1
      else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (Character.isLetter(c) &&
          (i == 0 || mk(i - 1) ||
            (!Character.isLetterOrDigit(s.charAt(i - 1)) && s.charAt(i - 1) != '_'))) {
        var j = i
        while (j < s.length && !mk(j) &&
            (Character.isLetterOrDigit(s.charAt(j)) || s.charAt(j) == '_')) j += 1
        val w = s.substring(i, j).toUpperCase
        if (depth == 0) {
          if (w == "ON") return j
          if (clauseStoppers.contains(w)) return -1
        }
        i = j
      } else i += 1
    }
    -1
  }
}

/** Swaps a marker-carrying resolved Join for the native as-of node. */
object ResolveAsofJoinSql extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case j @ Join(l, r, _, Some(cond), _)
        if j.resolved && cond.exists(_.isInstanceOf[AsofMarkerExpr]) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (markers, rest) = conjuncts.partition(_.isInstanceOf[AsofMarkerExpr])
      val mode = markers.head.asInstanceOf[AsofMarkerExpr].mode
      val lOut = AttributeSet(l.output)
      val rOut = AttributeSet(r.output)
      def leftSide(e: Expression) = e.references.nonEmpty && e.references.subsetOf(lOut)
      def rightSide(e: Expression) = e.references.nonEmpty && e.references.subsetOf(rOut)

      val lk = scala.collection.mutable.ArrayBuffer.empty[Expression]
      val rk = scala.collection.mutable.ArrayBuffer.empty[Expression]
      var time: Option[(Expression, Expression, String)] = None // (lt, rt, direction)
      def setTime(lt: Expression, rt: Expression, dir: String): Unit = {
        if (time.isDefined)
          throw new IllegalArgumentException(
            "ASOF JOIN supports exactly one time inequality in the ON clause")
        time = Some((lt, rt, dir))
      }
      rest.foreach {
        case EqualTo(a, b) if leftSide(a) && rightSide(b) => lk += a; rk += b
        case EqualTo(a, b) if rightSide(a) && leftSide(b) => lk += b; rk += a
        // l.t >= r.t — latest right at-or-before left = backward
        case GreaterThanOrEqual(a, b) if leftSide(a) && rightSide(b) => setTime(a, b, "backward")
        case GreaterThanOrEqual(a, b) if rightSide(a) && leftSide(b) => setTime(b, a, "forward")
        // l.t <= r.t — earliest right at-or-after left = forward
        case LessThanOrEqual(a, b) if leftSide(a) && rightSide(b) => setTime(a, b, "forward")
        case LessThanOrEqual(a, b) if rightSide(a) && leftSide(b) => setTime(b, a, "backward")
        case _: GreaterThan | _: LessThan =>
          throw new IllegalArgumentException(
            "ASOF JOIN time bounds are inclusive: use >= or <= (strict < / > is not supported)")
        case other =>
          throw new IllegalArgumentException(
            s"unsupported ASOF JOIN conjunct: ${other.sql} — expected key equalities and one time inequality")
      }
      val (lt, rt, dir) = time.getOrElse(throw new IllegalArgumentException(
        "ASOF JOIN needs a time inequality (e.g. l.ts >= r.ts) in the ON clause"))
      if (lk.isEmpty)
        throw new IllegalArgumentException(
          "ASOF JOIN needs at least one equality key in the ON clause")

      // The node's outputs must be FRESH attributes: reusing the right
      // child's ids would land them in producedAttributes and make column
      // pruning subtract the join keys out of the right child's required
      // set. A restoring Project aliases each fresh output back to the
      // ORIGINAL right-side exprId, so references above the join (already
      // resolved to those ids) keep working untouched.
      val fresh = r.output.map(a =>
        AttributeReference(a.name, a.dataType, nullable = true)())
      val node = AsofJoinNode(l, r, lk.toSeq, rk.toSeq, lt, rt, r.output, fresh, dir)
      val restore = l.output ++ fresh.zip(r.output).map { case (na, old) =>
        Alias(na, old.name)(exprId = old.exprId, qualifier = old.qualifier)
      }
      val restored = Project(restore, node)
      // DuckDB parity: plain ASOF JOIN is inner-like (drop unmatched);
      // the right TIME column is null exactly when nothing matched
      if (mode == "inner") Filter(IsNotNull(rt), restored) else restored
  }
}
