package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structured filters with pass/fail twin outputs.
  *
  * Re-expresses the reference's structured filter
  * (tablite/redux.py:350-400, nimlite/funcs/filter.nim:84-308): a list
  * of criteria dicts combined with ALL/ANY, returning BOTH the matching
  * and the non-matching table. In Spark both outputs share one scanned,
  * Catalyst-optimized plan; predicates push down to the parquet scan.
  */
object Filters {

  /** One criterion: `left op right` where each side is a column or a literal.
    * Ops: > >= == < <= != in  (reference: nimlite/funcs/filter.nim:62-82).
    * "in" follows the reference's OBSERVABLE semantics — `str(left) in
    * str(right)`, i.e. the left value is a substring of the right
    * (tablite/mp_utils.py:13-18, pinned by tests/test_filter.py:40-46
    * where `A in "12"` keeps rows "1" and "2"). The Nim kernel reverses
    * the operands (filter.nim:74) but the reference's own tests assert
    * the Python direction, so that is what we match.
    */
  final case class Criterion(
      left: Either[String, Any],   // Left=column name, Right=literal
      op: String,
      right: Either[String, Any])

  object Criterion {
    def cc(c1: String, op: String, c2: String): Criterion =
      Criterion(Left(c1), op, Left(c2))
    def cv(c1: String, op: String, v: Any): Criterion =
      Criterion(Left(c1), op, Right(v))
  }

  private def side(s: Either[String, Any]): Column = s match {
    case Left(name) => col(name)
    case Right(v)   => lit(v)
  }

  def toColumn(c: Criterion): Column = {
    val l = side(c.left)
    val r = side(c.right)
    c.op match {
      case ">"          => l > r
      case ">="         => l >= r
      case "==" | "="   => l === r
      case "<"          => l < r
      case "<="         => l <= r
      case "!=" | "<>"  => l =!= r
      case "in"         => r.cast("string").contains(l.cast("string"))
      case other        => throw new IllegalArgumentException(s"unknown filter op: $other")
    }
  }

  /** Combine criteria with "all" (AND) or "any" (OR). */
  def predicate(criteria: Seq[Criterion], filterType: String = "all"): Column = {
    val cols = criteria.map(toColumn)
    filterType.toLowerCase match {
      case "all" => cols.reduce(_ && _)
      case "any" => cols.reduce(_ || _)
      case other => throw new IllegalArgumentException(s"filter_type must be all|any, got $other")
    }
  }

  /** (pass, fail) split. Rows where the predicate is NULL go to `fail`,
    * matching the reference where a non-true check routes the row to the
    * false table. Both frames derive from the same plan; at scale the
    * scan is shared via cache only if the caller persists.
    */
  def filterSplit(df: DataFrame, criteria: Seq[Criterion], filterType: String = "all")
      : (DataFrame, DataFrame) = {
    val p = coalesce(predicate(criteria, filterType), lit(false))
    (df.filter(p), df.filter(!p))
  }

  /** `t.all(colA = v, colB = v2)` — equality conjunction (redux.py:34-127). */
  def filterAll(df: DataFrame, kwargs: Map[String, Any]): DataFrame =
    df.filter(kwargs.map { case (k, v) => col(k) <=> lit(v) }.reduce(_ && _))

  /** `t.any(colA = v, colB = v2)` — equality disjunction. */
  def filterAny(df: DataFrame, kwargs: Map[String, Any]): DataFrame =
    df.filter(kwargs.map { case (k, v) => col(k) <=> lit(v) }.reduce(_ || _))

  /** The reference's CALLABLE kwargs (`t.all(a=lambda, ...)`,
    * redux.py:80-123, tests/test_any_and_all.py:7-43): arbitrary
    * per-column predicates. Scala `Column => Column` functions instead
    * of Python lambdas — the predicate stays a Catalyst expression
    * (codegen, pushdown) rather than an opaque UDF.
    */
  def filterAllWhere(df: DataFrame, preds: Map[String, Column => Column]): DataFrame =
    df.filter(preds.map { case (k, f) => f(col(k)) }.reduce(_ && _))

  def filterAnyWhere(df: DataFrame, preds: Map[String, Column => Column]): DataFrame =
    df.filter(preds.map { case (k, f) => f(col(k)) }.reduce(_ || _))

  /** Drop rows containing any of `values` in any column (redux.py:88-104).
    * Type-aware: a value is only compared against columns of a compatible
    * type (ANSI mode would otherwise fail the cast; the reference's
    * Python `==` likewise never equates across str/number).
    */
  def dropRows(df: DataFrame, values: Seq[Any]): DataFrame = {
    import org.apache.spark.sql.types._
    def compatible(dt: DataType, v: Any): Boolean = v match {
      case null        => true
      case _: String   => dt == StringType
      case _: Boolean  => dt == BooleanType
      case _: Int | _: Long | _: Double | _: Float | _: Short | _: Byte =>
        dt.isInstanceOf[NumericType]
      case _           => false
    }
    val checks = for {
      f <- df.schema.fields.toSeq
      v <- values if compatible(f.dataType, v)
    } yield col(f.name) <=> lit(v)
    if (checks.isEmpty) df else df.filter(!checks.reduce(_ || _))
  }

  /** `Column.remove_all(*values)` (base.py:870-885): remove every cell
    * equal to one of `values` from ONE column. The reference mutates the
    * column in place, leaving it SHORTER than its table (ragged columns
    * are a tablite storage feature with no DataFrame analogue) — here
    * the shrunk column comes back as a single-column frame, the closest
    * relational shape; callers who want whole-row semantics use
    * [[dropRows]]. Null-safe (`null` in `values` removes nulls, like the
    * reference's `None`). Projection + narrow filter: no shuffle, source
    * row order survives.
    */
  def columnRemoveAll(df: DataFrame, c: String, values: Seq[Any]): DataFrame = {
    require(df.columns.contains(c), s"columnRemoveAll: no column '$c'")
    val one = df.select(col(c))
    if (values.isEmpty) one
    else one.filter(!values.map(v => col(c) <=> lit(v)).reduce(_ || _))
  }

  /** Replace values old→new in the given columns (core.py:500-528). */
  def replace(df: DataFrame, mapping: Map[Any, Any], columns: Seq[String]): DataFrame =
    columns.foldLeft(df) { (acc, c) =>
      val repl = mapping.foldLeft(col(c)) { case (expr0, (from, to)) =>
        when(col(c) <=> lit(from), lit(to)).otherwise(expr0)
      }
      acc.withColumn(c, repl)
    }

  /** Distinct rows by `cols` keeping the FIRST row in `orderCol` order
    * (reference keep-first contract, base.py:1967-1989). With no order
    * column Spark's dropDuplicates keeps an arbitrary row — fine when
    * only the key columns are projected.
    */
  def dropDuplicatesKeepFirst(df: DataFrame, cols: Seq[String], orderCols: Seq[String]): DataFrame = {
    // min_by aggregation instead of a row_number window: partial (map-side)
    // aggregation + one shuffle on the key, no per-partition sort — the
    // window formulation shuffles AND sorts every row
    val others = df.columns.filterNot(cols.contains).toSeq
    if (others.isEmpty) df.dropDuplicates(cols)
    else {
      val orderKey = struct(orderCols.map(col) ++ others.map(col): _*)
      df.groupBy(cols.map(col): _*)
        .agg(min_by(struct(others.map(col): _*), orderKey).as("__first"))
        .select(cols.map(col) ++ others.map(c => col(s"__first.$c").as(c)): _*)
    }
  }
}
