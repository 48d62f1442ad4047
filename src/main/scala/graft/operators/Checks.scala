package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-contract checks (ext): the expectation gate a
  * pipeline runs before promoting a snapshot — nulls where there must
  * be none, duplicate keys, out-of-range numerics, values outside an
  * accepted set. One report frame, one row per check, so the caller
  * gates on `pass` and logs `violations` without re-deriving either.
  */
object Checks {

  sealed trait Check
  /** `col` must never be null. */
  final case class NotNull(col: String) extends Check
  /** The `cols` tuple must be unique; violations = Σ per-key (count−1)
    * — the rows a dedup would have to drop (null keys group like any
    * other value, identically in SQL GROUP BY).
    */
  final case class Unique(cols: Seq[String]) extends Check
  /** `col` must lie in [lo, hi]; nulls are NOT range violations (pair
    * with [[NotNull]] when they are).
    */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check
  /** `col` must be one of `values`; nulls are not violations here either. */
  final case class Accepted(col: String, values: Seq[String]) extends Check

  /** Run every check in ONE job over one pass of `df` where possible:
    * the scalar checks (not-null / range / accepted) are conditional
    * counts in a single aggregation; each [[Unique]] adds one
    * partial-agg exchange on its key tuple. Returns
    * `(check, target, violations, pass)` sorted by (check, target) —
    * a bounded frame (one row per check).
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Checks.report: no checks")
    val spark = df.sparkSession
    checks.foreach {
      case NotNull(c) => require(df.columns.contains(c), s"NotNull: missing $c")
      case Unique(cs) =>
        require(cs.nonEmpty && cs.forall(df.columns.contains), s"Unique: missing ${cs.mkString(",")}")
      case InRange(c, lo, hi) =>
        require(df.columns.contains(c), s"InRange: missing $c")
        require(lo <= hi, s"InRange: lo=$lo > hi=$hi")
      case Accepted(c, vs) =>
        require(df.columns.contains(c), s"Accepted: missing $c")
        require(vs.nonEmpty, s"Accepted($c): empty value set")
    }
    val scalar = checks.collect {
      case NotNull(c) =>
        ("not_null", c, count(when(col(c).isNull, 1)))
      case InRange(c, lo, hi) =>
        ("in_range", c,
          count(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1)))
      case Accepted(c, vs) =>
        ("accepted", c,
          count(when(col(c).isNotNull && !col(c).isin(vs: _*), 1)))
    }
    val scalarFrame =
      if (scalar.isEmpty) None
      else {
        // ONE aggregation pass, its single row collected (the bounded
        // 1-row pattern) — a union of per-check selects over the agg
        // frame would re-run the pass once per check
        val aggs = scalar.zipWithIndex.map { case ((_, _, e), i) => e.as(s"v$i") }
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        import spark.implicits._
        Some(scalar.zipWithIndex.map { case ((name, target, _), i) =>
          (name, target, row.getLong(i))
        }.toDF("check", "target", "violations"))
      }
    val uniques = checks.collect { case Unique(cs) =>
      df.groupBy(cs.map(col): _*).agg(count(lit(1)).as("__n"))
        .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("violations"))
        .select(lit("unique").as("check"),
          lit(cs.mkString(",")).as("target"),
          col("violations").cast("long"))
    }
    (scalarFrame.toSeq ++ uniques).reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
      .orderBy("check", "target")
  }
}
