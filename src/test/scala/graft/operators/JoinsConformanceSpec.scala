package graft.operators

import graft.SparkSpec

/** Golden-result conformance against the reference's own join suite
  * (tests/test_join.py). The reference asserts ORDERED row lists (its
  * hash join emits in left-row order); Spark join output order is
  * partition-arbitrary, so the goldens compare as multisets — the
  * documented ordering divergence. Values and multiplicities must match
  * exactly, including None/null rows.
  */
class JoinsConformanceSpec extends SparkSpec {
  import spark.implicits._

  private def multiset(rows: Seq[Product]): Map[Product, Int] =
    rows.groupBy(identity).view.mapValues(_.size).toMap

  test("self left join on colour duplicates every blue pairing (test_join.py:16-41)") {
    val numbers = Seq(
      (Option(1L), "black"), (Option(2L), "blue"), (Option(3L), "white"),
      (Option(4L), "white"), (Option.empty[Long], "blue")).toDF("number", "colour")
    val out = Joins.join(numbers, numbers, Seq("colour"), Seq("colour"), "left")
    assert(out.columns.toSeq === Seq("number", "colour", "number_1", "colour_1"))
    val got = out.collect().map(r => (Option(r.get(0)), r.getString(1),
      Option(r.get(2)), r.getString(3))).toSeq
    val want = Seq(
      (Some(1L), "black", Some(1L), "black"),
      (Some(2L), "blue", Some(2L), "blue"),
      (Some(2L), "blue", None, "blue"),
      (None, "blue", Some(2L), "blue"),
      (None, "blue", None, "blue"),
      (Some(3L), "white", Some(3L), "white"),
      (Some(3L), "white", Some(4L), "white"),
      (Some(4L), "white", Some(3L), "white"),
      (Some(4L), "white", Some(4L), "white"))
    assert(multiset(got) === multiset(want))
  }

  test("wiki joins: cross / inner with column subsets / left / full (test_join.py:230-426)") {
    val employees = Seq(
      ("Rafferty", Option(31)), ("Jones", Option(33)), ("Heisenberg", Option(33)),
      ("Robinson", Option(34)), ("Smith", Option(34)), ("Williams", Option.empty[Int]))
      .toDF("last name", "department")
    val departments = Seq((31, "Sales"), (33, "Engineering"), (34, "Clerical"),
      (35, "Marketing")).toDF("id", "name")

    // cross join ignores keys: full cartesian 6 × 4
    val cross = Joins.join(employees, departments, Seq("department"), Seq("id"), "cross")
    assert(cross.count() === 24)

    // inner join with explicit column subsets
    val inner = Joins.join(employees, departments, Seq("department"), Seq("id"),
      "inner", leftColumns = Some(Seq("last name")),
      rightColumns = Some(Seq("id", "name")))
    assert(inner.columns.toSeq === Seq("last name", "id", "name"))
    val gotInner = inner.collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
    assert(multiset(gotInner) === multiset(Seq(
      ("Rafferty", 31, "Sales"), ("Jones", 33, "Engineering"),
      ("Heisenberg", 33, "Engineering"), ("Robinson", 34, "Clerical"),
      ("Smith", 34, "Clerical"))))

    // left join: unmatched Williams keeps null right columns
    val left = Joins.join(employees, departments, Seq("department"), Seq("id"), "left")
    val gotLeft = left.collect().map(r => (r.getString(0), Option(r.get(1)),
      Option(r.get(2)), Option(r.get(3)))).toSeq
    assert(multiset(gotLeft) === multiset(Seq(
      ("Rafferty", Some(31), Some(31), Some("Sales")),
      ("Jones", Some(33), Some(33), Some("Engineering")),
      ("Heisenberg", Some(33), Some(33), Some("Engineering")),
      ("Robinson", Some(34), Some(34), Some("Clerical")),
      ("Smith", Some(34), Some(34), Some("Clerical")),
      ("Williams", None, None, None))))

    // right-outer emulation: left join with sides swapped
    val swapped = Joins.join(departments, employees, Seq("id"), Seq("department"), "left")
    val gotSwapped = swapped.collect().map(r => (r.getInt(0), r.getString(1),
      Option(r.get(2)), Option(r.get(3)))).toSeq
    assert(multiset(gotSwapped) === multiset(Seq(
      (31, "Sales", Some("Rafferty"), Some(31)),
      (33, "Engineering", Some("Jones"), Some(33)),
      (33, "Engineering", Some("Heisenberg"), Some(33)),
      (34, "Clerical", Some("Robinson"), Some(34)),
      (34, "Clerical", Some("Smith"), Some(34)),
      (35, "Marketing", None, None))))

    // full outer: both dangling sides appear
    val full = Joins.join(employees, departments, Seq("department"), Seq("id"), "outer")
    val gotFull = full.collect().map(r => (Option(r.get(0)), Option(r.get(1)),
      Option(r.get(2)), Option(r.get(3)))).toSeq
    assert(multiset(gotFull) === multiset(Seq(
      (Some("Rafferty"), Some(31), Some(31), Some("Sales")),
      (Some("Jones"), Some(33), Some(33), Some("Engineering")),
      (Some("Heisenberg"), Some(33), Some(33), Some("Engineering")),
      (Some("Robinson"), Some(34), Some(34), Some("Clerical")),
      (Some("Smith"), Some(34), Some(34), Some("Clerical")),
      (Some("Williams"), None, None, None),
      (None, None, Some(35), Some("Marketing")))))
  }

  test("join with key merge coalesces keys from both sides (test_join.py:437-523)") {
    val employees = Seq(
      ("Rafferty", Option(31)), ("Williams", Option.empty[Int])).toDF("last name", "department")
    val departments = Seq((31, "Sales"), (35, "Marketing")).toDF("department", "name")
    val merged = Joins.join(employees, departments, Seq("department"), Seq("department"),
      "outer", mergeKeys = true)
    assert(merged.columns.toSeq === Seq("last name", "department", "name"))
    val got = merged.collect().map(r => (Option(r.get(0)), Option(r.get(1)),
      Option(r.get(2)))).toSeq
    assert(multiset(got) === multiset(Seq(
      (Some("Rafferty"), Some(31), Some("Sales")),
      (Some("Williams"), None, None),
      (None, Some(35), Some("Marketing")))))
  }
}
