package graft.operators

import graft.SparkSpec
import graft.operators.ColumnSelect.ColSpec
import java.sql.{Date, Timestamp}

/** The reference's cast-matrix conformance suite: golden vectors ported
  * from tests/test_column_select.py (test_casting_bool_1:384,
  * test_casting_int_1:471, test_casting_float_1:558,
  * test_casting_str_1:645, test_casting_date_1:815,
  * test_casting_datetime_1:980 and their `_nones` variants). The
  * numeric↔temporal bridge is epoch seconds; `time` is µs-of-day
  * LongType in this engine (1 s = 1,000,000), time-SOURCE casts are the
  * one un-ported corner (a bigint time column is indistinguishable from
  * int — use the timeOfDay helpers instead; documented divergence).
  */
class CastConformanceSpec extends SparkSpec {
  import spark.implicits._

  private val allTargets = Seq("bool", "int", "float", "str", "date", "time", "datetime")

  private def run(df: org.apache.spark.sql.DataFrame, col: String,
      targets: Seq[String], allowEmpty: Boolean = false) = {
    val (pass, fail) = ColumnSelect.columnSelect(df,
      targets.map(t => ColSpec(col, t, allowEmpty = allowEmpty, rename = Some(t))))
    (pass.orderBy(org.apache.spark.sql.functions.col(targets.head).asc_nulls_last), fail)
  }

  private def ts(s: String) = Timestamp.valueOf(s)
  private def d(s: String) = Date.valueOf(s)

  test("bool source (test_casting_bool_1): epoch-seconds bridge") {
    val df = Seq(Tuple1(true), Tuple1(false)).toDF("b")
    val (pass, fail) = run(df, "b", allTargets)
    assert(fail.count() === 0)
    val rows = pass.collect().sortBy(-_.getLong(1)) // [true-row, false-row]
    assert(rows.map(_.getBoolean(0)).toSeq === Seq(true, false))
    assert(rows.map(_.getLong(1)).toSeq === Seq(1L, 0L))
    assert(rows.map(_.getDouble(2)).toSeq === Seq(1.0, 0.0))
    assert(rows.map(_.getString(3)).toSeq === Seq("True", "False"))
    assert(rows.map(_.getDate(4).toString).toSeq === Seq("1970-01-01", "1970-01-01"))
    assert(rows.map(_.getLong(5)).toSeq === Seq(1000000L, 0L)) // µs-of-day
    assert(rows.map(_.getTimestamp(6)).toSeq ===
      Seq(ts("1970-01-01 00:00:01"), ts("1970-01-01 00:00:00")))
  }

  test("bool with None (bool_1_nones / bool_2_nones): allow_empty routing") {
    val df = Seq(Option(true), Option(false), None).toDF("b")
    val (passStrict, failStrict) = run(df, "b", allTargets, allowEmpty = false)
    assert(passStrict.count() === 2 && failStrict.count() === 1)
    val (passLoose, failLoose) = run(df, "b", allTargets, allowEmpty = true)
    assert(passLoose.count() === 3 && failLoose.count() === 0)
    val noneRow = passLoose.collect().find(_.isNullAt(0)).get
    assert(noneRow.isNullAt(1) && noneRow.isNullAt(2))
    assert(noneRow.getString(3) === "") // None→str = "" (ref :453)
    assert(noneRow.isNullAt(4) && noneRow.isNullAt(5) && noneRow.isNullAt(6))
  }

  test("int source (test_casting_int_1)") {
    val df = Seq(1L, 0L).toDF("i")
    val (pass, fail) = run(df, "i", allTargets)
    assert(fail.count() === 0)
    val rows = pass.collect().sortBy(-_.getLong(1))
    assert(rows.map(_.getBoolean(0)).toSeq === Seq(true, false))
    assert(rows.map(_.getLong(1)).toSeq === Seq(1L, 0L))
    assert(rows.map(_.getDouble(2)).toSeq === Seq(1.0, 0.0))
    assert(rows.map(_.getString(3)).toSeq === Seq("1", "0"))
    assert(rows.map(_.getDate(4).toString).toSeq === Seq("1970-01-01", "1970-01-01"))
    assert(rows.map(_.getLong(5)).toSeq === Seq(1000000L, 0L))
    assert(rows.map(_.getTimestamp(6)).toSeq ===
      Seq(ts("1970-01-01 00:00:01"), ts("1970-01-01 00:00:00")))
  }

  test("float source (test_casting_float_1): str keeps the decimal point") {
    val df = Seq(1.0, 0.0).toDF("f")
    val (pass, fail) = run(df, "f", allTargets)
    assert(fail.count() === 0)
    val rows = pass.collect().sortBy(-_.getLong(1))
    assert(rows.map(_.getBoolean(0)).toSeq === Seq(true, false))
    assert(rows.map(_.getLong(1)).toSeq === Seq(1L, 0L))
    assert(rows.map(_.getString(3)).toSeq === Seq("1.0", "0.0"))
    assert(rows.map(_.getTimestamp(6)).toSeq ===
      Seq(ts("1970-01-01 00:00:01"), ts("1970-01-01 00:00:00")))
  }

  test("str source (test_casting_str_1): '1.0' parses to int 1") {
    val df = Seq("1.0", "0.0").toDF("s")
    val (pass, fail) = run(df, "s", Seq("int", "float", "str"))
    assert(fail.count() === 0)
    val rows = pass.collect().sortBy(-_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 0L))
    assert(rows.map(_.getDouble(1)).toSeq === Seq(1.0, 0.0))
    assert(rows.map(_.getString(2)).toSeq === Seq("1.0", "0.0"))
  }

  test("str with None (str_1_nones): strict rejects exactly the none row") {
    val df = Seq(Option("1.0"), Option("0.0"), None).toDF("s")
    val (pass, fail) = run(df, "s", Seq("int", "float", "str"), allowEmpty = false)
    assert(pass.count() === 2 && fail.count() === 1)
  }

  test("date source (test_casting_date_1): epoch seconds out") {
    val df = Seq(d("1970-01-01"), d("1970-01-02")).toDF("dt")
    val targets = Seq("bool", "int", "float", "str", "date", "datetime")
    val (pass, fail) = run(df, "dt", targets)
    assert(fail.count() === 0)
    val rows = pass.collect().sortBy(_.getLong(1))
    assert(rows.map(_.getBoolean(0)).toSeq === Seq(false, true))
    assert(rows.map(_.getLong(1)).toSeq === Seq(0L, 86400L))
    assert(rows.map(_.getDouble(2)).toSeq === Seq(0.0, 86400.0))
    assert(rows.map(_.getString(3)).toSeq === Seq("1970-01-01", "1970-01-02"))
    assert(rows.map(_.getDate(4).toString).toSeq === Seq("1970-01-01", "1970-01-02"))
    assert(rows.map(_.getTimestamp(5)).toSeq ===
      Seq(ts("1970-01-01 00:00:00"), ts("1970-01-02 00:00:00")))
  }

  test("datetime source (test_casting_datetime_1)") {
    val df = Seq(ts("1970-01-01 00:00:00"), ts("1970-01-02 00:00:00")).toDF("dt")
    val targets = Seq("bool", "int", "float", "str", "date", "datetime")
    val (pass, fail) = run(df, "dt", targets)
    assert(fail.count() === 0)
    val rows = pass.collect().sortBy(_.getLong(1))
    assert(rows.map(_.getBoolean(0)).toSeq === Seq(false, true))
    assert(rows.map(_.getLong(1)).toSeq === Seq(0L, 86400L))
    assert(rows.map(_.getDouble(2)).toSeq === Seq(0.0, 86400.0))
    assert(rows.map(_.getString(3)).toSeq ===
      Seq("1970-01-01 00:00:00", "1970-01-02 00:00:00"))
    assert(rows.map(_.getDate(4).toString).toSeq === Seq("1970-01-01", "1970-01-02"))
  }

  test("unpassable casts reject the whole row (unstastable_1)") {
    // reference test_column_select_unstastable_1: a non-numeric string
    // cannot become int — the row lands in fail with a reason
    val df = Seq("abc").toDF("s")
    val (pass, fail) = run(df, "s", Seq("int"))
    assert(pass.count() === 0 && fail.count() === 1)
    assert(fail.collect().head.getAs[String]("reject_reason").contains("Cannot cast"))
  }
}
