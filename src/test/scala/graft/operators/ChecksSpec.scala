package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(
    (1L, "en", 10L), (2L, "de", 20L), (2L, "de", 20L), // dup key 2 ×2
    (3L, null.asInstanceOf[String], -4L),              // null lang, range violation
    (4L, "xx", 5L)                                     // unaccepted lang
  ).toDF("id", "lang", "n")

  test("report: one row per check, exact violation counts, pass flags") {
    val rep = Checks.report(frame, Seq(
      Checks.NotNull("lang"), Checks.Unique(Seq("id")),
      Checks.InRange("n", 0, 100), Checks.Accepted("lang", Seq("en", "de"))))
      .as[(String, String, Long, Boolean)].collect().toSet
    assert(rep === Set(
      ("not_null", "lang", 1L, false),
      ("unique", "id", 1L, false),   // 2 rows for key 2 → 1 to drop
      ("in_range", "n", 1L, false),  // -4; null-safe: null n would not count
      ("accepted", "lang", 1L, false))) // "xx"; null lang not counted here
    // a clean frame passes everything
    val clean = Checks.report(frame.filter($"id" === 1L), Seq(
      Checks.NotNull("lang"), Checks.Unique(Seq("id")),
      Checks.InRange("n", 0, 100), Checks.Accepted("lang", Seq("en"))))
      .as[(String, String, Long, Boolean)].collect()
    assert(clean.forall(r => r._3 == 0L && r._4))
  }

  test("report: multi-column unique keys and loud misconfiguration") {
    val rep = Checks.report(frame, Seq(Checks.Unique(Seq("id", "lang"))))
      .as[(String, String, Long, Boolean)].collect().head
    assert(rep === (("unique", "id,lang", 1L, false)))
    val ex = intercept[IllegalArgumentException](
      Checks.report(frame, Seq(Checks.InRange("nope", 0, 1))))
    assert(ex.getMessage.contains("nope"))
    val ex2 = intercept[IllegalArgumentException](Checks.report(frame, Nil))
    assert(ex2.getMessage.contains("no checks"))
  }
}
